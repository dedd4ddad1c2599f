package graft

import java.nio.file.Files

import graft.streaming.MaterializedAgg
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** MaterializedAgg contract: the incrementally maintained state equals the
  * batch recompute over everything ingested; a replayed micro-batch
  * (checkpoint recovery redelivers the same batchId) is a no-op; readers
  * always see a fully committed version.
  */
class MaterializeSpec extends SparkSpec {

  test("incremental aggregate equals batch recompute; replay is a no-op") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val root = Files.createTempDirectory("graft-mv").toString
    val state = s"$root/state"

    val input = MemoryStream[(Long, Long)]
    val q = MaterializedAgg.start(
      input.toDS().toDF("user", "cents"), state, s"$root/ckpt", "user", "cents")
    try {
      input.addData((1L, 100L), (2L, 50L), (1L, 25L))
      q.processAllAvailable()
      input.addData((2L, 10L), (3L, 7L))
      q.processAllAvailable()
    } finally q.stop()

    val got = MaterializedAgg.read(spark, state)
      .orderBy("user").collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq === Seq((1L, 2L, 125L), (2L, 2L, 60L), (3L, 1L, 7L)),
      s"state diverged from batch recompute: ${got.toSeq}")

    // checkpoint replay: re-applying an already-committed batchId must not
    // double-count (its version dir exists -> no-op)
    MaterializedAgg.applyBatch(spark,
      Seq((2L, 10L), (3L, 7L)).toDF("user", "cents"), 1L, state, "user", "cents")
    val replayed = MaterializedAgg.read(spark, state)
      .orderBy("user").collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(replayed.toSeq === got.toSeq, "replayed batch changed the state")

    // version pruning keeps the newest Retain snapshots only
    val versions = new java.io.File(state).list().count(_.startsWith("v="))
    assert(versions <= MaterializedAgg.Retain, s"$versions versions retained")
  }
}
