package graft.streaming

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Incremental materialized aggregate — lakehouse MV maintenance: a keyed
  * stream continuously folds into a per-key (n, total) parquet table,
  * updated once per micro-batch by merging the batch's PARTIALS with the
  * current state (work per batch ∝ batch + state size, never history), and
  * committed with the same atomic-rename discipline as [[FileTopicSink]]:
  * a version directory appears entirely or not at all, a replayed batch
  * (checkpoint recovery) sees its version already committed and does
  * nothing, and readers always load one committed version — exactly-once
  * end to end without a log-compaction service.
  *
  * Scale notes: count/sum partials are mergeable, so the merge is one
  * co-partitioned groupBy of (state ∪ batch-partials) — at 100 TB both
  * sides are bucketed by key on write and the merge is shuffle-free;
  * version pruning keeps the last [[Retain]] snapshots for concurrent
  * readers (a real deployment would gate pruning on reader leases).
  * Cites the reference's commit-after-durable-output contract
  * (`ReplicationApplication.java:96-101`) applied to derived state
  * instead of replicated records.
  */
object MaterializedAgg {

  /** Committed versions kept for in-flight readers. */
  val Retain = 2

  /** Continuously maintain `stateDir` from a streaming (keyCol, valueCol)
    * DataFrame. */
  def start(source: DataFrame, stateDir: String, checkpointDir: String,
      keyCol: String, valueCol: String): StreamingQuery =
    source.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBatch(batch.sparkSession, batch, batchId, stateDir, keyCol, valueCol)
      }
      .start()

  /** Merge one micro-batch into the keyed state. Idempotent per `batchId`;
    * atomic via staging-dir rename. `valueCol` must be an integral type:
    * integer partial sums merge order-independently, which is what makes
    * the state provably equal a batch recompute — double totals drift by
    * summation order and decimal sums widen their precision every merge
    * round (store money as cents, the engine-wide convention). */
  def applyBatch(s: SparkSession, batch: DataFrame, batchId: Long,
      stateDir: String, keyCol: String, valueCol: String): Unit = {
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
    val vt = batch.schema(valueCol).dataType
    require(Seq(ByteType, ShortType, IntegerType, LongType).contains(vt),
      s"valueCol '$valueCol' must be integral for order-independent merges, got $vt")
    val root = Paths.get(stateDir)
    Files.createDirectories(root)
    val target = root.resolve(s"v=$batchId")
    if (Files.exists(target)) return // checkpoint replay: already committed
    val partial = batch
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n"), sum(col(valueCol)).as("total"))
    val merged = latest(root) match {
      case Some(prev) =>
        s.read.parquet(root.resolve(s"v=$prev").toString)
          .select(col(keyCol), col("n"), col("total"))
          .union(partial.select(col(keyCol), col("n"), col("total")))
          .groupBy(col(keyCol))
          .agg(sum("n").as("n"), sum("total").as("total"))
      case None => partial
    }
    val staging = root.resolve(s".staging-$batchId")
    merged.write.mode("overwrite").parquet(staging.toString)
    Files.move(staging, target, StandardCopyOption.ATOMIC_MOVE)
    versions(root).sorted.dropRight(Retain)
      .foreach(v => deleteRecursively(root.resolve(s"v=$v")))
  }

  /** The latest committed snapshot of the materialized aggregate. */
  def read(s: SparkSession, stateDir: String): DataFrame = {
    val root = Paths.get(stateDir)
    val v = latest(root).getOrElse(
      throw new IllegalStateException(s"no committed state under $stateDir"))
    s.read.parquet(root.resolve(s"v=$v").toString)
  }

  private def versions(root: Path): Seq[Long] =
    if (!Files.exists(root)) Seq.empty
    else {
      val st = Files.list(root)
      // all-digit filter so one stray `v=backup` dir can't poison every
      // subsequent operation; close the stream — a long-running query
      // calls this every batch and unclosed listings leak descriptors
      try st.iterator().asScala
        .filter(Files.isDirectory(_))
        .map(_.getFileName.toString)
        .filter(n => n.startsWith("v=") && n.drop(2).nonEmpty &&
          n.drop(2).forall(_.isDigit))
        .map(_.stripPrefix("v=").toLong)
        .toSeq
      finally st.close()
    }

  private def latest(root: Path): Option[Long] = versions(root).maxOption

  private def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      val st = Files.walk(p)
      try st.iterator().asScala.toSeq.reverse.foreach(Files.delete)
      finally st.close()
    }
}
