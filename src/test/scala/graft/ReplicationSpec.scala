package graft

import java.nio.file.Files

import graft.avro.{AvroFunctions, FileSchemaRegistry, WireFormat}
import graft.streaming.Replication
import graft.streaming.Replication.Topics
import org.apache.spark.sql.functions._

/** M2 acceptance: the replication pipeline end-to-end, asserting exactly what
  * the reference's E2E test asserts — output key == value.id and value ==
  * original record (`ReplicationApplicationTest.java:122-123`) — plus
  * schema replication into the target registry, per-record wire framing,
  * and redelivery idempotence (restart from checkpoint produces no
  * duplicates, §2.1 R10).
  */
class ReplicationSpec extends SparkSpec {

  private case class Env(topics: Topics, sourceReg: String, targetReg: String)

  private def freshEnv(): Env = {
    val root = Files.createTempDirectory("graft-repl").toString
    Env(Topics(s"$root/topicA", s"$root/topicB", s"$root/checkpoint"),
      s"$root/registryA", s"$root/registryB")
  }

  test("replicates events: key == value.id, value round-trips, schema registered") {
    val env = freshEnv()
    val events = Tables.events(spark, sf).limit(200).cache()
    val schemaJson = Replication.stageSource(
      events, env.topics.sourceDir, "events-value", env.sourceReg, "Event")

    val q = Replication.start(spark, env.topics, "events-value",
      env.sourceReg, env.targetReg, idField = "event_id", maxFilesPerTrigger = 8)
    q.awaitTermination(120000)

    // schema replicated: same content-addressed id in both registries
    val srcReg = new FileSchemaRegistry(env.sourceReg)
    val tgtReg = new FileSchemaRegistry(env.targetReg)
    assert(tgtReg.latest("events-value").map(_._1) === srcReg.latest("events-value").map(_._1))

    val out = Replication.readCommitted(spark, env.topics.targetDir)
      .select(col("key"),
        AvroFunctions.fromAvroWire(col("value"), schemaJson, env.targetReg).as("r"))
    // key == value.id (ReplicationApplicationTest.java:122)
    assert(out.filter(col("key") =!= col("r.event_id").cast("string")).count() === 0)
    // value == original record (ReplicationApplicationTest.java:123)
    val roundTripped = out.select(col("r.*"))
    assert(roundTripped.count() === 200)
    assert(roundTripped.exceptAll(events).isEmpty && events.exceptAll(roundTripped).isEmpty)
  }

  test("values on the wire are framed with the registered schema id") {
    val env = freshEnv()
    val events = Tables.events(spark, sf).limit(10)
    Replication.stageSource(events, env.topics.sourceDir, "events-value",
      env.sourceReg, "Event")
    val raw = spark.read.parquet(env.topics.sourceDir)
      .select("value").collect().map(_.getAs[Array[Byte]](0))
    val expectedId = new FileSchemaRegistry(env.sourceReg)
      .latest("events-value").get._1
    raw.foreach { bytes =>
      val (id, body) = WireFormat.unframe(bytes)
      assert(id === expectedId)
      assert(body.nonEmpty)
    }
  }

  test("restart from checkpoint redelivers nothing (effective exactly-once)") {
    val env = freshEnv()
    val first = Tables.events(spark, sf).limit(100).cache()
    Replication.stageSource(first, env.topics.sourceDir, "events-value",
      env.sourceReg, "Event")
    Replication.start(spark, env.topics, "events-value", env.sourceReg, env.targetReg,
      idField = "event_id", maxFilesPerTrigger = 4).awaitTermination(120000)
    val afterFirst = Replication.readCommitted(spark, env.topics.targetDir).count()
    assert(afterFirst === 100)

    // restart with no new input: nothing re-emitted
    Replication.start(spark, env.topics, "events-value", env.sourceReg, env.targetReg,
      idField = "event_id", maxFilesPerTrigger = 4).awaitTermination(120000)
    assert(Replication.readCommitted(spark, env.topics.targetDir).count() === afterFirst)

    // new data arrives; restart processes exactly the delta
    val second = Tables.events(spark, sf)
      .orderBy(col("event_id").desc).limit(50).cache()
    Replication.stageSource(second, env.topics.sourceDir, "events-value",
      env.sourceReg, "Event")
    Replication.start(spark, env.topics, "events-value", env.sourceReg, env.targetReg,
      idField = "event_id", maxFilesPerTrigger = 4).awaitTermination(120000)
    assert(Replication.readCommitted(spark, env.topics.targetDir).count() === 150)
  }

  test("missing source topic is fatal (R9)") {
    val env = freshEnv()
    assertThrows[IllegalArgumentException] {
      Replication.start(spark, env.topics, "nope", env.sourceReg, env.targetReg)
    }
  }
}
