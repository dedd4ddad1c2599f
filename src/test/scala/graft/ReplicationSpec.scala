package graft

import java.nio.file.Files

import graft.avro.{AvroFunctions, InMemorySchemaRegistry}
import graft.streaming.Replication
import graft.streaming.Replication.Topics
import org.apache.spark.sql.functions._

/** M2 acceptance: the replication pipeline end-to-end, asserting exactly what
  * the reference's E2E test asserts — output key == value.id and value ==
  * original record (`ReplicationApplicationTest.java:122-123`) — plus
  * schema replication into the target registry and redelivery idempotence
  * (restart from checkpoint produces no duplicates, §2.1 R10).
  */
class ReplicationSpec extends SparkSpec {

  private def freshDirs(): Topics = {
    val root = Files.createTempDirectory("graft-repl").toString
    Topics(s"$root/topicA", s"$root/topicB", s"$root/checkpoint")
  }

  test("replicates events: key == value.id, value round-trips, schema registered") {
    val topics = freshDirs()
    val source = new InMemorySchemaRegistry
    val target = new InMemorySchemaRegistry

    val events = Tables.events(spark, sf).limit(200).cache()
    val schemaJson = Replication.stageSource(
      events, topics.sourceDir, "events-value", source, "Event")

    val q = Replication.start(spark, topics, "events-value", source, target,
      idField = "event_id", maxFilesPerTrigger = 8)
    q.awaitTermination(120000)

    // schema replicated: same content-addressed id in both registries
    assert(target.latest("events-value").map(_._1) === source.latest("events-value").map(_._1))

    val out = Replication.readCommitted(spark, topics.targetDir)
      .select(col("key"), AvroFunctions.fromAvro(col("value"), schemaJson).as("r"))
    // key == value.id (ReplicationApplicationTest.java:122)
    assert(out.filter(col("key") =!= col("r.event_id").cast("string")).count() === 0)
    // value == original record (ReplicationApplicationTest.java:123)
    val roundTripped = out.select(col("r.*"))
    assert(roundTripped.count() === 200)
    assert(roundTripped.exceptAll(events).isEmpty && events.exceptAll(roundTripped).isEmpty)
  }

  test("restart from checkpoint redelivers nothing (effective exactly-once)") {
    val topics = freshDirs()
    val source = new InMemorySchemaRegistry
    val target = new InMemorySchemaRegistry

    val first = Tables.events(spark, sf).limit(100).cache()
    Replication.stageSource(first, topics.sourceDir, "events-value", source, "Event")
    Replication.start(spark, topics, "events-value", source, target,
      idField = "event_id", maxFilesPerTrigger = 4).awaitTermination(120000)
    val afterFirst = Replication.readCommitted(spark, topics.targetDir).count()
    assert(afterFirst === 100)

    // restart with no new input: nothing re-emitted
    Replication.start(spark, topics, "events-value", source, target,
      idField = "event_id", maxFilesPerTrigger = 4).awaitTermination(120000)
    assert(Replication.readCommitted(spark, topics.targetDir).count() === afterFirst)

    // new data arrives; restart processes exactly the delta
    val second = Tables.events(spark, sf)
      .orderBy(col("event_id").desc).limit(50).cache()
    Replication.stageSource(second, topics.sourceDir, "events-value", source, "Event")
    Replication.start(spark, topics, "events-value", source, target,
      idField = "event_id", maxFilesPerTrigger = 4).awaitTermination(120000)
    assert(Replication.readCommitted(spark, topics.targetDir).count() === 150)
  }

  test("missing source topic is fatal (R9)") {
    val topics = freshDirs()
    val reg = new InMemorySchemaRegistry
    assertThrows[IllegalArgumentException] {
      Replication.start(spark, topics, "nope", reg, reg)
    }
  }
}
