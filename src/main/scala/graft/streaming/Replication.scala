package graft.streaming

import java.nio.file.{Files, Paths}

import graft.avro.{AvroFunctions, FileSchemaRegistry}
import org.apache.avro.Schema
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.{BinaryType, StructField, StructType}

/** The reference pipeline, Spark-native (SURVEY.md §2.1 R1–R10, §3):
  *
  * {{{
  *   topic A (wire-framed Avro values)                 R1  readStream micro-batch
  *     → per-record registry-resolved decode           R2  WireAvroToCatalyst
  *     → key := value.id                               R3  Project
  *     → re-encode + register schema in target registry R7 CatalystToAvro + frame
  *     → atomically committed batch to topic B         R4-R6, R8  foreachBatch
  * }}}
  *
  * A "topic" is a directory of parquet files with a single binary `value`
  * column carrying wire-framed Avro ([[graft.avro.WireFormat]]: magic byte +
  * schema id + body — the Confluent framing shape, R2's actual mechanism).
  * Registries are file-backed ([[FileSchemaRegistry]]) and addressed by ROOT
  * PATH so executors resolve writer schemas per record; at 100 TB that root
  * lives on a shared store and the per-executor schema cache makes lookups
  * one-time.
  *
  * Delivery semantics — deliberately matching the reference
  * (`ReplicationApplication.java:96-100`, SURVEY.md §2.1 note): the batch
  * write is atomic and progress is recorded only after durable output, via
  * the checkpoint WAL (≡ R8 manual offset ack) plus a per-batch commit
  * marker that makes redelivered batches idempotent — upgrading the
  * reference's "at-least-once with committed duplicates" to effective
  * exactly-once.
  */
object Replication {

  final case class Topics(sourceDir: String, targetDir: String, checkpointDir: String)

  /** Stage a DataFrame as the source "topic": register the writer schema in
    * the source registry and write wire-framed Avro values (what the
    * upstream producer's serializer would have done — R7 on the produce
    * side). */
  def stageSource(df: DataFrame, topicDir: String, subject: String,
                  registryRoot: String, recordName: String = "Value"): String = {
    val schemaJson = AvroFunctions.writerSchemaFor(df.schema, recordName)
    val id = new FileSchemaRegistry(registryRoot)
      .register(subject, new Schema.Parser().parse(schemaJson))
    df.select(AvroFunctions.toAvroWire(
      struct(df.columns.map(col): _*), id, recordName).as("value"))
      .write.mode("append").parquet(topicDir)
    schemaJson
  }

  /** Start the replication stream. Fails fast if the source topic is missing
    * (R9, `setMissingTopicsFatal` ≡ `ReplicationApplication.java:41`). */
  def start(spark: SparkSession, topics: Topics, subject: String,
            sourceRegistryRoot: String, targetRegistryRoot: String,
            idField: String = "id", maxFilesPerTrigger: Int = 1,
            availableNow: Boolean = true): StreamingQuery = {
    require(Files.exists(Paths.get(topics.sourceDir)),
      s"source topic ${topics.sourceDir} does not exist (missing-topics-fatal)")
    val source = new FileSchemaRegistry(sourceRegistryRoot)
    val (_, readerSchema) = source.latest(subject).getOrElse(
      throw new IllegalStateException(s"no schema for subject $subject in source registry"))

    // R7: the serializer registers the value schema in the target registry
    // before first produce — content-addressed, hence idempotent.
    val targetId = new FileSchemaRegistry(targetRegistryRoot)
      .register(subject, readerSchema)

    val src = spark.readStream
      .schema(StructType(Seq(StructField("value", BinaryType))))
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(topics.sourceDir)

    val projected = src
      .select(AvroFunctions.fromAvroWire(col("value"),
        readerSchema.toString, sourceRegistryRoot).as("r"))                  // R2
      .select(col("r").getField(idField).cast("string").as("key"), col("r")) // R3
      .select(col("key"),
        AvroFunctions.toAvroWire(col("r"), targetId, "Value").as("value"))   // R7

    val writer = projected.writeStream
      .option("checkpointLocation", topics.checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>                   // R4-R6, R8
        commitBatch(batch, topics.targetDir, batchId)
      }
    (if (availableNow) writer.trigger(Trigger.AvailableNow()) else writer).start()
  }

  /** Atomic, idempotent per-batch commit: write into a batch-keyed directory
    * (overwrite ⇒ redelivery rewrites the same data), then drop a commit
    * marker. Readers via [[readCommitted]] only see marked batches —
    * the `read_committed` visibility contract (R6, `application.yml:10`). */
  private def commitBatch(batch: DataFrame, targetDir: String, batchId: Long): Unit = {
    val commits = Paths.get(targetDir, "_commits")
    Files.createDirectories(commits)
    val marker = commits.resolve(batchId.toString)
    if (!Files.exists(marker)) {
      batch.write.mode("overwrite").parquet(s"$targetDir/data/batch=$batchId")
      Files.createFile(marker)
    }
  }

  /** Consume the target topic with read-committed visibility. */
  def readCommitted(spark: SparkSession, targetDir: String): DataFrame = {
    val commits = Paths.get(targetDir, "_commits")
    val ids: Seq[Long] =
      if (!Files.exists(commits)) Nil
      else {
        val s = Files.list(commits)
        try {
          import scala.jdk.CollectionConverters._
          s.iterator().asScala.map(_.getFileName.toString.toLong).toSeq.sorted
        } finally s.close()
      }
    if (ids.isEmpty)
      spark.emptyDataFrame
    else
      spark.read.parquet(ids.map(id => s"$targetDir/data/batch=$id"): _*)
  }
}
