package graft.streaming

import java.nio.file.{Files, Paths}

import graft.avro.{AvroFunctions, SchemaRegistry}
import org.apache.avro.Schema
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** The reference pipeline, Spark-native (SURVEY.md §2.1 R1–R10, §3):
  *
  * {{{
  *   topic A (Avro-binary files)                       R1  readStream micro-batch
  *     → decode via source-registry schema             R2  AvroToCatalyst
  *     → key := value.id                               R3  Project
  *     → re-encode, register schema in target registry R7  CatalystToAvro
  *     → atomically committed batch to topic B         R4-R6, R8  foreachBatch
  * }}}
  *
  * A "topic" here is a directory of parquet files with a single Avro-binary
  * `value` column (no Kafka connector in this sandbox; the binding is
  * source-format-local, everything downstream is identical).
  *
  * Delivery semantics — deliberately matching the reference
  * (`ReplicationApplication.java:96-100`, SURVEY.md §2.1 note): the batch
  * write is atomic (all-or-nothing per micro-batch) and progress is recorded
  * only after durable output, via two mechanisms:
  *   - Structured Streaming's checkpoint WAL (≡ R8 manual offset ack), and
  *   - a per-batch commit marker making redelivered batches idempotent
  *     (`overwrite` into a batch-keyed directory + marker file), which
  *     upgrades the reference's "at-least-once with committed duplicates"
  *     to effective exactly-once — an upgrade SURVEY.md §2.1 calls out as
  *     free under this design.
  *
  * At scale: the pipeline is embarrassingly parallel (row-local codec work,
  * no exchange); throughput is bounded by source scan + sink write, and the
  * micro-batch size knob (`maxFilesPerTrigger` ≡ Kafka `max.poll.records`,
  * README.adoc:34) bounds memory.
  */
object Replication {

  final case class Topics(sourceDir: String, targetDir: String, checkpointDir: String)

  /** Stage a DataFrame as the source "topic": encode rows to Avro binary and
    * register the writer schema in the source registry (test/setup path —
    * what the upstream producer would have done). */
  def stageSource(df: DataFrame, topicDir: String, subject: String,
                  registry: SchemaRegistry, recordName: String = "Value"): String = {
    val schemaJson = AvroFunctions.writerSchemaFor(df.schema, recordName)
    registry.register(subject, new Schema.Parser().parse(schemaJson))
    df.select(AvroFunctions.toAvro(struct(df.columns.map(col): _*), recordName).as("value"))
      .write.mode("append").parquet(topicDir)
    schemaJson
  }

  /** Start the replication stream. Fails fast if the source topic is missing
    * (R9, `setMissingTopicsFatal` ≡ `ReplicationApplication.java:41`). */
  def start(spark: SparkSession, topics: Topics, subject: String,
            sourceRegistry: SchemaRegistry, targetRegistry: SchemaRegistry,
            idField: String = "id", maxFilesPerTrigger: Int = 1,
            availableNow: Boolean = true): StreamingQuery = {
    require(Files.exists(Paths.get(topics.sourceDir)),
      s"source topic ${topics.sourceDir} does not exist (missing-topics-fatal)")
    val (_, schema) = sourceRegistry.latest(subject).getOrElse(
      throw new IllegalStateException(s"no schema for subject $subject in source registry"))
    val schemaJson = schema.toString

    // R7: the serializer registers the (identical) schema in the target
    // registry before first produce — content-addressed, hence idempotent.
    targetRegistry.register(subject, schema)

    val src = spark.readStream
      .schema(StructType(Seq(org.apache.spark.sql.types.StructField(
        "value", org.apache.spark.sql.types.BinaryType))))
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(topics.sourceDir)

    val projected = src
      .select(AvroFunctions.fromAvro(col("value"), schemaJson).as("r"))     // R2
      .select(col("r").getField(idField).cast("string").as("key"), col("r")) // R3
      .select(col("key"),
        AvroFunctions.toAvro(col("r"), "Value").as("value"))                 // R7

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
