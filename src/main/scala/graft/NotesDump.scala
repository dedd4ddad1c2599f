package graft

/** Regenerates SCALE.md from the catalog's per-query scale notes:
  * `sbt "runMain graft.NotesDump"` writes the file directly (no stdout
  * redirect, so sbt's own log lines can never leak into the document). */
object NotesDump {
  def main(args: Array[String]): Unit = {
    val target = args.headOption.getOrElse("SCALE.md")
    val out = new StringBuilder
    out ++= "# SCALE — per-operator 100 TB strategy\n\n"
    out ++= "Generated from `GraftQuery.note` (source of truth lives next to each\n"
    out ++= "implementation). Regenerate: `sbt \"runMain graft.NotesDump\"`.\n\n"
    out ++= "| query | oracle | 100 TB strategy |\n"
    out ++= "|---|---|---|\n"
    SparkEntry.catalog.foreach { q =>
      val oracle = if (q.oracle.isDefined) "duckdb" else "spec/rows"
      val note = q.note.replace("|", "\\|").replace("\n", " ")
      out ++= s"| `${q.name}` | $oracle | $note |\n"
    }
    out ++= kafkaBinding
    java.nio.file.Files.writeString(java.nio.file.Paths.get(target), out.toString)
    println(s"[notesdump] wrote $target (${SparkEntry.catalog.size} queries)")
  }

  /** The one functional gap vs the reference, with its drop-in recipe —
    * kept in code so SCALE.md regeneration preserves it. */
  private val kafkaBinding: String =
    """
      |## Kafka binding (the one unlinkable dependency)
      |
      |The reference speaks to live Kafka brokers and two Confluent
      |registries (`ReplicationApplication.java:35-52`, `application.yml:5-17`);
      |this sandbox has no `spark-sql-kafka` jar, no broker and zero egress,
      |so topics run behind the `TopicSource`/`TopicSink` seam
      |(`streaming/Topic.scala`) over committed parquet directories. The seam
      |contract is pinned by `TopicContract` (`TopicContractSpec.scala`):
      |truthful `exists` (R9 fail-fast), whole-batch exactly-once visibility
      |(R5/R6), idempotent redelivery per `batchId` (R8/R10), invisibility of
      |failed commits with exactly-once retry, commit-order delivery to
      |chained consumers, strict no-op on a batchId replayed AFTER later
      |commits (the restart-replay race: the re-offered frame may even be
      |regenerated with different rows — a committed id must never be
      |re-applied), and byte-exact transport of mixed-schema-version batches
      |(per-record framed writer ids must survive the seam untouched; a
      |binding that canonicalizes, trims or re-frames `value` breaks
      |per-record resolution). The file impls pass it; a live binding lands
      |by:
      |
      |1. `KafkaTopicSource`: `exists` = AdminClient topic lookup;
      |   `stream(spark)` = `spark.readStream.format("kafka")
      |   .option("subscribe", topic).option("includeHeaders", true)` with
      |   `startingOffsets` from the checkpoint — the `value` binary column
      |   is already the seam's shape.
      |2. `KafkaTopicSink`: `commitBatch(df, batchId)` = a transactional
      |   producer per attempt with `transactional.id` derived from
      |   (sink id, batchId); begin → send all → commitTransaction. The
      |   transaction commit IS the atomic-visibility marker (replacing the
      |   file impl's directory rename); an aborted attempt is invisible to
      |   `read_committed` consumers, and a replayed `batchId` fences the
      |   zombie producer via the epoch — the same idempotence the file impl
      |   gets from its `batch=N` existence check.
      |3. Registries: `ConfluentHttpRegistry` already speaks the Confluent
      |   REST wire protocol over live HTTP (RegistrySpec exercises a real
      |   client/server pair); point it at the two registry URLs.
      |4. Run `TopicContract` with the Kafka factories (testcontainers or a
      |   dev broker). Passing unchanged is the definition of done —
      |   `Replication.start` is written against the traits only.
      |""".stripMargin
}
