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
      |`ratio` = t(10×)/t(1×), min-of-3 in one warm JVM per corpus, both
      |corpora measured back-to-back (this box's co-tenant noise swings ±40%,
      |so cross-session ratios are not comparable; same-session ones are).
      |For the ANN/recall queries the QUERY PANEL is a fixed share of the
      |corpus, so 10× data also means 10× queries — a ratio of ~10 there is
      |CONSTANT per-query cost and `/query` (= ratio/10) is the signal; for
      |corpus-level queries the ratio itself is the signal.
      |
      |This run measures the round-12 PQ-family fix already applied: the
      |first 10× run caught the codebook-assignment L2 and SQ8 scoring as
      |interpreted `aggregate(zip_with(…))` HOFs (jstack-confirmed: the
      |whole of q236's 46 s sat in ZipWith.eval — the q252 poison class,
      |join-sized) and the salted row_number prune as an O(n·log n) full
      |sort of the N·Q candidate stream. Native `graft_sqdist`/`graft_dotl`
      |kernels and the k-bounded `graft_top_pairs` heap aggregate replaced
      |them: q236 46.3→10.1 s, q249 33.1→7.3 s, q130 11.6→1.1 s at 10×,
      |and 2.4× each at sf0.1 (bit-identical results, oracles untouched).
      |
      || query | t(1×) s | t(10×) s | ratio | reading |
      ||---|---|---|---|---|
      || q141_robust_outliers | 1.68 | 15.68 | 9.4× | exact median/MAD global sort — the documented non-scaling exact form; its 100 TB path is q141b |
      || q141b_robust_outliers_approx | 0.56 | 3.11 | 5.5× | the sketch sibling: ~2× better growth than exact q141, gap widens with scale |
      || q236_pq_ann | 1.23 | 10.09 | 8.2× (0.8/query) | flat ADC scan is O(N) per query BY CONTRACT; post-fix the measured per-query cost is ~constant — the corpus-level form the production q249 replaces |
      || q249_ivfpq_ann | 1.04 | 7.32 | 7.1× (0.7/query) | cell-pruned IVF-PQ: lowest growth of the ANN family and sublinear per query — the routing claim, measured |
      || q130_quantized_ann | 0.58 | 1.15 | 2.0× (0.2/query) | SQ8 brute scan with the native integer-dot scorer: bandwidth-bound, strongly sublinear per query |
      || q86_kmeans_train | 2.20 | 1.54 | 0.7× | broadcast-assignment Lloyd's: fixed k and iterations, overhead-dominated at these sizes |
      || q102_pagerank | 1.42 | 5.18 | 3.7× | staged integer PageRank: sublinear in edges (join fan-out grows, iterations fixed) |
      || q184_basket_affinity | 0.69 | 1.98 | 2.9× | pair expansion bounded per order; shuffle grows linearly |
      || q41_dedup_ngram_jaccard | 1.49 | 0.96 | 0.6× | inverted index + df cutoff: bucket caps bound pair expansion — flat |
      || q67_dedup_embedding_lsh | 1.29 | 3.96 | 3.1× | banded LSH + capped buckets: mildly superlinear in bucket density, far under quadratic |
      || q251_probe_depth_calibration | 0.79 | 4.19 | 5.3× (0.5/query) | dial replays q66 at 3 depths over the grown panel — sublinear per query |
      || q261_minhash_recall_eval | 0.92 | 20.12 | 21.9× | exact side is Σ_fp df_panel·df_corpus (inverted-index bound): dfs grow linearly on the fixed 31-word vocab, so the product grows ~quadratically — exactly the regime the GtBucketCap df cutoff guards; a real corpus's open vocabulary keeps dfs flat |
      || q262_simhash_recall_eval | 0.50 | 0.71 | 1.4× | pigeonhole band scoreboard over 8-byte sigs: flat — the cheap nightly |
      || q263_media_simhash_recall_eval | 0.82 | 1.65 | 2.0× | same, media signatures |
      || q264_embedding_recall_eval | 0.37 | 7.50 | 20.4× (2.0/query) | exact side is panel×corpus cosine BY CONTRACT — linear per panel vector; at 100 TB the panel is a fixed absolute sample, not a share |
      || q265_bucket_cap_dial | 0.43 | 0.95 | 2.2× | one-pass multi-cap grading over the band index: flat |
      || q266_media_cap_dial | 0.78 | 1.73 | 2.2× | same, media |
      || q268_lsh_table_dial | 0.46 | 6.56 | 14.4× (1.4/query) | exact side shares q264's panel-cosine contract — same remedy (absolute panel) |
      |
      |Headline: the ANN production path ranks exactly as designed at 10× —
      |q249 (7.1×) < q236 (8.2×) < the pre-fix HOF forms (20.9×/13.6×,
      |first run), with q130's re-rank layout at 2.0×. The scoreboard/dial
      |family splits as documented: pigeonhole-band ground truth flat
      |(1.4–2.2×), panel-cosine ground truth linear-per-panel-vector (the
      |q42 contract; fixed absolute panels at 100 TB), and q261's
      |inverted-index side the one the GtBucketCap bound exists to protect
      |(its 21.9× here is a closed-vocabulary artifact of the synthetic
      |corpus — df grows with corpus only because the vocab cannot).
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
