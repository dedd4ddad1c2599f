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
      |This table is the freshest same-session run (2026-08-15, third
      |pass) and now covers the CDC family — q253 containment plus its
      |new q275 scoreboard and q276 cap dial, all flat (1.6–2.2×),
      |measured proof that the informative-universe df bound keeps the
      |chunk index AND its calibration passes linear. It also re-measures
      |the fixed-absolute-panel forms q272/q274 (2.7×/2.5× vs their
      |share-based siblings' 10.2×/9.6× on the same corpus pair IS the
      |linearization). Earlier passes drove this round's kernel fixes:
      |the first caught the
      |codebook-assignment L2 and SQ8 scoring as interpreted
      |`aggregate(zip_with(…))` HOFs (jstack-confirmed: the whole of q236's
      |46 s sat in ZipWith.eval — the q252 poison class, join-sized) and
      |the salted row_number prune as an O(n·log n) full sort of the N·Q
      |candidate stream; native `graft_sqdist`/`graft_dotl` kernels and the
      |k-bounded `graft_top_pairs` heap aggregate replaced them (q236
      |46.3→10.1 s, q249 33.1→7.3 s, q130 11.6→1.1 s at 10×). The second
      |run exposed the remaining 4–6 s floor under every assignment-shaped
      |query as the min_by/max(struct) argmax: a struct-typed aggregation
      |buffer cannot live in a HashAggregate, so Spark silently planned a
      |SortAggregate that FULL-SORTED the n×C assignment join (and Lloyd's
      |paid it per round). The k=1 graft_top_pairs heap keeps the same
      |winner without the sort: q236 10.1→3.6 s, q249 7.3→2.7 s, q251
      |4.2→1.1 s, q261 20.1→9.4 s, q141 15.7→11.3 s at 10× — bit-identical
      |results, oracles untouched, plan-pinned by ScaleDesignSpec (q66
      |carries no SortAggregate).
      |
      || query | t(1×) s | t(10×) s | ratio | reading |
      ||---|---|---|---|---|
      || q141_robust_outliers | 1.64 | 12.06 | 7.4× | exact median/MAD global sort — the documented non-scaling exact form; its 100 TB path is q141b |
      || q141b_robust_outliers_approx | 0.70 | 1.89 | 2.7× | the sketch sibling: better growth than exact q141, gap widens with scale |
      || q236_pq_ann | 1.26 | 4.65 | 3.7× (0.37/query) | flat ADC scan is O(N) per query BY CONTRACT; measured per-query cost is strongly sublinear — the corpus-level form the production q249 replaces |
      || q249_ivfpq_ann | 1.01 | 3.11 | 3.1× (0.31/query) | cell-pruned IVF-PQ: lowest growth of the PQ family and sublinear per query — the routing claim, measured |
      || q66_knn_ivf | 0.43 | 1.71 | 4.0× (0.40/query) | the bare IVF pillar: heap-argmax assignment + cell-pruned probe — tracks q249 as designed |
      || q130_quantized_ann | 0.53 | 0.91 | 1.7× (0.17/query) | SQ8 brute scan with the native integer-dot scorer: bandwidth-bound, strongly sublinear per query |
      || q86_kmeans_train | 1.98 | 2.69 | 1.4× | broadcast-assignment Lloyd's: fixed k and iterations, overhead-dominated at these sizes |
      || q102_pagerank | 1.43 | 8.51 | 5.9× | staged integer PageRank: edge fan-out grows with the denser synthetic graph; iterations fixed |
      || q184_basket_affinity | 0.73 | 2.39 | 3.3× | pair expansion bounded per order; shuffle grows linearly |
      || q41_dedup_ngram_jaccard | 1.29 | 1.08 | 0.8× | inverted index + df cutoff: bucket caps bound pair expansion — flat |
      || q67_dedup_embedding_lsh | 1.08 | 3.19 | 2.9× | banded LSH + capped buckets: mildly superlinear in bucket density, far under quadratic |
      || q251_probe_depth_calibration | 0.64 | 1.02 | 1.6× (0.16/query) | dial replays q66 at 3 depths over the grown panel — sublinear per query |
      || q261_minhash_recall_eval | 0.89 | 8.99 | 10.2× | exact side is Σ_fp df_panel·df_corpus (inverted-index bound): a SHARE panel grows both factors with the corpus — quadratic on this closed 31-word vocab, exactly the regime the GtBucketCap df cutoff guards; the 100 TB form is q272 |
      || q272_minhash_recall_eval_abs | 0.70 | 1.86 | 2.7× | the fixed-absolute-panel form: df_panel pinned by 64 docs, ground truth linear in corpus df mass — the q261 remedy, measured on the same corpus pair |
      || q273_minhash_cap_dial | 0.92 | 8.80 | 9.6× | the cap dial's exact side shares q261's share-panel inverted-index bound — super-linear BY CONTRACT on this closed vocab |
      || q274_minhash_cap_dial_abs | 0.72 | 1.82 | 2.5× | the dial at the fixed absolute panel: linear — what a 100 TB fleet schedules nightly |
      || q262_simhash_recall_eval | 0.49 | 0.80 | 1.6× | pigeonhole band scoreboard over 8-byte sigs: flat — the cheap nightly |
      || q263_media_simhash_recall_eval | 0.82 | 1.40 | 1.7× | same, media signatures |
      || q264_embedding_recall_eval | 0.41 | 5.04 | 12.3× (1.2/query) | exact side is panel×corpus cosine BY CONTRACT — linear per panel vector; the 100 TB form is q270's fixed absolute panel |
      || q265_bucket_cap_dial | 0.40 | 0.87 | 2.2× | one-pass multi-cap grading over the band index: flat |
      || q266_media_cap_dial | 0.64 | 1.33 | 2.1× | same, media |
      || q268_lsh_table_dial | 0.37 | 5.38 | 14.7× (1.5/query) | exact side shares q264's panel-cosine contract — the 100 TB form is q271's fixed absolute panel |
      || q253_media_cdc_containment | 0.48 | 1.04 | 2.2× | informative-universe chunk index: the df cutoff bounds every bucket AND every denominator — flat |
      || q275_cdc_recall_eval | 0.83 | 1.33 | 1.6× | CDC scoreboard: exact side rides the 128-bounded universe, so the ground-truth pass is as flat as the index it grades |
      || q276_cdc_cap_dial | 0.67 | 1.16 | 1.7× | one-pass multi-cap CDC grading (per-cap shares AND sizes): flat — no abs-panel form needed, unlike the panel-cosine dials |
      || q277_duplicate_span_extraction | 0.53 | 0.49 | 1.0× | unaligned span dedup (later-session back-to-back pair, single-pass form): one hash-keyed window shuffle + doc-local merges — linear by plan, fixed-overhead-dominated at these sizes |
      || q278_contamination_runs | 0.78 | 0.79 | 1.0× | contamination runs (same-session pair): broadcast eval windows, corpus never shuffles, doc-local islands — flat |
      |
      |Headline: the ANN family sits at 1.7–4.0× for 10× data with
      |sublinear per-query cost across the board — q130 (1.7×) < q249
      |(3.1×) ≈ q236 (3.7×) ≈ q66 (4.0×), all far below the pre-fix
      |HOF/sort forms (20.9×/13.6× first run, 8.2×/7.1× second). The
      |scoreboard/dial family splits as documented: pigeonhole-band and
      |df-bounded ground truth flat (1.6–2.2× — q262/q263/q265/q266 and
      |the whole CDC family q253/q275/q276); the share-based panels grow
      |super-linearly BY CONTRACT (q261 10.2×, q264 12.3×, q268 14.7×,
      |q273 9.6×) and each has its fixed-absolute-panel production
      |sibling measured linear on the same corpus pair (q272 2.7×, q274
      |2.5×; q270/q271 per their notes); q261's inverted-index side
      |remains the one the GtBucketCap bound exists to protect (its
      |growth is a closed-vocabulary artifact of the synthetic corpus —
      |df grows with corpus only because the vocab cannot).
      |
      |## Second decade: sf1.0-equivalent → sf10-equivalent (100× data)
      |
      |`ScaleCorpus /tmp/sfx100 100` (200k vectors, 50k docs, 60M
      |lineitem, 1.6 GB parquet), SPARK_DRIVER_MEM=48g; each pair below is
      |min-of-2 warm-JVM runs measured back-to-back on sfx10 and sfx100
      |(2026-08-16 run). This decade is where the BENCH CONTRACT itself
      |goes quadratic for corpus-level ANN — panels are a corpus share
      |(queries ∝ n) and the PQ codebook a corpus share (LUT rows ∝ n) —
      |so the table separates the production-regime claims (fixed
      |workload, fixed codebook: the linear rows) from the contract
      |artifacts, and it caught one REAL defect: q249's probed-LUT
      |broadcast collected 4.1 GiB to the driver and died on
      |spark.driver.maxResultSize; the footer-gated hint (see
      |`lutSideBytes`) now drops to a cent_id shuffle join above 256 MiB
      |and q249 completes (driver crash → 268.6 s) with the sf-scale plan
      |unchanged.
      |
      || query | t(10×) s | t(100×) s | ratio | reading |
      ||---|---|---|---|---|
      || q270_embedding_recall_eval_abs | 1.02 | 2.10 | 2.1× | the abs-panel linearization HOLDS into decade 2 — O(64·n) as designed |
      || q271_lsh_table_dial_abs | 0.85 | 1.43 | 1.7× | same — nightly table recalibration stays flat |
      || q272_minhash_recall_eval_abs | 2.64 | 11.89 | 4.5× | linear in df mass; above-linear residual is the closed-31-word-vocab artifact (df ∝ n because the vocab cannot grow) |
      || q274_minhash_cap_dial_abs | 2.56 | 23.73 | 9.3× | the dial grades all caps against the SAME df-mass ground truth — the vocab artifact compounds across the cap sweep; on an open vocab df saturates and this flattens to q272's slope |
      || q277_duplicate_span_extraction | 0.68 | 1.43 | 2.1× | unaligned span dedup: flat across BOTH decades |
      || q278_contamination_runs | 0.96 | 2.85 | 3.0× | broadcast-eval contamination runs: linear |
      || q141b_robust_outliers_approx | 3.20 | 18.33 | 5.7× | sketch percentiles: sublinear into decade 2 while exact q141 is the documented non-scaling form |
      || q130_quantized_ann | 1.50 | 24.11 | 16.1× | SQ8 brute scan: queries×corpus BY CONTRACT — 1.6×/query, still sublinear per query |
      || q66_knn_ivf | 1.83 | 84.9 | 46× | IVF exact: probes·cell_size ∝ n per query × queries ∝ n — quadratic by contract, but 3× cheaper than q249 HERE because its query side ships 512-byte vectors, not share-sized LUTs; with production's fixed codebook the PQ forms win back their decade-1 edge |
      || q236_pq_ann | 3.86 | 400.0 | 104× | flat ADC is O(queries·corpus) and the share-sized codebook makes LUT rows ∝ n on top — the contract's quadratic regime, measured; production fixes both factors (fixed workload, fixed 256-entry codebook) |
      || q249_ivfpq_ann | 3.14 | 268.6 | 86× | WAS a driver crash before the broadcast gate; completes with cells pruned. Cell pruning saves 10× in candidates but share-sized LUT transport dominates here — with a fixed codebook/workload the broadcast plan survives and per-query cost is the decade-1 sublinear reading |
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
