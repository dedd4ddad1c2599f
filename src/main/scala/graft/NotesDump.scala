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
    out ++= maintenanceEvidence
    out ++= manifestEvidence
    out ++= round16Evidence
    out ++= kafkaBinding
    java.nio.file.Files.writeString(java.nio.file.Paths.get(target), out.toString)
    println(s"[notesdump] wrote $target (${SparkEntry.catalog.size} queries)")
  }

  /** Measured scale-headroom evidence (VERDICT r11 item 5) — kept in code
    * so SCALE.md regeneration preserves it. Data: `graft.ScaleCorpus`
    * synthesizes a statistics-mimicking corpus (doc token/lang/source
    * distributions, unit-norm embeddings, TPC-H-ish key cardinalities and
    * 4 lines/order — measured off the driver's sf0.1) at mult=1/10/100 of
    * sf0.1 sizes; since round 13 the document vocabulary is OPEN (Zipf(1)
    * ranks over a type set ∝ mult — see ScaleCorpus) so df-mass-bounded
    * forms measure their real slope instead of the closed-31-word
    * artifact. `graft.ScaleBench` / `graft.BenchOne` time the headline
    * set; min over same-day repeated runs (this box's co-tenant noise
    * swung up to 5× between sessions during the round-13 window, and a
    * long shared ScaleBench session accumulates pollution at sfx100 —
    * fresh-JVM BenchOne re-measures confirmed the table's outliers). */
  private val growthEvidence: String =
    """
      |## Measured growth: sf0.1-equivalent → sf1.0-equivalent (10× data)
      |
      |Generator: `sbt "runMain graft.ScaleCorpus /tmp/sfx1 1"` and
      |`... /tmp/sfx10 10`; measurement: `sbt "runMain graft.ScaleBench <dir>"`.
      |`ratio` = t(10×)/t(1×). Round-13 re-measure (2026-08-16) on the OPEN-
      |vocabulary corpus (Zipf(1) token ranks over a type set ∝ mult —
      |30/309/3099 measured types at mult 1/10/100): each number is the
      |min over two full back-to-back ScaleBench sessions (3 reps each), so
      |six samples per cell — this window's co-tenant noise swung
      |individual reps up to 5×, and min-of-many on BOTH sides is the
      |honest steady-state estimator (noise only ever adds time).
      |For the ANN/recall queries the QUERY PANEL is a fixed share of the
      |corpus, so 10× data also means 10× queries — a ratio of ~10 there is
      |CONSTANT per-query cost; for corpus-level queries the ratio itself
      |is the signal. The r12 kernel history (native graft_sqdist/graft_dotl
      |/graft_top_pairs replacing interpreted HOFs and the SortAggregate
      |argmax; q236 46.3→3.6 s at 10×) is recorded in the r12 VERDICT and
      |the ScaleDesignSpec plan pins that keep it from regressing.
      |
      |The headline round-13 change: the closed 31-word vocabulary made
      |EVERY shingle's df ∝ n, which is what drove q261 10.2× / q273 9.6×
      |last round. On the open vocab the SAME share-panel forms measure
      |2.0×/2.3× at this decade — the decade-1 "quadratic" was the corpus
      |artifact, not the plan. (The Zipf HEAD still has df ∝ n, as real
      |stopwords do, so the share forms do go super-linear at decade 2 —
      |see below — which is exactly why the abs-panel siblings are the
      |production contract.)
      |
      || query | t(1×) s | t(10×) s | ratio | reading |
      ||---|---|---|---|---|
      || q141_robust_outliers | 1.70 | 7.96 | 4.7× | exact median/MAD global sort — the documented non-scaling exact form; its 100 TB path is q141b |
      || q141b_robust_outliers_approx | 0.65 | 1.84 | 2.8× | the sketch sibling: better growth than exact q141, gap widens with scale |
      || q236_pq_ann | 1.03 | 3.63 | 3.5× (0.35/query) | flat ADC scan is O(N) per query BY CONTRACT; measured per-query cost is strongly sublinear — the corpus-level form the production q279 pins |
      || q249_ivfpq_ann | 1.01 | 2.47 | 2.4× (0.25/query) | cell-pruned IVF-PQ: lowest growth of the PQ family and sublinear per query — the routing claim, measured |
      || q66_knn_ivf | 0.48 | 1.42 | 2.9× (0.29/query) | the bare IVF pillar: heap-argmax assignment + cell-pruned probe — tracks q249 as designed |
      || q130_quantized_ann | 0.53 | 0.84 | 1.6× (0.16/query) | SQ8 brute scan with the native integer-dot scorer: bandwidth-bound, strongly sublinear per query |
      || q86_kmeans_train | 2.12 | 2.05 | 1.0× | broadcast-assignment Lloyd's: fixed k and iterations, overhead-dominated at these sizes |
      || q102_pagerank | 1.58 | 12.19 | 7.7× | staged integer PageRank: edge fan-out grows with the denser synthetic graph; iterations fixed |
      || q184_basket_affinity | 0.71 | 1.82 | 2.6× | pair expansion bounded per order; shuffle grows linearly |
      || q41_dedup_ngram_jaccard | 2.62 | 3.36 | 1.3× | inverted index + df cutoff: bucket caps bound pair expansion — flat (t(1×) higher than r12: the open vocab leaves more informative shingles under the cutoff, the honest regime) |
      || q67_dedup_embedding_lsh | 1.13 | 2.71 | 2.4× | banded LSH + capped buckets: mildly superlinear in bucket density, far under quadratic |
      || q251_probe_depth_calibration | 0.57 | 1.00 | 1.8× (0.18/query) | dial replays q66 at 3 depths over the grown panel — sublinear per query |
      || q261_minhash_recall_eval | 2.56 | 5.24 | 2.0× | the share-panel scoreboard on the OPEN vocab: last round's 10.2× was the closed-vocab df artifact; at this decade the df-bounded exact side is near-linear |
      || q272_minhash_recall_eval_abs | 0.93 | 2.10 | 2.3× | the fixed-absolute-panel production form — same slope as the dial |
      || q262_simhash_recall_eval | 0.51 | 0.85 | 1.7× | pigeonhole band scoreboard over 8-byte sigs: flat — the cheap nightly |
      || q263_media_simhash_recall_eval | 0.71 | 1.00 | 1.4× | same, media signatures |
      || q264_embedding_recall_eval | 0.44 | 4.46 | 10.1× (1.0/query) | exact side is panel×corpus cosine BY CONTRACT — constant per panel vector; the 100 TB form is q270's fixed absolute panel |
      || q265_bucket_cap_dial | 0.47 | 0.70 | 1.5× | one-pass multi-cap grading over the band index: flat |
      || q266_media_cap_dial | 0.59 | 1.01 | 1.7× | same, media |
      || q268_lsh_table_dial | 0.37 | 4.39 | 11.9× (1.2/query) | exact side shares q264's panel-cosine contract — the 100 TB form is q271's fixed absolute panel |
      || q273_minhash_cap_dial | 2.31 | 5.26 | 2.3× | the cap dial on the open vocab — last round's 9.6× was the same closed-vocab artifact |
      || q274_minhash_cap_dial_abs | 0.87 | 1.97 | 2.3× | the dial at the fixed absolute panel: linear — what a 100 TB fleet schedules nightly |
      || q253_media_cdc_containment | 0.39 | 1.87 | 4.8× | CDC chunk index: the open vocab diversifies payload bytes, so MORE informative chunks survive the df cutoff than on the closed corpus — growth is index mass, honest and near-linear in it |
      || q275_cdc_recall_eval | 0.52 | 1.49 | 2.9× | CDC scoreboard rides the df-bounded universe |
      || q276_cdc_cap_dial | 0.50 | 1.38 | 2.8× | one-pass multi-cap CDC grading (per-cap shares AND sizes) |
      || q277_duplicate_span_extraction | 0.17 | 0.29 | 1.7× | unaligned span dedup: one hash-keyed window shuffle + doc-local merges — linear by plan, overhead-dominated here |
      || q278_contamination_runs | 0.35 | 0.51 | 1.5× | broadcast eval windows, corpus never shuffles, doc-local islands — flat |
      || q279_pq_ann_fixed | 0.63 | 1.20 | 1.9× | NEW round 13: q236 under the production dials (≤64 abs queries, ≤256-entry codebook) — linear-by-plan flat scan, overhead-dominated at this decade |
      || q280_ivfpq_ann_fixed | 0.78 | 1.24 | 1.6× | NEW round 13: q249 under the production dials + ⌊√n⌋ cells — the lowest-growth ANN form on the board |
      || q281_ivfpq_index_serve | 1.04 | 1.55 | 1.5× | NEW round 13: the stored-index serve path (fresh-JVM min-of-5, rep 1's memoized install excluded as build) — flat at this decade, sublinear at the next (see below) |
      |
      |Headline: the ANN family sits at 1.6–3.5× for 10× data with
      |sublinear per-query cost across the board, and the NEW fixed-dial
      |production forms (q279 1.9×, q280 1.6×) grow slower than every
      |share-contract sibling. The scoreboard/dial family now splits
      |three ways: pigeonhole-band and df-bounded ground truth flat
      |(1.4–1.7×), the minhash share forms near-linear on the open vocab
      |(2.0–2.3× — the r12 "quadratic" was the closed-vocab df artifact),
      |and the panel-cosine contracts super-linear by design (q264 10.1×,
      |q268 11.9×) with their abs-panel production siblings measured flat.
      |
      |## Second decade: sf1.0-equivalent → sf10-equivalent (100× data)
      |
      |`ScaleCorpus /tmp/sfx100 100` (200k vectors, 50k docs, 60M
      |lineitem, 1.6 GB parquet, 3 099 vocabulary types),
      |SPARK_DRIVER_MEM=48g; round-13 rows (2026-08-16) are min over two
      |back-to-back ScaleBench subset sessions (2–3 reps) PLUS a fresh-JVM
      |BenchOne min-of-4 — the shared sfx100 session accumulates GC/page
      |pressure that inflated q270 to ~5 s where a fresh JVM pins 0.99 s,
      |so every headline row was cross-checked fresh. Rows marked (r12)
      |are the 2026-08-16 round-12 measurements on the identical
      |embeddings/lineitem data (the vocab change touches only documents)
      |— kept for the share-contract ANN regime, where the r13 lesson
      |(q249's 4.1 GiB LUT broadcast driver crash → footer-gated hint →
      |268.6 s completion) still stands.
      |
      || query | t(10×) s | t(100×) s | ratio | reading |
      ||---|---|---|---|---|
      || q270_embedding_recall_eval_abs | 0.55 | 0.99 | 1.8× | the abs-panel linearization HOLDS into decade 2 — O(64·n) as designed |
      || q271_lsh_table_dial_abs | 0.42 | 0.76 | 1.8× | same — nightly table recalibration stays flat |
      || q272_minhash_recall_eval_abs | 2.30 | 5.10 | 2.2× | ON THE OPEN VOCAB the r12 artifact reading (4.5×) flattens to the q270/q271 slope — VERDICT r12 item 2, closed |
      || q274_minhash_cap_dial_abs | 2.16 | 4.88 | 2.3× | was 9.3× on the closed vocab; the cap sweep no longer compounds a df artifact — same slope as q272, as predicted |
      || q261_minhash_recall_eval | 15.4 | 99.6 | 6.5× | the SHARE panel at decade 2: the Zipf head's df ∝ n (real stopword behavior) × panel ∝ n is super-linear BY CONTRACT — the regime the abs forms exist to replace (same-session pair; the box floor moved between sessions) |
      || q273_minhash_cap_dial | 6.4 | 101.2 | 15.9× | share-panel dial, same contract regime as q261 |
      || q253_media_cdc_containment | 1.87 | 3.06 | 1.6× | CDC containment: flat into decade 2 |
      || q275_cdc_recall_eval | 1.49 | 3.67 | 2.5× | CDC scoreboard: df-bounded ground truth stays linear |
      || q276_cdc_cap_dial | 1.38 | 3.56 | 2.6× | CDC cap dial: one-pass grading stays linear |
      || q277_duplicate_span_extraction | 0.29 | 0.52 | 1.8× | unaligned span dedup: flat across BOTH decades, both vocabularies |
      || q278_contamination_runs | 0.51 | 1.45 | 2.8× | broadcast-eval contamination runs: linear |
      || q279_pq_ann_fixed | 1.31 | 5.54 | 4.2× | NEW: the fixed-dial flat-scan PQ — ~linear for 10× data where share-form q236 measured 104× (r12); the production regime, measured, not argued |
      || q280_ivfpq_ann_fixed | 1.44 | 15.3 | 10.6× | NEW: fixed dials + ⌊√n⌋ cells — 17× cheaper than share-form q249's 268.6 s at the same corpus. Total is BUILD-dominated (n·√n assignment + n·256 codes, the amortizable index build); the QUERY side is probes·√n by plan — measured 714→2 128 scanned candidates/query for 10× data (≈√10), with the 2.6 MB qside broadcast retained under the driver-safety budget (plan-pinned) |
      || q281_ivfpq_index_serve | 1.55 | 3.63 | 2.3× | NEW: q280 served FROM the installed PQ-index pillar — the build/serve split measured directly. Rep 1 pays the one-time install (16.3 s / 250.2 s — q280's build, amortized); steady-state serve is 1.55→3.63 s for 10× data, SUBLINEAR wall-clock on the pure query path (probes·√n scan + dynamic-partition-pruned stored-codes read, plan-pinned), 74× cheaper than share-form q249's total at the same corpus |
      || q141b_robust_outliers_approx (r12) | 3.20 | 18.33 | 5.7× | sketch percentiles: sublinear into decade 2 while exact q141 is the documented non-scaling form |
      || q130_quantized_ann (r12) | 1.50 | 24.11 | 16.1× | SQ8 brute scan: queries×corpus BY CONTRACT — 1.6×/query, still sublinear per query |
      || q66_knn_ivf (r12) | 1.83 | 84.9 | 46× | IVF exact at share contract: probes·cell_size ∝ n per query × queries ∝ n — quadratic by contract; q280 is the fixed-dial remedy, measured above |
      || q236_pq_ann (r12) | 3.86 | 400.0 | 104× | flat ADC with share-sized panel AND codebook — the contract's quadratic regime; q279 is the fixed-dial remedy, measured above (5.5 s at the same corpus) |
      || q249_ivfpq_ann (r12) | 3.14 | 268.6 | 86× | WAS a driver crash before the broadcast gate; completes with cells pruned. Share-sized LUT transport dominates; q280 (fixed codebook/workload) keeps the broadcast plan and collapses this to 15.3 s |
      |
      |The round-12 prescription asked for the production ANN regime to be
      |measured directly rather than argued from the share-form artifacts:
      |q279/q280/q281 are those measurements, and together they decompose
      |the cost the way a deployment sees it. (1) Scan sublinearity at the
      |operator level: scanned candidates/query are probes·(n/⌊√n⌋) =
      |233/714/2 128 at mult 1/10/100 (measured from the corpus with the
      |shipped stride rule), ×3.0 per decade for ×10 data. (2) Wall-clock
      |sublinearity on the pure query path: q281 serves q280's exact rows
      |from the installed PQ-index pillar (stored codes partitioned by
      |cent_id + the exact quantizer frames they were coded with, one
      |ATOMIC_MOVE artifact) at 1.55→3.63 s for 10× data — the per-query
      |serve cost is 24→57 ms, sublinear, with the one-time build (250 s
      |at 100×, q280's total) amortized into the install the way
      |production amortizes it across millions of queries. (3) The plan
      |holds the scale properties by construction: the qside broadcast is
      |retained under the driver-safety budget at any corpus size, the
      |stored scan carries a dynamic-partition-pruning filter from the
      |probed-cell join (serve I/O is probes·|cell|, not |index|), and all
      |three forms are oracle-checked hash-exact at sf (q281 shares q280's
      |oracle text — stored and derived codes are one contract, pinned
      |row-identical by spec).
      |""".stripMargin

  /** Round-14 measurements: the streaming-admission surface and the
    * stored-index maintenance economics — kept in code so SCALE.md
    * regeneration preserves them. */
  private val maintenanceEvidence: String =
    """
      |## Streaming admission, measured (round 14)
      |
      |`sbt "runMain graft.StreamBench <dir> <label>"` — the corpus's
      |documents re-chunked into a FIXED 10 micro-batches (chunk count held
      |constant across scales so per-batch overhead divides out), RocksDB
      |state store, signature/window derivation inside the stream's scan
      |stage as an ingest pipeline runs it. 2026-08-16 back-to-back pair
      |(x1 ran first in the fresh JVM and absorbs codegen/RocksDB warm-up —
      |compare state_rows structurally and rows/s at x10):
      |
      || op | x1 docs/s | x10 docs/s | x1 state rows | x10 state rows | state = | bounded by |
      ||---|---|---|---|---|---|---|
      || spanAdmitTws | 139 (warm-up-dominated) | 3 115 | 119 672 | 2 247 618 | one 24-byte owner per DISTINCT window hash | corpus distinct-window count (the index itself) — grows with data, hash-partitioned across executors |
      || contaminationRunTws | 421 | 3 850 | 4 283 | 20 898 | merged run intervals per CONTAMINATED doc | eval-overlap mass only: 4.2k/20.9k state rows for 5k/50k docs — the ~92% clean majority never creates state |
      || minhashAdmitTws | 477 | 2 794 | 79 964 | 799 973 | ≤cap member rows per (band, key) bucket | 16 × docs exactly (79 964 ≈ 16·5 000 minus empty docs) — the banded index, capped per bucket |
      |
      |Readings: state sizes land exactly where the docstrings claim —
      |span state = the distinct-window index, contamination state = the
      |contaminated fraction only, minhash state = 16 rows/doc with the
      |cap bounding every bucket. Throughput grows with batch size
      |(3.1-3.9k docs/s at x10 on local[16] with 5k-doc batches) because
      |per-micro-batch overhead amortizes — the 100 TB posture is bigger
      |batches, the same bounded state.
      |
      |## Stored-index maintenance economics (round 14)
      |
      |`sbt "runMain graft.IndexMaintBench <dir> <label>"` — per postings
      |pillar: one full install (`build`, the amortized cost), the pair
      |set served FROM the store (`serve`, min-of-reps warm), and a FIXED
      |64-doc/64-vector batch admitted against the stored postings
      |(`admit64`, min-of-reps — the nightly-ingest unit, which must stay
      |sublinear in corpus size). Same-day x1→x10→x100 runs, 2026-08-16:
      |
      || pillar | build x1→x10→x100 | serve x1→x10→x100 | admit64 x1→x10→x100 | reading |
      ||---|---|---|---|---|
      || SimHash postings (q283) | 4.8→5.9→11.2 s | 0.69→1.46→1.70 s | 0.71→1.03→3.29 s | serve near-FLAT across two decades (index-sized banding, ~zero pairs on the open-vocab corpus); fixed-batch admission 4.6× for 100× data — only the probed stored lists grow (x100 admit pairs drop to 0: the clones' Zipf-head band buckets saturate past the cap, the bound doing its job) |
      || MinHash postings (q284) | 1.1→2.0→8.7 s | 0.34→0.64→2.92 s | 0.63→1.01→3.81 s | signature recompute gone from every read; admission probes 16 keys/doc against stored lists — 6× for 100× data |
      || sign-LSH postings (q285) | 0.56→0.85 s | 0.96→3.26→291 s | 1.06→1.83 s | serve grows with the PAIR OUTPUT, not signature work: 2 682→96 377→millions of cos≥0.35 candidates in the uniform synthetic cloud. Fresh-JVM live q67 at x100 is 268 s — stored serve ≈ live because candidate CONFIRM (shared by both) dominates; the pillar's savings are the signature build, which this geometry makes negligible. The production lever for pair-volume regimes is the cap/table dials, not storage |
      || CDC chunk postings (q286) | 0.68→1.33→3.0 s | 0.34→2.21→5.26 s | 0.56→1.24→3.18 s | install owns the payload walk; serve re-prices df index-level — 15× wall for 100× data; admission 5.7× for 100× |
      |
      |PQ-index incremental maintenance (fixed production dials, q281's
      |artifact): `appendPqIndex` codes ONLY the new vec_ids against the
      |installed quantizers, carries the stored codes by FILE COPY, and
      |appends the delta rows into the copied cent_id layout. The first
      |measurement of this round exposed why the copy matters: a Spark
      |REWRITE of the carried codes made append ≈ rebuild at x100 (48.5 s
      |vs 45.8 s — the corpus-sized partitioned shuffle+write, not the
      |coding, was the cost); after the file-copy rework, same day:
      |
      || corpus | full rebuild | append (64 new vecs) | reading |
      ||---|---|---|---|
      || x10 (20k vecs) | 5.8 s | 4.97 s | anti-join discovery + baseline re-read ≈ the small rebuild |
      || x100 (200k) | 27.2 s | 11.7 s | append 2.3× cheaper and the gap widens with n: remaining append cost is the read-only baseline/meta aggregation over the staged artifact, vs the rebuild's corpus-wide re-code + full shuffle write |
      |
      |Serve-query growth at the catalog level (ScaleBench min-of-3; rep 1
      |pays the memoized install — the build/serve split, q281's
      |discipline): q283 0.82→1.93→1.10 s, q284 0.54→1.19→1.67 s (both
      |noise-flat across the second decade), q285 1.45→4.39→291 s
      |(pair-volume regime, see table), q286 0.61→5.11→3.48 s (the x10
      |min was noise-inflated — reps 8.9/5.1/29.5), q287 takedown ledger
      |0.26→3.70→0.92 s, q288 span handoff 0.58→1.09→3.79 s for
      |10×/100× data (individual reps swung up to 13× on this box's
      |co-tenant noise; min-of-3 shown).
      |""".stripMargin

  /** Round-15 measurements: the manifest-referenced segment store's
    * economics, the LSH confirm-mass guard's readings, and the
    * pillar-bootstrapped streaming restart — kept in code so SCALE.md
    * regeneration preserves them. */
  private val manifestEvidence: String =
    """
      |## Manifest-store economics (round 15)
      |
      |Round 15 replaced the copy-per-version commit (every append and cap
      |swap materialized a full file copy of the index) with manifest
      |commits over immutable segments: a version directory holds
      |`manifest.tsv` → write-once segment references plus KB scalars, so
      |an append commits O(delta) bytes and a cap swap commits ZERO data
      |bytes. `sbt "runMain graft.IndexMaintBench <dir> <label> 2 store
      |pq"` — same-day x1→x10→x100, 2026-08-16 (x1 = sf0.1, x10/x100 =
      |open-vocab ScaleCorpus; all gates and q281/q283–q293 oracle-green
      |through the new store):
      |
      || measure | x1 | x10 | x100 | reading |
      ||---|---|---|---|---|
      || SimHash pillar install bytes | 272 KB | 2.66 MB | 24.6 MB | the index itself, linear in corpus |
      || 8 sequential 8-doc appends, commit bytes | 64.3 KB | 64.4 KB | 64.4 KB | FLAT across two decades — the r15 claim as a number: an append writes its delta segments and a manifest, never a copy of the index (r14's layout would have written 8 × install bytes ≈ 197 MB at x100) |
      || disk after 8 appends | 1.24× install | 1.02× install | 1.003× install | one copy of the index regardless of version count |
      || parquet files after 8 appends → after compact+prune | 90 → 18 | 162 → 27 | 210 → 33 | the LSM discipline: file count tracks data size, not append count; compacted version serves identical pairs (serve_rows_stable=true at every decade) |
      || PQ append64 commit bytes vs index bytes | 34.7 KB / 120 KB | 50 KB / 600 KB | 58 KB / 7.64 MB | delta-sized and near-flat while the index grows 64×; the baseline rolls forward incrementally (prior cell masses + delta counts), never re-reading carried codes |
      || PQ append64 vs full rebuild, wall | 3.1 s / 2.8 s | 3.0 s / 4.6 s | 6.5 s / 32.2 s | append 5.0× cheaper at x100 and the gap widens with n — r14's file-copy layout measured 2.3× (11.7 s / 27.2 s): dropping the copy roughly doubled the append advantage |
      |
      |## LSH confirm-mass guard (round 15)
      |
      |SCALE.md's own r14 x100 row showed the stored-LSH serve dominated by
      |an unbounded exact-cosine confirm (291 s) with no audit naming the
      |mass. The guard prices every bucket the serve will expand (C(bsz,2)
      |over Hamming-1-probed, [2,64]-capped buckets) and reads the total
      |against a 10M-pair budget; a past-budget reading routes to the table
      |dial, whose `chosen` (minimal floor-meeting) count shrinks mass
      |~linearly when it undercuts the installed one — candidates are never
      |dropped, and q293 (guarded serve) shares q67/q285's oracle so
      |hash-green proves the active guard perturbs nothing. Readings:
      |
      || corpus | confirm mass (pairs) | buckets | max bucket | over budget |
      ||---|---|---|---|---|
      || x1 | 1 083 666 | 4 094 | 1 953 | no |
      || x10 | 14 083 470 | 64 843 | 2 016 | YES |
      || x100 | 172 240 824 | 483 125 | 2 016 | YES — this is the r14 advisory's 291-second serve, now a named, paged-on number instead of a surprise wall-clock |
      |
      |Max bucket saturates at C(64,2)=2016 (the cap bound working); the
      |mass grows with BUCKET COUNT in the uniform synthetic cloud —
      |exactly the regime the dial's table count absorbs
      |(IndexLifecycleSpec's planted pin: 4→1 tables quarters the mass with
      |the served pair set unchanged).
      |
      |## Pillar-bootstrapped streaming restart (round 15)
      |
      |`sbt "runMain graft.StreamBench <dir> <label> minhash bootstrap"` —
      |a FRESH stream starting from the installed MinHash pillar
      |(transformWithState initial state) admits one 64-doc batch, vs the
      |corpus re-stream a checkpoint loss used to force:
      |
      || corpus | corpus re-stream (10 batches) | bootstrapped admit64 | state rows (both) |
      ||---|---|---|---|
      || sf0.001 | 10.5 s | 3.0 s | 7 660 |
      || x1 | 14.6 s | 7.5 s | 76 516 |
      || x10 | 23.2 s | 25.6 s | 799 973 |
      |
      |Honest reading: both paths converge to the STATE-STORE LOAD (the
      |identical final state-row counts are the equivalence evidence), so
      |at x10 — 800k RocksDB rows against ~50-token synthetic docs — the
      |bootstrap buys no wall-clock. What it removes is the corpus
      |dependency: the re-stream re-reads and re-signs every document
      |(cost grows with TEXT volume — at production document sizes the
      |signature scan dominates), while the bootstrap reads only the
      |index-sized pillar rows, whatever the documents weigh. The
      |correctness pin (StreamingOpsSpec): bootstrapped batch decisions ==
      |batch-admission truth == the corpus-streamed run's, for all four
      |banded families plus chunk owners and span owners.
      |
      |## Composed ingest admission, measured (round 15)
      |
      |`sbt "runMain graft.StreamBench <dir> <label> ingest"` — the full
      |IngestPipeline (decontaminate → exact-dedup → near-dup → budget →
      |postings append + per-batch manifest) over 10 checkpointed
      |micro-batches, unbounded budget (throughput, not policy):
      |
      || corpus | docs | wall | docs/s | admitted | exact_dup | near_dup | excised tokens |
      ||---|---|---|---|---|---|---|---|
      || x1 (sf0.1) | 4 948 | 57.6 s | 86 | 4 745 | 7 | 202 | 3 307 |
      || x10 | 49 484 | 80.9 s | 612 | 49 484 | 0 | 0 | 123 212 |
      |
      |Reading: throughput grows 7× for 10× data — the composed per-batch
      |cost is dominated by fixed stage overhead (excision scan, signature
      |build, one pillar append commit per batch), which amortizes with
      |batch size exactly like the single-admitter rows above; the x10
      |open-vocab corpus has no duplicate families, so every stage runs
      |and nothing rejects (the x1 corpus exercises all three rejection
      |stages). Decision correctness is StreamingOpsSpec's pin (streamed
      |== batch composition row-for-row under re-chunking + replay).
      |
      |## Round-15 serve-query growth (ScaleBench min-of-3; rep 1 pays the
      |## memoized install — the build/serve split)
      |
      || query | x1 (catalog bench) | x10 | x100 | reading |
      ||---|---|---|---|---|
      || q294 lifecycle serve (install→3 appends→compact→prune) | 0.41 s | 1.28 s | 0.75 s | steady-state serve over the COMPACTED single-segment layout is flat across two decades (index-sized banding; at x1 it even undercuts q283's multi-file serve); rep-1 build 16.3→21.9 s carries the whole lifecycle |
      || q295 release-pinned PQ serve | 0.47 s | 1.16 s | 3.38 s | the release indirection is driver-side NIO — growth matches q281's stored-serve curve (sublinear probes·√n scan); rep-1 59 s at x100 is the amortized install |
      || q293 guarded LSH serve | 0.97 s | — | — | plan-identical to q285 (the guard prices at install, not at serve); its decade rows are q285's, its mass readings the guard table above |
      |""".stripMargin

  /** Round-16 measurements: bounded ingest bookkeeping, planted-family
    * rejection cost at both decades, the text-heavy bootstrap, and the
    * nightly maintenance pass — kept in code so SCALE.md regeneration
    * preserves them. */
  private val round16Evidence: String =
    """
      |## Bounded ingest bookkeeping (round 16)
      |
      |The composed pipeline's only per-batch growth terms were the
      |digest/budget state reads (O(batches) partitions re-read per
      |micro-batch) and the near-dup pillar's append-segment fan-in.
      |Round 16 bounds the first with admission-state snapshots (every
      |snapEvery batches; reads resolve one snapshot + a ≤snapEvery
      |NIO-listed tail) and leaves the second to the compaction verb the
      |nightly pass already runs. `sbt "runMain graft.StreamBench
      |/root/testdata/sf0.001 sf0.001 ingest50"` — 50 fixed-size 10-doc
      |batches through processBatch after a 10-batch JIT warmup,
      |last-10-batch average over first-10-batch average:
      |
      || posture | first10 avg | last10 avg | last/first |
      ||---|---|---|---|
      || snapshots + pillar compaction every 8 (the production pairing — nightlyMaintenance's compact step) | 2.57 s | 2.40 s | 0.93 — FLAT |
      || snapshots alone | 2.35 s | 6.14 s | 2.61 — residual slope is the pillar's append-segment fan-in (50 appends → ~100 scan nodes per probe), the LSM term compaction owns |
      || neither (the r15 layout) | 2.16 s | 6.96 s | 3.22 — the O(batches) growth the snapshots kill |
      |
      |Epoch-pin-aware retention closes the other r15 gap: every committed
      |epoch's pinned pillar version joins `pruneVersions`' exclusion set
      |(`ingestPinnedVersions`, releasePinnedVersions' twin), so a keep=1
      |prune can reclaim unpinned versions while replayed epochs keep
      |re-deciding against their recorded store state (StreamingOpsSpec
      |pins replay green ACROSS a snapshot boundary and across a prune).
      |
      |## Ingest rejection cost at scale (round 16)
      |
      |r15's x10 ingest row rejected nothing (the open-vocab corpus has no
      |duplicate families — SCALE.md's own caveat) and x100 was
      |unmeasured. The `ScaleCorpus <dir> <mult> ingest` variant plants
      |~9% verbatim copies, ~9% suffix-perturbed near-dups and ~1%
      |eval-carrying contaminated docs (ids above the original range, so
      |they arrive after the content they duplicate), leaving the BASE
      |corpora byte-comparable across rounds. `StreamBench ingest` over
      |10 checkpointed micro-batches, unbounded budget, 2026-08-17:
      |
      || corpus | near-dup family | docs | wall | docs/s | admitted | exact_dup | near_dup | excised tokens |
      ||---|---|---|---|---|---|---|---|---|
      || x10 planted | simhash (default) | 58 997 | 79.8 s | 740 | 51 053 | 5 157 | 7 023 | 202 719 |
      || x100 planted | simhash (default) | 589 972 | 109.9 s | 5 368 | 538 045 | 51 768 | 445 | 1 288 647 |
      || x100 planted | minhash (the corpus-scale config) | 589 972 | 149.2 s | 3 955 | 493 916 | 51 768 | 89 028 | 1 288 647 |
      |
      |Reading: every rejection stage pays at both decades and throughput
      |still amortizes (740 → 5 368 docs/s — per-batch fixed cost divided
      |by 10× the batch size). The honest default-family x100 number is
      |near_dup=445 against ~45k planted near-dups: the 9–10-bit SimHash
      |pigeonhole band keys (the price of the hamming-≤6 guarantee on a
      |64-bit signature) put ~1 000 docs in an average band bucket at
      |589k docs, far past the cap of 64, so the [2, cap] bound drops the
      |saturated buckets — the standing bucket-saturation caveat
      |surfacing as a measured recall collapse. The pluggable-family
      |pipeline IS the fix: `families=minhash` (31-bit band keys — bucket
      |occupancy stays O(1) at any corpus size) catches 89 028 near-dups
      |on the same corpus at 3 955 docs/s. The 100 TB posture follows:
      |MinHash banding for the corpus-wide near-dup stage, SimHash's
      |hamming grain within bounded shards (per-language/source pillars);
      |exact-dedup and decontamination are cap-free and keep rejecting
      |(51.8k digests, 1.29M tokens excised) under either family.
      |
      |## Text-heavy bootstrap (round 16)
      |
      |r15's honest caveat: at x10 the pillar bootstrap bought no
      |wall-clock (25.6 s vs 23.2 s re-stream — both converge to the
      |RocksDB load of 800k state rows) because the ~50-token synthetic
      |docs make the re-stream's signature scan nearly free. The
      |`longdocs` ScaleCorpus variant (100–1 000 tokens per doc, 10× the
      |default — still short of real web documents) measures the regime
      |the bootstrap exists for:
      |
      || corpus | corpus re-stream (10 batches) | bootstrapped admit64 | state rows (both) |
      ||---|---|---|---|
      || x10 longdocs | 91.4 s | 28.6 s | 799 968 |
      |
      |3.2× — the corpus-independence win as a number: the re-stream pays
      |the signature scan over 10× the text while the bootstrap's
      |pillar-read + state load is unchanged from the short-doc corpus
      |(28.6 s vs 25.6 s). The store-API bound stands: initial state
      |loads through transformWithState's per-key writes, so the ~25 s
      |RocksDB floor at 800k rows is not ours to batch away — the
      |crossover is therefore text volume, and it sits at roughly 2× the
      |synthetic doc length (x10 short-docs broke even; 10× text wins
      |3.2×). Real scraped corpora sit well past it.
      |
      |## Nightly maintenance pass (round 16)
      |
      |`sbt "runMain graft.IndexMaintBench /tmp/sfx10 sfx10 1 nightly"` —
      |ONE `nightlyMaintenance` walk over a three-pillar store in its
      |steady posture (SimHash holding all but tonight's 64-doc batch;
      |MinHash quiescent; PQ with 64 new vectors to code):
      |
      || pass | wall | actions |
      ||---|---|---|
      || nightly | 21.0 s | 8 — sh:append, sh:compact, sh:prune, mh:recalibrate, mh:prune, pq:append, pq:compact, pq:prune |
      || re-run (quiescent) | 10.5 s | 0 — the audit-only floor |
      |
      |The first x10 run exposed (and fixed) a version-churn bug: when a
      |dial flags a sag but its chosen value EQUALS the installed one
      |(the no-viable-replacement fallback), `chosenIfSagging` reinstalled
      |the same cap as a new version every pass — now it returns None and
      |the audit keeps flagging, `lshGuardedMaintenance`'s
      |`installed.forall(_ != c)` rule applied to all four cap/table
      |recalibrations. The measured re-run going 2 → 0 actions is the fix
      |as a number.
      |
      |## Round-16 serve-query growth (ScaleBench min-of-3; rep 1 pays the
      |## memoized two-pillar install + release cut)
      |
      || query | x10 | x100 | reading |
      ||---|---|---|---|
      || q296 cross-modal consensus at one release | 2.56 s (rep-1 build 16.4 s) | 1.58 s (rep-1 19.1 s) | flat across the decade — two stored-pair reads + a pair-set-sized full-outer join, release resolution is driver-side NIO; x100 undercuts x10 because the default bucket cap drops more saturated buckets there (fewer pairs reach the join — the same cap regime the ingest x100 row names) |
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
