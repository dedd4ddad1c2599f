package graft.operators

import graft.{GraftQuery, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over `embeddings.embedding: array<float>` (SURVEY.md
  * §2.2, LLM-pipeline surface): brute-force exact top-k cosine as the
  * correctness baseline, and a sign-LSH bucketed variant as the scale path.
  *
  * All vector math is codegen'd higher-order functions (`transform`,
  * `zip_with`, `aggregate`) — no UDF boundary, stays inside whole-stage
  * codegen.
  */
object SimilarityQueries {

  val K = 10

  import graft.functions.VectorFunctions.dotd

  /** (vec_id, v: array<double>, nrm) — norm computed once per vector via the
    * codegen'd native dot-product expression (VectorExpressions.scala). */
  private[operators] def normed(s: SparkSession, dir: String): DataFrame =
    Tables.embeddings(s, dir)
      .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("v"))
      .withColumn("nrm", sqrt(dotd(col("v"), col("v"))))

  private[operators] def cosine(va: Column, vb: Column, na: Column, nb: Column): Column =
    dotd(va, vb) / (na * nb)

  /** q43's exact top-k pipeline, pre-presentation: (query_id, neighbor_id,
    * rk, c). ONE copy of the broadcast-query scan + bounded-heap top-k
    * ([[topKRanked]]), shared by q43 itself and the q246/q247 recall evals
    * — the eval grades the index against the PLAN it ships, not a
    * lookalike. */
  private[operators] def bruteTopK(s: SparkSession, dir: String): DataFrame = {
    val n = normed(s, dir)
    val q = n.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("nrm").as("qn"))
    val scored = n.join(broadcast(q), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        cosine(col("qv"), col("v"), col("qn"), col("nrm")).as("c"))
    topKRanked(scored, K)
  }

  /** Exact per-query top-k with rank over `scored(query_id, neighbor_id,
    * c)` — the k-bounded `graft_top_pairs` heap aggregate (one comparison
    * per non-surviving row, map-side partials, ≤ map_partitions·k pairs
    * per query through the exchange, nothing sorts more than k elements).
    * Replaces the salted two-phase row_number window, which had to fully
    * sort the N·Q candidate stream before its group limit could cut;
    * identical (c DESC, neighbor_id ASC) order — Double.compare inside
    * the heap, so even NaN scores rank exactly as the window did. */
  private def topKRanked(scored: DataFrame, k: Int): DataFrame =
    scored.groupBy("query_id")
      .agg(graft.functions.Sketches.topPairs(col("c"), col("neighbor_id"), k)
        .as("top"))
      .select(col("query_id"), posexplode(col("top")))
      .select(col("query_id"), col("col.id").as("neighbor_id"),
        (col("pos") + 1).cast("long").as("rk"), col("col.score").as("c"))

  /** q66's probe depth — also the DEFAULT for every IVF-routed pipeline.
    * q251 calibrates the minimal depth meeting a recall floor; callers can
    * then pass that dial reading into [[ivfTopK]]/[[ivfPqTopK]] instead of
    * this constant. */
  val IvfProbes = 5

  /** The q251 sweep: candidate probe depths, ascending. */
  private[operators] val ProbeDepths = Seq(1, 3, 5)

  /** The q251 recall target: micro recall@k the chosen depth must meet —
    * IVF's own scoreboard floor (q246/q250). */
  private[operators] val ProbeRecallFloorPpm = 500000L

  /** (cent_id, cv, cn): the deterministic ~2% IVF centroid sample, shared
    * by q66's index build, the query routing, and q249's cell gate. The
    * 31-bit LCG is chosen over xxhash64 because the identical arithmetic
    * replays in the DuckDB oracle (no 64-bit wraparound multiply there);
    * vec_id is reduced mod 2^31-1 first so the product never overflows a
    * long on either engine at any id scale. */
  private[operators] def ivfCents(s: SparkSession, dir: String): DataFrame = {
    val CentStride = 50 // ~2% of the corpus serves as centroids
    normed(s, dir).filter(
      ((col("vec_id") % 2147483647L) * 1103515245L + 12345L)
        % 2147483647L % CentStride === 0)
      .select(col("vec_id").as("cent_id"), col("v").as("cv"), col("nrm").as("cn"))
  }

  /** IVF query routing shared by q66 and q249: each panel query's `probes`
    * nearest cells of the given `cents(cent_id, cv, cn)` —
    * (query_id, qv, qn, cent_id). */
  private[operators] def ivfQueryProbesFrom(s: SparkSession, dir: String,
                                            probes: Int, cents: DataFrame,
                                            panelIdCap: Option[Long] = None): DataFrame = {
    val centCos = cosine(col("v"), col("cv"), col("nrm"), col("cn"))
    val cw = Window.partitionBy(col("vec_id"))
      .orderBy(centCos.desc, col("cent_id"))
    normed(s, dir).filter(panelPred(panelIdCap))
      .crossJoin(broadcast(cents))
      .withColumn("crk", row_number().over(cw)).filter(col("crk") <= probes)
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("nrm").as("qn"), col("cent_id"))
  }

  private[operators] def ivfQueryProbes(s: SparkSession, dir: String,
                                        probes: Int): DataFrame =
    ivfQueryProbesFrom(s, dir, probes, ivfCents(s, dir))

  /** Nearest-centroid assignment of ANY corpus frame `(vec_id, v, nrm,
    * extra…)` against `cents` — the C candidate rows per vector collapse
    * map-side to one, every extra column riding through as `first` (each is
    * functionally determined by vec_id). ONE definition of the cell
    * assignment shared by the plain (q66/ivfTopKFrom) and the
    * label-filtered (q255) IVF pipelines. */
  private[operators] def ivfAssignOf(corpus: DataFrame, cents: DataFrame): DataFrame = {
    val centCos = cosine(col("v"), col("cv"), col("nrm"), col("cn"))
    val carried = corpus.columns.filterNot(_ == "vec_id").toSeq
    corpus.crossJoin(broadcast(cents))
      .groupBy("vec_id")
      // tie-break equidistant centroids by the LARGER cent_id (id = −cent
      // under the heap's (score DESC, id ASC) order — same winner as the
      // old max_by(struct(cc, cent_id))) so cell assignment — and
      // therefore q66's output — is deterministic. The k=1 heap replaces
      // the struct aggregation buffer, which Spark can only plan as a
      // SortAggregate: a FULL SORT of the n×C assignment join, measured
      // as 4–6 s of every assignment-shaped query at 10× sf0.1.
      .agg(graft.functions.Sketches.topPairs(centCos, -col("cent_id"), 1)
        .as("tp"), carried.map(c => first(col(c)).as(c)): _*)
      .select(col("vec_id") +:
        (-element_at(col("tp.id"), 1)).as("cent_id") +:
        carried.map(col): _*)
  }

  /** The IVF pipeline against an ARBITRARY centroid frame `(cent_id, cv,
    * cn)` — the seam the versioned index store drives: a retrain-and-swap
    * (IndexLifecycle) changes results ONLY by changing the centroid frame
    * this method receives, through exactly the plan q66 ships. */
  private[operators] def ivfTopKFrom(s: SparkSession, dir: String,
                                     cents: DataFrame,
                                     probes: Int = IvfProbes): DataFrame = {
    // index build: nearest centroid per vector, collapsed map-side
    val assigned = ivfAssignOf(normed(s, dir), cents)
    val qprobes = ivfQueryProbesFrom(s, dir, probes, cents)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("c").desc, col("neighbor_id"))
    assigned.join(broadcast(qprobes), Seq("cent_id"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        cosine(col("qv"), col("v"), col("qn"), col("nrm")).as("c"))
      .withColumn("rk", row_number().over(w).cast("long")).filter(col("rk") <= K)
      .select(col("query_id"), col("neighbor_id"), col("rk"), col("c"))
  }

  /** q66's IVF top-k pipeline, pre-presentation: (query_id, neighbor_id,
    * rk, c). ONE copy of the index build + multi-probe + re-rank, shared
    * by q66 itself, the q246 recall eval and the q251 probe-depth dial
    * (which sweeps `probes`). */
  private[graft] def ivfTopK(s: SparkSession, dir: String,
                             probes: Int = IvfProbes): DataFrame =
    ivfTopKFrom(s, dir, ivfCents(s, dir), probes)

  /** [[normed]] plus the vector's metadata label in one scan — the
    * attribute a filtered search constrains on. Built directly from the
    * table (no normed-⋈-labels self-join: one parquet scan, three columns
    * pruned at the reader). */
  private[operators] def normedWithLabel(s: SparkSession, dir: String): DataFrame =
    Tables.embeddings(s, dir)
      .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("v"),
        col("label").cast("long").as("lbl"))
      .withColumn("nrm", sqrt(dotd(col("v"), col("v"))))

  /** q255's label-constrained IVF search, pre-presentation: top-k among
    * corpus vectors sharing the QUERY's label — the "filtered vector
    * search" every production vector store exposes (metadata predicate +
    * ANN in one query). Strategy is post-filter: route and scan cells
    * exactly as [[ivfTopKFrom]] (same centroids, same probes, same
    * assignment via [[ivfAssignOf]]), apply the label predicate to
    * candidates BEFORE the re-rank window, so filter selectivity costs
    * nothing extra — the label rides the assignment frame as one long.
    * Shared by q255 itself and the q256 filtered-recall scoreboard. */
  /** The fixed query panel's labels: the % 50 filter reaches the parquet
    * scan, so the broadcast side is ~2% of one int column. */
  private[operators] def panelLabels(s: SparkSession, dir: String): DataFrame =
    Tables.embeddings(s, dir).filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("query_id"), col("label").cast("long").as("qlbl"))

  /** The label-matching candidates in each panel query's probed cells,
    * scored but un-ranked: (query_id, neighbor_id, c). ONE candidate scan
    * shared by the q255 search, the q258 supply audit and the q259 hybrid
    * (which rank, count and route the same frame respectively). */
  private[operators] def ivfFilteredCandidates(s: SparkSession, dir: String,
                                               probes: Int = IvfProbes): DataFrame =
    ivfFilteredCandidatesFrom(s, dir, ivfCents(s, dir), probes)

  /** [[ivfFilteredCandidates]] against an ARBITRARY centroid frame — the
    * store seam for the filtered search (q255), so a centroid-pillar
    * hot-swap routes the label-constrained pipeline too, not only the
    * plain one. */
  private[graft] def ivfFilteredCandidatesFrom(s: SparkSession, dir: String,
                                               cents: DataFrame,
                                               probes: Int = IvfProbes): DataFrame = {
    val assigned = ivfAssignOf(normedWithLabel(s, dir), cents)
    val qprobes = ivfQueryProbesFrom(s, dir, probes, cents)
      .join(broadcast(panelLabels(s, dir)), "query_id")
    assigned.join(broadcast(qprobes), Seq("cent_id"))
      .filter(col("vec_id") =!= col("query_id") && col("lbl") === col("qlbl"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        cosine(col("qv"), col("v"), col("qn"), col("nrm")).as("c"))
  }

  /** The top-k rank-and-cut of any scored candidate frame — shared tail of
    * the filtered pipelines. */
  private def rankTopK(cand: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("c").desc, col("neighbor_id"))
    cand
      .withColumn("rk", row_number().over(w).cast("long")).filter(col("rk") <= K)
      .select(col("query_id"), col("neighbor_id"), col("rk"), col("c"))
  }

  private[graft] def ivfFilteredTopK(s: SparkSession, dir: String,
                                     probes: Int = IvfProbes): DataFrame =
    rankTopK(ivfFilteredCandidates(s, dir, probes))

  /** q255's filtered search through an ARBITRARY centroid frame — the
    * [[ivfFilteredCandidatesFrom]] seam ranked to the shipped top-k. */
  private[graft] def ivfFilteredTopKFrom(s: SparkSession, dir: String,
                                         cents: DataFrame,
                                         probes: Int = IvfProbes): DataFrame =
    rankTopK(ivfFilteredCandidatesFrom(s, dir, cents, probes))

  /** The EXACT label-filtered baseline — [[bruteTopK]]'s bounded-heap
    * top-k with the label-equality predicate folded into the broadcast join
    * condition (pre-filter: at 100 TB this is the strategy for SELECTIVE
    * predicates, where the filtered corpus is small enough to scan; the
    * IVF post-filter above is the strategy for broad ones). Exact side of
    * the q256 scoreboard. */
  private[operators] def bruteFilteredTopK(s: SparkSession, dir: String,
                                           excludeQ: Option[DataFrame] = None): DataFrame = {
    val nl = normedWithLabel(s, dir)
    val panel = nl.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("nrm").as("qn"), col("lbl").as("qlbl"))
    // Prune the PANEL before the corpus×panel broadcast join, not the
    // ranked output after it: an anti-join above the rank window cannot be
    // pushed below it, so q259's fallback used to score the exact top-k
    // for EVERY panel query and throw the routed ones away. Dropping the
    // excluded queries here shrinks the scored stream (the dominant cost,
    // corpus × panel-same-label cosine) by the routed fraction.
    val q = excludeQ.foldLeft(panel)((p, ex) =>
      p.join(broadcast(ex), Seq("query_id"), "left_anti"))
    val scored = nl.join(broadcast(q),
        col("vec_id") =!= col("query_id") && col("lbl") === col("qlbl"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        cosine(col("qv"), col("v"), col("qn"), col("nrm")).as("c"))
    topKRanked(scored, K)
  }

  /** q44's sign-LSH top-k pipeline, pre-presentation: (query_id,
    * neighbor_id, rk, c). ONE copy of the bucket build + Hamming≤2
    * multi-probe + re-rank, shared by q44 itself and the q248 recall eval. */
  private[operators] def lshTopK(s: SparkSession, dir: String): DataFrame = {
    val Tbl = 4
    val Dim = 64
    val Bits = codeBits(Tables.parquetRowCount(s, dir, "embeddings"))
    val n = normed(s, dir)
    // bucket code per (vector, table): one fused native pass over all
    // hyperplanes (SignCodeD) — the unrolled when(dot>0)-chain form costs
    // seconds of codegen warm-up and re-reads the vector per bit
    val codeFor: Int => Column = t => graft.functions.VectorFunctions.signCode(
      col("v"), (0 until Bits).flatMap(b => hyperplane(t, b, Dim)).toArray, Bits, Dim)
    // corpus side: IDS ONLY past this point — the join, dedup and
    // candidate shuffle move (vec_id, tbl, code), never the vectors
    val cbuckets = n.select(col("vec_id"),
      explode(array((0 until Tbl).map(t =>
        struct(lit(t).as("tbl"), codeFor(t).as("code"))): _*)).as("bk"))
      .select(col("vec_id"), col("bk.tbl"), col("bk.code"))
    // query side: multi-probe all buckets within Hamming ≤ 2 of the
    // query's own code (1 + Bits + C(Bits,2) codes/table) — recall lift
    // at zero corpus-side cost; this corpus's neighbors sit at wide
    // angles (cos ≤ 0.5 ⇒ per-hyperplane agreement ≤ 0.67), so probing
    // depth, not corpus replication, is the recall knob
    val probeMasks: Seq[Int] = 0 +:
      (0 until Bits).map(1 << _) ++:
      (for (i <- 0 until Bits; j <- i + 1 until Bits) yield (1 << i) | (1 << j))
    // single definition of the query set — qprobes and qvecs MUST agree
    // or the final join silently drops candidates
    val queries = n.filter(col("vec_id") % 50 === 0)
    val qprobes = queries
      .select(col("vec_id").as("query_id"),
        explode(array((0 until Tbl).map(t =>
          struct(lit(t).as("tbl"), codeFor(t).as("code"))): _*)).as("bk"))
      .select(col("query_id"), col("bk.tbl"),
        explode(array(probeMasks.map(m =>
          col("bk.code").bitwiseXOR(lit(m))): _*)).as("code"))
    val candIds = cbuckets.join(broadcast(qprobes), Seq("tbl", "code"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"))
      .dropDuplicates("query_id", "neighbor_id")
    // vectors re-enter AFTER dedup: corpus side by equi-join on
    // neighbor_id (a broadcast of tiny candIds at any corpus size the
    // optimizer chooses; a shuffle join degrades gracefully), query side
    // as an explicit broadcast
    val qvecs = queries
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("nrm").as("qn"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("c").desc, col("neighbor_id"))
    candIds
      .join(n.select(col("vec_id").as("neighbor_id"), col("v"), col("nrm")),
        "neighbor_id")
      .join(broadcast(qvecs), "query_id")
      .withColumn("c", cosine(col("qv"), col("v"), col("qn"), col("nrm")))
      .withColumn("rk", row_number().over(w).cast("long")).filter(col("rk") <= K)
      .select(col("query_id"), col("neighbor_id"), col("rk"), col("c"))
  }

  /** (vec_id, cd): the PQ index proper — 4 small codes per vector,
    * assembled in fixed subspace order. This is ALL an ADC candidate scan
    * ever reads; shared by q236's flat scan and q249's cell-pruned scan.
    * min(struct(l2, -cent_id, crk)) == ORDER BY l2 ASC, cent_id DESC:
    * l2 is a sum of squares so only +0.0 occurs, never the -0.0
    * struct-ordering hazard; -cent_id makes the integer tie-break exact. */
  private[operators] def pqCodes(s: SparkSession, dir: String): DataFrame =
    pqCodesFrom(s, dir, pqCodebook(s, dir))

  /** [[pqCodes]] against an ARBITRARY codebook `(m, cent_id, csub, crk)` —
    * the seam the versioned index store drives: a codebook retrain-and-swap
    * changes the stored codes ONLY through the frame this method receives,
    * through exactly the assignment q236 ships. */
  private[graft] def pqCodesFrom(s: SparkSession, dir: String,
                                 codebook: DataFrame): DataFrame =
    pqCodesOf(pqSubs(s, dir), codebook)

  /** [[pqCodesFrom]] over an ARBITRARY strided decomposition
    * ([[pqSubsOf]] of any (vec_id, v) frame) — the seam incremental
    * index maintenance codes NEW arrivals through: a delta batch is
    * coded against the installed codebook by exactly the q236
    * assignment, so appended codes are bit-identical to what a full
    * rebuild under the same quantizers would derive. */
  private[graft] def pqCodesOf(subs: DataFrame,
                               codebook: DataFrame): DataFrame = {
    // native fused Σ(a−b)² — the declarative aggregate(zip_with(…)) form
    // is an interpreted HOF evaluated once per (sub-vector × codebook row)
    // inside this join: ~20M closure evals at 10× sf0.1, measured as the
    // whole of the PQ build's cost. Same ascending-index IEEE sum, so
    // codes (and every replay oracle) are bit-identical.
    val l2 = graft.functions.VectorFunctions.sqdistd(col("sv"), col("csub"))
    subs.join(broadcast(codebook), "m")
      .select(col("vec_id"), col("m"), l2.as("l2"), col("crk"))
      .groupBy("vec_id", "m")
      // k=1 heap argmin: (score = −l2 DESC, id = −crk ASC) picks the same
      // entry as min(struct(l2, negc, crk)) — within a subspace crk is
      // ranked BY cent_id ascending (pqCodebookOf's row_number), so
      // negc ASC ⇔ cent DESC ⇔ crk DESC ⇔ −crk ASC, and (l2, negc, crk)
      // has no further ties to break (crk unique per m). The struct agg
      // buffer forced a SortAggregate full-sort of the ~n·4·C join.
      .agg(graft.functions.Sketches.topPairs(-col("l2"), -col("crk"), 1)
        .as("tp"))
      .select(col("vec_id"), col("m"),
        (-element_at(col("tp.id"), 1)).as("crk"))
      .groupBy("vec_id").agg(
        transform(sort_array(collect_list(struct(col("m"), col("crk")))),
          p => p("crk")).as("cd"))
  }

  /** (query_id, lut, nc): per-query ADC lookup table — dot of the query's
    * m-th subvector with every rank-m codebook entry, flattened in (m, crk)
    * order; `nc` (the rank range) travels with it for flat addressing.
    * Shared by q236 and q249. */
  private[operators] def pqQueryLuts(s: SparkSession, dir: String): DataFrame =
    pqQueryLutsFrom(s, dir, pqCodebook(s, dir))

  /** The deterministic query-panel predicate: the ~2% stride, optionally
    * bounded to a FIXED absolute id range (the *_fixed forms' production
    * workload — a real serving panel is a constant, not a corpus share). */
  private def panelPred(idCap: Option[Long]): Column =
    idCap.foldLeft(col("vec_id") % 50 === 0)((p, c) => p && col("vec_id") < c)

  /** [[pqQueryLuts]] against an ARBITRARY codebook — the query-side twin
    * of [[pqCodesFrom]]; codes and LUTs must address the SAME crk ranks,
    * so both seams take the one installed frame. */
  private[graft] def pqQueryLutsFrom(s: SparkSession, dir: String,
                                     codebook: DataFrame,
                                     panelIdCap: Option[Long] = None): DataFrame =
    pqSubs(s, dir).filter(panelPred(panelIdCap))
      .join(broadcast(codebook), "m")
      .select(col("vec_id").as("query_id"), col("m"), col("crk"),
        dotd(col("sv"), col("csub")).as("dot"))
      .groupBy("query_id")
      .agg(transform(
          sort_array(collect_list(struct(col("m"), col("crk"), col("dot")))),
          p => p("dot")).as("lut"),
        max("crk").as("nc"))

  /** Candidate ADC score = four LUT reads added in fixed subspace order —
    * no reduction-order ambiguity, so both engines agree bitwise. Expects
    * `lut`, `nc`, `cd` columns in scope. */
  private def adcScore: Column = {
    def lutAt(m: Int) = element_at(col("lut"),
      (lit(m.toLong) * col("nc") + col("cd").getItem(m)).cast("int"))
    lutAt(0) + lutAt(1) + lutAt(2) + lutAt(3)
  }

  /** Salted two-phase ADC prune + exact cosine re-rank shared by the PQ
    * scans: cut `cand(query_id, neighbor_id, sc)` to `depth` survivors per
    * query by ADC score, re-join the corpus BY ID for exact cosine, and
    * return the top-k (query_id, neighbor_id, rk, c). */
  private def adcPruneRerank(s: SparkSession, dir: String,
                             cand: DataFrame, depth: Int,
                             panelIdCap: Option[Long] = None): DataFrame = {
    val e = normed(s, dir)
    // k-bounded heap aggregate, NOT a row_number window: the window form
    // must fully sort the N·Q candidate stream before its group limit can
    // cut (measured 47 s of q236's 48 s at 10× sf0.1 — scoring the same
    // rows costs 0.6 s), while the heap streams candidates at one
    // comparison per non-surviving row, partial-aggregates map-side, and
    // ships ≤ map_partitions·depth pairs per query through the exchange.
    // Same (sc DESC, neighbor_id ASC) total order → identical survivors.
    val survivors = cand
      .groupBy("query_id")
      .agg(graft.functions.Sketches.topPairs(col("sc"), col("neighbor_id"),
        depth).as("top"))
      .select(col("query_id"), explode(col("top.id")).as("neighbor_id"))
    val qv = e.filter(panelPred(panelIdCap))
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("nrm").as("qn"))
    val rerank = Window.partitionBy(col("query_id"))
      .orderBy(col("c").desc, col("neighbor_id"))
    survivors
      .join(e.select(col("vec_id").as("neighbor_id"), col("v"), col("nrm")),
        "neighbor_id")
      .join(broadcast(qv), "query_id")
      .withColumn("c", cosine(col("qv"), col("v"), col("qn"), col("nrm")))
      .withColumn("rk", row_number().over(rerank).cast("long"))
      .filter(col("rk") <= K)
      .select(col("query_id"), col("neighbor_id"), col("rk"), col("c"))
  }

  /** q236's PQ/ADC top-k pipeline, pre-presentation: (query_id, neighbor_id,
    * rk, c). ONE copy of the codebook assignment + ADC scan + re-rank,
    * shared by q236 itself and the q247 recall eval. */
  private[operators] def pqTopK(s: SparkSession, dir: String): DataFrame = {
    val cand = pqCodes(s, dir)
      .join(broadcast(pqQueryLuts(s, dir)), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"), adcScore.as("sc"))
    adcPruneRerank(s, dir, cand, depth = 32)
  }

  /** q249's ADC prune depth. Deeper than q236's 32 because the cell gate
    * has already cut candidates to ~probes·cell_size per query — a depth
    * that keeps the prune near-lossless INSIDE probed cells, so IVF-PQ
    * recall tracks IVF recall (cell routing, not ADC ordering, is the
    * recall limiter; q250 pins the floor at IVF's own 500000 ppm). At
    * 100 TB with thousands-deep cells this is still a real prune — the
    * exact re-rank touches 128 float vectors per query, never a cell. */
  private val IvfPqDepth = 128

  /** Driver-safe budget for the probed-LUT build side: hint `broadcast`
    * only while the frame's footer-derived size estimate fits. The qside
    * frame carries one 4·(n/31)-double LUT per (query × probe) row, so it
    * grows Θ(n²·probes/1550) bytes under the bench's corpus-share panel —
    * past ~2 GiB the BroadcastExchange collect kills the driver
    * (spark.driver.maxResultSize; measured: the hinted form died at the
    * 100× corpus, 200k vectors → 4.1 GiB qside). Above budget the hint is
    * dropped and the planner ships qside through the cent_id exchange — a
    * shuffle hash join whose moved bytes are the same qside, split across
    * executors instead of collected whole on the driver. At 100 TB with a
    * FIXED query workload (panels are a bench contract, not a production
    * posture) the estimate stays small and the broadcast plan survives. */
  private val LutBroadcastBudgetBytes = 256L << 20

  /** One LUT row is 8 bytes per codebook row (the flattened table holds
    * every (m, crk) dot as a double), and the qside frame repeats it once
    * per (query × probe). */
  private def lutSideBytesFor(nQueries: Long, probes: Int,
                              codebookRows: Long): Long =
    nQueries * probes * 8L * codebookRows

  private def lutSideBytes(nVecs: Long, probes: Int): Long =
    // in-query strides: ~2% of the corpus queries, 4 × ~n/31 codebook rows
    lutSideBytesFor(nVecs / 50 + 1, probes, 4L * (nVecs / 31 + 1))

  private def hintIfDriverSafe(df: DataFrame, estBytes: Long): DataFrame =
    if (estBytes <= LutBroadcastBudgetBytes) broadcast(df) else df

  /** q249's IVF-PQ top-k pipeline, pre-presentation: (query_id,
    * neighbor_id, rk, c) — the FAISS IVFPQ composition of the two index
    * pillars: q66's centroid cells gate WHICH vectors are scanned, q236's
    * ADC codes decide HOW each survivor is scored. The corpus side of the
    * candidate join carries (cent_id, vec_id, 4 codes) — never a float
    * vector — and meets the query side in an EQUI-join on cent_id, so
    * per-query scan cost is probes·cell_size, sublinear in corpus size.
    * Shared by q249 itself and the q250 recall eval. */
  private[graft] def ivfPqTopK(s: SparkSession, dir: String,
                                   probes: Int = IvfProbes): DataFrame = {
    // the complete IVF-PQ index row: cell id + 4 PQ codes per vector
    // (cell assignment is THE shared q66/q230/q232 pipeline)
    val coded = pqCodes(s, dir)
      .join(SelectionQueries.assigned(s, dir).select(col("vec_id"), col("cent_id")),
        "vec_id")
    // query side: probed cells × per-query ADC LUT — a few rows per query
    val qside = ivfQueryProbes(s, dir, probes)
      .select(col("query_id"), col("cent_id"))
      .join(pqQueryLuts(s, dir), "query_id")
    // the cell-pruned ADC scan: candidates meet in an equi-join on
    // cent_id (cell assignment is unique per vector, so no dedup needed);
    // the broadcast hint is footer-gated — see LutBroadcastBudgetBytes
    val est = lutSideBytes(Tables.parquetRowCount(s, dir, "embeddings"), probes)
    val cand = coded.join(hintIfDriverSafe(qside, est), Seq("cent_id"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"), adcScore.as("sc"))
    adcPruneRerank(s, dir, cand, depth = IvfPqDepth)
  }

  /** The IVF-PQ pipeline against ARBITRARY installed pillars — `cents
    * (cent_id, cv, cn)` gates WHICH vectors are scanned, `codebook (m,
    * cent_id, csub, crk)` decides HOW survivors are scored; both frames
    * come from the versioned index store, so a hot-swap of EITHER pillar
    * changes results only through the artifact it installs, through
    * exactly the q249 plan shape (codes ⋈ broadcast(probed LUTs) on
    * cent_id, ADC prune, exact re-rank). */
  /** The complete IVF-PQ index rows `(vec_id, cd, cent_id)` for ARBITRARY
    * quantizer frames — the artifact [[IndexLifecycle.installPqIndex]]
    * persists: each vector's cell id plus its 4 PQ codes, the FAISS
    * .index payload. ONE definition shared by the live pipeline
    * ([[ivfPqTopKFrom]]) and the store's install path, so a coding tweak
    * moves the served index and the per-query rebuild together. */
  private[graft] def pqIndexRows(s: SparkSession, dir: String,
                                 cents: DataFrame,
                                 codebook: DataFrame): DataFrame =
    pqIndexRowsOf(normed(s, dir).select(col("vec_id"), col("v")),
      cents, codebook)

  /** [[pqIndexRows]] for an ARBITRARY (vec_id, v) frame — the seam
    * [[IndexLifecycle.appendPqIndex]] codes a NEW-arrivals delta through:
    * same strided decomposition, same code assignment, same cell
    * assignment, so an appended batch's rows are bit-identical to the
    * rows a full rebuild under the same installed quantizers derives. */
  private[graft] def pqIndexRowsOf(vecs: DataFrame, cents: DataFrame,
                                   codebook: DataFrame): DataFrame =
    pqCodesOf(pqSubsOf(vecs), codebook)
      .join(IndexLifecycle.assign(vecs, cents), "vec_id")

  private[graft] def ivfPqTopKFrom(s: SparkSession, dir: String,
                                   cents: DataFrame, codebook: DataFrame,
                                   probes: Int = IvfProbes,
                                   knownCodebookRows: Option[Long] = None)
      : DataFrame = {
    val coded = pqIndexRows(s, dir, cents, codebook)
    val qside = ivfQueryProbesFrom(s, dir, probes, cents)
      .select(col("query_id"), col("cent_id"))
      .join(pqQueryLutsFrom(s, dir, codebook), "query_id")
    // the LUT width is a property of the codebook frame, not of the
    // corpus — a swapped-in codebook larger than the in-query ~n/31
    // stride must still be caught by the driver-safety gate, and a
    // fixed-size production codebook must not needlessly demote the
    // broadcast. Pillar-backed callers pass the known row count (read
    // from install metadata, the job-free path); when none is passed
    // the frame is measured with ONE count() — every caller of this
    // swapped-in-frame seam holds a KB-scale installed artifact, so
    // the count is the sanctioned control-plane read, and a footer
    // guess here could underestimate a larger-than-share-form book and
    // hint an unsafe broadcast (the r14 advisory). Corpus-derived
    // codebook lineages take [[ivfPqTopK]], which never reaches this.
    val est = lutSideBytesFor(
      Tables.parquetRowCount(s, dir, "embeddings") / 50 + 1, probes,
      knownCodebookRows.getOrElse(codebook.count()))
    val cand = coded.join(hintIfDriverSafe(qside, est), Seq("cent_id"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"), adcScore.as("sc"))
    adcPruneRerank(s, dir, cand, depth = IvfPqDepth)
  }

  // ---------- the FIXED-workload ANN forms (q279/q280) ----------
  //
  // q236/q249 deliberately scale their query panel (~2% of the corpus)
  // and their trained artifacts (codebook ~n/31 entries, cells ~n/50)
  // WITH the corpus so one hash-exact oracle covers every sf — which
  // makes corpus-level cost quadratic by construction once the bench
  // corpus stands in for both the data AND the workload. Production is
  // the opposite regime: the serving panel is a constant, the codebook
  // is a fixed size (FAISS ships 256 entries/subspace so a code is one
  // byte), and the cell count grows ~√n (FAISS's nlist ≈ √N guidance:
  // assignment n·√n amortizes as index build, per-query scan probes·√n
  // stays sublinear). q279/q280 pin exactly those dials so the scale
  // evidence run measures the production growth curve directly instead
  // of arguing it from the share-form artifacts.

  /** ≤ 64 absolute panel ids: the % 50 stride bounded below id 64·50.
    * Saturates at 64 queries once the corpus passes 3200 vectors and
    * never grows again — the fixed serving workload. */
  private[operators] val FixedPanelMaxId: Long = 3200L

  /** Fixed per-subspace codebook size — one byte per code, the FAISS
    * production default. The trainer still ranks the deterministic LCG
    * sample; the fixed form keeps its first 256 ranks, so at small sf
    * (sample < 256) the cap simply doesn't bind. */
  private[operators] val FixedCodebookEntries: Int = 256

  /** [[pqCodebook]] capped at [[FixedCodebookEntries]] ranks per
    * subspace — ranks stay contiguous 1..min(256, sample), so codes and
    * LUTs address it exactly as they address the share-form codebook. */
  private[graft] def pqCodebookFixed(s: SparkSession, dir: String): DataFrame =
    pqCodebook(s, dir).filter(col("crk") <= FixedCodebookEntries)

  /** √n-scaled centroid stride for the fixed IVF form: nlist =
    * max(4, ⌊√n⌋) cells via the shared 31-bit LCG sample. Both engines
    * compute ⌊√n⌋ on an IEEE double (correctly rounded, so identical)
    * and truncate the integer division identically. */
  private def fixedCentStride(nVecs: Long): Long = {
    val nlist = math.max(4L, math.floor(math.sqrt(nVecs.toDouble)).toLong)
    math.max(1L, nVecs / nlist)
  }

  private[graft] def fixedCents(s: SparkSession, dir: String): DataFrame = {
    val stride = fixedCentStride(Tables.parquetRowCount(s, dir, "embeddings"))
    normed(s, dir).filter(
      ((col("vec_id") % 2147483647L) * 1103515245L + 12345L)
        % 2147483647L % stride === 0)
      .select(col("vec_id").as("cent_id"), col("v").as("cv"),
        col("nrm").as("cn"))
  }

  /** q279's fixed-workload PQ/ADC top-k: q236's exact plan with the panel
    * pinned at ≤64 absolute ids and the codebook at ≤256 entries — the
    * flat-scan production contract, linear in corpus size with a constant
    * query count. */
  private[graft] def pqTopKFixed(s: SparkSession, dir: String): DataFrame = {
    val cb = pqCodebookFixed(s, dir)
    val cand = pqCodesFrom(s, dir, cb)
      .join(broadcast(pqQueryLutsFrom(s, dir, cb, Some(FixedPanelMaxId))),
        col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"), adcScore.as("sc"))
    adcPruneRerank(s, dir, cand, depth = 32, Some(FixedPanelMaxId))
  }

  /** q280's fixed-workload IVF-PQ top-k: q249's exact plan with the panel
    * and codebook pinned and √n cells — the production composition whose
    * PER-QUERY scan cost is probes·√n, sublinear in corpus size. The
    * qside LUT frame is ≤ 64 queries × probes rows × 4·256 doubles
    * (≈ 2.6 MB), constant at ANY corpus size, so the broadcast hint is
    * retained under the driver-safety budget by construction — the same
    * gate that demotes the share form's degenerate LUTs. */
  private[graft] def ivfPqTopKFixed(s: SparkSession, dir: String,
                                    probes: Int = IvfProbes): DataFrame = {
    val cb = pqCodebookFixed(s, dir)
    val cents = fixedCents(s, dir)
    val coded = pqCodesFrom(s, dir, cb)
      .join(ivfAssignOf(normed(s, dir), cents).select("vec_id", "cent_id"),
        "vec_id")
    val qside = ivfQueryProbesFrom(s, dir, probes, cents, Some(FixedPanelMaxId))
      .select(col("query_id"), col("cent_id"))
      .join(pqQueryLutsFrom(s, dir, cb, Some(FixedPanelMaxId)), "query_id")
    val est = lutSideBytesFor(64L, probes, 4L * FixedCodebookEntries)
    val cand = coded.join(hintIfDriverSafe(qside, est), Seq("cent_id"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"), adcScore.as("sc"))
    adcPruneRerank(s, dir, cand, depth = IvfPqDepth, Some(FixedPanelMaxId))
  }

  /** The IVF-PQ SERVE path: score an ALREADY-CODED index frame
    * `coded(vec_id, cd, cent_id)` — read from the installed PQ-index
    * pillar, never re-derived — against the query panel routed and
    * LUT-ed through the SAME quantizer frames the codes were built with.
    * This is the pipeline a production deployment actually runs per
    * query batch: the corpus's float vectors are touched only by the
    * exact re-rank's id-bounded lookup, the scan side carries 4 small
    * codes per row, and the index build (q280's dominant decade-2 cost)
    * is amortized into [[IndexLifecycle.installPqIndex]]. `estBytes`
    * gates the qside broadcast exactly as the live forms do. */
  private[graft] def ivfPqServe(s: SparkSession, dir: String,
                                coded: DataFrame, cents: DataFrame,
                                codebook: DataFrame, probes: Int,
                                estBytes: Long,
                                panelIdCap: Option[Long]): DataFrame = {
    val qside = ivfQueryProbesFrom(s, dir, probes, cents, panelIdCap)
      .select(col("query_id"), col("cent_id"))
      .join(pqQueryLutsFrom(s, dir, codebook, panelIdCap), "query_id")
    val cand = coded.join(hintIfDriverSafe(qside, estBytes), Seq("cent_id"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"), adcScore.as("sc"))
    adcPruneRerank(s, dir, cand, depth = IvfPqDepth, panelIdCap)
  }

  /** The recall scoreboard shared by q246 (IVF) and q247 (PQ): exact top-k
    * rows left-join the approximate result set on (query, neighbor), and
    * one count-only aggregate per query yields hits, recall in exact ppm
    * (integer division — both engines floor), and `first_miss_rk`, the
    * exact rank at which the index FIRST loses a neighbor (0 = perfect).
    * Only id pairs ride the join — Q·K rows per side, never a vector. */
  private def recallAgg(exact: DataFrame, approx: DataFrame): DataFrame =
    exact.select(col("query_id"), col("neighbor_id"), col("rk"))
      .join(approx.select(col("query_id"), col("neighbor_id"), lit(1).as("hit")),
        Seq("query_id", "neighbor_id"), "left")
      .groupBy("query_id")
      .agg(count(lit(1)).as("exact_cnt"),
        count(col("hit")).as("hits"),
        coalesce(min(when(col("hit").isNull, col("rk"))), lit(0L))
          .as("first_miss_rk"))
      .select(col("query_id"), col("exact_cnt"), col("hits"),
        expr("hits * 1000000 div exact_cnt").as("recall_ppm"),
        col("first_miss_rk"))
      .orderBy("query_id")

  /** The exact-top-k CTE chain (q → bscored → exact) of the q43 oracle
    * given an existing `n(vec_id, v, nrm)` — appended after
    * [[lshReplayPrologue]] (which already defines `n`) by the q248 oracle. */
  private val exactFromNSqlCtes: String =
    s"""q AS (
       |  SELECT * FROM n WHERE vec_id % 50 = 0
       |), bscored AS (
       |  SELECT q.vec_id query_id, a.vec_id neighbor_id,
       |         list_reduce(list_transform(range(1, len(q.v)+1),
       |                                    i -> q.v[i] * a.v[i]),
       |                     (x,y) -> x+y) / (q.nrm * a.nrm) c
       |  FROM q JOIN n a ON a.vec_id <> q.vec_id
       |), exact AS (
       |  SELECT query_id, neighbor_id, rk FROM (
       |    SELECT query_id, neighbor_id,
       |           row_number() OVER (PARTITION BY query_id
       |                              ORDER BY c DESC, neighbor_id) rk
       |    FROM bscored
       |  ) WHERE rk <= $K
       |)""".stripMargin

  /** [[exactFromNSqlCtes]] prefixed with the norm CTE, so it appends
    * equally to a fresh `WITH e` (q246) or to [[pqAsgSqlCtes]]'s existing
    * one (q247). */
  private val exactTopKTailSqlCtes: String =
    s"""n AS (
       |  SELECT vec_id, v,
       |         sqrt(list_reduce(list_transform(v, x -> x*x), (a,b) -> a+b)) nrm
       |  FROM e
       |), $exactFromNSqlCtes""".stripMargin

  /** The recall-scoreboard tail of the q246/q247 oracles: `exact` (from
    * [[exactTopKTailSqlCtes]]) left-joins an `approx(query_id, neighbor_id)`
    * CTE the caller provides. */
  private val recallSqlTail: String =
    """SELECT x.query_id,
      |       CAST(count(*) AS BIGINT) AS exact_cnt,
      |       CAST(count(i.neighbor_id) AS BIGINT) AS hits,
      |       CAST(count(i.neighbor_id) * 1000000 // count(*) AS BIGINT)
      |         AS recall_ppm,
      |       CAST(coalesce(min(CASE WHEN i.neighbor_id IS NULL
      |                              THEN x.rk END), 0) AS BIGINT)
      |         AS first_miss_rk
      |FROM exact x
      |LEFT JOIN approx i
      |  ON i.query_id = x.query_id AND i.neighbor_id = x.neighbor_id
      |GROUP BY x.query_id
      |ORDER BY x.query_id""".stripMargin

  /** The label-carrying IVF replay prologue of the q255/q256 oracles —
    * q66's CTE chain with the label riding `n`, `assigned` and `qpr`, and
    * the label-equality predicate folded into the candidate join. Ends at
    * `fscored(query_id, neighbor_id, c)`; ONE copy shared by the search
    * (q255) and its scoreboard (q256) so engine and oracle can never
    * drift between them. */
  private val filteredIvfSqlCtes: String =
    s"""e AS (
       |  SELECT vec_id, embedding::DOUBLE[] v, CAST(label AS BIGINT) lbl
       |  FROM embeddings
       |), n AS (
       |  SELECT vec_id, v, lbl,
       |         sqrt(list_reduce(list_transform(v, x -> x*x), (a,b) -> a+b)) nrm
       |  FROM e
       |), cents AS (
       |  SELECT vec_id AS cent_id, v AS cv, nrm AS cn FROM n
       |  WHERE ((vec_id % 2147483647) * 1103515245 + 12345)
       |          % 2147483647 % 50 = 0
       |), ac AS (
       |  SELECT n.vec_id, n.v, n.nrm, n.lbl, c.cent_id,
       |         list_reduce(list_transform(range(1, len(n.v) + 1),
       |                                    i -> n.v[i] * c.cv[i]),
       |                     (x,y) -> x+y) / (n.nrm * c.cn) AS cc
       |  FROM n, cents c
       |), assigned AS (
       |  SELECT vec_id, v, nrm, lbl, cent_id FROM (
       |    SELECT *, row_number() OVER (PARTITION BY vec_id
       |                ORDER BY cc DESC, cent_id DESC) rn
       |    FROM ac
       |  ) WHERE rn = 1
       |), qpr AS (
       |  SELECT vec_id AS query_id, v AS qv, nrm AS qn, lbl AS qlbl, cent_id
       |  FROM (
       |    SELECT *, row_number() OVER (PARTITION BY vec_id
       |                ORDER BY cc DESC, cent_id) crk
       |    FROM ac WHERE vec_id % 50 = 0
       |  ) WHERE crk <= $IvfProbes
       |), fscored AS (
       |  SELECT q.query_id, a.vec_id AS neighbor_id,
       |         list_reduce(list_transform(range(1, len(q.qv) + 1),
       |                                    i -> q.qv[i] * a.v[i]),
       |                     (x,y) -> x+y) / (q.qn * a.nrm) AS c
       |  FROM assigned a JOIN qpr q USING (cent_id)
       |  WHERE a.vec_id <> q.query_id AND a.lbl = q.qlbl
       |)""".stripMargin

  /** q236's strided PQ decomposition: one row per (vec_id, m ∈ 0..3)
    * carrying the m-th strided subvector (dimension i goes to subspace
    * i mod 4). Shared by q236 (index build + ADC scan) and q245 (codebook
    * drift audit) so a decomposition tweak moves the index and its
    * monitor together. */
  private[operators] def pqSubs(s: SparkSession, dir: String): DataFrame =
    pqSubsOf(normed(s, dir))

  /** The strided decomposition of ANY `(vec_id, v)` frame — the seam the
    * versioned codebook store trains and audits through. */
  private[graft] def pqSubsOf(vecs: DataFrame): DataFrame =
    vecs
      .select(col("vec_id"), col("v"), explode(sequence(lit(0), lit(3))).as("m"))
      .select(col("vec_id"), col("m"),
        transform(sequence(lit(1) + col("m"), size(col("v")), lit(4)),
          i => element_at(col("v"), i)).as("sv"))

  /** q236's ranked per-subspace codebook: the deterministic ~3% LCG sample
    * of the corpus's own subvectors, with `crk` the 1-based rank a CODE
    * stores and a query LUT is addressed by (the same ids are sampled in
    * every subspace, so the rank range is uniform across m). */
  private[operators] def pqCodebook(s: SparkSession, dir: String): DataFrame =
    pqCodebookOf(pqSubs(s, dir))

  /** The q236 codebook trainer over ANY decomposed `(vec_id, m, sv)`
    * frame — shared by the corpus-reading form above and the versioned
    * store's retrain path, so a trainer tweak moves both together. */
  private[graft] def pqCodebookOf(subs: DataFrame): DataFrame =
    subs.filter(
      ((col("vec_id") % 2147483647L) * 1103515245L + 12345L)
        % 2147483647L % 31 === 0)
      .select(col("m"), col("vec_id").as("cent_id"), col("sv").as("csub"))
      .withColumn("crk",
        row_number().over(Window.partitionBy("m").orderBy("cent_id")).cast("long"))

  /** The PQ decomposition + assignment CTE prefix (e → subs → cents →
    * centsrk → asg) shared by the q236 and q245 oracles — the SQL twin of
    * [[pqSubs]]/[[pqCodebook]]. `asg` carries every (vector, subspace,
    * codebook entry) L2 so downstream queries pick winners their own way. */
  private[operators] val pqAsgSqlCtes: String =
    """WITH e AS (
      |  SELECT vec_id, embedding::DOUBLE[] v FROM embeddings
      |), subs AS (
      |  SELECT vec_id, m,
      |         list_transform(range(1 + m, len(v) + 1, 4), i -> v[i]) sv
      |  FROM e, unnest([0, 1, 2, 3]) t(m)
      |), cents AS (
      |  SELECT vec_id AS cent_id, m, sv AS csub FROM subs
      |  WHERE ((vec_id % 2147483647) * 1103515245 + 12345)
      |          % 2147483647 % 31 = 0
      |), centsrk AS (
      |  SELECT cent_id, m, csub,
      |         CAST(row_number() OVER (PARTITION BY m
      |           ORDER BY cent_id) AS BIGINT) crk
      |  FROM cents
      |), asg AS (
      |  SELECT s.vec_id, s.m, c.cent_id, c.crk,
      |         list_reduce(list_transform(range(1, len(s.sv) + 1),
      |           i -> (s.sv[i] - c.csub[i]) * (s.sv[i] - c.csub[i])),
      |           (x, y) -> x + y) AS l2
      |  FROM subs s JOIN centsrk c USING (m)
      |)""".stripMargin

  /** [[pqAsgSqlCtes]] with the q279/q280 fixed-form cap: centsrk keeps
    * its first [[FixedCodebookEntries]] ranks per subspace BEFORE `asg`
    * consumes it, so codes, LUTs and errors all address the capped book. */
  private val pqAsgFixedSqlCtes: String =
    s"""WITH e AS (
      |  SELECT vec_id, embedding::DOUBLE[] v FROM embeddings
      |), subs AS (
      |  SELECT vec_id, m,
      |         list_transform(range(1 + m, len(v) + 1, 4), i -> v[i]) sv
      |  FROM e, unnest([0, 1, 2, 3]) t(m)
      |), centsrk AS (
      |  SELECT * FROM (
      |    SELECT vec_id AS cent_id, m, sv AS csub,
      |           CAST(row_number() OVER (PARTITION BY m
      |             ORDER BY vec_id) AS BIGINT) crk
      |    FROM subs
      |    WHERE ((vec_id % 2147483647) * 1103515245 + 12345)
      |            % 2147483647 % 31 = 0
      |  ) WHERE crk <= $FixedCodebookEntries
      |), asg AS (
      |  SELECT s.vec_id, s.m, c.cent_id, c.crk,
      |         list_reduce(list_transform(range(1, len(s.sv) + 1),
      |           i -> (s.sv[i] - c.csub[i]) * (s.sv[i] - c.csub[i])),
      |           (x, y) -> x + y) AS l2
      |  FROM subs s JOIN centsrk c USING (m)
      |)""".stripMargin

  /** The fixed query panel's SQL predicate — [[panelPred]]'s twin. */
  private def fixedPanelSql(p: String = ""): String =
    s"${p}vec_id % 50 = 0 AND ${p}vec_id < $FixedPanelMaxId"

  /** The IVF-PQ approximate-side CTE chain shared by the q249 and q250
    * oracles — the SQL twin of [[ivfPqTopK]]. Assumes `e`, `subs`,
    * `centsrk`, `asg` (from [[pqAsgSqlCtes]]) and `n` (norms) are in
    * scope; ends at `rr`, the exact-cosine re-ranked ADC survivors. */
  private def ivfPqSqlCtes(probes: Int, depth: Int): String =
    s"""best AS (
       |  SELECT vec_id, m, crk FROM (
       |    SELECT *, row_number() OVER (PARTITION BY vec_id, m
       |                                 ORDER BY l2, cent_id DESC) rn
       |    FROM asg
       |  ) WHERE rn = 1
       |), codes AS (
       |  SELECT vec_id, list(crk ORDER BY m) cd FROM best GROUP BY vec_id
       |), qlut AS (
       |  SELECT vec_id AS query_id, list(dot ORDER BY m, crk) lut,
       |         CAST(max(crk) AS BIGINT) nc
       |  FROM (
       |    SELECT s.vec_id, c.m, c.crk,
       |           list_reduce(list_transform(range(1, len(s.sv) + 1),
       |             i -> s.sv[i] * c.csub[i]), (x, y) -> x + y) dot
       |    FROM subs s JOIN centsrk c USING (m)
       |    WHERE s.vec_id % 50 = 0
       |  ) GROUP BY vec_id
       |), icents AS (
       |  SELECT vec_id AS cent_id, v AS cv, nrm AS cn FROM n
       |  WHERE ((vec_id % 2147483647) * 1103515245 + 12345)
       |          % 2147483647 % 50 = 0
       |), iac AS (
       |  SELECT n.vec_id, n.nrm, c.cent_id,
       |         list_reduce(list_transform(range(1, len(n.v) + 1),
       |                                    i -> n.v[i] * c.cv[i]),
       |                     (x,y) -> x+y) / (n.nrm * c.cn) AS cc
       |  FROM n, icents c
       |), iassigned AS (
       |  SELECT vec_id, cent_id FROM (
       |    SELECT *, row_number() OVER (PARTITION BY vec_id
       |                ORDER BY cc DESC, cent_id DESC) rn
       |    FROM iac
       |  ) WHERE rn = 1
       |), qpr AS (
       |  SELECT vec_id AS query_id, cent_id FROM (
       |    SELECT *, row_number() OVER (PARTITION BY vec_id
       |                ORDER BY cc DESC, cent_id) crk
       |    FROM iac WHERE vec_id % 50 = 0
       |  ) WHERE crk <= $probes
       |), cand AS (
       |  SELECT q.query_id, a.vec_id AS neighbor_id,
       |         q.lut[a.cd[1]] + q.lut[q.nc + a.cd[2]]
       |           + q.lut[2 * q.nc + a.cd[3]]
       |           + q.lut[3 * q.nc + a.cd[4]] AS sc
       |  FROM qpr p
       |  JOIN qlut q ON q.query_id = p.query_id
       |  JOIN iassigned ia ON ia.cent_id = p.cent_id
       |  JOIN codes a ON a.vec_id = ia.vec_id
       |  WHERE a.vec_id <> q.query_id
       |), pruned AS (
       |  SELECT query_id, neighbor_id,
       |         row_number() OVER (PARTITION BY query_id
       |                            ORDER BY sc DESC, neighbor_id) prk
       |  FROM cand
       |), rr AS (
       |  SELECT p.query_id, p.neighbor_id,
       |         list_reduce(list_transform(range(1, len(qn.v) + 1),
       |           i -> qn.v[i] * a.v[i]), (x, y) -> x + y)
       |           / (qn.nrm * a.nrm) AS c
       |  FROM pruned p
       |  JOIN n a ON a.vec_id = p.neighbor_id
       |  JOIN n qn ON qn.vec_id = p.query_id
       |  WHERE p.prk <= $depth
       |)""".stripMargin

  /** [[ivfPqSqlCtes]] under the q280 fixed dials: the panel bounded to
    * the absolute id range, and the centroid stride derived from count(*)
    * exactly as [[fixedCentStride]] derives it from the parquet footer —
    * both engines floor the same IEEE sqrt and truncate the same integer
    * division. Assumes `e`, `subs`, `centsrk`, `asg` (from
    * [[pqAsgFixedSqlCtes]]) and `n` are in scope; ends at `rr`. */
  private def ivfPqFixedSqlCtes(probes: Int, depth: Int): String =
    s"""best AS (
       |  SELECT vec_id, m, crk FROM (
       |    SELECT *, row_number() OVER (PARTITION BY vec_id, m
       |                                 ORDER BY l2, cent_id DESC) rn
       |    FROM asg
       |  ) WHERE rn = 1
       |), codes AS (
       |  SELECT vec_id, list(crk ORDER BY m) cd FROM best GROUP BY vec_id
       |), qlut AS (
       |  SELECT vec_id AS query_id, list(dot ORDER BY m, crk) lut,
       |         CAST(max(crk) AS BIGINT) nc
       |  FROM (
       |    SELECT s.vec_id, c.m, c.crk,
       |           list_reduce(list_transform(range(1, len(s.sv) + 1),
       |             i -> s.sv[i] * c.csub[i]), (x, y) -> x + y) dot
       |    FROM subs s JOIN centsrk c USING (m)
       |    WHERE ${fixedPanelSql("s.")}
       |  ) GROUP BY vec_id
       |), fparams AS (
       |  SELECT greatest(1, count(*) // greatest(4,
       |           CAST(floor(sqrt(CAST(count(*) AS DOUBLE))) AS BIGINT)))
       |           AS stride
       |  FROM embeddings
       |), icents AS (
       |  SELECT vec_id AS cent_id, v AS cv, nrm AS cn FROM n, fparams
       |  WHERE ((vec_id % 2147483647) * 1103515245 + 12345)
       |          % 2147483647 % fparams.stride = 0
       |), iac AS (
       |  SELECT n.vec_id, n.nrm, c.cent_id,
       |         list_reduce(list_transform(range(1, len(n.v) + 1),
       |                                    i -> n.v[i] * c.cv[i]),
       |                     (x,y) -> x+y) / (n.nrm * c.cn) AS cc
       |  FROM n, icents c
       |), iassigned AS (
       |  SELECT vec_id, cent_id FROM (
       |    SELECT *, row_number() OVER (PARTITION BY vec_id
       |                ORDER BY cc DESC, cent_id DESC) rn
       |    FROM iac
       |  ) WHERE rn = 1
       |), qpr AS (
       |  SELECT vec_id AS query_id, cent_id FROM (
       |    SELECT *, row_number() OVER (PARTITION BY vec_id
       |                ORDER BY cc DESC, cent_id) crk
       |    FROM iac WHERE ${fixedPanelSql()}
       |  ) WHERE crk <= $probes
       |), cand AS (
       |  SELECT q.query_id, a.vec_id AS neighbor_id,
       |         q.lut[a.cd[1]] + q.lut[q.nc + a.cd[2]]
       |           + q.lut[2 * q.nc + a.cd[3]]
       |           + q.lut[3 * q.nc + a.cd[4]] AS sc
       |  FROM qpr p
       |  JOIN qlut q ON q.query_id = p.query_id
       |  JOIN iassigned ia ON ia.cent_id = p.cent_id
       |  JOIN codes a ON a.vec_id = ia.vec_id
       |  WHERE a.vec_id <> q.query_id
       |), pruned AS (
       |  SELECT query_id, neighbor_id,
       |         row_number() OVER (PARTITION BY query_id
       |                            ORDER BY sc DESC, neighbor_id) prk
       |  FROM cand
       |), rr AS (
       |  SELECT p.query_id, p.neighbor_id,
       |         list_reduce(list_transform(range(1, len(qn.v) + 1),
       |           i -> qn.v[i] * a.v[i]), (x, y) -> x + y)
       |           / (qn.nrm * a.nrm) AS c
       |  FROM pruned p
       |  JOIN n a ON a.vec_id = p.neighbor_id
       |  JOIN n qn ON qn.vec_id = p.query_id
       |  WHERE p.prk <= $depth
       |)""".stripMargin

  /** The q280/q281 oracle: one replay of the fixed-dial IVF-PQ pipeline.
    * SHARED because the two queries are the same math by contract — q280
    * derives the codes per run, q281 serves them from the installed
    * pillar; the spec pins them row-identical, and a shared oracle means
    * the contract cannot drift between them. */
  private lazy val ivfPqFixedOracleSql: String =
    s"""$pqAsgFixedSqlCtes, n AS (
       |  SELECT vec_id, v,
       |         sqrt(list_reduce(list_transform(v, x -> x*x), (a,b) -> a+b)) nrm
       |  FROM e
       |), ${ivfPqFixedSqlCtes(IvfProbes, IvfPqDepth)}, reranked AS (
       |  SELECT query_id, neighbor_id, c,
       |         row_number() OVER (PARTITION BY query_id
       |                            ORDER BY c DESC, neighbor_id) rk
       |  FROM rr
       |)
       |SELECT query_id, neighbor_id, CAST(rk AS BIGINT) rk,
       |       round(c, 4) AS cos
       |FROM reranked WHERE rk <= $K
       |ORDER BY query_id, rk""".stripMargin

  /** (vec_id, v, nrm, cd): [[normed]] plus q84's per-dimension min-max int8
    * codes — ONE copy of the quantization expression tree, because both
    * q84's and q130's oracle agreement depends on it staying bit-identical
    * (corpus stats are a 1-row broadcast; the sanctioned q66 shape). */
  private def quantized(s: SparkSession, dir: String): DataFrame = {
    val e = normed(s, dir)
    val stats = e
      .select(posexplode(col("v")).as(Seq("dim", "x")))
      .groupBy("dim").agg(min("x").as("mn"), max("x").as("mx"))
      .groupBy()
      .agg(transform(sort_array(collect_list(struct(col("dim"), col("mn")))),
             p => p("mn")).as("mns"),
           transform(sort_array(collect_list(struct(col("dim"), col("mx")))),
             p => p("mx")).as("mxs"))
    e.crossJoin(broadcast(stats))
      .select(col("vec_id"), col("v"), col("nrm"),
        transform(col("v"), (x, i) => {
          val mn = element_at(col("mns"), i + 1)
          val mx = element_at(col("mxs"), i + 1)
          when(mx === mn, lit(0L))
            .otherwise(floor((x - mn) * lit(255.0) / (mx - mn)))
        }).as("cd"))
  }

  /** Deterministic ±1 sign hyperplanes: `tables` tables × `bits` planes each,
    * derived from xxhash-style mixing of (table, bit, dim) — reproducible
    * across JVMs with no RNG state. */
  private[graft] def hyperplane(table: Int, bit: Int, dim: Int): Seq[Double] =
    (0 until dim).map { d =>
      var z = (table.toLong << 40) + (bit.toLong << 20) + d + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^= z >>> 31
      if ((z & 1L) == 0L) 1.0 else -1.0
    }

  /** Sign-LSH code width for an n-vector corpus: smallest b in [8,24] with
    * 2^b · 32 ≥ (b+1) · n, i.e. expected probe rows per bucket stay under
    * the bucket cap as the corpus grows — more vectors, more bits, constant
    * bucket load. Shared by q44 (ANN) and q67 (near-dup); n comes from
    * parquet footers so index sizing never launches a job. */
  private[graft] def codeBits(nVecs: Long): Int =
    Iterator.from(8).dropWhile(b => (1L << b) * 32 < (b + 1L) * nVecs).next().min(24)

  /** q44's DuckDB oracle: a full deterministic REPLAY of the LSH index —
    * the same plan the engine runs, re-expressed in SQL (the q130 pattern
    * that turned a spec-only approximate operator into an oracle row).
    *
    * The hyperplane signs come from splitmix64, which DuckDB cannot
    * compute (BIGINT multiply raises on overflow instead of wrapping), but
    * the planes are DATA-INDEPENDENT constants — so the generator bakes
    * the full 4-table × 24-bit × 64-dim sign matrix into the SQL as 96
    * rows of two 32-bit halves (sign(d) = bit d of lo/hi), and the query
    * slices the first `bits` planes after deriving the same codeBits rule
    * from count(*). Everything downstream — per-bit ascending-index dot
    * products, strict >0 sign, Hamming≤2 probe masks, candidate dedup,
    * exact re-rank — mirrors the engine expression-for-expression, so the
    * float arithmetic is bit-identical. */
  /** The 4-table × 24-bit × 64-dim hyperplane sign matrix as SQL VALUES
    * rows of two 32-bit bitmask halves (sign(d) = bit d of lo/hi) — shared
    * by the q44 and q67 replay oracles. */
  private[operators] def planeValuesSql: String =
    (for { t <- 0 until 4; b <- 0 until 24 } yield {
      val signs = hyperplane(t, b, 64)
      val lo = (0 until 32).map(d => if (signs(d) > 0) 1L << d else 0L).sum
      val hi = (32 until 64).map(d => if (signs(d) > 0) 1L << (d - 32) else 0L).sum
      s"($t,$b,$lo,$hi)"
    }).mkString(",\n    ")

  /** Shared replay prologue for the sign-LSH oracles: normed vectors,
    * codeBits from count(*), sign matrix, per-(vector, table) codes. */
  private[operators] def lshReplayPrologue: String =
    s"""WITH e AS (
       |  SELECT vec_id, embedding::DOUBLE[] v FROM embeddings
       |), n AS (
       |  SELECT vec_id, v,
       |         sqrt(list_reduce(list_transform(v, x -> x*x), (a,b) -> a+b)) nrm
       |  FROM e
       |), params AS (
       |  SELECT min(b) AS bits
       |  FROM range(8, 25) t(b), (SELECT count(*) AS cnt FROM e) c
       |  WHERE (1::BIGINT << b) * 32 >= (b + 1) * c.cnt
       |), planes(tbl, bit, lo, hi) AS (
       |  VALUES $planeValuesSql
       |), signs AS (
       |  SELECT tbl, bit,
       |         list_transform(range(0, 64), d ->
       |           CASE WHEN (CASE WHEN d < 32 THEN (lo >> d) & 1
       |                           ELSE (hi >> (d - 32)) & 1 END) = 1
       |                THEN 1.0 ELSE -1.0 END) AS s
       |  FROM planes, params WHERE bit < bits
       |), codes AS (
       |  SELECT n.vec_id, sg.tbl,
       |         CAST(sum(CASE WHEN list_reduce(
       |                 list_transform(range(1, 65), i -> n.v[i] * sg.s[i]),
       |                 (x,y) -> x+y) > 0
       |               THEN (1::BIGINT << sg.bit) ELSE 0 END) AS BIGINT) AS code
       |  FROM n, signs sg
       |  GROUP BY n.vec_id, sg.tbl
       |)""".stripMargin

  private def lshOracleSql: String = {
    val MaxBits = 24
    val Dim = 64
    s"""$lshReplayPrologue, idx AS (
       |  SELECT i FROM range(0, $MaxBits) t(i), params WHERE i < bits
       |), masks AS (
       |  SELECT 0::BIGINT AS m
       |  UNION ALL SELECT (1::BIGINT << i) FROM idx
       |  UNION ALL SELECT (1::BIGINT << a.i) | (1::BIGINT << b.i)
       |            FROM idx a, idx b WHERE b.i > a.i
       |), qprobes AS (
       |  SELECT vec_id AS query_id, tbl, xor(code, m) AS code
       |  FROM codes, masks WHERE vec_id % 50 = 0
       |), cand AS (
       |  SELECT DISTINCT q.query_id, c.vec_id AS neighbor_id
       |  FROM codes c JOIN qprobes q USING (tbl, code)
       |  WHERE c.vec_id <> q.query_id
       |), scored AS (
       |  SELECT cand.query_id, cand.neighbor_id,
       |         list_reduce(list_transform(range(1, ${Dim + 1}),
       |                                    i -> q.v[i] * a.v[i]),
       |                     (x,y) -> x+y) / (q.nrm * a.nrm) AS c
       |  FROM cand
       |  JOIN n q ON q.vec_id = cand.query_id
       |  JOIN n a ON a.vec_id = cand.neighbor_id
       |), ranked AS (
       |  SELECT query_id, neighbor_id, c,
       |         row_number() OVER (PARTITION BY query_id
       |                            ORDER BY c DESC, neighbor_id) rk
       |  FROM scored
       |)
       |SELECT query_id, neighbor_id, CAST(rk AS BIGINT) AS rk, round(c, 4) AS cos
       |FROM ranked WHERE rk <= $K
       |ORDER BY query_id, rk""".stripMargin
  }

  val all: Seq[GraftQuery] = Seq(

    GraftQuery(
      "q43_knn_bruteforce",
      Some(s"""WITH e AS (
              |  SELECT vec_id, embedding::DOUBLE[] v FROM embeddings
              |), n AS (
              |  SELECT vec_id, v,
              |         sqrt(list_reduce(list_transform(v, x -> x*x), (a,b) -> a+b)) nrm
              |  FROM e
              |), q AS (
              |  SELECT * FROM n WHERE vec_id % 50 = 0
              |), scored AS (
              |  SELECT q.vec_id query_id, a.vec_id neighbor_id,
              |         list_reduce(list_transform(range(1, len(q.v)+1),
              |                                    i -> q.v[i] * a.v[i]),
              |                     (x,y) -> x+y) / (q.nrm * a.nrm) c
              |  FROM q JOIN n a ON a.vec_id <> q.vec_id
              |), ranked AS (
              |  SELECT query_id, neighbor_id, c,
              |         row_number() OVER (PARTITION BY query_id
              |                            ORDER BY c DESC, neighbor_id) rk
              |  FROM scored
              |)
              |SELECT query_id, neighbor_id, rk, round(c, 4) AS cos
              |FROM ranked WHERE rk <= $K
              |ORDER BY query_id, rk""".stripMargin),
      "Exact ANN baseline: the small query set is broadcast against the " +
        "corpus scan (no corpus shuffle), then top-k is taken in two phases " +
        "— a k-bounded heap aggregate with map-side partials, so no reducer " +
        "query's full n scored rows, then a final top-k over 64·k survivors. " +
        "This is the plan that survives a 10^9-vector corpus; the window " +
        "never materializes a global per-query sort."
    ) { (s, dir) =>
      bruteTopK(s, dir)
        .select(col("query_id"), col("neighbor_id"), col("rk"),
          round(col("c"), 4).as("cos"))
        .orderBy("query_id", "rk")
    },

    GraftQuery(
      "q146_hard_negatives",
      Some(s"""WITH e AS (
              |  SELECT vec_id, embedding::DOUBLE[] v FROM embeddings
              |), n AS (
              |  SELECT vec_id, v,
              |         sqrt(list_reduce(list_transform(v, x -> x*x), (a,b) -> a+b)) nrm
              |  FROM e
              |), scored AS (
              |  SELECT q.vec_id AS query_id, a.vec_id AS neighbor_id,
              |         list_reduce(list_transform(range(1, len(q.v)+1),
              |                                    i -> q.v[i] * a.v[i]),
              |                     (x,y) -> x+y) / (q.nrm * a.nrm) AS c
              |  FROM n q JOIN n a ON a.vec_id <> q.vec_id
              |  WHERE q.vec_id % 50 = 0
              |), banded AS (
              |  SELECT query_id, neighbor_id, c,
              |         row_number() OVER (PARTITION BY query_id
              |                            ORDER BY c DESC, neighbor_id) rk
              |  FROM scored
              |  WHERE c >= CAST(0.10 AS DOUBLE) AND c < CAST(0.30 AS DOUBLE)
              |)
              |SELECT query_id, neighbor_id, CAST(rk AS BIGINT) AS rk,
              |       round(c, 4) AS cos
              |FROM banded WHERE rk <= 5
              |ORDER BY query_id, rk""".stripMargin),
      "HARD-NEGATIVE MINING — the contrastive-training counterpart of ANN " +
        "(q43 finds positives; a retrieval/embedding trainer also needs " +
        "the top negatives that are similar-but-not-near-dup, which is " +
        "what makes the loss informative): per anchor, candidates in the " +
        "cosine band [0.10, 0.30) — above random, below the near-dup " +
        "radius — ranked and cut to the 5 hardest. Same broadcast-anchor " +
        "scan shape as q43 with the band filter applied BEFORE the " +
        "k-bounded heap prune, so the rank machinery only ever sees " +
        "in-band rows. Band edges are explicit DOUBLE compares on the " +
        "bit-identical dot/norm expression tree — no cross-engine edge " +
        "flicker. At 100 TB the band filter composes with the q44/q66 " +
        "bucketed candidate generators exactly like the top-k does " +
        "(mine negatives from probed buckets, re-rank exactly)."
    ) { (s, dir) =>
      val n = normed(s, dir)
      val q = n.filter(col("vec_id") % 50 === 0)
        .select(col("vec_id").as("query_id"), col("v").as("qv"), col("nrm").as("qn"))
      val scored = n.join(broadcast(q), col("vec_id") =!= col("query_id"))
        .select(col("query_id"), col("vec_id").as("neighbor_id"),
          cosine(col("qv"), col("v"), col("qn"), col("nrm")).as("c"))
        .filter(col("c") >= lit(0.10) && col("c") < lit(0.30))
      topKRanked(scored, 5)
        .select(col("query_id"), col("neighbor_id"), col("rk"), round(col("c"), 4).as("cos"))
        .orderBy("query_id", "rk")
    },

    GraftQuery(
      "q149_random_projection",
      Some(s"""WITH e AS (
              |  SELECT vec_id, embedding::DOUBLE[] v FROM embeddings
              |), planes(tbl, bit, lo, hi) AS (
              |  VALUES $planeValuesSql
              |), signs AS (
              |  SELECT bit,
              |         list_transform(range(0, 64), d ->
              |           CASE WHEN (CASE WHEN d < 32 THEN (lo >> d) & 1
              |                           ELSE (hi >> (d - 32)) & 1 END) = 1
              |                THEN 1.0 ELSE -1.0 END) AS s
              |  FROM planes WHERE tbl = 0 AND bit < 16
              |), pls AS (
              |  SELECT list(s ORDER BY bit) AS pls FROM signs
              |)
              |SELECT vec_id,
              |       array_to_string(list_transform(pls, pl ->
              |         CAST(floor(list_reduce(
              |                list_transform(range(1, 65), i -> v[i] * pl[i]),
              |                (x,y) -> x+y) * CAST(1000000 AS DOUBLE))
              |           AS BIGINT)), ',') AS proj_micros_csv
              |FROM e, pls
              |ORDER BY vec_id""".stripMargin),
      "Random-projection dimensionality reduction (Johnson–Lindenstrauss " +
        "with ±1 Achlioptas entries): 64-dim embeddings project to 16 " +
        "dims through the SAME deterministic hyperplane sign matrix the " +
        "LSH family uses — the projection is the continuous form of " +
        "q44's codes (keep the dot product, don't threshold it), and at " +
        "scale it's what shrinks an ANN index 4× before quantization " +
        "(q84) shrinks it further. Entirely ROW-LOCAL map work through " +
        "ONE fused graft_project kernel (the plane matrix lives in codegen " +
        "references; 16 per-plane graft_dot literals would unroll 1024 " +
        "doubles into the generated projection, and the transform/" +
        "aggregate lambda-chain form is CodegenFallback in Spark 4 — " +
        "~16·64 interpreted evals per scanned row); there is no " +
        "join and no shuffle before the presentation sort. Components " +
        "are emitted as floor-to-micros integers in a canonical CSV " +
        "(atomic driver-facing type; the float sum is the same " +
        "ascending-index IEEE tree on both engines)."
    ) { (s, dir) =>
      // one fused graft_project pass (planes in codegen references; each
      // element the same ascending-index IEEE sum as the aggregate(
      // zip_with) fold it replaces, bit-identical) — the lambda chain over
      // a typedlit plane matrix is CodegenFallback in Spark 4: ~16·64
      // interpreted evals per row on the corpus scan
      val flat: Array[Double] =
        (0 until 16).flatMap(j => hyperplane(0, j, 64)).toArray
      val comps: Seq[Column] = (1 to 16).map { i =>
        floor(element_at(col("proj"), i) * lit(1000000.0))
          .cast("long").cast("string")
      }
      Tables.embeddings(s, dir)
        .select(col("vec_id"),
          transform(col("embedding"), _.cast("double")).as("v"))
        .select(col("vec_id"),
          graft.functions.VectorFunctions.projd(col("v"), flat, 16, 64)
            .as("proj"))
        .select(col("vec_id"), concat_ws(",", comps: _*).as("proj_micros_csv"))
        .orderBy("vec_id")
    },

    GraftQuery(
      "q44_knn_lsh",
      // approximate by design but fully DETERMINISTIC — the oracle replays
      // the index build + probe + re-rank in SQL (see lshOracleSql)
      Some(lshOracleSql),
      "Sign-LSH ANN (Charikar hyperplane LSH): 4 tables × adaptive-width " +
        "bucket codes per vector (codeBits: 2^bits ∝ n from parquet " +
        "footers — constant bucket load at any corpus size); query and " +
        "corpus meet in an equi-join on (table, bucket) instead of a cross " +
        "join — candidate volume drops from n·q to Σ bucket collisions, " +
        "and the join shuffles on a 2-int key. Multi-probe (Lv et al., " +
        "VLDB'07) on the small QUERY side only: each query probes every " +
        "bucket within Hamming ≤ 2 of its own code, multiplying recall at " +
        "zero corpus-side cost — the corpus is still written to exactly " +
        "one bucket per table. Only (query_id, neighbor_id) pairs flow " +
        "through the join and dedup (16 B/row); vectors join back for the " +
        "exact re-rank afterwards, so precision is 1 and no shuffle ever " +
        "carries a duplicated embedding. The same plan shape serves IVF: " +
        "swap bucket code for a centroid id, probe nearest centroids."
    ) { (s, dir) =>
      lshTopK(s, dir)
        .select(col("query_id"), col("neighbor_id"), col("rk"),
          round(col("c"), 4).as("cos"))
        .orderBy("query_id", "rk")
    },

    GraftQuery(
      "q66_knn_ivf",
      // deterministic replay oracle (the q44/q130 pattern): same centroid
      // rule, same argmax assignment, same probes, same re-rank in SQL
      Some(s"""WITH e AS (
              |  SELECT vec_id, embedding::DOUBLE[] v FROM embeddings
              |), n AS (
              |  SELECT vec_id, v,
              |         sqrt(list_reduce(list_transform(v, x -> x*x), (a,b) -> a+b)) nrm
              |  FROM e
              |), cents AS (
              |  SELECT vec_id AS cent_id, v AS cv, nrm AS cn FROM n
              |  WHERE ((vec_id % 2147483647) * 1103515245 + 12345)
              |          % 2147483647 % 50 = 0
              |), ac AS (
              |  SELECT n.vec_id, n.v, n.nrm, c.cent_id,
              |         list_reduce(list_transform(range(1, len(n.v) + 1),
              |                                    i -> n.v[i] * c.cv[i]),
              |                     (x,y) -> x+y) / (n.nrm * c.cn) AS cc
              |  FROM n, cents c
              |), assigned AS (
              |  SELECT vec_id, v, nrm, cent_id FROM (
              |    SELECT *, row_number() OVER (PARTITION BY vec_id
              |                ORDER BY cc DESC, cent_id DESC) rn
              |    FROM ac
              |  ) WHERE rn = 1
              |), qpr AS (
              |  SELECT vec_id AS query_id, v AS qv, nrm AS qn, cent_id FROM (
              |    SELECT *, row_number() OVER (PARTITION BY vec_id
              |                ORDER BY cc DESC, cent_id) crk
              |    FROM ac WHERE vec_id % 50 = 0
              |  ) WHERE crk <= 5
              |), scored AS (
              |  SELECT q.query_id, a.vec_id AS neighbor_id,
              |         list_reduce(list_transform(range(1, len(q.qv) + 1),
              |                                    i -> q.qv[i] * a.v[i]),
              |                     (x,y) -> x+y) / (q.qn * a.nrm) AS c
              |  FROM assigned a JOIN qpr q USING (cent_id)
              |  WHERE a.vec_id <> q.query_id
              |), ranked AS (
              |  SELECT query_id, neighbor_id, c,
              |         row_number() OVER (PARTITION BY query_id
              |                            ORDER BY c DESC, neighbor_id) rk
              |  FROM scored
              |)
              |SELECT query_id, neighbor_id, CAST(rk AS BIGINT) AS rk,
              |       round(c, 4) AS cos
              |FROM ranked WHERE rk <= $K
              |ORDER BY query_id, rk""".stripMargin),
      "IVF ANN (inverted-file index, the FAISS IVF-Flat shape): a " +
        "deterministic ~2% centroid sample is broadcast; every corpus " +
        "vector cross-joins the centroid list and a map-side max_by " +
        "partial agg collapses the C candidate rows per vector BEFORE the " +
        "exchange, so the assignment shuffle carries one row per vector, " +
        "not n×C. Queries probe their 5 nearest centroid cells " +
        "(multi-probe) and meet the corpus in an equi-join on centroid id; " +
        "candidates are exactly re-ranked (precision 1). At 100 TB the " +
        "sample becomes trained k-means centroids and the assignment a " +
        "periodic index build — the query plan is unchanged. Same plan " +
        "shape as q44 with centroid id in place of the LSH bucket code."
    ) { (s, dir) =>
      ivfTopK(s, dir)
        .select(col("query_id"), col("neighbor_id"), col("rk"),
          round(col("c"), 4).as("cos"))
        .orderBy("query_id", "rk")
    },

    GraftQuery(
      "q84_embedding_quantize",
      Some("""WITH e AS (
             |  SELECT vec_id, embedding::DOUBLE[] v FROM embeddings
             |), d AS (
             |  SELECT unnest(v) x, generate_subscripts(v, 1) AS dim FROM e
             |), st AS (
             |  SELECT dim, min(x) mn, max(x) mx FROM d GROUP BY dim
             |), arrs AS (
             |  SELECT list(mn ORDER BY dim) mns, list(mx ORDER BY dim) mxs FROM st
             |)
             |SELECT vec_id,
             |       array_to_string(
             |         list_transform(range(1, len(v) + 1), i ->
             |           CASE WHEN mxs[i] = mns[i] THEN 0
             |                ELSE CAST(floor((v[i] - mns[i]) * 255.0
             |                                 / (mxs[i] - mns[i])) AS BIGINT) END),
             |         ',') AS codes_csv
             |FROM e, arrs
             |ORDER BY vec_id""".stripMargin),
      "Per-dimension min-max int8 quantization — the 8×-smaller index scale " +
        "path every production ANN system runs (scan 1 byte/dim, re-rank " +
        "survivors at full precision). Corpus stats are one 64-key partial " +
        "agg over posexploded dims (map-side combine collapses each " +
        "partition to 64 rows before the exchange), collected into two " +
        "64-element arrays and broadcast as a single row — the " +
        "one-row-broadcast nested loop is the sanctioned q66 shape, NOT a " +
        "pair product. Codes are exact integers on both engines because " +
        "(x−mn)·255/(mx−mn) is the identical IEEE expression tree and " +
        "floor() of the same double is the same long — no rounding-mode " +
        "drift, no transcendentals. Constant dims quantize to 0 by " +
        "explicit guard rather than 0/0. The code vector itself stays " +
        "array<long> inside the plan (q130 scans it directly); the " +
        "DRIVER-FACING column is its canonical CSV string, because array " +
        "result columns crash the harness's pandas sort (the r3 lesson: " +
        "oracle-checked outputs must be atomic-typed)."
    ) { (s, dir) =>
      quantized(s, dir)
        .select(col("vec_id"),
          array_join(transform(col("cd"), _.cast("string")), ",")
            .as("codes_csv"))
        .orderBy("vec_id")
    },

    GraftQuery(
      "q130_quantized_ann",
      Some(s"""WITH e AS (
              |  SELECT vec_id, embedding::DOUBLE[] v FROM embeddings
              |), d AS (
              |  SELECT unnest(v) x, generate_subscripts(v, 1) AS dim FROM e
              |), st AS (
              |  SELECT dim, min(x) mn, max(x) mx FROM d GROUP BY dim
              |), arrs AS (
              |  SELECT list(mn ORDER BY dim) mns, list(mx ORDER BY dim) mxs FROM st
              |), codes AS (
              |  SELECT vec_id, v,
              |         sqrt(list_reduce(list_transform(v, x -> x*x), (a,b) -> a+b)) nrm,
              |         list_transform(range(1, len(v) + 1), i ->
              |           CASE WHEN mxs[i] = mns[i] THEN 0
              |                ELSE CAST(floor((v[i] - mns[i]) * 255.0
              |                                 / (mxs[i] - mns[i])) AS BIGINT) END) cd
              |  FROM e, arrs
              |), q AS (
              |  SELECT * FROM codes WHERE vec_id % 50 = 0
              |), cand AS (
              |  SELECT q.vec_id query_id, a.vec_id neighbor_id,
              |         CAST(list_reduce(list_transform(range(1, len(q.cd) + 1),
              |                                         i -> q.cd[i] * a.cd[i]),
              |                          (x, y) -> x + y) AS BIGINT) isc,
              |         list_reduce(list_transform(range(1, len(q.v) + 1),
              |                                    i -> q.v[i] * a.v[i]),
              |                     (x, y) -> x + y) / (q.nrm * a.nrm) c
              |  FROM q JOIN codes a ON a.vec_id <> q.vec_id
              |), pruned AS (
              |  SELECT query_id, neighbor_id, c,
              |         row_number() OVER (PARTITION BY query_id
              |                            ORDER BY isc DESC, neighbor_id) prk
              |  FROM cand
              |), reranked AS (
              |  SELECT query_id, neighbor_id, c,
              |         row_number() OVER (PARTITION BY query_id
              |                            ORDER BY c DESC, neighbor_id) rk
              |  FROM pruned WHERE prk <= 32
              |)
              |SELECT query_id, neighbor_id, rk, round(c, 4) AS cos
              |FROM reranked WHERE rk <= $K
              |ORDER BY query_id, rk""".stripMargin),
      "Quantized retrieval — q84's int8 codes doing their actual job: " +
        "candidates are scored with an INTEGER dot product over 1-byte " +
        "codes (8× less memory bandwidth than q43's float scan, and " +
        "EXACT cross-engine arithmetic — the candidate set is " +
        "bit-deterministic where a float candidate score would be a " +
        "tie-break hazard), pruned to 32 per query with the k-bounded " +
        "two-phase top-k, and only the 32 survivors' ids flow to the " +
        "float re-rank — both sides re-join the corpus BY ID for exact " +
        "cosine (q67's id-only candidate discipline: vectors never ride " +
        "the prune shuffle). This is the production scan-cheap/re-rank-" +
        "exact ANN layout (SQ8 + refine in FAISS terms); recall loss " +
        "lives only between int8 ranks 32 and k, and the oracle replays " +
        "the identical two-phase pipeline, so the check is hash-exact, " +
        "not recall-tolerant. At 100 TB the code table is the thing " +
        "that fits in memory: 64 B/vector instead of 512."
    ) { (s, dir) =>
      val base = quantized(s, dir)
      val q = base.filter(col("vec_id") % 50 === 0)
        .select(col("vec_id").as("query_id"), col("cd").as("qcd"))
      // integer candidate scores via the native fused dot (the HOF form
      // is interpreted per candidate row); only (query_id, neighbor_id,
      // isc) ride on. Pruning is the k-bounded heap aggregate, not a
      // window — see adcPruneRerank: identical (isc DESC, id ASC)
      // survivors (integer scores are exact in double), nothing sorts
      // more than 32 elements. The cast is monotone and injective here:
      // |isc| ≤ 64·255² ≪ 2^53.
      val isc = graft.functions.VectorFunctions.dotl(col("cd"), col("qcd"))
      val survivors = base.select(col("vec_id"), col("cd"))
        .join(broadcast(q), col("vec_id") =!= col("query_id"))
        .select(col("query_id"), col("vec_id").as("neighbor_id"), isc.as("isc"))
        .groupBy("query_id")
        .agg(graft.functions.Sketches.topPairs(col("isc").cast("double"),
          col("neighbor_id"), 32).as("top"))
        .select(col("query_id"), explode(col("top.id")).as("neighbor_id"))
      // exact re-rank: survivors re-join vectors by id (query side is tiny
      // and broadcast; neighbor side is 32·|Q| rows against the corpus)
      val qv = base.filter(col("vec_id") % 50 === 0)
        .select(col("vec_id").as("query_id"), col("v").as("qv"), col("nrm").as("qn"))
      val rerank = Window.partitionBy(col("query_id"))
        .orderBy(col("c").desc, col("neighbor_id"))
      survivors
        .join(base.select(col("vec_id").as("neighbor_id"), col("v"), col("nrm")), "neighbor_id")
        .join(broadcast(qv), "query_id")
        .withColumn("c", cosine(col("qv"), col("v"), col("qn"), col("nrm")))
        .withColumn("rk", row_number().over(rerank).cast("long")).filter(col("rk") <= K)
        .select(col("query_id"), col("neighbor_id"), col("rk"), round(col("c"), 4).as("cos"))
        .orderBy("query_id", "rk")
    },

    GraftQuery(
      "q236_pq_ann",
      Some(s"""$pqAsgSqlCtes, n AS (
              |  SELECT vec_id, v,
              |         sqrt(list_reduce(list_transform(v, x -> x*x), (a,b) -> a+b)) nrm
              |  FROM e
              |), best AS (
              |  SELECT vec_id, m, crk FROM (
              |    SELECT *, row_number() OVER (PARTITION BY vec_id, m
              |                                 ORDER BY l2, cent_id DESC) rn
              |    FROM asg
              |  ) WHERE rn = 1
              |), codes AS (
              |  SELECT vec_id, list(crk ORDER BY m) cd FROM best GROUP BY vec_id
              |), qlut AS (
              |  SELECT vec_id AS query_id, list(dot ORDER BY m, crk) lut,
              |         CAST(max(crk) AS BIGINT) nc
              |  FROM (
              |    SELECT s.vec_id, c.m, c.crk,
              |           list_reduce(list_transform(range(1, len(s.sv) + 1),
              |             i -> s.sv[i] * c.csub[i]), (x, y) -> x + y) dot
              |    FROM subs s JOIN centsrk c USING (m)
              |    WHERE s.vec_id % 50 = 0
              |  ) GROUP BY vec_id
              |), cand AS (
              |  SELECT q.query_id, a.vec_id AS neighbor_id,
              |         q.lut[a.cd[1]] + q.lut[q.nc + a.cd[2]]
              |           + q.lut[2 * q.nc + a.cd[3]]
              |           + q.lut[3 * q.nc + a.cd[4]] AS sc
              |  FROM qlut q JOIN codes a ON a.vec_id <> q.query_id
              |), pruned AS (
              |  SELECT query_id, neighbor_id,
              |         row_number() OVER (PARTITION BY query_id
              |                            ORDER BY sc DESC, neighbor_id) prk
              |  FROM cand
              |), rr AS (
              |  SELECT p.query_id, p.neighbor_id,
              |         list_reduce(list_transform(range(1, len(qn.v) + 1),
              |           i -> qn.v[i] * a.v[i]), (x, y) -> x + y)
              |           / (qn.nrm * a.nrm) AS c
              |  FROM pruned p
              |  JOIN n a ON a.vec_id = p.neighbor_id
              |  JOIN n qn ON qn.vec_id = p.query_id
              |  WHERE p.prk <= 32
              |), reranked AS (
              |  SELECT query_id, neighbor_id, c,
              |         row_number() OVER (PARTITION BY query_id
              |                            ORDER BY c DESC, neighbor_id) rk
              |  FROM rr
              |)
              |SELECT query_id, neighbor_id, CAST(rk AS BIGINT) rk,
              |       round(c, 4) AS cos
              |FROM reranked WHERE rk <= $K
              |ORDER BY query_id, rk""".stripMargin),
      "Product-quantized retrieval (PQ/ADC, the codebook pillar next to " +
        "q130's scalar SQ8): each vector is cut into 4 STRIDED subspaces " +
        "(dimension i goes to subspace i mod 4 — a fixed permutation, so " +
        "no divisibility constraint on dim), each subvector is assigned " +
        "to its nearest (L2, ties to the larger id — both engines replay " +
        "the rule) codebook entry from a deterministic ~3% LCG sample of " +
        "the corpus's own subvectors, and a database vector is thereafter " +
        "REPRESENTED by 4 small codes: memory per vector is 4 code ids " +
        "instead of 64 floats, the 16×-and-beyond compression that lets " +
        "a 100 TB corpus's index live in executor memory — and the scan " +
        "actually READS that layout: candidate rows carry only their 4 " +
        "codes, never a float vector. Retrieval is asymmetric distance " +
        "computation via per-query lookup tables: each query " +
        "pre-computes its dot product against every codebook entry (4 × " +
        "|codebook| doubles, broadcast with the query), a candidate's " +
        "score is FOUR table lookups added in fixed subspace order " +
        "(bit-identical across engines — no reduction-order ambiguity), " +
        "and the 32 ADC survivors re-rank by exact cosine through an " +
        "id-only join (q67's discipline: full vectors never ride the " +
        "prune shuffle). Candidate pruning uses the k-bounded heap " +
        "top-k; recall loss lives only between ADC rank 32 and k, and " +
        "the oracle replays the identical pipeline so the check is " +
        "hash-exact, not recall-tolerant. At 100 TB the codebooks are " +
        "q86-trained per-subspace k-means (broadcast, a few KB), the " +
        "code table is 4 small ints per vector, and ADC bandwidth is " +
        "lookups, not multiplies — the FAISS IVFPQ layout minus the IVF " +
        "gate q66 already provides."
    ) { (s, dir) =>
      pqTopK(s, dir)
        .select(col("query_id"), col("neighbor_id"), col("rk"),
          round(col("c"), 4).as("cos"))
        .orderBy("query_id", "rk")
    },

    GraftQuery(
      "q124_embedding_pool",
      Some("""WITH cell AS (
             |  SELECT label, dim,
             |         -- CAST first: FLOAT * 1000000.0 (a DECIMAL literal) stays
             |         -- float-precision in DuckDB, drifting vs Spark's double math
             |         CAST(sum(CAST(floor(CAST(x AS DOUBLE) * 1000000.0) AS BIGINT)) AS BIGINT) AS sum_micros,
             |         CAST(count(*) AS BIGINT) AS n
             |  FROM (SELECT label, i AS dim, embedding[i] AS x
             |        FROM embeddings,
             |             unnest(range(1, len(embedding) + 1)) AS r(i))
             |  GROUP BY label, dim
             |)
             |SELECT label, CAST(dim AS BIGINT) AS dim, n, sum_micros,
             |       CAST(floor(CAST(sum_micros AS DOUBLE) / n) AS BIGINT) AS mean_micros
             |FROM cell
             |ORDER BY label, dim""".stripMargin),
      "Grouped embedding mean-pooling (chunk→document / class-centroid " +
        "pooling, the aggregation every embedding pipeline runs after " +
        "chunked encoding): element-wise mean per (label, dim). Each " +
        "element QUANTIZES to integer micros BEFORE aggregation — " +
        "floor of an exactly-representable float×1e6 product — so the " +
        "sum is integer and ORDER-INDEPENDENT: the one aggregation " +
        "whose float form (sum of doubles across partitions) is " +
        "inherently non-reproducible becomes bit-exact in any engine " +
        "at any parallelism, the engine-wide integer-exactness rule " +
        "applied to vector math (q102 PageRank made the same move). " +
        "The ordinal fan-out is pipelined inside the scan; map-side " +
        "partials mean the shuffle carries (label, dim) cells per " +
        "partition — groups×dims rows, never vectors. The mean divides " +
        "AFTER aggregation as floor(double-div) — one deterministic " +
        "IEEE op on identical operands (div truncates toward zero in " +
        "Spark but floors in DuckDB, so integer division is the one " +
        "operator NOT shared cross-engine on negatives — floor(a/b) " +
        "is)."
    ) { (s, dir) =>
      Tables.embeddings(s, dir)
        .select(col("label"), posexplode(col("embedding")).as(Seq("dim0", "x")))
        .groupBy(col("label"), (col("dim0") + 1).cast("long").as("dim"))
        .agg(sum(floor(col("x") * lit(1000000.0)).cast("long")).as("sum_micros"),
          count(lit(1)).as("n"))
        .select(col("label"), col("dim"), col("n"), col("sum_micros"),
          floor(col("sum_micros").cast("double") / col("n")).cast("long")
            .as("mean_micros"))
        .orderBy("label", "dim")
    },

    GraftQuery(
      "q125_matryoshka",
      Some("""WITH t AS (
             |  SELECT vec_id, embedding[1:16] AS h
             |  FROM embeddings
             |), n AS (
             |  SELECT vec_id, h,
             |         sqrt(list_reduce(list_transform(h, x -> CAST(x AS DOUBLE) * x),
             |                          (a, b) -> a + b)) AS nrm
             |  FROM t
             |)
             |SELECT vec_id,
             |       CAST(floor(nrm * 1000000.0) AS BIGINT) AS norm_micros,
             |       CAST(floor(h[1] / nrm * 1000000.0) AS BIGINT) AS d1_micros,
             |       CAST(floor(h[2] / nrm * 1000000.0) AS BIGINT) AS d2_micros,
             |       CAST(floor(h[3] / nrm * 1000000.0) AS BIGINT) AS d3_micros
             |FROM n
             |ORDER BY vec_id""".stripMargin),
      "Matryoshka truncation (MRL embeddings): keep the first 16 of 64 " +
        "dimensions and re-normalize to unit length — the " +
        "dimensionality/quality dial modern embedding models expose, " +
        "run as a pipeline stage so the 4× cheaper index (q44/q66/q67 " +
        "all scale with dim) builds from the same stored vectors. Pure " +
        "row-local map work: slice, a LEFT-TO-RIGHT fold for the " +
        "squared norm (both engines fold in the same order, and sqrt " +
        "and divide are correctly-rounded IEEE ops — the q113 rule: " +
        "transcendental-free, order-pinned float math is bit-portable), " +
        "floor into integer micros at the boundary. No shuffle but the " +
        "presentation sort; at 100 TB this is a scan-speed rewrite " +
        "whose output co-partitions with its source."
    ) { (s, dir) =>
      val h = slice(col("embedding"), 1, 16)
      val nrm = sqrt(aggregate(h, lit(0.0),
        (a, x) => a + x.cast("double") * x))
      Tables.embeddings(s, dir)
        .select(col("vec_id"), h.as("h"), nrm.as("nrm"))
        .select(col("vec_id"),
          floor(col("nrm") * lit(1000000.0)).cast("long").as("norm_micros"),
          floor(element_at(col("h"), 1) / col("nrm") * lit(1000000.0))
            .cast("long").as("d1_micros"),
          floor(element_at(col("h"), 2) / col("nrm") * lit(1000000.0))
            .cast("long").as("d2_micros"),
          floor(element_at(col("h"), 3) / col("nrm") * lit(1000000.0))
            .cast("long").as("d3_micros"))
        .orderBy("vec_id")
    },

    GraftQuery(
      "q166_class_weights",
      Some("""WITH per AS (
             |  SELECT label, CAST(count(*) AS BIGINT) AS n
             |  FROM embeddings GROUP BY label
             |), tot AS (
             |  SELECT CAST(sum(n) AS BIGINT) AS t,
             |         CAST(count(*) AS BIGINT) AS k
             |  FROM per
             |)
             |SELECT CAST(label AS BIGINT) AS label, n,
             |       CAST(n * 1000000 // t AS BIGINT) AS share_ppm,
             |       CAST(t * 1000000 // (k * n) AS BIGINT) AS weight_ppm,
             |       CAST(least(t * 1000000 // (k * n), 5000000) AS BIGINT)
             |         AS capped_weight_ppm
             |FROM per, tot
             |ORDER BY label""".stripMargin),
      "Inverse-frequency class weights — the loss-balancing table every " +
        "classifier fine-tune starts from: per-label counts, share of " +
        "corpus, and weight = total/(k·n) normalized so a uniform " +
        "distribution weighs 1.0 (1e6 ppm), capped at 5× so one " +
        "vanishing class can't dominate the gradient. One map-side-" +
        "combined agg to |labels| rows, a 1-row totals broadcast, all " +
        "cross-multiplied BIGINT — the output is exactly the broadcast " +
        "side a weighted sampler (q136) or a loss function consumes. " +
        "At 100 TB: unchanged, this is the cheapest query in the " +
        "catalog at any scale."
    ) { (s, dir) =>
      val per = Tables.embeddings(s, dir)
        .groupBy("label").agg(count(lit(1)).as("n"))
      val tot = per.agg(sum("n").as("t"), count(lit(1)).as("k"))
      per.crossJoin(broadcast(tot))
        .select(col("label").cast("long").as("label"), col("n"),
          expr("n * 1000000 div t").as("share_ppm"),
          expr("t * 1000000 div (k * n)").as("weight_ppm"),
          least(expr("t * 1000000 div (k * n)"), lit(5000000L))
            .as("capped_weight_ppm"))
        .orderBy("label")
    },

    GraftQuery(
      "q167_embedding_norm_qa",
      Some("""WITH e AS (
             |  SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings
             |), n2 AS (
             |  -- exact integer squared norm in milli-units: floor each
             |  -- coordinate to thousandths, square-sum as BIGINT (identical
             |  -- IEEE double->floor on both engines; q84's idiom)
             |  SELECT vec_id, label,
             |         CAST(list_sum(list_transform(v, x ->
             |                CAST(floor(x * 1000) AS BIGINT)
             |                  * CAST(floor(x * 1000) AS BIGINT)))
             |              AS BIGINT) AS nn
             |  FROM e
             |), agg AS (
             |  SELECT label, CAST(sum(nn) AS BIGINT) AS s,
             |         CAST(count(*) AS BIGINT) AS n
             |  FROM n2 GROUP BY label
             |)
             |SELECT CAST(n2.label AS BIGINT) AS label,
             |       a.n AS n_vecs,
             |       CAST(a.s * 1000 // a.n AS BIGINT) AS mean_norm2_milli,
             |       CAST(sum(CASE WHEN n2.nn * a.n * 2 < a.s
             |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_low,
             |       CAST(sum(CASE WHEN n2.nn * a.n > a.s * 2
             |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_high
             |FROM n2 JOIN agg a ON n2.label = a.label
             |GROUP BY n2.label, a.n, a.s
             |ORDER BY label""".stripMargin),
      "Embedding QA gate — catch collapsed (near-zero norm) and exploded " +
        "vectors before they poison retrieval or training: squared norms " +
        "as exact integer milli-units (floor-to-thousandths then square-" +
        "sum — the q84 cross-engine float discipline), per-label mean by " +
        "one agg, and outlier flags (norm < mean/2 or > 2·mean) via " +
        "cross-multiplied integer compares against the broadcast " +
        "|labels|-row stats frame — no ratio, no second-pass percentile " +
        "(q141's exact-median variant slots in when the gate needs " +
        "robustness to the outliers it hunts). Two scans of the " +
        "embeddings; the only exchanges are |labels|-row aggs. At " +
        "100 TB the norm is map work fused into the scan."
    ) { (s, dir) =>
      val n2 = Tables.embeddings(s, dir)
        .select(col("vec_id"), col("label"),
          aggregate(
            transform(col("embedding"),
              x => floor(x.cast("double") * 1000).cast("long")
                * floor(x.cast("double") * 1000).cast("long")),
            lit(0L), (a, b) => a + b).as("nn"))
      val agg = n2.groupBy("label")
        .agg(sum("nn").as("s"), count(lit(1)).as("n"))
      n2.join(broadcast(agg), "label")
        .groupBy(col("label").cast("long").as("label"), col("n"), col("s"))
        .agg(
          sum(when(col("nn") * col("n") * 2 < col("s"), 1L).otherwise(0L))
            .as("n_low"),
          sum(when(col("nn") * col("n") > col("s") * 2, 1L).otherwise(0L))
            .as("n_high"))
        .select(col("label"), col("n").as("n_vecs"),
          expr("s * 1000 div n").as("mean_norm2_milli"),
          col("n_low"), col("n_high"))
        .orderBy("label")
    },

    GraftQuery(
      "q173_contrastive_pairs",
      Some("""WITH e AS (
             |  SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings
             |), n AS (
             |  SELECT vec_id, label, v,
             |         sqrt(list_reduce(list_transform(v, x -> x*x),
             |                          (a,b) -> a+b)) AS nrm
             |  FROM e
             |), q AS (
             |  SELECT * FROM n WHERE vec_id % 50 = 0
             |), scored AS (
             |  SELECT q.vec_id AS anchor_id, q.label AS qlabel,
             |         a.vec_id AS cand_id, a.label AS clabel,
             |         list_reduce(list_transform(range(1, len(q.v) + 1),
             |                                    i -> q.v[i] * a.v[i]),
             |                     (x,y) -> x+y) / (q.nrm * a.nrm) AS c
             |  FROM q JOIN n a ON a.vec_id <> q.vec_id
             |), ranked AS (
             |  SELECT *, row_number() OVER (
             |           PARTITION BY anchor_id, (qlabel = clabel)
             |           ORDER BY c DESC, cand_id) AS rk
             |  FROM scored
             |)
             |SELECT anchor_id,
             |       CAST(max(CASE WHEN qlabel = clabel THEN cand_id END)
             |            AS BIGINT) AS pos_id,
             |       round(max(CASE WHEN qlabel = clabel THEN c END), 4)
             |         AS pos_cos,
             |       CAST(max(CASE WHEN qlabel <> clabel THEN cand_id END)
             |            AS BIGINT) AS neg_id,
             |       round(max(CASE WHEN qlabel <> clabel THEN c END), 4)
             |         AS neg_cos
             |FROM ranked WHERE rk = 1
             |GROUP BY anchor_id
             |ORDER BY anchor_id""".stripMargin),
      "Contrastive pair mining — build (anchor, positive, negative) " +
        "triplets for embedding fine-tuning: per anchor, the most-" +
        "similar SAME-label vector (hardest positive to beat) and the " +
        "most-similar OTHER-label vector (the hard negative, q146's " +
        "rule) from one scored pass, split by a label-match window " +
        "partition. The anchor set broadcasts against the corpus scan " +
        "(q43's shape — corpus never shuffles) and the per-anchor-per-" +
        "branch top-1 is a bounded window, not a global sort. Cosines " +
        "ride the shared native dot-product kernel and surface rounded " +
        "to 4dp exactly like q43, so both engines agree bit-for-bit. " +
        "At 1e9 vectors, swap the scored pass for q44's LSH or q130's " +
        "quantized candidate generator — the triplet assembly is " +
        "unchanged."
    ) { (s, dir) =>
      val n = Tables.embeddings(s, dir)
        .select(col("vec_id"), col("label"),
          transform(col("embedding"), _.cast("double")).as("v"))
        .withColumn("nrm", sqrt(dotd(col("v"), col("v"))))
      val q = n.filter(col("vec_id") % 50 === 0)
        .select(col("vec_id").as("anchor_id"), col("label").as("qlabel"),
          col("v").as("qv"), col("nrm").as("qn"))
      val scored = n.join(broadcast(q), col("vec_id") =!= col("anchor_id"))
        .select(col("anchor_id"), col("qlabel"),
          col("vec_id").as("cand_id"), col("label").as("clabel"),
          cosine(col("qv"), col("v"), col("qn"), col("nrm")).as("c"))
      val w = Window
        .partitionBy(col("anchor_id"), col("qlabel") === col("clabel"))
        .orderBy(col("c").desc, col("cand_id"))
      scored.withColumn("rk", row_number().over(w)).filter(col("rk") === 1)
        .groupBy("anchor_id")
        .agg(
          max(when(col("qlabel") === col("clabel"), col("cand_id")))
            .as("pos_id"),
          round(max(when(col("qlabel") === col("clabel"), col("c"))), 4)
            .as("pos_cos"),
          max(when(col("qlabel") =!= col("clabel"), col("cand_id")))
            .as("neg_id"),
          round(max(when(col("qlabel") =!= col("clabel"), col("c"))), 4)
            .as("neg_cos"))
        .orderBy("anchor_id")
    },

    GraftQuery(
      "q175_dead_dimensions",
      Some("""WITH e AS (
             |  SELECT embedding::DOUBLE[] AS v FROM embeddings
             |), d AS (
             |  SELECT generate_subscripts(v, 1) AS dim,
             |         CAST(floor(unnest(v) * 1000) AS BIGINT) AS x
             |  FROM e
             |)
             |SELECT CAST(dim AS BIGINT) AS dim,
             |       CAST(count(*) AS BIGINT) AS n,
             |       CAST(sum(x) AS BIGINT) AS sum_milli,
             |       -- n·Σx² − (Σx)²  =  n² · variance, exact in integers
             |       CAST(count(*) * sum(x * x) - sum(x) * sum(x) AS BIGINT)
             |         AS var_num,
             |       CAST(CASE WHEN count(*) * sum(x * x) - sum(x) * sum(x)
             |                      < 1000 * count(*) * count(*)
             |                 THEN 1 ELSE 0 END AS BIGINT) AS dead
             |FROM d GROUP BY dim
             |ORDER BY dim""".stripMargin),
      "Dead-dimension detection — the embedding-health counterpart of " +
        "q167: per-dimension variance as the exact integer numerator " +
        "n·Σx²−(Σx)² over milli-unit coordinates (one pass, no mean " +
        "subtraction, no float cancellation — the numerically-stablest " +
        "form AND the cross-engine-exact one), flagging dimensions " +
        "whose variance collapses below 1e-3 (var_num < 1000·n², " +
        "cross-multiplied — a dimension carrying no signal wastes " +
        "index bytes and ANN distance budget; it's what you prune " +
        "before q84 quantization or q125 matryoshka truncation). The " +
        "posexplode fans out ×64 but combines map-side to 64 rows per " +
        "partition before the exchange — at 100 TB the shuffle carries " +
        "64 × parallelism tiny rows. Overflow headroom: |x|≤2¹⁰ ⇒ " +
        "Σx² ≤ n·2²⁰, so n·Σx² needs n²·2²⁰ < 2⁶³ — safe past 2e9 " +
        "vectors; beyond that, per-partition partials re-center first."
    ) { (s, dir) =>
      Tables.embeddings(s, dir)
        .select(posexplode(col("embedding")).as(Seq("dim0", "xf")))
        .select((col("dim0") + 1).cast("long").as("dim"),
          floor(col("xf").cast("double") * 1000).cast("long").as("x"))
        .groupBy("dim")
        .agg(count(lit(1)).as("n"), sum("x").as("sum_milli"),
          sum(col("x") * col("x")).as("sxx"))
        .select(col("dim"), col("n"), col("sum_milli"),
          (col("n") * col("sxx") - col("sum_milli") * col("sum_milli"))
            .as("var_num"),
          when(col("n") * col("sxx") - col("sum_milli") * col("sum_milli")
            < lit(1000L) * col("n") * col("n"), 1L).otherwise(0L)
            .cast("long").as("dead"))
        .orderBy("dim")
    },

    GraftQuery(
      "q209_hybrid_rrf",
      Some("""WITH e AS (
             |  SELECT vec_id, embedding::DOUBLE[] v FROM embeddings
             |), nn AS (
             |  SELECT vec_id, v,
             |         sqrt(list_reduce(list_transform(v, x -> x*x), (a,b) -> a+b)) nrm
             |  FROM e
             |), q AS (
             |  SELECT * FROM nn WHERE vec_id = 0
             |), sc AS (
             |  SELECT a.vec_id doc_id,
             |         list_reduce(list_transform(range(1, len(q.v)+1),
             |                                    i -> q.v[i] * a.v[i]),
             |                     (x,y) -> x+y) / (q.nrm * a.nrm) c
             |  FROM nn a, q WHERE a.vec_id <> 0
             |), cr AS (
             |  SELECT doc_id,
             |         CAST(row_number() OVER (ORDER BY c DESC, doc_id) AS BIGINT) cos_rank
             |  FROM sc QUALIFY cos_rank <= 30
             |), docs AS (
             |  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS dl,
             |         string_split(text, ' ') AS w
             |  FROM documents
             |), stats AS (
             |  SELECT CAST(count(*) AS BIGINT) AS n_docs,
             |         CAST(sum(dl) AS BIGINT) AS tot
             |  FROM docs
             |), tf AS (
             |  SELECT doc_id, dl, term, CAST(count(*) AS BIGINT) AS tf
             |  FROM docs, unnest(w) AS t(term)
             |  WHERE term IN ('spark', 'vector', 'stream')
             |  GROUP BY doc_id, dl, term
             |), dfreq AS (
             |  SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
             |  FROM tf GROUP BY term
             |), scored AS (
             |  SELECT doc_id,
             |         CAST(floor((CAST(n_docs - df AS DOUBLE) + 0.5) / (CAST(df AS DOUBLE) + 0.5)
             |              * (CAST(tf AS DOUBLE) * 2.2)
             |              / (CAST(tf AS DOUBLE) + 1.2 * (0.25 + 0.75 * dl / (CAST(tot AS DOUBLE) / n_docs)))
             |              * 1000000.0) AS BIGINT) AS sc
             |  FROM tf JOIN dfreq USING (term) CROSS JOIN stats
             |), bm AS (
             |  SELECT doc_id, CAST(sum(sc) AS BIGINT) AS score_micros
             |  FROM scored GROUP BY doc_id
             |), br AS (
             |  SELECT doc_id,
             |         CAST(row_number() OVER (ORDER BY score_micros DESC, doc_id)
             |              AS BIGINT) bm25_rank
             |  FROM bm QUALIFY bm25_rank <= 30
             |)
             |SELECT coalesce(cr.doc_id, br.doc_id) AS doc_id,
             |       CAST(coalesce(br.bm25_rank, 0) AS BIGINT) AS bm25_rank,
             |       CAST(coalesce(cr.cos_rank, 0) AS BIGINT) AS cos_rank,
             |       CAST(coalesce(1000000 // (60 + br.bm25_rank), 0)
             |            + coalesce(1000000 // (60 + cr.cos_rank), 0) AS BIGINT)
             |         AS rrf_ppm
             |FROM cr FULL OUTER JOIN br ON cr.doc_id = br.doc_id
             |ORDER BY rrf_ppm DESC, doc_id LIMIT 15""".stripMargin),
      "Hybrid retrieval via reciprocal-rank fusion — the RAG-stack " +
        "staple: q113's lexical BM25 ranking and q43's dense cosine " +
        "ranking (query = doc 0's embedding, aligned vec_id↔doc_id) " +
        "fused by RRF(60) entirely in integers — 1e6//(60+rank) needs " +
        "no score normalization across incomparable scales, which is " +
        "the whole reason RRF won in production. Each arm keeps its " +
        "own scale shape: the BM25 arm moves only the 3 query terms' " +
        "postings, the dense arm broadcasts the 1-row query vector " +
        "and takes top-30 via the q43 k-bounded heap aggregate (never a " +
        "global per-query sort of the corpus); the fusion is a " +
        "FULL OUTER join of two ≤30-row frames — absence in one arm " +
        "is rank 0, contributing nothing. Both arms' rank orders are " +
        "already oracle-proven deterministic (q113 integer micros, " +
        "q43 IEEE-identical cosine), so the fused list replays " +
        "exactly in SQL."
    ) { (s, dir) =>
      val nf = normed(s, dir)
      // limit(1) is a no-op on the unique-key filter, but it makes the
      // 1-row bound STRUCTURAL — the plan sweep's nested-loop check reads
      // the bound off the plan instead of trusting the key's uniqueness
      val q0 = nf.filter(col("vec_id") === 0).limit(1)
        .select(col("v").as("qv"), col("nrm").as("qn"))
      val sc = nf.filter(col("vec_id") =!= 0)
        .crossJoin(broadcast(q0))
        .select(col("vec_id").as("doc_id"),
          cosine(col("qv"), col("v"), col("qn"), col("nrm")).as("c"))
      // global top-30 via the k-bounded heap aggregate (single group,
      // map-side partials) — never a global sort of the scored corpus
      val cr = sc
        .agg(graft.functions.Sketches.topPairs(col("c"), col("doc_id"), 30)
          .as("top"))
        .select(posexplode(col("top")))
        .select(col("col.id").as("doc_id"),
          (col("pos") + 1).cast("long").as("cos_rank"))
      val docs = Tables.documents(s, dir)
        .select(col("doc_id"),
          size(split(col("text"), " ")).cast("long").as("dl"),
          split(col("text"), " ").as("w"))
      val stats = docs.agg(count(lit(1)).as("n_docs"), sum("dl").as("tot"))
      val tf = docs
        .select(col("doc_id"), col("dl"), explode(col("w")).as("term"))
        .filter(col("term").isin("spark", "vector", "stream"))
        .groupBy("doc_id", "dl", "term").agg(count(lit(1)).as("tf"))
      val dfreq = tf.groupBy("term").agg(countDistinct(col("doc_id")).as("df"))
      val bm = tf.join(broadcast(dfreq), "term")
        .crossJoin(broadcast(stats))
        .select(col("doc_id"),
          floor((col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))
            * (col("tf") * lit(2.2))
            / (col("tf") + lit(1.2) * (lit(0.25) + lit(0.75) * col("dl")
                / (col("tot").cast("double") / col("n_docs"))))
            * lit(1000000.0)).as("sc"))
        .groupBy("doc_id")
        .agg(sum("sc").as("score_micros"))
      val br = bm.withColumn("bm25_rank",
          row_number().over(Window.orderBy(col("score_micros").desc,
            col("doc_id"))).cast("long"))
        .filter(col("bm25_rank") <= 30)
        .select(col("doc_id").as("b_doc_id"), col("bm25_rank"))
      cr.join(br, col("doc_id") === col("b_doc_id"), "full_outer")
        .select(coalesce(col("doc_id"), col("b_doc_id")).as("doc_id"),
          coalesce(col("bm25_rank"), lit(0L)).as("bm25_rank"),
          coalesce(col("cos_rank"), lit(0L)).as("cos_rank"),
          (coalesce(expr("1000000 div (60 + bm25_rank)"), lit(0L)) +
            coalesce(expr("1000000 div (60 + cos_rank)"), lit(0L))).as("rrf_ppm"))
        .orderBy(col("rrf_ppm").desc, col("doc_id"))
        .limit(15)
    },

    GraftQuery(
      "q216_correlated_dims",
      Some("""WITH m AS (
             |  SELECT vec_id, list_transform(embedding::DOUBLE[],
             |                                x -> CAST(floor(x * 1000) AS BIGINT)) v
             |  FROM embeddings
             |), pairs AS (
             |  SELECT CAST(i - 1 AS BIGINT) AS di, CAST(j - 1 AS BIGINT) AS dj,
             |         CAST(count(*) AS BIGINT) AS n,
             |         CAST(sum(v[i] * v[j]) AS BIGINT) AS sxy
             |  FROM m, unnest(range(1, len(v) + 1)) r(i),
             |          unnest(range(1, len(v) + 1)) r2(j)
             |  WHERE i < j
             |  GROUP BY 1, 2
             |), dims AS (
             |  SELECT CAST(i - 1 AS BIGINT) AS d,
             |         CAST(sum(v[i]) AS BIGINT) AS sx,
             |         CAST(sum(v[i] * v[i]) AS BIGINT) AS sxx
             |  FROM m, unnest(range(1, len(v) + 1)) r(i)
             |  GROUP BY 1
             |)
             |SELECT p.di, p.dj,
             |       CAST(p.n * p.sxy - a.sx * b.sx AS BIGINT) AS cov_num,
             |       CAST(((p.n * p.sxy - a.sx * b.sx) // 10000)
             |            * ((p.n * p.sxy - a.sx * b.sx) // 10000)
             |            // greatest((p.n * a.sxx - a.sx * a.sx) // 10000, 1)
             |            * 1000000
             |            // greatest((p.n * b.sxx - b.sx * b.sx) // 10000, 1)
             |            AS BIGINT) AS r2_ppm
             |FROM pairs p
             |JOIN dims a ON p.di = a.d
             |JOIN dims b ON p.dj = b.d
             |ORDER BY r2_ppm DESC, p.di, p.dj
             |LIMIT 10""".stripMargin),
      "Most-correlated embedding dimension pairs — the redundancy scan " +
        "that motivates q149's projection and q175's dead-dim pruning: " +
        "the Gram matrix is computed as ROW-LOCAL outer products (each " +
        "vector fans out its d(d−1)/2 upper-triangle pairs — the q184 " +
        "token discipline applied to matrix algebra), so one map-side-" +
        "combined aggregate yields all pairwise Σxy and the shuffle " +
        "carries d²/2 cells, never the corpus. r² is exact integer " +
        "algebra on milli-scaled values: numerator and both variance " +
        "terms pre-scaled by the SAME //10000 before the two-step " +
        "division (q157's trick, documented truncation) so every " +
        "product stays under 2^63 and both engines agree to the last " +
        "ppm. At 4096 dims the per-row fan-out is ~8M — there you " +
        "block the Gram into tiles or sample rows; the aggregation " +
        "shape is unchanged."
    ) { (s, dir) =>
      val m = Tables.embeddings(s, dir)
        .select(col("vec_id"),
          transform(col("embedding"),
            x => floor(x.cast("double") * 1000).cast("long")).as("v"))
      val pairs = m
        .select(col("v"), posexplode(col("v")))
        .select(col("pos").as("i0"), col("col").as("xi"),
          posexplode(expr("slice(v, pos + 2, size(v))")).as(Seq("p2", "xj")))
        .groupBy(col("i0").cast("long").as("di"),
          (col("i0") + 1 + col("p2")).cast("long").as("dj"))
        .agg(count(lit(1)).as("n"), sum(col("xi") * col("xj")).as("sxy"))
      val dims = m
        .select(posexplode(col("v")).as(Seq("d0", "x")))
        .groupBy(col("d0").cast("long").as("d"))
        .agg(sum("x").as("sx"), sum(col("x") * col("x")).as("sxx"))
      pairs
        .join(broadcast(dims.select(col("d").as("di"), col("sx").as("sx_a"),
          col("sxx").as("sxx_a"))), "di")
        .join(broadcast(dims.select(col("d").as("dj"), col("sx").as("sx_b"),
          col("sxx").as("sxx_b"))), "dj")
        .select(col("di"), col("dj"),
          (col("n") * col("sxy") - col("sx_a") * col("sx_b")).as("cov_num"),
          expr("((n * sxy - sx_a * sx_b) div 10000)" +
            " * ((n * sxy - sx_a * sx_b) div 10000)" +
            " div greatest((n * sxx_a - sx_a * sx_a) div 10000, 1)" +
            " * 1000000" +
            " div greatest((n * sxx_b - sx_b * sx_b) div 10000, 1)").as("r2_ppm"))
        .orderBy(col("r2_ppm").desc, col("di"), col("dj"))
        .limit(10)
    },

    GraftQuery(
      "q246_ann_recall_eval",
      Some(s"""WITH e AS (
              |  SELECT vec_id, embedding::DOUBLE[] v FROM embeddings
              |), $exactTopKTailSqlCtes, cents AS (
              |  SELECT vec_id AS cent_id, v AS cv, nrm AS cn FROM n
              |  WHERE ((vec_id % 2147483647) * 1103515245 + 12345)
              |          % 2147483647 % 50 = 0
              |), ac AS (
              |  SELECT n.vec_id, n.v, n.nrm, c.cent_id,
              |         list_reduce(list_transform(range(1, len(n.v) + 1),
              |                                    i -> n.v[i] * c.cv[i]),
              |                     (x,y) -> x+y) / (n.nrm * c.cn) AS cc
              |  FROM n, cents c
              |), assigned AS (
              |  SELECT vec_id, v, nrm, cent_id FROM (
              |    SELECT *, row_number() OVER (PARTITION BY vec_id
              |                ORDER BY cc DESC, cent_id DESC) rn
              |    FROM ac
              |  ) WHERE rn = 1
              |), qpr AS (
              |  SELECT vec_id AS query_id, v AS qv, nrm AS qn, cent_id FROM (
              |    SELECT *, row_number() OVER (PARTITION BY vec_id
              |                ORDER BY cc DESC, cent_id) crk
              |    FROM ac WHERE vec_id % 50 = 0
              |  ) WHERE crk <= 5
              |), iscored AS (
              |  SELECT q.query_id, a.vec_id AS neighbor_id,
              |         list_reduce(list_transform(range(1, len(q.qv) + 1),
              |                                    i -> q.qv[i] * a.v[i]),
              |                     (x,y) -> x+y) / (q.qn * a.nrm) AS c
              |  FROM assigned a JOIN qpr q USING (cent_id)
              |  WHERE a.vec_id <> q.query_id
              |), approx AS (
              |  SELECT query_id, neighbor_id FROM (
              |    SELECT query_id, neighbor_id,
              |           row_number() OVER (PARTITION BY query_id
              |                              ORDER BY c DESC, neighbor_id) rk
              |    FROM iscored
              |  ) WHERE rk <= $K
              |)
              |$recallSqlTail""".stripMargin),
      "Recall@k of the IVF index (q66) against the exact baseline (q43) — " +
        "the quality metric a deployed ANN index is actually operated by, " +
        "closing the index lifecycle next to q241's assignment-drift " +
        "audit: drift says the INDEX moved, recall says the ANSWERS " +
        "degraded, and the retrain decision wants both. Both sides are " +
        "the very pipelines the engine ships (one shared Scala method " +
        "each — the eval cannot silently grade a lookalike), and the " +
        "scoreboard join carries only (query, neighbor) id pairs — Q·k " +
        "rows per side, never a vector, so its cost is noise next to the " +
        "searches themselves. recall_ppm is exact integer division and " +
        "first_miss_rk localizes WHERE the index loses neighbors (rank 1 " +
        "means the top answer is wrong — probe deeper; rank 9 means only " +
        "the tail frays). At 100 TB the exact side is priced by running " +
        "the panel as a FIXED deterministic query sample (here vec_id ≡ 0 " +
        "mod 50): brute force over a thousand panel queries is Q " +
        "broadcast rows against one corpus scan — routine — and the " +
        "panel's recall time series is the index's health dashboard."
    ) { (s, dir) =>
      recallAgg(bruteTopK(s, dir), ivfTopK(s, dir))
    },

    GraftQuery(
      "q247_pq_recall_eval",
      Some(s"""$pqAsgSqlCtes, $exactTopKTailSqlCtes, best AS (
              |  SELECT vec_id, m, crk FROM (
              |    SELECT *, row_number() OVER (PARTITION BY vec_id, m
              |                                 ORDER BY l2, cent_id DESC) rn
              |    FROM asg
              |  ) WHERE rn = 1
              |), codes AS (
              |  SELECT vec_id, list(crk ORDER BY m) cd FROM best GROUP BY vec_id
              |), qlut AS (
              |  SELECT vec_id AS query_id, list(dot ORDER BY m, crk) lut,
              |         CAST(max(crk) AS BIGINT) nc
              |  FROM (
              |    SELECT s.vec_id, c.m, c.crk,
              |           list_reduce(list_transform(range(1, len(s.sv) + 1),
              |             i -> s.sv[i] * c.csub[i]), (x, y) -> x + y) dot
              |    FROM subs s JOIN centsrk c USING (m)
              |    WHERE s.vec_id % 50 = 0
              |  ) GROUP BY vec_id
              |), cand AS (
              |  SELECT q.query_id, a.vec_id AS neighbor_id,
              |         q.lut[a.cd[1]] + q.lut[q.nc + a.cd[2]]
              |           + q.lut[2 * q.nc + a.cd[3]]
              |           + q.lut[3 * q.nc + a.cd[4]] AS sc
              |  FROM qlut q JOIN codes a ON a.vec_id <> q.query_id
              |), pruned AS (
              |  SELECT query_id, neighbor_id,
              |         row_number() OVER (PARTITION BY query_id
              |                            ORDER BY sc DESC, neighbor_id) prk
              |  FROM cand
              |), rr AS (
              |  SELECT p.query_id, p.neighbor_id,
              |         list_reduce(list_transform(range(1, len(qn.v) + 1),
              |           i -> qn.v[i] * a.v[i]), (x, y) -> x + y)
              |           / (qn.nrm * a.nrm) AS c
              |  FROM pruned p
              |  JOIN n a ON a.vec_id = p.neighbor_id
              |  JOIN n qn ON qn.vec_id = p.query_id
              |  WHERE p.prk <= 32
              |), approx AS (
              |  SELECT query_id, neighbor_id FROM (
              |    SELECT query_id, neighbor_id,
              |           row_number() OVER (PARTITION BY query_id
              |                              ORDER BY c DESC, neighbor_id) rk
              |    FROM rr
              |  ) WHERE rk <= $K
              |)
              |$recallSqlTail""".stripMargin),
      "Recall@k of the PQ/ADC index (q236) against the exact baseline — " +
        "q246's scoreboard pointed at the compressed index, sharing its " +
        "aggregation and the q43 exact side verbatim. PQ loses recall " +
        "for a DIFFERENT reason than IVF (quantization error in the ADC " +
        "scores reorders candidates below prune rank 32, vs cell routing " +
        "missing a neighbor's cell entirely), so a fleet runs both " +
        "scoreboards on the same panel: IVF recall dropping flags " +
        "routing (rebuild centroids, q241), PQ recall dropping flags " +
        "codebook staleness (retrain codebooks, q245) or too-shallow " +
        "pruning (raise the 32). Same 100 TB posture as q246: fixed " +
        "deterministic query panel, id-only scoreboard join, the eval's " +
        "own cost is Q·k rows against the indexes it grades."
    ) { (s, dir) =>
      recallAgg(bruteTopK(s, dir), pqTopK(s, dir))
    },

    GraftQuery(
      "q248_lsh_recall_eval",
      Some(s"""$lshReplayPrologue, $exactFromNSqlCtes, idx AS (
              |  SELECT i FROM range(0, 24) t(i), params WHERE i < bits
              |), masks AS (
              |  SELECT 0::BIGINT AS m
              |  UNION ALL SELECT (1::BIGINT << i) FROM idx
              |  UNION ALL SELECT (1::BIGINT << a.i) | (1::BIGINT << b.i)
              |            FROM idx a, idx b WHERE b.i > a.i
              |), qprobes AS (
              |  SELECT vec_id AS query_id, tbl, xor(code, m) AS code
              |  FROM codes, masks WHERE vec_id % 50 = 0
              |), lcand AS (
              |  SELECT DISTINCT qp.query_id, c.vec_id AS neighbor_id
              |  FROM codes c JOIN qprobes qp USING (tbl, code)
              |  WHERE c.vec_id <> qp.query_id
              |), lscored AS (
              |  SELECT lcand.query_id, lcand.neighbor_id,
              |         list_reduce(list_transform(range(1, 65),
              |                                    i -> qn.v[i] * a.v[i]),
              |                     (x,y) -> x+y) / (qn.nrm * a.nrm) AS c
              |  FROM lcand
              |  JOIN n qn ON qn.vec_id = lcand.query_id
              |  JOIN n a ON a.vec_id = lcand.neighbor_id
              |), approx AS (
              |  SELECT query_id, neighbor_id FROM (
              |    SELECT query_id, neighbor_id,
              |           row_number() OVER (PARTITION BY query_id
              |                              ORDER BY c DESC, neighbor_id) rk
              |    FROM lscored
              |  ) WHERE rk <= $K
              |)
              |$recallSqlTail""".stripMargin),
      "Recall@k of the sign-LSH index (q44) against the exact baseline — " +
        "the third scoreboard, completing per-index recall coverage " +
        "(q246 IVF, q247 PQ, q248 LSH) over the shared exact side and " +
        "aggregation. q44's own scale note names probe depth as THE " +
        "recall knob; this is the dial readout that justifies turning " +
        "it: recall sagging with first_miss_rk at 1-2 means whole " +
        "neighbor buckets are being missed (add probes or tables), " +
        "while high recall with misses only at tail ranks means the " +
        "Hamming≤2 ball already covers the neighborhood and probe " +
        "budget can be CUT. Same 100 TB posture as its siblings: fixed " +
        "deterministic query panel, id-only scoreboard join, cost " +
        "dominated by the two searches it grades."
    ) { (s, dir) =>
      recallAgg(bruteTopK(s, dir), lshTopK(s, dir))
    },

    GraftQuery(
      "q249_ivfpq_ann",
      Some(s"""$pqAsgSqlCtes, n AS (
              |  SELECT vec_id, v,
              |         sqrt(list_reduce(list_transform(v, x -> x*x), (a,b) -> a+b)) nrm
              |  FROM e
              |), ${ivfPqSqlCtes(IvfProbes, IvfPqDepth)}, reranked AS (
              |  SELECT query_id, neighbor_id, c,
              |         row_number() OVER (PARTITION BY query_id
              |                            ORDER BY c DESC, neighbor_id) rk
              |  FROM rr
              |)
              |SELECT query_id, neighbor_id, CAST(rk AS BIGINT) rk,
              |       round(c, 4) AS cos
              |FROM reranked WHERE rk <= $K
              |ORDER BY query_id, rk""".stripMargin),
      "IVF-PQ retrieval — the FAISS IVFPQ composition of the engine's two " +
        "index pillars, and the only ANN form whose per-query cost is " +
        "sublinear in corpus size: q66's centroid cells decide WHICH " +
        "vectors are scanned (queries multi-probe their 5 nearest cells " +
        "through the SAME shared routing q66 ships), and q236's product-" +
        "quantization codes decide HOW each survivor is scored (the SAME " +
        "shared code table and per-query ADC lookup tables). The " +
        "candidate scan is an EQUI-join on cent_id between the code table " +
        "(cent_id, vec_id, 4 codes — never a float vector) and a " +
        "broadcast of probes-rows-per-query LUTs, so per-query bandwidth " +
        "is probes × cell_size code rows, vs q236's O(N) flat scan — at " +
        "100 TB with trained centroids and thousands of cells, that is " +
        "the difference between scanning gigabytes and scanning " +
        "megabytes per query. ADC survivors (128 — deeper than q236's 32 " +
        "because the cell gate already cut candidates, so the prune is " +
        "near-lossless inside probed cells and cell ROUTING, not ADC " +
        "ordering, is the recall limiter) re-rank by exact cosine " +
        "through the id-only join discipline. Cell assignment is the one " +
        "shared q66/q230/q232 pipeline; both tie-breaks (assignment to " +
        "larger cent_id, probe order by smaller) replay exactly in the " +
        "oracle, so the check is hash-exact, not recall-tolerant."
    ) { (s, dir) =>
      ivfPqTopK(s, dir)
        .select(col("query_id"), col("neighbor_id"), col("rk"),
          round(col("c"), 4).as("cos"))
        .orderBy("query_id", "rk")
    },

    GraftQuery(
      "q279_pq_ann_fixed",
      Some(s"""$pqAsgFixedSqlCtes, n AS (
              |  SELECT vec_id, v,
              |         sqrt(list_reduce(list_transform(v, x -> x*x), (a,b) -> a+b)) nrm
              |  FROM e
              |), best AS (
              |  SELECT vec_id, m, crk FROM (
              |    SELECT *, row_number() OVER (PARTITION BY vec_id, m
              |                                 ORDER BY l2, cent_id DESC) rn
              |    FROM asg
              |  ) WHERE rn = 1
              |), codes AS (
              |  SELECT vec_id, list(crk ORDER BY m) cd FROM best GROUP BY vec_id
              |), qlut AS (
              |  SELECT vec_id AS query_id, list(dot ORDER BY m, crk) lut,
              |         CAST(max(crk) AS BIGINT) nc
              |  FROM (
              |    SELECT s.vec_id, c.m, c.crk,
              |           list_reduce(list_transform(range(1, len(s.sv) + 1),
              |             i -> s.sv[i] * c.csub[i]), (x, y) -> x + y) dot
              |    FROM subs s JOIN centsrk c USING (m)
              |    WHERE ${fixedPanelSql("s.")}
              |  ) GROUP BY vec_id
              |), cand AS (
              |  SELECT q.query_id, a.vec_id AS neighbor_id,
              |         q.lut[a.cd[1]] + q.lut[q.nc + a.cd[2]]
              |           + q.lut[2 * q.nc + a.cd[3]]
              |           + q.lut[3 * q.nc + a.cd[4]] AS sc
              |  FROM qlut q JOIN codes a ON a.vec_id <> q.query_id
              |), pruned AS (
              |  SELECT query_id, neighbor_id,
              |         row_number() OVER (PARTITION BY query_id
              |                            ORDER BY sc DESC, neighbor_id) prk
              |  FROM cand
              |), rr AS (
              |  SELECT p.query_id, p.neighbor_id,
              |         list_reduce(list_transform(range(1, len(qn.v) + 1),
              |           i -> qn.v[i] * a.v[i]), (x, y) -> x + y)
              |           / (qn.nrm * a.nrm) AS c
              |  FROM pruned p
              |  JOIN n a ON a.vec_id = p.neighbor_id
              |  JOIN n qn ON qn.vec_id = p.query_id
              |  WHERE p.prk <= 32
              |), reranked AS (
              |  SELECT query_id, neighbor_id, c,
              |         row_number() OVER (PARTITION BY query_id
              |                            ORDER BY c DESC, neighbor_id) rk
              |  FROM rr
              |)
              |SELECT query_id, neighbor_id, CAST(rk AS BIGINT) rk,
              |       round(c, 4) AS cos
              |FROM reranked WHERE rk <= $K
              |ORDER BY query_id, rk""".stripMargin),
      "q236's PQ/ADC retrieval under the FIXED production dials: the " +
        "query panel pinned at ≤" + (FixedPanelMaxId / 50) + " absolute " +
        "ids and the codebook at ≤" + FixedCodebookEntries + " entries " +
        "per subspace (the FAISS one-byte-code default) — the flat-scan " +
        "production contract. q236's bench contract deliberately scales " +
        "BOTH with the corpus (panel ~2%, codebook ~n/31) so one " +
        "hash-exact oracle covers every sf, which makes its corpus-level " +
        "cost quadratic by construction; this form is what a serving " +
        "deployment actually runs — constant workload, constant book — " +
        "so its measured growth is linear in corpus size (the code build " +
        "is n × 256 × 4 native sqdist kernels, the ADC scan 64 × n " +
        "lookups) and the SCALE.md decade tables measure that curve " +
        "directly instead of arguing it from the share-form artifact. " +
        "At sf the caps barely bind, so the oracle replay stays " +
        "hash-exact through the identical pipeline."
    ) { (s, dir) =>
      pqTopKFixed(s, dir)
        .select(col("query_id"), col("neighbor_id"), col("rk"),
          round(col("c"), 4).as("cos"))
        .orderBy("query_id", "rk")
    },

    GraftQuery(
      "q280_ivfpq_ann_fixed",
      Some(ivfPqFixedOracleSql),
      "q249's IVF-PQ retrieval under the FIXED production dials — the " +
        "form whose growth curve answers the 100 TB question directly: " +
        "panel pinned at ≤" + (FixedPanelMaxId / 50) + " absolute ids, " +
        "codebook at ≤" + FixedCodebookEntries + " entries/subspace, and " +
        "the cell count scaled as ⌊√n⌋ (FAISS's nlist ≈ √N guidance), so " +
        "the index build (assignment n·√n + codes n·256, both on native " +
        "kernels) amortizes as a build while PER-QUERY scan cost is " +
        "probes·√n code rows — sublinear in corpus size, measured in " +
        "SCALE.md's decade tables rather than argued. The qside frame is " +
        "≤ 64 queries × probes rows carrying 4·256-double LUTs (~2.6 MB) " +
        "— constant at ANY corpus size, so the broadcast hint survives " +
        "the driver-safety budget by construction, where the share form's " +
        "degenerate corpus-share LUTs must demote to a shuffle join. " +
        "Stride and ⌊√n⌋ derive from the parquet footer on the engine " +
        "side and count(*) in the oracle — the same IEEE sqrt, floored " +
        "and integer-divided identically, so the replay is hash-exact."
    ) { (s, dir) =>
      ivfPqTopKFixed(s, dir)
        .select(col("query_id"), col("neighbor_id"), col("rk"),
          round(col("c"), 4).as("cos"))
        .orderBy("query_id", "rk")
    },

    GraftQuery(
      "q281_ivfpq_index_serve",
      Some(ivfPqFixedOracleSql),
      "q280 served FROM the installed PQ-index pillar — the production " +
        "READ path, separated from the index build the way a deployment " +
        "actually runs: `IndexLifecycle.installPqIndex` persists the " +
        "complete serving artifact once (codes (vec_id, 4 PQ codes) " +
        "PARTITIONED BY cent_id, next to copies of the exact centroid " +
        "and codebook frames they were coded with — FAISS's .index " +
        "payload as a versioned ATOMIC_MOVE pillar), and each query " +
        "batch then touches ONLY the stored code rows of its probed " +
        "cells — Catalyst plans DYNAMIC PARTITION PRUNING on the stored " +
        "scan from the broadcast qside join (plan-pinned), so serve-path " +
        "I/O is probes·|cell| per batch, not |index| — plus an " +
        "id-bounded exact re-rank; no per-query re-coding, " +
        "no corpus-side float vectors on the scan. The install is " +
        "memoized per corpus fingerprint (q78's staging discipline), so " +
        "steady-state runs measure the serve path alone — at the 100× " +
        "scale corpus that is the difference between q280's " +
        "build-dominated total and a constant-workload scan of " +
        "probes·√n code rows. Same fixed dials and the SAME oracle text " +
        "as q280: stored codes and derived codes are one contract, " +
        "pinned row-identical by IndexLifecycleSpec."
    ) { (s, dir) =>
      val root = RelationalQueries.staged(s, "pqindex",
        graft.Tables.fingerprint(s, s"$dir/embeddings.parquet")) { out =>
        IndexLifecycle.installPqIndex(s, out, 1L,
          fixedCents(s, dir), pqCodebookFixed(s, dir), dir)
        ()
      }
      val (codes, cents, book) = IndexLifecycle.readPqIndex(s, root)
      ivfPqServe(s, dir, codes, cents, book, IvfProbes,
        estBytes = lutSideBytesFor(64L, IvfProbes, 4L * FixedCodebookEntries),
        panelIdCap = Some(FixedPanelMaxId))
        .select(col("query_id"), col("neighbor_id"), col("rk"),
          round(col("c"), 4).as("cos"))
        .orderBy("query_id", "rk")
    },

    GraftQuery(
      "q295_release_pinned_pq_serve",
      Some(ivfPqFixedOracleSql),
      "q281's stored-index serve resolved through a RELEASE " +
        "(IndexLifecycle.cutRelease / searchPqIndexAtRelease — VERDICT " +
        "r15 item 6): the search pins the pillar version through one " +
        "atomically-cut release manifest instead of reading latest, so " +
        "a concurrent retrain of any pillar can never serve this reader " +
        "a mid-swap mix — installs keep landing underneath; they serve " +
        "only when the next release pins them. Same fixed dials and the " +
        "SAME oracle text as q280/q281: the release adds a coherence " +
        "indirection, never a result change, which is exactly what " +
        "hash-green proves. The release read is driver-side NIO on a KB " +
        "manifest (no Spark job at serve construction); the serve plan " +
        "is q281's own (DPP on the stored codes scan, id-bounded " +
        "re-rank). Install + release cut memoized per corpus " +
        "fingerprint; IndexLifecycleSpec pins the interposed-swap " +
        "coherence this query's plumbing rides on."
    ) { (s, dir) =>
      val root = RelationalQueries.staged(s, "pqrel",
        graft.Tables.fingerprint(s, s"$dir/embeddings.parquet")) { out =>
        IndexLifecycle.installPqIndex(s, s"$out/pq", 1L,
          fixedCents(s, dir), pqCodebookFixed(s, dir), dir)
        IndexLifecycle.cutRelease(s"$out/rel", 1L,
          Map("pq_index" -> s"$out/pq"))
        ()
      }
      IndexLifecycle.searchPqIndexAtRelease(s, s"$root/rel", dir,
        IvfProbes, panelIdCap = Some(FixedPanelMaxId))
        .select(col("query_id"), col("neighbor_id"), col("rk"),
          round(col("c"), 4).as("cos"))
        .orderBy("query_id", "rk")
    },

    GraftQuery(
      "q250_ivfpq_recall_eval",
      Some(s"""$pqAsgSqlCtes, $exactTopKTailSqlCtes,
              |${ivfPqSqlCtes(IvfProbes, IvfPqDepth)}, approx AS (
              |  SELECT query_id, neighbor_id FROM (
              |    SELECT query_id, neighbor_id,
              |           row_number() OVER (PARTITION BY query_id
              |                              ORDER BY c DESC, neighbor_id) rk
              |    FROM rr
              |  ) WHERE rk <= $K
              |)
              |$recallSqlTail""".stripMargin),
      "Recall@k of the composed IVF-PQ index (q249) against the exact " +
        "baseline — the fourth scoreboard, grading the production-shaped " +
        "index next to its pillars (q246 IVF, q247 PQ, q248 LSH) over " +
        "the shared exact side and aggregation. The diagnostic READ is " +
        "the comparison: IVF-PQ recall at-or-near IVF recall means the " +
        "deep ADC prune is near-lossless inside probed cells (expected — " +
        s"the $IvfPqDepth-deep prune is sized for exactly that) and any loss is " +
        "cell routing, fixable by probing deeper (q251's dial); IVF-PQ " +
        "sagging BELOW IVF flags codebook error reordering candidates " +
        "out of the prune — retrain codebooks (q245). Same 100 TB " +
        "posture as its siblings: fixed deterministic query panel, " +
        "id-only scoreboard join, cost dominated by the searches it " +
        "grades."
    ) { (s, dir) =>
      recallAgg(bruteTopK(s, dir), ivfPqTopK(s, dir))
    },

    GraftQuery(
      "q251_probe_depth_calibration",
      Some {
        val depthCtes = ProbeDepths.map { d =>
          s"""ap_$d AS (
             |  SELECT query_id, neighbor_id FROM (
             |    SELECT query_id, neighbor_id,
             |           row_number() OVER (PARTITION BY query_id
             |                              ORDER BY c DESC, neighbor_id) rk
             |    FROM iscored WHERE crk <= $d
             |  ) WHERE rk <= $K
             |), st_$d AS (
             |  SELECT CAST($d AS BIGINT) AS probes,
             |         CAST(count(*) AS BIGINT) AS exact_cnt,
             |         CAST(count(i.neighbor_id) AS BIGINT) AS hits,
             |         CAST(coalesce(count(i.neighbor_id) * 1000000
             |              // nullif(count(*), 0), 0) AS BIGINT) AS recall_ppm
             |  FROM exact x LEFT JOIN ap_$d i
             |    ON i.query_id = x.query_id AND i.neighbor_id = x.neighbor_id
             |)""".stripMargin
        }.mkString(", ")
        val unioned = ProbeDepths
          .map(d => s"SELECT * FROM st_$d").mkString(" UNION ALL ")
        s"""WITH e AS (
           |  SELECT vec_id, embedding::DOUBLE[] v FROM embeddings
           |), $exactTopKTailSqlCtes, cents AS (
           |  SELECT vec_id AS cent_id, v AS cv, nrm AS cn FROM n
           |  WHERE ((vec_id % 2147483647) * 1103515245 + 12345)
           |          % 2147483647 % 50 = 0
           |), ac AS (
           |  SELECT n.vec_id, n.v, n.nrm, c.cent_id,
           |         list_reduce(list_transform(range(1, len(n.v) + 1),
           |                                    i -> n.v[i] * c.cv[i]),
           |                     (x,y) -> x+y) / (n.nrm * c.cn) AS cc
           |  FROM n, cents c
           |), assigned AS (
           |  SELECT vec_id, v, nrm, cent_id FROM (
           |    SELECT *, row_number() OVER (PARTITION BY vec_id
           |                ORDER BY cc DESC, cent_id DESC) rn
           |    FROM ac
           |  ) WHERE rn = 1
           |), qcrk AS (
           |  SELECT vec_id AS query_id, v AS qv, nrm AS qn, cent_id, crk FROM (
           |    SELECT *, row_number() OVER (PARTITION BY vec_id
           |                ORDER BY cc DESC, cent_id) crk
           |    FROM ac WHERE vec_id % 50 = 0
           |  )
           |), iscored AS (
           |  SELECT q.query_id, a.vec_id AS neighbor_id, q.crk,
           |         list_reduce(list_transform(range(1, len(q.qv) + 1),
           |                                    i -> q.qv[i] * a.v[i]),
           |                     (x,y) -> x+y) / (q.qn * a.nrm) AS c
           |  FROM assigned a JOIN qcrk q USING (cent_id)
           |  WHERE a.vec_id <> q.query_id
           |), $depthCtes, u AS (
           |  $unioned
           |)
           |SELECT probes, exact_cnt, hits, recall_ppm,
           |       recall_ppm >= $ProbeRecallFloorPpm AS meets_floor,
           |       probes = coalesce(
           |         min(CASE WHEN recall_ppm >= $ProbeRecallFloorPpm
           |                  THEN probes END) OVER (),
           |         max(probes) OVER ()) AS chosen
           |FROM u ORDER BY probes""".stripMargin
      },
      "Adaptive probe-depth dial — the calibration that turns q246's " +
        "scoreboard reading into an OPERATING PARAMETER: the IVF pipeline " +
        "(the very ivfTopK q66 ships, swept at probe depths 1/3/5) is " +
        "graded against the exact panel at each depth, and `chosen` marks " +
        "the MINIMAL depth whose micro recall meets the 500000 ppm floor " +
        "(falling back to the deepest sweep point if none does) — probing " +
        "deeper than needed linearly wastes scan cost, shallower silently " +
        "loses neighbors, and this emits the knee. One shared candidate " +
        "scoring pass serves all depths (a candidate's rank among cells " +
        "probed at depth d is its crk — deeper sweeps reuse shallower " +
        "work, in SQL as in Spark), the per-depth scoreboards join id " +
        "pairs only, and every division is integer with nullif guards so " +
        "the dial replays hash-exact on the empty corpus too. At 100 TB " +
        "this runs on the fixed deterministic query panel next to the " +
        "nightly recall evals, and the chosen depth feeds ivfTopK/" +
        "ivfPqTopK's `probes` parameter instead of the IvfProbes " +
        "constant (ApproxSpec closes that loop)."
    ) { (s, dir) => probeDepthDial(s, dir) },

    GraftQuery(
      "q255_filtered_knn_ivf",
      Some(s"""WITH $filteredIvfSqlCtes, ranked AS (
              |  SELECT query_id, neighbor_id, c,
              |         row_number() OVER (PARTITION BY query_id
              |                            ORDER BY c DESC, neighbor_id) rk
              |  FROM fscored
              |)
              |SELECT query_id, neighbor_id, CAST(rk AS BIGINT) AS rk,
              |       round(c, 4) AS cos
              |FROM ranked WHERE rk <= $K
              |ORDER BY query_id, rk""".stripMargin),
      "FILTERED vector search — the metadata-predicate + ANN combination " +
        "every production vector store exposes (here: top-k among corpus " +
        "vectors sharing the QUERY's label, ~10% selectivity): q66's IVF " +
        "pipeline with the label predicate applied to candidates between " +
        "the cell scan and the re-rank window — POST-filtering, the " +
        "strategy for broad predicates, where routing stays " +
        "predicate-agnostic (one index serves every filter) and the " +
        "predicate costs one long comparison per candidate instead of a " +
        "per-filter index. The label rides the assignment frame as a " +
        "single column (ivfAssignOf carries it through the map-side " +
        "collapse — no corpus self-join to fetch metadata), the query " +
        "panel's labels broadcast as ~2% of one int column, and the plan " +
        "is otherwise bit-identical to q66's: same LCG centroid sample, " +
        "same multi-probe routing, same tie-breaks, so the oracle replays " +
        "hash-exact. At 100 TB the filtered-ANN decision is " +
        "selectivity-driven: this post-filter form when matches are " +
        "plentiful, q256's exact pre-filter baseline when the predicate " +
        "is sharp enough that the filtered corpus fits a brute scan — " +
        "and q256's scoreboard is the dial that says which regime a " +
        "predicate is in (empty probed cells = post-filter starving)."
    ) { (s, dir) =>
      ivfFilteredTopK(s, dir)
        .select(col("query_id"), col("neighbor_id"), col("rk"),
          round(col("c"), 4).as("cos"))
        .orderBy("query_id", "rk")
    },

    GraftQuery(
      "q256_filtered_recall_eval",
      Some(s"""WITH $filteredIvfSqlCtes, approx AS (
              |  SELECT query_id, neighbor_id FROM (
              |    SELECT query_id, neighbor_id,
              |           row_number() OVER (PARTITION BY query_id
              |                              ORDER BY c DESC, neighbor_id) rk
              |    FROM fscored
              |  ) WHERE rk <= $K
              |), fq AS (
              |  SELECT vec_id AS query_id, v AS qv, nrm AS qn, lbl
              |  FROM n WHERE vec_id % 50 = 0
              |), bscored AS (
              |  SELECT q.query_id, a.vec_id AS neighbor_id,
              |         list_reduce(list_transform(range(1, len(q.qv) + 1),
              |                                    i -> q.qv[i] * a.v[i]),
              |                     (x,y) -> x+y) / (q.qn * a.nrm) AS c
              |  FROM fq q JOIN n a
              |    ON a.vec_id <> q.query_id AND a.lbl = q.lbl
              |), exact AS (
              |  SELECT query_id, neighbor_id, rk FROM (
              |    SELECT query_id, neighbor_id,
              |           row_number() OVER (PARTITION BY query_id
              |                              ORDER BY c DESC, neighbor_id) rk
              |    FROM bscored
              |  ) WHERE rk <= $K
              |)
              |$recallSqlTail""".stripMargin),
      "Recall@k of the filtered IVF search (q255) against the EXACT " +
        "pre-filtered baseline — the fifth scoreboard, and the one that " +
        "grades a different failure mode than q246-q250: a filtered " +
        "post-search loses neighbors not only to cell routing but to " +
        "CANDIDATE STARVATION — probed cells can hold fewer than k " +
        "label-matching vectors even when the corpus holds plenty (the " +
        "classic filtered-ANN pathology; vector stores grow per-filter " +
        "over-fetch or predicate-aware routing for exactly this). The " +
        "exact side pre-filters then brute-scans (the sharp-predicate " +
        "strategy, correct by construction), the approx side is the very " +
        "ivfFilteredTopK q255 ships, and the scoreboard join carries id " +
        "pairs only. Reading the dial: recall at q246's level means the " +
        "label filter is benign at this selectivity; recall sagging " +
        "BELOW q246 with first_miss_rk at 1-2 is starvation — probe " +
        "deeper (q251's dial) or flip that predicate to pre-filtering. " +
        "Same 100 TB posture as its siblings: fixed deterministic panel, " +
        "cost dominated by the searches it grades."
    ) { (s, dir) =>
      recallAgg(bruteFilteredTopK(s, dir), ivfFilteredTopK(s, dir))
    },

    GraftQuery(
      "q258_filter_strategy_router",
      Some(s"""WITH $filteredIvfSqlCtes, sup AS (
              |  SELECT query_id, count(*) AS c FROM fscored GROUP BY query_id
              |), pnl AS (
              |  SELECT vec_id AS query_id, lbl FROM n WHERE vec_id % 50 = 0
              |), lc AS (
              |  SELECT lbl, count(*) AS cnt FROM n GROUP BY lbl
              |), tot AS (
              |  SELECT count(*) AS cnt FROM n
              |)
              |SELECT p.query_id, p.lbl AS label,
              |       CAST(lc.cnt - 1 AS BIGINT) AS matches,
              |       CAST((lc.cnt - 1) * 1000000 // nullif(tot.cnt - 1, 0)
              |         AS BIGINT) AS sel_ppm,
              |       CAST(coalesce(s.c, 0) AS BIGINT) AS cell_supply,
              |       CASE WHEN coalesce(s.c, 0) >= $K THEN 'postfilter'
              |            ELSE 'prefilter' END AS strategy
              |FROM pnl p
              |JOIN lc ON lc.lbl = p.lbl
              |LEFT JOIN sup s ON s.query_id = p.query_id, tot
              |ORDER BY p.query_id""".stripMargin),
      "Filtered-search strategy router — the cardinality-based planning " +
        "read every vector store runs before executing a filtered query " +
        "(pre-filter when the predicate is sharp, post-filter when broad): " +
        "per panel query, the predicate's corpus-wide selectivity (label " +
        "population from a 10-row broadcast count; corpus total from " +
        "parquet FOOTERS, no job) and — the measurement selectivity alone " +
        "cannot give — the ACTUAL candidate supply in the query's probed " +
        "cells, counted over the very candidate scan q255 executes. The " +
        "routing rule is supply-driven: post-filter only where the probed " +
        "cells can fill k label-matching candidates, pre-filter where " +
        "they starve (label mass concentrated outside the probe set — " +
        "skew that selectivity-only routers misroute). q259 executes this " +
        "dial; q256's scoreboard grades what ignoring it costs. Scale " +
        "shape: the supply count is a count-only partial agg over the " +
        "candidate scan (id pairs, never vectors), the label census is " +
        "label-cardinality rows, and the router's own output is one row " +
        "per panel query — planning metadata, not corpus data."
    ) { (s, dir) =>
      val sup = ivfFilteredCandidates(s, dir)
        .groupBy("query_id").agg(count(lit(1)).as("supply"))
      val labcnt = Tables.embeddings(s, dir)
        .groupBy(col("label").cast("long").as("lbl"))
        .agg(count(lit(1)).as("cnt"))
      val tot = Tables.parquetRowCount(s, dir, "embeddings")
      panelLabels(s, dir)
        .join(broadcast(labcnt), col("qlbl") === col("lbl"))
        .join(sup, Seq("query_id"), "left")
        .select(col("query_id"), col("qlbl").as("label"),
          (col("cnt") - 1).as("matches"),
          expr(s"(cnt - 1) * 1000000 div nullif(${tot - 1}, 0)").as("sel_ppm"),
          coalesce(col("supply"), lit(0L)).as("cell_supply"),
          when(coalesce(col("supply"), lit(0L)) >= K, "postfilter")
            .otherwise("prefilter").as("strategy"))
        .orderBy("query_id")
    },

    GraftQuery(
      "q259_adaptive_filtered_knn",
      Some(s"""WITH $filteredIvfSqlCtes, sup AS (
              |  SELECT query_id, count(*) AS c FROM fscored GROUP BY query_id
              |), ok AS (
              |  SELECT query_id FROM sup WHERE c >= $K
              |), post AS (
              |  SELECT query_id, neighbor_id, c, rk FROM (
              |    SELECT query_id, neighbor_id, c,
              |           row_number() OVER (PARTITION BY query_id
              |                              ORDER BY c DESC, neighbor_id) rk
              |    FROM fscored
              |  ) WHERE rk <= $K AND query_id IN (SELECT query_id FROM ok)
              |), pnl AS (
              |  SELECT vec_id AS query_id, v AS qv, nrm AS qn, lbl
              |  FROM n WHERE vec_id % 50 = 0
              |), bsc AS (
              |  SELECT q.query_id, a.vec_id AS neighbor_id,
              |         list_reduce(list_transform(range(1, len(q.qv) + 1),
              |                                    i -> q.qv[i] * a.v[i]),
              |                     (x,y) -> x+y) / (q.qn * a.nrm) AS c
              |  FROM pnl q JOIN n a
              |    ON a.vec_id <> q.query_id AND a.lbl = q.lbl
              |  WHERE q.query_id NOT IN (SELECT query_id FROM ok)
              |), pre AS (
              |  SELECT query_id, neighbor_id, c, rk FROM (
              |    SELECT query_id, neighbor_id, c,
              |           row_number() OVER (PARTITION BY query_id
              |                              ORDER BY c DESC, neighbor_id) rk
              |    FROM bsc
              |  ) WHERE rk <= $K
              |), u AS (
              |  SELECT *, 'postfilter' AS strategy FROM post
              |  UNION ALL
              |  SELECT *, 'prefilter' AS strategy FROM pre
              |)
              |SELECT query_id, neighbor_id, CAST(rk AS BIGINT) AS rk,
              |       round(c, 4) AS cos, strategy
              |FROM u ORDER BY query_id, rk""".stripMargin),
      "Adaptive filtered search — q258's router EXECUTED: panel queries " +
        "whose probed cells supply k label-matching candidates take the " +
        "post-filter IVF path (the very candidate scan + rank q255 " +
        "ships), starved queries fall back to the exact pre-filtered " +
        "brute scan (q256's baseline side) — per query, not per " +
        "workload, which is how production stores actually route (the " +
        "predicate's hardness varies query-to-query with label skew). " +
        "By construction the hybrid's recall dominates q255's: routed " +
        "queries return identical rows, starved queries return the " +
        "exact answer post-filtering couldn't fill (ApproxSpec pins " +
        "both). Everything is deterministic — supply counts, routing " +
        "set, both branches — so the oracle replays the whole hybrid " +
        "hash-exact, strategy column included. Scale: the dominant cost " +
        "stays the shared candidate scan; the fallback brute side scans " +
        "corpus × starved-fraction with the label predicate pushed into " +
        "the broadcast join condition, and the strategy knee (supply ≥ " +
        "k) is the same dial a per-filter over-fetch factor would turn."
    ) { (s, dir) =>
      // ONE evaluation of the candidate scan (assignment + probe join +
      // cosine — the dominant subtree), staged as the ≤ K·|panel|-row
      // top-k frame. The old shape evaluated it twice: once under the
      // supply aggregate, once under the rank window — two full copies of
      // the BroadcastNestedLoopJoin assignment kernel in the plan. The
      // supply audit needs no second scan because row_number emits exactly
      // K rows for a query iff its candidate supply is ≥ K (rk ≤ K keeps
      // min(supply, K) rows), so `count == K` over the staged top-k IS
      // `supply >= K` — same routing set, proven by the same oracle text.
      val ranked = graft.Staging.stage(rankTopK(ivfFilteredCandidates(s, dir)))
      val okQ = ranked.groupBy("query_id").agg(count(lit(1)).as("nk"))
        .filter(col("nk") === K).select("query_id")
      val post = ranked
        .join(broadcast(okQ), Seq("query_id"), "left_semi")
        .withColumn("strategy", lit("postfilter"))
      // The brute fallback scores ONLY the starved queries: the anti-join
      // moves from above the fallback's rank (unpushable) into its panel
      // build, so the corpus×panel cosine stream shrinks by the routed
      // fraction instead of being computed for everyone and discarded.
      val pre = bruteFilteredTopK(s, dir, excludeQ = Some(okQ))
        .withColumn("strategy", lit("prefilter"))
      post.unionAll(pre)
        .select(col("query_id"), col("neighbor_id"), col("rk"),
          round(col("c"), 4).as("cos"), col("strategy"))
        .orderBy("query_id", "rk")
    }
  )

  /** The q251 dial as a parameterized frame: per-depth recall scoreboards
    * over the fixed panel with `chosen` marking the minimal depth meeting
    * `floorPpm` (deepest sweep point if none does). q251 ships the
    * defaults; [[calibratedProbes]] reads any floor. */
  private[graft] def probeDepthDial(s: SparkSession, dir: String,
                                    floorPpm: Long = ProbeRecallFloorPpm,
                                    depths: Seq[Int] = ProbeDepths): DataFrame = {
    // the exact ground truth staged once: the depth sweep graded it once
    // PER SWEPT DEPTH (3 evaluations of the brute panel×corpus scorer in
    // q251's plan — 36 scans); the frame is K·|panel| rows
    val exact = graft.Staging.stage(
      bruteTopK(s, dir).select(col("query_id"), col("neighbor_id")))
    val perDepth = depths.map { d =>
      exact
        .join(ivfTopK(s, dir, d)
            .select(col("query_id"), col("neighbor_id"), lit(1).as("hit")),
          Seq("query_id", "neighbor_id"), "left")
        .agg(count(lit(1)).as("exact_cnt"), count(col("hit")).as("hits"))
        .select(lit(d.toLong).as("probes"), col("exact_cnt"), col("hits"),
          // coalesce(0): the empty-panel degenerate corpus must emit a
          // typed zero, not NULL — a NULL recall is a dtype hazard at
          // the driver boundary and "no recall evidence" correctly
          // fails any floor
          expr("coalesce(hits * 1000000 div nullif(exact_cnt, 0), 0)")
            .as("recall_ppm"))
    }
    val all = Window.partitionBy(lit(1))
    perDepth.reduce(_ unionAll _)
      .withColumn("meets_floor", col("recall_ppm") >= lit(floorPpm))
      .withColumn("chosen", col("probes") === coalesce(
        min(when(col("recall_ppm") >= lit(floorPpm), col("probes")))
          .over(all),
        max(col("probes")).over(all)))
      .select(col("probes"), col("exact_cnt"), col("hits"),
        col("recall_ppm"), col("meets_floor"), col("chosen"))
      .orderBy("probes")
  }

  /** The dial reading as an OPERATING PARAMETER: the minimal swept probe
    * depth whose panel recall meets `floorPpm`. The read is one row of a
    * depths-sized frame (index metadata, like the BPE argmax — never
    * corpus rows), which is the whole point of a dial: its output is a
    * scalar the next index build consumes. */
  def calibratedProbes(s: SparkSession, dir: String,
                       floorPpm: Long = ProbeRecallFloorPpm,
                       depths: Seq[Int] = ProbeDepths): Int =
    probeDepthDial(s, dir, floorPpm, depths)
      .filter(col("chosen")).select(col("probes")).head.getLong(0).toInt

  /** q66's IVF search at the depth the dial chose for `floorPpm` —
    * IvfProbes is now only the DEFAULT these entry points replace. */
  def ivfTopKCalibrated(s: SparkSession, dir: String,
                        floorPpm: Long = ProbeRecallFloorPpm): DataFrame =
    ivfTopK(s, dir, calibratedProbes(s, dir, floorPpm))

  /** q249's IVF-PQ search at the dial-chosen depth: the calibration
    * transfers because IVF-PQ's recall limiter IS the cell routing the
    * dial measures (the ADC prune is near-lossless inside probed cells —
    * q250's scoreboard pins that). */
  def ivfPqTopKCalibrated(s: SparkSession, dir: String,
                          floorPpm: Long = ProbeRecallFloorPpm): DataFrame =
    ivfPqTopK(s, dir, probes = calibratedProbes(s, dir, floorPpm))

  /** q255's filtered search at the dial-chosen depth — and for the
    * filtered pipeline probing deeper does double duty: it lifts routing
    * recall (what the dial measures) AND candidate supply (what q258's
    * router gates on), so a starved filter's first remediation is exactly
    * this knob before flipping strategies. */
  def ivfFilteredTopKCalibrated(s: SparkSession, dir: String,
                                floorPpm: Long = ProbeRecallFloorPpm): DataFrame =
    ivfFilteredTopK(s, dir, probes = calibratedProbes(s, dir, floorPpm))
}
