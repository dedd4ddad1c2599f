package graft.operators

import graft.{GraftQuery, Tables}
import graft.Staging
import graft.Staging.StagingOps
import graft.functions.Sketches
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication family for the LLM-data-pipeline surface (SURVEY.md §2.2):
  * exact hash dedup, MinHash+LSH, SimHash, exact n-gram Jaccard, and
  * embedding-cosine near-dup — all over the `documents` / `embeddings` tables.
  *
  * Scale design shared by the family: nothing here ever materializes the
  * O(n²) document-pair space except through a candidate generator (an
  * inverted-index join on shingles, or an LSH band join), and all sketches are
  * computed by one-pass partial `Aggregator`s so the shuffle carries one
  * fixed-size buffer per document.
  */
object DedupQueries {

  /** (doc_id, h) — xxhash64 of each distinct lowercase word 3-gram. The
    * generator-side prep shared by MinHash / SimHash / exact Jaccard.
    *
    * Tokens are hashed once and 3-gram hashes combine the three token
    * hashes (`xxhash64(h1,h2,h3)`, order-sensitive) — the 3-gram *strings*
    * are never materialized, which halves the cost of the hottest stage of
    * the dedup family. Equality of hash-triples stands in for equality of
    * shingles (64-bit collision odds ~1e-10 at 10^5 distinct shingles;
    * for exact-match guarantees group on the string instead). */
  /** (doc_id, sh: array<bigint>) — each document's distinct shingle hashes
    * as ONE row. Row-local consumers (the array sketches) build signatures
    * with no explode and no shuffle; set-oriented consumers explode it.
    * Docs with <3 tokens are filtered out HERE, on `text` directly: a
    * downstream `size(sh) > 0` filter would be pushed below the staged
    * projections with every alias substituted — re-splitting the text at
    * each element_at site inside the filter condition (observed 3.5× on
    * q39). Predicates must reference scan columns, not staged arrays. */
  private def shingleArrays(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .filter(size(split(lower(col("text")), " ")) >= 3)
      .select(col("doc_id"),
        Sketches.xxhTokenShingles(col("text")).as("sh"))

  /** The declarative HOF form of [[shingleArrays]]'s shingle build — the
    * spec'd reference model the native xxhash kernel is pinned against
    * (SketchSpec), NOT a query path (same poison class as
    * [[replayableShinglesHof]]). */
  private[graft] def xxhShingleArraysHof(docs: DataFrame): DataFrame =
    docs
      .filter(size(split(lower(col("text")), " ")) >= 3)
      .select(col("doc_id"),
        transform(split(lower(col("text")), " "), t => xxhash64(t)).as("hw"))
      .select(col("doc_id"),
        array_distinct(transform(sequence(lit(1), size(col("hw")) - 2),
          i => xxhash64(
            element_at(col("hw"), i),
            element_at(col("hw"), i + 1),
            element_at(col("hw"), i + 2)))).as("sh"))

  private def shingles(s: SparkSession, dir: String): DataFrame =
    shingleArrays(s, dir).select(col("doc_id"), explode(col("sh")).as("h"))

  /** q39/q40's SQL-replayable shingle fingerprints: token fp =
    * [[graft.functions.TextQueries.base31Fold]] (mod 1e9+7 — the family six
    * green oracles already replay), 3-gram fp = bounded base-2^22 fold of
    * the three token fps mod the prime 2^40−87. Every intermediate stays
    * below 2^62, which matters because DuckDB BIGINT overflow is an ERROR,
    * not a wrap — the xxhash64 family this replaces needs wrapping 64-bit
    * multiplies and cannot be replayed there (VERDICT r4 item 1). The 2^40
    * fp space trades xxhash64's ~1e-10 collision odds for ~1e-3 at this
    * corpus scale — immaterial to the *approximate* sketches (a collision
    * perturbs one of 64 minima); q41's EXACT Jaccard keeps the xxhash64
    * prep ([[shingleArrays]]) where set identity is the semantics. */
  private[graft] val ShingleP = 1099511627689L // largest prime < 2^40
  private[graft] val ShingleM = 4194301L       // prime < 2^22: (P−1)·M < 2^62

  /** (doc_id, sh) with replayable fps, from any (doc_id, text) frame —
    * shared by [[minhashSignatures]], q40 and the SketchSpec incremental
    * test so a family tweak moves index build and probe together. */
  private[graft] def replayableShingles(docs: DataFrame): DataFrame =
    docs
      .filter(size(split(lower(col("text")), " ")) >= 3)
      .select(col("doc_id"),
        Sketches.tokenShingles(col("text"), ShingleM, ShingleP).as("sh"))

  /** The declarative HOF form of [[replayableShingles]] — the spec'd
    * reference model the native kernel is pinned against (SketchSpec),
    * NOT a query path: whenever the signature frame feeds a join,
    * InferFiltersFromConstraints copies this pipeline alias-flattened
    * into an isnotnull scan condition, re-inlining the token-hash array
    * at every element_at site — O(tokens²) interpreted work per row (the
    * q262 scoreboard read 58 s at sf0.1 through this form, 1.5 s native). */
  private[graft] def replayableShinglesHof(docs: DataFrame): DataFrame =
    docs
      .filter(size(split(lower(col("text")), " ")) >= 3)
      .select(col("doc_id"),
        transform(split(lower(col("text")), " "),
          t => graft.functions.TextQueries.base31Fold(t)).as("hw"))
      .select(col("doc_id"),
        array_distinct(transform(sequence(lit(1), size(col("hw")) - 2),
          i => pmod(
            pmod(element_at(col("hw"), i) * ShingleM + element_at(col("hw"), i + 1),
              lit(ShingleP)) * ShingleM + element_at(col("hw"), i + 2),
            lit(ShingleP)))).as("sh"))

  /** The engine's affine MinHash/SimHash parameters as SQL VALUES rows —
    * interpolated at oracle-build time so a replay can never drift from
    * the Scala constants. Shared by every sketch-family oracle. */
  private[graft] def affineParamsSql: String =
    Sketches.hashA.indices
      .map(i => s"(${i}, ${Sketches.hashA(i)}, ${Sketches.hashB(i)})")
      .mkString(", ")

  /** The q39 index replay in the oracles' dialect — signatures, band
    * folds, bucket cap, in-bucket pairing, agreement score — appended
    * after [[replayShinglePrologueSql]], ending at `ap(doc_a, doc_b,
    * est_jaccard_ppm)`. ONE copy serves q39 and the q261 recall
    * scoreboard (which grades exactly this pair set). */
  private[graft] def minhashPairSqlCtes: String =
    s"""msig AS (
       |  SELECT doc_id, i,
       |         min((a * (s % 2147483647) + b) % 2147483647) AS v
       |  FROM sh, params GROUP BY doc_id, i
       |), sigs AS (
       |  SELECT doc_id, list(v ORDER BY i) AS sig FROM msig GROUP BY doc_id
       |), bands AS (
       |  SELECT doc_id, t.band,
       |         list_reduce(
       |           list_prepend(CAST(t.band AS BIGINT),
       |                        sig[t.band*4+1 : t.band*4+4]),
       |           (acc, x) -> (acc * 1000003 + x) % 2147483647) AS key
       |  FROM sigs, range(0, 16) t(band)
       |), bounded AS (
       |  SELECT doc_id, band, key FROM (
       |    SELECT *, count(*) OVER (PARTITION BY band, key) AS bsz
       |    FROM bands
       |  ) WHERE bsz BETWEEN 2 AND $MaxBucket
       |), cand AS (
       |  SELECT DISTINCT p1.doc_id AS doc_a, p2.doc_id AS doc_b
       |  FROM bounded p1 JOIN bounded p2 USING (band, key)
       |  WHERE p1.doc_id < p2.doc_id
       |), ap AS (
       |  SELECT c.doc_a, c.doc_b,
       |         CAST(sum(CASE WHEN ma.v = mb.v THEN 1 ELSE 0 END) * 15625
       |              AS BIGINT) AS est_jaccard_ppm
       |  FROM cand c
       |  JOIN msig ma ON ma.doc_id = c.doc_a
       |  JOIN msig mb ON mb.doc_id = c.doc_b AND mb.i = ma.i
       |  GROUP BY c.doc_a, c.doc_b
       |  HAVING sum(CASE WHEN ma.v = mb.v THEN 1 ELSE 0 END) >= 32
       |)""".stripMargin

  /** The same fps in the oracles' DuckDB dialect: CTEs `toks` (per-doc
    * token-fp list) and `sh` (exploded distinct 3-gram fps), plus
    * `params(i, a, b)` carrying the engine's OWN MinHash affine parameters
    * ([[Sketches.hashA]]/[[Sketches.hashB]]) — interpolated at oracle-build
    * time so the replay can never drift from the Scala constants. */
  private[graft] def replayShinglePrologueSql: String = {
    val params = affineParamsSql
    s"""WITH toks AS (
       |  SELECT doc_id, list_transform(string_split(lower(text), ' '),
       |           t -> ${graft.functions.TextQueries.base31FoldSql("t")}) AS hw
       |  FROM documents
       |  WHERE len(string_split(lower(text), ' ')) >= 3
       |), sh AS (
       |  SELECT doc_id, unnest(list_distinct(list_transform(
       |           range(1, len(hw) - 1),
       |           i -> (((hw[i] * $ShingleM + hw[i+1]) % $ShingleP)
       |                   * $ShingleM + hw[i+2]) % $ShingleP))) AS s
       |  FROM toks
       |), params(i, a, b) AS (VALUES $params)""".stripMargin
  }

  /** The SimHash pipeline's banding tail in the oracles' dialect — bits
    * from the affine-threshold family, 7-block pigeonhole keys, bucket
    * cap, in-bucket pairing and exact Hamming re-check — appended after a
    * prologue defining `sh(doc_id, s)` and `params(i, a, b)`. ONE copy
    * serves q40 (token shingles) and q252 (byte shingles): the indexing
    * machinery is shingle-source-agnostic by construction. */
  private[graft] def simhashBandTailSql: String =
    s"""$simhashBandPairCtes
       |SELECT doc_a, doc_b, hamming FROM sp
       |ORDER BY doc_a, doc_b""".stripMargin

  /** [[simhashBandTailSql]] in CTE form, ending at `sp(doc_a, doc_b,
    * hamming)` — composable by the q262/q263 scoreboards, which grade
    * exactly this pair set against exact full-signature Hamming. */
  private[graft] def simhashBandPairCtes: String =
    s"""bits AS (
       |  SELECT doc_id, i,
       |         CASE WHEN sum(CASE WHEN (a * (s % 2147483647) + b)
       |                                   % 2147483647 < 1073741824
       |                             THEN 1 ELSE -1 END) > 0
       |              THEN 1 ELSE 0 END AS bit
       |  FROM sh, params GROUP BY doc_id, i
       |), bdef(band, off, w) AS (
       |  VALUES (0,0,10),(1,10,9),(2,19,9),(3,28,9),(4,37,9),(5,46,9),(6,55,9)
       |), keys AS (
       |  SELECT doc_id, band,
       |         CAST(sum(bit * (1::BIGINT << CAST(i - off AS INT)))
       |              AS BIGINT) AS key
       |  FROM bits JOIN bdef ON i >= off AND i < off + w
       |  GROUP BY doc_id, band
       |), bounded AS (
       |  SELECT doc_id, band, key FROM (
       |    SELECT *, count(*) OVER (PARTITION BY band, key) AS bsz
       |    FROM keys
       |  ) WHERE bsz BETWEEN 2 AND $MaxBucket
       |), cand AS (
       |  SELECT DISTINCT p1.doc_id AS doc_a, p2.doc_id AS doc_b
       |  FROM bounded p1 JOIN bounded p2 USING (band, key)
       |  WHERE p1.doc_id < p2.doc_id
       |), sp AS (
       |  SELECT c.doc_a, c.doc_b,
       |         CAST(sum(CASE WHEN ba.bit <> bb.bit THEN 1 ELSE 0 END)
       |              AS BIGINT) AS hamming
       |  FROM cand c
       |  JOIN bits ba ON ba.doc_id = c.doc_a
       |  JOIN bits bb ON bb.doc_id = c.doc_b AND bb.i = ba.i
       |  GROUP BY c.doc_a, c.doc_b
       |  HAVING sum(CASE WHEN ba.bit <> bb.bit THEN 1 ELSE 0 END) <= 6
       |)""".stripMargin

  /** The scoreboard tail of the q262/q263 oracles — the exact side is
    * every panel-touching pair at FULL-signature Hamming ≤ 6, found
    * through the UNCAPPED band index (`keys`, before the `bounded` cut):
    * pigeonhole makes the 7-block banding exhaustive at ≤ 6 differing
    * bits, so the uncapped equi-join is complete ground truth at
    * inverted-index cost — no panel × corpus product anywhere. The
    * corpus side is still bounded at [[GtBucketCap]] (rank-by-doc_id
    * within each bucket) with explicit per-panel-doc `gt_dropped`
    * accounting, mirroring the Spark twin. Graded against the capped
    * pair set `sp`; `miss_min_hamming` is NULL when nothing is missed;
    * a small value means a STRONG pair was lost to the bucket cap. */
  private[graft] def simhashScoreboardSqlTail: String =
    s"""kr AS (
       |  SELECT doc_id, band, key,
       |         count(*) OVER (PARTITION BY band, key) AS bsz,
       |         row_number() OVER (PARTITION BY band, key ORDER BY doc_id)
       |           AS rk
       |  FROM keys
       |), gtd AS (
       |  SELECT doc_id AS pa,
       |         CAST(sum(CASE WHEN bsz > $GtBucketCap
       |                       THEN bsz - $GtBucketCap ELSE 0 END) AS BIGINT)
       |           AS gt_dropped
       |  FROM kr WHERE doc_id % 5 = 0 GROUP BY 1
       |), pcand AS (
       |  SELECT DISTINCT p.doc_id AS pa, c.doc_id AS pd
       |  FROM kr p JOIN kr c USING (band, key)
       |  WHERE p.doc_id % 5 = 0 AND c.doc_id <> p.doc_id
       |    AND c.rk <= $GtBucketCap
       |), ph AS (
       |  SELECT pc.pa, pc.pd,
       |         sum(CASE WHEN ba.bit <> bb.bit THEN 1 ELSE 0 END) AS hd
       |  FROM pcand pc
       |  JOIN bits ba ON ba.doc_id = pc.pa
       |  JOIN bits bb ON bb.doc_id = pc.pd AND bb.i = ba.i
       |  GROUP BY 1, 2
       |), exact AS (
       |  SELECT pa, pd, CAST(hd AS BIGINT) AS hd FROM ph WHERE hd <= 6
       |), aps AS (
       |  SELECT doc_a AS a, doc_b AS b FROM sp
       |  UNION ALL
       |  SELECT doc_b, doc_a FROM sp
       |), sbd AS (
       |  SELECT pa,
       |         CAST(count(*) AS BIGINT) AS exact_cnt,
       |         CAST(count(h.a) AS BIGINT) AS hits,
       |         CAST(count(h.a) * 1000000 // count(*) AS BIGINT) AS recall_ppm,
       |         CAST(min(CASE WHEN h.a IS NULL THEN hd END) AS BIGINT)
       |           AS miss_min_hamming
       |  FROM exact
       |  LEFT JOIN aps h ON h.a = exact.pa AND h.b = exact.pd
       |  GROUP BY pa
       |)
       |SELECT panel_doc, exact_cnt, hits, recall_ppm, miss_min_hamming,
       |       gt_dropped
       |FROM (SELECT sbd.pa AS panel_doc, sbd.exact_cnt, sbd.hits,
       |             sbd.recall_ppm, sbd.miss_min_hamming, gtd.gt_dropped
       |      FROM sbd JOIN gtd ON gtd.pa = sbd.pa)
       |ORDER BY panel_doc""".stripMargin

  /** SimHash pigeonhole banding + bounded-bucket pairing + exact Hamming
    * re-check over any (doc_id, sim) signature frame — the Spark twin of
    * [[simhashBandTailSql]], shared by q40 and q252. 7 blocks of widths
    * 10,9,9,9,9,9,9: any Hamming-≤6 pair leaves ≥1 block untouched
    * (pigeonhole), so banding misses nothing; hot buckets are bounded at
    * [[MaxBucket]] BEFORE collection (window count on the groupBy key —
    * no extra exchange), exactly as the oracle's `bounded` CTE. */
  /** The SimHash pigeonhole band table — (band, offset, mask), 7 blocks of
    * widths 10,9,9,9,9,9,9 covering all 64 bits: any Hamming-≤6 pair
    * leaves ≥1 block untouched. ONE table serves the batch pipelines
    * ([[simhashNearDupPairs]]), their oracles ([[simhashBandTailSql]]'s
    * `bdef`) and the streaming media admission monitor
    * (`StatefulOps.mediaNearDupTws`) — the recall guarantee is the
    * table, so every consumer reads the same copy. */
  private[graft] val SimhashBands: Seq[(Int, Int, Long)] =
    Seq((0, 0, 1023L), (1, 10, 511L), (2, 19, 511L),
      (3, 28, 511L), (4, 37, 511L), (5, 46, 511L), (6, 55, 511L))

  private[graft] def simhashNearDupPairs(sigs: DataFrame): DataFrame =
    simhashNearDupPairsUnsorted(sigs).orderBy("doc_a", "doc_b")

  /** [[simhashNearDupPairs]] without the presentation sort — the form the
    * q262/q263 scoreboards compose (their grading join is order-blind, and
    * an interior global sort under the scoreboard's union would survive
    * Catalyst's EliminateSorts and shuffle the whole pair set for
    * nothing). */
  /** (doc_id, sim, band, key) — each signature exploded to its 7
    * pigeonhole band keys. The explode is also the projection barrier
    * that pins the `sim` expression to ONE evaluation per row (Catalyst
    * cannot collapse a project through a Generate), which is what keeps
    * the shingle→simhash pipeline out of downstream join conditions. */
  private[graft] def simhashBandKeys(sigs: DataFrame): DataFrame =
    sigs.select(col("doc_id"), col("sim"),
      explode(array(SimhashBands.map { case (b, off, mask) =>
        struct(lit(b).as("band"),
          shiftrightunsigned(col("sim"), off).bitwiseAND(lit(mask)).as("key"))
      }: _*)).as("bk"))
      .select(col("doc_id"), col("sim"), col("bk.band"), col("bk.key"))

  private[graft] def simhashNearDupPairsUnsorted(
      sigs: DataFrame, cap: Int = MaxBucket): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val bands = simhashBandKeys(sigs)
    val bounded = bands
      .withColumn("bsz", count(lit(1)).over(Window.partitionBy("band", "key")))
      .filter(col("bsz").between(2, cap))
    bounded.groupBy("band", "key")
      .agg(sort_array(collect_list(struct(col("doc_id"), col("sim")))).as("docs"))
      .select(explode(flatten(transform(col("docs"), (a, i) =>
        transform(slice(col("docs"), i + 2, size(col("docs"))), b =>
          struct(a("doc_id").as("doc_a"), b("doc_id").as("doc_b"),
            a("sim").as("sim_a"), b("sim").as("sim_b")))))).as("p"))
      .select(col("p.doc_a"), col("p.doc_b"), col("p.sim_a"), col("p.sim_b"))
      .distinct()
      .withColumn("hamming",
        bit_count(col("sim_a").bitwiseXOR(col("sim_b"))).cast("long"))
      .filter(col("hamming") <= 6)
      .select("doc_a", "doc_b", "hamming")
  }

  /** (doc_id, sim) — q40's token-shingle SimHash signatures, shared by
    * q40, the q260 consensus and the q262 scoreboard. */
  private[graft] def textSimhashSigs(s: SparkSession, dir: String): DataFrame =
    textSimhashSigsFor(Tables.documents(s, dir))

  /** Signature build for any (doc_id, text) frame — the index build and
    * a new batch's probe share this path (the MinHash
    * [[minhashSignaturesFor]] twin). */
  private[graft] def textSimhashSigsFor(docs: DataFrame): DataFrame =
    replayableShingles(docs)
      .select(col("doc_id"), Sketches.simhashArray(col("sh")).as("sim"))

  /** Ground-truth bucket cap for the scoreboard/dial family's EXACT side.
    * The exact sides find ground truth through uncapped band buckets
    * (pigeonhole-exhaustive), whose join cost is panel_share × Σ bucket² —
    * quadratic exactly when buckets saturate, the very condition the dials
    * exist to detect. So the corpus side of every ground-truth join is
    * bounded: within each (band, key) bucket only the first [[GtBucketCap]]
    * members by doc_id contribute candidates, and the truncation is
    * EXPLICIT — every scoreboard/dial row carries a `gt_dropped` count of
    * candidate slots the bound left unexamined (0 means the ground truth is
    * complete; the planted-saturation SketchSpec pins both behaviors).
    * 4096 = 64× the shipped index cap: orders of magnitude above any
    * healthy bucket (sf0.1 max band bucket ≈ tens), so real corpora grade
    * against COMPLETE ground truth, while a pathological corpus costs at
    * most panel_share × Σ bucket × 4096 — linear, not quadratic. */
  private[graft] val GtBucketCap = 4096

  /** The SimHash index scoreboard shared by q262 (text) and q263 (media):
    * exact side is every pair touching the deterministic 20% panel at
    * full-signature Hamming ≤ 6 (the index's own contract), found through
    * the UNCAPPED band index — pigeonhole makes 7-block banding
    * exhaustive at ≤ 6 differing bits, so the uncapped (band, key)
    * equi-join is complete ground truth at inverted-index cost, never a
    * panel × corpus product (a nested-loop exact side also re-inlines the
    * whole shingle→simhash pipeline into the pushed join condition — the
    * round-10 q252 poison in join clothing). "Uncapped" means free of the
    * index's own [[MaxBucket]] cut; the join is still BOUNDED at the much
    * looser [[GtBucketCap]] with per-panel-doc `gt_dropped` accounting, so
    * a pathologically saturated corpus can't turn the ground-truth pass
    * quadratic (and can't lie about it either). Graded against the capped
    * pair set the engine ships, so what this measures is exactly the
    * BUCKET CAP's cost: every miss is a pair dropped in a saturated
    * bucket — `miss_min_hamming` (NULL when none) says how strong the
    * strongest dropped pair was. */
  private[graft] def simhashScoreboard(sigs: DataFrame, pairs: DataFrame,
                                       gtCap: Int = GtBucketCap): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val bkt = Window.partitionBy("band", "key")
    // staged: the panel slice and the gtCap slice both consume the sized
    // band frame (bucketCapDial's discipline; batch-only callers)
    val keyed = graft.Staging.stage(simhashBandKeys(sigs)
      .withColumn("bsz", count(lit(1)).over(bkt))
      .withColumn("rk", row_number().over(bkt.orderBy("doc_id"))))
    val panelKeys = keyed.filter(col("doc_id") % 5 === 0)
      .select(col("band"), col("key"), col("doc_id").as("pa"),
        col("sim").as("sim_a"), col("bsz"))
    // candidate slots the bound left unexamined, per panel doc: each of its
    // buckets past the cap hides (bsz − cap) corpus members from it
    val dropped = panelKeys.groupBy("pa")
      .agg(sum(greatest(col("bsz") - lit(gtCap.toLong), lit(0L))).as("gt_dropped"))
    val exact = keyed.filter(col("rk") <= gtCap)
      .select(col("band"), col("key"), col("doc_id").as("pd"), col("sim").as("sim_b"))
      .join(panelKeys.select("band", "key", "pa", "sim_a"), Seq("band", "key"))
      .filter(col("pa") =!= col("pd"))
      .select("pa", "pd", "sim_a", "sim_b")
      .distinct()
      .withColumn("hd", bit_count(col("sim_a").bitwiseXOR(col("sim_b"))).cast("long"))
      .filter(col("hd") <= 6)
    // symmetrize by exploding both orientations from ONE pass — a unionAll
    // of two selects rebuilds the whole pair pipeline (and its signature
    // scan) per branch
    val aps = pairs
      .select(explode(array(
        struct(col("doc_a").as("pa"), col("doc_b").as("pd")),
        struct(col("doc_b").as("pa"), col("doc_a").as("pd")))).as("s"))
      .select(col("s.pa"), col("s.pd"))
      .withColumn("hit", lit(1))
    exact.join(aps, Seq("pa", "pd"), "left")
      .groupBy("pa")
      .agg(count(lit(1)).as("exact_cnt"), count(col("hit")).as("hits"),
        min(when(col("hit").isNull, col("hd"))).as("miss_min_hamming"))
      .join(dropped, Seq("pa"))
      .select(col("pa").as("panel_doc"), col("exact_cnt"), col("hits"),
        expr("hits * 1000000 div exact_cnt").as("recall_ppm"),
        col("miss_min_hamming"), col("gt_dropped"))
      .orderBy("panel_doc")
  }

  /** The MinHash-LSH recall scoreboard shared by q261 (20% share panel)
    * and q272 (fixed absolute panel): exact side is every panel-touching
    * pair at exact Jaccard ≥ 0.5 over the index's own shingle-fingerprint
    * universe, found through the inverted shingle index (never a
    * panel × corpus product) with the GtBucketCap df cutoff enforced and
    * reported per panel doc as `gt_excluded_fps`; graded against the very
    * q39 pair set the engine ships. `panelIdCap` switches the panel from
    * the 20% share to the fixed absolute sample (the q270/q271 form). */
  /** The panel's exact-Jaccard ground truth shared by the q261/q272
    * scoreboards and the q273/q274 cap dials: `exact(pa, pb, jac_ppm)` —
    * every panel-touching pair at exact Jaccard ≥ ½ over the df-bounded
    * shingle-fp universe — and `gtx(pa, gt_excluded_fps)`, the per-panel-
    * doc count of shingle slots the GtBucketCap df cutoff removed.
    *
    * Bounded ground truth: shingle fps whose corpus document frequency
    * exceeds GtBucketCap are excluded from BOTH intersections and sizes
    * (q41's informative-shingle discipline — the predicate 2·∩ ≥
    * |A|+|B|−∩ stays self-consistent over the reduced universe), and
    * the exclusion is explicit (0 = complete ground truth). Without the
    * bound, one boilerplate shingle shared by every doc makes the
    * inverted-index exact side panel_share × n² at exactly the
    * saturation the scoreboard exists to measure. */
  private[graft] def minhashPanelExact(s: SparkSession, dir: String,
      panelIdCap: Option[Long]): (DataFrame, DataFrame) = {
    import org.apache.spark.sql.expressions.Window
    def isPanel(c: org.apache.spark.sql.Column) =
      panelIdCap.foldLeft(c % 5 === 0)((p, cap) => p && c < cap)
    val shEx = replayableShingles(Tables.documents(s, dir))
      .select(col("doc_id"), explode(col("sh")).as("s"))
      .withColumn("df", count(lit(1)).over(Window.partitionBy("s")))
      // materialized once: gtx, the size census and BOTH sides of the
      // intersection join consume this stream — un-staged, the shingle
      // walk + df window re-evaluated per consumer (4-5 scans of the
      // corpus in q273/q274's plans). Re-adjudicated r17 after the r16
      // verdict flagged the dials: a same-hour interleaved ABAB
      // (staged/unstaged × 2, 8 reps each) read staged FASTER for
      // q261/q272 (mins 0.90/0.66 vs 1.01-1.21/0.76-0.91) and q274
      // (1.20/1.28 vs 1.40/1.42), noise-level for q273 — the
      // cross-session snapshot regression the verdict cited does not
      // reproduce under controlled pairing, so the staging stays.
      .staged
    val gtx = shEx.filter(isPanel(col("doc_id")))
      .groupBy(col("doc_id").as("pa"))
      .agg(count(when(col("df") > GtBucketCap, 1)).as("gt_excluded_fps"))
    val shF = shEx.filter(col("df") <= GtBucketCap).select("doc_id", "s")
    val sizes = shF.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val inter = shF.filter(isPanel(col("doc_id")))
      .select(col("doc_id").as("pa"), col("s"))
      .join(shF.select(col("doc_id").as("pb"), col("s")), "s")
      .filter(col("pa") =!= col("pb"))
      .groupBy("pa", "pb").agg(count(lit(1)).as("c"))
    val exact = inter
      .join(sizes.select(col("doc_id").as("pa"), col("n").as("na")), "pa")
      .join(sizes.select(col("doc_id").as("pb"), col("n").as("nb")), "pb")
      .filter(lit(2) * col("c") >= col("na") + col("nb") - col("c"))
      .select(col("pa"), col("pb"),
        expr("c * 1000000 div (na + nb - c)").as("jac_ppm"))
    (exact, gtx)
  }

  private[graft] def minhashScoreboard(s: SparkSession, dir: String,
      panelIdCap: Option[Long] = None): DataFrame = {
    val (exact, gtx) = minhashPanelExact(s, dir, panelIdCap)
    // symmetrize by exploding both orientations from ONE pass — a unionAll
    // of two selects rebuilds the whole q39 pipeline per branch
    val aps = minhashPairs(s, dir)
      .select(explode(array(
        struct(col("doc_a").as("pa"), col("doc_b").as("pb")),
        struct(col("doc_b").as("pa"), col("doc_a").as("pb")))).as("s"))
      .select(col("s.pa"), col("s.pb"))
      .withColumn("hit", lit(1))
    exact.join(aps, Seq("pa", "pb"), "left")
      .groupBy("pa")
      .agg(count(lit(1)).as("exact_cnt"), count(col("hit")).as("hits"),
        coalesce(max(when(col("hit").isNull, col("jac_ppm"))), lit(0L))
          .as("worst_miss_ppm"))
      .join(gtx, Seq("pa"))
      .select(col("pa").as("panel_doc"), col("exact_cnt"), col("hits"),
        expr("hits * 1000000 div exact_cnt").as("recall_ppm"),
        col("worst_miss_ppm"), col("gt_excluded_fps"))
      .orderBy("panel_doc")
  }

  /** The q261/q272 oracle: [[minhashScoreboard]]'s exact replay in the
    * DuckDB dialect, appended after `$replayShinglePrologueSql,
    * $minhashPairSqlCtes`. `absCap` adds the fixed-absolute-panel bound
    * to both panel-side scans. */
  private def minhashScoreboardSqlTail(absCap: Option[Long]): String = {
    val pp = absCap.map(c => s" AND sh.doc_id < $c").getOrElse("")
    val pa = absCap.map(c => s" AND a.doc_id < $c").getOrElse("")
    s"""aps AS (
       |  SELECT doc_a AS a, doc_b AS b FROM ap
       |  UNION ALL
       |  SELECT doc_b, doc_a FROM ap
       |), fdf AS (
       |  SELECT s, count(*) AS df FROM sh GROUP BY s
       |), shf AS (
       |  SELECT sh.doc_id, sh.s FROM sh JOIN fdf USING (s)
       |  WHERE df <= $GtBucketCap
       |), gtx AS (
       |  SELECT sh.doc_id AS pa,
       |         CAST(count(CASE WHEN df > $GtBucketCap THEN 1 END)
       |              AS BIGINT) AS gt_excluded_fps
       |  FROM sh JOIN fdf USING (s)
       |  WHERE sh.doc_id % 5 = 0$pp GROUP BY 1
       |), sizes AS (
       |  SELECT doc_id, count(*) AS n FROM shf GROUP BY doc_id
       |), inter AS (
       |  SELECT a.doc_id AS pa, b.doc_id AS pb, count(*) AS c
       |  FROM shf a JOIN shf b ON a.s = b.s AND a.doc_id <> b.doc_id
       |  WHERE a.doc_id % 5 = 0$pa
       |  GROUP BY 1, 2
       |), exact AS (
       |  SELECT pa, pb, c * 1000000 // (sa.n + sb.n - c) AS jac_ppm
       |  FROM inter
       |  JOIN sizes sa ON sa.doc_id = pa
       |  JOIN sizes sb ON sb.doc_id = pb
       |  WHERE 2 * c >= sa.n + sb.n - c
       |), sbd AS (
       |  SELECT pa,
       |         CAST(count(*) AS BIGINT) AS exact_cnt,
       |         CAST(count(h.a) AS BIGINT) AS hits,
       |         CAST(count(h.a) * 1000000 // count(*) AS BIGINT)
       |           AS recall_ppm,
       |         CAST(coalesce(max(CASE WHEN h.a IS NULL
       |                                THEN jac_ppm END), 0) AS BIGINT)
       |           AS worst_miss_ppm
       |  FROM exact
       |  LEFT JOIN aps h ON h.a = exact.pa AND h.b = exact.pb
       |  GROUP BY pa
       |)
       |SELECT sbd.pa AS panel_doc, exact_cnt, hits, recall_ppm,
       |       worst_miss_ppm, gtx.gt_excluded_fps
       |FROM sbd JOIN gtx ON gtx.pa = sbd.pa
       |ORDER BY panel_doc""".stripMargin
  }

  /** The q273/q274 oracle: [[minhashCapDial]]'s exact replay in the
    * DuckDB dialect, appended after `$replayShinglePrologueSql,
    * $minhashPairSqlCtes` (whose `msig`/`bands` CTEs it reads). `absCap`
    * adds the fixed-absolute-panel bound to every panel-side scan. */
  private def minhashCapDialSqlTail(absCap: Option[Long]): String = {
    val pp = absCap.map(c => s" AND sh.doc_id < $c").getOrElse("")
    val pa = absCap.map(c => s" AND a.doc_id < $c").getOrElse("")
    val pk = absCap.map(c => s" AND doc_id < $c").getOrElse("")
    val pj = absCap.map(c => s" AND p.doc_id < $c").getOrElse("")
    val capValues = CapSweep.map(c => s"($c::BIGINT)").mkString(", ")
    s"""kb AS (
       |  SELECT band, key, count(*) AS b FROM bands GROUP BY 1, 2
       |), kp AS (
       |  SELECT bd.band, bd.key, bd.doc_id, kb.b,
       |         row_number() OVER (PARTITION BY bd.band, bd.key
       |                            ORDER BY bd.doc_id) AS rk
       |  FROM bands bd JOIN kb USING (band, key)
       |), gtd AS (
       |  SELECT CAST(coalesce(sum(CASE WHEN b > $GtBucketCap
       |                                THEN b - $GtBucketCap ELSE 0 END), 0)
       |              AS BIGINT) AS gt_dropped
       |  FROM kp WHERE doc_id % 5 = 0$pk
       |), fdf AS (
       |  SELECT s, count(*) AS df FROM sh GROUP BY s
       |), gtxa AS (
       |  SELECT CAST(coalesce(sum(CASE WHEN df > $GtBucketCap
       |                                THEN 1 ELSE 0 END), 0) AS BIGINT)
       |           AS gt_excluded_fps
       |  FROM sh JOIN fdf USING (s)
       |  WHERE sh.doc_id % 5 = 0$pp
       |), shf AS (
       |  SELECT sh.doc_id, sh.s FROM sh JOIN fdf USING (s)
       |  WHERE df <= $GtBucketCap
       |), sizes AS (
       |  SELECT doc_id, count(*) AS n FROM shf GROUP BY doc_id
       |), inter AS (
       |  SELECT a.doc_id AS pa, b.doc_id AS pb, count(*) AS c
       |  FROM shf a JOIN shf b ON a.s = b.s AND a.doc_id <> b.doc_id
       |  WHERE a.doc_id % 5 = 0$pa
       |  GROUP BY 1, 2
       |), exact AS (
       |  SELECT pa, pb
       |  FROM inter
       |  JOIN sizes sa ON sa.doc_id = pa
       |  JOIN sizes sb ON sb.doc_id = pb
       |  WHERE 2 * c >= sa.n + sb.n - c
       |), est AS (
       |  SELECT e.pa, e.pb,
       |         sum(CASE WHEN ma.v = mb.v THEN 1 ELSE 0 END) >= 32 AS est_ok
       |  FROM exact e
       |  JOIN msig ma ON ma.doc_id = e.pa
       |  JOIN msig mb ON mb.doc_id = e.pb AND mb.i = ma.i
       |  GROUP BY 1, 2
       |), pp AS (
       |  SELECT p.doc_id AS pa, c.doc_id AS pb, min(p.b) AS min_bsz
       |  FROM kp p JOIN kp c USING (band, key)
       |  WHERE p.doc_id % 5 = 0$pj AND c.doc_id <> p.doc_id
       |    AND c.rk <= $GtBucketCap
       |  GROUP BY 1, 2
       |), j AS (
       |  SELECT est.pa, est.pb, pp.min_bsz, est.est_ok
       |  FROM est LEFT JOIN pp ON pp.pa = est.pa AND pp.pb = est.pb
       |), caps(cap) AS (VALUES $capValues),
       |g AS (
       |  SELECT cap,
       |         CAST(count(j.pa) AS BIGINT) AS exact_cnt,
       |         CAST(count(CASE WHEN j.min_bsz <= cap AND j.est_ok
       |                         THEN 1 END) AS BIGINT) AS hits
       |  FROM caps LEFT JOIN j ON TRUE
       |  GROUP BY cap
       |)
       |SELECT cap, exact_cnt, hits,
       |       CAST(coalesce(hits * 1000000 // nullif(exact_cnt, 0), 0)
       |            AS BIGINT) AS recall_ppm,
       |       coalesce(hits * 1000000 // nullif(exact_cnt, 0), 0)
       |         >= $CapRecallFloorPpm AS meets_floor,
       |       cap = coalesce(
       |         min(CASE WHEN coalesce(hits * 1000000 // nullif(exact_cnt, 0), 0)
       |                       >= $CapRecallFloorPpm THEN cap END) OVER (),
       |         max(cap) OVER ()) AS chosen,
       |       gtd.gt_dropped, gtxa.gt_excluded_fps
       |FROM g CROSS JOIN gtd CROSS JOIN gtxa ORDER BY cap""".stripMargin
  }

  /** The q67 index replay in CTE form, appended after
    * [[SimilarityQueries.lshReplayPrologue]] (which defines `n` and
    * `codes`): Hamming≤1 probe expansion, bucket cap, in-bucket pairing,
    * exact cosine re-check — ending at `lsc(vec_a, vec_b, c)`. ONE copy
    * serves q67 and the q264 recall scoreboard. */
  private[graft] def lshPairSqlCtes: String =
    s"""probed AS (
       |  SELECT c.vec_id, c.tbl, xor(c.code, m.m) AS code
       |  FROM codes c, (
       |    SELECT 0::BIGINT AS m
       |    UNION ALL
       |    SELECT (1::BIGINT << i) FROM range(0, 24) t(i), params
       |    WHERE i < bits
       |  ) m
       |), bounded AS (
       |  SELECT vec_id, tbl, code FROM (
       |    SELECT *, count(*) OVER (PARTITION BY tbl, code) AS bsz
       |    FROM probed
       |  ) WHERE bsz BETWEEN 2 AND $MaxBucket
       |), pairs AS (
       |  SELECT DISTINCT p1.vec_id AS vec_a, p2.vec_id AS vec_b
       |  FROM bounded p1 JOIN bounded p2 USING (tbl, code)
       |  WHERE p1.vec_id < p2.vec_id
       |), lsc AS (
       |  SELECT vec_a, vec_b, c FROM (
       |    SELECT p.vec_a, p.vec_b,
       |           list_reduce(list_transform(range(1, 65),
       |                                      i -> a.v[i] * b.v[i]),
       |                       (x,y) -> x+y) / (a.nrm * b.nrm) AS c
       |    FROM pairs p
       |    JOIN n a ON a.vec_id = p.vec_a
       |    JOIN n b ON b.vec_id = p.vec_b
       |  ) WHERE c >= CAST(0.35 AS DOUBLE)
       |)""".stripMargin

  /** (vec_id, v: array<double>, nrm) — the normalized embedding frame
    * q42/q67/q264 share. */
  private[graft] def normVecs(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.VectorFunctions.dotd
    Tables.embeddings(s, dir)
      .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("v"))
      .withColumn("nrm", sqrt(dotd(col("v"), col("v"))))
  }

  /** q67's sub-quadratic near-dup pair set from any normalized vector
    * frame, unsorted: sign-LSH codes (4 tables × `bits`-bit hyperplane
    * codes), symmetric Hamming≤1 multi-probe, bounded buckets, in-bucket
    * pairing over IDS only, exact cosine re-check. */
  /** (vec_id, tbl, code) — every vector's bounded probe-bucket
    * memberships across `tables` sign-LSH tables: own code plus all
    * Hamming-1 probes, buckets capped at [[MaxBucket]]. The shared
    * collision universe of q67's pairing and the q268 table dial. */
  /** The per-table sign-LSH code expressions over a `v` column — ONE
    * definition of the code family shared by the batch index
    * ([[lshBoundedKeys]]) and the streaming admission feed
    * ([[lshSigCodes]]): the hyperplanes ARE the index, so every consumer
    * derives codes from the same planes. */
  private[graft] def lshCodeCols(bits: Int,
                                 tables: Int): Seq[org.apache.spark.sql.Column] = {
    val Dim = 64
    (0 until tables).map(t =>
      graft.functions.VectorFunctions.signCode(col("v"),
        (0 until bits).flatMap(b => SimilarityQueries.hyperplane(t, b, Dim)).toArray,
        bits, Dim))
  }

  /** (vec_id, codes: array<int>) — each vector's per-table codes as one
    * row: the batch-side projection that feeds streaming LSH admission
    * (`StatefulOps.lshAdmitTws`). The embedding itself stays in the scan;
    * only the ~16-byte code row travels. */
  private[graft] def lshSigCodes(e: DataFrame, bits: Int,
                                 tables: Int = LshTables): DataFrame =
    e.select(col("vec_id"), array(lshCodeCols(bits, tables): _*).as("codes"))

  private[graft] def lshBoundedKeys(e: DataFrame, bits: Int,
                                    tables: Int = LshTables): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val codeFor = lshCodeCols(bits, tables)
    // every vector lands in its own bucket AND all Hamming-1 neighbors —
    // symmetric multi-probe: two codes collide iff their probe balls meet,
    // widening the collision radius to Hamming ≤ 2. Only IDS flow through
    // banding, pair expansion and dedupe (16 B/pair, not the vectors);
    // the embeddings join back for the exact re-check afterwards.
    val probed = e.select(col("vec_id"),
      explode(array((0 until tables).map(t => struct(lit(t).as("tbl"),
        codeFor(t).as("code"))): _*)).as("bk"))
      .select(col("vec_id"), col("bk.tbl"),
        explode(array(col("bk.code") +:
          (0 until bits).map(b => col("bk.code").bitwiseXOR(lit(1 << b))): _*)).as("code"))
    probed
      .withColumn("bsz", count(lit(1)).over(Window.partitionBy("tbl", "code")))
      .filter(col("bsz").between(2, MaxBucket))
      .select(col("vec_id"), col("tbl"), col("code"))
  }

  /** q67's shipped table count — the q268 dial's default and sweep max. */
  private[graft] val LshTables = 4

  private[graft] def lshNearDupPairsFrom(e: DataFrame, bits: Int,
                                         tables: Int = LshTables): DataFrame = {
    import graft.functions.VectorFunctions.dotd
    val bounded = lshBoundedKeys(e, bits, tables)
      .groupBy("tbl", "code")
      .agg(sort_array(collect_list(col("vec_id"))).as("ids"))
    val pairs = bounded
      .select(explode(flatten(transform(col("ids"), (a, i) =>
        transform(slice(col("ids"), i + 2, size(col("ids"))), b =>
          struct(a.as("vec_a"), b.as("vec_b")))))).as("p"))
      // vec_a < vec_b already holds: ids are sorted in-bucket, a vector
      // appears at most once per bucket (its probe codes are distinct),
      // and the slice pattern only pairs strictly-later elements
      .select(col("p.vec_a"), col("p.vec_b"))
      .dropDuplicates("vec_a", "vec_b")
    pairs
      .join(e.select(col("vec_id").as("vec_a"), col("v").as("va"), col("nrm").as("na")), "vec_a")
      .join(e.select(col("vec_id").as("vec_b"), col("v").as("vb"), col("nrm").as("nb")), "vec_b")
      .withColumn("c", dotd(col("va"), col("vb")) / (col("na") * col("nb")))
      .filter(col("c") >= 0.35)
      .select(col("vec_a"), col("vec_b"), round(col("c"), 4).as("cos"))
  }

  /** The embedding near-dup recall scoreboard shared machinery (q264):
    * exact side is every cosine ≥ 0.35 partner of the deterministic 20%
    * panel, computed through q42's tile discipline restricted to
    * panel × corpus (each panel vector rides to all B tiles, each corpus
    * vector sits in its hash tile once — an equi-join on the tile key,
    * never a nested-loop product; the O(panel·n) COMPUTE is inherent to
    * exact cosine on this corpus, see q42). Graded against the capped
    * banded pair set q67 ships; `miss_max_cos` (NULL when nothing is
    * missed) names the strongest dropped pair — near 1.0 means the index
    * is dropping true near-dups (cap saturation), near 0.35 means only
    * threshold-straddlers slip (the documented LSH hard case). */
  /** The ABSOLUTE panel bound for the `*_abs` scoreboard forms: panel =
    * vec_id % 5 == 0 AND vec_id < this — exactly 64 panel vectors at any
    * corpus size, so the exact-cosine ground-truth pass is O(64·n),
    * linear in the corpus, where the share-based panel's cost is
    * O(0.2·n²). The 100 TB posture the share-based forms document ("at
    * scale the panel is a fixed absolute sample") shipped as first-class
    * queries (q270/q271). */
  private[graft] val AbsPanelIdCap = 320L

  /** (pa, pd, cos4) — the deterministic panel's exact cosine ≥ 0.35
    * partners via q42's tile discipline restricted to panel × corpus.
    * The shared exact side of the q264 scoreboard and the q268 dial;
    * `panelIdCap` switches the panel from the 20% share to the fixed
    * absolute sample (the q270/q271 forms). */
  private[graft] def panelExactCosine(e: DataFrame, nVecs: Long,
                                      panelIdCap: Option[Long] = None): DataFrame = {
    import graft.functions.VectorFunctions.dotd
    val BlockRows = 256L
    val B = math.min(1024L, math.max(1L, (nVecs + BlockRows - 1) / BlockRows)).toInt
    val blocked = e.withColumn("blk", pmod(xxhash64(col("vec_id")), lit(B)).cast("int"))
    val panelRows = panelIdCap.foldLeft(
      blocked.filter(col("vec_id") % 5 === 0))((d, cap) =>
      d.filter(col("vec_id") < cap))
    val panel = panelRows
      .withColumn("tb", explode(sequence(lit(0), lit(B - 1))))
      .select(col("tb"), col("vec_id").as("pa"), col("v").as("va"), col("nrm").as("na"))
    blocked
      .select(col("blk").as("tb"), col("vec_id").as("pd"), col("v").as("vb"),
        col("nrm").as("nb"))
      .join(panel, Seq("tb"))
      .filter(col("pa") =!= col("pd"))
      .withColumn("c", dotd(col("va"), col("vb")) / (col("na") * col("nb")))
      .filter(col("c") >= 0.35)
      .select(col("pa"), col("pd"), round(col("c"), 4).as("cos4"))
  }

  private[graft] def embeddingScoreboard(e: DataFrame, pairs: DataFrame,
                                         nVecs: Long,
                                         panelIdCap: Option[Long] = None): DataFrame = {
    val exact = panelExactCosine(e, nVecs, panelIdCap)
    // symmetrize by exploding both orientations from ONE pass — a unionAll
    // of two selects rebuilds the whole q67 pipeline per branch
    val aps = pairs
      .select(explode(array(
        struct(col("vec_a").as("pa"), col("vec_b").as("pd")),
        struct(col("vec_b").as("pa"), col("vec_a").as("pd")))).as("s"))
      .select(col("s.pa"), col("s.pd"))
      .withColumn("hit", lit(1))
    exact.join(aps, Seq("pa", "pd"), "left")
      .groupBy("pa")
      .agg(count(lit(1)).as("exact_cnt"), count(col("hit")).as("hits"),
        max(when(col("hit").isNull, col("cos4"))).as("miss_max_cos"))
      .select(col("pa").as("panel_vec"), col("exact_cnt"), col("hits"),
        expr("hits * 1000000 div exact_cnt").as("recall_ppm"),
        col("miss_max_cos"))
      .orderBy("panel_vec")
  }

  /** The q265/q266 cap sweep: candidate bucket caps, ascending.
    * [[MaxBucket]] sits inside the sweep so the dial can confirm or move
    * the shipped default in either direction. */
  private[graft] val CapSweep = Seq(16, 32, 64, 128)

  /** The q265/q266 recall target: micro recall the chosen cap must meet
    * over the panel's full-signature Hamming ≤ 6 pairs. */
  private[graft] val CapRecallFloorPpm = 900000L

  /** The bucket-cap dial shared by q265 (text) and q266 (media) — q251's
    * treatment applied to the near-dup index's OTHER operating parameter:
    * the q262/q263 scoreboards price the shipped cap's recall loss; this
    * dial sweeps caps and emits the MINIMAL one whose panel recall meets
    * the floor (deepest sweep point if none does). One shared pass serves
    * every cap: each exact panel pair carries the SIZE OF ITS SMALLEST
    * SHARED BUCKET (`min_bsz`), and the pair survives cap c iff
    * min_bsz ≤ c — so the per-cap scoreboards are conditional sums over
    * one per-pair frame, never a re-run of the index per cap (the crk
    * trick, bucket-sized instead of rank-sized). Exact side and cost
    * bound are q262's: uncapped pigeonhole banding is exhaustive at
    * Hamming ≤ 6, panel-scoped, id-only — and, like q262, the corpus
    * side of the ground-truth join is bounded at `gtCap` with an
    * explicit corpus-level `gt_dropped` column (Σ over panel bucket
    * memberships of the slots past the bound; identical on every cap
    * row because it describes the ground truth, not the swept cap). */
  private[graft] def bucketCapDial(sigs: DataFrame,
                                   floorPpm: Long = CapRecallFloorPpm,
                                   caps: Seq[Int] = CapSweep,
                                   gtCap: Int = GtBucketCap): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val bkt = Window.partitionBy("band", "key")
    val keyed = simhashBandKeys(sigs)
    // sized band frame staged: the panel slice and the gtCap slice both
    // consume it — one evaluation of the signature walk + band windows
    // (batch-only callers: q265/q266, the lifecycle cap audits,
    // Calibration)
    val sized = graft.Staging.stage(
      keyed.withColumn("bsz", count(lit(1)).over(bkt))
        .withColumn("rk", row_number().over(bkt.orderBy("doc_id"))))
    val panel = sized.filter(col("doc_id") % 5 === 0)
      .select(col("band"), col("key"), col("doc_id").as("pa"),
        col("sim").as("sim_a"), col("bsz"))
    val gtDropped = panel
      .agg(coalesce(sum(greatest(col("bsz") - lit(gtCap.toLong), lit(0L))),
        lit(0L)).as("gt_dropped"))
    val exact = sized.filter(col("rk") <= gtCap)
      .select(col("band"), col("key"), col("doc_id").as("pd"), col("sim").as("sim_b"))
      .join(panel, Seq("band", "key"))
      .filter(col("pa") =!= col("pd") &&
        bit_count(col("sim_a").bitwiseXOR(col("sim_b"))) <= 6)
      .groupBy("pa", "pd")
      .agg(min(col("bsz")).as("min_bsz"))
    val agged = exact.agg(count(lit(1)).as("exact_cnt"),
      caps.map(c => sum(when(col("min_bsz") <= c, 1L)).as(s"h$c")): _*)
    val all = Window.partitionBy(lit(1))
    agged.select(col("exact_cnt"),
      explode(array(caps.map(c => struct(lit(c.toLong).as("cap"),
        coalesce(col(s"h$c"), lit(0L)).as("hits"))): _*)).as("cr"))
      .select(col("cr.cap").as("cap"), col("exact_cnt"), col("cr.hits").as("hits"))
      // coalesce(0): the empty corpus must emit a typed zero (q251's
      // discipline) — "no recall evidence" correctly fails any floor
      .withColumn("recall_ppm",
        expr("coalesce(hits * 1000000 div nullif(exact_cnt, 0), 0)"))
      .withColumn("meets_floor", col("recall_ppm") >= lit(floorPpm))
      .withColumn("chosen", col("cap") === coalesce(
        min(when(col("recall_ppm") >= lit(floorPpm), col("cap"))).over(all),
        max(col("cap")).over(all)))
      .crossJoin(broadcast(gtDropped))
      .orderBy("cap")
  }

  /** The dial tail of the q265/q266 oracles, appended after
    * [[simhashBandPairCtes]] (whose `keys`/`bits` CTEs it reads): per-pair
    * smallest-shared-bucket sizes, per-cap conditional grading, minimal
    * cap meeting the floor. */
  private[graft] def capDialSqlTail: String = {
    val capValues = CapSweep.map(c => s"($c::BIGINT)").mkString(", ")
    s"""kb AS (
       |  SELECT band, key, count(*) AS b FROM keys GROUP BY 1, 2
       |), kp AS (
       |  SELECT k.band, k.key, k.doc_id, kb.b,
       |         row_number() OVER (PARTITION BY k.band, k.key
       |                            ORDER BY k.doc_id) AS rk
       |  FROM keys k JOIN kb USING (band, key)
       |), gtd AS (
       |  SELECT CAST(coalesce(sum(CASE WHEN b > $GtBucketCap
       |                                THEN b - $GtBucketCap ELSE 0 END), 0)
       |              AS BIGINT) AS gt_dropped
       |  FROM kp WHERE doc_id % 5 = 0
       |), pp AS (
       |  SELECT p.doc_id AS pa, c.doc_id AS pd, min(p.b) AS min_bsz
       |  FROM kp p JOIN kp c USING (band, key)
       |  WHERE p.doc_id % 5 = 0 AND c.doc_id <> p.doc_id
       |    AND c.rk <= $GtBucketCap
       |  GROUP BY 1, 2
       |), ex AS (
       |  SELECT pp.pa, pp.pd, pp.min_bsz
       |  FROM pp
       |  JOIN bits ba ON ba.doc_id = pp.pa
       |  JOIN bits bb ON bb.doc_id = pp.pd AND bb.i = ba.i
       |  GROUP BY 1, 2, 3
       |  HAVING sum(CASE WHEN ba.bit <> bb.bit THEN 1 ELSE 0 END) <= 6
       |), caps(cap) AS (VALUES $capValues),
       |g AS (
       |  SELECT cap,
       |         CAST(count(ex.pa) AS BIGINT) AS exact_cnt,
       |         CAST(count(CASE WHEN ex.min_bsz <= cap THEN 1 END) AS BIGINT)
       |           AS hits
       |  FROM caps LEFT JOIN ex ON TRUE
       |  GROUP BY cap
       |)
       |SELECT cap, exact_cnt, hits,
       |       CAST(coalesce(hits * 1000000 // nullif(exact_cnt, 0), 0)
       |            AS BIGINT) AS recall_ppm,
       |       coalesce(hits * 1000000 // nullif(exact_cnt, 0), 0)
       |         >= $CapRecallFloorPpm AS meets_floor,
       |       cap = coalesce(
       |         min(CASE WHEN coalesce(hits * 1000000 // nullif(exact_cnt, 0), 0)
       |                       >= $CapRecallFloorPpm THEN cap END) OVER (),
       |         max(cap) OVER ()) AS chosen,
       |       gtd.gt_dropped
       |FROM g CROSS JOIN gtd ORDER BY cap""".stripMargin
  }

  /** The dial reading as an OPERATING PARAMETER: the minimal swept cap
    * whose panel recall meets `floorPpm` — a scalar read off a
    * caps-sized frame, consumed by the next index build. */
  def calibratedSimhashCap(s: SparkSession, dir: String,
                           floorPpm: Long = CapRecallFloorPpm): Int =
    bucketCapDial(textSimhashSigs(s, dir), floorPpm)
      .filter(col("chosen")).select(col("cap")).head.getLong(0).toInt

  /** q40's near-dup pairs at the dial-chosen cap — [[MaxBucket]] is now
    * only the DEFAULT this entry point replaces. */
  def simhashNearDupCalibrated(s: SparkSession, dir: String,
                               floorPpm: Long = CapRecallFloorPpm): DataFrame =
    simhashNearDupPairsUnsorted(textSimhashSigs(s, dir),
      calibratedSimhashCap(s, dir, floorPpm))
      .orderBy("doc_a", "doc_b")

  /** The q268 recall target: micro recall the chosen table count must
    * meet over the panel's exact cosine ≥ 0.35 pairs. Matches the probe
    * dial's floor (both calibrate routing recall, not precision —
    * precision is 1 by the exact re-check). */
  private[graft] val LshTableFloorPpm = 500000L

  /** The LSH table dial (q268) — the calibration q264's diagnostic points
    * at: miss_max_cos near the threshold means pairs fall outside the
    * probe radius, and the fix is MORE TABLES, each an independent
    * hyperplane draw whose collision chance compounds. Tables are the
    * index's linear cost knob (build size, probe work and bucket state
    * all scale with t), so the dial sweeps t = 1..4 and emits the MINIMAL
    * count whose panel recall meets the floor. One shared pass serves
    * every t: each exact pair carries the SMALLEST table index where it
    * collides through the bounded probe buckets (`min_tbl`), and it is
    * found by t tables iff min_tbl < t — conditional sums over one
    * per-pair frame, the index never re-built per sweep point. */
  private[graft] def lshTableDial(e: DataFrame, bits: Int, nVecs: Long,
                                  floorPpm: Long = LshTableFloorPpm,
                                  tables: Int = LshTables,
                                  panelIdCap: Option[Long] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val keys = lshBoundedKeys(e, bits, tables)
    val panelKeys = panelIdCap.foldLeft(
      keys.filter(col("vec_id") % 5 === 0))((d, cap) =>
      d.filter(col("vec_id") < cap))
    val pc = panelKeys
      .select(col("tbl"), col("code"), col("vec_id").as("pa"))
      .join(keys.select(col("tbl"), col("code"), col("vec_id").as("pd")),
        Seq("tbl", "code"))
      .filter(col("pa") =!= col("pd"))
      .groupBy("pa", "pd")
      .agg(min(col("tbl")).as("min_tbl"))
    val graded = panelExactCosine(e, nVecs, panelIdCap)
      .join(pc, Seq("pa", "pd"), "left")
    val agged = graded.agg(count(lit(1)).as("exact_cnt"),
      (1 to tables).map(t =>
        sum(when(col("min_tbl") < t, 1L)).as(s"h$t")): _*)
    val all = Window.partitionBy(lit(1))
    agged.select(col("exact_cnt"),
      explode(array((1 to tables).map(t => struct(lit(t.toLong).as("tables"),
        coalesce(col(s"h$t"), lit(0L)).as("hits"))): _*)).as("tr"))
      .select(col("tr.tables").as("tables"), col("exact_cnt"),
        col("tr.hits").as("hits"))
      .withColumn("recall_ppm",
        expr("coalesce(hits * 1000000 div nullif(exact_cnt, 0), 0)"))
      .withColumn("meets_floor", col("recall_ppm") >= lit(floorPpm))
      .withColumn("chosen", col("tables") === coalesce(
        min(when(col("recall_ppm") >= lit(floorPpm), col("tables"))).over(all),
        max(col("tables")).over(all)))
      .orderBy("tables")
  }

  /** The dial reading as an OPERATING PARAMETER: the minimal swept table
    * count whose panel recall meets `floorPpm`. */
  def calibratedLshTables(s: SparkSession, dir: String,
                          floorPpm: Long = LshTableFloorPpm): Int = {
    val n = Tables.parquetRowCount(s, dir, "embeddings")
    lshTableDial(normVecs(s, dir), SimilarityQueries.codeBits(n), n, floorPpm)
      .filter(col("chosen")).select(col("tables")).head.getLong(0).toInt
  }

  /** q67's near-dup pairs at the dial-chosen table count — [[LshTables]]
    * is now only the DEFAULT this entry point replaces. */
  def lshNearDupCalibrated(s: SparkSession, dir: String,
                           floorPpm: Long = LshTableFloorPpm): DataFrame = {
    val n = Tables.parquetRowCount(s, dir, "embeddings")
    lshNearDupPairsFrom(normVecs(s, dir), SimilarityQueries.codeBits(n),
      calibratedLshTables(s, dir, floorPpm))
      .orderBy("vec_a", "vec_b")
  }

  /** Canonical lead fingerprint: sha256 of the first 8 lowercased words —
    * ONE definition shared by q160 (incremental dedup), q161 (source
    * overlap) and q169 (keep-best), plus `PipelineInvariantSpec`. A
    * canonicalization tweak applied to one copy would silently decouple
    * the three dedup operators from each other and from the invariant
    * test, so all four sites reference this pair. [[leadFingerprintSql]]
    * is the same expression in the oracles' DuckDB dialect. */
  private[graft] def leadFingerprint: org.apache.spark.sql.Column =
    sha2(concat_ws(" ", slice(split(lower(col("text")), " "), 1, 8)), 256)

  private[graft] val leadFingerprintSql: String =
    "sha256(list_aggregate(string_split(lower(text), ' ')[1:8], 'string_agg', ' '))"

  /** Skew guard for the candidate generators: a bucket larger than this is
    * ubiquitous content (boilerplate headers, stopword shingles), which is
    * near-dup NOISE — its pair expansion is quadratic in the bucket and its
    * matches are meaningless. Buckets are bounded BEFORE `collect_list`
    * materializes them (a window count on the same key adds no exchange:
    * the groupBy reuses the window's hash partitioning), so no agg buffer
    * ever holds a hot bucket. */
  val MaxBucket = 64

  /** q39's candidate buckets: (band, key) → ≤[[MaxBucket]] (doc_id, sig).
    * Signatures are built ROW-LOCALLY from each doc's shingle array (the
    * scalar MinHash expression — no explode, no aggregation shuffle; the
    * first exchange in the whole plan is the band-bucket groupBy). Docs
    * with no shingles are excluded, matching the aggregate form where they
    * contribute no rows. */
  /** 16 LSH band keys of a MinHash signature column, as array<struct<band,
    * key>> — shared by the batch bucket path and incremental index joins.
    * Bounded polynomial fold: acc < 2^31 and x < 2^31, so acc*1000003 + x
    * < 2^52 — no ANSI Long overflow. */
  private[graft] def bandKeys(sig: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    transform(sequence(lit(0), lit(15)), b => struct(
      b.as("band"),
      aggregate(slice(sig, b * 4 + 1, lit(4)), b.cast("long"),
        (acc, x) => pmod(acc * lit(1000003L) + x, lit(2147483647L))).as("key")))

  /** (doc_id, sig) — the per-document MinHash signature table: THE artifact
    * an incremental pipeline persists and joins new batches against. Built
    * on the replayable fp family so the whole index is oracle-checkable. */
  private[graft] def minhashSignatures(s: SparkSession, dir: String): DataFrame =
    minhashSignaturesFor(Tables.documents(s, dir))

  /** Signature build for any (doc_id, text) frame — the index-build and the
    * new-batch probe (SketchSpec incremental test) share this path. */
  private[graft] def minhashSignaturesFor(docs: DataFrame): DataFrame =
    replayableShingles(docs)
      .select(col("doc_id"), Sketches.minhashArray(col("sh")).as("sig"))

  /** (doc_id, keys: array<long>) — each document's 16 MinHash band keys
    * as one row: the batch-side projection that feeds streaming MinHash
    * admission (`StatefulOps.minhashAdmitTws`). The signature (and the
    * document) stay in the scan; only the ~128-byte key row travels. */
  private[graft] def minhashSigKeysFor(docs: DataFrame): DataFrame =
    minhashSignaturesFor(docs).select(col("doc_id"),
      transform(bandKeys(col("sig")), bk => bk("key")).as("keys"))

  /** q39's pair set, pre-presentation: (doc_a, doc_b, est_jaccard_ppm) —
    * banded candidates, bucket cap, signature-agreement score, est-J ≥ 0.5
    * cut. ONE copy shared by q39 itself and the q261 recall scoreboard
    * (the eval grades the pair set the engine ships, not a lookalike). */
  private[graft] def minhashPairs(s: SparkSession, dir: String,
                                  cap: Int = MaxBucket): DataFrame =
    minhashPairsOfSigs(minhashSignatures(s, dir), cap)

  /** [[minhashPairs]] over any prebuilt signature frame — the composed
    * ingest pipeline's batch sibling probes its own cleaned-text
    * signatures through exactly the q39 pair plan. */
  private[graft] def minhashPairsOfSigs(sigs: DataFrame,
                                        cap: Int = MaxBucket): DataFrame = {
    val cands = minhashBucketsOfSigs(sigs, cap)
      .select(explode(flatten(transform(col("docs"), (a, i) =>
        transform(slice(col("docs"), i + 2, size(col("docs"))), b =>
          struct(a("doc_id").as("doc_a"), b("doc_id").as("doc_b"),
            a("sig").as("sa"), b("sig").as("sb")))))).as("p"))
      .select(col("p.doc_a"), col("p.doc_b"), col("p.sa"), col("p.sb"))
      .distinct()
    cands
      // native position-wise equality count — the aggregate(zip_with(…))
      // fold is interpreted (CodegenFallback) in Spark 4, paid once per
      // CANDIDATE PAIR × 64 signature positions on this bucket-expanded
      // stream; graft_eq_count keeps the fold's exact semantics in one
      // codegen loop
      .withColumn("n_match",
        graft.functions.VectorFunctions.eqCount(col("sa"), col("sb")))
      .filter(col("n_match") >= Sketches.NumMinHashes / 2) // est J >= 0.5
      .select(col("doc_a"), col("doc_b"),
        (col("n_match") * lit(15625L)).as("est_jaccard_ppm"))
  }

  private[graft] def minhashBuckets(s: SparkSession, dir: String,
                                    cap: Int = MaxBucket): DataFrame =
    minhashBucketsOfSigs(minhashSignatures(s, dir), cap)

  private[graft] def minhashBucketsOfSigs(sigs: DataFrame,
                                          cap: Int = MaxBucket): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val bands = sigs.select(col("doc_id"), col("sig"),
      explode(bandKeys(col("sig"))).as("bk"))
      .select(col("doc_id"), col("sig"), col("bk.band"), col("bk.key"))
    bands
      .withColumn("bsz", count(lit(1)).over(Window.partitionBy("band", "key")))
      .filter(col("bsz").between(2, cap))
      .groupBy("band", "key")
      .agg(sort_array(collect_list(struct(col("doc_id"), col("sig")))).as("docs"))
  }

  /** The MinHash cap dial shared by q273 (20% share panel) and q274
    * (fixed absolute panel) — q265's calibration discipline applied to
    * the MinHash index, completing the dial matrix (IVF probes, SimHash
    * caps text/media, LSH tables, MinHash cap): q261 PRICES the shipped
    * cap's recall loss, this dial SETS the cap. One shared pass serves
    * every swept cap: each exact panel pair (q261's own ground truth —
    * exact Jaccard ≥ ½ over the df-bounded shingle-fp universe) carries
    * the size of its SMALLEST shared band bucket, and the banded index
    * at cap c emits it iff that size ≤ c AND its 64-sample signature
    * agreement clears q39's est-J ≥ ½ cut (`est_ok` — cap-independent,
    * the estimation-error term the SimHash dials don't have because
    * their re-check IS their ground-truth criterion; including it makes
    * the dial's cap-64 row reproduce q261's aggregate micro recall, the
    * SketchSpec identity pin). Both ground-truth bounds stay explicit:
    * `gt_dropped` counts band-bucket candidate slots past `gtCap`,
    * `gt_excluded_fps` the df-cutoff shingle slots — identical on every
    * cap row because they describe the ground truth, not the swept cap. */
  private[graft] def minhashCapDial(s: SparkSession, dir: String,
                                    floorPpm: Long = CapRecallFloorPpm,
                                    caps: Seq[Int] = CapSweep,
                                    gtCap: Int = GtBucketCap,
                                    panelIdCap: Option[Long] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    def isPanel(c: org.apache.spark.sql.Column) =
      panelIdCap.foldLeft(c % 5 === 0)((p, cap) => p && c < cap)
    val bkt = Window.partitionBy("band", "key")
    // signature frame staged: the 64-way MinHash walk feeds the band
    // sizing AND two agreement-join probes (siga/sigb) — one evaluation
    // instead of three (the frame is exactly what the postings pillar
    // stores, index-sized, never corpus text)
    val sigs = minhashSignatures(s, dir).staged
    val sized = sigs
      .select(col("doc_id"), explode(bandKeys(col("sig"))).as("bk"))
      .select(col("doc_id"), col("bk.band"), col("bk.key"))
      .withColumn("bsz", count(lit(1)).over(bkt))
      .withColumn("rk", row_number().over(bkt.orderBy("doc_id")))
      // band rows sized+ranked once: the panel slice and the cap slice
      // both read this frame (dropping this staging alone re-measured
      // WORSE — q274 med 1.07→1.45 in the V0/V1 A/B)
      .staged
    val panel = sized.filter(isPanel(col("doc_id")))
      .select(col("band"), col("key"), col("doc_id").as("pa"), col("bsz"))
    val gtDropped = panel
      .agg(coalesce(sum(greatest(col("bsz") - lit(gtCap.toLong), lit(0L))),
        lit(0L)).as("gt_dropped"))
    val pc = sized.filter(col("rk") <= gtCap)
      .select(col("band"), col("key"), col("doc_id").as("pb"))
      .join(panel, Seq("band", "key"))
      .filter(col("pa") =!= col("pb"))
      .groupBy("pa", "pb").agg(min(col("bsz")).as("min_bsz"))
    val (exact, gtxRows) = minhashPanelExact(s, dir, panelIdCap)
    val gtExcluded = gtxRows
      .agg(coalesce(sum(col("gt_excluded_fps")), lit(0L)).as("gt_excluded_fps"))
    val graded = exact
      .join(pc, Seq("pa", "pb"), "left")
      .join(sigs.select(col("doc_id").as("pa"), col("sig").as("siga")), "pa")
      .join(sigs.select(col("doc_id").as("pb"), col("sig").as("sigb")), "pb")
      .withColumn("est_ok",
        graft.functions.VectorFunctions.eqCount(col("siga"), col("sigb")) >=
          Sketches.NumMinHashes / 2)
    val agged = graded.agg(count(lit(1)).as("exact_cnt"),
      caps.map(c =>
        sum(when(col("min_bsz") <= c && col("est_ok"), 1L)).as(s"h$c")): _*)
    val all = Window.partitionBy(lit(1))
    agged.select(col("exact_cnt"),
      explode(array(caps.map(c => struct(lit(c.toLong).as("cap"),
        coalesce(col(s"h$c"), lit(0L)).as("hits"))): _*)).as("cr"))
      .select(col("cr.cap").as("cap"), col("exact_cnt"), col("cr.hits").as("hits"))
      .withColumn("recall_ppm",
        expr("coalesce(hits * 1000000 div nullif(exact_cnt, 0), 0)"))
      .withColumn("meets_floor", col("recall_ppm") >= lit(floorPpm))
      .withColumn("chosen", col("cap") === coalesce(
        min(when(col("recall_ppm") >= lit(floorPpm), col("cap"))).over(all),
        max(col("cap")).over(all)))
      .crossJoin(broadcast(gtDropped))
      .crossJoin(broadcast(gtExcluded))
      .orderBy("cap")
  }

  /** The dial reading as an OPERATING PARAMETER: the minimal swept cap
    * whose panel recall meets `floorPpm` — q273's knee, consumed by the
    * next index build. */
  def calibratedMinhashCap(s: SparkSession, dir: String,
                           floorPpm: Long = CapRecallFloorPpm): Int =
    minhashCapDial(s, dir, floorPpm)
      .filter(col("chosen")).select(col("cap")).head.getLong(0).toInt

  /** q39's near-dup pairs at the dial-chosen cap — [[MaxBucket]] is now
    * only the DEFAULT this entry point replaces. */
  def minhashNearDupCalibrated(s: SparkSession, dir: String,
                               floorPpm: Long = CapRecallFloorPpm): DataFrame =
    minhashPairs(s, dir, calibratedMinhashCap(s, dir, floorPpm))
      .orderBy("doc_a", "doc_b")

  /** q41's inverted-index buckets: shingles with document frequency above
    * [[MaxBucket]] are dropped (stopword-shingle cutoff) and per-doc sizes
    * are counted AFTER the cutoff, so |A∩B| and |A|+|B| stay consistent —
    * Jaccard over informative shingles, mirrored exactly by the oracle. */
  private[graft] def jaccardBuckets(s: SparkSession, dir: String): DataFrame =
    jaccardBucketsAll(s, dir).filter(size(col("docs")) > 1)

  /** Post-cutoff buckets INCLUDING singletons, id-only: (h, docs:
    * array<doc_id> sorted). The bucket aggregation rides the SAME
    * hash-partitioning the df window established (one exchange of the
    * shingle stream, not two): the old shape interposed a per-doc size
    * window — a second full-stream exchange + sort keyed by doc_id —
    * between the cap filter and the bucket agg just to carry `n` into the
    * bucket lists; [[jaccardPairs]] now recovers the sizes from the
    * buckets themselves (n = how many post-cutoff buckets contain the
    * doc — the singletons make that identity exact). */
  private def jaccardBucketsAll(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    shingles(s, dir)
      .withColumn("df", count(lit(1)).over(Window.partitionBy("h")))
      .filter(col("df") <= MaxBucket)
      .groupBy("h")
      .agg(sort_array(collect_list(col("doc_id"))).as("docs"))
  }

  /** q41's near-dup pairs (doc_a < doc_b, exact Jaccard ≥ 0.8) without the
    * presentation sort — the edge list q81's cluster operator consumes.
    * The bucket frame is staged (one evaluation of the shingle walk +
    * inverted index) and consumed twice: per-doc post-cutoff sizes, and
    * in-bucket pair expansion — the "materialize the stream once, both
    * passes read the staging table" posture q99's note documents, here as
    * the index-sized bucket frame rather than the raw stream. */
  private[operators] def jaccardPairs(s: SparkSession, dir: String): DataFrame = {
    import graft.Staging.StagingOps
    val buckets = jaccardBucketsAll(s, dir).staged
    val sizes = buckets
      .select(explode(col("docs")).as("doc_id"))
      .groupBy("doc_id").agg(count(lit(1)).as("n"))
    val pairs = buckets.filter(size(col("docs")) > 1)
      .select(explode(flatten(transform(col("docs"), (a, i) =>
        transform(slice(col("docs"), i + 2, size(col("docs"))), b =>
          struct(a.as("doc_a"), b.as("doc_b")))))).as("p"))
      .groupBy(col("p.doc_a").as("doc_a"), col("p.doc_b").as("doc_b"))
      .agg(count(lit(1)).as("c"))
    pairs
      .join(sizes.select(col("doc_id").as("doc_a"), col("n").as("na")), "doc_a")
      .join(sizes.select(col("doc_id").as("doc_b"), col("n").as("nb")), "doc_b")
      .withColumn("jac",
        col("c") * lit(1.0) / ((col("na") + col("nb")) - col("c")))
      .filter(col("jac") >= 0.8)
      .select(col("doc_a"), col("doc_b"), round(col("jac"), 4).as("jac"))
  }

  /** The near-dup EDGE LIST (doc_a, doc_b), materialized once per (session,
    * corpus fingerprint) — q109 (triangles), q129 (k-hop) and the q81/q97
    * cluster-label build all consume the same ~50-row artifact, and each
    * re-ran the whole shingle→inverted-index→pair pipeline (~1.7 s at
    * sf0.1) to produce it. Single-slot for the same reason as the label
    * cache: replacement frees the superseded checkpoint instead of pinning
    * one per rewrite. At 100 TB this is the edges TABLE the pipeline
    * persists once and every graph operator reads. */
  private var edgeSlot: Option[((Int, String), DataFrame)] = None

  private[operators] def jaccardEdges(s: SparkSession, dir: String): DataFrame =
    synchronized {
      val key = (System.identityHashCode(s),
        graft.Tables.fingerprint(s, s"$dir/documents.parquet"))
      edgeSlot match {
        case Some((k, df)) if k == key => df
        case prev =>
          val edges = jaccardPairs(s, dir)
            .select(col("doc_a"), col("doc_b"))
            .staged
          edgeSlot = Some((key, edges))
          prev.foreach { case ((h, _), old) =>
            if (h == System.identityHashCode(s) && !s.sparkContext.isStopped)
              try Staging.release(old) catch { case _: Exception => () }
          }
          edges
      }
    }

  val all: Seq[GraftQuery] = Seq(

    GraftQuery(
      "q38_dedup_exact",
      Some("""SELECT sha256(text) AS h, min(doc_id) AS doc_id, count(*) AS n_copies
             |FROM documents
             |GROUP BY sha256(text)
             |ORDER BY doc_id""".stripMargin),
      "Exact dedup = hash-groupBy: partial agg dedups map-side, the shuffle " +
        "carries one (hash, min_id, count) per distinct text per partition. " +
        "At 100 TB, group on the 256-bit digest (32 bytes) instead of the " +
        "full text so the exchange never moves document bodies."
    ) { (s, dir) =>
      Tables.documents(s, dir)
        .groupBy(sha2(col("text"), 256).as("h"))
        .agg(min("doc_id").as("doc_id"), count(lit(1)).as("n_copies"))
        .orderBy("doc_id")
    },

    GraftQuery(
      "q39_dedup_minhash_lsh",
      // approximate by design but fully deterministic — the oracle replays
      // the ENTIRE index in SQL: replayable shingle fps, the engine's own
      // 64 affine minhash params (interpolated), band folds, bucket cap,
      // in-bucket pairing and the signature-agreement score (q67's replay
      // pattern, VERDICT r4 item 1)
      Some(s"""$replayShinglePrologueSql, $minhashPairSqlCtes
              |SELECT doc_a, doc_b, est_jaccard_ppm FROM ap
              |ORDER BY doc_a, doc_b""".stripMargin),
      "MinHash+LSH: the 64-minimum signature is computed ROW-LOCALLY from " +
        "each doc's shingle array (scalar sketch expression — no explode, " +
        "no aggregation shuffle; the aggregate form remains for docs too " +
        "large to hold shingles per-row); 16 bands × 4 rows hashed to a " +
        "long band key. Candidates come from " +
        "grouping by (band, key) and expanding pairs inside each bucket — " +
        "the signature aggregation runs ONCE (a self-join would compute it " +
        "twice) and O(n²) never materializes. Hot buckets (ubiquitous " +
        "boilerplate) are BOUNDED before collection: a window count on the " +
        "band key (no extra exchange) drops buckets past MaxBucket=64, so " +
        "no agg buffer or pair expansion ever sees a degenerate bucket. " +
        "P[candidate|J=0.8]≈99.98%. The agreement score is emitted as exact " +
        "integer ppm (matches × 15625) — no float rounding at the oracle " +
        "boundary."
    ) { (s, dir) =>
      minhashPairs(s, dir).orderBy("doc_a", "doc_b")
    },

    GraftQuery(
      "q40_dedup_simhash",
      // deterministic replay oracle: per-(doc, bit) affine-threshold
      // majorities, block keys as bit sums, bucket cap, in-bucket pairing
      // and exact Hamming re-check — the same SQL mirror discipline as q39
      Some(s"$replayShinglePrologueSql, $simhashBandTailSql"),
      "SimHash: 8 bytes per doc total state, computed row-locally from the " +
        "shingle array (no explode, no agg shuffle); element bits come from " +
        "the affine-threshold family (replayable, and independent of the " +
        "fp value range). Pigeonhole banding (Manku et " +
        "al., WWW'07): 7 blocks over 64 bits, so any pair at Hamming ≤ 6 " +
        "agrees on ≥1 whole block — the band equi-join is an EXHAUSTIVE " +
        "candidate generator for the ≤6 threshold, then exact distance is " +
        "re-checked with bit_count(xor). Joins on (int, int) keys only."
    ) { (s, dir) =>
      simhashNearDupPairs(textSimhashSigs(s, dir))
    },

    GraftQuery(
      "q41_dedup_ngram_jaccard",
      Some("""WITH docs AS (
             |  SELECT doc_id, string_split(lower(text), ' ') w FROM documents
             |), sh0 AS (
             |  SELECT doc_id, unnest(list_distinct(list_transform(
             |           range(1, greatest(len(w)-1, 1)),
             |           i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))) s
             |  FROM docs
             |), sh AS (
             |  SELECT * FROM sh0
             |  QUALIFY count(*) OVER (PARTITION BY s) <= 64
             |), sizes AS (
             |  SELECT doc_id, count(*) n FROM sh GROUP BY doc_id
             |), pairs AS (
             |  SELECT a.doc_id doc_a, b.doc_id doc_b, count(*) c
             |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
             |  GROUP BY 1, 2
             |), scored AS (
             |  SELECT doc_a, doc_b, c*1.0/((sa.n + sb.n) - c) jac
             |  FROM pairs
             |  JOIN sizes sa ON sa.doc_id = doc_a
             |  JOIN sizes sb ON sb.doc_id = doc_b
             |)
             |SELECT doc_a, doc_b, round(jac, 4) AS jac
             |FROM scored WHERE jac >= 0.8
             |ORDER BY doc_a, doc_b""".stripMargin),
      "Exact n-gram Jaccard via inverted index: one scan computes per-doc " +
        "shingle counts (window over doc) and buckets docs by shingle; " +
        "|A∩B| is a count over in-bucket pairs and |A∪B| = |A|+|B|−|A∩B| — " +
        "no document-pair cross join and no re-scan for sizes. Shingles " +
        "with document frequency > MaxBucket=64 are dropped before " +
        "collection (stopword-shingle cutoff, mirrored in the oracle) and " +
        "sizes count post-cutoff, so degenerate corpora cannot produce a " +
        "quadratic bucket. At 100 TB add prefix filtering (join only each " +
        "doc's rarest-k shingles); plan shape unchanged."
    ) { (s, dir) => jaccardPairs(s, dir).orderBy("doc_a", "doc_b") },

    GraftQuery(
      "q42_dedup_embedding_cosine",
      Some("""WITH e AS (
             |  SELECT vec_id, embedding::DOUBLE[] v FROM embeddings
             |), n AS (
             |  SELECT vec_id, v,
             |         sqrt(list_reduce(list_transform(v, x -> x*x), (a,b) -> a+b)) nrm
             |  FROM e
             |), pairs AS (
             |  SELECT a.vec_id vec_a, b.vec_id vec_b,
             |         list_reduce(list_transform(range(1, len(a.v)+1),
             |                                    i -> a.v[i] * b.v[i]),
             |                     (x,y) -> x+y) / (a.nrm * b.nrm) c
             |  FROM n a JOIN n b ON a.vec_id < b.vec_id
             |)
             |SELECT vec_a, vec_b, round(c, 4) AS cos
             |FROM pairs WHERE c >= 0.35
             |ORDER BY vec_a, vec_b""".stripMargin),
      "Embedding near-dup by cosine threshold, EXACT, via a tiled block-pair " +
        "equi-join (the DIMSUM/matrix-tile shape): vectors hash into B " +
        "blocks, each vector is replicated into its row of B(B+1)/2 tiles " +
        "(uniform B+1 copies/vector), and tiles meet in a shuffle equi-join " +
        "on (tile_a, tile_b) — no BroadcastNestedLoopJoin, no driver-side " +
        "cross product, per-task memory bounded by one tile pair. The O(n²) " +
        "COMPUTE is inherent to the semantics: this corpus's pair-cosine " +
        "spectrum is continuous through the threshold (closest pairs at " +
        "0.34996 vs 0.35004, nothing above 0.52), so no LSH parameterization " +
        "can be exhaustive at θ=acos(0.35)≈69.5° (per-hyperplane agreement " +
        "0.614 ⇒ exhaustive banding ≈ all pairs). B scales linearly with n " +
        "(constant ~256-vector blocks, sized from parquet footers — no " +
        "count job) so tile-pair input and per-task memory stay bounded at " +
        "any corpus size; for sub-quadratic cost relax to the approximate " +
        "contract (q44's LSH buckets + multi-probe) — the engine offers " +
        "both, with the trade-off explicit rather than hidden."
    ) { (s, dir) =>
      import graft.functions.VectorFunctions.dotd
      // Constant-size blocks (~256 vectors) ⇒ B ∝ n: tile-pair input is
      // ≤512 vectors (~256 KB at 64 dims) no matter the corpus, and the
      // B(B+1)/2 join keys grow with the O(n²) work so AQE always has
      // grain to balance. Row count comes from parquet footers — plan
      // construction must never launch a job.
      val BlockRows = 256L
      val nVecs = Tables.parquetRowCount(s, dir, "embeddings")
      val B = math.min(1024L, math.max(1L, (nVecs + BlockRows - 1) / BlockRows)).toInt
      val e = Tables.embeddings(s, dir)
        .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("v"))
        .withColumn("nrm", sqrt(dotd(col("v"), col("v"))))
        .withColumn("blk", pmod(xxhash64(col("vec_id")), lit(B)).cast("int"))
      // A vector in block k serves as the left operand of tiles (k, j≥k) and
      // the right operand of tiles (i≤k, k): exactly B+1 copies per vector.
      val aSide = e.withColumn("tb", explode(sequence(col("blk"), lit(B - 1))))
        .select(col("blk").as("ta"), col("tb"),
          col("vec_id").as("id_a"), col("v").as("va"), col("nrm").as("na"))
      val bSide = e.withColumn("ta", explode(sequence(lit(0), col("blk"))))
        .select(col("ta"), col("blk").as("tb"),
          col("vec_id").as("id_b"), col("v").as("vb"), col("nrm").as("nb"))
      aSide.join(bSide, Seq("ta", "tb"))
        // cross tiles see each unordered pair once; diagonal tiles need the
        // id ordering to halve their self-product (and drop self-pairs)
        .filter(col("ta") =!= col("tb") || col("id_a") < col("id_b"))
        .select(least(col("id_a"), col("id_b")).as("vec_a"),
          greatest(col("id_a"), col("id_b")).as("vec_b"),
          (dotd(col("va"), col("vb")) / (col("na") * col("nb"))).as("c"))
        .filter(col("c") >= 0.35)
        .select(col("vec_a"), col("vec_b"), round(col("c"), 4).as("cos"))
        .orderBy("vec_a", "vec_b")
    },

    GraftQuery(
      "q67_dedup_embedding_lsh",
      // approximate by design but fully deterministic — the oracle replays
      // the whole index (codes from the embedded sign matrix, Hamming≤1
      // probes, bucket-size guard, in-bucket pairing, exact re-check) in
      // SQL, sharing q44's replay prologue
      Some(s"""${SimilarityQueries.lshReplayPrologue}, $lshPairSqlCtes
              |SELECT vec_a, vec_b, round(c, 4) AS cos FROM lsc
              |ORDER BY vec_a, vec_b""".stripMargin),
      "Sub-quadratic embedding near-dup: sign-LSH buckets (4 tables × " +
        "8-bit hyperplane codes, all Hamming≤1 probe codes emitted per " +
        "vector) generate candidates in an equi-join on (table, code); " +
        "exact cosine re-checks every candidate, so precision is 1 and " +
        "only recall is traded. Candidate volume is Σ bucket-pair sizes — " +
        "never O(n²) — which is THE scale path for q42's semantics when " +
        "the corpus outgrows tiling. LSH recall concentrates where " +
        "similarity is high (true near-dups ≥0.9 collide almost surely; " +
        "this corpus's threshold-straddling pairs at cos≈0.35 are the " +
        "hard case), so the spec pins recall on comfortably-above-" +
        "threshold pairs. Bucket-size cap as in q39."
    ) { (s, dir) =>
      lshNearDupPairsFrom(normVecs(s, dir),
        SimilarityQueries.codeBits(Tables.parquetRowCount(s, dir, "embeddings")))
        .orderBy("vec_a", "vec_b")
    },

    GraftQuery(
      "q114_span_dedup",
      Some("""WITH toks AS (
             |  SELECT doc_id, string_split(text, ' ') AS w FROM documents
             |), chunks AS (
             |  SELECT doc_id, i AS chunk_idx,
             |         array_to_string(w[i * 4 + 1 : i * 4 + 4], ' ') AS chunk
             |  FROM toks, unnest(range(0, CAST(ceil(len(w) / 4.0) AS BIGINT))) AS t(i)
             |), ranked AS (
             |  SELECT doc_id, chunk_idx,
             |         row_number() OVER (PARTITION BY chunk
             |                            ORDER BY doc_id, chunk_idx) AS rn
             |  FROM chunks
             |)
             |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans,
             |       CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
             |FROM ranked GROUP BY doc_id
             |ORDER BY doc_id""".stripMargin),
      "Exact span-level dedup (the exact-substring dedup of Lee et al. " +
        "2022 at span granularity, C4's sentence dedup generalized): each " +
        "document tiles into fixed 4-token spans and only the globally " +
        "FIRST occurrence of each span — first by (doc_id, offset), the " +
        "deterministic keeper rule every re-run reproduces — survives; " +
        "the output audits kept vs total spans per document. The span " +
        "width is corpus-calibrated (4 tokens collides meaningfully on " +
        "this ~40-word vocabulary; web corpora use 50). One shuffle, " +
        "keyed by the span: duplicate groups are tiny (bounded by dup " +
        "count), so the per-group row_number never sees skew. At 100 TB " +
        "the shuffle must carry (xxhash64(span), doc_id, offset) — 24 " +
        "bytes — not the span text; the hash stands in for the string " +
        "with collision risk 2^-64·pairs, and a length+first-token " +
        "residual check catches the paranoid case. The oracle keeps the " +
        "string key (DuckDB has no xxhash64) — same groups, same answer."
    ) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val spans = Tables.documents(s, dir)
        .select(col("doc_id"), split(col("text"), " ").as("w"))
        .select(col("doc_id"),
          explode(sequence(lit(0),
            ceil(size(col("w")) / 4.0).cast("int") - 1)).as("chunk_idx"),
          col("w"))
        .select(col("doc_id"), col("chunk_idx"),
          concat_ws(" ", slice(col("w"), col("chunk_idx") * 4 + 1, lit(4))).as("chunk"))
      spans
        .withColumn("rn", row_number().over(
          Window.partitionBy("chunk").orderBy("doc_id", "chunk_idx")))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_spans"),
          sum(when(col("rn") === 1, 1L).otherwise(0L)).as("n_kept"))
        .orderBy("doc_id")
    },

    GraftQuery(
      "q160_incremental_dedup",
      Some(s"""WITH d AS (
             |  -- canonical content address: digest of the first 8 lowercased
             |  -- words (lead fingerprint), so re-crawls that differ only in
             |  -- tails/boilerplate still collide — the corpus has no
             |  -- byte-identical cross-doc texts, exactly like a real crawl
             |  -- after trafilatura; full-digest incremental dedup is q38+q96
             |  SELECT doc_id, source, $leadFingerprintSql AS h
             |  FROM documents
             |), idx AS (
             |  SELECT DISTINCT h FROM d WHERE doc_id % 10 < 8
             |), batch AS (
             |  SELECT doc_id, source, h,
             |         row_number() OVER (PARTITION BY h ORDER BY doc_id) AS rn
             |  FROM d WHERE doc_id % 10 >= 8
             |), tagged AS (
             |  SELECT b.source, b.rn,
             |         CASE WHEN i.h IS NOT NULL THEN 1 ELSE 0 END AS hit
             |  FROM batch b LEFT JOIN idx i ON b.h = i.h
             |)
             |SELECT source,
             |       CAST(count(*) AS BIGINT) AS n_batch,
             |       CAST(sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT)
             |         AS n_batch_dupes,
             |       CAST(sum(CASE WHEN rn = 1 AND hit = 1 THEN 1 ELSE 0 END)
             |            AS BIGINT) AS n_index_dupes,
             |       CAST(sum(CASE WHEN rn = 1 AND hit = 0 THEN 1 ELSE 0 END)
             |            AS BIGINT) AS n_admitted
             |FROM tagged GROUP BY source
             |ORDER BY source""".stripMargin),
      "Incremental dedup — the production shape of q38: a NEW batch of " +
        "arrivals (doc_id%10>=8 here) dedups against ITSELF (first-id " +
        "wins inside the batch) and then against the EXISTING corpus " +
        "index (distinct digests of the other 80%), without ever " +
        "re-scanning old document bodies. Both sides of the check are " +
        "32-byte digests, so the anti-join exchange moves digests, " +
        "never text. At 100 TB the index is a digest-only table kept " +
        "sorted/bucketed by digest; a bloom filter built from it " +
        "(q96/q108's pattern) map-side-drops the ~all-novel majority " +
        "so the equi-join only sees probable hits, and the in-batch " +
        "window partitions by digest — per-key, no global sort. The " +
        "per-source admit/reject audit is the report a crawl ingest " +
        "pipeline emits every cycle."
    ) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val d = Tables.documents(s, dir)
        .select(col("doc_id"), col("source"), leadFingerprint.as("h"))
      val idx = d.filter(col("doc_id") % 10 < 8).select("h").distinct()
      val batch = d.filter(col("doc_id") % 10 >= 8)
        .withColumn("rn",
          row_number().over(Window.partitionBy("h").orderBy("doc_id")))
      batch.join(idx.withColumn("hit", lit(1L)), Seq("h"), "left")
        .select(col("source"), col("rn"), coalesce(col("hit"), lit(0L)).as("hit"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_batch"),
          sum(when(col("rn") > 1, 1L).otherwise(0L)).as("n_batch_dupes"),
          sum(when(col("rn") === 1 && col("hit") === 1L, 1L).otherwise(0L))
            .as("n_index_dupes"),
          sum(when(col("rn") === 1 && col("hit") === 0L, 1L).otherwise(0L))
            .as("n_admitted"))
        .orderBy("source")
    },

    GraftQuery(
      "q161_source_overlap",
      Some(s"""WITH ds AS (
             |  -- same canonical lead fingerprint as q160: overlap between
             |  -- sources is near-dup republication, not byte-identity
             |  SELECT DISTINCT $leadFingerprintSql AS h, source
             |  FROM documents
             |), per AS (
             |  SELECT source, CAST(count(*) AS BIGINT) AS n FROM ds GROUP BY source
             |), pairs AS (
             |  SELECT a.source AS source_a, b.source AS source_b,
             |         CAST(count(*) AS BIGINT) AS n_shared
             |  FROM ds a JOIN ds b ON a.h = b.h AND a.source < b.source
             |  GROUP BY a.source, b.source
             |)
             |SELECT p.source_a, p.source_b, p.n_shared,
             |       pa.n AS n_a, pb.n AS n_b,
             |       CAST(p.n_shared * 1000000
             |              // (pa.n + pb.n - p.n_shared) AS BIGINT)
             |         AS jaccard_ppm
             |FROM pairs p
             |JOIN per pa ON p.source_a = pa.source
             |JOIN per pb ON p.source_b = pb.source
             |ORDER BY source_a, source_b""".stripMargin),
      "Cross-source duplication matrix — which crawl sources republish " +
        "the same content (mirror detection, licensing audits, and the " +
        "'is this new dump just a re-crawl' question): distinct " +
        "(digest, source) pairs self-join on digest with source_a < " +
        "source_b, yielding shared-content counts and exact Jaccard " +
        "overlap in ppm per source pair. The join key is the 32-byte " +
        "digest; per-digest fan-out is bounded by the source count " +
        "(not corpus size), so the pair explosion is |digests " +
        "shared| × O(|sources|²) worst case — with thousands of " +
        "sources, pre-aggregate to per-digest source bitmaps (q131's " +
        "bitmap pattern) and intersect those instead. One digest " +
        "dedup shuffle + one equi-join; document bodies never move."
    ) { (s, dir) =>
      val ds = Tables.documents(s, dir)
        .select(leadFingerprint.as("h"), col("source")).distinct()
      val per = ds.groupBy("source").agg(count(lit(1)).as("n"))
      val pairs = ds.as("a")
        .join(ds.as("b"),
          col("a.h") === col("b.h") && col("a.source") < col("b.source"))
        .groupBy(col("a.source").as("source_a"), col("b.source").as("source_b"))
        .agg(count(lit(1)).as("n_shared"))
      pairs
        .join(per.select(col("source").as("source_a"), col("n").as("n_a")),
          "source_a")
        .join(per.select(col("source").as("source_b"), col("n").as("n_b")),
          "source_b")
        .select(col("source_a"), col("source_b"), col("n_shared"),
          col("n_a"), col("n_b"),
          expr("n_shared * 1000000 div (n_a + n_b - n_shared)")
            .as("jaccard_ppm"))
        .orderBy("source_a", "source_b")
    },

    GraftQuery(
      "q169_dedup_keep_best",
      Some(s"""WITH d AS (
             |  SELECT doc_id, $leadFingerprintSql AS h,
             |         CAST(len(string_split(text, ' ')) AS BIGINT) AS tok
             |  FROM documents
             |), r AS (
             |  SELECT *, row_number() OVER (PARTITION BY h
             |              ORDER BY tok DESC, doc_id) AS rn,
             |         CAST(count(*) OVER (PARTITION BY h) AS BIGINT)
             |           AS n_members,
             |         CAST(sum(tok) OVER (PARTITION BY h) AS BIGINT) AS grp_tok
             |  FROM d
             |)
             |SELECT h, n_members,
             |       doc_id AS kept_doc_id,
             |       tok AS kept_tokens,
             |       CAST(grp_tok - tok AS BIGINT) AS dropped_tokens
             |FROM r WHERE rn = 1 AND n_members > 1
             |ORDER BY h""".stripMargin),
      "Keep-best dedup — q38/q160 keep the FIRST duplicate; production " +
        "keeps the BEST one (near-dup groups usually contain one full " +
        "article and several truncated mirrors): group by the canonical " +
        "lead fingerprint, rank members by token count (richest copy " +
        "first, doc_id tie-break), keep rank 1 and account the dropped " +
        "mass. One window over the digest partition — per-key sort, " +
        "never global, and the digest (32 bytes) is the only wide thing " +
        "shuffled. Swap `tok` for any quality score (q46's gates, model " +
        "perplexity) without touching the plan shape. At 100 TB this is " +
        "the same single exchange as q38 with a richer keeper rule."
    ) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val d = Tables.documents(s, dir)
        .select(col("doc_id"), leadFingerprint.as("h"),
          size(split(col("text"), " ")).cast("long").as("tok"))
      val byH = Window.partitionBy("h")
      d.withColumn("rn",
        row_number().over(byH.orderBy(col("tok").desc, col("doc_id"))))
        .withColumn("n_members", count(lit(1)).over(byH))
        .withColumn("grp_tok", sum("tok").over(byH))
        .filter(col("rn") === 1 && col("n_members") > 1)
        .select(col("h"), col("n_members"),
          col("doc_id").as("kept_doc_id"), col("tok").as("kept_tokens"),
          (col("grp_tok") - col("tok")).as("dropped_tokens"))
        .orderBy("h")
    },

    GraftQuery(
      "q261_minhash_recall_eval",
      Some(s"""$replayShinglePrologueSql, $minhashPairSqlCtes,
              |${minhashScoreboardSqlTail(None)}""".stripMargin),
      "Recall scoreboard for the MinHash-LSH dedup index — the q246 " +
        "treatment applied to the near-dup surface: ground truth is EXACT " +
        "Jaccard ≥ 0.5 over the index's OWN shingle-fingerprint universe " +
        "(grading banding + bucket cap + 64-sample estimation, not the " +
        "tokenizer), computed for a deterministic 20% document panel " +
        "through the inverted shingle index (panel-side shingles join " +
        "corpus shingles on fp — the integer predicate 2·∩ ≥ |A|+|B|−∩ is " +
        "J ≥ ½ with no division), and the graded set is the very q39 " +
        "pair set the engine ships. recall_ppm says how much the banded " +
        "index loses; worst_miss_ppm says how STRONG the strongest missed " +
        "pair was — a high worst-miss means real duplicates slip through " +
        "(raise bands or the bucket cap), misses only near 500000 ppm " +
        "mean only borderline pairs fray, which is what the " +
        "P[candidate|J] curve predicts. Scale: the exact side is priced " +
        "by the panel (its cost is Σ_s freq_panel·freq_corpus, the " +
        "inverted-index bound), and that bound is ENFORCED: shingles " +
        "with corpus df past GtBucketCap=4096 are excluded from the " +
        "ground-truth universe (q41's informative-shingle discipline, " +
        "sizes recomputed consistently) with the exclusion reported per " +
        "panel doc as gt_excluded_fps — 0 on this corpus (max df ≈ 25), " +
        "never silent on a boilerplate-saturated one. At 100 TB the " +
        "panel is a fixed absolute sample and this runs nightly beside " +
        "the ANN scoreboards — same posture, different index."
    ) { (s, dir) => minhashScoreboard(s, dir) },

    GraftQuery(
      "q272_minhash_recall_eval_abs",
      Some(s"""$replayShinglePrologueSql, $minhashPairSqlCtes,
              |${minhashScoreboardSqlTail(Some(AbsPanelIdCap))}""".stripMargin),
      "q261's recall scoreboard at the FIXED ABSOLUTE panel — the " +
        "q270/q271 treatment applied to the near-dup eval family's last " +
        "share-based panel: q261's exact side is the inverted-index bound " +
        "Σ_s df_panel·df_corpus, and with a 20% SHARE panel both factors " +
        "grow with the corpus (measured 10.1× at 10× data on the " +
        "closed-vocab synthetic corpus, SCALE.md); pinning the panel at " +
        "the first 64 panel ids (doc_id % 5 = 0 AND doc_id < 320) fixes " +
        "df_panel, so the ground-truth pass is LINEAR in corpus df mass " +
        "and the scoreboard runs nightly at any scale. Same bounded " +
        "ground truth (GtBucketCap df cutoff, gt_excluded_fps " +
        "accounting), same grading against the very q39 pair set the " +
        "engine ships, same worst_miss_ppm diagnostic; panel recall " +
        "estimates the share-based reading, and the scoreboards agree " +
        "row-for-row on the shared panel (SketchSpec pins it). With " +
        "q272 every scoreboard/dial whose exact side grows faster than " +
        "the corpus ships its fixed-panel production form: q270 (q264), " +
        "q271 (q268), q272 (q261)."
    ) { (s, dir) =>
      minhashScoreboard(s, dir, panelIdCap = Some(AbsPanelIdCap))
    },

    GraftQuery(
      "q273_minhash_cap_dial",
      Some(s"""$replayShinglePrologueSql, $minhashPairSqlCtes,
              |${minhashCapDialSqlTail(None)}""".stripMargin),
      "Bucket-cap dial for the MinHash-LSH index — q265's calibration " +
        "discipline applied to the last uncalibrated operating parameter, " +
        "completing the dial matrix: IVF probes (q251), SimHash caps " +
        "(q265/q266), LSH tables (q268), MinHash cap (here). q261 PRICES " +
        "the shipped cap's recall loss; this dial SETS the cap, sweeping " +
        "16/32/64/128 against q261's own ground truth (exact Jaccard ≥ ½ " +
        "over the df-bounded shingle-fp universe) and emitting the " +
        "minimal cap meeting the 900000 ppm floor. One shared pass " +
        "serves all caps: each exact pair carries its smallest shared " +
        "band-bucket size (survives cap c iff ≤ c) AND its 64-sample " +
        "signature-agreement verdict (est-J ≥ ½, q39's cut — " +
        "cap-independent estimation error the SimHash dials don't have, " +
        "because their re-check IS their ground-truth criterion); " +
        "including it makes the cap-64 row reproduce q261's aggregate " +
        "micro recall exactly (SketchSpec identity pin). Both " +
        "ground-truth bounds are explicit per row: gt_dropped " +
        "(band-bucket slots past GtBucketCap) and gt_excluded_fps " +
        "(df-cutoff shingle slots) — the dial survives the saturation it " +
        "measures. At 100 TB this runs beside the nightly q261 over the " +
        "same panel; the chosen cap feeds minhashNearDupCalibrated " +
        "(ApproxSpec closes the loop)."
    ) { (s, dir) => minhashCapDial(s, dir) },

    GraftQuery(
      "q274_minhash_cap_dial_abs",
      Some(s"""$replayShinglePrologueSql, $minhashPairSqlCtes,
              |${minhashCapDialSqlTail(Some(AbsPanelIdCap))}""".stripMargin),
      "q273's cap dial at the fixed absolute panel — the calibration a " +
        "production fleet actually schedules: the dial's exact side " +
        "inherits q272's linear-in-corpus-df bound instead of q273's " +
        "share-based inverted-index product, so cap recalibration stays " +
        "a nightly pass at any corpus size. Same one-pass min_bsz + " +
        "est_ok grading, same floor, same minimal-cap choice rule, same " +
        "explicit gt_dropped/gt_excluded_fps accounting; with q274 every " +
        "dial in the matrix has a fixed-panel production form (q251's " +
        "panel is already query-traffic-sized; q271 covers tables; here " +
        "the cap)."
    ) { (s, dir) =>
      minhashCapDial(s, dir, panelIdCap = Some(AbsPanelIdCap))
    },

    GraftQuery(
      "q262_simhash_recall_eval",
      Some(s"""$replayShinglePrologueSql, $simhashBandPairCtes,
              |$simhashScoreboardSqlTail""".stripMargin),
      "Recall scoreboard for the token-shingle SimHash index — q261's " +
        "treatment applied to q40: ground truth is the deterministic 20% " +
        "panel's FULL-64-bit-signature Hamming ≤ 6 against the corpus " +
        "(the index's own contract), graded against the banded pair set " +
        "q40 ships. The exact side needs no brute pass: 7-block banding " +
        "is pigeonhole-EXHAUSTIVE at Hamming ≤ 6, so the UNCAPPED band " +
        "equi-join (panel keys × corpus keys, before the bucket cut) is " +
        "complete ground truth at inverted-index cost. That also means " +
        "every miss here has exactly one cause: the pair sat only in " +
        "buckets past the 64-member cap — miss_min_hamming (NULL when " +
        "nothing is missed) says how strong the strongest dropped pair " +
        "was, and a small value is the signal to raise the cap or add " +
        "bands. Scale: exact-side cost is Σ_key freq_panel·freq_corpus " +
        "over 8-byte sigs (q261's inverted-index bound, signatures never " +
        "shingle sets) — and bounded: the corpus side of the ground-truth " +
        "join keeps only the first GtBucketCap=4096 members per band " +
        "bucket, with the unexamined slots reported per panel doc as " +
        "gt_dropped (0 on this corpus; explicit, never silent, when a " +
        "pathologically saturated corpus would otherwise turn this pass " +
        "quadratic). The scoreboard join carries id pairs only, and " +
        "at 100 TB this runs nightly beside q261 over the same panel."
    ) { (s, dir) =>
      // ONE signature walk: the scoreboard's ground-truth side and the
      // graded pair set both read the staged frame
      val sigs = Staging.stage(textSimhashSigs(s, dir))
      simhashScoreboard(sigs, simhashNearDupPairsUnsorted(sigs))
    },

    GraftQuery(
      "q264_embedding_recall_eval",
      Some(s"""${SimilarityQueries.lshReplayPrologue}, $lshPairSqlCtes,
              |pex AS (
              |  SELECT pa, pd, c FROM (
              |    SELECT p.vec_id AS pa, a.vec_id AS pd,
              |           list_reduce(list_transform(range(1, 65),
              |                                      i -> p.v[i] * a.v[i]),
              |                       (x,y) -> x+y) / (p.nrm * a.nrm) AS c
              |    FROM n p JOIN n a ON a.vec_id <> p.vec_id
              |    WHERE p.vec_id % 5 = 0
              |  ) WHERE c >= CAST(0.35 AS DOUBLE)
              |), aps AS (
              |  SELECT vec_a AS a, vec_b AS b FROM lsc
              |  UNION ALL
              |  SELECT vec_b, vec_a FROM lsc
              |)
              |SELECT pa AS panel_vec,
              |       CAST(count(*) AS BIGINT) AS exact_cnt,
              |       CAST(count(h.a) AS BIGINT) AS hits,
              |       CAST(count(h.a) * 1000000 // count(*) AS BIGINT)
              |         AS recall_ppm,
              |       max(CASE WHEN h.a IS NULL THEN round(c, 4) END)
              |         AS miss_max_cos
              |FROM pex
              |LEFT JOIN aps h ON h.a = pex.pa AND h.b = pex.pd
              |GROUP BY pa ORDER BY pa""".stripMargin),
      "Recall scoreboard for the sign-LSH embedding near-dup index — the " +
        "q261/q262 treatment applied to q67, completing per-index recall " +
        "coverage of every approximate near-dup family: ground truth is " +
        "the deterministic 20% panel's exact cosine ≥ 0.35 partners " +
        "(q42's own contract), computed through q42's tile equi-join " +
        "restricted to panel × corpus, graded against the capped banded " +
        "pair set q67 ships. Unlike the pigeonhole scoreboards (whose " +
        "banding is exhaustive, so every miss is the bucket cap's), LSH " +
        "misses have TWO causes a fleet must tell apart, and " +
        "miss_max_cos does: near 1.0 = cap saturation dropping true " +
        "near-dups (raise the cap), near 0.35 = threshold-straddlers " +
        "outside the probe radius (the documented hard case — add " +
        "tables, not cap). Scale: exact side is O(panel·n) dot products " +
        "by the semantics' own q42 contract (run on a panel SAMPLE, " +
        "nightly); the grading join carries id pairs only."
    ) { (s, dir) =>
      val e = normVecs(s, dir)
      val n = Tables.parquetRowCount(s, dir, "embeddings")
      embeddingScoreboard(e,
        lshNearDupPairsFrom(e, SimilarityQueries.codeBits(n)), n)
    },

    GraftQuery(
      "q265_bucket_cap_dial",
      Some(s"""$replayShinglePrologueSql, $simhashBandPairCtes,
              |$capDialSqlTail""".stripMargin),
      "Bucket-cap dial for the token-shingle SimHash index — q251's " +
        "calibration discipline applied to the near-dup family's " +
        "operating parameter: q262 PRICES the shipped cap's recall loss, " +
        "this dial SETS the cap, sweeping 16/32/64/128 and choosing the " +
        "minimal one whose panel recall (full-signature Hamming ≤ 6 " +
        "ground truth, q262's exhaustive uncapped-banding exact side) " +
        "meets the 900000 ppm floor — a looser cap than needed " +
        "quadratically inflates the worst bucket's pair expansion, a " +
        "tighter one silently drops true near-dups, and this emits the " +
        "knee. One shared pass serves all caps: each exact pair carries " +
        "the size of its SMALLEST shared bucket, and it survives cap c " +
        "iff that size ≤ c, so per-cap scoreboards are conditional sums " +
        "over one per-pair frame — the index is never re-run per cap. " +
        "The ground-truth join itself is bounded at GtBucketCap=4096 " +
        "per bucket with the unexamined slots reported in gt_dropped " +
        "(0 here) — the dial survives the very saturation it measures. " +
        "At 100 TB this runs beside the nightly q262 over the same " +
        "panel, and the chosen cap feeds the pair builder's cap " +
        "parameter instead of the MaxBucket constant (ApproxSpec closes " +
        "that loop)."
    ) { (s, dir) => bucketCapDial(textSimhashSigs(s, dir)) },

    GraftQuery(
      "q268_lsh_table_dial",
      Some(s"""${SimilarityQueries.lshReplayPrologue}, $lshPairSqlCtes,
              |pc AS (
              |  SELECT p1.vec_id AS pa, p2.vec_id AS pd, min(p1.tbl) AS min_tbl
              |  FROM bounded p1 JOIN bounded p2 USING (tbl, code)
              |  WHERE p1.vec_id % 5 = 0 AND p2.vec_id <> p1.vec_id
              |  GROUP BY 1, 2
              |), pex AS (
              |  SELECT pa, pd FROM (
              |    SELECT p.vec_id AS pa, a.vec_id AS pd,
              |           list_reduce(list_transform(range(1, 65),
              |                                      i -> p.v[i] * a.v[i]),
              |                       (x,y) -> x+y) / (p.nrm * a.nrm) AS c
              |    FROM n p JOIN n a ON a.vec_id <> p.vec_id
              |    WHERE p.vec_id % 5 = 0
              |  ) WHERE c >= CAST(0.35 AS DOUBLE)
              |), j AS (
              |  SELECT pex.pa, pex.pd, pc.min_tbl
              |  FROM pex LEFT JOIN pc ON pc.pa = pex.pa AND pc.pd = pex.pd
              |), ts(t) AS (VALUES (1::BIGINT), (2), (3), (4)),
              |g AS (
              |  SELECT t, CAST(count(j.pa) AS BIGINT) AS exact_cnt,
              |         CAST(count(CASE WHEN j.min_tbl < t THEN 1 END) AS BIGINT)
              |           AS hits
              |  FROM ts LEFT JOIN j ON TRUE
              |  GROUP BY t
              |)
              |SELECT t AS tables, exact_cnt, hits,
              |       CAST(coalesce(hits * 1000000 // nullif(exact_cnt, 0), 0)
              |            AS BIGINT) AS recall_ppm,
              |       coalesce(hits * 1000000 // nullif(exact_cnt, 0), 0)
              |         >= $LshTableFloorPpm AS meets_floor,
              |       t = coalesce(
              |         min(CASE WHEN coalesce(hits * 1000000
              |                                // nullif(exact_cnt, 0), 0)
              |                       >= $LshTableFloorPpm THEN t END) OVER (),
              |         max(t) OVER ()) AS chosen
              |FROM g ORDER BY tables""".stripMargin),
      "LSH table dial — the calibration q264's diagnostic points at: " +
        "misses near the threshold mean pairs fall outside the probe " +
        "radius, and the fix is MORE TABLES (independent hyperplane " +
        "draws whose collision chance compounds), not a larger cap. " +
        "Tables are the index's LINEAR cost knob — build size, probe " +
        "work and bucket state all scale with t — so the dial sweeps " +
        "t = 1..4 against the panel's exact cosine ≥ 0.35 partners and " +
        "emits the minimal count meeting the 500000 ppm floor. One " +
        "shared pass serves every sweep point: each exact pair carries " +
        "the smallest table index where it collides through the bounded " +
        "probe buckets, and t tables find it iff that index < t — the " +
        "q251/q265 threshold trick with tables as the dimension. " +
        "Completing the dial family, every approximate index now " +
        "calibrates each of its operating parameters from its own " +
        "scoreboard: IVF probes (q251), SimHash caps (q265/q266), LSH " +
        "tables (here). At 100 TB this runs nightly beside q264 on the " +
        "same panel; the chosen t feeds the pair builder's tables " +
        "parameter (calibratedLshTables closes the loop)."
    ) { (s, dir) =>
      val n = Tables.parquetRowCount(s, dir, "embeddings")
      lshTableDial(normVecs(s, dir), SimilarityQueries.codeBits(n), n)
    },

    GraftQuery(
      "q270_embedding_recall_eval_abs",
      Some(s"""${SimilarityQueries.lshReplayPrologue}, $lshPairSqlCtes,
              |pex AS (
              |  SELECT pa, pd, c FROM (
              |    SELECT p.vec_id AS pa, a.vec_id AS pd,
              |           list_reduce(list_transform(range(1, 65),
              |                                      i -> p.v[i] * a.v[i]),
              |                       (x,y) -> x+y) / (p.nrm * a.nrm) AS c
              |    FROM n p JOIN n a ON a.vec_id <> p.vec_id
              |    WHERE p.vec_id % 5 = 0 AND p.vec_id < $AbsPanelIdCap
              |  ) WHERE c >= CAST(0.35 AS DOUBLE)
              |), aps AS (
              |  SELECT vec_a AS a, vec_b AS b FROM lsc
              |  UNION ALL
              |  SELECT vec_b, vec_a FROM lsc
              |)
              |SELECT pa AS panel_vec,
              |       CAST(count(*) AS BIGINT) AS exact_cnt,
              |       CAST(count(h.a) AS BIGINT) AS hits,
              |       CAST(count(h.a) * 1000000 // count(*) AS BIGINT)
              |         AS recall_ppm,
              |       max(CASE WHEN h.a IS NULL THEN round(c, 4) END)
              |         AS miss_max_cos
              |FROM pex
              |LEFT JOIN aps h ON h.a = pex.pa AND h.b = pex.pd
              |GROUP BY pa ORDER BY pa""".stripMargin),
      "q264's recall scoreboard at the FIXED ABSOLUTE panel — the 100 TB " +
        "form shipped as a first-class sibling (the q141b/q239b pattern " +
        "applied to the eval family): q264's exact side prices " +
        "panel_share × corpus cosine work, O(0.2·n²) as the corpus " +
        "grows, which is an offline calibration posture; this form pins " +
        "the panel at the first 64 panel ids (vec_id % 5 = 0 AND " +
        "vec_id < 320), so the ground-truth pass is O(64·n) — LINEAR in " +
        "the corpus — and the scoreboard runs nightly at any scale. " +
        "Same tile discipline, same grading join against the very q67 " +
        "pair set the engine ships, same miss_max_cos diagnostic; the " +
        "measured growth split is in SCALE.md (share-based 20.4× vs " +
        "corpus-linear at 10×). Panel recall is an estimator of the " +
        "share-based reading — ApproxSpec pins the two scoreboards " +
        "agree exactly on the shared panel rows."
    ) { (s, dir) =>
      val e = normVecs(s, dir)
      val n = Tables.parquetRowCount(s, dir, "embeddings")
      embeddingScoreboard(e,
        lshNearDupPairsFrom(e, SimilarityQueries.codeBits(n)), n,
        panelIdCap = Some(AbsPanelIdCap))
    },

    GraftQuery(
      "q271_lsh_table_dial_abs",
      Some(s"""${SimilarityQueries.lshReplayPrologue}, $lshPairSqlCtes,
              |pc AS (
              |  SELECT p1.vec_id AS pa, p2.vec_id AS pd, min(p1.tbl) AS min_tbl
              |  FROM bounded p1 JOIN bounded p2 USING (tbl, code)
              |  WHERE p1.vec_id % 5 = 0 AND p1.vec_id < $AbsPanelIdCap
              |    AND p2.vec_id <> p1.vec_id
              |  GROUP BY 1, 2
              |), pex AS (
              |  SELECT pa, pd FROM (
              |    SELECT p.vec_id AS pa, a.vec_id AS pd,
              |           list_reduce(list_transform(range(1, 65),
              |                                      i -> p.v[i] * a.v[i]),
              |                       (x,y) -> x+y) / (p.nrm * a.nrm) AS c
              |    FROM n p JOIN n a ON a.vec_id <> p.vec_id
              |    WHERE p.vec_id % 5 = 0 AND p.vec_id < $AbsPanelIdCap
              |  ) WHERE c >= CAST(0.35 AS DOUBLE)
              |), j AS (
              |  SELECT pex.pa, pex.pd, pc.min_tbl
              |  FROM pex LEFT JOIN pc ON pc.pa = pex.pa AND pc.pd = pex.pd
              |), ts(t) AS (VALUES (1::BIGINT), (2), (3), (4)),
              |g AS (
              |  SELECT t, CAST(count(j.pa) AS BIGINT) AS exact_cnt,
              |         CAST(count(CASE WHEN j.min_tbl < t THEN 1 END) AS BIGINT)
              |           AS hits
              |  FROM ts LEFT JOIN j ON TRUE
              |  GROUP BY t
              |)
              |SELECT t AS tables, exact_cnt, hits,
              |       CAST(coalesce(hits * 1000000 // nullif(exact_cnt, 0), 0)
              |            AS BIGINT) AS recall_ppm,
              |       coalesce(hits * 1000000 // nullif(exact_cnt, 0), 0)
              |         >= $LshTableFloorPpm AS meets_floor,
              |       t = coalesce(
              |         min(CASE WHEN coalesce(hits * 1000000
              |                                // nullif(exact_cnt, 0), 0)
              |                       >= $LshTableFloorPpm THEN t END) OVER (),
              |         max(t) OVER ()) AS chosen
              |FROM g ORDER BY tables""".stripMargin),
      "q268's table dial at the fixed absolute panel — the calibration a " +
        "production fleet actually schedules: the dial's exact side " +
        "inherits q270's O(64·n) bound instead of q268's share-based " +
        "O(0.2·n²), so table recalibration stays a nightly pass at any " +
        "corpus size. Same one-pass min_tbl grading, same floor, same " +
        "minimal-count choice rule; the store pillar " +
        "(installLshTables/recalibrateLshTablesIfSagging) accepts either " +
        "dial's reading — the absolute form is what a 100 TB deployment " +
        "feeds it."
    ) { (s, dir) =>
      val n = Tables.parquetRowCount(s, dir, "embeddings")
      lshTableDial(normVecs(s, dir), SimilarityQueries.codeBits(n), n,
        panelIdCap = Some(AbsPanelIdCap))
    },

    rollingWindowQuery,
    contaminationRunQuery,
    decontaminateExciseQuery,
    simhashPostingsServeQuery,
    minhashPostingsServeQuery,
    lshPostingsServeQuery,
    lshGuardedServeQuery,
    simhashLifecycleServeQuery,
    spanOwnerTakedownQuery,
    simhashBatchAdmitQuery,
    minhashBatchAdmitQuery,
    lshBatchAdmitQuery,
  )

  /** q294 — q40's pairs served after the FULL store lifecycle. */
  private def simhashLifecycleServeQuery: GraftQuery =
    GraftQuery(
      "q294_simhash_lifecycle_serve",
      Some(s"$replayShinglePrologueSql, $simhashBandTailSql"),
      "The manifest store's whole lifecycle as ONE oracle-checked row " +
        "(VERDICT r15 items 1+3): install the SimHash pillar on ~4/7 of " +
        "the corpus, admit the remaining three doc families as " +
        "SEQUENTIAL APPENDS (each commit writes delta-sized segments and " +
        "a manifest referencing every carried segment — zero copied " +
        "bytes), COMPACT the accumulated delta segments into one " +
        "consolidated segment per artifact, PRUNE retention down to the " +
        "compacted head (old version dirs deleted, superseded segments " +
        "reclaimed), then serve. Same oracle text as q40/q283: if any " +
        "step — reference carry, delta append, compaction rewrite, " +
        "segment reclamation — dropped or duplicated one posting row, " +
        "the hash compare would name it on every corpus every round. " +
        "Memoized per corpus fingerprint (q78's staging discipline), so " +
        "the bench measures the steady-state serve over the compacted " +
        "single-segment layout; IndexMaintBench's store op carries the " +
        "byte/file-count economics at x1/x10/x100."
    ) { (s, dir) =>
      val root = RelationalQueries.staged(s, "shlife",
        Tables.fingerprint(s, s"$dir/documents.parquet")) { out =>
        val sigs = textSimhashSigs(s, dir)
        IndexLifecycle.installSimhashPostings(s, out, 1L,
          sigs.filter(col("doc_id") % 7 >= 3))
        (0 until 3).foreach { m =>
          IndexLifecycle.appendSimhashPostings(s, out,
            sigs.filter(col("doc_id") % 7 === m))
        }
        IndexLifecycle.compactSimhashPostings(s, out)
        IndexLifecycle.pruneVersions(out, keep = 1)
        ()
      }
      IndexLifecycle.simhashPairsFromStore(s, root)
    }

  /** q293 — q67's pair set served under the confirm-mass guard. */
  private def lshGuardedServeQuery: GraftQuery =
    GraftQuery(
      "q293_lsh_guarded_serve",
      Some(s"""${SimilarityQueries.lshReplayPrologue}, $lshPairSqlCtes
              |SELECT vec_a, vec_b, round(c, 4) AS cos FROM lsc
              |ORDER BY vec_a, vec_b""".stripMargin),
      "q285's stored-LSH serve with the candidate-budget guard active " +
        "(VERDICT r15: the x100 serve was dominated by an unbounded " +
        "exact-cosine confirm with no audit naming the mass): at " +
        "install time the guard prices every bucket the serve will " +
        "expand — C(bsz,2) over the Hamming-1-probed, [2,64]-capped " +
        "buckets, the pre-dedup expansion work — aggregates one " +
        "(mass, buckets, max_bucket) reading against the budget, and " +
        "persists it beside the pillar; a past-budget reading routes " +
        "to the TABLE DIAL (lshGuardedMaintenance -> " +
        "recalibrateLshPostingsTables), the knob that shrinks mass. " +
        "The guard REPORTS, never drops: the served pair set is " +
        "bit-identical to q285/q67 — which is exactly what this " +
        "query's shared oracle proves hash-green (a guard that " +
        "perturbed one pair would fail the compare). The per-bucket " +
        "audit frame itself is hash-seeded (not SQL-expressible); its " +
        "semantics are pinned by IndexLifecycleSpec's planted " +
        "pathological-bucket test (guard names the mass; dial " +
        "consulted; candidates never dropped). Reading is index-sized " +
        "rows -> bucket-sized output, priced once per install, " +
        "job-free at serve construction."
    ) { (s, dir) =>
      val root = RelationalQueries.staged(s, "lshguard",
        Tables.fingerprint(s, s"$dir/embeddings.parquet")) { out =>
        IndexLifecycle.installLshPostings(s, out, 1L, normVecs(s, dir),
          SimilarityQueries.codeBits(
            Tables.parquetRowCount(s, dir, "embeddings")))
        val g = IndexLifecycle.lshConfirmGuard(s, out)
        s.range(1).select(lit(g.mass).as("mass"),
            lit(g.buckets).as("buckets"),
            lit(g.maxBucketPairs).as("max_bucket_pairs"),
            lit(g.overBudget).as("over_budget"))
          .write.mode("overwrite").parquet(s"$out/guard")
        ()
      }
      IndexLifecycle.lshPairsFromStore(s, root, dir)
    }

  /** q289 — incremental batch admission against the stored SimHash
    * postings, oracle-checked. */
  private def simhashBatchAdmitQuery: GraftQuery =
    GraftQuery(
      "q289_simhash_batch_admit",
      Some(s"""$replayShinglePrologueSql, $simhashBandPairCtes
              |SELECT doc_a, doc_b, hamming FROM sp
              |WHERE doc_a % 7 = 0 OR doc_b % 7 = 0
              |ORDER BY doc_a, doc_b""".stripMargin),
      "The nightly-ingest unit of the q283 pillar, oracle-checked: the " +
        "store holds ~6/7 of the corpus (the deterministic doc_id % 7 " +
        "complement, installed once and memoized), the remaining ~1/7 " +
        "arrives as the NEW batch, signs ITSELF batch-side, and probes " +
        "the stored posting lists under UNION-bucket capping — the " +
        "oracle replays the full-corpus q40 index and keeps exactly the " +
        "pairs touching the batch, so hash-green IS the proof that " +
        "incremental admission equals a full rebuild on the union, " +
        "re-verified on every corpus every round (the IndexLifecycleSpec " +
        "twin pins the same identity in-process). Scale shape: batch " +
        "signing is batch-sized, the stored-list probe joins 20-byte " +
        "posting rows restricted to the buckets the batch touches " +
        "(lossless for touching pairs — such a pair shares a bucket the " +
        "batch posted into), and the corpus text is never re-scanned — " +
        "measured near-flat admit64 across two decades (SCALE.md " +
        "maintenance table)."
    ) { (s, dir) =>
      val sigs = textSimhashSigs(s, dir)
      val root = RelationalQueries.staged(s, "shadmit",
        Tables.fingerprint(s, s"$dir/documents.parquet")) { out =>
        IndexLifecycle.installSimhashPostings(s, out, 1L,
          sigs.filter(col("doc_id") % 7 =!= 0))
        ()
      }
      // the batch's signature walk staged once: inside the probe it feeds
      // the band keys AND both confirm-join sides (three evaluations in
      // the single-plan form; the streaming twin gets the same effect from
      // its per-epoch signature frame)
      IndexLifecycle.simhashBatchPairs(s, root,
        Staging.stage(sigs.filter(col("doc_id") % 7 === 0)))
    }

  /** q290 — incremental batch admission against the stored MinHash
    * postings, oracle-checked. */
  private def minhashBatchAdmitQuery: GraftQuery =
    GraftQuery(
      "q290_minhash_batch_admit",
      Some(s"""$replayShinglePrologueSql, $minhashPairSqlCtes
              |SELECT doc_a, doc_b, est_jaccard_ppm FROM ap
              |WHERE doc_a % 7 = 0 OR doc_b % 7 = 0
              |ORDER BY doc_a, doc_b""".stripMargin),
      "q289's MinHash sibling: the new batch's 64-way signatures and 16 " +
        "band keys compute batch-side, stored lists are probed under " +
        "union-bucket capping, and the stored∪batch signature frames " +
        "confirm agreement (native eq-count, est-J ≥ ½) — the oracle " +
        "replays the full-corpus q39 index restricted to pairs touching " +
        "the batch, so incremental == rebuild-on-union is hash-checked " +
        "per corpus per round. This is the GPL-scale nightly dedup " +
        "admission (persisted MinHash index + batch probe) as one " +
        "oracle-checked operator."
    ) { (s, dir) =>
      val sigs = minhashSignatures(s, dir)
      val root = RelationalQueries.staged(s, "mhadmit",
        Tables.fingerprint(s, s"$dir/documents.parquet")) { out =>
        IndexLifecycle.installMinhashPostings(s, out, 1L,
          sigs.filter(col("doc_id") % 7 =!= 0))
        ()
      }
      // staged for the same reason as q289: one 64-way signature walk of
      // the batch, not three
      IndexLifecycle.minhashBatchPairs(s, root,
        Staging.stage(sigs.filter(col("doc_id") % 7 === 0)))
    }

  /** q291 — incremental batch admission against the stored LSH codes,
    * oracle-checked. */
  private def lshBatchAdmitQuery: GraftQuery =
    GraftQuery(
      "q291_lsh_batch_admit",
      Some(s"""${SimilarityQueries.lshReplayPrologue}, $lshPairSqlCtes
              |SELECT vec_a, vec_b, round(c, 4) AS cos FROM lsc
              |WHERE vec_a % 7 = 0 OR vec_b % 7 = 0
              |ORDER BY vec_a, vec_b""".stripMargin),
      "q289's embedding sibling: the new vector batch codes ITSELF with " +
        "the INSTALLED hyperplanes/width (old and new rows address one " +
        "code family), probe balls meet the stored per-table lists under " +
        "union-bucket capping, and the exact cosine re-check unions the " +
        "id-bounded corpus lookup with the batch's own floats — a truly " +
        "new vector exists only in the batch until appended. Oracle: the " +
        "full-corpus q67 replay restricted to pairs touching the batch — " +
        "incremental == rebuild-on-union, hash-checked per corpus per " +
        "round."
    ) { (s, dir) =>
      val vecs = normVecs(s, dir)
      val bits = SimilarityQueries.codeBits(
        Tables.parquetRowCount(s, dir, "embeddings"))
      val root = RelationalQueries.staged(s, "lshadmit",
        Tables.fingerprint(s, s"$dir/embeddings.parquet")) { out =>
        IndexLifecycle.installLshPostings(s, out, 1L,
          vecs.filter(col("vec_id") % 7 =!= 0), bits)
        ()
      }
      IndexLifecycle.lshBatchPairs(s, root, dir,
        vecs.filter(col("vec_id") % 7 === 0))
    }

  /** q288 — span-ownership handoff after a takedown. */
  private def spanOwnerTakedownQuery: GraftQuery =
    GraftQuery(
      "q288_span_owner_takedown",
      Some("""WITH toks AS (
             |  SELECT doc_id, string_split(lower(text), ' ') AS w
             |  FROM documents
             |), wins AS (
             |  SELECT doc_id, i,
             |         array_to_string(w[i + 1 : i + 4], ' ') AS g
             |  FROM toks, unnest(range(0, CAST(len(w) AS BIGINT) - 3)) AS t(i)
             |  WHERE len(w) >= 4
             |), ob AS (
             |  SELECT g, doc_id AS od, i AS op FROM (
             |    SELECT g, doc_id, i,
             |           row_number() OVER (PARTITION BY g
             |                              ORDER BY doc_id, i) AS rn
             |    FROM wins) WHERE rn = 1
             |), na AS (
             |  SELECT g, doc_id AS nd, i AS np FROM (
             |    SELECT g, doc_id, i,
             |           row_number() OVER (PARTITION BY g
             |                              ORDER BY doc_id, i) AS rn
             |    FROM wins WHERE doc_id % 31 <> 0) WHERE rn = 1
             |)
             |SELECT CAST(o.od AS BIGINT) AS doc_before,
             |       CAST(o.op AS BIGINT) AS pos_before,
             |       CAST(na.nd AS BIGINT) AS doc_after,
             |       CAST(na.np AS BIGINT) AS pos_after
             |FROM ob o LEFT JOIN na USING (g)
             |WHERE o.od % 31 = 0
             |ORDER BY doc_before, pos_before""".stripMargin),
      "Takedown propagation through span ownership — the delete verb for " +
        "q114/q277's keeper rule (each distinct rolling window's FIRST " +
        "(doc, pos) occurrence is the canonical copy; later occurrences " +
        "are suppressed duplicates): deleting a doc set (the " +
        "deterministic doc_id % 31 panel) orphans every window it owned, " +
        "and each orphaned window must hand its canonical copy to the " +
        "next-earliest REMAINING occurrence — the previously-suppressed " +
        "duplicate span re-surfaces as the new first owner (doc_after/" +
        "pos_after; NULL when the window died with its only docs). " +
        "Scale shape: ownership is a min-struct aggregate over the " +
        "24-byte (wh, doc_id, pos) window index — the very state the " +
        "streaming spanAdmitTws store holds — and the NEW-owner pass " +
        "touches only the ORPHANED hashes' posting slices (a takedown " +
        "is a tiny fraction of a 100 TB corpus; the operator is keyed " +
        "on exactly that fraction, never a full re-own of the index). " +
        "The oracle replays ownership on the window STRINGS (q277's " +
        "discipline) — hash-green means zero 64-bit collisions."
    ) { (s, dir) =>
      val docs = Tables.documents(s, dir)
        .select(col("doc_id"), lower(col("text")).as("text"))
      IndexLifecycle.spanOwnershipHandoff(windowKeysFor(docs),
          docs.filter(col("doc_id") % 31 === 0).select("doc_id"))
        .orderBy("doc_before", "pos_before")
    }

  /** q283 — q40's pair set served FROM the stored postings pillar. */
  private def simhashPostingsServeQuery: GraftQuery =
    GraftQuery(
      "q283_simhash_postings_serve",
      Some(s"$replayShinglePrologueSql, $simhashBandTailSql"),
      "q40 served FROM the installed SimHash postings pillar — the " +
        "near-dup analogue of q281's build/serve split: " +
        "IndexLifecycle.installSimhashPostings persists the signature " +
        "frame (8 bytes/doc) and its 7-block pigeonhole posting lists " +
        "PARTITIONED BY band as a versioned ATOMIC_MOVE artifact, and " +
        "the serve path reconstructs exactly q40's pair set from those " +
        "stored rows: union-bucket window bound, id-only in-bucket " +
        "pairing, stored-signature Hamming re-check. NOTHING in the " +
        "serve plan touches document text — the shingle walk and " +
        "SimHash fold (the index build's whole cost) ran once at " +
        "install, so steady-state reads are index-sized: posting rows " +
        "are 20-byte (doc_id, key, band) triples, Σ bucket² is capped " +
        "before any expansion, and a new batch admits against these " +
        "lists batch-side (simhashBatchPairs — no corpus re-scan; " +
        "IndexLifecycleSpec pins batch == full-rebuild-on-union). The " +
        "install memoizes per corpus fingerprint (q78's staging " +
        "discipline), so the bench measures the serve path, exactly " +
        "q281's contract. Same oracle text as q40: stored and derived " +
        "postings are ONE index, pinned row-identical by " +
        "IndexLifecycleSpec stored==live twins."
    ) { (s, dir) =>
      val root = RelationalQueries.staged(s, "simhashpost",
        Tables.fingerprint(s, s"$dir/documents.parquet")) { out =>
        IndexLifecycle.installSimhashPostings(s, out, 1L,
          textSimhashSigs(s, dir))
        ()
      }
      IndexLifecycle.simhashPairsFromStore(s, root)
    }

  /** q284 — q39's pair set served FROM the stored postings pillar. */
  private def minhashPostingsServeQuery: GraftQuery =
    GraftQuery(
      "q284_minhash_postings_serve",
      Some(s"""$replayShinglePrologueSql, $minhashPairSqlCtes
              |SELECT doc_a, doc_b, est_jaccard_ppm FROM ap
              |ORDER BY doc_a, doc_b""".stripMargin),
      "q39 served FROM the installed MinHash postings pillar: the " +
        "signature frame (64 longs/doc) and its 16 band-key posting " +
        "lists persist PARTITIONED BY band under ATOMIC_MOVE v=N; the " +
        "serve path prices candidates from the stored lists (union-" +
        "bucket cap, id-only pairing) and confirms with the stored " +
        "signatures' native eq-count agreement — the shingle walk and " +
        "64-way MinHash fold never re-run. This is the storage shape " +
        "GPL-scale dedup pipelines actually operate (persisted MinHash " +
        "index, nightly batch admission): a new batch signs ITSELF, " +
        "probes the stored lists, and appends as v=N+1 with signatures " +
        "recomputed for nobody (appendMinhashPostings — the q234 " +
        "incremental discipline; IndexLifecycleSpec pins batch-admit == " +
        "full-rebuild-on-union and append == rebuild). Install is " +
        "memoized per corpus fingerprint so steady state measures the " +
        "serve path; same oracle text as q39 — one index, stored or " +
        "derived, pinned by stored==live twins."
    ) { (s, dir) =>
      val root = RelationalQueries.staged(s, "minhashpost",
        Tables.fingerprint(s, s"$dir/documents.parquet")) { out =>
        IndexLifecycle.installMinhashPostings(s, out, 1L,
          minhashSignatures(s, dir))
        ()
      }
      IndexLifecycle.minhashPairsFromStore(s, root)
    }

  /** q285 — q67's pair set served FROM the stored postings pillar. */
  private def lshPostingsServeQuery: GraftQuery =
    GraftQuery(
      "q285_lsh_postings_serve",
      Some(s"""${SimilarityQueries.lshReplayPrologue}, $lshPairSqlCtes
              |SELECT vec_a, vec_b, round(c, 4) AS cos FROM lsc
              |ORDER BY vec_a, vec_b""".stripMargin),
      "q67 served FROM the installed sign-LSH postings pillar: per-table " +
        "BASE codes persist PARTITIONED BY table next to the (bits, " +
        "tables) dials; the serve path derives the Hamming-1 probe balls " +
        "from the stored codes (8 integer XORs per row — cheaper to " +
        "re-derive than to 9× the stored artifact), bounds union " +
        "buckets, pairs id-only, and re-checks exact cosine through an " +
        "id-bounded lookup into the corpus — the embeddings scan feeds " +
        "ONLY the re-check join (q281's re-rank discipline); the 4×8 " +
        "hyperplane signature computation (the build) never re-runs. A " +
        "new embedding batch codes ITSELF with the INSTALLED planes and " +
        "admits against the stored lists (lshBatchPairs/" +
        "appendLshPostings — IndexLifecycleSpec pins batch == " +
        "full-rebuild-on-union). Install memoized per corpus " +
        "fingerprint; same oracle text as q67 — one index either way, " +
        "pinned by stored==live twins."
    ) { (s, dir) =>
      val root = RelationalQueries.staged(s, "lshpost",
        Tables.fingerprint(s, s"$dir/embeddings.parquet")) { out =>
        IndexLifecycle.installLshPostings(s, out, 1L, normVecs(s, dir),
          SimilarityQueries.codeBits(
            Tables.parquetRowCount(s, dir, "embeddings")))
        ()
      }
      IndexLifecycle.lshPairsFromStore(s, root, dir)
    }

  /** (doc_id, i, g) — every stride-1 rolling 4-token window of every
    * document, `i` its 0-based start offset: q277's generator, shared with
    * the streaming twin's batch-side projection. Expects (doc_id, w). */
  private[graft] def rollingWindows(toks: DataFrame): DataFrame =
    toks.filter(size(col("w")) >= 4)
      .select(col("doc_id"),
        explode(sequence(lit(0L), size(col("w")).cast("long") - 4)).as("i"),
        col("w"))
      .select(col("doc_id"), col("i"),
        concat_ws(" ",
          slice(col("w"), (col("i") + 1).cast("int"), lit(4))).as("g"))

  /** (wh, doc_id, pos) — [[rollingWindows]] reduced to the 24-byte rows a
    * 100 TB shuffle (and the streaming admission's state key) carries:
    * xxhash64 of the window stands in for the string, q114's documented
    * hash-for-string discipline. */
  private[graft] def windowKeysFor(docs: DataFrame): DataFrame =
    rollingWindows(docs.select(col("doc_id"), split(col("text"), " ").as("w")))
      .select(xxhash64(col("g")).as("wh"), col("doc_id"), col("i").as("pos"))

  /** (doc_id, a, b) — duplicated window starts `(doc_id, i)` merged into
    * maximal covered token intervals [a, b] (window width 4), the
    * gaps-and-islands pass shared by q277's span audit and q278's
    * contamination runs. Both windows are doc-local: the merge re-uses
    * whatever partitioning delivered `dup` and moves only its rows. */
  private[graft] def mergedSpans(dup: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byDoc = Window.partitionBy("doc_id").orderBy("i")
    dup
      .withColumn("pmax", max(col("i") + 3).over(
        byDoc.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("brk",
        when(col("i") > coalesce(col("pmax"), lit(-2L)) + 1, 1L)
          .otherwise(0L))
      .withColumn("gid", sum(col("brk")).over(byDoc))
      .groupBy("doc_id", "gid")
      .agg(min("i").as("a"), (max(col("i")) + 3).as("b"))
      .select("doc_id", "a", "b")
  }

  /** The q277/q278 islands tail in the DuckDB dialect: `isl`/`spans` CTEs
    * over a previously-defined `dup(doc_id, i)`. */
  private def spanMergeSqlCtes: String =
    """isl AS (
      |  SELECT doc_id, i,
      |         CASE WHEN i > coalesce(max(i + 3) OVER (
      |                PARTITION BY doc_id ORDER BY i
      |                ROWS BETWEEN UNBOUNDED PRECEDING
      |                         AND 1 PRECEDING), -2) + 1
      |              THEN 1 ELSE 0 END AS brk
      |  FROM dup
      |), spans AS (
      |  SELECT doc_id, gid, min(i) AS a, max(i) + 3 AS b
      |  FROM (SELECT doc_id, i,
      |               sum(brk) OVER (PARTITION BY doc_id
      |                              ORDER BY i) AS gid
      |        FROM isl)
      |  GROUP BY doc_id, gid
      |)""".stripMargin

  private def rollingWindowQuery: GraftQuery =
    GraftQuery(
      "q277_duplicate_span_extraction",
      Some(s"""WITH toks AS (
             |  SELECT doc_id, string_split(text, ' ') AS w FROM documents
             |), wins AS (
             |  SELECT doc_id, i,
             |         array_to_string(w[i + 1 : i + 4], ' ') AS g
             |  FROM toks, unnest(range(0, CAST(len(w) AS BIGINT) - 3)) AS t(i)
             |  WHERE len(w) >= 4
             |), dup AS (
             |  SELECT doc_id, i FROM (
             |    SELECT doc_id, i,
             |           row_number() OVER (PARTITION BY g
             |                              ORDER BY doc_id, i) AS rn
             |    FROM wins
             |  ) WHERE rn > 1
             |), $spanMergeSqlCtes, audit AS (
             |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans,
             |         CAST(sum(b - a + 1) AS BIGINT) AS dup_tokens
             |  FROM spans GROUP BY doc_id
             |), tokpos AS (
             |  SELECT doc_id, i AS p, w[CAST(i + 1 AS INT)] AS tok
             |  FROM toks, unnest(range(0, CAST(len(w) AS BIGINT))) AS t(i)
             |), cln AS (
             |  SELECT doc_id, string_agg(tok, ' ' ORDER BY p) AS txt
             |  FROM (SELECT t.doc_id, t.p, t.tok
             |        FROM tokpos t LEFT JOIN spans s
             |          ON s.doc_id = t.doc_id AND t.p BETWEEN s.a AND s.b
             |        WHERE s.a IS NULL)
             |  GROUP BY doc_id
             |)
             |SELECT t.doc_id, CAST(len(w) AS BIGINT) AS n_tokens,
             |       coalesce(a.n_spans, 0) AS n_spans,
             |       coalesce(a.dup_tokens, 0) AS dup_tokens,
             |       coalesce(c.txt, '') AS text_clean
             |FROM toks t
             |LEFT JOIN audit a USING (doc_id)
             |LEFT JOIN cln c USING (doc_id)
             |ORDER BY doc_id""".stripMargin),
      "Unaligned exact-substring span dedup — the full Lee et al. 2022 " +
        "semantics q114's fixed tiling approximates: EVERY 4-token rolling " +
        "window (stride 1, any offset) is keyed globally, only its first " +
        "occurrence by (doc_id, offset) survives, overlapping duplicated " +
        "windows merge into maximal spans (gaps-and-islands interval merge " +
        "over window starts), and the cleaned text drops exactly the " +
        "covered tokens — so a copied sentence is caught no matter where " +
        "it lands in the target document, which is the case aligned tiling " +
        "misses (a 1-token offset shifts every q114 tile). Self-repetition " +
        "inside one document dedups the same way (windows at i and i+1 " +
        "over a token run collide). One global shuffle, and the SHIPPED " +
        "plan already keys it by xxhash64(window) — 24-byte (hash, " +
        "doc_id, offset) rows, never the string, the same rows the " +
        "streaming twin's state store admits by — with the q114 " +
        "residual-check discipline (the oracle keeps the string key: " +
        "hash-green means zero 64-bit collisions on this corpus, checked " +
        "every round); duplicate groups are bounded by dup multiplicity, " +
        "never corpus size. Matching is deliberately CASE-SENSITIVE — " +
        "Lee et al.'s operator removes byte-exact substrings so the " +
        "cleaned text is reconstructable from keeper offsets alone; " +
        "normalization belongs to the FUZZY family (q39/q41/q278 " +
        "lowercase because they grade similarity, not identity). The " +
        "span merge and the clean-text anti-join are doc-local " +
        "(spans-per-doc ≪ tokens), so both re-use the document " +
        "partitioning and the whole pass stays linear."
    ) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val toks = Tables.documents(s, dir)
        .select(col("doc_id"), split(col("text"), " ").as("w"))
      val dup = rollingWindows(toks)
        .select(col("doc_id"), col("i"), xxhash64(col("g")).as("h"))
        .withColumn("rn", row_number().over(
          Window.partitionBy("h").orderBy("doc_id", "i")))
        .filter(col("rn") > 1)
        .select("doc_id", "i")
      // ONE pass carries audit AND transform: merged spans are disjoint,
      // so a left join tags each token with at most one covering span and
      // a single aggregation yields counts (a span is counted at its
      // start token — no countDistinct Expand) plus the cleaned text
      // (collect_list drops the nulled covered tokens). The spans
      // pipeline builds ONCE — a separate audit agg + anti-join
      // referenced it twice and the optimizer duplicated the whole
      // window-dedup shuffle under each (observed in this plan's first
      // form).
      val spans = mergedSpans(dup)
      val tokpos = toks
        .select(col("doc_id"), posexplode(col("w")).as(Seq("p", "tok")))
      tokpos.as("t")
        .join(spans.as("s"),
          col("t.doc_id") === col("s.doc_id") &&
            col("t.p") >= col("s.a") && col("t.p") <= col("s.b"),
          "left")
        .select(col("t.doc_id").as("doc_id"), col("p"), col("tok"), col("a"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_tokens"),
          count(when(col("p") === col("a"), 1)).as("n_spans"),
          count(col("a")).as("dup_tokens"),
          concat_ws(" ", transform(sort_array(collect_list(
              when(col("a").isNull, struct(col("p"), col("tok"))))),
            x => x("tok"))).as("text_clean"))
        .orderBy("doc_id")
    }

  private def contaminationRunQuery: GraftQuery =
    GraftQuery(
      "q278_contamination_runs",
      Some(s"""WITH toks AS (
             |  SELECT doc_id, string_split(lower(text), ' ') AS w
             |  FROM documents
             |), wins AS (
             |  SELECT doc_id, i,
             |         array_to_string(w[i + 1 : i + 4], ' ') AS g
             |  FROM toks, unnest(range(0, CAST(len(w) AS BIGINT) - 3)) AS t(i)
             |  WHERE len(w) >= 4
             |), ev AS (
             |  SELECT DISTINCT g FROM wins WHERE doc_id % 97 = 0
             |), dup AS (
             |  SELECT wins.doc_id, wins.i FROM wins JOIN ev USING (g)
             |  WHERE wins.doc_id % 97 <> 0
             |), $spanMergeSqlCtes
             |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_runs,
             |       CAST(max(b - a + 1) AS BIGINT) AS max_run_tokens,
             |       CAST(sum(b - a + 1) AS BIGINT) AS covered_tokens
             |FROM spans GROUP BY doc_id
             |ORDER BY doc_id""".stripMargin),
      "Contamination-run audit — q76's decontamination upgraded from " +
        "overlap COUNTS to overlap SEVERITY: the longest contiguous token " +
        "run each training document shares verbatim with the eval set. " +
        "40 scattered 4-grams and one 43-token verbatim eval passage both " +
        "count 40 in q76, but only the passage is memorization-grade " +
        "leakage (GPT-3 appendix C / PaLM's 'contaminated page' analyses " +
        "rank by exactly this run length); the cleaner also needs the run " +
        "boundaries to excise. Same generator as q277 (stride-1 rolling " +
        "windows) with positions kept; eval-side DISTINCT window hashes " +
        "broadcast to an inner join against the training window stream — " +
        "the corpus never shuffles (q76's plan shape, 24-byte hash rows); " +
        "surviving duplicated offsets merge doc-locally into maximal runs " +
        "(the shared q277 islands pass). Output is per CONTAMINATED doc: " +
        "run count, longest run, covered tokens — threshold on " +
        "max_run_tokens to split 'shares a idiom' from 'contains the " +
        "benchmark'. The oracle replays on window STRINGS — hash-green " +
        "means zero 64-bit collisions on this corpus, checked every round."
    ) { (s, dir) =>
      val toks = Tables.documents(s, dir)
        .select(col("doc_id"), split(lower(col("text")), " ").as("w"))
      val wins = rollingWindows(toks)
        .select(col("doc_id"), col("i"), xxhash64(col("g")).as("h"))
      val evalW = wins.filter(col("doc_id") % 97 === 0)
        .select("h").distinct()
      val dup = wins.filter(col("doc_id") % 97 =!= 0)
        .join(broadcast(evalW), "h")
        .select("doc_id", "i")
      mergedSpans(dup).groupBy("doc_id")
        .agg(count(lit(1)).as("n_runs"),
          max(col("b") - col("a") + 1).as("max_run_tokens"),
          sum(col("b") - col("a") + 1).as("covered_tokens"))
        .orderBy("doc_id")
    }

  private def decontaminateExciseQuery: GraftQuery =
    GraftQuery(
      "q282_decontaminate_excise",
      Some(s"""WITH toks AS (
             |  SELECT doc_id, string_split(lower(text), ' ') AS w
             |  FROM documents
             |), wins AS (
             |  SELECT doc_id, i,
             |         array_to_string(w[i + 1 : i + 4], ' ') AS g
             |  FROM toks, unnest(range(0, CAST(len(w) AS BIGINT) - 3)) AS t(i)
             |  WHERE len(w) >= 4
             |), ev AS (
             |  SELECT DISTINCT g FROM wins WHERE doc_id % 97 = 0
             |), dup AS (
             |  SELECT wins.doc_id, wins.i FROM wins JOIN ev USING (g)
             |  WHERE wins.doc_id % 97 <> 0
             |), $spanMergeSqlCtes, audit AS (
             |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_runs,
             |         CAST(sum(b - a + 1) AS BIGINT) AS excised_tokens
             |  FROM spans GROUP BY doc_id
             |), tokpos AS (
             |  SELECT doc_id, i AS p, w[CAST(i + 1 AS INT)] AS tok
             |  FROM toks, unnest(range(0, CAST(len(w) AS BIGINT))) AS t(i)
             |  WHERE doc_id % 97 <> 0
             |), cln AS (
             |  SELECT doc_id, string_agg(tok, ' ' ORDER BY p) AS txt
             |  FROM (SELECT t.doc_id, t.p, t.tok
             |        FROM tokpos t LEFT JOIN spans s
             |          ON s.doc_id = t.doc_id AND t.p BETWEEN s.a AND s.b
             |        WHERE s.a IS NULL)
             |  GROUP BY doc_id
             |)
             |SELECT t.doc_id, CAST(len(w) AS BIGINT) AS n_tokens,
             |       coalesce(a.n_runs, 0) AS n_runs,
             |       coalesce(a.excised_tokens, 0) AS excised_tokens,
             |       coalesce(c.txt, '') AS text_clean
             |FROM toks t
             |LEFT JOIN audit a USING (doc_id)
             |LEFT JOIN cln c USING (doc_id)
             |WHERE t.doc_id % 97 <> 0
             |ORDER BY t.doc_id""".stripMargin),
      "Contamination EXCISION — the cleaner q278's severity audit exists " +
        "to feed (GPT-3 appendix C removes the contaminated SEGMENTS and " +
        "keeps the document; dropping whole docs at q76's any-overlap " +
        "threshold wastes the clean remainder): every training document " +
        "is returned with its verbatim eval-overlap runs stripped — " +
        "q278's exact dup windows (lowercased stride-1 rolling windows " +
        "against the broadcast DISTINCT eval-window hashes, corpus never " +
        "shuffles for the membership test) merged to maximal runs by the " +
        "shared q277 islands pass, then excised by q277's one-pass " +
        "audit-and-transform tail (disjoint spans ⇒ each token joins at " +
        "most one covering span; a single doc-local aggregation yields " +
        "run count, excised tokens AND the cleaned text). Clean docs " +
        "ride through whole — the output is the decontaminated training " +
        "corpus plus its audit trail, not a flag list. Same linearity as " +
        "its parents: one broadcast membership probe over the window " +
        "stream, spans and reconstruction doc-local, eval docs excluded " +
        "from the output by the panel predicate at the scan."
    ) { (s, dir) =>
      exciseAgainst(
        Tables.documents(s, dir).filter(col("doc_id") % 97 =!= 0),
        evalWindowHashes(
          Tables.documents(s, dir).filter(col("doc_id") % 97 === 0)))
        .orderBy("doc_id")
    }

  /** The DISTINCT lowercased rolling-window hashes of an eval corpus —
    * the frozen membership index q278/q282 broadcast onto the training
    * stream (benchmarks are MBs; this frame is what a production
    * pipeline snapshots once per eval-suite release). */
  private[graft] def evalWindowHashes(evalDocs: DataFrame): DataFrame =
    rollingWindows(evalDocs
      .select(col("doc_id"), split(lower(col("text")), " ").as("w")))
      .select(xxhash64(col("g")).as("h")).distinct()

  /** q282's excision pipeline against a FROZEN eval-window hash index —
    * the seam the batch query and the streaming admission stage
    * (`StatefulOps.decontaminateAdmit`) share, so cleaned text at
    * admission time is bit-identical to the after-the-fact audit:
    * lowercased stride-1 window hashes probe the broadcast eval set (the
    * corpus side never shuffles for membership), surviving offsets merge
    * doc-locally to maximal runs, and one doc-local aggregation emits
    * (doc_id, n_tokens, n_runs, excised_tokens, text_clean) — clean docs
    * ride through whole. Everything is doc-local past the broadcast
    * probe, so the pipeline is chunking-invariant by construction: any
    * partition of `docs` processed against the same `evalW` unions to
    * the whole corpus's verdict. */
  private[graft] def exciseAgainst(docs: DataFrame,
                                   evalW: DataFrame): DataFrame = {
    val toks = docs
      .select(col("doc_id"), split(lower(col("text")), " ").as("w"))
    val dup = rollingWindows(toks)
      .select(col("doc_id"), col("i"), xxhash64(col("g")).as("h"))
      .join(broadcast(evalW), "h")
      .select("doc_id", "i")
    val spans = mergedSpans(dup)
    val tokpos = toks
      .select(col("doc_id"), posexplode(col("w")).as(Seq("p", "tok")))
    tokpos.as("t")
      .join(spans.as("s"),
        col("t.doc_id") === col("s.doc_id") &&
          col("t.p") >= col("s.a") && col("t.p") <= col("s.b"),
        "left")
      .select(col("t.doc_id").as("doc_id"), col("p"), col("tok"), col("a"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        count(when(col("p") === col("a"), 1)).as("n_runs"),
        count(col("a")).as("excised_tokens"),
        concat_ws(" ", transform(sort_array(collect_list(
            when(col("a").isNull, struct(col("p"), col("tok"))))),
          x => x("tok"))).as("text_clean"))
  }
}
