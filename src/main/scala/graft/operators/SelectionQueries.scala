package graft.operators

import graft.{GraftQuery, Tables}
import graft.Staging.StagingOps
import graft.functions.TextQueries.{base31Fold, base31FoldSql}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Semantic data-selection family for the LLM-data-pipeline surface: the
  * selection passes that decide WHICH documents/embeddings make the training
  * mix after cleaning — semantic (cluster-scoped) dedup, importance-weighted
  * selection toward a target distribution, prototypicality-based diversity
  * pruning, and the tokenizer-fertility audit that checks the mix is fair
  * across languages.
  *
  * The cluster-scoped operators (q230/q232) share one centroid-assignment
  * pipeline — the EXACT shape q66's IVF index build uses (deterministic ~2%
  * LCG centroid pick, broadcast centroids, map-side max_by assignment), so
  * the SemDeDup/prototypicality index is the ANN index: one assignment pass
  * serves retrieval, dedup and diversity pruning. The importance weigher
  * (q231) is hashed-feature count statistics — two low-cardinality
  * aggregations and a broadcast join back; the fertility audit (q233) is a
  * single scan collapsing to one row per language.
  */
object SelectionQueries {

  /** Cosine threshold above which two same-cluster embeddings are semantic
    * duplicates — q42's corpus-wide near-dup contract, applied within
    * clusters (SemDeDup's trade: only intra-cluster pairs are examined). */
  private val DupCos = 0.35

  /** Hashed-bigram feature space for q231: buckets of the shared base-31
    * content fold. 128 buckets keeps the stats table broadcast-trivial at
    * any corpus size (the feature space is fixed; only counts grow). */
  private val Buckets = 128

  /** (vec_id, cent_id, cc, v, nrm): every embedding assigned to its nearest
    * deterministic centroid — q66's index build, reused verbatim so the
    * cluster structure under SemDeDup/prototypicality is the one the IVF
    * index already maintains. `cc` is the cosine to the assigned centroid
    * (q232's prototypicality score). Ties break toward the larger cent_id,
    * matching the replay oracle's ORDER BY cc DESC, cent_id DESC. */
  private[operators] def assigned(s: SparkSession, dir: String): DataFrame =
    assignedFrom(s, dir, SimilarityQueries.ivfCents(s, dir))

  /** [[assigned]] against an ARBITRARY centroid frame `(cent_id, cv, cn)`
    * — the versioned index store's seam into the SELECTION family: a
    * centroid-pillar hot-swap (IndexLifecycle) moves SemDeDup and
    * prototypicality membership through the installed artifact alone,
    * through exactly the assignment q230/q232 ship. Retrieval
    * ([[SimilarityQueries.ivfTopKFrom]]) and selection now read the SAME
    * pillar, so one swap moves both — there is no second, live-only copy
    * of the cluster structure left to drift. */
  private[graft] def assignedFrom(s: SparkSession, dir: String,
                                  cents: DataFrame): DataFrame = {
    val n = SimilarityQueries.normed(s, dir)
    val cc = SimilarityQueries.cosine(col("v"), col("cv"), col("nrm"), col("cn"))
    n.crossJoin(broadcast(cents))
      .groupBy("vec_id")
      // k=1 heap argmax (same (cc DESC, cent_id DESC) winner as the old
      // max(struct)) — the struct agg buffer forced a SortAggregate
      // full-sort of the n×C join; see SimilarityQueries.ivfAssignOf
      .agg(graft.functions.Sketches.topPairs(cc, -col("cent_id"), 1).as("tp"),
        first(col("v")).as("v"), first(col("nrm")).as("nrm"))
      .select(col("vec_id"), (-element_at(col("tp.id"), 1)).as("cent_id"),
        element_at(col("tp.score"), 1).as("cc"), col("v"), col("nrm"))
  }

  /** q230's SemDeDup verdict over a GIVEN assignment frame — factored so
    * the batch query (live centroids) and the store path
    * ([[IndexLifecycle.semDedupAt]]) share one pipeline. */
  private[graft] def semDedupOf(a: DataFrame): DataFrame = {
    val csz = a.groupBy("cent_id").agg(count(lit(1)).cast("long").as("csize"))
    val hi = a.select(col("cent_id"), col("vec_id").as("vec_hi"),
      col("v").as("va"), col("nrm").as("na"))
    val lo = a.select(col("cent_id"), col("vec_id").as("vec_lo"),
      col("v").as("vb"), col("nrm").as("nb"))
    val dropped = hi.join(lo, Seq("cent_id"))
      .filter(col("vec_lo") < col("vec_hi"))
      .filter(SimilarityQueries.cosine(
        col("va"), col("vb"), col("na"), col("nb")) >= DupCos)
      .select(col("vec_hi").as("vec_id")).distinct()
      .withColumn("dr", lit(true))
    a.join(csz, "cent_id")
      .join(dropped, Seq("vec_id"), "left")
      .select(col("vec_id"), col("cent_id"), col("csize"),
        col("dr").isNull.as("kept"))
      .orderBy("vec_id")
  }

  /** q232's prototypicality ranking over a GIVEN assignment frame — same
    * factoring as [[semDedupOf]], for [[IndexLifecycle.prototypicalityAt]]. */
  private[graft] def prototypicalityOf(a: DataFrame): DataFrame = {
    val csz = a.groupBy("cent_id").agg(count(lit(1)).cast("long").as("csize"))
    val w = Window.partitionBy("cent_id").orderBy(col("cc").desc, col("vec_id"))
    a.join(csz, "cent_id")
      .withColumn("proto_rank", row_number().over(w).cast("long"))
      .select(col("vec_id"), col("cent_id"), round(col("cc"), 4).as("proto_cos"),
        col("proto_rank"), col("csize"),
        (col("proto_rank") > expr("(csize + 9) div 10")).as("keep"))
      .orderBy("vec_id")
  }

  /** The assignment pipeline in the oracles' DuckDB dialect — q66's replay
    * prologue extended with the per-vector centroid cosine, shared by the
    * q230 and q232 oracles so a centroid-rule tweak moves both with the
    * engine. */
  private[operators] val assignedSql: String =
    """WITH e AS (
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
      |  SELECT vec_id, v, nrm, cent_id, cc FROM (
      |    SELECT *, row_number() OVER (PARTITION BY vec_id
      |                ORDER BY cc DESC, cent_id DESC) rn
      |    FROM ac
      |  ) WHERE rn = 1
      |)""".stripMargin

  val all: Seq[GraftQuery] = Seq(

    GraftQuery(
      "q230_semdedup",
      Some(s"""$assignedSql, dropped AS (
              |  SELECT DISTINCT a.vec_id
              |  FROM assigned a JOIN assigned b
              |    ON a.cent_id = b.cent_id AND b.vec_id < a.vec_id
              |  WHERE list_reduce(list_transform(range(1, len(a.v) + 1),
              |                                   i -> a.v[i] * b.v[i]),
              |                    (x,y) -> x+y) / (a.nrm * b.nrm) >= $DupCos
              |), csz AS (
              |  SELECT cent_id, CAST(count(*) AS BIGINT) csize
              |  FROM assigned GROUP BY cent_id
              |)
              |SELECT s.vec_id, s.cent_id, csz.csize,
              |       (d.vec_id IS NULL) AS kept
              |FROM assigned s
              |JOIN csz USING (cent_id)
              |LEFT JOIN dropped d ON s.vec_id = d.vec_id
              |ORDER BY s.vec_id""".stripMargin),
      "SemDeDup (cluster-then-dedup): embeddings are clustered by the q66 " +
        "centroid assignment, and only SAME-CLUSTER pairs are compared — " +
        "pair cost drops from O(n²) to Σ cluster², the " +
        "semantic-dedup trade (cross-cluster dups are by construction far " +
        "apart). A vector is dropped iff a lower-id cluster-mate sits at " +
        "cosine ≥ " + DupCos + " (q42's near-dup contract; " +
        "first-occurrence keeper, q114's discipline — the paper's " +
        "keep-farthest-from-centroid is a one-line swap of the keeper " +
        "key). Pairs meet in an equi-join on cent_id carrying ids and " +
        "vectors only for cluster-mates. At 100 TB the centroid sample " +
        "becomes q86's trained k-means with k ∝ n, holding cluster " +
        "sizes constant so per-cluster pair work is bounded; a mega-cluster " +
        "tiles with q42's block scheme inside the cluster. The assignment " +
        "is the SAME artifact the IVF index maintains, so dedup rides the " +
        "index build, not a second corpus pass."
    ) { (s, dir) =>
      semDedupOf(assigned(s, dir))
    },

    GraftQuery(
      "q231_dsir_importance",
      Some(s"""WITH d AS (
              |  SELECT doc_id, lang,
              |         list_transform(string_split(lower(text), ' '),
              |                        x -> ${base31FoldSql("x")}) fw
              |  FROM documents
              |), bk AS (
              |  SELECT doc_id, lang,
              |         (fw[i] * 31 + fw[i + 1]) % 1000000007 % $Buckets AS b
              |  FROM d, unnest(range(1, len(fw))) AS t(i)
              |), stats AS (
              |  SELECT b,
              |    CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) t,
              |    CAST(count(*) AS BIGINT) r
              |  FROM bk GROUP BY b
              |), tot AS (
              |  SELECT CAST(sum(t) AS BIGINT) tt, CAST(sum(r) AS BIGINT) rr FROM stats
              |), ppb AS (
              |  SELECT b, ((t + 1) * 1000000000) // (tt + $Buckets) AS tppb,
              |         ((r + 1) * 1000000000) // (rr + $Buckets) AS rppb
              |  FROM stats, tot
              |)
              |SELECT bk.doc_id, bk.lang,
              |  CAST(count(*) AS BIGINT) AS n_bigrams,
              |  CAST(sum(ppb.tppb) AS BIGINT) AS tnum,
              |  CAST(sum(ppb.rppb) AS BIGINT) AS rden,
              |  round(CAST(sum(ppb.tppb) AS DOUBLE) / sum(ppb.rppb), 4) AS w_ratio,
              |  (CAST(sum(ppb.tppb) AS BIGINT)
              |     >= CAST(sum(ppb.rppb) AS BIGINT)) AS selected
              |FROM bk JOIN ppb USING (b)
              |GROUP BY bk.doc_id, bk.lang
              |ORDER BY bk.doc_id""".stripMargin),
      "DSIR-shaped importance weighting: hashed-bigram features estimate a " +
        "target distribution (lang='en' documents) and the raw-corpus " +
        "distribution; each document scores the add-one-smoothed " +
        "per-occurrence mass its bigrams carry under each (integer " +
        "parts-per-billion — transcendental-free; the log-likelihood " +
        "production form is a sum of per-bucket ln ratios over the same " +
        "two count tables, and the scaling constant grows with the corpus " +
        "before the per-bucket floor hits zero). The bucket is a fold " +
        "COMPOSITION — per-word base-31 folds computed once, combined " +
        "(fa·31+fb) mod p mod " + Buckets + " per bigram — so the " +
        "char-level hash touches each word once, not every concatenated " +
        "pair. selected = more-target-like-than-raw (tnum ≥ rden), a " +
        "fixed rational gate with no global rank. Scale: gram→bucket is " +
        "per-row map work; the stats table is " + Buckets + " rows " +
        "broadcast back onto the gram stream, whose only shuffle is the " +
        "doc_id aggregate (partial agg collapses each doc's grams " +
        "map-side). Single-token documents carry no bigram and drop " +
        "(q227's inner-join contract)."
    ) { (s, dir) =>
      // per-WORD folds computed once, bigram feature = fold composition —
      // the char-level hash runs over each word once, not over every
      // (word, next-word) concatenation twice its length
      val docs = Tables.documents(s, dir)
        .select(col("doc_id"), col("lang"),
          transform(split(lower(col("text")), " "), x => base31Fold(x)).as("fw"))
      val bk = docs.select(col("doc_id"), col("lang"),
        explode(zip_with(
          slice(col("fw"), lit(1), size(col("fw")) - 1),
          slice(col("fw"), lit(2), size(col("fw")) - 1),
          (a, b) => (a * 31 + b) % 1000000007L % Buckets)).as("b"))
        // materialized once: the stats aggregation and the scoring join
        // both consume the gram stream, and in the single-plan form the
        // per-word char-level fold ran TWICE over the corpus (the stats
        // side's partial agg sits below its exchange, so ReuseExchange
        // cannot dedupe it) — the same staged-stream posture q99 documents
        .staged
      val stats = bk.groupBy("b").agg(
        sum(when(col("lang") === "en", 1L).otherwise(0L)).as("t"),
        count(lit(1)).as("r"))
      val tot = stats.agg(sum("t").as("tt"), sum("r").as("rr"))
      val ppb = stats.crossJoin(broadcast(tot)).select(col("b"),
        expr(s"((t + 1) * 1000000000) div (tt + $Buckets)").as("tppb"),
        expr(s"((r + 1) * 1000000000) div (rr + $Buckets)").as("rppb"))
      bk.join(broadcast(ppb), "b")
        .groupBy("doc_id", "lang").agg(
          count(lit(1)).cast("long").as("n_bigrams"),
          sum("tppb").cast("long").as("tnum"),
          sum("rppb").cast("long").as("rden"))
        .select(col("doc_id"), col("lang"), col("n_bigrams"),
          col("tnum"), col("rden"),
          round(col("tnum").cast("double") / col("rden"), 4).as("w_ratio"),
          (col("tnum") >= col("rden")).as("selected"))
        .orderBy("doc_id")
    },

    GraftQuery(
      "q232_prototypicality_prune",
      Some(s"""$assignedSql, csz AS (
              |  SELECT cent_id, CAST(count(*) AS BIGINT) csize
              |  FROM assigned GROUP BY cent_id
              |)
              |SELECT a.vec_id, a.cent_id, round(a.cc, 4) AS proto_cos,
              |  CAST(row_number() OVER (PARTITION BY a.cent_id
              |         ORDER BY a.cc DESC, a.vec_id) AS BIGINT) AS proto_rank,
              |  csz.csize,
              |  (row_number() OVER (PARTITION BY a.cent_id
              |     ORDER BY a.cc DESC, a.vec_id) > (csz.csize + 9) // 10) AS keep
              |FROM assigned a JOIN csz USING (cent_id)
              |ORDER BY a.vec_id""".stripMargin),
      "Prototypicality-based diversity pruning (the D4 / SSL-prototypes " +
        "pass that follows SemDeDup): within each q66 cluster, members " +
        "rank by cosine to their assigned centroid (most prototypical " +
        "first) and the top ceil(10%) are dropped — cluster cores are " +
        "semantically redundant with each other; the retained tail " +
        "carries the cluster's diversity. The score is the `cc` the " +
        "assignment already computed, so pruning adds one bounded " +
        "per-cluster window and a count — no new corpus pass, no new " +
        "shuffle key (both partition on cent_id). At 100 TB clusters are " +
        "constant-size under trained k ∝ n centroids, so the window " +
        "partitions stay bounded; the drop fraction is a policy knob the " +
        "note's 10% pins for replay."
    ) { (s, dir) =>
      prototypicalityOf(assigned(s, dir))
    },

    GraftQuery(
      "q234_incremental_semdedup",
      Some(s"""WITH e AS (
              |  SELECT vec_id, embedding::DOUBLE[] v FROM embeddings
              |), n AS (
              |  SELECT vec_id, v,
              |         sqrt(list_reduce(list_transform(v, x -> x*x), (a,b) -> a+b)) nrm
              |  FROM e
              |), old AS (
              |  SELECT * FROM n WHERE vec_id % 5 <> 4
              |), newb AS (
              |  SELECT * FROM n WHERE vec_id % 5 = 4
              |), cents AS (
              |  SELECT vec_id AS cent_id, v cv, nrm cn FROM old
              |  WHERE ((vec_id % 2147483647) * 1103515245 + 12345)
              |          % 2147483647 % 50 = 0
              |), aco AS (
              |  SELECT o.vec_id, o.v, o.nrm, c.cent_id,
              |         list_reduce(list_transform(range(1, len(o.v) + 1),
              |                                    i -> o.v[i] * c.cv[i]),
              |                     (x,y) -> x+y) / (o.nrm * c.cn) AS cc
              |  FROM old o, cents c
              |), aold AS (
              |  SELECT vec_id, v, nrm, cent_id FROM (
              |    SELECT *, row_number() OVER (PARTITION BY vec_id
              |                ORDER BY cc DESC, cent_id DESC) rn
              |    FROM aco
              |  ) WHERE rn = 1
              |), dropped AS (
              |  SELECT DISTINCT a.vec_id
              |  FROM aold a JOIN aold b
              |    ON a.cent_id = b.cent_id AND b.vec_id < a.vec_id
              |  WHERE list_reduce(list_transform(range(1, len(a.v) + 1),
              |                                   i -> a.v[i] * b.v[i]),
              |                    (x,y) -> x+y) / (a.nrm * b.nrm) >= $DupCos
              |), idx AS (
              |  SELECT a.* FROM aold a
              |  LEFT JOIN dropped d ON a.vec_id = d.vec_id
              |  WHERE d.vec_id IS NULL
              |), acn AS (
              |  SELECT nb.vec_id, nb.v, nb.nrm, c.cent_id,
              |         list_reduce(list_transform(range(1, len(nb.v) + 1),
              |                                    i -> nb.v[i] * c.cv[i]),
              |                     (x,y) -> x+y) / (nb.nrm * c.cn) AS cc
              |  FROM newb nb, cents c
              |), anew AS (
              |  SELECT vec_id, v, nrm, cent_id FROM (
              |    SELECT *, row_number() OVER (PARTITION BY vec_id
              |                ORDER BY cc DESC, cent_id DESC) rn
              |    FROM acn
              |  ) WHERE rn = 1
              |), idxdup AS (
              |  SELECT DISTINCT a.vec_id
              |  FROM anew a JOIN idx b ON a.cent_id = b.cent_id
              |  WHERE list_reduce(list_transform(range(1, len(a.v) + 1),
              |                                   i -> a.v[i] * b.v[i]),
              |                    (x,y) -> x+y) / (a.nrm * b.nrm) >= $DupCos
              |), bdup AS (
              |  SELECT DISTINCT a.vec_id
              |  FROM anew a JOIN anew b
              |    ON a.cent_id = b.cent_id AND b.vec_id < a.vec_id
              |  WHERE list_reduce(list_transform(range(1, len(a.v) + 1),
              |                                   i -> a.v[i] * b.v[i]),
              |                    (x,y) -> x+y) / (a.nrm * b.nrm) >= $DupCos
              |)
              |SELECT a.vec_id, a.cent_id,
              |       (i.vec_id IS NOT NULL) AS idx_dup,
              |       (bd.vec_id IS NOT NULL) AS batch_dup,
              |       (i.vec_id IS NULL AND bd.vec_id IS NULL) AS admitted
              |FROM anew a
              |LEFT JOIN idxdup i ON a.vec_id = i.vec_id
              |LEFT JOIN bdup bd ON a.vec_id = bd.vec_id
              |ORDER BY a.vec_id""".stripMargin),
      "Incremental SemDeDup — q160's no-corpus-rescan discipline applied to " +
        "the semantic index: an arriving batch (vec_id ≡ 4 mod 5 models " +
        "the delivery) is assigned to the EXISTING corpus's centroids and " +
        "compared only against (a) the persisted canonical index — the " +
        "q230-kept members of the existing corpus, smaller than the raw " +
        "corpus by construction — and (b) its own lower-id cluster-mates. " +
        "A vector is admitted iff neither conflict exists; the output " +
        "attributes each rejection to index or batch. The raw corpus is " +
        "never re-scanned: at 100 TB each delivery costs " +
        "|batch| × centroid-broadcast assignment plus equi-joins on " +
        "cent_id against the index and itself — per-delivery work scales " +
        "with the batch and the index, not the corpus, the property that " +
        "makes nightly ingestion O(delivery). Centroids are the trained, " +
        "versioned artifact (q86), FROZEN across deliveries so admission " +
        "decisions never flip retroactively; the streaming form is " +
        "StatefulOps' per-cluster admit state."
    ) { (s, dir) =>
      val n = SimilarityQueries.normed(s, dir)
      val old = n.filter(col("vec_id") % 5 =!= 4)
      val newb = n.filter(col("vec_id") % 5 === 4)
      val cents = old.filter(
        ((col("vec_id") % 2147483647L) * 1103515245L + 12345L)
          % 2147483647L % 50 === 0)
        .select(col("vec_id").as("cent_id"), col("v").as("cv"), col("nrm").as("cn"))
      val cc = SimilarityQueries.cosine(col("v"), col("cv"), col("nrm"), col("cn"))
      def assign(df: DataFrame): DataFrame =
        df.crossJoin(broadcast(cents))
          .groupBy("vec_id")
          .agg(graft.functions.Sketches.topPairs(cc, -col("cent_id"), 1)
            .as("tp"),
            first(col("v")).as("v"), first(col("nrm")).as("nrm"))
          .select(col("vec_id"), (-element_at(col("tp.id"), 1)).as("cent_id"),
            col("v"), col("nrm"))
      val aold = assign(old)
      val pairCos = SimilarityQueries.cosine(
        col("va"), col("vb"), col("na"), col("nb"))
      def hiSide(df: DataFrame) = df.select(col("cent_id"),
        col("vec_id").as("vec_hi"), col("v").as("va"), col("nrm").as("na"))
      def loSide(df: DataFrame) = df.select(col("cent_id"),
        col("vec_id").as("vec_lo"), col("v").as("vb"), col("nrm").as("nb"))
      val droppedOld = hiSide(aold).join(loSide(aold), Seq("cent_id"))
        .filter(col("vec_lo") < col("vec_hi")).filter(pairCos >= DupCos)
        .select(col("vec_hi").as("vec_id")).distinct()
        .withColumn("dr", lit(true))
      val idx = aold.join(droppedOld, Seq("vec_id"), "left")
        .filter(col("dr").isNull).drop("dr")
      val anew = assign(newb)
      val idxDup = hiSide(anew).join(loSide(idx), Seq("cent_id"))
        .filter(pairCos >= DupCos)
        .select(col("vec_hi").as("vec_id")).distinct()
        .withColumn("id_", lit(true))
      val batchDup = hiSide(anew).join(loSide(anew), Seq("cent_id"))
        .filter(col("vec_lo") < col("vec_hi")).filter(pairCos >= DupCos)
        .select(col("vec_hi").as("vec_id")).distinct()
        .withColumn("bd_", lit(true))
      anew.join(idxDup, Seq("vec_id"), "left")
        .join(batchDup, Seq("vec_id"), "left")
        .select(col("vec_id"), col("cent_id"),
          col("id_").isNotNull.as("idx_dup"),
          col("bd_").isNotNull.as("batch_dup"),
          (col("id_").isNull && col("bd_").isNull).as("admitted"))
        .orderBy("vec_id")
    },

    GraftQuery(
      "q233_tokenizer_fertility",
      Some("""SELECT lang,
             |  CAST(count(*) AS BIGINT) AS n_docs,
             |  CAST(sum(CAST(len(string_split(text, ' ')) AS BIGINT)) AS BIGINT)
             |    AS ws_tokens,
             |  CAST(sum(CAST(len(regexp_extract_all(lower(text),
             |         '[a-z]+|[0-9]|[^a-z0-9 ]')) AS BIGINT)) AS BIGINT)
             |    AS bpe_tokens,
             |  CAST(sum(CAST(len(text) AS BIGINT)) AS BIGINT) AS n_chars,
             |  CAST(sum(CAST(len(regexp_extract_all(lower(text),
             |         '[a-z]+|[0-9]|[^a-z0-9 ]')) AS BIGINT)) AS BIGINT)
             |    * 1000000
             |    // nullif(CAST(sum(CAST(len(string_split(text, ' '))
             |                AS BIGINT)) AS BIGINT), 0) AS fertility_ppm,
             |  CAST(sum(CAST(len(text) AS BIGINT)) AS BIGINT) * 1000000
             |    // nullif(CAST(sum(CAST(len(regexp_extract_all(lower(text),
             |         '[a-z]+|[0-9]|[^a-z0-9 ]')) AS BIGINT)) AS BIGINT), 0)
             |    AS cpt_ppm
             |FROM documents
             |GROUP BY lang
             |ORDER BY lang""".stripMargin),
      "Tokenizer fertility audit per language — the multilingual-fairness " +
        "check (how many subword tokens a language pays per whitespace " +
        "word, and how many characters each subword carries), over q47's " +
        "two tokenizations. Integer ppm ratios of per-language sums, " +
        "nullif-guarded. One scan, per-row regex counts in the map stage, " +
        "a 5-key hash aggregate — partial aggregation collapses each " +
        "partition to one row per language before the exchange, so the " +
        "shuffle carries O(languages) rows regardless of corpus size."
    ) { (s, dir) =>
      val bpe = size(regexp_extract_all(lower(col("text")),
        lit("[a-z]+|[0-9]|[^a-z0-9 ]"), lit(0))).cast("long")
      Tables.documents(s, dir)
        .select(col("lang"),
          size(split(col("text"), " ")).cast("long").as("wst"),
          bpe.as("bpet"),
          length(col("text")).cast("long").as("nc"))
        .groupBy("lang").agg(
          count(lit(1)).cast("long").as("n_docs"),
          sum("wst").cast("long").as("ws_tokens"),
          sum("bpet").cast("long").as("bpe_tokens"),
          sum("nc").cast("long").as("n_chars"))
        .select(col("lang"), col("n_docs"), col("ws_tokens"),
          col("bpe_tokens"), col("n_chars"),
          expr("bpe_tokens * 1000000 div nullif(ws_tokens, 0)")
            .as("fertility_ppm"),
          expr("n_chars * 1000000 div nullif(bpe_tokens, 0)").as("cpt_ppm"))
        .orderBy("lang")
    })
}
