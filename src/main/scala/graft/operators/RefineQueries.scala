package graft.operators

import graft.{GraftQuery, Tables}
import graft.Staging.StagingOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus refinement & embedding-index maintenance family — the passes a
  * training-data pipeline runs AFTER cleaning and selection to shape what
  * survives: CCNet-style perplexity bucketing of each language stratum
  * (q239), within-document repeated-span scrubbing (q240, the intra-doc
  * counterpart of q114's cross-corpus span dedup), the IVF
  * assignment-drift audit (q241) that decides when the q66/q230 centroid
  * index needs retraining as the corpus distribution moves, and the
  * reproducible shuffle-shard-interleave training order (q243) that turns
  * the surviving corpus into epoch-keyed shards without a global sort.
  *
  * Shared machinery: q239 scores documents with q99's rare-bigram LM proxy
  * (the transcendental-free perplexity stand-in — one bigram definition for
  * the whole engine, `TextQueries.bigramArray`'s contract); q241 rides
  * `SelectionQueries.assigned` — the SAME deterministic centroid assignment
  * that serves IVF retrieval (q66), SemDeDup (q230) and prototypicality
  * pruning (q232), so the drift monitor watches the index the other three
  * actually use.
  *
  * Reference scope: the reference pipeline replicates whatever the topic
  * carries (`ReplicationApplication.java:63-78` moves records verbatim);
  * these operators are part of the mandated LLM-data-pipeline extension
  * surface, not translations of reference code.
  */
object RefineQueries {

  /** ppm shift at which q241 flags a cell for index rebalance: 2% of the
    * corpus moving in or out of one cell is the classic "retrain the
    * coarse quantizer" trigger (cell-size imbalance degrades both recall
    * and probe cost roughly linearly past this point). */
  private[graft] val RebalancePpm = 20000L

  /** q245 flags a subspace for codebook retraining when its mean
    * reconstruction error moves by more than 1/40 (2.5%) between epochs —
    * RELATIVE, so the rule survives any embedding normalization or corpus
    * scale where a fixed micros threshold would saturate or go dead. */
  private[graft] val PqDriftDenom = 40L

  val all: Seq[GraftQuery] = Seq(

    GraftQuery(
      "q239_perplexity_buckets",
      Some(s"""$novSqlCtes, rb AS (
             |  SELECT *,
             |         row_number() OVER (PARTITION BY lang ORDER BY bp, doc_id) rk,
             |         count(*) OVER (PARTITION BY lang) nl
             |  FROM nov
             |), b AS (
             |  SELECT *, (3 * (rk - 1)) // nl AS bid FROM rb
             |)
             |SELECT lang,
             |       CASE bid WHEN 0 THEN 'head' WHEN 1 THEN 'middle'
             |                ELSE 'tail' END AS bucket,
             |       CAST(count(*) AS BIGINT) AS n_docs,
             |       CAST(sum(n_bigrams) AS BIGINT) AS mass_bigrams,
             |       CAST(min(bp) AS BIGINT) AS bp_min,
             |       CAST(max(bp) AS BIGINT) AS bp_max
             |FROM b GROUP BY lang, bucket
             |ORDER BY lang, bucket""".stripMargin),
      "CCNet-style perplexity bucketing: each language stratum splits into " +
        "head/middle/tail thirds by LM score, so the mixer can oversample " +
        "the head (lowest-perplexity = cleanest) and audit what the tail " +
        "holds before discarding it. The score is the inverse mean corpus " +
        "frequency of the document's bigrams in integer micros — the " +
        "unigram-cache perplexity proxy (a document built from corpus-" +
        "common bigrams scores low = low perplexity; a real log-prob " +
        "would drift across engines, a count ratio cannot), and ONE " +
        "bigram definition serves q64/q85/q99 and this gate. Tercile " +
        "membership is integer rank arithmetic, (3·(rk−1)) div n — " +
        "deterministic under ties via the (bp, doc_id) total order, no " +
        "interpolated quantile to disagree on. The Spark plan: hashed " +
        "bigrams shuffle once to count, once to score (q99's shape), " +
        "then ONE per-lang exchange computes rank and stratum size " +
        "together. At 100 TB the per-lang window would funnel a billion-" +
        "doc stratum through one sort — q239b IS that swap (shared score " +
        "pipeline, histogram cuts instead of ranks), and this exact-rank " +
        "form stays as the contract the histogram form is bounded " +
        "against (the q57/q73 discipline)."
    ) { (s, dir) =>
      val byLang = Window.partitionBy("lang")
      novScores(s, dir)
        .withColumn("rk", row_number().over(byLang.orderBy(col("bp"), col("doc_id"))))
        .withColumn("nl", count(lit(1)).over(byLang))
        .withColumn("bid", expr("(3 * (rk - 1)) div nl"))
        .groupBy(col("lang"),
          element_at(array(lit("head"), lit("middle"), lit("tail")),
            col("bid").cast("int") + 1).as("bucket"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_bigrams")).as("mass_bigrams"),
          min(col("bp")).as("bp_min"),
          max(col("bp")).as("bp_max"))
        .orderBy("lang", "bucket")
    },

    GraftQuery(
      "q239b_perplexity_buckets_hist",
      Some(s"""$novSqlCtes, hist AS (
              |  SELECT lang, bp, CAST(count(*) AS BIGINT) c,
              |         CAST(sum(n_bigrams) AS BIGINT) sbg
              |  FROM nov GROUP BY lang, bp
              |), cum AS (
              |  SELECT *, sum(c) OVER (PARTITION BY lang ORDER BY bp) cc,
              |         sum(c) OVER (PARTITION BY lang) n
              |  FROM hist
              |), cuts AS (
              |  SELECT *,
              |    min(CASE WHEN cc >= (n + 2) // 3 THEN bp END)
              |      OVER (PARTITION BY lang) c1,
              |    min(CASE WHEN cc >= (2 * n + 2) // 3 THEN bp END)
              |      OVER (PARTITION BY lang) c2
              |  FROM cum
              |), lab AS (
              |  SELECT lang,
              |    CASE WHEN bp <= c1 THEN 'head'
              |         WHEN bp <= c2 THEN 'middle' ELSE 'tail' END AS bucket,
              |    bp, c, sbg
              |  FROM cuts
              |)
              |SELECT lang, bucket, CAST(sum(c) AS BIGINT) AS n_docs,
              |       CAST(sum(sbg) AS BIGINT) AS mass_bigrams,
              |       CAST(min(bp) AS BIGINT) AS bp_min,
              |       CAST(max(bp) AS BIGINT) AS bp_max
              |FROM lab GROUP BY lang, bucket
              |ORDER BY lang, bucket""".stripMargin),
      "q239's documented 100 TB swap, made real AND oracle-exact: because " +
        "the LM score is an integer on a BOUNDED domain (micros, ≤ 1e6+1 " +
        "values), the per-lang histogram over bp is not a sketch — it is " +
        "a lossless, MERGEABLE summary (partial aggregation collapses " +
        "each map partition to at most the domain size per lang), and " +
        "the tercile cuts c1/c2 are the smallest scores whose cumulative " +
        "count reaches ceil(n/3) and ceil(2n/3). Allocation is whole-" +
        "bucket: every document with the same score lands in the same " +
        "tercile, so buckets wobble from exact thirds only by tie-bucket " +
        "mass (RefineSpec bounds the wobble by the cut buckets' sizes " +
        "against q239's exact ranks) — the price for deleting q239's " +
        "per-lang DOCUMENT sort: here the windows run over the O(langs × " +
        "score-domain) histogram, never the corpus, so no billion-doc " +
        "stratum ever funnels through one partition. Same nov pipeline " +
        "as q239 (shared novScores / novSqlCtes — a score tweak moves " +
        "both forms together); both engines replay the cut rule integer-" +
        "exactly, so unlike a t-digest quantile this scale path needs no " +
        "tolerance band anywhere."
    ) { (s, dir) =>
      val byLang = Window.partitionBy("lang")
      val hist = novScores(s, dir)
        .groupBy("lang", "bp")
        .agg(count(lit(1)).cast("long").as("c"),
          sum("n_bigrams").cast("long").as("sbg"))
      val cum = hist
        .withColumn("cc", sum("c").over(byLang.orderBy("bp")))
        .withColumn("n", sum("c").over(byLang))
      val cuts = cum
        .withColumn("c1",
          min(when(col("cc") >= expr("(n + 2) div 3"), col("bp"))).over(byLang))
        .withColumn("c2",
          min(when(col("cc") >= expr("(2 * n + 2) div 3"), col("bp"))).over(byLang))
      cuts
        .select(col("lang"),
          when(col("bp") <= col("c1"), "head")
            .when(col("bp") <= col("c2"), "middle")
            .otherwise("tail").as("bucket"),
          col("bp"), col("c"), col("sbg"))
        .groupBy("lang", "bucket")
        .agg(sum("c").cast("long").as("n_docs"),
          sum("sbg").cast("long").as("mass_bigrams"),
          min("bp").cast("long").as("bp_min"),
          max("bp").cast("long").as("bp_max"))
        .orderBy("lang", "bucket")
    },

    GraftQuery(
      "q240_intradoc_repeat_scrub",
      Some("""WITH t AS (
             |  SELECT doc_id, string_split(lower(text), ' ') w FROM documents
             |  WHERE len(string_split(lower(text), ' ')) >= 3
             |), g AS (
             |  SELECT doc_id, CAST(len(w) AS BIGINT) AS n_tokens,
             |         list_transform(range(1, len(w) - 1),
             |           i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]) AS grams
             |  FROM t
             |), r AS (
             |  SELECT doc_id, n_tokens,
             |         CAST(len(grams) AS BIGINT) AS n_grams,
             |         list_filter(range(1, len(grams) + 1),
             |           i -> list_position(grams, grams[i]) < i) AS rep
             |  FROM g
             |), m AS (
             |  SELECT doc_id, n_tokens, n_grams,
             |         CAST(len(rep) AS BIGINT) AS n_repeat,
             |         CAST(len(list_distinct(flatten(list_transform(rep,
             |                i -> range(i, i + 3))))) AS BIGINT) AS removed_tokens
             |  FROM r
             |)
             |SELECT doc_id, n_tokens, n_grams, n_repeat, removed_tokens,
             |       (1000000 * (n_tokens - removed_tokens)) // n_tokens AS kept_ppm
             |FROM m ORDER BY doc_id""".stripMargin),
      "Within-document repeated-span scrub — the intra-doc counterpart of " +
        "q114's corpus-wide exact-substring dedup and the REMOVAL form of " +
        "q227's repetition profile (Gopher profiles and gates; this " +
        "operator reports exactly which token mass a scrub would delete): " +
        "a 3-gram occurrence is a repeat iff the identical 3 consecutive " +
        "tokens appeared earlier in the SAME document, and the removed " +
        "mass is the union of the repeats' [i, i+2] spans, overlap " +
        "counted once. The entire computation is row-local array " +
        "algebra — token hashes, gram hashes, first-occurrence via " +
        "array_position, span union via flatten+distinct — so the plan " +
        "is scan → project → presentation sort: ZERO data shuffles, " +
        "embarrassingly parallel at any corpus size, the ideal 100 TB " +
        "shape (the within-doc first-occurrence scan is quadratic only " +
        "in DOCUMENT length, which the ingest gate bounds — corpus size " +
        "never enters). Hashed grams keep the strings from " +
        "materializing; q99's zero-collision evidence covers the same " +
        "xxhash64 composite."
    ) { (s, dir) =>
      val w = split(lower(col("text")), " ")
      Tables.documents(s, dir)
        .filter(size(w) >= 3)
        .select(col("doc_id"), transform(w, t => xxhash64(t)).as("hw"))
        .select(col("doc_id") +: triGramCols: _*)
        .select(col("doc_id"), col("n_tokens"),
          size(col("g")).cast("long").as("n_grams"),
          filter(sequence(lit(1), size(col("g"))),
            i => array_position(col("g"), element_at(col("g"), i)) < i).as("rep"))
        .select(col("doc_id"), col("n_tokens"), col("n_grams"),
          size(col("rep")).cast("long").as("n_repeat"),
          size(array_distinct(flatten(transform(col("rep"),
            i => sequence(i, i + 2))))).cast("long").as("removed_tokens"))
        .withColumn("kept_ppm",
          expr("(1000000 * (n_tokens - removed_tokens)) div n_tokens"))
        .orderBy("doc_id")
    },

    GraftQuery(
      "q241_ivf_drift_audit",
      Some(s"""${SelectionQueries.assignedSql}, cell AS (
              |  SELECT cent_id,
              |         CAST(sum(CASE WHEN vec_id % 2 = 0 THEN 1 ELSE 0 END)
              |           AS BIGINT) AS n_old,
              |         CAST(sum(CASE WHEN vec_id % 2 = 1 THEN 1 ELSE 0 END)
              |           AS BIGINT) AS n_new
              |  FROM assigned GROUP BY cent_id
              |), tot AS (
              |  SELECT CAST(sum(n_old) AS BIGINT) AS t_old,
              |         CAST(sum(n_new) AS BIGINT) AS t_new
              |  FROM cell
              |), p AS (
              |  SELECT c.cent_id, c.n_old, c.n_new,
              |         (1000000 * c.n_old) // nullif(t.t_old, 0) AS ppm_old,
              |         (1000000 * c.n_new) // nullif(t.t_new, 0) AS ppm_new
              |  FROM cell c, tot t
              |)
              |SELECT cent_id, n_old, n_new, ppm_old, ppm_new,
              |       abs(ppm_new - ppm_old) AS shift_ppm,
              |       (abs(ppm_new - ppm_old) > $RebalancePpm) AS rebalance
              |FROM p ORDER BY cent_id""".stripMargin),
      "IVF index-maintenance drift audit: as the corpus grows, the " +
        "coarse-quantizer cells trained on yesterday's distribution " +
        "drift — cells bloat or empty, and both probe cost and recall " +
        "degrade. This operator splits the corpus into epochs (even " +
        "vec_id = indexed baseline, odd = new arrivals — in production " +
        "the epoch is an ingest-date column), assigns BOTH through the " +
        "frozen q66 centroid rule (`SelectionQueries.assigned`, the one " +
        "assignment pipeline shared by retrieval/SemDeDup/pruning — the " +
        "monitor watches the index the engine actually serves), and " +
        "reports per-cell mass in integer ppm of each epoch with a 2% " +
        "shift flag — the classic retrain-the-quantizer trigger. Plan: " +
        "broadcast centroids, map-side max_by assignment (no shuffle to " +
        "assign), ONE cells-sized aggregate; the epoch totals ride a " +
        "single-series window over that aggregate (q135's post-agg " +
        "pattern) — the single partition holds index METADATA, thousands " +
        "of cells at 100 TB, never corpus rows, so nothing scales with " +
        "corpus size except the embarrassingly parallel assignment scan. " +
        "Integer ppm via div keeps both engines bit-identical; nullif " +
        "guards the single-epoch degenerate corpus."
    ) { (s, dir) =>
      val a = SelectionQueries.assigned(s, dir).select(col("vec_id"), col("cent_id"))
      ivfDriftFromCells(a.groupBy("cent_id").agg(
        sum(when(col("vec_id") % 2 === 0, 1L).otherwise(0L)).as("n_old"),
        sum(when(col("vec_id") % 2 === 1, 1L).otherwise(0L)).as("n_new")))
    },

    GraftQuery(
      "q243_shuffle_shard_interleave",
      Some("""WITH h AS (
             |  SELECT doc_id,
             |    ((doc_id % 2147483647) * 1103515245 + 12345 + 9)
             |      % 2147483647 AS r1
             |  FROM documents
             |), s AS (
             |  SELECT doc_id, r1 % 8 AS shard,
             |    (r1 * 1103515245 + 12345) % 2147483647 AS r2
             |  FROM h
             |), p AS (
             |  SELECT doc_id, shard, r2,
             |    CAST(row_number() OVER (PARTITION BY shard
             |      ORDER BY r2, doc_id) - 1 AS BIGINT) AS pos_in_shard
             |  FROM s
             |)
             |SELECT doc_id, shard, pos_in_shard,
             |       pos_in_shard * 8 + shard AS global_pos
             |FROM p ORDER BY doc_id""".stripMargin),
      "Reproducible epoch shuffle in the WebDataset / tf.data " +
        "shuffle-shard-interleave shape: an LCG keyed on doc_id (epoch 9 " +
        "folds into the seed addend — a new epoch is a new addend, " +
        "nothing recomputes but the keys) assigns each document to one " +
        "of 8 shards, a SECOND LCG pass orders documents within their " +
        "shard, and the global training position is pure arithmetic — " +
        "pos_in_shard x 8 + shard, the round-robin interleave a loader " +
        "reading shards in lockstep would produce. The whole point is " +
        "what is ABSENT: a naive reproducible shuffle is ORDER BY " +
        "hash(id) — one global 100 TB sort — while here the only data " +
        "movement is the 8-way (production: thousands-way) shard " +
        "exchange and per-shard sorts that parallelize perfectly, and " +
        "the written shards ARE the training artifacts a streaming " +
        "loader consumes. Interleaved positions are injective but leave " +
        "tail gaps when shards are unbalanced — real interleave " +
        "semantics (order is the contract, not density). Same LCG " +
        "family as q228/q66 with the documented i64 range contract."
    ) { (s, dir) =>
      val M = 2147483647L; val A = 1103515245L; val C = 12345L
      val h = Tables.documents(s, dir)
        .select(col("doc_id"),
          (((col("doc_id") % M) * A + C + 9L) % M).as("r1"))
      val sh = h.select(col("doc_id"), (col("r1") % 8L).as("shard"),
        ((col("r1") * A + C) % M).as("r2"))
      sh.withColumn("pos_in_shard",
        (row_number().over(Window.partitionBy("shard")
          .orderBy(col("r2"), col("doc_id"))) - 1).cast("long"))
        .select(col("doc_id"), col("shard"), col("pos_in_shard"),
          (col("pos_in_shard") * 8L + col("shard")).as("global_pos"))
        .orderBy("doc_id")
    },

    GraftQuery(
      "q245_pq_drift_audit",
      Some(s"""${SimilarityQueries.pqAsgSqlCtes}, best AS (
              |  SELECT vec_id, m, l2 FROM (
              |    SELECT *, row_number() OVER (PARTITION BY vec_id, m
              |                                 ORDER BY l2, cent_id DESC) rn
              |    FROM asg
              |  ) WHERE rn = 1
              |), er AS (
              |  SELECT vec_id, m, CAST(floor(l2 * 1000000) AS BIGINT) err_u
              |  FROM best
              |), cell AS (
              |  SELECT m,
              |    CAST(sum(CASE WHEN vec_id % 2 = 0 THEN 1 ELSE 0 END)
              |      AS BIGINT) n_old,
              |    CAST(sum(CASE WHEN vec_id % 2 = 1 THEN 1 ELSE 0 END)
              |      AS BIGINT) n_new,
              |    CAST(sum(CASE WHEN vec_id % 2 = 0 THEN err_u ELSE 0 END)
              |      AS BIGINT) e_old,
              |    CAST(sum(CASE WHEN vec_id % 2 = 1 THEN err_u ELSE 0 END)
              |      AS BIGINT) e_new
              |  FROM er GROUP BY m
              |)
              |SELECT m, n_old, n_new,
              |  e_old // nullif(n_old, 0) AS merr_old_u,
              |  e_new // nullif(n_new, 0) AS merr_new_u,
              |  abs(e_new // nullif(n_new, 0) - e_old // nullif(n_old, 0))
              |    AS shift_u,
              |  (abs(e_new // nullif(n_new, 0) - e_old // nullif(n_old, 0))
              |    * $PqDriftDenom > e_old // nullif(n_old, 0)) AS retrain
              |FROM cell ORDER BY m""".stripMargin),
      "PQ codebook drift audit — q241's sibling for the OTHER index: as " +
        "new data arrives, a product-quantizer trained on yesterday's " +
        "distribution reconstructs today's vectors worse, and ADC " +
        "scores degrade silently (retrieval still returns k results — " +
        "only an error monitor notices). Per subspace, every vector's " +
        "quantization error (L2 to its assigned codebook entry — the " +
        "SAME `pqAsgSqlCtes` assignment q236's index build executes, so " +
        "the monitor watches the codebook the scan actually uses) is " +
        "floored to integer MICROS before summing: double errors are " +
        "deterministic per row (fixed fold order) but a float SUM " +
        "would be reduction-order-dependent across partitions — the " +
        "floor-then-integer-sum makes the aggregate bit-exact on any " +
        "engine at any parallelism. Epochs split by vec_id parity " +
        "(production: ingest date), and a subspace flags retrain when " +
        "its mean error shifts by more than 2.5% RELATIVE between epochs " +
        "(an absolute micros cut would saturate or go dead under a " +
        "different embedding normalization). " +
        "Scale: one decomposition scan, broadcast codebook, partial-agg " +
        "collapse to 4 rows — the audit costs ONE assignment pass, " +
        "which the nightly index rebuild already pays; nullif guards " +
        "the single-epoch degenerate corpus through both engines' " +
        "NULL-comparison semantics."
    ) { (s, dir) =>
      pqErrU(s, dir).groupBy("m").agg(
        sum(when(col("vec_id") % 2 === 0, 1L).otherwise(0L)).as("n_old"),
        sum(when(col("vec_id") % 2 === 1, 1L).otherwise(0L)).as("n_new"),
        sum(when(col("vec_id") % 2 === 0, col("err_u")).otherwise(0L)).as("e_old"),
        sum(when(col("vec_id") % 2 === 1, col("err_u")).otherwise(0L)).as("e_new"))
        .select(col("m").cast("long").as("m"), col("n_old"), col("n_new"),
          expr("e_old div nullif(n_old, 0)").as("merr_old_u"),
          expr("e_new div nullif(n_new, 0)").as("merr_new_u"))
        .withColumn("shift_u", abs(col("merr_new_u") - col("merr_old_u")))
        .withColumn("retrain", col("shift_u") * PqDriftDenom > col("merr_old_u"))
        .orderBy("m")
    }
  )

  /** The q239/q239b scoring pipeline — (doc_id, lang, n_bigrams, bp): q99's
    * rare-bigram rate in basis points per document, staged token hashes,
    * docs under 2 tokens excluded. ONE definition feeds both the exact-rank
    * and the histogram-cut tercile forms. */
  private def novScores(s: SparkSession, dir: String): DataFrame = {
    val w = split(lower(col("text")), " ")
    // stage the token-hash array BEFORE indexing (the q64 lesson:
    // inlined, element_at re-evaluates the transform at every site)
    val st = Tables.documents(s, dir)
      .filter(size(w) >= 2)
      .select(col("doc_id"), col("lang"), transform(w, t => xxhash64(t)).as("hw"))
      .select(col("doc_id"), col("lang"),
        explode(transform(sequence(lit(1), size(col("hw")) - 1),
          i => xxhash64(element_at(col("hw"), i), element_at(col("hw"), i + 1))))
          .as("s"))
      // materialized once — count side and scoring join both read the
      // staged gram stream instead of re-running the tokenize+hash pass
      // (q99's staged-stream posture; serves q239 AND q239b)
      .staged
    val cnt = st.groupBy("s").agg(count(lit(1)).as("c"))
    st.join(cnt, "s")
      .groupBy("doc_id", "lang")
      .agg(count(lit(1)).as("n_bigrams"),
        sum(col("c")).as("sum_c"))
      .select(col("doc_id"), col("lang"), col("n_bigrams"),
        expr("(1000000 * n_bigrams) div sum_c").as("bp"))
  }

  /** [[novScores]] in the oracles' dialect, ending at the `nov` CTE.
    * `lazy` because `all`'s initializer interpolates it and this object
    * initializes top-down — a plain val would still be null there. */
  private lazy val novSqlCtes: String =
    """WITH t AS (
      |  SELECT doc_id, lang, string_split(lower(text), ' ') w FROM documents
      |  WHERE len(string_split(lower(text), ' ')) >= 2
      |), st AS (
      |  SELECT doc_id, lang, unnest(list_transform(range(1, len(w)),
      |           i -> w[i] || ' ' || w[i+1])) s
      |  FROM t
      |), cnt AS (
      |  SELECT s, count(*) c FROM st GROUP BY s
      |), nov AS (
      |  SELECT st.doc_id, st.lang,
      |         CAST(count(*) AS BIGINT) AS n_bigrams,
      |         (1000000 * count(*)) // sum(cnt.c) AS bp
      |  FROM st JOIN cnt USING (s)
      |  GROUP BY st.doc_id, st.lang
      |)""".stripMargin

  /** q241's pre-aggregation feed — (vec_id, cent_id) through the frozen
    * shared centroid assignment: the rows the streaming monitor
    * (`StatefulOps.ivfCellTws`) consumes, so the live and nightly
    * monitors watch identical assignment arithmetic (the pqErrU
    * discipline applied to the IVF index). */
  private[graft] def ivfCellArrivals(s: SparkSession, dir: String): DataFrame =
    SelectionQueries.assigned(s, dir).select(col("vec_id"), col("cent_id"))

  /** q241's drift reading over a per-cell count frame `(cent_id, n_old,
    * n_new)`: epoch shares in integer ppm plus the 2% rebalance flag. ONE
    * definition serves batch q241 and the streaming monitor
    * (`StatefulOps.ivfCellTws` emits exactly these count rows; its final
    * reading through this finisher equals the batch audit row-for-row —
    * StreamingOpsSpec pins it). The windows run over the cells-sized
    * frame — index METADATA, never corpus rows. */
  private[graft] def ivfDriftFromCells(cells: DataFrame): DataFrame = {
    val all = Window.partitionBy(lit(1))
    cells
      .withColumn("t_old", sum(col("n_old")).over(all))
      .withColumn("t_new", sum(col("n_new")).over(all))
      .select(col("cent_id"), col("n_old"), col("n_new"),
        expr("(1000000 * n_old) div nullif(t_old, 0)").as("ppm_old"),
        expr("(1000000 * n_new) div nullif(t_new, 0)").as("ppm_new"))
      .withColumn("shift_ppm", abs(col("ppm_new") - col("ppm_old")))
      .withColumn("rebalance", col("shift_ppm") > RebalancePpm)
      .orderBy("cent_id")
  }

  /** q245's pre-aggregation rows — (vec_id, m, err_u): each vector's
    * quantization error against its assigned (min-L2, ties to larger id)
    * codebook entry in one strided subspace, floored to integer micros.
    * Shared by batch q245 and the streaming monitor's feed
    * (`StatefulOps.pqDriftTws` — StreamingOpsSpec stages these exact rows),
    * so the live and nightly monitors watch identical arithmetic. */
  private[graft] def pqErrU(s: SparkSession, dir: String): DataFrame = {
    // native fused Σ(a−b)² — see pqCodesFrom: the HOF form is interpreted
    // per (sub-vector × codebook row); values are bit-identical
    val l2 = graft.functions.VectorFunctions.sqdistd(col("sv"), col("csub"))
    SimilarityQueries.pqSubs(s, dir)
      .join(broadcast(SimilarityQueries.pqCodebook(s, dir)), "m")
      .select(col("vec_id"), col("m"), l2.as("l2"), col("cent_id"))
      .groupBy("vec_id", "m")
      // k=1 heap argmin — (−l2 DESC, −cent ASC) is min(struct(l2, negc));
      // the winning error is recovered from the heap's score
      .agg(graft.functions.Sketches.topPairs(-col("l2"), -col("cent_id"), 1)
        .as("tp"))
      .select(col("vec_id"), col("m").cast("long").as("m"),
        floor(-element_at(col("tp.score"), 1) * 1000000d).cast("long")
          .as("err_u"))
  }

  /** q240's staged gram projection: n_tokens plus the hashed-3-gram array,
    * built from the staged token-hash column so each token hashes once.
    * 3-gram granularity keeps the repeat machinery LIVE on the synthetic
    * corpus (5-grams never repeat within a document there — the fence
    * would pass vacuously); production scrubs raise the order. */
  private def triGramCols: Seq[org.apache.spark.sql.Column] = Seq(
    size(col("hw")).cast("long").as("n_tokens"),
    transform(sequence(lit(1), size(col("hw")) - 2),
      i => xxhash64(element_at(col("hw"), i), element_at(col("hw"), i + 1),
        element_at(col("hw"), i + 2))).as("g"))
}
