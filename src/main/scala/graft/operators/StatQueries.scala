package graft.operators

import graft.{GraftQuery, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Statistical diagnostics over facts and corpora: smoothing, change-point
  * detection, inequality/concentration indices, rank-frequency laws and
  * positional statistics (SURVEY.md §2.2 "statistical audits").
  *
  * Scale design: the recurring shape is fact → map-side-combined aggregate →
  * order statistics on the dimension-sized result. Order-dependent math
  * (running sums, ranks, lags) only ever runs AFTER the aggregate, where the
  * frame is |days|/|suppliers|/|vocab|-sized; every ratio is integer
  * ppm/micros by truncating division (both engines truncate toward zero),
  * and sequential recurrences are reformulated closed-form (EWMA as a
  * dyadic-weight lag dot-product, CUSUM as n·prefix − t·total) so no
  * iterative state survives between rows.
  */
object StatQueries {

  val all: Seq[GraftQuery] = Seq(

    GraftQuery(
      "q194_ewma_dyadic",
      Some {
        val terms = (0 to 7).map { k =>
          val v = if (k == 0) "v" else s"lag(v, $k) OVER uw"
          (s"coalesce($v, 0) * ${1L << (7 - k)}",
            s"CASE WHEN $v IS NOT NULL THEN ${1L << (7 - k)} ELSE 0 END)")
        }
        val num = terms.map(_._1).mkString(" + ")
        val den = terms.map(_._2.stripSuffix(")")).mkString(" + ")
        s"""WITH e AS (
           |  SELECT user_id, ts, event_id,
           |         CAST(floor(value * 1000000) AS BIGINT) AS v
           |  FROM events
           |), l AS (
           |  SELECT user_id, v,
           |         CAST($num AS BIGINT) AS num,
           |         CAST($den AS BIGINT) AS den,
           |         row_number() OVER (PARTITION BY user_id
           |                            ORDER BY ts DESC, event_id DESC) AS rk,
           |         CAST(count(*) OVER (PARTITION BY user_id) AS BIGINT) AS n_events
           |  FROM e
           |  WINDOW uw AS (PARTITION BY user_id ORDER BY ts, event_id)
           |)
           |SELECT user_id, n_events, v AS last_micros,
           |       CAST(num // den AS BIGINT) AS ewma_micros
           |FROM l WHERE rk = 1 ORDER BY user_id""".stripMargin
      },
      "Per-user EWMA of event value, closed-form: the exponential " +
        "recurrence y_t = αx_t + (1−α)y_{t−1} is unrolled with dyadic " +
        "weights (α=1/2 ⇒ weight 2^(7−k) on lag k, window depth 8 — " +
        "beyond that the weight is below micro resolution), so the " +
        "'recursive' smoother becomes eight lag() reads over ONE " +
        "per-user sort — no sequential state, no UDAF, bit-identical " +
        "at any parallelism because the weights and division are " +
        "integers. The denominator sums only the weights of lags that " +
        "exist, so short histories normalize exactly. One exchange on " +
        "user_id serves the lag window, the latest-row pick and the " +
        "per-user count; at 100 TB the user partitioning is the same " +
        "exchange every per-user feature query already pays."
    ) { (s, dir) =>
      val uw = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val v = expr("CAST(floor(value * 1000000) AS BIGINT)")
      val lags = (0 to 7).map { k =>
        val vk = if (k == 0) col("v") else lag(col("v"), k).over(uw)
        (coalesce(vk, lit(0L)) * lit(1L << (7 - k)),
          when(vk.isNotNull, lit(1L << (7 - k))).otherwise(lit(0L)))
      }
      Tables.events(s, dir)
        .select(col("user_id"), col("ts"), col("event_id"), v.as("v"))
        .withColumn("num", lags.map(_._1).reduce(_ + _))
        .withColumn("den", lags.map(_._2).reduce(_ + _))
        .withColumn("rk", row_number().over(
          Window.partitionBy("user_id").orderBy(col("ts").desc, col("event_id").desc)))
        .withColumn("n_events", count(lit(1)).over(Window.partitionBy("user_id")))
        .filter(col("rk") === 1)
        .select(col("user_id"), col("n_events"), col("v").as("last_micros"),
          expr("num div den").as("ewma_micros"))
        .orderBy("user_id")
    },

    GraftQuery(
      "q195_cusum_changepoint",
      Some("""WITH d AS (
             |  SELECT CAST(o_orderdate AS DATE) AS day,
             |         CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
             |  FROM orders GROUP BY 1
             |), s AS (
             |  SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(cents) AS BIGINT) AS tot
             |  FROM d
             |), c AS (
             |  SELECT day, cents,
             |         CAST(sum(cents) OVER (ORDER BY day
             |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |              AS BIGINT) AS pref,
             |         CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS t
             |  FROM d
             |)
             |SELECT day, cents,
             |       CAST((s.n * pref - t * s.tot) // s.n AS BIGINT) AS cusum_cents
             |FROM c, s
             |ORDER BY abs((s.n * pref - t * s.tot) // s.n) DESC, day
             |LIMIT 10""".stripMargin),
      "CUSUM change-point scan over the daily revenue series: the " +
        "classic mean-shift statistic Σ(x_i − mean) is algebraically " +
        "n·prefix_t − t·total (cross-multiplied to dodge the float " +
        "mean — q189's trick applied to a running sum), so the whole " +
        "detector is one running-sum window over the |days|-sized " +
        "daily aggregate plus a broadcast 1-row (n, total). The days " +
        "with extreme |CUSUM| are where the level shifted — the " +
        "volume-regression alarm a pipeline runs on ingest counts. " +
        "Fact → daily agg is map-side combined; everything ordered " +
        "runs post-agg (unpartitioned window over ~2400 day rows — " +
        "dimension-sized, fine); top-10 is a TakeOrderedAndProject heap."
    ) { (s, dir) =>
      val d = Tables.orders(s, dir)
        .groupBy(col("o_orderdate").cast("date").as("day"))
        .agg(sum(expr("CAST(floor(o_totalprice * 100) AS BIGINT)")).as("cents"))
      val stats = d.agg(count(lit(1)).as("n"), sum("cents").as("tot"))
      d.withColumn("pref", sum("cents").over(
          Window.orderBy("day").rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("t", row_number().over(Window.orderBy("day")).cast("long"))
        .crossJoin(broadcast(stats))
        .select(col("day"), col("cents"),
          expr("(n * pref - t * tot) div n").as("cusum_cents"))
        .orderBy(abs(col("cusum_cents")).desc, col("day"))
        .limit(10)
    },

    GraftQuery(
      "q196_gini_supplier",
      Some("""WITH sr AS (
             |  SELECT s_nationkey, l_suppkey,
             |         CAST(sum(CAST(floor(l_extendedprice) AS BIGINT)) AS BIGINT) AS rev
             |  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
             |  GROUP BY 1, 2
             |), r AS (
             |  SELECT s_nationkey, rev,
             |         CAST(row_number() OVER (PARTITION BY s_nationkey
             |                                 ORDER BY rev, l_suppkey) AS BIGINT) AS i
             |  FROM sr
             |), g AS (
             |  SELECT s_nationkey, CAST(count(*) AS BIGINT) AS n,
             |         CAST(sum(rev) AS BIGINT) AS tot,
             |         CAST(sum(i * rev) AS BIGINT) AS w
             |  FROM r GROUP BY 1
             |)
             |SELECT n_name, n AS n_suppliers, tot AS total_dollars,
             |       CAST((2 * w - (n + 1) * tot) * 1000000 // (n * tot) AS BIGINT)
             |         AS gini_ppm
             |FROM g JOIN nation ON s_nationkey = n_nationkey
             |ORDER BY n_name""".stripMargin),
      "Gini concentration of supplier revenue per nation — the " +
        "inequality complement to q185's HHI: Gini needs ORDER " +
        "statistics (rank-weighted sum 2Σi·x_i), so revenue first " +
        "collapses to one row per supplier (map-side combined, the " +
        "only fact-sized move), ranks come from a per-nation window " +
        "over that |suppliers|-sized frame (ties broken by suppkey — " +
        "total order, so the rank-weighted sum is deterministic), and " +
        "the closed form divides cross-multiplied BIGINTs into exact " +
        "ppm. Dollars (not cents) keep Σi·x_i far from 2^63. The same " +
        "shape measures corpus-source token inequality at 100 TB — " +
        "swap supplier for source, revenue for token count."
    ) { (s, dir) =>
      val sr = Tables.lineitem(s, dir)
        .join(broadcast(Tables.supplier(s, dir)),
          col("l_suppkey") === col("s_suppkey"))
        .groupBy("s_nationkey", "l_suppkey")
        .agg(sum(expr("CAST(floor(l_extendedprice) AS BIGINT)")).as("rev"))
      val r = sr.withColumn("i", row_number().over(
        Window.partitionBy("s_nationkey").orderBy("rev", "l_suppkey")).cast("long"))
      r.groupBy("s_nationkey")
        .agg(count(lit(1)).as("n"), sum("rev").as("tot"),
          sum(col("i") * col("rev")).as("w"))
        .join(broadcast(Tables.nation(s, dir)),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("n_name"), col("n").as("n_suppliers"),
          col("tot").as("total_dollars"),
          expr("(2 * w - (n + 1) * tot) * 1000000 div (n * tot)").as("gini_ppm"))
        .orderBy("n_name")
    },

    GraftQuery(
      "q197_zipf_check",
      Some("""WITH t AS (
             |  SELECT string_split(lower(text), ' ') w FROM documents
             |), f AS (
             |  SELECT token, CAST(count(*) AS BIGINT) AS freq
             |  FROM (SELECT unnest(w) AS token FROM t) GROUP BY token
             |), r AS (
             |  SELECT token, freq,
             |         CAST(row_number() OVER (ORDER BY freq DESC, token) AS BIGINT) AS rnk
             |  FROM f
             |  QUALIFY rnk <= 20
             |), m AS (
             |  SELECT CAST(sum(CASE WHEN q IN (10, 11) THEN p ELSE 0 END) AS BIGINT) AS med2
             |  FROM (SELECT rnk * freq AS p,
             |               row_number() OVER (ORDER BY rnk * freq, rnk) AS q
             |        FROM r)
             |)
             |SELECT token, freq, rnk, CAST(rnk * freq AS BIGINT) AS rf,
             |       CAST((2 * rnk * freq - med2) * 1000000 // nullif(med2, 0)
             |         AS BIGINT) AS dev_ppm
             |FROM r, m ORDER BY rnk""".stripMargin),
      "Zipf rank-frequency diagnostic, log-free: under Zipf's law " +
        "rank×frequency is constant, so instead of fitting a log-log " +
        "slope (libm — banned from oracle-checked columns), each " +
        "top-20 token reports its rank·freq product's deviation from " +
        "the MEDIAN product in ppm (median of 20 = doubled-median sum " +
        "of order stats 10+11, kept integer; deviations compare 2·rf " +
        "against it). Corpus explodes once into the token-count " +
        "aggregate — the only wide move, map-side combined; ranking, " +
        "median and deviations all run on the |vocab|-sized frame " +
        "(≤ a few k rows even at 100 TB after the count). A healthy " +
        "natural-language corpus shows |dev| small and systematic; " +
        "boilerplate-heavy or synthetic text breaks the law loudly."
    ) { (s, dir) =>
      val f = Tables.documents(s, dir)
        .select(explode(split(lower(col("text")), " ")).as("token"))
        .groupBy("token").agg(count(lit(1)).as("freq"))
      val r = f.withColumn("rnk",
          row_number().over(Window.orderBy(col("freq").desc, col("token"))).cast("long"))
        .filter(col("rnk") <= 20)
      val m = r.select((col("rnk") * col("freq")).as("p"))
        .withColumn("q", row_number().over(Window.orderBy(col("p"), col("p"))))
        .agg(sum(when(col("q").isin(10, 11), col("p")).otherwise(0L)).as("med2"))
      r.crossJoin(broadcast(m))
        .select(col("token"), col("freq"), col("rnk"),
          (col("rnk") * col("freq")).as("rf"),
          // nullif guard (the q148/q191 ppm rule): a vocab smaller than the
          // order stats 10+11 leaves med2 = 0 — ANSI div would throw where
          // DuckDB // yields NULL; both engines now emit NULL dev_ppm
          expr("(2 * rnk * freq - med2) * 1000000 div nullif(med2, 0)")
            .as("dev_ppm"))
        .orderBy("rnk")
    },

    GraftQuery(
      "q198_lang_source_mismatch",
      Some("""WITH c AS (
             |  SELECT source, lang, CAST(count(*) AS BIGINT) AS cnt
             |  FROM documents GROUP BY 1, 2
             |), w AS (
             |  SELECT source, lang, cnt,
             |         CAST(sum(cnt) OVER (PARTITION BY source) AS BIGINT) AS n_docs,
             |         row_number() OVER (PARTITION BY source
             |                            ORDER BY cnt DESC, lang) AS rk
             |  FROM c
             |)
             |SELECT source, lang AS majority_lang, cnt AS n_majority, n_docs,
             |       CAST((n_docs - cnt) * 1000000 // n_docs AS BIGINT) AS mismatch_ppm
             |FROM w WHERE rk = 1 ORDER BY source""".stripMargin),
      "Cross-lingual contamination audit: each source's majority " +
        "language and the ppm of its documents that disagree — the " +
        "signal that a crawler mislabeled a site or a pipeline mixed " +
        "feeds. One map-side-combined count to (source, lang), then " +
        "the majority pick and the per-source total are two window " +
        "functions over the SAME per-source partitioning of that " +
        "|sources|×|langs| frame — one tiny exchange serves both; the " +
        "tie on equal counts breaks lexicographically, so the winner " +
        "is deterministic on both engines. The fact scan reads two " +
        "columns; nothing else moves."
    ) { (s, dir) =>
      val c = Tables.documents(s, dir)
        .groupBy("source", "lang").agg(count(lit(1)).as("cnt"))
      val bySource = Window.partitionBy("source")
      c.withColumn("n_docs", sum("cnt").over(bySource))
        .withColumn("rk", row_number().over(
          bySource.orderBy(col("cnt").desc, col("lang"))))
        .filter(col("rk") === 1)
        .select(col("source"), col("lang").as("majority_lang"),
          col("cnt").as("n_majority"), col("n_docs"),
          expr("(n_docs - cnt) * 1000000 div n_docs").as("mismatch_ppm"))
        .orderBy("source")
    },

    GraftQuery(
      "q199_token_burstiness",
      Some("""WITH t AS (
             |  SELECT string_split(lower(text), ' ') AS w FROM documents
             |), p AS (
             |  SELECT w[i] AS token,
             |         CAST((i - 1) * 1000000 // greatest(len(w) - 1, 1) AS BIGINT)
             |           AS pos_ppm
             |  FROM t, unnest(range(1, len(w) + 1)) AS r(i)
             |)
             |SELECT token, CAST(count(*) AS BIGINT) AS n_occ,
             |       CAST(sum(pos_ppm) // count(*) AS BIGINT) AS mean_pos_ppm,
             |       CAST(min(pos_ppm) AS BIGINT) AS min_pos_ppm,
             |       CAST(max(pos_ppm) AS BIGINT) AS max_pos_ppm
             |FROM p GROUP BY token
             |ORDER BY n_occ DESC, token LIMIT 15""".stripMargin),
      "Positional token statistics (burstiness / boilerplate signal): " +
        "each occurrence's relative position inside its document in " +
        "integer ppm (0 = doc start, 1e6 = doc end; single-token docs " +
        "guard the divisor), aggregated per token. A term whose mean " +
        "position pins near 0 with a tight range is a header/boiler- " +
        "plate candidate (q182's signature detection from a different " +
        "angle); uniform content words center near 500000. One " +
        "posexplode fan-out feeding a map-side-combined aggregate — " +
        "position arithmetic is row-local, the shuffle carries one row " +
        "per distinct token per partition, and top-15 is a heap, not a " +
        "global sort."
    ) { (s, dir) =>
      val toks = Tables.documents(s, dir)
        .select(posexplode(split(lower(col("text")), " ")).as(Seq("pos0", "token")),
          size(split(lower(col("text")), " ")).as("n"))
      toks
        .select(col("token"),
          expr("pos0 * 1000000 div greatest(n - 1, 1)").cast("long").as("pos_ppm"))
        .groupBy("token")
        .agg(count(lit(1)).as("n_occ"),
          expr("CAST(sum(pos_ppm) div count(1) AS BIGINT)").as("mean_pos_ppm"),
          min("pos_ppm").as("min_pos_ppm"), max("pos_ppm").as("max_pos_ppm"))
        .orderBy(col("n_occ").desc, col("token"))
        .limit(15)
    },

    GraftQuery(
      "q201_langid_eval",
      Some("""WITH t AS (
             |  SELECT doc_id, lang, string_split(lower(text), ' ') w FROM documents
             |), scored AS (
             |  SELECT doc_id, lang,
             |    len(list_filter(w, x -> list_contains(['the','a','and','of'], x))) n_en,
             |    len(list_filter(w, x -> list_contains(['el','la','de','y'], x)))   n_es,
             |    len(list_filter(w, x -> list_contains(['der','die','das','und'], x))) n_de,
             |    len(list_filter(w, x -> list_contains(['le','la','et','les'], x))) n_fr
             |  FROM t
             |), pred AS (
             |  SELECT lang AS true_lang,
             |    CASE WHEN n_en >= n_es AND n_en >= n_de AND n_en >= n_fr AND n_en > 0 THEN 'en'
             |         WHEN n_es >= n_de AND n_es >= n_fr AND n_es > 0 THEN 'es'
             |         WHEN n_de >= n_fr AND n_de > 0 THEN 'de'
             |         WHEN n_fr > 0 THEN 'fr'
             |         ELSE 'und' END AS pred_lang
             |  FROM scored
             |), cell AS (
             |  SELECT true_lang, pred_lang, CAST(count(*) AS BIGINT) AS n
             |  FROM pred GROUP BY 1, 2
             |)
             |SELECT true_lang, pred_lang, n,
             |       CAST(n * 1000000 // sum(n) OVER (PARTITION BY true_lang)
             |            AS BIGINT) AS recall_ppm,
             |       CAST(n * 1000000 // sum(n) OVER (PARTITION BY pred_lang)
             |            AS BIGINT) AS precision_ppm
             |FROM cell
             |ORDER BY true_lang, pred_lang""".stripMargin),
      "Classifier evaluation as an operator: the q45 language-ID " +
        "predictor scored against the corpus's ground-truth label in " +
        "one pass — confusion cells plus row-normalized (recall) and " +
        "column-normalized (precision) ppm, so the diagonal reads both " +
        "metrics directly and off-diagonal cells name the confusion " +
        "pairs. The fact-sized work is exactly q45's row-local marker " +
        "fold; the matrix is |langs|² rows, where the two marginal " +
        "windows cost nothing. Every ML-data pipeline needs this loop " +
        "— predict, cross-tabulate, normalize — and it is all " +
        "declarative: no collect, no driver-side sklearn."
    ) { (s, dir) =>
      import graft.functions.TextQueries.{markerCount, enM, esM, deM, frM}
      val w = split(lower(col("text")), " ")
      val scored = Tables.documents(s, dir).select(
        col("lang"),
        markerCount(w, enM).as("n_en"), markerCount(w, esM).as("n_es"),
        markerCount(w, deM).as("n_de"), markerCount(w, frM).as("n_fr"))
      val pred = scored.select(col("lang").as("true_lang"),
        when(col("n_en") >= col("n_es") && col("n_en") >= col("n_de") &&
          col("n_en") >= col("n_fr") && col("n_en") > 0, "en")
          .when(col("n_es") >= col("n_de") && col("n_es") >= col("n_fr") &&
            col("n_es") > 0, "es")
          .when(col("n_de") >= col("n_fr") && col("n_de") > 0, "de")
          .when(col("n_fr") > 0, "fr")
          .otherwise("und").as("pred_lang"))
      pred.groupBy("true_lang", "pred_lang").agg(count(lit(1)).as("n"))
        .withColumn("n_true", sum("n").over(Window.partitionBy("true_lang")))
        .withColumn("n_pred", sum("n").over(Window.partitionBy("pred_lang")))
        .select(col("true_lang"), col("pred_lang"), col("n"),
          expr("n * 1000000 div n_true").as("recall_ppm"),
          expr("n * 1000000 div n_pred").as("precision_ppm"))
        .orderBy("true_lang", "pred_lang")
    },

    GraftQuery(
      "q202_join_fanout_profile",
      Some("""WITH f AS (
             |  SELECT 'lineitem->orders' AS rel, l_orderkey AS k FROM lineitem
             |  UNION ALL
             |  SELECT 'lineitem->part', l_partkey FROM lineitem
             |  UNION ALL
             |  SELECT 'orders->customer', o_custkey FROM orders
             |), per AS (
             |  SELECT rel, k, CAST(count(*) AS BIGINT) AS fanout
             |  FROM f GROUP BY rel, k
             |)
             |SELECT rel, CAST(length(bin(fanout)) AS BIGINT) AS width,
             |       CAST(count(*) AS BIGINT) AS n_keys,
             |       CAST(sum(fanout) AS BIGINT) AS rows_covered,
             |       CAST(max(fanout) AS BIGINT) AS max_fanout
             |FROM per GROUP BY rel, width
             |ORDER BY rel, width""".stripMargin),
      "Join-fanout profiling — the statistic that DECIDES broadcast vs " +
        "shuffle vs salting for every join in this catalog: per foreign " +
        "key, the per-key row count, bucketed by power-of-two width " +
        "(floor(log2)+1 via the bit length of the binary string — no " +
        "logarithms), with keys/rows/max per bucket. A relationship " +
        "whose top bucket holds most rows is a skew-salting candidate " +
        "(q59); one whose key count is tiny is a broadcast candidate. " +
        "Each branch scans ONE key column (column-pruned), the per-key " +
        "count combines map-side, and the bucket rollup is " +
        "|keys|-sized. The union of three profiles shares one plan — " +
        "at 100 TB this runs as the nightly stats job feeding the " +
        "optimizer's own decisions."
    ) { (s, dir) =>
      val f = Tables.lineitem(s, dir)
        .select(lit("lineitem->orders").as("rel"), col("l_orderkey").as("k"))
        .unionAll(Tables.lineitem(s, dir)
          .select(lit("lineitem->part").as("rel"), col("l_partkey").as("k")))
        .unionAll(Tables.orders(s, dir)
          .select(lit("orders->customer").as("rel"), col("o_custkey").as("k")))
      f.groupBy("rel", "k").agg(count(lit(1)).as("fanout"))
        .groupBy(col("rel"), length(bin(col("fanout"))).cast("long").as("width"))
        .agg(count(lit(1)).as("n_keys"), sum("fanout").as("rows_covered"),
          max("fanout").as("max_fanout"))
        .orderBy("rel", "width")
    },

    GraftQuery(
      "q203_hierarchy_share",
      Some("""WITH rn AS (
             |  SELECT r_name, n_name,
             |         CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100)
             |                       AS BIGINT)) AS BIGINT) AS rev_cents
             |  FROM lineitem
             |  JOIN orders   ON l_orderkey = o_orderkey
             |  JOIN customer ON o_custkey = c_custkey
             |  JOIN nation   ON c_nationkey = n_nationkey
             |  JOIN region   ON n_regionkey = r_regionkey
             |  GROUP BY r_name, n_name
             |)
             |SELECT r_name, n_name, rev_cents,
             |       CAST(rev_cents * 1000000 // sum(rev_cents) OVER (PARTITION BY r_name)
             |            AS BIGINT) AS share_of_region_ppm,
             |       CAST(sum(rev_cents) OVER (PARTITION BY r_name) * 1000000
             |            // sum(rev_cents) OVER () AS BIGINT) AS region_share_ppm
             |FROM rn ORDER BY r_name, n_name""".stripMargin),
      "Hierarchical percent-of-parent rollup (nation share of region, " +
        "region share of world) — the drill-down tree every revenue " +
        "dashboard renders. One star-join aggregate collapses the fact " +
        "to |nations| rows (dims broadcast, q15's plan); both share " +
        "levels are windows OVER THAT 25-row frame — the region " +
        "partition and the global frame cost nothing post-agg, and " +
        "integer-cents revenue with ppm truncating division keeps " +
        "every level cross-engine exact. Contrast q143 (one-level " +
        "ratio-to-report): the two-level form needs no self-join " +
        "either — shares at every level of a hierarchy are stacked " +
        "windows, not joins."
    ) { (s, dir) =>
      val rn = Tables.lineitem(s, dir)
        .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(Tables.customer(s, dir)), col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, dir)), col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(sum(expr("CAST(floor(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)"))
          .as("rev_cents"))
      val byRegion = Window.partitionBy("r_name")
      val global = Window.rowsBetween(Window.unboundedPreceding,
        Window.unboundedFollowing)
      rn.withColumn("region_cents", sum("rev_cents").over(byRegion))
        .withColumn("total_cents", sum("rev_cents").over(global))
        .select(col("r_name"), col("n_name"), col("rev_cents"),
          expr("rev_cents * 1000000 div region_cents").as("share_of_region_ppm"),
          expr("region_cents * 1000000 div total_cents").as("region_share_ppm"))
        .orderBy("r_name", "n_name")
    },

    GraftQuery(
      "q204_regression_eval",
      Some("""WITH pts AS (
             |  SELECT c_mktsegment AS segment,
             |         CAST(floor(o_totalprice * 100) AS BIGINT) AS y
             |  FROM orders JOIN customer ON o_custkey = c_custkey
             |), m AS (
             |  SELECT segment, CAST(count(*) AS BIGINT) AS n,
             |         CAST(sum(y) AS BIGINT) AS s
             |  FROM pts GROUP BY segment
             |)
             |SELECT pts.segment, max(m.n) AS n,
             |       CAST(max(m.s) // max(m.n) AS BIGINT) AS mean_cents,
             |       CAST(sum(abs(m.n * pts.y - m.s)) // (max(m.n) * max(m.n))
             |            AS BIGINT) AS mae_cents,
             |       CAST(max(abs(m.n * pts.y - m.s)) // max(m.n) AS BIGINT)
             |         AS max_abs_resid_cents
             |FROM pts JOIN m ON pts.segment = m.segment
             |GROUP BY pts.segment
             |ORDER BY pts.segment""".stripMargin),
      "Regression-model evaluation (MAE / worst residual) for the " +
        "simplest model — predict every order at its segment mean — " +
        "the baseline any learned model must beat and the same metric " +
        "plumbing that scores it. Exactness trick: the residual " +
        "y − S/n is kept as the integer n·y − S (q189's cross-" +
        "multiplication), so MAE = Σ|n·y − S| / n² needs no float " +
        "mean and truncates identically on both engines. Two passes " +
        "by necessity (a mean-relative metric cannot be one " +
        "distributive aggregate): pass 1 is |segments| rows broadcast " +
        "back into pass 2's map side — the fact shuffles once per " +
        "pass on the segment key, nothing else moves. At 100 TB the " +
        "pass-1 result would persist as the model table."
    ) { (s, dir) =>
      val pts = Tables.orders(s, dir)
        .join(broadcast(Tables.customer(s, dir)
          .select("c_custkey", "c_mktsegment")),
          col("o_custkey") === col("c_custkey"))
        .select(col("c_mktsegment").as("segment"),
          expr("CAST(floor(o_totalprice * 100) AS BIGINT)").as("y"))
      val m = pts.groupBy("segment")
        .agg(count(lit(1)).as("n"), sum("y").as("s"))
      pts.join(broadcast(m), "segment")
        .groupBy("segment")
        .agg(max("n").as("n"),
          expr("CAST(max(s) div max(n) AS BIGINT)").as("mean_cents"),
          expr("CAST(sum(abs(n * y - s)) div (max(n) * max(n)) AS BIGINT)")
            .as("mae_cents"),
          expr("CAST(max(abs(n * y - s)) div max(n) AS BIGINT)")
            .as("max_abs_resid_cents"))
        .orderBy("segment")
    },

    GraftQuery(
      "q205_ltv_curve",
      Some("""WITH p AS (
             |  SELECT user_id, CAST(date_trunc('week', ts) AS DATE) AS wk,
             |         CAST(floor(value * 1000000) AS BIGINT) AS micros
             |  FROM events WHERE event_type = 'purchase'
             |), c AS (
             |  SELECT user_id, wk, micros,
             |         min(wk) OVER (PARTITION BY user_id) AS cohort_wk
             |  FROM p
             |), a AS (
             |  SELECT cohort_wk,
             |         CAST(date_diff('day', cohort_wk, wk) AS BIGINT) // 7 AS age_wk,
             |         CAST(sum(micros) AS BIGINT) AS week_micros
             |  FROM c GROUP BY 1, 2
             |), u AS (
             |  SELECT cohort_wk, CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
             |  FROM c GROUP BY 1
             |)
             |SELECT a.cohort_wk, a.age_wk, u.n_users, a.week_micros,
             |       CAST(sum(a.week_micros) OVER (PARTITION BY a.cohort_wk
             |            ORDER BY a.age_wk ROWS BETWEEN UNBOUNDED PRECEDING
             |            AND CURRENT ROW) // u.n_users AS BIGINT)
             |         AS cum_micros_per_user
             |FROM a JOIN u ON a.cohort_wk = u.cohort_wk
             |ORDER BY a.cohort_wk, a.age_wk""".stripMargin),
      "Cohort LTV curve — the money complement to q179's retention " +
        "matrix: users cohorted by first-purchase week, revenue " +
        "accumulated per cohort-age and normalized per cohort user in " +
        "integer micros. The cohort key is a window min over the " +
        "user partitioning (one exchange on user_id), then the curve " +
        "lives entirely on the |cohorts|×|ages| aggregate, where the " +
        "running sum is a per-cohort window. The cohort-size branch " +
        "re-reads the purchase slice (count distinct needs its own " +
        "grain — Spark windows can't COUNT DISTINCT); at 100 TB the " +
        "cohorted slice would be materialized once and both " +
        "aggregates read it — the q81-labels discipline, noted here " +
        "rather than hidden."
    ) { (s, dir) =>
      val p = Tables.events(s, dir)
        .filter(col("event_type") === "purchase")
        .select(col("user_id"),
          date_trunc("week", col("ts")).cast("date").as("wk"),
          expr("CAST(floor(value * 1000000) AS BIGINT)").as("micros"))
      val c = p.withColumn("cohort_wk",
        min("wk").over(Window.partitionBy("user_id")))
      val a = c.groupBy(col("cohort_wk"),
          (datediff(col("wk"), col("cohort_wk")).cast("long") / 7)
            .cast("long").as("age_wk"))
        .agg(sum("micros").as("week_micros"))
      val u = c.groupBy("cohort_wk")
        .agg(countDistinct("user_id").as("n_users"))
      val curve = Window.partitionBy("cohort_wk").orderBy("age_wk")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      a.join(broadcast(u), "cohort_wk")
        .withColumn("cum_micros", sum("week_micros").over(curve))
        .select(col("cohort_wk"), col("age_wk"), col("n_users"),
          col("week_micros"),
          expr("cum_micros div n_users").as("cum_micros_per_user"))
        .orderBy("cohort_wk", "age_wk")
    },

    GraftQuery(
      "q206_winsorized_stats",
      Some("""WITH x AS (
             |  SELECT l_returnflag AS flag,
             |         CAST(floor(l_extendedprice * 100) AS BIGINT) AS cents,
             |         l_orderkey, l_linenumber
             |  FROM lineitem
             |), r AS (
             |  SELECT flag, cents,
             |         CAST(row_number() OVER (PARTITION BY flag
             |              ORDER BY cents, l_orderkey, l_linenumber) AS BIGINT) AS rk,
             |         CAST(count(*) OVER (PARTITION BY flag) AS BIGINT) AS n
             |  FROM x
             |), capped AS (
             |  SELECT flag, cents, n,
             |         max(CASE WHEN rk = (n * 5 + 99) // 100 THEN cents END)
             |           OVER (PARTITION BY flag) AS lo_cap,
             |         max(CASE WHEN rk = (n * 95 + 99) // 100 THEN cents END)
             |           OVER (PARTITION BY flag) AS hi_cap
             |  FROM r
             |)
             |SELECT flag, max(n) AS n, max(lo_cap) AS lo_cap_cents,
             |       max(hi_cap) AS hi_cap_cents,
             |       CAST(sum(least(greatest(cents, lo_cap), hi_cap)) // max(n)
             |            AS BIGINT) AS winsor_mean_cents,
             |       CAST(sum(CASE WHEN cents < lo_cap OR cents > hi_cap
             |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped
             |FROM capped GROUP BY flag ORDER BY flag""".stripMargin),
      "Winsorized robust statistics (clip at p05/p95, then aggregate) — " +
        "the outlier treatment q141 detects, applied: the caps are " +
        "ORDER STATISTICS, not interpolated quantiles — rank " +
        "ceil(0.05·n)/ceil(0.95·n) under a total order (cents, " +
        "orderkey, linenumber), so both engines pick the identical cap " +
        "row with zero float interpolation to drift. One sort per " +
        "group serves the rank window, the group count, and both " +
        "conditional cap broadcasts (windows over the same partition " +
        "reuse the exchange); clamp and clipped-count are then " +
        "row-local into a final map-side agg. This exact form holds " +
        "each group's partition in one task — the honest 100 TB path " +
        "swaps the rank caps for q73's approx_percentile exactly as " +
        "q141b does for q141; same plan otherwise."
    ) { (s, dir) =>
      val byFlag = Window.partitionBy("flag")
      val r = Tables.lineitem(s, dir)
        .select(col("l_returnflag").as("flag"),
          expr("CAST(floor(l_extendedprice * 100) AS BIGINT)").as("cents"),
          col("l_orderkey"), col("l_linenumber"))
        .withColumn("rk", row_number().over(
          byFlag.orderBy("cents", "l_orderkey", "l_linenumber")).cast("long"))
        .withColumn("n", count(lit(1)).over(byFlag))
      val capped = r
        .withColumn("lo_cap",
          max(when(col("rk") === expr("(n * 5 + 99) div 100"), col("cents")))
            .over(byFlag))
        .withColumn("hi_cap",
          max(when(col("rk") === expr("(n * 95 + 99) div 100"), col("cents")))
            .over(byFlag))
      capped.groupBy("flag")
        .agg(max("n").as("n"), max("lo_cap").as("lo_cap_cents"),
          max("hi_cap").as("hi_cap_cents"),
          expr("CAST(sum(least(greatest(cents, lo_cap), hi_cap)) div max(n) AS BIGINT)")
            .as("winsor_mean_cents"),
          sum(when(col("cents") < col("lo_cap") ||
            col("cents") > col("hi_cap"), 1L).otherwise(0L)).as("n_clipped"))
        .orderBy("flag")
    },

    GraftQuery(
      "q207_fulfillment_latency",
      Some("""WITH l AS (
             |  SELECT o_orderpriority AS priority,
             |         CAST(date_diff('day', CAST(o_orderdate AS DATE),
             |                        CAST(l_shipdate AS DATE)) AS BIGINT) AS lag_days
             |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |)
             |SELECT priority, CAST(count(*) AS BIGINT) AS n,
             |       CAST(sum(lag_days) // count(*) AS BIGINT) AS mean_days,
             |       CAST(max(lag_days) AS BIGINT) AS max_days,
             |       CAST(sum(CASE WHEN lag_days <= 7 THEN 1 ELSE 0 END)
             |            * 1000000 // count(*) AS BIGINT) AS within_week_ppm,
             |       CAST(sum(CASE WHEN lag_days > 30 THEN 1 ELSE 0 END)
             |            * 1000000 // count(*) AS BIGINT) AS over_month_ppm
             |FROM l GROUP BY priority ORDER BY priority""".stripMargin),
      "Order-to-ship latency SLA report per priority class: the lag is " +
        "integer days (both engines' date_diff agrees exactly — no " +
        "timestamp arithmetic), and mean plus both SLA-bucket shares " +
        "fold into ONE map-side-combined aggregate over the " +
        "lineitem⋈orders join — the orderkey exchange is the only wide " +
        "move, the output is |priorities| rows. The operational " +
        "question ('do urgent orders actually ship faster?') joins " +
        "q187's mix audit; at 100 TB the date predicate columns prune " +
        "to two fields and the agg state is five longs per class."
    ) { (s, dir) =>
      Tables.lineitem(s, dir)
        .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
        .select(col("o_orderpriority").as("priority"),
          datediff(col("l_shipdate"), col("o_orderdate")).cast("long").as("lag_days"))
        .groupBy("priority")
        .agg(count(lit(1)).as("n"),
          expr("CAST(sum(lag_days) div count(1) AS BIGINT)").as("mean_days"),
          max("lag_days").as("max_days"),
          expr("CAST(sum(CASE WHEN lag_days <= 7 THEN 1 ELSE 0 END) * 1000000" +
            " div count(1) AS BIGINT)").as("within_week_ppm"),
          expr("CAST(sum(CASE WHEN lag_days > 30 THEN 1 ELSE 0 END) * 1000000" +
            " div count(1) AS BIGINT)").as("over_month_ppm"))
        .orderBy("priority")
    },

    GraftQuery(
      "q208_fd_discovery",
      Some("""WITH cand AS (
             |  SELECT 'part.brand->type' AS fd,
             |         CAST(count(DISTINCT p_brand) AS BIGINT) AS n_lhs,
             |         CAST(count(DISTINCT (p_brand, p_type)) AS BIGINT) AS n_pairs
             |  FROM part
             |  UNION ALL
             |  SELECT 'part.type->brand',
             |         CAST(count(DISTINCT p_type) AS BIGINT),
             |         CAST(count(DISTINCT (p_type, p_brand)) AS BIGINT)
             |  FROM part
             |  UNION ALL
             |  SELECT 'supplier.suppkey->nationkey',
             |         CAST(count(DISTINCT s_suppkey) AS BIGINT),
             |         CAST(count(DISTINCT (s_suppkey, s_nationkey)) AS BIGINT)
             |  FROM supplier
             |  UNION ALL
             |  SELECT 'orders.custkey->priority',
             |         CAST(count(DISTINCT o_custkey) AS BIGINT),
             |         CAST(count(DISTINCT (o_custkey, o_orderpriority)) AS BIGINT)
             |  FROM orders
             |  UNION ALL
             |  SELECT 'customer.nationkey->mktsegment',
             |         CAST(count(DISTINCT c_nationkey) AS BIGINT),
             |         CAST(count(DISTINCT (c_nationkey, c_mktsegment)) AS BIGINT)
             |  FROM customer
             |)
             |SELECT fd, n_lhs, n_pairs,
             |       CASE WHEN n_pairs = n_lhs THEN 1 ELSE 0 END AS holds,
             |       CAST((n_pairs - n_lhs) * 1000000 // nullif(n_lhs, 0)
             |            AS BIGINT) AS violation_ppm
             |FROM cand ORDER BY fd""".stripMargin),
      "Functional-dependency discovery (TANE's core test, declarative): " +
        "A→B holds iff |distinct A| = |distinct (A,B)| — two " +
        "count-distincts per candidate, violation strength in ppm of " +
        "extra right-hand values. This is how a profiler finds real " +
        "keys, denormalization opportunities and dirty dimension " +
        "columns without any pairwise comparison. Each candidate scans " +
        "only its two columns (pruned scan, distinct aggregates expand " +
        "map-side); candidates union into one plan and never join. At " +
        "100 TB exact NDV swaps for the q05 HLL sketch per the q115 " +
        "note — the identity test becomes a sketch-equality test with " +
        "stated error."
    ) { (s, dir) =>
      def cand(fd: String, df: org.apache.spark.sql.DataFrame,
               a: String, b: String) =
        df.agg(countDistinct(col(a)).as("n_lhs"),
            countDistinct(col(a), col(b)).as("n_pairs"))
          .select(lit(fd).as("fd"), col("n_lhs"), col("n_pairs"))
      cand("part.brand->type", Tables.part(s, dir), "p_brand", "p_type")
        .unionAll(cand("part.type->brand", Tables.part(s, dir), "p_type", "p_brand"))
        .unionAll(cand("supplier.suppkey->nationkey", Tables.supplier(s, dir),
          "s_suppkey", "s_nationkey"))
        .unionAll(cand("orders.custkey->priority", Tables.orders(s, dir),
          "o_custkey", "o_orderpriority"))
        .unionAll(cand("customer.nationkey->mktsegment", Tables.customer(s, dir),
          "c_nationkey", "c_mktsegment"))
        .select(col("fd"), col("n_lhs"), col("n_pairs"),
          when(col("n_pairs") === col("n_lhs"), 1).otherwise(0).as("holds"),
          // nullif: an empty table has no LHS values to violate — NULL on
          // both engines, not an ANSI crash (DegenerateCorpusSpec).
          expr("(n_pairs - n_lhs) * 1000000 div nullif(n_lhs, 0)")
            .as("violation_ppm"))
        .orderBy("fd")
    },

    GraftQuery(
      "q212_auc_ranking",
      Some("""WITH sc AS (
             |  SELECT CAST(floor(sqrt(list_reduce(list_transform(
             |                 embedding::DOUBLE[], x -> x*x), (a,b) -> a+b))
             |               * 1000) AS BIGINT) AS score,
             |         CASE WHEN label < 5 THEN 1 ELSE 0 END AS pos
             |  FROM embeddings
             |), g AS (
             |  SELECT score, CAST(sum(pos) AS BIGINT) AS pos_s,
             |         CAST(count(*) - sum(pos) AS BIGINT) AS neg_s
             |  FROM sc GROUP BY score
             |), c AS (
             |  SELECT pos_s, neg_s,
             |         CAST(coalesce(sum(neg_s) OVER (ORDER BY score
             |              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             |              AS BIGINT) AS neg_below
             |  FROM g
             |)
             |SELECT CAST(sum(pos_s) AS BIGINT) AS n_pos,
             |       CAST(sum(neg_s) AS BIGINT) AS n_neg,
             |       CAST(sum(pos_s * (2 * neg_below + neg_s)) AS BIGINT) AS u2,
             |       CAST(sum(pos_s * (2 * neg_below + neg_s)) * 1000000
             |            // nullif(2 * sum(pos_s) * sum(neg_s), 0)
             |            AS BIGINT) AS auc_ppm
             |FROM c""".stripMargin),
      "Exact tie-adjusted AUC (Mann-Whitney U) without any sort of the " +
        "raw data: scoring each embedding by its integer-milli norm " +
        "against a binary label, the doubled statistic is " +
        "U·2 = Σ_scores pos_s·(2·negatives_below + neg_s) — ties " +
        "contribute their half-credit exactly, in integers, no " +
        "midrank halves. The corpus collapses to |distinct scores| " +
        "rows in one map-side-combined aggregate; the running " +
        "negatives-below is a window over that post-agg frame, and " +
        "the final AUC is one more aggregate — ppm by truncating " +
        "division. Ranking-model evaluation at 100 TB is exactly " +
        "this shape: never rank 10^11 rows globally; bucket by score " +
        "and count pair credit from the bucket marginals."
    ) { (s, dir) =>
      import graft.functions.VectorFunctions.dotd
      val sc = Tables.embeddings(s, dir)
        .select(transform(col("embedding"), _.cast("double")).as("v"), col("label"))
        .select(floor(sqrt(dotd(col("v"), col("v"))) * 1000).cast("long").as("score"),
          when(col("label") < 5, 1L).otherwise(0L).as("pos"))
      val g = sc.groupBy("score")
        .agg(sum("pos").as("pos_s"), (count(lit(1)) - sum("pos")).as("neg_s"))
      val c = g.withColumn("neg_below",
        coalesce(sum("neg_s").over(Window.orderBy("score")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      c.agg(sum("pos_s").as("n_pos"), sum("neg_s").as("n_neg"),
          sum(col("pos_s") * (lit(2L) * col("neg_below") + col("neg_s"))).as("u2"))
        .select(col("n_pos"), col("n_neg"), col("u2"),
          // nullif: AUC is undefined with a single class present — NULL on
          // both engines, not an ANSI crash (DegenerateCorpusSpec).
          expr("u2 * 1000000 div nullif(2 * n_pos * n_neg, 0)").as("auc_ppm"))
    },

    GraftQuery(
      "q213_calibration_curve",
      Some("""WITH sc AS (
             |  SELECT vec_id,
             |         CAST(floor(sqrt(list_reduce(list_transform(
             |                 embedding::DOUBLE[], x -> x*x), (a,b) -> a+b))
             |               * 1000) AS BIGINT) AS score,
             |         CASE WHEN label < 5 THEN 1 ELSE 0 END AS pos
             |  FROM embeddings
             |), b AS (
             |  SELECT ntile(10) OVER (ORDER BY score, vec_id) AS decile,
             |         score, pos
             |  FROM sc
             |)
             |SELECT CAST(decile AS BIGINT) AS decile,
             |       CAST(count(*) AS BIGINT) AS n,
             |       CAST(sum(score) // count(*) AS BIGINT) AS mean_score_milli,
             |       CAST(sum(pos) * 1000000 // count(*) AS BIGINT) AS pos_rate_ppm
             |FROM b GROUP BY decile ORDER BY decile""".stripMargin),
      "Calibration curve for the q212 ranking score: decile buckets " +
        "over the (score, vec_id) total order — ntile is deterministic " +
        "under a total order, the q165 lesson — then per-decile mean " +
        "score and observed positive rate in integer ppm. Reading " +
        "q212 and q213 together is the standard eval loop: AUC says " +
        "the score RANKS, calibration says whether its magnitude " +
        "MEANS anything. The global ntile sort is over the scored " +
        "corpus — at 100 TB swap it for fixed score-range buckets " +
        "(q104's histogram discipline) and the rest of the plan is " +
        "unchanged; here the single-partition window is the honest " +
        "small-data form, stated rather than hidden."
    ) { (s, dir) =>
      import graft.functions.VectorFunctions.dotd
      val sc = Tables.embeddings(s, dir)
        .select(col("vec_id"),
          transform(col("embedding"), _.cast("double")).as("v"), col("label"))
        .select(col("vec_id"),
          floor(sqrt(dotd(col("v"), col("v"))) * 1000).cast("long").as("score"),
          when(col("label") < 5, 1L).otherwise(0L).as("pos"))
      sc.withColumn("decile",
          ntile(10).over(Window.orderBy("score", "vec_id")).cast("long"))
        .groupBy("decile")
        .agg(count(lit(1)).as("n"),
          expr("CAST(sum(score) div count(1) AS BIGINT)").as("mean_score_milli"),
          expr("CAST(sum(pos) * 1000000 div count(1) AS BIGINT)").as("pos_rate_ppm"))
        .orderBy("decile")
    },

    GraftQuery(
      "q217_l_diversity",
      Some("""WITH t AS (
             |  SELECT c_nationkey, c_mktsegment,
             |         CASE WHEN c_acctbal < 0.0 THEN 'NEG'
             |              WHEN c_acctbal < 2500.0 THEN 'LOW'
             |              WHEN c_acctbal < 7500.0 THEN 'MID'
             |              ELSE 'HIGH' END AS bal_band
             |  FROM customer
             |), cls AS (
             |  SELECT c_nationkey, c_mktsegment,
             |         CAST(count(*) AS BIGINT) AS n,
             |         CAST(count(DISTINCT bal_band) AS BIGINT) AS l
             |  FROM t GROUP BY 1, 2
             |), tot AS (
             |  SELECT CAST(sum(n) AS BIGINT) AS t FROM cls
             |)
             |SELECT l, CAST(count(*) AS BIGINT) AS n_classes,
             |       CAST(sum(n) AS BIGINT) AS n_customers,
             |       CAST(sum(n) * 1000000 // tot.t AS BIGINT) AS coverage_ppm
             |FROM cls, tot
             |GROUP BY l, tot.t
             |ORDER BY l""".stripMargin),
      "l-diversity audit — k-anonymity's (q178) stronger sibling: a " +
        "quasi-id class that is large (k-safe) but HOMOGENEOUS in the " +
        "sensitive attribute still leaks it (every member of the class " +
        "shares the balance band). Classes = (nationkey, segment), " +
        "sensitive = 4-band balance; the report is the distribution of " +
        "per-class distinct-sensitive counts l, with customer coverage " +
        "ppm — l=1 rows are the homogeneity-attack surface a release " +
        "must generalize away. One map-side grouping to |classes| " +
        "rows (the count-distinct expands to class×band grain first — " +
        "bounded by 4 bands), then the l histogram is dimension-sized; " +
        "the 1-row total broadcasts into the share."
    ) { (s, dir) =>
      val t = Tables.customer(s, dir)
        .select(col("c_nationkey"), col("c_mktsegment"),
          when(col("c_acctbal") < 0.0, "NEG")
            .when(col("c_acctbal") < 2500.0, "LOW")
            .when(col("c_acctbal") < 7500.0, "MID")
            .otherwise("HIGH").as("bal_band"))
      val cls = t.groupBy("c_nationkey", "c_mktsegment")
        .agg(count(lit(1)).as("n"), countDistinct("bal_band").as("l"))
      val tot = cls.agg(sum("n").as("t"))
      cls.crossJoin(broadcast(tot))
        .groupBy("l")
        .agg(count(lit(1)).as("n_classes"), sum("n").as("n_customers"),
          expr("CAST(sum(n) * 1000000 div max(t) AS BIGINT)").as("coverage_ppm"))
        .orderBy("l")
    },

    GraftQuery(
      "q218_worst_slice_eval",
      Some("""WITH t AS (
             |  SELECT doc_id, lang, string_split(lower(text), ' ') w FROM documents
             |), scored AS (
             |  SELECT lang,
             |    len(list_filter(w, x -> list_contains(['the','a','and','of'], x))) n_en,
             |    len(list_filter(w, x -> list_contains(['el','la','de','y'], x)))   n_es,
             |    len(list_filter(w, x -> list_contains(['der','die','das','und'], x))) n_de,
             |    len(list_filter(w, x -> list_contains(['le','la','et','les'], x))) n_fr
             |  FROM t
             |), pred AS (
             |  SELECT lang,
             |    CASE WHEN n_en >= n_es AND n_en >= n_de AND n_en >= n_fr AND n_en > 0 THEN 'en'
             |         WHEN n_es >= n_de AND n_es >= n_fr AND n_es > 0 THEN 'es'
             |         WHEN n_de >= n_fr AND n_de > 0 THEN 'de'
             |         WHEN n_fr > 0 THEN 'fr'
             |         ELSE 'und' END AS pred_lang
             |  FROM scored
             |), s AS (
             |  SELECT lang, CAST(count(*) AS BIGINT) AS n,
             |         CAST(sum(CASE WHEN pred_lang = lang THEN 1 ELSE 0 END)
             |              AS BIGINT) AS n_correct
             |  FROM pred GROUP BY lang
             |)
             |SELECT lang, n, n_correct,
             |       CAST(n_correct * 1000000 // n AS BIGINT) AS acc_ppm,
             |       CAST(n_correct * 1000000 // n
             |            - min(n_correct * 1000000 // n) OVER () AS BIGINT)
             |         AS gap_to_worst_ppm,
             |       CASE WHEN n_correct * 1000000 // n
             |                 = min(n_correct * 1000000 // n) OVER ()
             |            THEN 1 ELSE 0 END AS is_worst
             |FROM s ORDER BY lang""".stripMargin),
      "Worst-slice evaluation — the fairness/robustness counterpart to " +
        "q201's aggregate metrics: per-language accuracy of the q45 " +
        "predictor plus each slice's gap to the WORST slice, because a " +
        "model (or a cleaning gate) that is 95% accurate on average " +
        "and 40% on one language fails exactly where averages hide " +
        "it. The fact-sized work is q45's row-local marker fold; the " +
        "slice table is |langs| rows, where the min-over-slices window " +
        "is free. The same shape audits any per-slice metric — gate " +
        "pass rates (q153), dedup rates per source (q152) — worst-" +
        "group reporting is a projection over a grouped aggregate, " +
        "never a second scan."
    ) { (s, dir) =>
      import graft.functions.TextQueries.{markerCount, enM, esM, deM, frM}
      val w = split(lower(col("text")), " ")
      val scored = Tables.documents(s, dir).select(
        col("lang"),
        markerCount(w, enM).as("n_en"), markerCount(w, esM).as("n_es"),
        markerCount(w, deM).as("n_de"), markerCount(w, frM).as("n_fr"))
      val pred = scored.select(col("lang"),
        when(col("n_en") >= col("n_es") && col("n_en") >= col("n_de") &&
          col("n_en") >= col("n_fr") && col("n_en") > 0, "en")
          .when(col("n_es") >= col("n_de") && col("n_es") >= col("n_fr") &&
            col("n_es") > 0, "es")
          .when(col("n_de") >= col("n_fr") && col("n_de") > 0, "de")
          .when(col("n_fr") > 0, "fr")
          .otherwise("und").as("pred_lang"))
      val slice = pred.groupBy("lang")
        .agg(count(lit(1)).as("n"),
          sum(when(col("pred_lang") === col("lang"), 1L).otherwise(0L))
            .as("n_correct"))
      val global = Window.rowsBetween(Window.unboundedPreceding,
        Window.unboundedFollowing)
      slice
        .withColumn("acc_ppm", expr("n_correct * 1000000 div n"))
        .withColumn("worst_ppm", min("acc_ppm").over(global))
        .select(col("lang"), col("n"), col("n_correct"), col("acc_ppm"),
          (col("acc_ppm") - col("worst_ppm")).as("gap_to_worst_ppm"),
          when(col("acc_ppm") === col("worst_ppm"), 1).otherwise(0).as("is_worst"))
        .orderBy("lang")
    },

    GraftQuery(
      "q220_seasonal_anomaly",
      Some("""WITH d AS (
             |  SELECT CAST(o_orderdate AS DATE) AS day,
             |         CAST((date_diff('day', DATE '1995-01-02',
             |                         CAST(o_orderdate AS DATE)) % 7 + 7) % 7
             |              AS BIGINT) AS dow,
             |         CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             |           AS cents
             |  FROM orders GROUP BY 1, 2
             |), base AS (
             |  SELECT dow, CAST(count(*) AS BIGINT) AS n_days,
             |         CAST(sum(cents) AS BIGINT) AS s
             |  FROM d GROUP BY dow
             |)
             |SELECT d.day, d.dow, d.cents,
             |       CAST(base.s // base.n_days AS BIGINT) AS baseline_cents,
             |       CAST((base.n_days * d.cents - base.s) // base.n_days AS BIGINT)
             |         AS resid_cents
             |FROM d JOIN base ON d.dow = base.dow
             |ORDER BY abs((base.n_days * d.cents - base.s) // base.n_days) DESC,
             |         d.day
             |LIMIT 10""".stripMargin),
      "Seasonally-adjusted anomaly detection: q195's CUSUM finds level " +
        "SHIFTS, this finds individual outlier DAYS after removing the " +
        "day-of-week cycle (Sundays are always low — compare Sundays to " +
        "Sundays). The weekday baseline is |7| rows broadcast back onto " +
        "the daily aggregate, and the residual keeps q204's cross-" +
        "multiplied exactness: n·x − S is the integer day-minus-mean " +
        "with no float mean materialized; the weekday index is modular " +
        "day arithmetic from an anchor Monday — Spark and DuckDB " +
        "disagree on dayofweek() numbering, integer math cannot. Two stacked map-side aggregates (daily, " +
        "then weekday), a broadcast join, a top-10 heap — the fact " +
        "never moves twice. The same shape de-seasonalizes ingest " +
        "volumes or token counts per weekday before alerting at 100 TB."
    ) { (s, dir) =>
      val d = Tables.orders(s, dir)
        .groupBy(col("o_orderdate").cast("date").as("day"),
          pmod(datediff(col("o_orderdate").cast("date"),
            lit("1995-01-02").cast("date")), lit(7)).cast("long").as("dow"))
        .agg(sum(expr("CAST(floor(o_totalprice * 100) AS BIGINT)")).as("cents"))
      val base = d.groupBy("dow")
        .agg(count(lit(1)).as("n_days"), sum("cents").as("s"))
      d.join(broadcast(base), "dow")
        .select(col("day"), col("dow"), col("cents"),
          expr("s div n_days").as("baseline_cents"),
          expr("(n_days * cents - s) div n_days").as("resid_cents"))
        .orderBy(abs(col("resid_cents")).desc, col("day"))
        .limit(10)
    }
  )
}
