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
             |       CAST((2 * rnk * freq - med2) * 1000000 // med2 AS BIGINT) AS dev_ppm
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
          expr("(2 * rnk * freq - med2) * 1000000 div med2").as("dev_ppm"))
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
    }
  )
}
