package graft.operators

import graft.{GraftQuery, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Classic warehouse-analytics shapes the TPC-H benchmark standardized —
  * distribution-of-counts, conditional mix, share-of-total, decile/ABC
  * classification, trend fitting, forensic digit audits and experiment
  * readouts (SURVEY.md §2.2 "analytics shapes").
  *
  * Scale design: every query aggregates the fact table FIRST (map-side
  * partial aggregation shrinks the wide move to |groups| rows) and runs its
  * second-phase statistics — histograms, cumulative shares, regression
  * algebra, chi-square contributions — on the tiny aggregate, where an
  * unpartitioned window or a broadcast join is free. All derived ratios are
  * integer ppm/milli via truncating division so DuckDB and Spark rank
  * identically (the q157 discipline).
  */
object AnalyticsQueries {

  /** Exact-cents revenue term shared by q188/q190: floor to integer cents
    * BEFORE summing so the aggregate is order-independent (q103's rule). */
  private val revCentsSql = "CAST(floor(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)"
  private def revCents = expr(revCentsSql)

  val all: Seq[GraftQuery] = Seq(

    GraftQuery(
      "q186_tpch_q13",
      Some("""WITH pc AS (
             |  SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
             |  FROM customer LEFT JOIN orders
             |    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
             |  GROUP BY c_custkey
             |)
             |SELECT c_count, CAST(count(*) AS BIGINT) AS n_custs
             |FROM pc GROUP BY c_count
             |ORDER BY n_custs DESC, c_count DESC""".stripMargin),
      "TPC-H Q13 (customer order-count distribution): the " +
        "distribution-of-counts double aggregate. The left join keeps " +
        "never-ordered customers (c_count=0 bucket — the point of Q13); " +
        "the priority predicate filters the orders side BEFORE the join " +
        "so Catalyst pushes it into the scan. One shuffle on custkey for " +
        "the per-customer count, then the histogram groups |customers| " +
        "rows down to ~max-orders-per-customer buckets — at 100 TB " +
        "pre-aggregating orders per custkey before the join (q16's note) " +
        "replaces the join shuffle with a co-partitioned merge."
    ) { (s, dir) =>
      val pc = Tables.customer(s, dir)
        .join(Tables.orders(s, dir)
          .filter(col("o_orderpriority") =!= "1-URGENT"),
          col("c_custkey") === col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("c_count"))
      pc.groupBy("c_count").agg(count(lit(1)).as("n_custs"))
        .orderBy(col("n_custs").desc, col("c_count").desc)
    },

    GraftQuery(
      "q187_tpch_q12",
      Some("""SELECT CAST(date_trunc('month', l_shipdate) AS DATE) AS ship_month,
             |       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
             |                     THEN 1 ELSE 0 END) AS BIGINT) AS high_cnt,
             |       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
             |                     THEN 0 ELSE 1 END) AS BIGINT) AS low_cnt
             |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |GROUP BY 1 ORDER BY 1""".stripMargin),
      "TPC-H Q12 shape (priority mix per ship month): CASE-inside-SUM " +
        "conditional aggregation over the fact-fact join — the SLA audit " +
        "('are urgent orders shipping on time?') every ops dashboard " +
        "runs. lineitem⋈orders hashes on orderkey (both fact-sized, the " +
        "one unavoidable wide move), the month truncation and both " +
        "conditional counts fold in the map-side partial agg, so the " +
        "final exchange carries |months|×3 values. The branch pair is " +
        "complementary (high + low = count) — one pass, no second scan."
    ) { (s, dir) =>
      val isHigh = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
      Tables.lineitem(s, dir)
        .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
        .groupBy(date_trunc("month", col("l_shipdate")).cast("date").as("ship_month"))
        .agg(
          sum(when(isHigh, 1).otherwise(0)).as("high_cnt"),
          sum(when(isHigh, 0).otherwise(1)).as("low_cnt"))
        .orderBy("ship_month")
    },

    GraftQuery(
      "q188_tpch_q14",
      Some(s"""SELECT CAST(date_trunc('month', l_shipdate) AS DATE) AS ship_month,
              |       CAST(sum(CASE WHEN p_type LIKE 'PROMO%' THEN $revCentsSql
              |                     ELSE 0 END) AS BIGINT) AS promo_cents,
              |       CAST(sum($revCentsSql) AS BIGINT) AS total_cents,
              |       CAST(sum(CASE WHEN p_type LIKE 'PROMO%' THEN $revCentsSql
              |                     ELSE 0 END) * 1000000
              |            // sum($revCentsSql) AS BIGINT) AS promo_ppm
              |FROM lineitem JOIN part ON l_partkey = p_partkey
              |GROUP BY 1 ORDER BY 1""".stripMargin),
      "TPC-H Q14 (promo revenue share): share-of-total with the " +
        "numerator selected by a dimension attribute. part broadcasts so " +
        "the fact never re-partitions for the brand lookup; revenue is " +
        "floored to integer cents per row BEFORE the sum (order-" +
        "independent — q103's rule), and the share is integer ppm by " +
        "truncating division, identical on both engines. Numerator and " +
        "denominator come out of the SAME single-pass aggregate — the " +
        "naive two-query form scans the fact twice."
    ) { (s, dir) =>
      val promo = when(col("p_type").like("PROMO%"), revCents).otherwise(0L)
      Tables.lineitem(s, dir)
        .join(broadcast(Tables.part(s, dir)),
          col("l_partkey") === col("p_partkey"))
        .groupBy(date_trunc("month", col("l_shipdate")).cast("date").as("ship_month"))
        .agg(sum(promo).as("promo_cents"), sum(revCents).as("total_cents"))
        .withColumn("promo_ppm", expr("promo_cents * 1000000 div total_cents"))
        .orderBy("ship_month")
    },

    GraftQuery(
      "q189_tpch_q22",
      Some("""WITH bal AS (
             |  SELECT CAST(count(*) AS BIGINT) AS n_pos,
             |         CAST(sum(CAST(floor(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS s_pos
             |  FROM customer WHERE c_acctbal > 0.0
             |)
             |SELECT c_nationkey AS nation_key,
             |       CAST(count(*) AS BIGINT) AS n_custs,
             |       CAST(sum(CAST(floor(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS total_cents
             |FROM customer, bal
             |WHERE CAST(floor(c_acctbal * 100) AS BIGINT) * bal.n_pos > bal.s_pos
             |  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
             |                  AND o_orderdate >= TIMESTAMP '2000-01-01')
             |GROUP BY c_nationkey
             |ORDER BY c_nationkey""".stripMargin),
      "TPC-H Q22 shape (wealthy lapsed customers): global-average " +
        "threshold + anti join. The above-average test is exact integer " +
        "algebra — cents·n > Σcents cross-multiplies away the division, " +
        "so no float average ever exists to drift between engines. The " +
        "1-row (n, Σ) frame broadcasts into the filter (never an " +
        "unpartitioned window over the fact — that would single-" +
        "partition it); 'lapsed' = no order in the final observed years, " +
        "a LEFT ANTI hash join against the date-filtered orders (the " +
        "recency predicate pushes into the orders scan — partition-" +
        "prunable at 100 TB). Two scans of customer (one 1-row agg, one " +
        "filtered pass) and one anti-join shuffle, all dimension-sized; " +
        "the orders side prunes to (o_custkey, o_orderdate)."
    ) { (s, dir) =>
      val cents = expr("CAST(floor(c_acctbal * 100) AS BIGINT)")
      val bal = Tables.customer(s, dir)
        .filter(col("c_acctbal") > 0.0)
        .agg(count(lit(1)).as("n_pos"), sum(cents).as("s_pos"))
      Tables.customer(s, dir)
        .crossJoin(broadcast(bal))
        .filter(cents * col("n_pos") > col("s_pos"))
        .join(Tables.orders(s, dir)
          .filter(col("o_orderdate") >= lit("2000-01-01").cast("timestamp"))
          .select("o_custkey"),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy(col("c_nationkey").as("nation_key"))
        .agg(count(lit(1)).as("n_custs"), sum(cents).as("total_cents"))
        .orderBy("nation_key")
    },

    GraftQuery(
      "q190_pareto_abc",
      Some(s"""WITH b AS (
              |  SELECT p_brand, CAST(sum($revCentsSql) AS BIGINT) AS rev_cents
              |  FROM lineitem JOIN part ON l_partkey = p_partkey
              |  GROUP BY p_brand
              |), c AS (
              |  SELECT p_brand, rev_cents,
              |         CAST(sum(rev_cents) OVER (ORDER BY rev_cents DESC, p_brand
              |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              |              AS BIGINT) AS cum_cents,
              |         CAST(sum(rev_cents) OVER () AS BIGINT) AS tot_cents
              |  FROM b
              |)
              |SELECT p_brand, rev_cents,
              |       CAST(cum_cents * 1000000 // tot_cents AS BIGINT) AS cum_ppm,
              |       CASE WHEN cum_cents * 1000000 // tot_cents <= 700000 THEN 'A'
              |            WHEN cum_cents * 1000000 // tot_cents <= 900000 THEN 'B'
              |            ELSE 'C' END AS abc_class
              |FROM c ORDER BY cum_ppm, p_brand""".stripMargin),
      "Pareto / ABC inventory classification: running-share-of-total " +
        "banding (A = first 70% of revenue, B to 90%, C the tail). The " +
        "fact collapses to |brands| rows in one map-side-combined " +
        "aggregate FIRST; the cumulative window and the global total run " +
        "unpartitioned over that post-agg frame — single-partition by " +
        "construction and FINE, because |brands| is dimension-sized " +
        "(bounded by the catalog, not the data). Cum share is integer " +
        "ppm; the running sum is strictly increasing (cents > 0) so the " +
        "(cum_ppm, brand) presentation order is total."
    ) { (s, dir) =>
      val b = Tables.lineitem(s, dir)
        .join(broadcast(Tables.part(s, dir)),
          col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand")
        .agg(sum(revCents).as("rev_cents"))
      val cum = Window.orderBy(col("rev_cents").desc, col("p_brand"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val c = b
        .withColumn("cum_cents", sum("rev_cents").over(cum))
        .withColumn("tot_cents",
          sum("rev_cents").over(Window.rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing)))
        .withColumn("cum_ppm", expr("cum_cents * 1000000 div tot_cents"))
      c.select(col("p_brand"), col("rev_cents"), col("cum_ppm"),
          when(col("cum_ppm") <= 700000, "A")
            .when(col("cum_ppm") <= 900000, "B")
            .otherwise("C").as("abc_class"))
        .orderBy("cum_ppm", "p_brand")
    },

    GraftQuery(
      "q191_trend_fit",
      Some("""WITH pts AS (
             |  SELECT c_mktsegment AS segment,
             |         CAST(date_diff('day', DATE '1995-01-01',
             |                        CAST(o_orderdate AS DATE)) AS BIGINT) AS x,
             |         CAST(floor(o_totalprice) AS BIGINT) AS y
             |  FROM orders JOIN customer ON o_custkey = c_custkey
             |), m AS (
             |  SELECT segment, CAST(count(*) AS BIGINT) AS n,
             |         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
             |         CAST(sum(x * x) AS BIGINT) AS sxx,
             |         CAST(sum(x * y) AS BIGINT) AS sxy
             |  FROM pts GROUP BY segment
             |)
             |SELECT segment, n,
             |       CAST(sx // n AS BIGINT) AS mean_x_days,
             |       CAST(sy // n AS BIGINT) AS mean_y_dollars,
             |       CAST((n * sxy - sx * sy)
             |            // nullif((n * sxx - sx * sx) // 1000, 0)
             |            AS BIGINT) AS slope_milli
             |FROM m ORDER BY segment""".stripMargin),
      "Per-segment OLS trend fit (is order value drifting over time?): " +
        "the regression reduces to five distributive sums (n, Σx, Σy, " +
        "Σx², Σxy) — ONE map-side-combined aggregate over the fact, then " +
        "the closed-form slope on |segments| rows. All integer: x is " +
        "days since epoch-anchor (small, keeps Σxy in BIGINT range), y " +
        "is floored dollars, and the slope divides cross-multiplied " +
        "integer moments with the denominator pre-scaled (÷1000 → " +
        "milli-dollars/day) so no product exceeds 2^63. Truncating " +
        "division matches engines bit-for-bit, negative slopes truncate " +
        "toward zero on both. The moments are exactly what q58 exposes " +
        "as covar/var — this is the integer-exact, drift-free form."
    ) { (s, dir) =>
      val pts = Tables.orders(s, dir)
        .join(broadcast(Tables.customer(s, dir)
          .select("c_custkey", "c_mktsegment")),
          col("o_custkey") === col("c_custkey"))
        .select(col("c_mktsegment").as("segment"),
          datediff(col("o_orderdate"), lit("1995-01-01").cast("date"))
            .cast("long").as("x"),
          expr("CAST(floor(o_totalprice) AS BIGINT)").as("y"))
      pts.groupBy("segment")
        .agg(count(lit(1)).as("n"),
          sum("x").as("sx"), sum("y").as("sy"),
          sum(col("x") * col("x")).as("sxx"),
          sum(col("x") * col("y")).as("sxy"))
        .select(col("segment"), col("n"),
          expr("sx div n").as("mean_x_days"),
          expr("sy div n").as("mean_y_dollars"),
          // nullif: a single point (or a zero-variance x column) has no
          // slope — NULL on both engines (DuckDB // 0 is already NULL;
          // ANSI Spark would throw). Found by DegenerateCorpusSpec.
          expr("(n * sxy - sx * sy) div nullif((n * sxx - sx * sx) div 1000, 0)")
            .as("slope_milli"))
        .orderBy("segment")
    },

    GraftQuery(
      "q192_benford_audit",
      Some("""WITH o AS (
             |  SELECT CAST(substr(CAST(CAST(floor(l_extendedprice) AS BIGINT)
             |                          AS VARCHAR), 1, 1) AS BIGINT) AS digit,
             |         CAST(count(*) AS BIGINT) AS n
             |  FROM lineitem GROUP BY 1
             |), w AS (
             |  SELECT digit, n,
             |         CAST(n * 1000000 // sum(n) OVER () AS BIGINT) AS obs_ppm
             |  FROM o
             |), e AS (
             |  SELECT * FROM (VALUES (1, 301030), (2, 176091), (3, 124939),
             |                        (4, 96910), (5, 79181), (6, 66947),
             |                        (7, 57992), (8, 51153), (9, 45757))
             |         AS v(digit, exp_ppm)
             |)
             |SELECT w.digit, w.n, w.obs_ppm,
             |       CAST(e.exp_ppm AS BIGINT) AS exp_ppm,
             |       CAST((w.obs_ppm - e.exp_ppm) * (w.obs_ppm - e.exp_ppm)
             |            // e.exp_ppm AS BIGINT) AS chi2_ppm
             |FROM w JOIN e ON w.digit = e.digit
             |ORDER BY w.digit""".stripMargin),
      "Benford first-digit audit (fraud/forensic data-quality check): " +
        "leading digit via integer→string — no logarithms touch the " +
        "data path; the nine Benford expectations are data-independent " +
        "constants baked as a literal table (q44's precedent), summing " +
        "to exactly 1000000 ppm. The fact collapses to ≤9 rows in one " +
        "map-side-combined count; share and per-digit chi-square " +
        "contribution are integer ppm over that post-agg frame (the " +
        "unpartitioned window is 9 rows — dimension-sized, fine). The " +
        "same shape audits token-frequency plausibility per corpus " +
        "source at 100 TB: nothing wide moves but the digit histogram."
    ) { (s, dir) =>
      import s.implicits._
      val benford = Seq(1 -> 301030, 2 -> 176091, 3 -> 124939, 4 -> 96910,
        5 -> 79181, 6 -> 66947, 7 -> 57992, 8 -> 51153, 9 -> 45757)
        .toDF("digit", "exp_ppm")
        .select(col("digit").cast("long").as("digit"),
          col("exp_ppm").cast("long").as("exp_ppm"))
      val o = Tables.lineitem(s, dir)
        .groupBy(expr("CAST(substr(CAST(CAST(floor(l_extendedprice) AS BIGINT)" +
          " AS STRING), 1, 1) AS BIGINT)").as("digit"))
        .agg(count(lit(1)).as("n"))
      o.withColumn("tot",
          sum("n").over(Window.rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing)))
        .withColumn("obs_ppm", expr("n * 1000000 div tot"))
        .join(broadcast(benford), "digit")
        .select(col("digit"), col("n"), col("obs_ppm"), col("exp_ppm"),
          expr("(obs_ppm - exp_ppm) * (obs_ppm - exp_ppm) div exp_ppm")
            .as("chi2_ppm"))
        .orderBy("digit")
    },

    GraftQuery(
      "q193_ab_readout",
      Some("""WITH u AS (
             |  SELECT user_id % 2 AS variant,
             |         CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
             |         CAST(count(DISTINCT CASE WHEN event_type = 'purchase'
             |                                  THEN user_id END) AS BIGINT) AS n_buyers,
             |         CAST(sum(CASE WHEN event_type = 'purchase'
             |                       THEN CAST(floor(value * 1000000) AS BIGINT)
             |                       ELSE 0 END) AS BIGINT) AS purchase_micros,
             |         CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
             |              AS BIGINT) AS n_purchases
             |  FROM events GROUP BY 1
             |)
             |SELECT variant, n_users, n_buyers,
             |       CAST(n_buyers * 1000000 // n_users AS BIGINT) AS conv_ppm,
             |       n_purchases,
             |       CAST(purchase_micros // greatest(n_purchases, 1) AS BIGINT)
             |         AS avg_purchase_micros
             |FROM u ORDER BY variant""".stripMargin),
      "A/B experiment readout: deterministic variant assignment by user-id " +
        "parity (in production: a salted hash — same row-local shape), " +
        "then per-variant funnel stats in ONE aggregate — distinct users, " +
        "distinct converters (the conditional count-distinct NULLs out " +
        "non-purchases, both engines skip NULLs), purchase value in " +
        "integer micros. Conversion is integer ppm; the average guards " +
        "its divisor with greatest(n,1) (the q136 div-by-zero lesson — " +
        "Spark NULLs, DuckDB raises). Two count-distincts expand the " +
        "rows 2× before the shuffle, still one pass over events; at " +
        "100 TB the expand carries (variant, user) pairs — bounded by " +
        "|users|·2, and variant has no skew by construction."
    ) { (s, dir) =>
      val isPurchase = col("event_type") === "purchase"
      Tables.events(s, dir)
        .groupBy((col("user_id") % 2).as("variant"))
        .agg(
          countDistinct(col("user_id")).as("n_users"),
          countDistinct(when(isPurchase, col("user_id"))).as("n_buyers"),
          sum(when(isPurchase, expr("CAST(floor(value * 1000000) AS BIGINT)"))
            .otherwise(0L)).as("purchase_micros"),
          sum(when(isPurchase, 1L).otherwise(0L)).as("n_purchases"))
        .select(col("variant"), col("n_users"), col("n_buyers"),
          expr("n_buyers * 1000000 div n_users").as("conv_ppm"),
          col("n_purchases"),
          expr("purchase_micros div greatest(n_purchases, 1)")
            .as("avg_purchase_micros"))
        .orderBy("variant")
    },

    GraftQuery(
      "q210_tpch_q7",
      Some("""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             |       CAST(extract(year FROM l_shipdate) AS BIGINT) AS l_year,
             |       CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100)
             |                     AS BIGINT)) AS BIGINT) AS revenue_cents
             |FROM lineitem
             |JOIN supplier ON l_suppkey = s_suppkey
             |JOIN orders   ON l_orderkey = o_orderkey
             |JOIN customer ON o_custkey = c_custkey
             |JOIN nation n1 ON s_nationkey = n1.n_nationkey
             |JOIN nation n2 ON c_nationkey = n2.n_nationkey
             |WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
             |    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
             |  AND l_shipdate >= TIMESTAMP '1996-01-01'
             |  AND l_shipdate <  TIMESTAMP '1998-01-01'
             |GROUP BY 1, 2, 3
             |ORDER BY 1, 2, 3""".stripMargin),
      "TPC-H Q7 (bilateral trade volume): the ROLE-PLAYING dimension " +
        "pattern — nation joins twice under different roles (supplier's " +
        "vs customer's), and the disjunctive nation-pair predicate " +
        "cannot collapse into either single join. Both nation copies " +
        "and both entity dims broadcast; the only fact-sized exchange " +
        "is lineitem⋈orders on orderkey, and the shipdate band prunes " +
        "the fact scan (partition-prunable at 100 TB). The supplier-" +
        "side nation filter applies BEFORE the orders join (Catalyst " +
        "pushes it through the broadcast), so most of the fact drops " +
        "in the scan stage — the join-order stress Q7 was designed to " +
        "test, resolved by dimension pre-filtering rather than search."
    ) { (s, dir) =>
      val n1 = Tables.nation(s, dir)
        .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
      val n2 = Tables.nation(s, dir)
        .select(col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation"))
      Tables.lineitem(s, dir)
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
        .join(broadcast(Tables.supplier(s, dir)),
          col("l_suppkey") === col("s_suppkey"))
        .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(Tables.customer(s, dir)),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(n1), col("s_nationkey") === col("s_nk"))
        .join(broadcast(n2), col("c_nationkey") === col("c_nk"))
        .filter((col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_2") ||
          (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).cast("long").as("l_year"))
        .agg(sum(expr("CAST(floor(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)"))
          .as("revenue_cents"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    },

    GraftQuery(
      "q211_tpch_q8",
      Some("""SELECT CAST(extract(year FROM o_orderdate) AS BIGINT) AS o_year,
             |       CAST(sum(CASE WHEN n1.n_name = 'NATION_3'
             |                     THEN CAST(floor(l_extendedprice * (1 - l_discount) * 100)
             |                               AS BIGINT) ELSE 0 END) AS BIGINT)
             |         AS nation_cents,
             |       CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100)
             |                     AS BIGINT)) AS BIGINT) AS market_cents,
             |       CAST(sum(CASE WHEN n1.n_name = 'NATION_3'
             |                     THEN CAST(floor(l_extendedprice * (1 - l_discount) * 100)
             |                               AS BIGINT) ELSE 0 END) * 1000000
             |            // sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100)
             |                       AS BIGINT)) AS BIGINT) AS share_ppm
             |FROM lineitem
             |JOIN supplier ON l_suppkey = s_suppkey
             |JOIN nation n1 ON s_nationkey = n1.n_nationkey
             |JOIN orders   ON l_orderkey = o_orderkey
             |JOIN customer ON o_custkey = c_custkey
             |JOIN nation n2 ON c_nationkey = n2.n_nationkey
             |JOIN region   ON n2.n_regionkey = r_regionkey
             |WHERE r_name = 'ASIA'
             |GROUP BY 1 ORDER BY 1""".stripMargin),
      "TPC-H Q8 (national market share): what share of the ASIA " +
        "customer market does NATION_3's supply base win, per year. " +
        "Same role-playing double-nation topology as q210 plus the " +
        "region rollup on the CUSTOMER role only; numerator selection " +
        "rides a CASE inside the sum so share needs ONE pass (the " +
        "naive form runs the market query twice). The region filter " +
        "prunes via broadcast before the fact-fact join; share is " +
        "integer ppm of exact cents, q188's discipline. Group count = " +
        "|years| — the aggregate is microscopic next to the scan, " +
        "which is the point: market-share dashboards are scan-bound, " +
        "so everything else must broadcast."
    ) { (s, dir) =>
      val cents = expr("CAST(floor(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)")
      val n1 = Tables.nation(s, dir)
        .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
      val n2 = Tables.nation(s, dir)
        .select(col("n_nationkey").as("c_nk"), col("n_regionkey").as("c_rk"))
      Tables.lineitem(s, dir)
        .join(broadcast(Tables.supplier(s, dir)),
          col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(n1), col("s_nationkey") === col("s_nk"))
        .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(Tables.customer(s, dir)),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(n2), col("c_nationkey") === col("c_nk"))
        .join(broadcast(Tables.region(s, dir).filter(col("r_name") === "ASIA")),
          col("c_rk") === col("r_regionkey"))
        .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
        .agg(
          sum(when(col("supp_nation") === "NATION_3", cents).otherwise(0L))
            .as("nation_cents"),
          sum(cents).as("market_cents"))
        .withColumn("share_ppm", expr("nation_cents * 1000000 div market_cents"))
        .orderBy("o_year")
    },

    GraftQuery(
      "q214_dq_rules",
      Some("""WITH r1 AS (
             |  SELECT 'lineitem.ship_after_order' AS rule,
             |         CAST(count(*) AS BIGINT) AS n_checked,
             |         CAST(sum(CASE WHEN l_shipdate < o_orderdate THEN 1 ELSE 0 END)
             |              AS BIGINT) AS n_violations
             |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |), r2 AS (
             |  SELECT 'lineitem.discount_in_unit_range',
             |         CAST(count(*) AS BIGINT),
             |         CAST(sum(CASE WHEN l_discount < 0.0 OR l_discount > 1.0
             |                       THEN 1 ELSE 0 END) AS BIGINT)
             |  FROM lineitem
             |), r3 AS (
             |  SELECT 'lineitem.positive_quantity',
             |         CAST(count(*) AS BIGINT),
             |         CAST(sum(CASE WHEN l_quantity <= 0.0 THEN 1 ELSE 0 END) AS BIGINT)
             |  FROM lineitem
             |), r4 AS (
             |  SELECT 'orders.positive_totalprice',
             |         CAST(count(*) AS BIGINT),
             |         CAST(sum(CASE WHEN o_totalprice <= 0.0 THEN 1 ELSE 0 END) AS BIGINT)
             |  FROM orders
             |), r5 AS (
             |  SELECT 'customer.acctbal_not_null',
             |         CAST(count(*) AS BIGINT),
             |         CAST(sum(CASE WHEN c_acctbal IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             |  FROM customer
             |)
             |SELECT rule, n_checked, n_violations,
             |       CAST(n_violations * 1000000 // n_checked AS BIGINT) AS violation_ppm
             |FROM (SELECT * FROM r1 UNION ALL SELECT * FROM r2 UNION ALL
             |      SELECT * FROM r3 UNION ALL SELECT * FROM r4 UNION ALL
             |      SELECT * FROM r5)
             |ORDER BY rule""".stripMargin),
      "Declarative data-quality rule engine: each rule is a conditional " +
        "count folded into its table's scan — single-column (range, " +
        "null, sign) rules read exactly the checked column, the one " +
        "cross-table rule (ship-after-order) pays the orderkey join " +
        "it genuinely needs — and the report unions |rules| rows. On " +
        "this synthetic corpus the temporal rule actually FIRES " +
        "(~5% of lineitems ship before their order date), which is " +
        "the operator's value: a DQ report whose violations are real " +
        "rows you can drill into, not a schema assertion. At 100 TB " +
        "rules over the same table share one scan via the CASE sums; " +
        "new rules are new columns of the same aggregate, not new " +
        "passes."
    ) { (s, dir) =>
      def rule(name: String, df: org.apache.spark.sql.DataFrame,
               bad: org.apache.spark.sql.Column) =
        df.agg(count(lit(1)).as("n_checked"),
            sum(when(bad, 1L).otherwise(0L)).as("n_violations"))
          .select(lit(name).as("rule"), col("n_checked"), col("n_violations"))
      val joined = Tables.lineitem(s, dir)
        .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
      rule("lineitem.ship_after_order", joined,
          col("l_shipdate") < col("o_orderdate"))
        .unionAll(rule("lineitem.discount_in_unit_range", Tables.lineitem(s, dir),
          col("l_discount") < 0.0 || col("l_discount") > 1.0))
        .unionAll(rule("lineitem.positive_quantity", Tables.lineitem(s, dir),
          col("l_quantity") <= 0.0))
        .unionAll(rule("orders.positive_totalprice", Tables.orders(s, dir),
          col("o_totalprice") <= 0.0))
        .unionAll(rule("customer.acctbal_not_null", Tables.customer(s, dir),
          col("c_acctbal").isNull))
        .select(col("rule"), col("n_checked"), col("n_violations"),
          expr("n_violations * 1000000 div n_checked").as("violation_ppm"))
        .orderBy("rule")
    },

    GraftQuery(
      "q219_last_touch_attribution",
      Some("""WITH e AS (
             |  SELECT user_id, epoch_us(ts) AS tus, event_id, event_type
             |  FROM events
             |), w AS (
             |  SELECT user_id, tus, event_type,
             |         max(CASE WHEN event_type IN ('click', 'view')
             |                  THEN tus * 4 + (CASE event_type WHEN 'click'
             |                                  THEN 1 ELSE 2 END) END)
             |           OVER (PARTITION BY user_id ORDER BY tus, event_id
             |                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
             |           AS touch_code
             |  FROM e
             |), p AS (
             |  SELECT CASE WHEN touch_code IS NULL THEN 'none'
             |              WHEN tus - touch_code // 4 > 604800000000 THEN 'none'
             |              WHEN touch_code % 4 = 1 THEN 'click'
             |              ELSE 'view' END AS channel,
             |         CASE WHEN touch_code IS NOT NULL
             |                   AND tus - touch_code // 4 <= 604800000000
             |              THEN tus - touch_code // 4 END AS lag_us
             |  FROM w WHERE event_type = 'purchase'
             |)
             |SELECT channel, CAST(count(*) AS BIGINT) AS n_purchases,
             |       CAST(count(*) * 1000000 // sum(count(*)) OVER () AS BIGINT)
             |         AS share_ppm,
             |       CAST(coalesce(sum(lag_us) // greatest(count(lag_us), 1)
             |                     // 60000000, 0) AS BIGINT) AS avg_minutes
             |FROM p GROUP BY channel ORDER BY channel""".stripMargin),
      "Last-touch marketing attribution: each purchase credits the " +
        "user's most recent click or view within a 7-day lookback. The " +
        "'latest prior touch' is a running MAX over an integer code " +
        "(micros·4 + channel tag) — monotone in time, so max = most " +
        "recent, and the skill-documented last()/first() frame-order " +
        "trap never arises; equal-timestamp ties resolve by the code's " +
        "channel tag, identically on both engines. One exchange on " +
        "user_id (the same per-user sort every journey query pays), " +
        "purchases filter AFTER the window (the frame needs the full " +
        "event stream), then a 3-row channel rollup with window share. " +
        "The 7-day cutoff is integer micros arithmetic — no interval " +
        "types, no timezone drift."
    ) { (s, dir) =>
      val touch = when(col("event_type").isin("click", "view"),
        col("tus") * 4 + when(col("event_type") === "click", 1L).otherwise(2L))
      val uw = Window.partitionBy("user_id").orderBy("tus", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      val week = 604800000000L
      val p = Tables.events(s, dir)
        .select(col("user_id"), unix_micros(col("ts")).as("tus"),
          col("event_id"), col("event_type"))
        .withColumn("touch_code", max(touch).over(uw))
        .filter(col("event_type") === "purchase")
        .select(
          when(col("touch_code").isNull, "none")
            .when(col("tus") - expr("touch_code div 4") > week, "none")
            .when(expr("touch_code % 4") === 1, "click")
            .otherwise("view").as("channel"),
          when(col("touch_code").isNotNull &&
            col("tus") - expr("touch_code div 4") <= week,
            col("tus") - expr("touch_code div 4")).as("lag_us"))
      val global = Window.rowsBetween(Window.unboundedPreceding,
        Window.unboundedFollowing)
      p.groupBy("channel")
        .agg(count(lit(1)).as("n_purchases"),
          expr("CAST(coalesce(sum(lag_us) div greatest(count(lag_us), 1)" +
            " div 60000000, 0) AS BIGINT)").as("avg_minutes"))
        .withColumn("tot", sum("n_purchases").over(global))
        .select(col("channel"), col("n_purchases"),
          expr("n_purchases * 1000000 div tot").as("share_ppm"),
          col("avg_minutes"))
        .orderBy("channel")
    },

    GraftQuery(
      "q221_converting_paths",
      Some("""WITH s AS (
             |  SELECT user_id, event_type,
             |         lead(event_type, 1) OVER w AS e2,
             |         lead(event_type, 2) OVER w AS e3
             |  FROM events
             |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
             |), p AS (
             |  SELECT event_type AS step1, e2 AS step2,
             |         CAST(count(*) AS BIGINT) AS n
             |  FROM s WHERE e3 = 'purchase' GROUP BY 1, 2
             |)
             |SELECT step1, step2, n,
             |       CAST(n * 1000000 // sum(n) OVER () AS BIGINT) AS share_ppm
             |FROM p
             |ORDER BY n DESC, step1, step2
             |LIMIT 10""".stripMargin),
      "Converting-path mining — which two-step journeys precede a " +
        "purchase: lead()×2 over the per-user time order turns each " +
        "event into the head of a 3-step path, the purchase filter " +
        "drops non-converting paths BEFORE the count shuffles, and the " +
        "result is a |event_types|²-sized frame where the share window " +
        "is free. q172's Markov matrix answers 'what follows X'; this " +
        "answers the funnel designer's question 'what sequence ENDS in " +
        "the conversion'. One exchange on user_id (shared with every " +
        "journey query), one tiny count exchange — path mining at " +
        "100 TB dies only when paths explode combinatorially, which " +
        "the terminal-event filter prevents by construction."
    ) { (s, dir) =>
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val gw = Window.rowsBetween(Window.unboundedPreceding,
        Window.unboundedFollowing)
      Tables.events(s, dir)
        .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
        .withColumn("e2", lead("event_type", 1).over(w))
        .withColumn("e3", lead("event_type", 2).over(w))
        .filter(col("e3") === "purchase")
        .groupBy(col("event_type").as("step1"), col("e2").as("step2"))
        .agg(count(lit(1)).as("n"))
        .withColumn("tot", sum("n").over(gw))
        .select(col("step1"), col("step2"), col("n"),
          expr("n * 1000000 div tot").as("share_ppm"))
        .orderBy(col("n").desc, col("step1"), col("step2"))
        .limit(10)
    },

    GraftQuery(
      "q222_diff_in_diff",
      Some("""WITH x AS (
             |  SELECT CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END AS treated,
             |         CASE WHEN o_orderdate >= TIMESTAMP '1998-01-01' THEN 1 ELSE 0 END AS post,
             |         CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
             |  FROM orders JOIN customer ON o_custkey = c_custkey
             |), cell AS (
             |  SELECT treated, post, CAST(count(*) AS BIGINT) AS n,
             |         CAST(sum(cents) AS BIGINT) AS s,
             |         CAST(sum(cents) // count(*) AS BIGINT) AS mean_cents
             |  FROM x GROUP BY 1, 2
             |)
             |SELECT treated, post, n, mean_cents,
             |       CAST(sum(CASE WHEN treated = 1 AND post = 1 THEN mean_cents
             |                     WHEN treated = 1 AND post = 0 THEN -mean_cents
             |                     WHEN treated = 0 AND post = 1 THEN -mean_cents
             |                     ELSE mean_cents END) OVER () AS BIGINT) AS did_cents
             |FROM cell
             |ORDER BY treated, post""".stripMargin),
      "Difference-in-differences event study — did the BUILDING " +
        "segment's order value move differently after the 1998 cutoff " +
        "than everyone else's? The four (treated × post) cell means " +
        "come out of ONE map-side-combined aggregate over the " +
        "orders⋈customer join (segment broadcast), and the DiD " +
        "estimate is the signed sum of the four means — computed as a " +
        "window over the 4-row cell frame so every row carries the " +
        "headline number next to its own cell. Means are truncated " +
        "integer cents (stated, identical truncation on both engines); " +
        "the causal-inference caveats are the analyst's, the plumbing " +
        "is the engine's: a 100 TB event study is exactly this " +
        "4-cell aggregate, however many rows feed it."
    ) { (s, dir) =>
      val gw = Window.rowsBetween(Window.unboundedPreceding,
        Window.unboundedFollowing)
      Tables.orders(s, dir)
        .join(broadcast(Tables.customer(s, dir)
          .select("c_custkey", "c_mktsegment")),
          col("o_custkey") === col("c_custkey"))
        .select(
          when(col("c_mktsegment") === "BUILDING", 1).otherwise(0).as("treated"),
          when(col("o_orderdate") >= lit("1998-01-01").cast("timestamp"), 1)
            .otherwise(0).as("post"),
          expr("CAST(floor(o_totalprice * 100) AS BIGINT)").as("cents"))
        .groupBy("treated", "post")
        .agg(count(lit(1)).as("n"), sum("cents").as("s"))
        .withColumn("mean_cents", expr("s div n"))
        .withColumn("did_cents",
          sum(when(col("treated") === 1 && col("post") === 1, col("mean_cents"))
            .when(col("treated") === 0 && col("post") === 0, col("mean_cents"))
            .otherwise(-col("mean_cents"))).over(gw))
        .select(col("treated"), col("post"), col("n"), col("mean_cents"),
          col("did_cents"))
        .orderBy("treated", "post")
    },

    GraftQuery(
      "q223_rank_movers",
      Some("""WITH q AS (
             |  SELECT p_brand,
             |         CAST(sum(CASE WHEN l_shipdate < TIMESTAMP '1997-01-01'
             |                       THEN CAST(l_quantity AS BIGINT) ELSE 0 END)
             |              AS BIGINT) AS qty_before,
             |         CAST(sum(CASE WHEN l_shipdate < TIMESTAMP '1997-01-01'
             |                       THEN 0 ELSE CAST(l_quantity AS BIGINT) END)
             |              AS BIGINT) AS qty_after
             |  FROM lineitem JOIN part ON l_partkey = p_partkey
             |  GROUP BY 1
             |), r AS (
             |  SELECT p_brand, qty_before, qty_after,
             |         CAST(row_number() OVER (ORDER BY qty_before DESC, p_brand)
             |              AS BIGINT) AS rank_before,
             |         CAST(row_number() OVER (ORDER BY qty_after DESC, p_brand)
             |              AS BIGINT) AS rank_after
             |  FROM q
             |)
             |SELECT p_brand, qty_before, qty_after, rank_before, rank_after,
             |       CAST(rank_before - rank_after AS BIGINT) AS rank_gain
             |FROM r
             |ORDER BY abs(rank_before - rank_after) DESC, p_brand
             |LIMIT 10""".stripMargin),
      "Period-over-period rank movers — which brands climbed or fell " +
        "the sales leaderboard between eras, in ONE fact pass: the " +
        "period split is a CASE inside two conditional sums of the " +
        "same aggregate (never two scans, never a self-join — the " +
        "q223 cousin of q184's structural lesson), and both period " +
        "rankings are windows over the resulting |brands| frame where " +
        "sorting is free. q135 reports value deltas; rank deltas are " +
        "the report executives actually read, and they need the full-" +
        "period ranking — which is why the rank must come after the " +
        "aggregate, never via a fact-sized sort."
    ) { (s, dir) =>
      val pre = col("l_shipdate") < lit("1997-01-01").cast("timestamp")
      val qty = col("l_quantity").cast("long")
      val q = Tables.lineitem(s, dir)
        .join(broadcast(Tables.part(s, dir)),
          col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand")
        .agg(sum(when(pre, qty).otherwise(0L)).as("qty_before"),
          sum(when(pre, 0L).otherwise(qty)).as("qty_after"))
      q.withColumn("rank_before", row_number().over(
          Window.orderBy(col("qty_before").desc, col("p_brand"))).cast("long"))
        .withColumn("rank_after", row_number().over(
          Window.orderBy(col("qty_after").desc, col("p_brand"))).cast("long"))
        .select(col("p_brand"), col("qty_before"), col("qty_after"),
          col("rank_before"), col("rank_after"),
          (col("rank_before") - col("rank_after")).as("rank_gain"))
        .orderBy(abs(col("rank_gain")).desc, col("p_brand"))
        .limit(10)
    }
  )
}
