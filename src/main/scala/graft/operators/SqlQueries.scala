package graft.operators

import graft.{GraftQuery, Tables}
import org.apache.spark.sql.functions._

/** SQL-surface operators: correlated/uncorrelated subqueries, pivot,
  * ordered string aggregation, exact percentiles and moment statistics
  * (SURVEY.md §2.2 — the parts of the surface users reach through
  * `spark.sql` as much as the DataFrame API).
  */
object SqlQueries {

  val all: Seq[GraftQuery] = Seq(

    GraftQuery(
      "q52_exists_subquery",
      Some("""SELECT c_custkey, c_mktsegment
             |FROM customer c
             |WHERE EXISTS (SELECT 1 FROM orders o
             |              WHERE o.o_custkey = c.c_custkey
             |                AND o.o_totalprice > 150000)
             |ORDER BY c_custkey""".stripMargin),
      "Correlated EXISTS decorrelates to a left-semi join with the " +
        "predicate pushed below the join — same single-shuffle shape as " +
        "q17; the subquery never executes per-row."
    ) { (s, dir) =>
      Tables.customer(s, dir).createOrReplaceTempView("sq_customer")
      Tables.orders(s, dir).createOrReplaceTempView("sq_orders")
      s.sql("""SELECT c_custkey, c_mktsegment
              |FROM sq_customer c
              |WHERE EXISTS (SELECT 1 FROM sq_orders o
              |              WHERE o.o_custkey = c.c_custkey
              |                AND o.o_totalprice > 150000)
              |ORDER BY c_custkey""".stripMargin)
    },

    GraftQuery(
      "q53_scalar_subquery",
      Some("""SELECT o_orderkey, round(o_totalprice, 2) AS price
             |FROM orders
             |WHERE o_totalprice > 2 * (SELECT avg(o_totalprice) FROM orders)
             |ORDER BY o_orderkey""".stripMargin),
      "Uncorrelated scalar subquery: planned as an independent stage whose " +
        "single-row result is broadcast into the filter — the orders scan " +
        "runs exactly twice (once for the avg, once filtered), never per-row."
    ) { (s, dir) =>
      Tables.orders(s, dir).createOrReplaceTempView("sq2_orders")
      s.sql("""SELECT o_orderkey, round(o_totalprice, 2) AS price
              |FROM sq2_orders
              |WHERE o_totalprice > 2 * (SELECT avg(o_totalprice) FROM sq2_orders)
              |ORDER BY o_orderkey""".stripMargin)
    },

    GraftQuery(
      "q54_in_subquery",
      Some("""SELECT s_suppkey, s_name
             |FROM supplier
             |WHERE s_nationkey IN (SELECT n_nationkey FROM nation
             |                      WHERE n_regionkey = 1)
             |ORDER BY s_suppkey""".stripMargin),
      "IN subquery → left-semi join against the (tiny, broadcast) nation " +
        "side; the supplier scan is never shuffled."
    ) { (s, dir) =>
      Tables.supplier(s, dir).createOrReplaceTempView("sq3_supplier")
      Tables.nation(s, dir).createOrReplaceTempView("sq3_nation")
      s.sql("""SELECT s_suppkey, s_name
              |FROM sq3_supplier
              |WHERE s_nationkey IN (SELECT n_nationkey FROM sq3_nation
              |                      WHERE n_regionkey = 1)
              |ORDER BY s_suppkey""".stripMargin)
    },

    GraftQuery(
      "q55_pivot",
      Some("""SELECT user_id,
             |       count(*) FILTER (WHERE event_type = 'click')    AS click,
             |       count(*) FILTER (WHERE event_type = 'error')    AS error,
             |       count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
             |       count(*) FILTER (WHERE event_type = 'signup')   AS signup,
             |       count(*) FILTER (WHERE event_type = 'view')     AS view
             |FROM events
             |GROUP BY user_id
             |ORDER BY user_id""".stripMargin),
      "Pivot with an explicit value list compiles to one conditional " +
        "aggregation pass — no second job to discover pivot values, one " +
        "shuffle keyed on user_id. Always pin pivot values at 100 TB."
    ) { (s, dir) =>
      Tables.events(s, dir)
        .groupBy("user_id")
        .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
        .agg(count(lit(1)))
        .na.fill(0L)
        .orderBy("user_id")
    },

    GraftQuery(
      "q56_string_agg",
      Some("""SELECT o_orderpriority,
             |       string_agg(DISTINCT o_orderstatus, ',' ORDER BY o_orderstatus) AS statuses,
             |       count(*) AS n
             |FROM orders
             |GROUP BY o_orderpriority
             |ORDER BY o_orderpriority""".stripMargin),
      "Ordered string aggregation = collect_set → array_sort → array_join: " +
        "the set dedups map-side, and the deterministic sort happens on the " +
        "final (small) per-group set, not via a global ordering."
    ) { (s, dir) =>
      Tables.orders(s, dir)
        .groupBy("o_orderpriority")
        .agg(
          array_join(array_sort(collect_set(col("o_orderstatus"))), ",").as("statuses"),
          count(lit(1)).as("n"))
        .orderBy("o_orderpriority")
    },

    GraftQuery(
      "q57_percentiles",
      Some("""SELECT l_returnflag,
             |       round(quantile_cont(l_quantity, 0.25), 4) AS p25,
             |       round(quantile_cont(l_quantity, 0.50), 4) AS p50,
             |       round(quantile_cont(l_quantity, 0.75), 4) AS p75,
             |       round(quantile_cont(l_quantity, 0.95), 4) AS p95
             |FROM lineitem
             |GROUP BY l_returnflag
             |ORDER BY l_returnflag""".stripMargin),
      "Exact interpolated percentiles (Spark `percentile` ≡ DuckDB " +
        "quantile_cont). Exact percentile buffers every value per group — " +
        "fine per-group here; at 100 TB switch to approx_percentile " +
        "(KLL/GK sketch, fixed-size mergeable state) and accept ε error."
    ) { (s, dir) =>
      Tables.lineitem(s, dir)
        .groupBy("l_returnflag")
        .agg(
          round(expr("percentile(l_quantity, 0.25)"), 4).as("p25"),
          round(expr("percentile(l_quantity, 0.50)"), 4).as("p50"),
          round(expr("percentile(l_quantity, 0.75)"), 4).as("p75"),
          round(expr("percentile(l_quantity, 0.95)"), 4).as("p95"))
        .orderBy("l_returnflag")
    },

    GraftQuery(
      "q58_moment_stats",
      // ORACLE NOTE — do not "simplify" the skew_price expression: Spark's
      // skewness() is the POPULATION skewness (g1) while DuckDB's skewness()
      // is SAMPLE-corrected (G1); the (n-2)/sqrt(n(n-1)) factor converts
      // DuckDB's G1 back to g1. Likewise kurtosis_pop (not kurtosis) matches
      // Spark's population kurtosis. Removing either breaks the value hash.
      Some("""SELECT l_linestatus,
             |       round(stddev_samp(l_extendedprice), 2) AS sd_price,
             |       round(var_samp(l_discount), 6)         AS var_disc,
             |       round(corr(l_quantity, l_extendedprice), 4) AS corr_qty_price,
             |       round(covar_samp(l_quantity, l_discount), 4) AS cov_qty_disc,
             |       round(skewness(l_extendedprice)
             |             * (count(*) - 2) / sqrt(count(*) * (count(*) - 1.0)), 4) AS skew_price,
             |       round(kurtosis_pop(l_extendedprice), 4) AS kurt_price
             |FROM lineitem
             |GROUP BY l_linestatus
             |ORDER BY l_linestatus""".stripMargin),
      "Second/third/fourth-moment statistics: all are single-pass " +
        "mergeable central-moment aggregates (Welford-style partial " +
        "state), so they scale exactly like sum/avg — fixed-size state per " +
        "group, one shuffle."
    ) { (s, dir) =>
      Tables.lineitem(s, dir)
        .groupBy("l_linestatus")
        .agg(
          round(stddev_samp(col("l_extendedprice")), 2).as("sd_price"),
          round(var_samp(col("l_discount")), 6).as("var_disc"),
          // NullSafe variants = the SAME Catalyst aggregates with their
          // nullOnDivideByZero flag forced on: ANSI Spark otherwise THROWS
          // on a constant group (m2 = 0) where DuckDB yields NULL — the
          // ties-corpus (EdgeCorpus rows=8) finding. See MomentExpressions.
          round(org.apache.spark.sql.graft.MomentExpressions
            .corrNullSafe(col("l_quantity"), col("l_extendedprice")), 4)
            .as("corr_qty_price"),
          round(covar_samp(col("l_quantity"), col("l_discount")), 4).as("cov_qty_disc"),
          round(org.apache.spark.sql.graft.MomentExpressions
            .skewnessNullSafe(col("l_extendedprice")), 4).as("skew_price"),
          round(org.apache.spark.sql.graft.MomentExpressions
            .kurtosisNullSafe(col("l_extendedprice")), 4).as("kurt_price"))
        .orderBy("l_linestatus")
    },

    GraftQuery(
      "q59_salted_agg",
      Some("""SELECT l_suppkey,
             |       CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100)
             |                     AS BIGINT)) AS BIGINT) AS revenue_cents,
             |       count(*) AS n
             |FROM lineitem
             |GROUP BY l_suppkey
             |ORDER BY l_suppkey""".stripMargin),
      "Skew-mitigation pattern, oracle-checked to be semantics-preserving: " +
        "stage 1 aggregates by (key, salt) so a hot key's rows spread over " +
        "16 reducers; stage 2 combines the 16 partials per key. On uniform " +
        "data this costs one extra (tiny) shuffle; on a 100 TB skewed key " +
        "it is the difference between one straggler task and 16 parallel " +
        "ones. AQE's skew-join handling applies the same idea to joins " +
        "automatically; this form works for aggregations AQE can't split."
    ) { (s, dir) =>
      Tables.lineitem(s, dir)
        .withColumn("salt", pmod(col("l_orderkey"), lit(16)))
        .groupBy("l_suppkey", "salt")
        .agg(sum(floor(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * lit(100))
          .cast("long")).as("rev_part"),
          count(lit(1)).as("n_part"))
        .groupBy("l_suppkey")
        .agg(sum("rev_part").as("revenue_cents"), sum("n_part").as("n"))
        .orderBy("l_suppkey")
    },

    GraftQuery(
      "q60_map_funcs",
      Some("""SELECT event_id,
             |       'k,type' AS keys_sorted,
             |       json_extract(props, '$.k')::BIGINT AS k_val,
             |       'k=' || json_extract_string(props, '$.k')
             |            || ',type=' || event_type AS entries_str,
             |       CAST(3 AS INT) AS n_after_concat
             |FROM events
             |ORDER BY event_id""".stripMargin),
      "Map-typed columns: construct, key-sort, point-lookup, entry-explode " +
        "(as sorted entry strings) and map_concat — all codegen'd " +
        "expressions over per-row state; maps never hit a shuffle here."
    ) { (s, dir) =>
      val m = map(
        lit("k"), get_json_object(col("props"), "$.k"),
        lit("type"), col("event_type"))
      val m2 = map_concat(m, map(lit("src"), lit("graft")))
      Tables.events(s, dir).select(
        col("event_id"),
        array_join(sort_array(map_keys(m)), ",").as("keys_sorted"),
        element_at(m, "k").cast("long").as("k_val"),
        array_join(transform(sort_array(map_entries(m)),
          e => concat_ws("=", e("key"), e("value"))), ",").as("entries_str"),
        size(m2).as("n_after_concat"))
        .orderBy("event_id")
    },

    GraftQuery(
      "q61_null_handling",
      Some("""SELECT o_orderstatus,
             |       count(*) AS n_rows,
             |       count(NULLIF(o_orderpriority, '1-URGENT')) AS n_not_urgent,
             |       CAST(sum(CASE WHEN o_totalprice > 200000 THEN 1 ELSE 0 END) AS BIGINT) AS n_big,
             |       round(avg(NULLIF(o_totalprice, 0.0)), 2) AS avg_nonzero_price,
             |       coalesce(min(NULLIF(o_orderstatus, o_orderstatus)), 'all-null') AS coalesced
             |FROM orders
             |GROUP BY o_orderstatus
             |ORDER BY o_orderstatus""".stripMargin),
      "Null semantics under aggregation: count(col) skips nulls, avg " +
        "ignores them, coalesce supplies defaults — synthesized here with " +
        "nullif since the test tables are null-free. Null-skipping is free " +
        "in partial aggregation (null rows simply don't update the buffer)."
    ) { (s, dir) =>
      Tables.orders(s, dir)
        .groupBy("o_orderstatus")
        .agg(
          count(lit(1)).as("n_rows"),
          count(nullif(col("o_orderpriority"), lit("1-URGENT"))).as("n_not_urgent"),
          sum(when(col("o_totalprice") > 200000, 1).otherwise(0)).cast("long").as("n_big"),
          round(avg(nullif(col("o_totalprice"), lit(0.0))), 2).as("avg_nonzero_price"),
          coalesce(min(nullif(col("o_orderstatus"), col("o_orderstatus"))), lit("all-null"))
            .as("coalesced"))
        .orderBy("o_orderstatus")
    },

    GraftQuery(
      "q62_join_right_outer",
      Some("""SELECT n_name,
             |       count(s_suppkey) AS n_supps
             |FROM supplier
             |RIGHT JOIN nation ON s_nationkey = n_nationkey
             |GROUP BY n_name
             |ORDER BY n_name""".stripMargin),
      "Right outer keeps supplier-less nations (count=0). Catalyst plans " +
        "it as a left outer with sides swapped and broadcasts the tiny " +
        "nation side — the supplier scan never shuffles."
    ) { (s, dir) =>
      Tables.supplier(s, dir)
        .join(Tables.nation(s, dir), col("s_nationkey") === col("n_nationkey"), "right")
        .groupBy("n_name")
        .agg(count(col("s_suppkey")).as("n_supps"))
        .orderBy("n_name")
    },

    GraftQuery(
      "q63_scalar_udf",
      Some("""SELECT p_partkey,
             |       CAST(len(regexp_extract_all(p_name, '[aeiou]')) AS BIGINT) AS n_vowels
             |FROM part
             |ORDER BY p_partkey""".stripMargin),
      "The plain Scala udf() surface (a black box to Catalyst: no codegen, " +
        "no pushdown through it — which is why the engine prefers built-ins " +
        "and native expressions; this query exists to cover the escape " +
        "hatch). Row-local, shuffle-free."
    ) { (s, dir) =>
      val vowels = udf((t: String) => t.count("aeiou".contains(_)).toLong)
      Tables.part(s, dir)
        .select(col("p_partkey"), vowels(col("p_name")).as("n_vowels"))
        .orderBy("p_partkey")
    },

    GraftQuery(
      "q70_unpivot",
      Some("""SELECT l_orderkey, l_linenumber, metric, value
             |FROM (SELECT l_orderkey, l_linenumber,
             |             l_quantity, l_extendedprice, l_discount, l_tax
             |      FROM lineitem WHERE l_orderkey < 100)
             |UNPIVOT (value FOR metric IN (l_quantity, l_extendedprice, l_discount, l_tax))
             |ORDER BY l_orderkey, l_linenumber, metric""".stripMargin),
      "Unpivot (wide → long): each row fans out to one row per measure " +
        "column — a pure per-row Generate, no shuffle except the " +
        "presentation sort. The inverse of q55's pivot; together they " +
        "round-trip the layout. At 100 TB prefer storing long-form and " +
        "pivoting late: unpivot multiplies rows but the generator is " +
        "pipelined inside the scan stage."
    ) { (s, dir) =>
      Tables.lineitem(s, dir)
        .filter(col("l_orderkey") < 100)
        .select("l_orderkey", "l_linenumber",
          "l_quantity", "l_extendedprice", "l_discount", "l_tax")
        .unpivot(
          Array(col("l_orderkey"), col("l_linenumber")),
          Array(col("l_quantity"), col("l_extendedprice"), col("l_discount"), col("l_tax")),
          "metric", "value")
        .orderBy("l_orderkey", "l_linenumber", "metric")
    },

    GraftQuery(
      "q71_lateral_topn",
      Some("""SELECT n.n_name, c.c_custkey, round(c.c_acctbal, 2) AS bal
             |FROM nation n, LATERAL (
             |  SELECT c_custkey, c_acctbal FROM customer
             |  WHERE c_nationkey = n.n_nationkey
             |  ORDER BY c_acctbal DESC, c_custkey LIMIT 2) c
             |ORDER BY n_name, bal DESC, c_custkey""".stripMargin),
      "Correlated LATERAL subquery (top-2 customers per nation): Catalyst " +
        "decorrelates the per-row subquery into a join + windowed group " +
        "limit — the subquery never executes once per outer row. Same " +
        "result as q26's window form, reached through the SQL surface a " +
        "migrating user would actually write."
    ) { (s, dir) =>
      Tables.nation(s, dir).createOrReplaceTempView("lat_nation")
      Tables.customer(s, dir).createOrReplaceTempView("lat_customer")
      s.sql("""SELECT n.n_name, c.c_custkey, round(c.c_acctbal, 2) AS bal
              |FROM lat_nation n, LATERAL (
              |  SELECT c_custkey, c_acctbal FROM lat_customer
              |  WHERE c_nationkey = n.n_nationkey
              |  ORDER BY c_acctbal DESC, c_custkey LIMIT 2) c
              |ORDER BY n_name, bal DESC, c_custkey""".stripMargin)
    },

    GraftQuery(
      "q73_approx_percentiles",
      None, // sketch-based by design; ApproxSpec bounds error vs exact q57.
      "Approximate percentiles (approx_percentile with accuracy 10000): a " +
        "mergeable quantile sketch per group — fixed-size partial state " +
        "through the shuffle like any sum, where the exact form (q57) must " +
        "materialize and sort each group's values. At 100 TB this is the " +
        "only viable per-group quantile; accuracy trades directly against " +
        "state size."
    ) { (s, dir) =>
      // same grouping/column/quantiles as exact q57 so the spec can bound
      // the sketch error directly against the oracle-checked values
      Tables.lineitem(s, dir)
        .groupBy("l_returnflag")
        .agg(
          percentile_approx(col("l_quantity"), lit(0.25), lit(10000)).as("p25"),
          percentile_approx(col("l_quantity"), lit(0.50), lit(10000)).as("p50"),
          percentile_approx(col("l_quantity"), lit(0.75), lit(10000)).as("p75"),
          percentile_approx(col("l_quantity"), lit(0.95), lit(10000)).as("p95"))
        .orderBy("l_returnflag")
    },

    GraftQuery(
      "q141_robust_outliers",
      Some("""WITH c AS (
             |  SELECT l_returnflag,
             |         CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
             |  FROM lineitem
             |), med AS (
             |  SELECT l_returnflag, quantile_cont(cents, 0.5) AS med
             |  FROM c GROUP BY l_returnflag
             |), dev AS (
             |  SELECT c.l_returnflag, c.cents, m.med,
             |         abs(c.cents - m.med) AS adev
             |  FROM c JOIN med m ON c.l_returnflag = m.l_returnflag
             |), mad AS (
             |  SELECT l_returnflag, quantile_cont(adev, 0.5) AS mad
             |  FROM dev GROUP BY l_returnflag
             |)
             |SELECT d.l_returnflag, d.med, mad.mad,
             |       -- CASTs: bare decimal literals would multiply as EXACT
             |       -- DECIMAL (4.4478) vs Spark's double 3.0*1.4826 — 1 ulp off
             |       CAST(count(*) FILTER (d.adev > CAST(3.0 AS DOUBLE)
             |                             * CAST(1.4826 AS DOUBLE) * mad.mad)
             |         AS BIGINT) AS n_outliers,
             |       CAST(count(*) FILTER (d.adev > CAST(1.4826 AS DOUBLE) * mad.mad)
             |         AS BIGINT) AS n_mild,
             |       CAST(count(*) AS BIGINT) AS n
             |FROM dev d JOIN mad ON d.l_returnflag = mad.l_returnflag
             |GROUP BY d.l_returnflag, d.med, mad.mad
             |ORDER BY d.l_returnflag""".stripMargin),
      "Robust outlier detection via median absolute deviation — the " +
        "heavy-tail-safe alternative to q58's moment statistics (one " +
        "extreme value drags a mean/stddev gate arbitrarily; the " +
        "median/MAD pair has a 50% breakdown point, which is why data-" +
        "quality gates on scraped corpora use it): per group, the median " +
        "lands first, absolute deviations re-aggregate to THEIR median, " +
        "and the classic 3·1.4826·MAD fence counts outliers. Two exact-" +
        "percentile passes with the tiny per-group medians broadcast " +
        "back between them — money enters as integer cents so the " +
        "interpolated medians are exact half-integers, bit-identical in " +
        "both engines (quantile_cont ≡ Spark percentile, the q57 " +
        "parity), and the fence compare is the same IEEE product on " +
        "both sides. At 100 TB the exact percentile swaps for " +
        "approx_percentile per q73 and the second pass rides the same " +
        "partial-aggregation shape — MAD is two medians, so the sketch " +
        "path is just the quantile path twice."
    ) { (s, dir) =>
      val c = Tables.lineitem(s, dir)
        .select(col("l_returnflag"),
          round(col("l_extendedprice") * 100).cast("long").as("cents"))
      val med = c.groupBy("l_returnflag")
        .agg(expr("percentile(cents, 0.5)").as("med"))
      val dev = c.join(broadcast(med), "l_returnflag")
        .withColumn("adev", abs(col("cents") - col("med")))
      val mad = dev.groupBy("l_returnflag")
        .agg(expr("percentile(adev, 0.5)").as("mad"))
      dev.join(broadcast(mad), "l_returnflag")
        .groupBy("l_returnflag", "med", "mad")
        .agg(count(when(col("adev") > lit(3.0) * lit(1.4826) * col("mad"),
          lit(1))).as("n_outliers"),
          // the 1-sigma-equivalent mild fence is NONZERO on this uniform
          // corpus, so the fence machinery is live under the oracle
          // compare even when the 3-sigma count is legitimately 0
          count(when(col("adev") > lit(1.4826) * col("mad"), lit(1)))
            .as("n_mild"),
          count(lit(1)).as("n"))
        .select(col("l_returnflag"), col("med"), col("mad"),
          col("n_outliers"), col("n_mild"), col("n"))
        .orderBy("l_returnflag")
    },

    GraftQuery(
      "q141b_robust_outliers_approx",
      None, // sketch-based by design; ApproxSpec bounds it against exact q141.
      "q141's own 100 TB path, shipped as a first-class sibling instead of " +
        "a design note: the same median/MAD/fence pipeline with both " +
        "percentile passes swapped for approx_percentile (accuracy 10000) " +
        "— mergeable fixed-size sketch partials through each shuffle where " +
        "the exact form's ObjectHashAggregate must hold every group's " +
        "values (the bench ceiling of round 3). The fence arithmetic, " +
        "broadcast join-backs and group shapes are IDENTICAL to q141, so " +
        "the sketch swap is provably drop-in: ApproxSpec pins med/mad " +
        "within sketch tolerance of the exact values and the outlier " +
        "counts within the mass the quantile error can move. MAD is two " +
        "medians, so the sketch path is just the quantile path twice."
    ) { (s, dir) =>
      val c = Tables.lineitem(s, dir)
        .select(col("l_returnflag"),
          round(col("l_extendedprice") * 100).cast("long").as("cents"))
      val med = c.groupBy("l_returnflag")
        .agg(percentile_approx(col("cents"), lit(0.5), lit(10000))
          .cast("double").as("med"))
      val dev = c.join(broadcast(med), "l_returnflag")
        .withColumn("adev", abs(col("cents") - col("med")))
      val mad = dev.groupBy("l_returnflag")
        .agg(percentile_approx(col("adev"), lit(0.5), lit(10000))
          .cast("double").as("mad"))
      dev.join(broadcast(mad), "l_returnflag")
        .groupBy("l_returnflag", "med", "mad")
        .agg(count(when(col("adev") > lit(3.0) * lit(1.4826) * col("mad"),
          lit(1))).as("n_outliers"),
          count(when(col("adev") > lit(1.4826) * col("mad"), lit(1)))
            .as("n_mild"),
          count(lit(1)).as("n"))
        .select(col("l_returnflag"), col("med"), col("mad"),
          col("n_outliers"), col("n_mild"), col("n"))
        .orderBy("l_returnflag")
    },

    GraftQuery(
      "q126_correlated_agg",
      Some("""SELECT l.l_partkey,
             |       CAST(count(*) AS BIGINT) AS n_small,
             |       CAST(round(sum(l.l_extendedprice) * 100) AS BIGINT)
             |         AS small_cents
             |FROM lineitem l
             |WHERE l.l_quantity < 0.5 * (SELECT avg(l2.l_quantity)
             |                            FROM lineitem l2
             |                            WHERE l2.l_partkey = l.l_partkey)
             |GROUP BY l.l_partkey
             |ORDER BY l.l_partkey""".stripMargin),
      "Correlated aggregate subquery (the TPC-H Q17 shape): each row " +
        "compares against ITS OWN group's average — the query a migrating " +
        "SQL user writes with a per-row subquery, which executed naively " +
        "is one aggregation per outer row. Catalyst DECORRELATES it: the " +
        "subquery becomes one grouped aggregate over lineitem joined " +
        "back on the correlation key, so the plan is two scans + one " +
        "co-partitioned join — both sides hash on l_partkey, one " +
        "exchange each, never a per-row loop (q71's LATERAL is the same " +
        "machinery surfaced explicitly; a window AVG OVER (PARTITION " +
        "BY) form trades the join for one sort). The 0.5× threshold " +
        "multiplies an integer-derived average — IEEE basic ops both " +
        "engines — and money lands as integer cents. At 100 TB " +
        "decorrelation is the difference between a day and a " +
        "non-termination; the plan sweep asserts no nested-loop shape " +
        "survives."
    ) { (s, dir) =>
      Tables.lineitem(s, dir).createOrReplaceTempView("ca_lineitem")
      s.sql("""SELECT l.l_partkey,
              |       CAST(count(*) AS BIGINT) AS n_small,
              |       CAST(round(sum(l.l_extendedprice) * 100) AS BIGINT)
              |         AS small_cents
              |FROM ca_lineitem l
              |WHERE l.l_quantity < 0.5 * (SELECT avg(l2.l_quantity)
              |                            FROM ca_lineitem l2
              |                            WHERE l2.l_partkey = l.l_partkey)
              |GROUP BY l.l_partkey
              |ORDER BY l.l_partkey""".stripMargin)
    }
  )
}
