package graft.operators

import graft.{GraftQuery, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Window functions: ranking, analytic (lag/lead), frame-spec aggregates,
  * top-k per group (SURVEY.md §2.2 "Window functions").
  *
  * Scale design: a window = one shuffle on partitionBy keys + an in-partition
  * sort. All windows here partition on a real entity key (custkey, segment),
  * so partitions stay bounded as data grows; none uses an empty partitionBy
  * (which would serialize the whole dataset through one task at 100 TB).
  * Every orderBy carries a unique tie-break column so rank/lag results are
  * deterministic across engines.
  */
object WindowQueries {

  val all: Seq[GraftQuery] = Seq(

    GraftQuery(
      "q23_window_rank",
      Some("""SELECT c_mktsegment, c_custkey, c_acctbal,
             |       row_number()  OVER w AS rn,
             |       rank()        OVER w AS rnk,
             |       dense_rank()  OVER w AS drnk,
             |       ntile(4)      OVER w AS quartile
             |FROM customer
             |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)
             |ORDER BY c_mktsegment, rn""".stripMargin),
      "Ranking family over one shared window spec — single shuffle+sort " +
        "serves all four functions."
    ) { (s, dir) =>
      val w = Window.partitionBy("c_mktsegment").orderBy(col("c_acctbal").desc, col("c_custkey"))
      Tables.customer(s, dir)
        .select(col("c_mktsegment"), col("c_custkey"), col("c_acctbal"),
          row_number().over(w).cast("long").as("rn"),
          rank().over(w).cast("long").as("rnk"),
          dense_rank().over(w).cast("long").as("drnk"),
          ntile(4).over(w).cast("long").as("quartile"))
        .orderBy("c_mktsegment", "rn")
    },

    GraftQuery(
      "q24_window_analytic",
      Some("""SELECT o_orderkey, o_custkey,
             |       lag(o_totalprice)  OVER w AS prev_price,
             |       lead(o_totalprice) OVER w AS next_price,
             |       first_value(o_orderdate) OVER w AS first_date
             |FROM orders
             |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
             |ORDER BY o_orderkey""".stripMargin),
      "lag/lead/first_value share one per-customer chronological window; " +
        "partition key = custkey keeps state bounded per task."
    ) { (s, dir) =>
      val w = Window.partitionBy("o_custkey").orderBy(col("o_orderdate"), col("o_orderkey"))
      Tables.orders(s, dir)
        .select(col("o_orderkey"), col("o_custkey"),
          lag("o_totalprice", 1).over(w).as("prev_price"),
          lead("o_totalprice", 1).over(w).as("next_price"),
          first("o_orderdate").over(w).as("first_date"))
        .orderBy("o_orderkey")
    },

    GraftQuery(
      "q25_window_frames",
      Some("""SELECT o_orderkey, o_custkey,
             |       round(sum(o_totalprice) OVER (PARTITION BY o_custkey
             |             ORDER BY o_orderdate, o_orderkey
             |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total,
             |       round(avg(o_totalprice) OVER (PARTITION BY o_custkey
             |             ORDER BY o_orderdate, o_orderkey
             |             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS moving_avg3
             |FROM orders
             |ORDER BY o_orderkey""".stripMargin),
      "Frame-spec aggregates (running sum, 3-row moving average) — " +
        "incremental evaluation within the sorted partition, no extra pass."
    ) { (s, dir) =>
      val base = Window.partitionBy("o_custkey").orderBy(col("o_orderdate"), col("o_orderkey"))
      Tables.orders(s, dir)
        .select(col("o_orderkey"), col("o_custkey"),
          round(sum("o_totalprice").over(base.rowsBetween(Window.unboundedPreceding, Window.currentRow)), 2)
            .as("running_total"),
          round(avg("o_totalprice").over(base.rowsBetween(-2, Window.currentRow)), 4)
            .as("moving_avg3"))
        .orderBy("o_orderkey")
    },

    GraftQuery(
      "q26_topk_per_group",
      Some("""SELECT o_custkey, o_orderkey, o_totalprice, rn
             |FROM (SELECT o_custkey, o_orderkey, o_totalprice,
             |             row_number() OVER (PARTITION BY o_custkey
             |                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
             |      FROM orders)
             |WHERE rn <= 3
             |ORDER BY o_custkey, rn""".stripMargin),
      "Top-3 per customer via row_number≤k — Catalyst rewrites this to a " +
        "per-partition top-k (WindowGroupLimit) so each task keeps a k-heap " +
        "instead of sorting whole groups."
    ) { (s, dir) =>
      val w = Window.partitionBy("o_custkey").orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables.orders(s, dir)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"), col("rn").cast("long").as("rn"))
        .orderBy("o_custkey", "rn")
    },

    GraftQuery(
      "q88_window_distribution",
      Some("""SELECT l_orderkey, l_linenumber,
             |       CAST(ntile(8) OVER w AS BIGINT) AS bucket8,
             |       percent_rank() OVER w AS pr,
             |       cume_dist() OVER w AS cd
             |FROM lineitem
             |WINDOW w AS (PARTITION BY l_returnflag
             |             ORDER BY l_extendedprice, l_orderkey, l_linenumber)
             |ORDER BY l_orderkey, l_linenumber""".stripMargin),
      "Distribution window functions — ntile (equi-depth bucketing for " +
        "stratification), percent_rank and cume_dist (per-group quantile " +
        "position, the building block of percentile-based quality gates). " +
        "One exchange on the partition key, one in-partition sort; the " +
        "three functions share the same window frame so they compute in a " +
        "single Window operator pass. The ratios are exact IEEE divisions " +
        "of row counts (no transcendentals), so they hash-match the oracle " +
        "bit-for-bit. Total tie-break ordering makes every rank " +
        "deterministic."
    ) { (s, dir) =>
      val w = Window.partitionBy("l_returnflag")
        .orderBy(col("l_extendedprice"), col("l_orderkey"), col("l_linenumber"))
      Tables.lineitem(s, dir)
        .select(col("l_orderkey"), col("l_linenumber"),
          ntile(8).over(w).cast("long").as("bucket8"),
          percent_rank().over(w).as("pr"),
          cume_dist().over(w).as("cd"))
        .orderBy("l_orderkey", "l_linenumber")
    },

    GraftQuery(
      "q106_rolling_time_features",
      Some("""WITH base AS (
             |  SELECT event_id, user_id, epoch_us(ts) AS us,
             |         CAST(round(value * 100) AS BIGINT) AS cents
             |  FROM events
             |)
             |SELECT event_id, user_id,
             |       count(*) OVER w7 AS n_7d,
             |       CAST(sum(cents) OVER w7 AS BIGINT) AS cents_7d,
             |       count(*) OVER w1 AS n_1h
             |FROM base
             |WINDOW w7 AS (PARTITION BY user_id ORDER BY us
             |              RANGE BETWEEN 604800000000 PRECEDING AND CURRENT ROW),
             |       w1 AS (PARTITION BY user_id ORDER BY us
             |              RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
             |ORDER BY event_id""".stripMargin),
      "Rolling TIME-RANGE window features — per event, the user's activity " +
        "count and spend over the trailing 7 days and hour: the " +
        "point-in-time feature-store shape (each training row sees " +
        "exactly the history available at its own timestamp, no leakage). " +
        "RANGE frames differ from q25's ROWS frames in both semantics " +
        "(peers at the same instant are all in-frame) and execution (the " +
        "frame edge slides by VALUE, so each partition is one sorted " +
        "pass with two moving pointers — no per-row re-scan). The frame " +
        "bound is integer MICROSECONDS on both engines: an interval frame " +
        "over truncated epoch-seconds would disagree with full-precision " +
        "timestamp arithmetic at the boundary. Both frames share one " +
        "user_id partitioning — one exchange, one sort, one Window " +
        "operator. At 100 TB this replaces the self-join feature " +
        "backfill (events ⋈ events on user × 7-day theta) that is the " +
        "single most common accidental-quadratic in feature pipelines."
    ) { (s, dir) =>
      val w7 = Window.partitionBy("user_id").orderBy("us")
        .rangeBetween(-604800000000L, 0)
      val w1 = Window.partitionBy("user_id").orderBy("us")
        .rangeBetween(-3600000000L, 0)
      Tables.events(s, dir)
        .select(col("event_id"), col("user_id"),
          unix_micros(col("ts")).as("us"),
          round(col("value") * 100).cast("long").as("cents"))
        .select(col("event_id"), col("user_id"),
          count(lit(1)).over(w7).as("n_7d"),
          sum("cents").over(w7).as("cents_7d"),
          count(lit(1)).over(w1).as("n_1h"))
        .orderBy("event_id")
    },

    GraftQuery(
      "q121_activity_streaks",
      Some("""WITH days AS (
             |  SELECT DISTINCT user_id,
             |         date_diff('day', DATE '2024-01-01',
             |                   CAST(date_trunc('day', ts) AS DATE)) AS d
             |  FROM events
             |), grouped AS (
             |  SELECT user_id, d,
             |         d - row_number() OVER (PARTITION BY user_id ORDER BY d) AS isl
             |  FROM days
             |), streaks AS (
             |  SELECT user_id, isl, count(*) AS len
             |  FROM grouped GROUP BY user_id, isl
             |)
             |SELECT user_id,
             |       CAST(sum(len) AS BIGINT) AS n_active_days,
             |       CAST(count(*) AS BIGINT) AS n_streaks,
             |       CAST(max(len) AS BIGINT) AS longest_streak
             |FROM streaks GROUP BY user_id
             |ORDER BY user_id""".stripMargin),
      "Gaps-and-islands streak detection (the canonical consecutive-runs " +
        "SQL shape): distinct active days per user, then the island id is " +
        "day_number MINUS row_number — constant exactly while days are " +
        "consecutive, so each streak collapses under one grouping with NO " +
        "self-join and NO iteration; per-user streak stats follow from a " +
        "second tiny aggregate. Everything partitions by user: one " +
        "exchange feeds the dedup, the window and both aggregations " +
        "(Catalyst reuses the partitioning), and the window's sort is " +
        "per-user-days, never global. The self-join alternative (day d " +
        "joined to d+1, transitively closed) is quadratic-ish and " +
        "iterative; this is the 100 TB retention-analytics path. Day " +
        "numbers are integer day-diffs from a fixed anchor — identical " +
        "integer arithmetic in both engines, no date-format drift."
    ) { (s, dir) =>
      val days = Tables.events(s, dir)
        .select(col("user_id"),
          datediff(date_trunc("day", col("ts")), lit("2024-01-01").cast("timestamp"))
            .cast("long").as("d"))
        .distinct()
      val grouped = days.withColumn("isl",
        col("d") - row_number().over(
          Window.partitionBy("user_id").orderBy("d")))
      grouped
        .groupBy("user_id", "isl").agg(count(lit(1)).as("len"))
        .groupBy("user_id")
        .agg(sum("len").as("n_active_days"),
          count(lit(1)).as("n_streaks"),
          max("len").as("longest_streak"))
        .orderBy("user_id")
    },

    GraftQuery(
      "q143_ratio_to_report",
      Some("""WITH rev AS (
             |  SELECT c.c_nationkey AS nationkey, o.o_custkey AS custkey,
             |         CAST(round(sum(o.o_totalprice) * 100) AS BIGINT) AS cents
             |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
             |  GROUP BY 1, 2
             |)
             |SELECT nationkey, custkey, cents,
             |       CAST((cents * 10000)
             |            // CAST(sum(cents) OVER (PARTITION BY nationkey) AS BIGINT)
             |         AS BIGINT) AS share_bp
             |FROM rev
             |ORDER BY nationkey, custkey""".stripMargin),
      "Contribution analysis (RATIO_TO_REPORT): each customer's share of " +
        "their nation's revenue in integer basis points — the " +
        "part-of-whole question every BI drill-down asks. Revenue first " +
        "collapses to one row per (nation, customer) in a partial+final " +
        "hash aggregate, THEN the windowed partition total divides it — " +
        "the window runs over the AGGREGATED frame (customers per " +
        "nation), never the fact table, and reuses the aggregation's " +
        "hash partitioning on nationkey: one fact shuffle total. Share " +
        "is truncating integer division of cents — exact both engines " +
        "(q135's rule); shares per nation sum to ≤10000 with the " +
        "truncation remainder, which is the auditable invariant. At " +
        "100 TB the denominator is a per-partition window over group-" +
        "count rows — the two-phase total the q136 prefix-sum note " +
        "describes, already materialized by the aggregate."
    ) { (s, dir) =>
      val rev = Tables.orders(s, dir)
        .join(Tables.customer(s, dir).select("c_custkey", "c_nationkey"),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_nationkey").as("nationkey"), col("o_custkey").as("custkey"))
        .agg(round(sum("o_totalprice") * 100).cast("long").as("cents"))
      rev
        .withColumn("share_bp",
          expr("(cents * 10000) div sum(cents) over (partition by nationkey)"))
        .orderBy("nationkey", "custkey")
    },

    GraftQuery(
      "q144_sequence_gaps",
      Some("""WITH ids AS (
             |  -- synthesized loss (q134's deterministic-dirt rule): this
             |  -- stream's ids are dense, so every 97th record "goes missing"
             |  SELECT DISTINCT event_id FROM events WHERE event_id % 97 <> 0
             |), marked AS (
             |  SELECT event_id,
             |         lead(event_id) OVER (ORDER BY event_id) AS next_id
             |  FROM ids
             |)
             |SELECT event_id + 1 AS gap_start, next_id - 1 AS gap_end,
             |       CAST(next_id - event_id - 1 AS BIGINT) AS n_missing
             |FROM marked
             |WHERE next_id - event_id > 1
             |ORDER BY gap_start""".stripMargin),
      "Sequence-gap detection — the lost-data audit for any monotonically " +
        "assigned id or offset stream (Kafka offsets, CDC LSNs, invoice " +
        "numbers): consecutive distinct ids compare via one lead() and " +
        "every jump > 1 reports its missing range. The window is a single " +
        "global ordering, which is correct at the AUDIT grain — at 100 TB " +
        "run it per partition key first (each Kafka partition's offsets " +
        "are independently dense; a global id space range-partitions and " +
        "checks boundaries between ranges with one extra pass over " +
        "per-range min/max — the q136 two-phase shape). Pure integer " +
        "arithmetic; an empty result IS the invariant 'no data lost', " +
        "and the loss here is synthesized deterministically (every 97th " +
        "id) because the fixture stream is dense — the q134 dirt rule, " +
        "reproduced identically by the oracle."
    ) { (s, dir) =>
      val w = Window.orderBy("event_id")
      Tables.events(s, dir)
        .filter(col("event_id") % 97 =!= 0) // synthesized loss, oracle-mirrored
        .select(col("event_id")).distinct()
        .withColumn("next_id", lead(col("event_id"), 1).over(w))
        .filter(col("next_id") - col("event_id") > 1)
        .select((col("event_id") + 1).as("gap_start"),
          (col("next_id") - 1).as("gap_end"),
          (col("next_id") - col("event_id") - 1).as("n_missing"))
        .orderBy("gap_start")
    }
  )
}
