package graft.operators

import graft.{GraftQuery, Tables}
import graft.functions.VectorFunctions
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Time-window operators over the `events` stream table, verified in their
  * batch form (the streaming execution of the same expressions is exercised
  * in graft.streaming; results are identical by Structured Streaming's
  * batch-equivalence contract).
  *
  * Scale design: tumbling/sliding/session windows are all hash aggregations
  * keyed by (window, key) — partial aggregation applies, and with a
  * watermark the streaming state store evicts closed windows, so state is
  * bounded by (active windows × keys), not by history.
  */
object EventQueries {

  val all: Seq[GraftQuery] = Seq(

    GraftQuery(
      "q33_window_tumbling",
      Some("""SELECT time_bucket(INTERVAL '5 minutes', ts) AS w_start,
             |       event_type,
             |       count(*) AS n,
             |       round(sum(value), 2) AS sum_value
             |FROM events
             |GROUP BY 1, 2
             |ORDER BY w_start, event_type""".stripMargin),
      "Tumbling 5-minute window: window assignment is a pure projection " +
        "(epoch-aligned bucketing), then a standard partial+final agg."
    ) { (s, dir) =>
      Tables.events(s, dir)
        .groupBy(window(col("ts"), "5 minutes"), col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
        .select(col("window.start").as("w_start"), col("event_type"), col("n"), col("sum_value"))
        .orderBy("w_start", "event_type")
    },

    GraftQuery(
      "q34_window_sliding",
      Some("""SELECT w_start, count(*) AS n, round(sum(value), 2) AS sum_value
             |FROM (SELECT unnest([time_bucket(INTERVAL '5 minutes', ts),
             |                     time_bucket(INTERVAL '5 minutes', ts) - INTERVAL 5 MINUTE]) AS w_start,
             |             value
             |      FROM events)
             |GROUP BY w_start
             |ORDER BY w_start""".stripMargin),
      "Sliding window (10 min length, 5 min slide): each row replicates " +
        "into length/slide = 2 windows before the agg — replication factor " +
        "is constant, so cost scales linearly."
    ) { (s, dir) =>
      Tables.events(s, dir)
        .groupBy(window(col("ts"), "10 minutes", "5 minutes"))
        .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
        .select(col("window.start").as("w_start"), col("n"), col("sum_value"))
        .orderBy("w_start")
    },

    GraftQuery(
      "q35_window_session",
      Some("""WITH marked AS (
             |  SELECT user_id, event_id, ts, value,
             |         CASE WHEN lag(ts) OVER w IS NULL
             |                OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
             |              THEN 1 ELSE 0 END AS new_s
             |  FROM events
             |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
             |), numbered AS (
             |  SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
             |                             ROWS UNBOUNDED PRECEDING) AS sid
             |  FROM marked
             |)
             |SELECT user_id, min(ts) AS s_start, count(*) AS n, round(sum(value), 2) AS sum_value
             |FROM numbered
             |GROUP BY user_id, sid
             |ORDER BY user_id, s_start""".stripMargin),
      "Session window (30-minute gap): Spark's session_window merges " +
        "per-key sorted runs; state per key is one open session. The oracle " +
        "reproduces the gap-merge with lag + cumulative-sum islands."
    ) { (s, dir) =>
      Tables.events(s, dir)
        .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
        .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
        .select(col("user_id"), col("session_window.start").as("s_start"), col("n"), col("sum_value"))
        .orderBy("user_id", "s_start")
    },

    GraftQuery(
      "q36_dedup_keyed_first",
      Some("""SELECT event_id, user_id, event_type
             |FROM (SELECT event_id, user_id, event_type,
             |             row_number() OVER (PARTITION BY user_id, event_type
             |                                ORDER BY event_id) AS rn
             |      FROM events)
             |WHERE rn = 1
             |ORDER BY event_id""".stripMargin),
      "Deterministic keep-first dedup (the batch analogue of streaming " +
        "dropDuplicates): one shuffle on the dedup key; in streaming the " +
        "same key-state lives in the state store behind a watermark."
    ) { (s, dir) =>
      val w = Window.partitionBy("user_id", "event_type").orderBy(col("event_id"))
      Tables.events(s, dir)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select("event_id", "user_id", "event_type")
        .orderBy("event_id")
    },

    GraftQuery(
      "q37_event_user_join",
      Some("""SELECT e.event_type,
             |       count(*) AS n,
             |       CAST(count(DISTINCT c.c_custkey) AS BIGINT) AS n_users,
             |       round(avg(e.value), 4) AS avg_value
             |FROM events e
             |JOIN customer c ON e.user_id = c.c_custkey
             |WHERE c.c_mktsegment IN ('BUILDING', 'AUTOMOBILE')
             |GROUP BY e.event_type
             |ORDER BY e.event_type""".stripMargin),
      "Stream-static enrichment join in batch form: customer is the static " +
        "broadcast side, so the event stream never shuffles for the join."
    ) { (s, dir) =>
      Tables.events(s, dir)
        .join(broadcast(Tables.customer(s, dir).filter(col("c_mktsegment").isin("BUILDING", "AUTOMOBILE"))),
          col("user_id") === col("c_custkey"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          countDistinct(col("c_custkey")).as("n_users"),
          round(avg("value"), 4).as("avg_value"))
        .orderBy("event_type")
    },

    GraftQuery(
      "q87_funnel",
      Some("""WITH ev AS (
             |  SELECT user_id, event_type, ts FROM events
             |), u AS (
             |  SELECT DISTINCT user_id FROM ev
             |), s1 AS (
             |  SELECT user_id, min(ts) t1 FROM ev
             |  WHERE event_type = 'view' GROUP BY 1
             |), s2 AS (
             |  SELECT e.user_id, min(e.ts) t2 FROM ev e JOIN s1 USING (user_id)
             |  WHERE e.event_type = 'click' AND e.ts > s1.t1
             |    AND e.ts <= s1.t1 + INTERVAL 12 HOUR GROUP BY 1
             |), s3 AS (
             |  SELECT e.user_id, min(e.ts) t3 FROM ev e JOIN s2 USING (user_id)
             |  WHERE e.event_type = 'purchase' AND e.ts > s2.t2
             |    AND e.ts <= s2.t2 + INTERVAL 12 HOUR GROUP BY 1
             |)
             |SELECT CAST(CASE WHEN t3 IS NOT NULL THEN 3
             |                 WHEN t2 IS NOT NULL THEN 2
             |                 WHEN t1 IS NOT NULL THEN 1
             |                 ELSE 0 END AS BIGINT) AS funnel_depth,
             |       count(*) AS n_users, min(user_id) AS first_user
             |FROM u
             |LEFT JOIN s1 USING (user_id)
             |LEFT JOIN s2 USING (user_id)
             |LEFT JOIN s3 USING (user_id)
             |GROUP BY 1 ORDER BY 1""".stripMargin),
      "Ordered-sequence funnel (view → click → purchase, strictly " +
        "increasing timestamps, 12 h conversion window per stage): each " +
        "stage is 'first qualifying event AFTER the previous stage's " +
        "first, within the window' — the match_recognize shape, " +
        "expressed as chained min-aggregations so it stays declarative. " +
        "Every stage keys on user_id: each event subset shuffles once for " +
        "its own aggregation, and because join and groupBy share the key, " +
        "a stage's output partitioning satisfies the next stage's " +
        "requirement — no re-partitioning between stages (locally the " +
        "tiny stage outputs broadcast instead, which is also right). " +
        "Event-type filters prune at the scan. At 100 TB, deeper funnels " +
        "add stages over ever-smaller survivor sets, not extra corpus scans."
    ) { (s, dir) =>
      val ev = Tables.events(s, dir).select("user_id", "event_type", "ts")
      val users = ev.select("user_id").distinct()
      val s1 = ev.filter(col("event_type") === "view")
        .groupBy("user_id").agg(min("ts").as("t1"))
      val win = expr("INTERVAL 12 HOURS")
      val s2 = ev.filter(col("event_type") === "click")
        .join(s1, "user_id")
        .filter(col("ts") > col("t1") && col("ts") <= col("t1") + win)
        .groupBy("user_id").agg(min("ts").as("t2"))
      val s3 = ev.filter(col("event_type") === "purchase")
        .join(s2, "user_id")
        .filter(col("ts") > col("t2") && col("ts") <= col("t2") + win)
        .groupBy("user_id").agg(min("ts").as("t3"))
      users
        .join(s1, Seq("user_id"), "left")
        .join(s2, Seq("user_id"), "left")
        .join(s3, Seq("user_id"), "left")
        .select(col("user_id"),
          when(col("t3").isNotNull, 3L).when(col("t2").isNotNull, 2L)
            .when(col("t1").isNotNull, 1L).otherwise(0L).as("funnel_depth"))
        .groupBy("funnel_depth")
        .agg(count(lit(1)).as("n_users"), min("user_id").as("first_user"))
        .orderBy("funnel_depth")
    },

    GraftQuery(
      "q92_hll_rollup",
      None, // approximate by design: ±5% contract spec'd vs exact distinct.
      "Sketch-as-a-column re-aggregation — THE production distinct-count " +
        "pattern: each day aggregates its users into a mergeable HLL " +
        "sketch (Datasketches hll_sketch_agg, fixed-size partial state), " +
        "and coarser grains (weeks here) UNION the stored daily sketches " +
        "instead of re-scanning raw events — a 100 TB event history rolls " +
        "up from kilobytes of sketches. Estimates carry the standard HLL " +
        "error (~1.6% at lgK=12, spec-pinned at ±5% vs exact); the same " +
        "daily sketch table serves any calendar grain, which no exact " +
        "count-distinct materialization can do without a full re-scan."
    ) { (s, dir) =>
      val daily = Tables.events(s, dir)
        .groupBy(date_trunc("day", col("ts")).cast("date").as("d"))
        .agg(hll_sketch_agg(col("user_id")).as("sk"))
      daily
        .groupBy(weekofyear(col("d")).cast("long").as("week"))
        .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("approx_users"),
          count(lit(1)).as("n_days"))
        .orderBy("week")
    },

    GraftQuery(
      "q90_gap_fill",
      Some("""WITH daily AS (
             |  SELECT CAST(date_trunc('day', ts) AS DATE) AS d, count(*) AS n
             |  FROM events
             |  WHERE event_type = 'purchase' AND user_id % 53 = 3
             |  GROUP BY 1
             |), bounds AS (
             |  SELECT min(d) lo, max(d) hi FROM daily
             |), days AS (
             |  SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE) AS d
             |  FROM bounds
             |), filled AS (
             |  SELECT days.d, daily.n,
             |         last_value(daily.n IGNORE NULLS)
             |           OVER (ORDER BY days.d
             |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ff
             |  FROM days LEFT JOIN daily USING (d)
             |)
             |SELECT d, CAST(coalesce(n, 0) AS BIGINT) AS n_actual,
             |       CAST(ff AS BIGINT) AS n_filled,
             |       CAST(CASE WHEN n IS NULL THEN 1 ELSE 0 END AS BIGINT) AS was_gap
             |FROM filled
             |ORDER BY d""".stripMargin),
      "Time-series regularization: a sparse daily aggregate is joined " +
        "against the full calendar (sequence() between the data's own " +
        "min/max — no literals) and gaps forward-fill from the last " +
        "observation (last(n, ignoreNulls) over an unbounded-preceding " +
        "frame) — the resample/ffill every metrics and feature pipeline " +
        "needs before windowed models. The heavy work (the daily agg) " +
        "partial-aggregates at event volume; the calendar join and fill " +
        "run over O(days) rows, so the single-partition fill window is " +
        "bounded by the time horizon, not the data (36,500 rows per " +
        "century). was_gap makes imputation auditable downstream."
    ) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val daily = Tables.events(s, dir)
        .filter(col("event_type") === "purchase" && pmod(col("user_id"), lit(53)) === 3)
        .groupBy(date_trunc("day", col("ts")).cast("date").as("d"))
        .agg(count(lit(1)).as("n"))
      val days = daily.agg(min("d").as("lo"), max("d").as("hi"))
        .select(explode(sequence(col("lo"), col("hi"), expr("interval 1 day"))).as("d"))
      val w = Window.orderBy("d")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      days.join(daily, Seq("d"), "left")
        .select(col("d"),
          coalesce(col("n"), lit(0L)).as("n_actual"),
          last(col("n"), ignoreNulls = true).over(w).as("n_filled"),
          when(col("n").isNull, 1L).otherwise(0L).as("was_gap"))
        .orderBy("d")
    },

    GraftQuery(
      "q93_cdc_upsert",
      Some("""WITH latest AS (
             |  SELECT user_id, event_id, event_type,
             |         CAST(round(value * 100) AS BIGINT) AS val_cents
             |  FROM events
             |  QUALIFY row_number() OVER (PARTITION BY user_id
             |                             ORDER BY ts DESC, event_id DESC) = 1
             |)
             |SELECT coalesce(c.c_custkey, l.user_id) AS key,
             |       CASE WHEN l.user_id IS NULL THEN 'kept'
             |            WHEN c.c_custkey IS NULL THEN 'inserted'
             |            ELSE 'updated' END AS status,
             |       CASE WHEN l.user_id IS NULL
             |            THEN CAST(round(c.c_acctbal * 100) AS BIGINT)
             |            ELSE l.val_cents END AS bal_cents,
             |       l.event_id AS last_event_id
             |FROM customer c
             |FULL JOIN latest l ON c.c_custkey = l.user_id
             |WHERE l.event_type IS NULL OR l.event_type <> 'error'
             |ORDER BY key""".stripMargin),
      "CDC merge (MERGE INTO / upsert-apply): a changelog keyed by user is " +
        "collapsed to latest-write-wins (one window pass, ties broken by " +
        "event_id so the winner is total-ordered), then FULL OUTER joined " +
        "onto the snapshot — unmatched snapshot rows are kept, unmatched " +
        "changes insert, matches update, and an 'error'-type tombstone " +
        "deletes (suppressing both the snapshot row and the insert). The " +
        "window and the join hash-partition on the same key, so applying a " +
        "day's changelog to a 100 TB snapshot is one co-partitioned " +
        "shuffle each side — and with both tables bucketed by key on " +
        "write (the engine's bucketed-join path), zero shuffle: each " +
        "bucket merges independently, which is how log-structured engines " +
        "compact. Money lands as integer cents — the exactness rule for " +
        "cross-engine currency."
    ) { (s, dir) =>
      val latest = Tables.events(s, dir)
        .withColumn("rn", row_number().over(
          Window.partitionBy("user_id").orderBy(col("ts").desc, col("event_id").desc)))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("event_id"), col("event_type"),
          round(col("value") * 100).cast("long").as("val_cents"))
      Tables.customer(s, dir).alias("c")
        .join(latest.alias("l"), col("c.c_custkey") === col("l.user_id"), "full_outer")
        .filter(col("l.event_type").isNull || col("l.event_type") =!= "error")
        .select(
          coalesce(col("c.c_custkey"), col("l.user_id")).as("key"),
          when(col("l.user_id").isNull, "kept")
            .when(col("c.c_custkey").isNull, "inserted")
            .otherwise("updated").as("status"),
          when(col("l.user_id").isNull,
            round(col("c.c_acctbal") * 100).cast("long"))
            .otherwise(col("l.val_cents")).as("bal_cents"),
          col("l.event_id").as("last_event_id"))
        .orderBy("key")
    },

    GraftQuery(
      "q98_scd2_build",
      Some("""WITH ch AS (
             |  SELECT user_id, event_id, ts,
             |         CAST(round(value * 100) AS BIGINT) AS val_cents,
             |         lag(CAST(round(value * 100) AS BIGINT))
             |           OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
             |  FROM events
             |), scd AS (
             |  SELECT user_id, event_id, ts AS valid_from, val_cents,
             |         lead(ts) OVER (PARTITION BY user_id
             |                        ORDER BY ts, event_id) AS valid_to
             |  FROM ch
             |  WHERE prev IS NULL OR prev <> val_cents
             |)
             |SELECT user_id,
             |       CAST(row_number() OVER (PARTITION BY user_id
             |                               ORDER BY valid_from, event_id)
             |            AS BIGINT) AS version,
             |       valid_from, valid_to,
             |       valid_to IS NULL AS is_current,
             |       val_cents
             |FROM scd
             |ORDER BY user_id, version""".stripMargin),
      "SCD Type 2 dimension build: the raw changelog becomes a versioned " +
        "interval table — consecutive no-change rows collapse (lag pass), " +
        "survivors get [valid_from, valid_to) ranges (lead pass) and a " +
        "current-row flag, the point-in-time lookup shape every warehouse " +
        "keeps under its AS OF joins (q20/q22 consume exactly such " +
        "tables). All three window passes share ONE hash partitioning on " +
        "user_id — Catalyst plans a single exchange and chains the sorts, " +
        "so building the dimension over a 100 TB changelog is one shuffle " +
        "of (key, ts, value) triples, and with the changelog bucketed by " +
        "key on write, zero. Money lands as integer cents (cross-engine " +
        "exactness); ties in ts break on event_id so versions are " +
        "total-ordered and reproducible."
    ) { (s, dir) =>
      val byKey = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val scd = Tables.events(s, dir)
        .select(col("user_id"), col("event_id"), col("ts"),
          round(col("value") * 100).cast("long").as("val_cents"))
        .withColumn("prev", lag("val_cents", 1).over(byKey))
        .filter(col("prev").isNull || col("prev") =!= col("val_cents"))
        .withColumn("valid_to", lead("ts", 1).over(byKey))
      scd
        .select(col("user_id"),
          row_number().over(byKey).cast("long").as("version"),
          col("ts").as("valid_from"), col("valid_to"),
          col("valid_to").isNull.as("is_current"),
          col("val_cents"))
        .orderBy("user_id", "version")
    },

    GraftQuery(
      "q110_scd2_lookup",
      Some("""WITH ch AS (
             |  SELECT user_id, event_id, ts,
             |         CAST(round(value * 100) AS BIGINT) AS val_cents,
             |         lag(CAST(round(value * 100) AS BIGINT))
             |           OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
             |  FROM events
             |), scd AS (
             |  SELECT user_id, ts AS valid_from, val_cents,
             |         lead(ts) OVER (PARTITION BY user_id
             |                        ORDER BY ts, event_id) AS valid_to
             |  FROM ch
             |  WHERE prev IS NULL OR prev <> val_cents
             |)
             |SELECT p.event_id, p.user_id,
             |       CAST(round(p.value * 100) AS BIGINT) AS purchase_cents,
             |       d.val_cents AS dim_cents_asof
             |FROM events p
             |JOIN scd d ON d.user_id = p.user_id
             |           AND p.ts >= d.valid_from
             |           AND (d.valid_to IS NULL OR p.ts < d.valid_to)
             |WHERE p.event_type = 'purchase'
             |ORDER BY event_id""".stripMargin),
      "Point-in-time dimension lookup AS OF each fact row — the query " +
        "shape q98's SCD2 table exists to serve, and the leakage-free " +
        "way to attach slowly-changing attributes to training facts " +
        "(joining today's dimension value onto last year's events is the " +
        "classic label-leakage bug). Equi-join on the entity key with " +
        "the interval containment as a residual: both sides hash-" +
        "partition on user_id — the dimension build's window passes and " +
        "this join share that one partitioning, and each fact matches " +
        "EXACTLY one version (intervals partition the timeline by " +
        "construction: half-open, gap-free, NULL-capped), so the join " +
        "neither drops nor multiplies facts — an invariant the row " +
        "count itself verifies against the purchase count. At 100 TB " +
        "this beats the sort-merge as-of (q22) when the dimension is " +
        "compact after no-change collapse; bucketed by user_id on " +
        "write, zero shuffle."
    ) { (s, dir) =>
      val byKey = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val dim = Tables.events(s, dir)
        .select(col("user_id"), col("event_id"), col("ts"),
          round(col("value") * 100).cast("long").as("val_cents"))
        .withColumn("prev", lag("val_cents", 1).over(byKey))
        .filter(col("prev").isNull || col("prev") =!= col("val_cents"))
        .withColumn("valid_to", lead("ts", 1).over(byKey))
        .select(col("user_id").as("d_user"), col("ts").as("valid_from"),
          col("valid_to"), col("val_cents"))
      Tables.events(s, dir)
        .filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"),
          round(col("value") * 100).cast("long").as("purchase_cents"))
        .join(dim, col("user_id") === col("d_user") &&
          col("ts") >= col("valid_from") &&
          (col("valid_to").isNull || col("ts") < col("valid_to")))
        .select(col("event_id"), col("user_id"), col("purchase_cents"),
          col("val_cents").as("dim_cents_asof"))
        .orderBy("event_id")
    },

    GraftQuery(
      "q104_histogram_quantiles",
      Some("""WITH h AS (
             |  SELECT CAST(date_trunc('week', o_orderdate) AS DATE) AS wk,
             |         CAST(round(o_totalprice * 100) AS BIGINT) // 50000 AS bucket,
             |         count(*) AS c
             |  FROM orders
             |  GROUP BY wk, bucket
             |), cum AS (
             |  SELECT wk, bucket, c,
             |         sum(c) OVER (PARTITION BY wk ORDER BY bucket) AS cum,
             |         sum(c) OVER (PARTITION BY wk) AS n
             |  FROM h
             |)
             |SELECT wk, CAST(n AS BIGINT) AS n_orders,
             |       CAST(min(CASE WHEN cum >= (n + 1) // 2 THEN bucket END) * 500
             |            AS BIGINT) AS p50_lo
             |     , CAST(min(CASE WHEN cum * 100 >= n * 95 THEN bucket END) * 500
             |            AS BIGINT) AS p95_lo
             |     , CAST(min(CASE WHEN cum * 100 >= n * 99 THEN bucket END) * 500
             |            AS BIGINT) AS p99_lo
             |FROM cum
             |GROUP BY wk, n
             |ORDER BY wk""".stripMargin),
      "Mergeable histogram-sketch quantiles: each week's order values " +
        "collapse into fixed-width bucket counts (the histogram IS the " +
        "sketch; Spark's partial aggregation IS the merge — no custom " +
        "state needed, which is the 'compose existing ops first' rule), " +
        "then p50/p95/p99 read off the cumulative counts as the first " +
        "bucket whose running sum crosses the rank threshold. Unlike " +
        "t-digest/KLL the answer is DETERMINISTIC — bucket resolution " +
        "(500 currency units) is the only error — so the oracle checks " +
        "it EXACTLY, integer arithmetic end to end; q73's " +
        "approx_percentile gets only a rows-only check for the same " +
        "job. At 100 TB the weekly (bucket, count) rows are kilobytes: " +
        "coarser grains (month, year) re-aggregate stored histograms " +
        "without touching raw data, the q92 rollup pattern with an " +
        "exact contract."
    ) { (s, dir) =>
      val hist = Tables.orders(s, dir)
        .select(date_trunc("week", col("o_orderdate")).cast("date").as("wk"),
          expr("cast(round(o_totalprice * 100) as bigint) div 50000").as("bucket"))
        .groupBy("wk", "bucket").agg(count(lit(1)).as("c"))
      val wOrd = Window.partitionBy("wk").orderBy("bucket")
      val wAll = Window.partitionBy("wk")
      hist
        .withColumn("cum", sum("c").over(wOrd))
        .withColumn("n", sum("c").over(wAll))
        .groupBy("wk", "n")
        .agg(
          (min(when(col("cum") >= expr("(n + 1) div 2"), col("bucket"))) * 500)
            .cast("long").as("p50_lo"),
          (min(when(col("cum") * 100 >= col("n") * 95, col("bucket"))) * 500)
            .cast("long").as("p95_lo"),
          (min(when(col("cum") * 100 >= col("n") * 99, col("bucket"))) * 500)
            .cast("long").as("p99_lo"))
        .select(col("wk"), col("n").as("n_orders"),
          col("p50_lo"), col("p95_lo"), col("p99_lo"))
        .orderBy("wk")
    },

    GraftQuery(
      "q101_zorder_tiles",
      Some("""WITH pts AS (
             |  SELECT user_id AS x,
             |         date_diff('minute', TIMESTAMP '2024-01-01 00:00:00', ts) AS y
             |  FROM events
             |  -- layout-epoch precondition, enforced rather than assumed:
             |  -- below the anchor, floor (date_diff) and truncating (div)
             |  -- minute arithmetic disagree and the sign bit would leak
             |  -- into the interleave
             |  WHERE ts >= TIMESTAMP '2024-01-01 00:00:00'
             |), z AS (
             |  SELECT x, y,
             |         -- 31 bits per dim: 1<<63 overflows DuckDB's BIGINT shift,
             |         -- and both dims are range-coded far below 2^31
             |         CAST(list_sum(list_transform(range(0, 31),
             |           i -> ((x >> i) & 1) * (CAST(1 AS BIGINT) << (2*i))
             |              + ((y >> i) & 1) * (CAST(1 AS BIGINT) << (2*i + 1))))
             |           AS BIGINT) AS zval
             |  FROM pts
             |)
             |SELECT zval >> 22 AS tile,
             |       count(*) AS n,
             |       min(x) AS min_user, max(x) AS max_user,
             |       min(y) AS min_minute, max(y) AS max_minute
             |FROM z
             |GROUP BY tile
             |ORDER BY tile""".stripMargin),
      "Z-order (Morton) layout key: interleaving the bits of (user, " +
        "minute) makes one sort key whose prefix tiles bound BOTH " +
        "dimensions — the per-tile min/max audit in the output IS the " +
        "pruning property, since a range-partitioned write on zval gives " +
        "every file a footer that is tight on user AND time, so filters " +
        "on either dimension prune files (a single-column sort only " +
        "prunes its own column; this is how lakehouse OPTIMIZE ZORDER " +
        "works). The key is a native codegen'd expression " +
        "(graft_zorder — mask-shift bit spreading, no loop); the oracle " +
        "recomputes the interleave bit-by-bit in SQL. Pure map work plus " +
        "one tile aggregation; at 100 TB wider domains range-bucket to " +
        "32-bit codes against footer min/max stats first (the engine's " +
        "q42/q67 sizing path), then Layout.compactBy(zorder) writes the " +
        "clustered table — spec-checked for two-dimensional file bounds."
    ) { (s, dir) =>
      val z = Tables.events(s, dir)
        .filter(col("ts") >= lit("2024-01-01 00:00:00").cast("timestamp"))
        .select(col("user_id").as("x"),
          expr(s"(cast(ts as long) - cast(timestamp'2024-01-01 00:00:00' as long)) div 60").as("y"))
        .select(col("x"), col("y"), VectorFunctions.zorder(col("x"), col("y")).as("zval"))
      z.groupBy(shiftright(col("zval"), 22).as("tile"))
        .agg(count(lit(1)).as("n"),
          min("x").as("min_user"), max("x").as("max_user"),
          min("y").as("min_minute"), max("y").as("max_minute"))
        .orderBy("tile")
    },

    GraftQuery(
      "q139_dwell_time",
      Some("""WITH seq AS (
             |  SELECT user_id, event_type, epoch_us(ts) AS us,
             |         lead(epoch_us(ts)) OVER (PARTITION BY user_id
             |                                  ORDER BY ts, event_id) AS next_us
             |  FROM events
             |)
             |SELECT user_id, event_type AS state,
             |       CAST(count(next_us) AS BIGINT) AS n_dwells,
             |       CAST(sum(next_us - us) AS BIGINT) AS total_dwell_micros,
             |       CAST(max(next_us - us) AS BIGINT) AS max_dwell_micros
             |FROM seq
             |GROUP BY user_id, event_type
             |ORDER BY user_id, state""".stripMargin),
      "Time-in-state / dwell-time analysis (the telemetry question 'how " +
        "long does each entity sit in each state'): each event opens a " +
        "dwell that the SAME user's next event closes — one lead() over " +
        "the per-user time-sorted stream turns the event log into " +
        "intervals with no self-join (the q106/q132 discipline: " +
        "consecutive-row semantics are a window, never a join), then a " +
        "plain aggregate rolls intervals up per (user, state). The final " +
        "open dwell has no close and is EXCLUDED by count/sum ignoring " +
        "the null lead — the unbiased choice, since its true duration " +
        "is censored at observation end. One exchange on user feeds " +
        "both the window and (via partial aggs) the rollup; durations " +
        "are integer micros end to end. At 100 TB this is the session-" +
        "quality / funnel-latency primitive: state here is the event " +
        "type, but any SCD2-style status column (q98) slots in."
    ) { (s, dir) =>
      val w = Window.partitionBy("user_id").orderBy("us", "event_id")
      Tables.events(s, dir)
        .select(col("user_id"), col("event_id"), col("event_type"),
          unix_micros(col("ts")).as("us"))
        .withColumn("next_us", lead(col("us"), 1).over(w))
        .groupBy(col("user_id"), col("event_type").as("state"))
        .agg(count(col("next_us")).as("n_dwells"),
          sum(col("next_us") - col("us")).as("total_dwell_micros"),
          max(col("next_us") - col("us")).as("max_dwell_micros"))
        .orderBy("user_id", "state")
    },

    GraftQuery(
      "q135_wow_report",
      Some("""WITH wk AS (
             |  SELECT date_trunc('week', o_orderdate) AS wk,
             |         CAST(round(sum(o_totalprice) * 100) AS BIGINT) AS rev_cents,
             |         CAST(count(*) AS BIGINT) AS n_orders
             |  FROM orders GROUP BY 1
             |)
             |SELECT wk, rev_cents, n_orders,
             |       lag(rev_cents) OVER (ORDER BY wk) AS prev_cents,
             |       CASE WHEN lag(rev_cents) OVER (ORDER BY wk) > 0
             |            THEN ((rev_cents - lag(rev_cents) OVER (ORDER BY wk)) * 10000)
             |                 // lag(rev_cents) OVER (ORDER BY wk)
             |       END AS delta_bp
             |FROM wk ORDER BY wk""".stripMargin),
      "Week-over-week trend report — the period-comparison shape every BI " +
        "layer emits: aggregate to the period grain FIRST (partial+final " +
        "hash agg, shuffle carries one row per week), THEN lag() over the " +
        "tiny aggregated series for the prior-period compare. The window " +
        "is a single unpartitioned sort, which is CORRECT here precisely " +
        "because aggregation already collapsed the data — hundreds of " +
        "weeks, not rows; per-entity trend variants partition the same " +
        "window by the entity key (q24's shape) and stay parallel. The " +
        "delta is integer basis points via integer division on cents — " +
        "the quotient is integer `div` against DuckDB's `//` — both " +
        "truncate toward zero, exact for either delta sign."
    ) { (s, dir) =>
      val wk = Tables.orders(s, dir)
        .groupBy(date_trunc("week", col("o_orderdate")).cast("date").as("wk"))
        .agg(round(sum("o_totalprice") * 100).cast("long").as("rev_cents"),
          count(lit(1)).as("n_orders"))
      val w = Window.orderBy("wk")
      wk
        .withColumn("prev_cents", lag(col("rev_cents"), 1).over(w))
        .withColumn("delta_bp",
          // DuckDB's // and Spark's div both TRUNCATE toward zero on
          // integers — exact and identical for either delta sign
          when(col("prev_cents") > 0,
            expr("((rev_cents - prev_cents) * 10000) div prev_cents")))
        .orderBy("wk")
    },

    GraftQuery(
      "q119_snapshot_diff",
      Some("""WITH a AS (
             |  SELECT c_custkey AS key, c_name,
             |         CAST(round(c_acctbal * 100) AS BIGINT) AS cents
             |  FROM customer
             |), b AS (
             |  SELECT key, c_name,
             |         CASE WHEN key % 13 = 0 THEN cents + 1000 ELSE cents END AS cents
             |  FROM a WHERE key % 97 <> 0
             |  UNION ALL
             |  -- inserts live in the NEGATIVE mirror keyspace: disjoint from
             |  -- natural keys at ANY scale (a fixed offset collides once the
             |  -- key range outgrows it)
             |  SELECT -(key + 1), c_name, cents + 5 FROM a WHERE key % 101 = 0
             |)
             |SELECT coalesce(a.key, b.key) AS key,
             |       CASE WHEN a.key IS NULL THEN 'I'
             |            WHEN b.key IS NULL THEN 'D'
             |            ELSE 'U' END AS op,
             |       a.cents AS old_cents, b.cents AS new_cents
             |FROM a FULL JOIN b ON a.key = b.key
             |WHERE a.key IS NULL OR b.key IS NULL
             |   OR a.cents IS DISTINCT FROM b.cents
             |   OR a.c_name IS DISTINCT FROM b.c_name
             |ORDER BY key""".stripMargin),
      "Snapshot diff — the inverse of q93's CDC apply: two versions of a " +
        "keyed table produce the minimal I/U/D changelog that turns one " +
        "into the other (the lakehouse 'change data feed' / table-diff " +
        "operator; version B is derived deterministically from A here — " +
        "deletes at key%97, in-place updates at key%13, inserts in the " +
        "negative mirror keyspace — disjoint at any scale — so the oracle rebuilds both sides bit-identically). " +
        "One FULL OUTER join co-partitioned on the key, change detection " +
        "by null-safe column compare: with both snapshots bucketed by " +
        "key at rest this diffs 100 TB with ZERO shuffle (each bucket " +
        "diffs independently), and the compare width shrinks to " +
        "(key, row-fingerprint) by hashing the non-key columns at scan " +
        "time — only changed rows ever carry full values. Money stays " +
        "integer cents, the cross-engine exactness rule."
    ) { (s, dir) =>
      val a = Tables.customer(s, dir)
        .select(col("c_custkey").as("key"), col("c_name"),
          round(col("c_acctbal") * 100).cast("long").as("cents"))
      val b = a.filter(col("key") % 97 =!= 0)
        .select(col("key"), col("c_name"),
          when(col("key") % 13 === 0, col("cents") + 1000)
            .otherwise(col("cents")).as("cents"))
        .unionAll(a.filter(col("key") % 101 === 0)
          .select((-(col("key") + 1)).as("key"), col("c_name"),
            (col("cents") + 5).as("cents")))
      a.alias("a").join(b.alias("b"), col("a.key") === col("b.key"), "full_outer")
        .filter(col("a.key").isNull || col("b.key").isNull ||
          !(col("a.cents") <=> col("b.cents")) ||
          !(col("a.c_name") <=> col("b.c_name")))
        .select(
          coalesce(col("a.key"), col("b.key")).as("key"),
          when(col("a.key").isNull, "I")
            .when(col("b.key").isNull, "D").otherwise("U").as("op"),
          col("a.cents").as("old_cents"), col("b.cents").as("new_cents"))
        .orderBy("key")
    },

    GraftQuery(
      "q131_bitmap_overlap",
      Some("""WITH u AS (
             |  SELECT DISTINCT event_type, user_id FROM events
             |)
             |SELECT a.event_type AS et_a, b.event_type AS et_b,
             |       CAST(count(*) AS BIGINT) AS n_common
             |FROM u a JOIN u b
             |  ON a.user_id = b.user_id AND a.event_type < b.event_type
             |GROUP BY 1, 2
             |ORDER BY et_a, et_b""".stripMargin),
      "Bitmap-index audience overlap (the roaring-bitmap analytics shape): " +
        "each event type's user SET compresses into 64-bit words — word = " +
        "id div 64, one bit_or aggregate per (type, word), 64 users per " +
        "row — and pairwise overlap is a JOIN ON WORD INDEX + popcount of " +
        "the bitwise AND, summed. Everything after the bitmap build is " +
        "integer bit arithmetic on 16-byte rows: for k types over n " +
        "users, overlap costs k²·n/64 word operations instead of a " +
        "distinct-pair self-join shuffling n·k id rows — this is how " +
        "audience/segment-overlap engines (Druid, ClickHouse bitmap " +
        "functions) answer k² intersections from one index. The bitmaps " +
        "build in ONE pass with map-side bit_or partials; dense id " +
        "spaces fit words directly, sparse ones dictionary-encode first. " +
        "The ORACLE computes the same intersections as plain distinct-" +
        "pair counting — the check proves the bitmap algebra EQUALS set " +
        "intersection, not just that it reproduces itself."
    ) { (s, dir) =>
      // shiftright/& are FLOOR semantics for any sign — `div`/`%` truncate
      // toward zero and would collide negative ids onto positive bits
      val bm = Tables.events(s, dir)
        .select(col("event_type"),
          expr("shiftright(user_id, 6)").as("w"),
          expr("shiftleft(1L, cast(user_id & 63 as int))").as("bit"))
        .groupBy("event_type", "w")
        .agg(expr("bit_or(bit)").as("bits"))
      bm.alias("a")
        .join(bm.alias("b"),
          col("a.w") === col("b.w") && col("a.event_type") < col("b.event_type"))
        .groupBy(col("a.event_type").as("et_a"), col("b.event_type").as("et_b"))
        .agg(sum(expr("bit_count(a.bits & b.bits)")).as("n_common"))
        // the oracle's INNER join emits a pair only when >=1 user is shared;
        // word collisions with disjoint bits must not produce a 0 row
        .filter(col("n_common") > 0)
        .orderBy("et_a", "et_b")
    },

    GraftQuery(
      "q120_ohlc_downsample",
      Some("""SELECT event_type,
             |       date_trunc('hour', ts) AS hr,
             |       CAST(count(*) AS BIGINT) AS n,
             |       CAST(round(arg_min(value, ts) * 100) AS BIGINT) AS open_cents,
             |       CAST(round(max(value) * 100) AS BIGINT) AS high_cents,
             |       CAST(round(min(value) * 100) AS BIGINT) AS low_cents,
             |       CAST(round(arg_max(value, ts) * 100) AS BIGINT) AS close_cents
             |FROM events
             |GROUP BY event_type, hr
             |ORDER BY event_type, hr""".stripMargin),
      "Time-series OHLC downsampling (bar aggregation): per (series, " +
        "hour) the opening and closing values are ORDER-DEPENDENT " +
        "aggregates — min_by/max_by on the timestamp — computed inside " +
        "the same partial+final hash aggregate as max/min/count, so the " +
        "whole bar build is ONE map-side-combined shuffle of 4-field " +
        "partial states, never a sort or a window: the resample path " +
        "that turns a 100 TB tick archive into per-hour bars with " +
        "shuffle volume proportional to bars, not ticks. Timestamps are " +
        "unique in this stream (micros truncation preserves that), so " +
        "min_by/max_by are total-ordered and the oracle's arg_min/" +
        "arg_max agree exactly; coarser grains (day/week) re-aggregate " +
        "bars without touching ticks — open = min_by carries through " +
        "the merge, the q92/q104 mergeable-sketch discipline with exact " +
        "semantics."
    ) { (s, dir) =>
      Tables.events(s, dir)
        .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hr"))
        .agg(count(lit(1)).as("n"),
          round(min_by(col("value"), col("ts")) * 100).cast("long").as("open_cents"),
          round(max(col("value")) * 100).cast("long").as("high_cents"),
          round(min(col("value")) * 100).cast("long").as("low_cents"),
          round(max_by(col("value"), col("ts")) * 100).cast("long").as("close_cents"))
        .orderBy("event_type", "hr")
    },

    GraftQuery(
      "q154_seasonality",
      Some("""WITH daily AS (
             |  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS d,
             |         CAST(count(*) AS BIGINT) AS c
             |  FROM events GROUP BY event_type, d
             |), lagged AS (
             |  SELECT event_type, c,
             |         lag(c, 1) OVER (PARTITION BY event_type ORDER BY d) AS c1,
             |         lag(c, 7) OVER (PARTITION BY event_type ORDER BY d) AS c7
             |  FROM daily
             |)
             |SELECT event_type,
             |       CAST(count(*) AS BIGINT) AS n_days,
             |       CAST(count(c1) AS BIGINT) AS n1,
             |       CAST(count(c1) * sum(c * c1) FILTER (c1 IS NOT NULL)
             |            - sum(c) FILTER (c1 IS NOT NULL) * sum(c1)
             |         AS BIGINT) AS cov1_num,
             |       CAST(count(c7) AS BIGINT) AS n7,
             |       CAST(count(c7) * sum(c * c7) FILTER (c7 IS NOT NULL)
             |            - sum(c) FILTER (c7 IS NOT NULL) * sum(c7)
             |         AS BIGINT) AS cov7_num
             |FROM lagged
             |GROUP BY event_type
             |ORDER BY event_type""".stripMargin),
      "Seasonality detection over the event stream — lag-1 and lag-7 " +
        "autocovariance of daily activity per event type, the signal a " +
        "pipeline checks before trusting day-of-week-sensitive sampling " +
        "windows: daily counts from one map-side-combined aggregate, lag " +
        "pairs from a per-type ordered window, and the covariance as the " +
        "CROSS-MULTIPLIED integer numerator n·Σxy − Σx·Σy — no mean, no " +
        "division, no float: both engines agree to the last unit, where " +
        "the textbook (x−x̄)(y−ȳ) form would drift. Consumers normalize " +
        "against the matching variance numerators when they need r; the " +
        "gate only needs the sign and relative magnitude. Rows shrink to " +
        "|types|×|days| at the first aggregate, so the window and final " +
        "agg are tiny at any scale; lag is over OBSERVED days (compose " +
        "q90's gap-fill first when calendar alignment matters)."
    ) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val daily = Tables.events(s, dir)
        .groupBy(col("event_type"),
          date_trunc("day", col("ts")).cast("date").as("d"))
        .agg(count(lit(1)).as("c"))
      val w = Window.partitionBy("event_type").orderBy("d")
      val lagged = daily
        .withColumn("c1", lag("c", 1).over(w))
        .withColumn("c7", lag("c", 7).over(w))
      def covNum(lagCol: String) =
        count(col(lagCol)) * sum(when(col(lagCol).isNotNull,
          col("c") * col(lagCol))) -
          sum(when(col(lagCol).isNotNull, col("c"))) * sum(col(lagCol))
      lagged.groupBy("event_type")
        .agg(count(lit(1)).as("n_days"),
          count(col("c1")).as("n1"), covNum("c1").as("cov1_num"),
          count(col("c7")).as("n7"), covNum("c7").as("cov7_num"))
        .orderBy("event_type")
    },

    GraftQuery(
      "q159_temporal_embargo_split",
      Some("""WITH ev AS (
             |  SELECT event_id, user_id, epoch_us(ts) AS us FROM events
             |), b AS (
             |  SELECT min(us) AS lo, max(us) AS hi FROM ev
             |), tagged AS (
             |  SELECT ev.*,
             |         CASE WHEN us < lo + (hi - lo) * 70 // 100 THEN 'train'
             |              WHEN us < lo + (hi - lo) * 75 // 100 THEN 'embargo'
             |              ELSE 'test' END AS split
             |  FROM ev, b
             |)
             |SELECT split,
             |       CAST(count(*) AS BIGINT) AS n_events,
             |       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
             |       CAST(min(us) AS BIGINT) AS min_us,
             |       CAST(max(us) AS BIGINT) AS max_us
             |FROM tagged GROUP BY split
             |ORDER BY split""".stripMargin),
      "Temporal train/test split with an embargo gap — the leakage guard " +
        "for forecasting / recommendation training sets: events before " +
        "the 70% mark train, the 70–75% band is QUARANTINED (neither " +
        "split sees it), the rest tests, so near-boundary label leakage " +
        "through lagged features can't straddle the cut. Bounds come " +
        "from one min/max scan broadcast as a 1-row frame (on a real " +
        "lake this is parquet footer metadata — zero data read); the " +
        "split tag is a map-side projection in integer epoch-micros " +
        "(cross-engine safe: trunc-div on positive spans), and the " +
        "audit agg shuffles 3 rows. Exact count(DISTINCT user_id) " +
        "two-level-aggs the per-split user sets; at 100 TB swap it for " +
        "approx_count_distinct (q05/q92's HLL path) — the split tag " +
        "itself never shuffles anything."
    ) { (s, dir) =>
      val ev = Tables.events(s, dir)
        .select(col("event_id"), col("user_id"),
          unix_micros(col("ts")).as("us"))
      val b = ev.agg(min("us").as("lo"), max("us").as("hi"))
      ev.crossJoin(broadcast(b))
        .withColumn("split",
          when(col("us") < expr("lo + (hi - lo) * 70 div 100"), "train")
            .when(col("us") < expr("lo + (hi - lo) * 75 div 100"), "embargo")
            .otherwise("test"))
        .groupBy("split")
        .agg(count(lit(1)).as("n_events"),
          countDistinct(col("user_id")).cast("long").as("n_users"),
          min("us").as("min_us"), max("us").as("max_us"))
        .orderBy("split")
    },

    GraftQuery(
      "q172_event_next_pairs",
      Some("""WITH s AS (
             |  SELECT user_id, event_type,
             |         lead(event_type) OVER (PARTITION BY user_id
             |                                ORDER BY ts, event_id) AS nxt
             |  FROM events
             |), per AS (
             |  SELECT event_type, nxt, CAST(count(*) AS BIGINT) AS n
             |  FROM s WHERE nxt IS NOT NULL
             |  GROUP BY event_type, nxt
             |), tot AS (
             |  SELECT event_type, CAST(sum(n) AS BIGINT) AS t
             |  FROM per GROUP BY event_type
             |)
             |SELECT per.event_type, per.nxt AS next_type, per.n,
             |       CAST(per.n * 1000000 // tot.t AS BIGINT) AS p_ppm
             |FROM per JOIN tot ON per.event_type = tot.event_type
             |ORDER BY per.event_type, next_type""".stripMargin),
      "Next-event training pairs — the behavioral-sequence analogue of " +
        "q151's NSP: per-user event streams become (event, next-event) " +
        "supervision pairs via one lead() over the (user, time, id) " +
        "order — the same per-key window as sessionization, no global " +
        "sort — and the aggregated pair counts ARE the first-order " +
        "Markov transition matrix with exact integer-ppm transition " +
        "probabilities (the sanity table every sequence-model dataset " +
        "ships with: is the corpus dominated by self-loops?). Tie-break " +
        "by event_id makes the order — and thus every pair — " +
        "deterministic across engines and partitionings. At 100 TB: " +
        "one hash-partition-by-user exchange, then |types|² rows."
    ) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val nxt = Tables.events(s, dir)
        .select(col("user_id"), col("event_type"),
          lead("event_type", 1).over(
            Window.partitionBy("user_id").orderBy("ts", "event_id")).as("nxt"))
        .filter(col("nxt").isNotNull)
      val per = nxt.groupBy("event_type", "nxt")
        .agg(count(lit(1)).as("n"))
      val tot = per.groupBy("event_type").agg(sum("n").as("t"))
      per.join(broadcast(tot), "event_type")
        .select(col("event_type"), col("nxt").as("next_type"), col("n"),
          expr("n * 1000000 div t").as("p_ppm"))
        .orderBy("event_type", "next_type")
    },

    GraftQuery(
      "q179_retention_cohorts",
      Some("""WITH f AS (
             |  SELECT user_id,
             |         CAST(min(date_trunc('week', ts)) AS TIMESTAMP) AS cohort
             |  FROM events GROUP BY user_id
             |), a AS (
             |  SELECT DISTINCT e.user_id, f.cohort,
             |         (epoch_us(CAST(date_trunc('week', e.ts) AS TIMESTAMP))
             |            - epoch_us(f.cohort)) // 604800000000 AS week_offset
             |  FROM events e JOIN f ON e.user_id = f.user_id
             |), c AS (
             |  SELECT cohort, CAST(count(*) AS BIGINT) AS n0
             |  FROM f GROUP BY cohort
             |)
             |SELECT CAST(a.cohort AS DATE) AS cohort_week,
             |       CAST(week_offset AS BIGINT) AS week_offset,
             |       CAST(count(*) AS BIGINT) AS active_users,
             |       CAST(count(*) * 1000000 // c.n0 AS BIGINT) AS retention_ppm
             |FROM a JOIN c ON a.cohort = c.cohort
             |GROUP BY a.cohort, week_offset, c.n0
             |ORDER BY cohort_week, week_offset""".stripMargin),
      "Retention cohort matrix — the canonical activation dashboard: each " +
        "user's first active week is their cohort, each later active week " +
        "marks them retained at that offset, and the (cohort, offset) " +
        "grid reports survivors in exact integer ppm of the cohort size. " +
        "Week arithmetic happens in epoch-micros integers (date_trunc " +
        "DATE-vs-TIMESTAMP dialect gap bridged by explicit casts — the " +
        "documented q28 trap), offsets by trunc-div on a constant, so " +
        "both engines agree on every cell. Plan: one user-keyed agg for " +
        "cohorts, a co-partitioned join back (same user key — no extra " +
        "exchange under bucketing), a per-(user, week) dedup, then a " +
        "grid-sized agg. At 100 TB the cohort table is users-sized; " +
        "everything heavier combines map-side."
    ) { (s, dir) =>
      val ev = Tables.events(s, dir)
        .select(col("user_id"),
          unix_micros(date_trunc("week", col("ts"))).as("wk"))
      val f = ev.groupBy("user_id").agg(min("wk").as("cohort"))
      val c = f.groupBy("cohort").agg(count(lit(1)).as("n0"))
      ev.join(f, "user_id")
        .select(col("user_id"), col("cohort"),
          expr("(wk - cohort) div 604800000000").as("week_offset"))
        .distinct()
        .groupBy("cohort", "week_offset")
        .agg(count(lit(1)).as("active_users"))
        .join(broadcast(c), "cohort")
        .select(
          to_date(timestamp_micros(col("cohort"))).as("cohort_week"),
          col("week_offset"), col("active_users"),
          expr("active_users * 1000000 div n0").as("retention_ppm"))
        .orderBy("cohort_week", "week_offset")
    },

    GraftQuery(
      "q183_churn_labels",
      Some("""WITH b AS (
             |  SELECT min(epoch_us(ts)) AS lo, max(epoch_us(ts)) AS hi
             |  FROM events
             |), per AS (
             |  -- observation window = first 97% of the span; label window =
             |  -- the tail (q159's cut arithmetic; the tail is sized so
             |  -- silence is a signal, not the base rate)
             |  SELECT user_id,
             |         CAST(sum(CASE WHEN epoch_us(ts)
             |                            < lo + (hi - lo) * 97 // 100
             |                       THEN 1 ELSE 0 END) AS BIGINT) AS n_obs,
             |         CAST(sum(CASE WHEN epoch_us(ts)
             |                            >= lo + (hi - lo) * 97 // 100
             |                       THEN 1 ELSE 0 END) AS BIGINT) AS n_label
             |  FROM events, b GROUP BY user_id
             |)
             |SELECT CAST(CASE WHEN n_label = 0 THEN 1 ELSE 0 END AS BIGINT)
             |         AS churned,
             |       CAST(count(*) AS BIGINT) AS n_users,
             |       CAST(sum(n_obs) AS BIGINT) AS obs_events,
             |       CAST((sum(n_obs) * 100 + count(*) // 2) // count(*)
             |            AS BIGINT) AS avg_obs_hundredths
             |FROM per WHERE n_obs > 0
             |GROUP BY churned
             |ORDER BY churned""".stripMargin),
      "Churn label builder — the supervised-training-set shape: activity " +
        "in the observation window (first 97% of the corpus span) is the " +
        "feature, silence in the label window is the label, users unseen " +
        "in observation are excluded (nothing to predict from). The " +
        "window cut reuses q159's integer epoch-micros arithmetic; " +
        "labels and features come out of ONE conditional aggregation " +
        "per user — no second scan, no join between windows — and the " +
        "class-balance audit (user counts and half-up mean activity per " +
        "class, q69's integer-hundredths idiom) is what decides whether " +
        "q166's class weights are needed downstream. At 100 TB: one " +
        "user-keyed map-side-combined agg plus a 2-row census."
    ) { (s, dir) =>
      val b = Tables.events(s, dir)
        .agg(min(unix_micros(col("ts"))).as("lo"),
          max(unix_micros(col("ts"))).as("hi"))
      val per = Tables.events(s, dir)
        .select(col("user_id"), unix_micros(col("ts")).as("us"))
        .crossJoin(broadcast(b))
        .groupBy("user_id")
        .agg(
          sum(when(expr("us < lo + (hi - lo) * 97 div 100"), 1L)
            .otherwise(0L)).as("n_obs"),
          sum(when(expr("us >= lo + (hi - lo) * 97 div 100"), 1L)
            .otherwise(0L)).as("n_label"))
      per.filter(col("n_obs") > 0)
        .select(when(col("n_label") === 0, 1L).otherwise(0L).as("churned"),
          col("n_obs"))
        .groupBy("churned")
        .agg(count(lit(1)).as("n_users"), sum("n_obs").as("obs_events"))
        .select(col("churned"), col("n_users"), col("obs_events"),
          expr("(obs_events * 100 + n_users div 2) div n_users")
            .as("avg_obs_hundredths"))
        .orderBy("churned")
    }
  )
}
