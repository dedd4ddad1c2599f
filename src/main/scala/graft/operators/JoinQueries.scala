package graft.operators

import graft.{GraftQuery, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Join surface: equi inner/left/full, semi/anti, theta/range, as-of
  * (SURVEY.md §2.2 "Joins").
  *
  * Scale design: dimension tables (region 5, nation 25, supplier, literal
  * band tables) are explicitly `broadcast()` — the fact table never shuffles
  * for them. Fact-fact joins (lineitem⋈orders) hash-partition on the join key
  * and rely on AQE for skew splitting. Non-equi joins are only ever
  * broadcast-nested-loop against provably small sides.
  */
object JoinQueries {

  val all: Seq[GraftQuery] = Seq(

    GraftQuery(
      "q15_join_inner_star",
      Some("""SELECT r_name, n_name,
             |       CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100)
             |                     AS BIGINT)) AS BIGINT) AS revenue_cents,
             |       count(*) AS n_items
             |FROM lineitem
             |JOIN orders   ON l_orderkey = o_orderkey
             |JOIN customer ON o_custkey  = c_custkey
             |JOIN nation   ON c_nationkey = n_nationkey
             |JOIN region   ON n_regionkey = r_regionkey
             |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
             |GROUP BY r_name, n_name
             |ORDER BY r_name, n_name""".stripMargin),
      "Star join: lineitem⋈orders shuffles on orderkey (both fact-sized); " +
        "customer/nation/region are broadcast so the big side never " +
        "re-partitions for them. orderdate filter pushed below the join."
    ) { (s, dir) =>
      Tables.lineitem(s, dir)
        .join(Tables.orders(s, dir).filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp")),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(Tables.customer(s, dir)), col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, dir)), col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(
          sum(floor(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * lit(100))
            .cast("long")).as("revenue_cents"),
          count(lit(1)).as("n_items"))
        .orderBy("r_name", "n_name")
    },

    GraftQuery(
      "q16_join_left_outer",
      Some("""SELECT c_custkey,
             |       count(o_orderkey) AS n_orders,
             |       round(coalesce(sum(o_totalprice), 0), 2) AS total_spent
             |FROM customer
             |LEFT JOIN orders ON c_custkey = o_custkey
             |GROUP BY c_custkey
             |ORDER BY c_custkey""".stripMargin),
      "Left outer keeps order-less customers (count=0). Both sides hash on " +
        "custkey; at 100 TB pre-aggregate orders per custkey before the join " +
        "to shrink the probe side."
    ) { (s, dir) =>
      Tables.customer(s, dir)
        .join(Tables.orders(s, dir), col("c_custkey") === col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(
          count(col("o_orderkey")).as("n_orders"),
          round(coalesce(sum("o_totalprice"), lit(0.0)), 2).as("total_spent"))
        .orderBy("c_custkey")
    },

    GraftQuery(
      "q17_join_semi",
      Some("""SELECT c_custkey, c_name
             |FROM customer
             |WHERE EXISTS (SELECT 1 FROM orders
             |              WHERE o_custkey = c_custkey AND o_totalprice > 100000)
             |ORDER BY c_custkey""".stripMargin),
      "left_semi = EXISTS: probe side emits at most one match per row, no " +
        "row multiplication; the totalprice filter shrinks the build side " +
        "before the shuffle."
    ) { (s, dir) =>
      Tables.customer(s, dir)
        .join(
          Tables.orders(s, dir).filter(col("o_totalprice") > 100000),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    },

    GraftQuery(
      "q18_join_anti",
      Some("""SELECT c_custkey, c_mktsegment
             |FROM customer
             |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
             |ORDER BY c_custkey""".stripMargin),
      "left_anti = NOT EXISTS — same shuffle shape as semi."
    ) { (s, dir) =>
      Tables.customer(s, dir)
        .join(Tables.orders(s, dir), col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_mktsegment")
        .orderBy("c_custkey")
    },

    GraftQuery(
      "q19_join_full_outer",
      Some("""SELECT coalesce(ca.nationkey, sa.nationkey) AS nationkey,
             |       coalesce(n_cust, 0) AS n_cust,
             |       coalesce(n_supp, 0) AS n_supp
             |FROM (SELECT c_nationkey AS nationkey, count(*) AS n_cust
             |      FROM customer GROUP BY 1) ca
             |FULL JOIN (SELECT s_nationkey AS nationkey, count(*) AS n_supp
             |           FROM supplier GROUP BY 1) sa
             |  ON ca.nationkey = sa.nationkey
             |ORDER BY nationkey""".stripMargin),
      "Aggregate-then-full-join: both inputs reduce to #nations rows before " +
        "the join, so the full outer is trivially small at any scale."
    ) { (s, dir) =>
      val ca = Tables.customer(s, dir)
        .groupBy(col("c_nationkey").as("nationkey"))
        .agg(count(lit(1)).as("n_cust"))
      val sa = Tables.supplier(s, dir)
        .groupBy(col("s_nationkey").as("nationkey"))
        .agg(count(lit(1)).as("n_supp"))
      ca.join(sa, Seq("nationkey"), "full")
        .select(col("nationkey"),
          coalesce(col("n_cust"), lit(0L)).as("n_cust"),
          coalesce(col("n_supp"), lit(0L)).as("n_supp"))
        .orderBy("nationkey")
    },

    GraftQuery(
      "q20_join_range_residual",
      Some("""SELECT s_suppkey, c_custkey
             |FROM supplier
             |JOIN customer ON s_nationkey = c_nationkey AND s_acctbal > c_acctbal
             |WHERE c_acctbal < 1000
             |ORDER BY s_suppkey, c_custkey""".stripMargin),
      "Mixed equi+range: hash join on the equi key (nationkey) with the " +
        "range predicate as residual filter — never a nested-loop over the " +
        "cross product."
    ) { (s, dir) =>
      Tables.supplier(s, dir)
        .join(
          Tables.customer(s, dir).filter(col("c_acctbal") < 1000),
          col("s_nationkey") === col("c_nationkey") && col("s_acctbal") > col("c_acctbal"))
        .select("s_suppkey", "c_custkey")
        .orderBy("s_suppkey", "c_custkey")
    },

    GraftQuery(
      "q21_join_theta_band",
      Some("""WITH bands(band, lo, hi) AS (
             |  VALUES (0, 0.0, 50.0), (1, 50.0, 100.0), (2, 100.0, 150.0), (3, 150.0, 1e18)
             |)
             |SELECT band, count(*) AS n,
             |       CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT)
             |         AS sum_value_cents
             |FROM events JOIN bands ON value >= lo AND value < hi
             |GROUP BY band
             |ORDER BY band""".stripMargin),
      "Pure theta join against a literal band table: broadcast-nested-loop " +
        "where the broadcast side is O(bands) — the only safe non-equi join " +
        "shape at 100 TB (band count stays constant as data grows)."
    ) { (s, dir) =>
      import scala.jdk.CollectionConverters._
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("band", org.apache.spark.sql.types.IntegerType, false),
        org.apache.spark.sql.types.StructField("lo", org.apache.spark.sql.types.DoubleType, false),
        org.apache.spark.sql.types.StructField("hi", org.apache.spark.sql.types.DoubleType, false)))
      val rows = Seq(
        org.apache.spark.sql.Row(0, 0.0, 50.0),
        org.apache.spark.sql.Row(1, 50.0, 100.0),
        org.apache.spark.sql.Row(2, 100.0, 150.0),
        org.apache.spark.sql.Row(3, 150.0, 1e18)).asJava
      val bands = s.createDataFrame(rows, schema)
      Tables.events(s, dir)
        .join(broadcast(bands), col("value") >= col("lo") && col("value") < col("hi"))
        .groupBy("band")
        // integer cents BEFORE the sum (q103/q188 rule): a float sum's
        // rounding depends on reduction order, so its hash is partition-
        // count-dependent; the floored-cents BIGINT sum is exact.
        .agg(count(lit(1)).as("n"),
          sum(expr("CAST(floor(value * 100) AS BIGINT)")).as("sum_value_cents"))
        .orderBy("band")
    },

    GraftQuery(
      "q22_join_asof",
      Some("""SELECT event_id, user_id, o_orderkey, o_totalprice
             |FROM (SELECT e.event_id, e.user_id, o.o_orderkey, o.o_totalprice,
             |             row_number() OVER (PARTITION BY e.event_id
             |                                ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
             |      FROM events e
             |      JOIN orders o ON e.user_id = o.o_custkey AND o.o_orderdate <= e.ts)
             |WHERE rn = 1
             |ORDER BY event_id""".stripMargin),
      "As-of join (event → latest order at or before its timestamp): equi " +
        "join on the entity key, then max_by keeps the latest matching " +
        "order. max_by partial-aggregates — each map task forwards ONE row " +
        "per event, unlike a row_number window which must sort every " +
        "joined row after a full shuffle. At 100 TB partition both sides " +
        "by key and time-bucket so a sort-merge within partitions replaces " +
        "the row-multiplying join."
    ) { (s, dir) =>
      val e = Tables.events(s, dir).select("event_id", "user_id", "ts")
      val o = Tables.orders(s, dir).select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
      e.join(o, col("user_id") === col("o_custkey") && col("o_orderdate") <= col("ts"))
        .groupBy("event_id", "user_id")
        .agg(max_by(
          struct(col("o_orderkey"), col("o_totalprice")),
          struct(col("o_orderdate"), col("o_orderkey"))).as("best"))
        .select(col("event_id"), col("user_id"),
          col("best.o_orderkey").as("o_orderkey"),
          col("best.o_totalprice").as("o_totalprice"))
        .orderBy("event_id")
    },

    GraftQuery(
      "q103_tpch_q5",
      Some("""SELECT n_name,
             |       CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100)
             |                     AS BIGINT)) AS BIGINT) AS revenue_cents,
             |       count(*) AS n_items
             |FROM customer
             |JOIN orders   ON c_custkey = o_custkey
             |JOIN lineitem ON l_orderkey = o_orderkey
             |JOIN supplier ON l_suppkey = s_suppkey
             |              AND c_nationkey = s_nationkey
             |JOIN nation   ON s_nationkey = n_nationkey
             |JOIN region   ON n_regionkey = r_regionkey
             |WHERE r_name = 'ASIA'
             |  AND o_orderdate >= TIMESTAMP '1996-01-01'
             |  AND o_orderdate <  TIMESTAMP '1997-01-01'
             |GROUP BY n_name
             |ORDER BY n_name""".stripMargin),
      "TPC-H Q5 (local-supplier revenue): the six-table shape whose " +
        "interesting edge is the CORRELATED predicate c_nationkey = " +
        "s_nationkey — it cannot be pushed into any single scan, so join " +
        "ORDER decides cost. The plan keeps one fact-sized shuffle " +
        "(lineitem⋈orders on orderkey); customer, supplier, nation and " +
        "region all broadcast, the region filter prunes nation keys " +
        "before the build sides ship, and the nationkey correlation is " +
        "evaluated as a residual on the already-joined row — never as a " +
        "join that re-partitions the fact. Revenue is floored to integer " +
        "cents PER ROW before summing, so the aggregate is a BIGINT sum — " +
        "exact and order-independent under any partitioning (binary " +
        "doubles cannot represent 0.01-grained values exactly, so a " +
        "round-after-double-sum would be partition-order-sensitive). " +
        "At 100 TB, o_orderdate is the partition column and " +
        "the year predicate prunes partitions before any IO."
    ) { (s, dir) =>
      val o = Tables.orders(s, dir)
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
      Tables.lineitem(s, dir)
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(Tables.customer(s, dir)), col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.supplier(s, dir)),
          col("l_suppkey") === col("s_suppkey") &&
            col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(Tables.nation(s, dir)), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, dir)), col("n_regionkey") === col("r_regionkey"))
        .filter(col("r_name") === "ASIA")
        .groupBy("n_name")
        .agg(
          sum(floor(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * lit(100))
            .cast("long")).as("revenue_cents"),
          count(lit(1)).as("n_items"))
        .orderBy("n_name")
    },

    GraftQuery(
      "q105_interval_overlap_join",
      Some("""WITH iv AS (
             |  SELECT user_id, min(ts) AS lo,
             |         min(ts) + INTERVAL 30 MINUTE AS hi
             |  FROM events WHERE event_type = 'error'
             |  GROUP BY user_id, date_trunc('hour', ts)
             |), p AS (
             |  SELECT user_id, ts, CAST(round(value * 100) AS BIGINT) AS cents
             |  FROM events WHERE event_type = 'purchase'
             |)
             |SELECT iv.user_id, iv.lo AS window_start,
             |       count(*) AS n_other_purchases,
             |       CAST(sum(p.cents) AS BIGINT) AS cents_by_others
             |FROM iv JOIN p ON p.ts >= iv.lo AND p.ts <= iv.hi
             |                AND p.user_id <> iv.user_id
             |GROUP BY iv.user_id, iv.lo
             |ORDER BY iv.user_id, window_start""".stripMargin),
      "Global interval-overlap join with NO shared key — what purchases by " +
        "OTHER users landed inside each user's error window (blast-radius " +
        "attribution). The sides share no equi-key, both are event-sized, " +
        "and a theta join would be a cartesian product; the scale shape is " +
        "time-bucket fan-out: each 30-minute interval explodes to the ≤2 " +
        "hour buckets it touches, each point maps to exactly ONE bucket, " +
        "and the join becomes an equi-join on bucket with the overlap " +
        "test as a residual. Because the point side has a unique bucket, " +
        "every qualifying (interval, point) pair matches exactly once — " +
        "no post-join dedup shuffle, the subtle half of the pattern. " +
        "Fan-out is ceil(len/bucket)+1 rows per interval, chosen ~ the " +
        "interval length; the oracle is the brute theta join, feasible " +
        "only at test scale — which is exactly the point."
    ) { (s, dir) =>
      val ev = Tables.events(s, dir)
      val iv = ev.filter(col("event_type") === "error")
        .groupBy(col("user_id").as("i_user"), date_trunc("hour", col("ts")).as("hr"))
        .agg(min("ts").as("lo"))
        .select(col("i_user"), col("lo"),
          (col("lo") + expr("INTERVAL 30 MINUTES")).as("hi"))
      val p = ev.filter(col("event_type") === "purchase")
        .select(col("user_id").as("p_user"), col("ts"),
          round(col("value") * 100).cast("long").as("cents"))
      val ivB = iv.withColumn("b", explode(sequence(
        date_trunc("hour", col("lo")), date_trunc("hour", col("hi")),
        expr("INTERVAL 1 HOUR"))))
      val pB = p.withColumn("b2", date_trunc("hour", col("ts")))
      ivB.join(pB, col("b") === col("b2") &&
          col("ts") >= col("lo") && col("ts") <= col("hi") &&
          col("p_user") =!= col("i_user"))
        .groupBy("i_user", "lo")
        .agg(count(lit(1)).as("n_other_purchases"),
          sum("cents").as("cents_by_others"))
        .select(col("i_user").as("user_id"), col("lo").as("window_start"),
          col("n_other_purchases"), col("cents_by_others"))
        .orderBy("user_id", "window_start")
    },

    GraftQuery(
      "q108_bloom_join_reduction",
      Some("""SELECT l.l_orderkey, count(*) AS n_lines,
             |       CAST(round(sum(l.l_extendedprice * 100)) AS BIGINT)
             |         AS cents
             |FROM lineitem l
             |JOIN orders o ON l.l_orderkey = o.o_orderkey
             |WHERE o.o_orderdate >= TIMESTAMP '2000-01-01'
             |GROUP BY l.l_orderkey
             |ORDER BY l_orderkey""".stripMargin),
      "Runtime-filter join reduction, made explicit with the engine's own " +
        "sketch: the selective side's join keys collapse into a Bloom " +
        "filter (BloomSketch via scalar subquery — the q96 machinery) and " +
        "the fact scan probes it BEFORE the shuffle, so only ~matching + " +
        "fp-rate rows are hashed, exchanged and sorted; the join itself " +
        "then removes the false positives, so the result is EXACTLY the " +
        "plain join the oracle runs. This is what Spark's own " +
        "InjectRuntimeFilter does implicitly when statistics cooperate — " +
        "here it is an explicit, statistics-independent operator: at " +
        "100 TB the difference between shuffling the full fact table and " +
        "shuffling the 2% that can match is the job's cost, and a date " +
        "predicate on the dimension side cannot otherwise reach the " +
        "fact scan at all."
    ) { (s, dir) =>
      import graft.functions.Sketches.{bloomContains, bloomOf}
      val o = Tables.orders(s, dir)
        .filter(col("o_orderdate") >= lit("2000-01-01").cast("timestamp"))
        .select(col("o_orderkey"))
      // ~10 bits/key at the footer row count (an upper bound on the
      // filtered keys — fp only improves), zero jobs; shared sizing helper
      val filter = bloomOf(o, xxhash64(col("o_orderkey")),
        graft.functions.Sketches.bloomBits(
          Tables.parquetRowCount(s, dir, "orders") * 10))
      Tables.lineitem(s, dir)
        .select(col("l_orderkey"), col("l_extendedprice"))
        .filter(bloomContains(filter, xxhash64(col("l_orderkey"))))
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy("l_orderkey")
        .agg(count(lit(1)).as("n_lines"),
          round(sum(col("l_extendedprice") * 100)).cast("long").as("cents"))
        .orderBy("l_orderkey")
    },

    GraftQuery(
      "q118_fuzzy_join",
      Some("""WITH n AS (
             |  SELECT p_name AS nm, CAST(count(*) AS BIGINT) AS cnt
             |  FROM part GROUP BY p_name
             |)
             |SELECT a.nm AS name_a, b.nm AS name_b,
             |       CAST(a.cnt * b.cnt AS BIGINT) AS n_pairs
             |FROM n a JOIN n b
             |  ON a.nm < b.nm AND levenshtein(a.nm, b.nm) = 1
             |ORDER BY name_a, name_b""".stripMargin),
      "String-similarity self-join (edit distance 1) — the fuzzy entity-" +
        "matching operator, via the Pass-Join segment scheme made of two " +
        "plain equi-joins: dedupe to DISTINCT names first (blocking on " +
        "the value domain — candidate generation cost is bound by " +
        "distinct values, not rows, the decisive prune when 2000 parts " +
        "share 64 names and 100 TB shares a few million), then each name " +
        "splits into halves a1+a2, and the theorem 'lev(a,b)<=1 implies " +
        "b starts with a1 OR b ends with a2' (one edit touches one half; " +
        "the other survives verbatim, position-shifted at most past the " +
        "end) turns the similarity predicate into segment EQUALITY keys: " +
        "the index side emits its two halves, the probe side its " +
        "prefixes/suffixes at the three plausible source lengths, and " +
        "candidates meet in an equi-join bucketed by (role, seg-length, " +
        "segment) — never a cartesian product. An exact levenshtein " +
        "recheck keeps precision 1, so the result IS the oracle's brute " +
        "theta join. Bucket sizes are bounded by shared-prefix/suffix " +
        "counts in the name domain; k=2 generalizes to 3 segments."
    ) { (s, dir) =>
      val names = Tables.part(s, dir)
        .groupBy(col("p_name").as("nm")).agg(count(lit(1)).as("cnt"))
        .withColumn("len", length(col("nm")))
      // index side: the two halves of each name, tagged by role + length
      val idx = names
        .withColumn("a1len", expr("(len + 1) div 2").cast("int"))
        .select(col("nm").as("a"), col("cnt").as("cnt_a"),
          explode(array(
            struct(lit("p").as("role"), col("a1len").as("slen"),
              col("nm").substr(lit(1), col("a1len")).as("seg")),
            struct(lit("s").as("role"), (col("len") - col("a1len")).as("slen"),
              col("nm").substr(col("a1len") + 1, col("len") - col("a1len")).as("seg"))
          )).as("k"))
        .select(col("a"), col("cnt_a"), col("k.role"), col("k.slen"), col("k.seg"))
      // probe side: prefixes/suffixes at each plausible index-name length
      val probe = names
        .select(col("nm").as("b"), col("cnt").as("cnt_b"), col("len"),
          explode(array_distinct(flatten(transform(
            sequence(col("len") - 1, col("len") + 1), l =>
              array(
                struct(lit("p").as("role"), ((l + 1) / 2).cast("int").as("slen"),
                  col("nm").substr(lit(1), ((l + 1) / 2).cast("int")).as("seg")),
                struct(lit("s").as("role"), (l / 2).cast("int").as("slen"),
                  col("nm").substr(col("len") - (l / 2).cast("int") + 1,
                    (l / 2).cast("int")).as("seg"))))))).as("k"))
        .select(col("b"), col("cnt_b"), col("k.role"), col("k.slen"), col("k.seg"))
      idx.join(probe, Seq("role", "slen", "seg"))
        .filter(col("a") < col("b"))
        .select(col("a"), col("b"), col("cnt_a"), col("cnt_b")).distinct()
        .filter(levenshtein(col("a"), col("b")) === 1)
        .select(col("a").as("name_a"), col("b").as("name_b"),
          (col("cnt_a") * col("cnt_b")).as("n_pairs"))
        .orderBy("name_a", "name_b")
    },

    GraftQuery(
      "q132_nearest_event",
      Some("""WITH e AS (
             |  SELECT user_id, event_id, epoch_us(ts) AS us, event_type
             |  FROM events WHERE event_type IN ('view', 'purchase')
             |), p AS (SELECT * FROM e WHERE event_type = 'purchase'),
             |v AS (SELECT * FROM e WHERE event_type = 'view'),
             |cand AS (
             |  SELECT p.event_id pid, v.event_id vid,
             |         v.us - p.us AS gap,
             |         row_number() OVER (PARTITION BY p.event_id
             |                            ORDER BY abs(v.us - p.us), v.us, v.event_id) rk
             |  FROM p JOIN v USING (user_id)
             |)
             |SELECT pid AS purchase_id, vid AS view_id,
             |       CAST(gap AS BIGINT) AS gap_micros
             |FROM cand WHERE rk = 1
             |ORDER BY purchase_id""".stripMargin),
      "NEAREST-event join (bidirectional as-of): each purchase matches its " +
        "closest view by the same user in EITHER time direction — the " +
        "sensor-alignment / attribution semantics q22's backward-only " +
        "as-of cannot express. Instead of the oracle's per-user pair join " +
        "(quadratic in events-per-user), both event kinds interleave into " +
        "ONE per-user time-sorted stream and two window passes recover " +
        "the last view before (running last_value ignoreNulls over the " +
        "preceding frame) and first view after (first_value over the " +
        "following frame) each purchase; the nearer of the two candidates " +
        "wins, ties to the earlier view — a total order. One exchange on " +
        "user, two frames over one sort, per-row state O(1): at 100 TB " +
        "this is linear in events where the pair join is Σ n_views·" +
        "n_purchases per user — the q106 self-join-elimination argument " +
        "applied to nearest-neighbor-in-time. Gaps are integer micros, " +
        "signed (negative = view preceded purchase)."
    ) { (s, dir) =>
      val e = Tables.events(s, dir)
        .filter(col("event_type").isin("view", "purchase"))
        .select(col("user_id"), col("event_id"),
          unix_micros(col("ts")).as("us"), col("event_type"))
      val ord = Window.partitionBy("user_id").orderBy("us", "event_id")
      val prevW = ord.rowsBetween(Window.unboundedPreceding, -1)
      val nextW = ord.rowsBetween(1, Window.unboundedFollowing)
      // candidate selection must MATCH THE ORACLE'S TIE ORDER (abs gap,
      // then view us, then view event_id): among equal-us views, max of
      // (us, -event_id) picks the SMALLEST id on the before side — last()
      // over the frame would pick the largest — and min of (us, event_id)
      // picks the smallest on the after side
      val prevStruct = when(col("event_type") === "view",
        struct(col("us"), (-col("event_id")).as("nev")))
      val nextStruct = when(col("event_type") === "view",
        struct(col("us"), col("event_id")))
      val cand = e
        .withColumn("pv", max(prevStruct).over(prevW))
        .withColumn("nv", min(nextStruct).over(nextW))
        .filter(col("event_type") === "purchase")
        .filter(col("pv").isNotNull || col("nv").isNotNull)
      val pickPrev = col("nv").isNull ||
        (col("pv").isNotNull &&
          (col("us") - col("pv.us")) <= (col("nv.us") - col("us")))
      cand
        .select(col("event_id").as("purchase_id"),
          when(pickPrev, -col("pv.nev")).otherwise(col("nv.event_id")).as("view_id"),
          (when(pickPrev, col("pv.us")).otherwise(col("nv.us")) - col("us"))
            .as("gap_micros"))
        .orderBy("purchase_id")
    },

    GraftQuery(
      "q176_tpch_q3",
      Some("""SELECT l_orderkey,
             |       CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100)
             |                     AS BIGINT)) AS BIGINT) AS revenue_cents,
             |       o_orderdate
             |FROM customer
             |JOIN orders   ON c_custkey = o_custkey
             |JOIN lineitem ON l_orderkey = o_orderkey
             |WHERE c_mktsegment = 'BUILDING'
             |  AND o_orderdate < TIMESTAMP '1998-06-01'
             |  AND l_shipdate  > TIMESTAMP '1998-06-01'
             |GROUP BY l_orderkey, o_orderdate
             |ORDER BY revenue_cents DESC, l_orderkey
             |LIMIT 10""".stripMargin),
      "TPC-H Q3 (shipping priority, adapted to this schema): the classic " +
        "selective-dimension star — the BUILDING segment filter prunes " +
        "customer BEFORE it broadcasts, orders carries its date predicate " +
        "into the scan (partition-prunable at 100 TB), and the only " +
        "fact-sized exchange is lineitem⋈orders on orderkey. Revenue is " +
        "integer cents (floored per row, BIGINT-summed — exact under any " +
        "partition order, q188/q203 idiom), and the top-10 is " +
        "TakeOrderedAndProject over the group-by output — per-task " +
        "heaps, no global sort of the aggregate."
    ) { (s, dir) =>
      val cut = lit("1998-06-01").cast("timestamp")
      val c = Tables.customer(s, dir).filter(col("c_mktsegment") === "BUILDING")
      val o = Tables.orders(s, dir).filter(col("o_orderdate") < cut)
      Tables.lineitem(s, dir).filter(col("l_shipdate") > cut)
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .groupBy("l_orderkey", "o_orderdate")
        .agg(sum(floor(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * lit(100))
          .cast("long")).as("revenue_cents"))
        .select(col("l_orderkey"), col("revenue_cents"), col("o_orderdate"))
        .orderBy(col("revenue_cents").desc, col("l_orderkey"))
        .limit(10)
    },

    GraftQuery(
      "q177_tpch_q10",
      Some("""SELECT c_custkey, c_name, n_name,
             |       CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100)
             |                     AS BIGINT)) AS BIGINT) AS revenue_cents
             |FROM customer
             |JOIN nation   ON c_nationkey = n_nationkey
             |JOIN orders   ON c_custkey = o_custkey
             |JOIN lineitem ON l_orderkey = o_orderkey
             |WHERE l_returnflag = 'R'
             |  AND o_orderdate >= TIMESTAMP '1997-01-01'
             |  AND o_orderdate <  TIMESTAMP '1998-01-01'
             |GROUP BY c_custkey, c_name, n_name
             |ORDER BY revenue_cents DESC, c_custkey
             |LIMIT 20""".stripMargin),
      "TPC-H Q10 (returned-item revenue, adapted): who returned the most " +
        "value this year — returnflag filters the fact in the scan, the " +
        "year window prunes orders partitions, customer+nation broadcast, " +
        "and the per-customer agg shuffles only the surviving groups. " +
        "The shape every churn/return dashboard runs; at 100 TB the " +
        "decisive choice is that neither dimension ever re-partitions " +
        "the fact — one orderkey exchange, then broadcast hash joins."
    ) { (s, dir) =>
      val o = Tables.orders(s, dir)
        .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      Tables.lineitem(s, dir).filter(col("l_returnflag") === "R")
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(Tables.customer(s, dir)),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(s, dir)),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(sum(floor(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * lit(100))
          .cast("long")).as("revenue_cents"))
        .orderBy(col("revenue_cents").desc, col("c_custkey"))
        .limit(20)
    },

    GraftQuery(
      "q184_basket_affinity",
      Some("""WITH ob AS (
             |  SELECT DISTINCT l_orderkey AS o, p_brand AS b
             |  FROM lineitem JOIN part ON l_partkey = p_partkey
             |), n AS (
             |  SELECT CAST(count(DISTINCT o) AS BIGINT) AS n_orders FROM ob
             |), per AS (
             |  SELECT b, CAST(count(*) AS BIGINT) AS nb FROM ob GROUP BY b
             |), pairs AS (
             |  SELECT x.b AS brand_a, y.b AS brand_b,
             |         CAST(count(*) AS BIGINT) AS n_ab
             |  FROM ob x JOIN ob y ON x.o = y.o AND x.b < y.b
             |  GROUP BY x.b, y.b HAVING count(*) >= 20
             |)
             |SELECT p.brand_a, p.brand_b, p.n_ab, pa.nb AS n_a, pb.nb AS n_b,
             |       CAST((p.n_ab * 1000000 // pa.nb) * n.n_orders // pb.nb
             |            AS BIGINT) AS lift_ppm
             |FROM pairs p
             |JOIN per pa ON p.brand_a = pa.b
             |JOIN per pb ON p.brand_b = pb.b, n
             |ORDER BY lift_ppm DESC, brand_a, brand_b
             |LIMIT 25""".stripMargin),
      "Market-basket affinity — which part brands sell together, in ONE " +
        "pass over the fact: collect_set builds each order's sorted " +
        "brand set (the only fact-sized exchange, hashing on orderkey), " +
        "then two codegen Generates fan each element out against " +
        "array_remove(bs, x) — every co-brand in BOTH directions — plus " +
        "a 'SELF' support token and one 'ORDER' marker per basket " +
        "(sentinels can't collide with 'Brand#…' values). No " +
        "higher-order lambdas anywhere: an earlier transform/struct " +
        "formulation spent 20× longer allocating per-element closures " +
        "outside whole-stage codegen. One count aggregate over the " +
        "token stream, then two windows on the |brands|²-sized result " +
        "attach each direction's support (partition by first key — the " +
        "a<b row carries n_a, the a>b row n_b) and the global order " +
        "count; a final least/greatest regroup folds the directions " +
        "together. The naive pair self-join (the oracle's formulation) " +
        "scans the fact four times — filter pushdown below each " +
        "branch's exchange defeats ReuseExchange, so the fix is " +
        "structural, not a hint. Fan-out is basket²-bounded (≤11 " +
        "distinct brands per order; a mega-basket would be capped the " +
        "q39 MaxBucket way). Lift uses q157's two-step truncating " +
        "division so both engines rank identically."
    ) { (s, dir) =>
      val baskets = Tables.lineitem(s, dir)
        .join(broadcast(Tables.part(s, dir)),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("l_orderkey"))
        .agg(sort_array(collect_set(col("p_brand"))).as("bs"))
      val tokens = baskets
        .select(col("bs"), posexplode(col("bs")))
        .select(col("col").as("k1"), explode(concat(
          expr("array_remove(bs, col)"),
          array(lit("SELF")),
          when(col("pos") === 0, array(lit("ORDER")))
            .otherwise(array().cast("array<string>"))
        )).as("k2"))
      val counts = tokens.groupBy("k1", "k2").agg(count(lit(1)).as("cnt"))
      val byFirst = Window.partitionBy(col("k1"))
      val global = Window.rowsBetween(Window.unboundedPreceding,
        Window.unboundedFollowing)
      counts
        .withColumn("n_first",
          max(when(col("k2") === "SELF", col("cnt"))).over(byFirst))
        .withColumn("n_all",
          sum(when(col("k2") === "ORDER", col("cnt"))).over(global))
        .filter(!col("k2").isin("SELF", "ORDER"))
        .groupBy(least(col("k1"), col("k2")).as("brand_a"),
          greatest(col("k1"), col("k2")).as("brand_b"))
        .agg(
          max(when(col("k1") < col("k2"), col("cnt"))).as("n_ab"),
          max(when(col("k1") < col("k2"), col("n_first"))).as("n_a"),
          max(when(col("k1") > col("k2"), col("n_first"))).as("n_b"),
          max(col("n_all")).as("n_orders"))
        .filter(col("n_ab") >= 20)
        .select(col("brand_a"), col("brand_b"), col("n_ab"), col("n_a"),
          col("n_b"),
          expr("(n_ab * 1000000 div n_a) * n_orders div n_b").as("lift_ppm"))
        .orderBy(col("lift_ppm").desc, col("brand_a"), col("brand_b"))
        .limit(25)
    },

    GraftQuery(
      "q185_supplier_hhi",
      Some("""WITH q AS (
             |  SELECT s_nationkey, l_suppkey,
             |         CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
             |  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
             |  GROUP BY s_nationkey, l_suppkey
             |), tot AS (
             |  SELECT s_nationkey, CAST(sum(qty) AS BIGINT) AS t,
             |         CAST(count(*) AS BIGINT) AS n_supp
             |  FROM q GROUP BY s_nationkey
             |)
             |SELECT n.n_name,
             |       tot.n_supp AS n_suppliers,
             |       tot.t AS total_qty,
             |       CAST(sum((q.qty * 1000000 // tot.t)
             |                  * (q.qty * 1000000 // tot.t)) // 1000000
             |            AS BIGINT) AS hhi_ppm
             |FROM q
             |JOIN tot ON q.s_nationkey = tot.s_nationkey
             |JOIN nation n ON q.s_nationkey = n.n_nationkey
             |GROUP BY n.n_name, tot.n_supp, tot.t
             |ORDER BY n.n_name""".stripMargin),
      "Supply concentration (Herfindahl index) — the single-point-of-" +
        "failure audit: per nation, each supplier's share of shipped " +
        "quantity in exact integer ppm, squared and summed into " +
        "HHI (1e6 = monopoly, ~1e6/n = perfectly split). The shares " +
        "truncate identically on both engines, so the index matches to " +
        "the last ppm. Two stacked map-side-combined aggs (supplier " +
        "totals, then nation rollup) plus a broadcast nation join; the " +
        "same shape audits corpus-source concentration (swap supplier " +
        "for q148's domains) — at 100 TB nothing here exceeds " +
        "|suppliers| rows after the first agg."
    ) { (s, dir) =>
      val q = Tables.lineitem(s, dir)
        .join(broadcast(Tables.supplier(s, dir)),
          col("l_suppkey") === col("s_suppkey"))
        .groupBy("s_nationkey", "l_suppkey")
        .agg(sum(col("l_quantity").cast("long")).as("qty"))
      val tot = q.groupBy("s_nationkey")
        .agg(sum("qty").as("t"), count(lit(1)).as("n_supp"))
      q.join(tot, "s_nationkey")
        .join(broadcast(Tables.nation(s, dir)),
          col("s_nationkey") === col("n_nationkey"))
        .groupBy("n_name", "n_supp", "t")
        .agg(sum(expr("(qty * 1000000 div t) * (qty * 1000000 div t)"))
          .as("hhi_raw"))
        .select(col("n_name"), col("n_supp").as("n_suppliers"),
          col("t").as("total_qty"),
          expr("hhi_raw div 1000000").as("hhi_ppm"))
        .orderBy("n_name")
    }
  )
}
