package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Pins the two oracle-equivalence edges the sf fixtures cannot reach:
  * q131's bitmap algebra on NEGATIVE ids (floor word/bit encoding), and
  * q132's nearest-view tie-break when several views share one truncated
  * timestamp. Both were latent divergences found in review — these tests
  * make them regressions instead.
  */
class EdgeSemanticsSpec extends SparkSpec {

  test("q131 bitmap encoding equals set intersection for any-sign ids") {
    import spark.implicits._
    // ids straddle word boundaries and zero: -65..-63, -1, 0, 63, 64
    val rows = Seq(
      ("a", -65L), ("a", -64L), ("a", -1L), ("a", 0L), ("a", 63L),
      ("b", -65L), ("b", -1L), ("b", 64L), ("b", 63L),
      ("c", 64L), ("c", -64L))
    val df = rows.toDF("set_id", "user_id")
    val bm = df
      .select(col("set_id"),
        expr("shiftright(user_id, 6)").as("w"),
        expr("shiftleft(1L, cast(user_id & 63 as int))").as("bit"))
      .groupBy("set_id", "w").agg(expr("bit_or(bit)").as("bits"))
    val got = bm.alias("a")
      .join(bm.alias("b"),
        col("a.w") === col("b.w") && col("a.set_id") < col("b.set_id"))
      .groupBy(col("a.set_id").as("sa"), col("b.set_id").as("sb"))
      .agg(sum(expr("bit_count(a.bits & b.bits)")).as("n"))
      .filter(col("n") > 0)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // ground truth: plain distinct-set intersections
    val sets = rows.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val expected = (for {
      a <- sets.keys; b <- sets.keys if a < b
      n = (sets(a) & sets(b)).size if n > 0
    } yield (a, b) -> n.toLong).toMap
    assert(got == expected, s"got=$got expected=$expected")
  }

  test("q132 tie-break: equal-timestamp views resolve to the smallest event_id") {
    import spark.implicits._
    // one user; two views share micros t=1000 (ids 5 and 9), purchase id 7
    // at t=1010, a later view id 11 at t=1020 — the before-side candidates
    // tie on us, and |1010-1000| = |1020-1010| ties prev vs next too:
    // the oracle's (abs gap, v.us, v.event_id) order picks view 5.
    val e = Seq(
      (1L, 5L, 1000L, "view"), (1L, 9L, 1000L, "view"),
      (1L, 7L, 1010L, "purchase"), (1L, 11L, 1020L, "view"))
      .toDF("user_id", "event_id", "us", "event_type")
    val ord = Window.partitionBy("user_id").orderBy("us", "event_id")
    val prevW = ord.rowsBetween(Window.unboundedPreceding, -1)
    val nextW = ord.rowsBetween(1, Window.unboundedFollowing)
    val prevStruct = when(col("event_type") === "view",
      struct(col("us"), (-col("event_id")).as("nev")))
    val nextStruct = when(col("event_type") === "view",
      struct(col("us"), col("event_id")))
    val cand = e
      .withColumn("pv", max(prevStruct).over(prevW))
      .withColumn("nv", min(nextStruct).over(nextW))
      .filter(col("event_type") === "purchase")
    val pickPrev = col("nv").isNull ||
      (col("pv").isNotNull &&
        (col("us") - col("pv.us")) <= (col("nv.us") - col("us")))
    val r = cand.select(
      when(pickPrev, -col("pv.nev")).otherwise(col("nv.event_id")).as("view_id"),
      (when(pickPrev, col("pv.us")).otherwise(col("nv.us")) - col("us")).as("gap"))
      .collect().head
    assert(r.getLong(0) === 5L, "must pick the SMALLEST event_id among ties")
    assert(r.getLong(1) === -10L, "gap is signed micros toward the past")
  }
}
