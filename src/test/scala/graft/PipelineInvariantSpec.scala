package graft

import org.apache.spark.sql.functions._

/** Cross-row invariants of the round-4 pipeline operators that the
  * row-by-row oracle compare can't express: exact-sum apportionment,
  * split disjointness, coverage monotonicity, stage balance, and
  * resample-audit consistency. Each is the property a consumer of the
  * operator's output silently relies on.
  */
class PipelineInvariantSpec extends SparkSpec {

  test("q158 allocations sum exactly to the 1M budget and respect quotas") {
    val rows = SparkEntry.queries("q158_token_allocation")(spark, sf)
      .select("floor_alloc", "alloc").collect()
    assert(rows.map(_.getLong(1)).sum === 1000000L,
      "largest-remainder apportionment must hand out the whole budget")
    // each source gets its floor quota, or floor + 1 — never more or less
    assert(rows.forall { r =>
      val d = r.getLong(1) - r.getLong(0); d == 0L || d == 1L
    }, "every allocation is floor or floor+1")
  }

  test("q159 train/embargo/test bands are disjoint and ordered in time") {
    val m = SparkEntry.queries("q159_temporal_embargo_split")(spark, sf)
      .collect().map(r => r.getString(0) -> (r.getLong(3), r.getLong(4))).toMap
    for (s <- Seq("train", "embargo", "test"))
      assert(m.contains(s), s"split '$s' must be non-empty on the test corpus")
    assert(m("train")._2 < m("embargo")._1,
      "no train event may reach into the embargo band")
    assert(m("embargo")._2 < m("test")._1,
      "no embargo event may reach into the test band")
  }

  test("q163 coverage curve is monotone and ends within the vocabulary") {
    val rows = SparkEntry.queries("q163_vocab_coverage")(spark, sf)
      .orderBy("pct").collect()
    val sizes = rows.map(_.getLong(1))
    assert(sizes.zip(sizes.tail).forall { case (a, b) => a <= b },
      "a higher coverage target can never need fewer types")
    val vocab = Tables.documents(spark, sf)
      .select(explode(split(lower(col("text")), " ")).as("u"))
      .select("u").distinct().count()
    assert(sizes.last <= vocab, "99% coverage fits inside the vocabulary")
  }

  test("q165 stages partition the corpus with balanced sizes") {
    val rows = SparkEntry.queries("q165_curriculum_order")(spark, sf)
      .orderBy("stage").collect()
    val docs = Tables.documents(spark, sf).count()
    assert(rows.map(_.getLong(1)).sum === docs,
      "every document lands in exactly one stage")
    val ns = rows.map(_.getLong(1))
    assert(ns.max - ns.min <= 1, "ntile stages differ by at most one doc")
    // difficulty bands must not overlap across stages (equal edge values ok)
    val bands = rows.map(r => (r.getLong(3), r.getLong(4)))
    assert(bands.zip(bands.tail).forall { case ((_, hi), (lo2, _)) => hi <= lo2 },
      "stage difficulty ranges are ordered")
  }

  test("q170 keeps exactly the docs whose Lehmer draw clears the weight") {
    val audit = SparkEntry.queries("q170_weighted_resample")(spark, sf)
      .collect().map(r => r.getString(0) -> r).toMap
    // independent recount straight from the table, bypassing the query's
    // own join: per lang, draws under min(weight, 1e6) == n_kept
    val w = audit.map { case (lang, r) => lang -> math.min(r.getLong(1), 1000000L) }
    val docs = Tables.documents(spark, sf)
      .select(col("lang"), expr("(doc_id * 48271) % 2147483647 % 1000000").as("u"))
      .collect()
    val recount = docs.groupBy(_.getString(0)).map { case (lang, rs) =>
      lang -> rs.count(_.getLong(1) < w(lang)).toLong
    }
    for ((lang, r) <- audit)
      assert(recount(lang) === r.getLong(3),
        s"kept-count mismatch for $lang")
  }

  test("q169 keeps the token-richest member of every duplicate group") {
    val kept = SparkEntry.queries("q169_dedup_keep_best")(spark, sf).collect()
    val groups = Tables.documents(spark, sf)
      .select(operators.DedupQueries.leadFingerprint.as("h"),
        size(split(col("text"), " ")).cast("long").as("tok"))
      .groupBy("h").agg(max("tok").as("best"), count(lit(1)).as("n"))
      .filter(col("n") > 1)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kept.length === groups.size, "one keeper per multi-member group")
    for (r <- kept)
      assert(r.getLong(3) === groups(r.getString(0)),
        "the keeper carries the group's maximum token count")
  }
}
