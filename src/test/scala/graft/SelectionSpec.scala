package graft

import org.apache.spark.sql.functions._

/** Semantic-selection family invariants that the DuckDB replay oracles
  * cannot express directly: the SemDeDup keeper rule re-derived by brute
  * force from the query's own cluster assignment, the prototypicality
  * drop-quota per cluster, cross-query assignment consistency (q230 and
  * q232 must see the SAME clusters — they share one index), and q231/q233
  * cross-checks against their sibling queries' contracts.
  */
class SelectionSpec extends SparkSpec {

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  private lazy val semdedup = run("q230_semdedup").collect()
    .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
  private lazy val proto = run("q232_prototypicality_prune").collect()
    .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3),
      r.getLong(4), r.getBoolean(5)))

  test("q230 kept/dropped is exactly the lower-id intra-cluster rule") {
    val vecs = Tables.embeddings(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
      .toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) {
        dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    assert(semdedup.nonEmpty, "assignment must be non-empty at sf0.001")
    val byCluster = semdedup.groupBy(_._2)
    semdedup.foreach { case (vid, cid, csize, kept) =>
      val mates = byCluster(cid)
      assert(csize == mates.length, s"csize of $vid")
      val hasLowerDup = mates.exists { case (other, _, _, _) =>
        other < vid && cos(vecs(other), vecs(vid)) >= 0.35
      }
      assert(kept == !hasLowerDup,
        s"vec $vid kept=$kept but lower-id dup exists=$hasLowerDup")
    }
    val dropped = semdedup.count(!_._4)
    assert(dropped > 0, "corpus has intra-cluster near-dups; none dropped")
    assert(dropped < semdedup.length, "dedup must not drop everything")
  }

  test("q232 drops exactly ceil(10%) most-prototypical per cluster") {
    assert(proto.nonEmpty)
    proto.groupBy(_._2).foreach { case (cid, members) =>
      val csize = members.head._5
      assert(members.forall(_._5 == csize), s"cluster $cid csize disagreement")
      assert(members.map(_._4).sorted.toSeq == (1L to csize).toSeq,
        s"cluster $cid ranks are not a permutation of 1..$csize")
      val dropQuota = (csize + 9) / 10
      val droppedRanks = members.filter(!_._6).map(_._4).sorted.toSeq
      assert(droppedRanks == (1L to dropQuota).toSeq,
        s"cluster $cid dropped ranks $droppedRanks != 1..$dropQuota")
      // ranks follow prototypicality: cc non-increasing in rank order
      val byRank = members.sortBy(_._4).map(_._3)
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b },
        s"cluster $cid proto_cos not non-increasing with rank")
    }
  }

  test("q230 and q232 share one cluster assignment (one index, two passes)") {
    val a = semdedup.map(t => t._1 -> t._2).toMap
    val b = proto.map(t => t._1 -> t._2).toMap
    assert(a == b, "SemDeDup and prototypicality disagree on cent_id")
  }

  test("q231 weights separate the target language and gate consistently") {
    val rows = run("q231_dsir_importance").collect()
      .map(r => (r.getString(1), r.getLong(3), r.getLong(4), r.getDouble(5),
        r.getBoolean(6)))
    assert(rows.nonEmpty)
    rows.foreach { case (_, tnum, rden, w, selected) =>
      assert(selected == (tnum >= rden), "selected must be tnum >= rden")
      assert(w > 0.0 && rden > 0, "smoothing keeps every weight positive")
    }
    val (en, rest) = rows.partition(_._1 == "en")
    def mean(xs: Array[Double]) = xs.sum / xs.length
    assert(en.nonEmpty && rest.nonEmpty)
    assert(mean(en.map(_._4)) > mean(rest.map(_._4)),
      "en documents must score more target-like than the rest on average")
    val enSel = en.count(_._5).toDouble / en.length
    val restSel = rest.count(_._5).toDouble / rest.length
    assert(enSel > restSel,
      s"selection rate en=$enSel must exceed non-target=$restSel")
  }

  test("q234 admission decisions match a sequential re-derivation") {
    val rows = run("q234_incremental_semdedup").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2), r.getBoolean(3),
        r.getBoolean(4)))
    val vecs = Tables.embeddings(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
      .toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) {
        dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val oldIds = vecs.keySet.filter(_ % 5 != 4)
    val newIds = vecs.keySet.filter(_ % 5 == 4)
    val cents = oldIds.filter(id =>
      ((id % 2147483647L) * 1103515245L + 12345L) % 2147483647L % 50 == 0)
      .toSeq.sorted
    assert(cents.nonEmpty, "sf0.001 old corpus must yield centroids")
    def assignOf(id: Long): Long =
      cents.maxBy(c => (cos(vecs(id), vecs(c)), c))
    val oldAssign = oldIds.map(id => id -> assignOf(id)).toMap
    val kept = oldIds.filter { id =>
      !oldIds.exists(o => o < id && oldAssign(o) == oldAssign(id) &&
        cos(vecs(o), vecs(id)) >= 0.35)
    }
    val expected = newIds.map { id =>
      val cid = assignOf(id)
      val idxDup = kept.exists(k =>
        oldAssign(k) == cid && cos(vecs(k), vecs(id)) >= 0.35)
      val batchDup = newIds.exists(o => o < id && assignOf(o) == cid &&
        cos(vecs(o), vecs(id)) >= 0.35)
      id -> ((cid, idxDup, batchDup, !idxDup && !batchDup))
    }.toMap
    assert(rows.length == newIds.size, "one decision per new-batch vector")
    rows.foreach { case (id, cid, idxDup, batchDup, admitted) =>
      assert(expected(id) == ((cid, idxDup, batchDup, admitted)),
        s"vec $id: got ($cid,$idxDup,$batchDup,$admitted), " +
          s"want ${expected(id)}")
    }
    assert(rows.exists(_._3) && rows.exists(_._4) && rows.exists(_._5),
      "the corpus must exercise all three outcomes (index dup, batch dup, admit)")
  }

  test("q233 per-language sums agree with q47's per-document counts") {
    val fertility = run("q233_tokenizer_fertility").collect()
      .map(r => r.getString(0) -> (r.getLong(2), r.getLong(3))).toMap
    val docs = Tables.documents(spark, sf).select("doc_id", "lang")
    val perLang = run("q47_token_count").join(docs, "doc_id")
      .groupBy("lang").agg(
        sum("ws_tokens").cast("long").as("ws"),
        sum("bpe_tokens").cast("long").as("bpe"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(fertility == perLang,
      "fertility audit totals must be exactly q47's counts re-aggregated")
  }
}
