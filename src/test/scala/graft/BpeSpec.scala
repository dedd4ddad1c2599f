package graft

import scala.collection.mutable

/** q107 contract: the distributed BPE trainer must learn EXACTLY the merge
  * sequence a sequential reference implementation learns — same pair
  * counts, same argmax tie-break (count desc, then sym_a, sym_b), same
  * greedy leftmost application. Any drift in the fold (overlap handling,
  * merged-token adjacency) or in the count shuffle shows up as a different
  * merge table.
  */
class BpeSpec extends SparkSpec {

  test("distributed BPE merge sequence equals the sequential reference") {
    val got = functions.TextQueries.bpeMerges(spark, sf, rounds = 3)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq

    var words: Seq[Array[Long]] = Tables.documents(spark, sf)
      .select("text").collect().map(_.getString(0))
      .flatMap(_.toLowerCase(java.util.Locale.ROOT).split("[^a-z0-9]+"))
      .filter(_.length >= 2)
      .map(_.map(_.toLong).toArray)
      .toSeq
    val expected = mutable.ArrayBuffer.empty[(Long, Long, Long, Long)]
    for (r <- 0 until 3) {
      val counts = mutable.Map.empty[(Long, Long), Long].withDefaultValue(0L)
      words.foreach { w =>
        var i = 0
        while (i < w.length - 1) { counts((w(i), w(i + 1))) += 1; i += 1 }
      }
      val ((pa, pb), c) = counts.toSeq
        .sortBy { case ((a, b), n) => (-n, a, b) }.head
      expected += ((r + 1L, pa, pb, c))
      val m = 1000000L + r
      words = words.map { w =>
        val buf = mutable.ArrayBuffer.empty[Long]
        w.foreach { x =>
          if (buf.nonEmpty && buf.last == pa && x == pb) {
            buf.remove(buf.length - 1); buf += m
          } else buf += x
        }
        buf.toArray
      }
    }
    assert(got == expected.toSeq,
      s"merge tables differ:\n got=$got\n exp=$expected")
    assert(got.map(_._4).forall(_ > 0) && got.size == 3)
  }

  /** The ADVICE-r6 degenerate case: a corpus whose pairs exhaust before the
    * requested rounds. The trainer must stop early (merge table shorter than
    * `rounds`) and the encode chain must treat the missing rounds as no-ops
    * — the Spark half of the NULL-merge contract whose DuckDB half is the
    * `bpeFoldSql` NULL guard (exercised by the `EdgeCorpus bpex` shape
    * through tools/check.py). */
  test("exhausted corpus: trainer stops early, encode no-ops the empty rounds") {
    val dir = java.nio.file.Files.createTempDirectory("graft_bpex").toString
    import spark.implicits._
    Seq((0L, "ab ab ab", "en", "src0", 8L), (1L, "ab", "en", "src0", 2L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    // round 1 merges (a=97, b=98) with count 4; rounds 2-3 find no pair
    assert(functions.TextQueries.learnedMerges(spark, dir, rounds = 3) ==
      Seq((1L, 97L, 98L, 4L)))
    assert(functions.TextQueries.bpeMerges(spark, dir, rounds = 3).count() == 1L)
    val enc = SparkEntry.queries("q117_bpe_encode")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    // every word collapses to one merged symbol: 50% compression exactly
    assert(enc == Set((0L, 3L, 6L, 3L, 5000L), (1L, 1L, 2L, 1L, 5000L)))
  }

  test("q117 encode: per-doc token counts equal a sequential reference encode") {
    val merges = functions.TextQueries.learnedMerges(spark, sf, rounds = 3)
      .map { case (_, pa, pb, _) => (pa, pb) }

    def encode(w: String): Int = {
      var syms: mutable.ArrayBuffer[Long] =
        mutable.ArrayBuffer.from(w.map(_.toLong))
      merges.zipWithIndex.foreach { case ((pa, pb), i) =>
        val m = 1000000L + i
        val out = mutable.ArrayBuffer.empty[Long]
        syms.foreach { x =>
          if (out.nonEmpty && out.last == pa && x == pb) {
            out.remove(out.length - 1); out += m
          } else out += x
        }
        syms = out
      }
      syms.length
    }

    val expected = Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map { r =>
        val words = r.getString(1).toLowerCase(java.util.Locale.ROOT)
          .split("[^a-z0-9]+").filter(_.nonEmpty)
        (r.getLong(0),
          (words.length.toLong, words.map(_.length.toLong).sum,
            words.map(encode(_).toLong).sum))
      }.toMap

    val got = SparkEntry.queries("q117_bpe_encode")(spark, sf)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(got.keySet == expected.keySet)
    got.foreach { case (id, v) =>
      assert(v == expected(id), s"doc $id: got $v expected ${expected(id)}")
    }
    // compression must actually happen somewhere (merges fire)
    assert(got.exists { case (_, (_, chars, toks)) => toks < chars })
  }
}
