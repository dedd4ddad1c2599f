package graft

import org.apache.spark.sql.functions._

/** Refinement-family invariants beyond the DuckDB replay oracles: q240's
  * span-union scrub re-derived by a sequential reference implementation,
  * q239's tercile partition/balance/boundary laws, and q241's conservation
  * and flag laws against the shared centroid-assignment pipeline.
  */
class RefineSpec extends SparkSpec {

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q240 matches a sequential intra-doc scrub reference") {
    val got = run("q240_intradoc_repeat_scrub").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toMap

    val docs = Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    var nonZeroRepeats = 0
    docs.foreach { case (id, text) =>
      val w = text.toLowerCase.split(" ", -1) // -1: keep trailing empties, like split()
      if (w.length >= 3) {
        val grams = w.sliding(3).map(_.mkString(" ")).toArray
        val seen = scala.collection.mutable.Map.empty[String, Int]
        val repStarts = grams.zipWithIndex.flatMap { case (g, i0) =>
          val first = seen.getOrElseUpdate(g, i0)
          if (first < i0) Some(i0) else None
        }
        val removed = repStarts.flatMap(i0 => i0 to (i0 + 2)).distinct.length
        val expect = (w.length.toLong, grams.length.toLong,
          repStarts.length.toLong, removed.toLong,
          (1000000L * (w.length - removed)) / w.length)
        assert(got(id) === expect, s"doc $id")
        if (repStarts.nonEmpty) nonZeroRepeats += 1
      } else assert(!got.contains(id), s"doc $id under 3 tokens must be absent")
    }
    // the gate must be live, not vacuous: the corpus has intra-doc repeats
    assert(nonZeroRepeats > 0, "no doc exercised the repeat machinery")
  }

  test("q239 terciles partition each stratum, balanced, with ordered boundaries") {
    val rows = run("q239_perplexity_buckets").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(rows.nonEmpty)

    // independent stratum sizes: docs with >= 2 tokens per lang
    val strata = Tables.documents(spark, sf)
      .filter(size(split(lower(col("text")), " ")) >= 2)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap

    rows.groupBy(_._1).foreach { case (lang, bs) =>
      assert(bs.map(_._3).sum === strata(lang), s"$lang buckets must partition")
      // integer-rank terciles are balanced within one document
      assert(bs.map(_._3).max - bs.map(_._3).min <= 1, s"$lang balance")
      // head/middle/tail in score order: each bucket's max <= next's min
      val ord = Seq("head", "middle", "tail").flatMap(b => bs.find(_._2 == b))
      assert(ord.map(_._2) === bs.sortBy(_._2).map(_._2).toSeq, s"$lang names")
      ord.sliding(2).foreach {
        case Seq(lo, hi) => assert(lo._6 <= hi._5,
          s"$lang ${lo._2} max bp ${lo._6} > ${hi._2} min bp ${hi._5}")
        case _ =>
      }
    }
  }

  test("q239b histogram cuts match a sequential reference and stay near q239's thirds") {
    val rows = run("q239b_perplexity_buckets_hist").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))

    // sequential reference: string bigrams (the oracle's form — q99's
    // zero-collision evidence covers hash==string equivalence), corpus
    // counts, inverse-mean-frequency micros, then the min-cut rule
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "lang", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .filter(_._3.split(" ", -1).length >= 2)
    val grams = docs.map { case (id, lang, text) =>
      val w = text.toLowerCase.split(" ", -1)
      (id, lang, w.sliding(2).map(_.mkString(" ")).toArray)
    }
    val corpus = grams.flatMap(_._3).groupBy(identity).view.mapValues(_.length.toLong)
    val scored = grams.map { case (id, lang, gs) =>
      val sumC = gs.map(corpus(_)).sum
      (id, lang, gs.length.toLong, (1000000L * gs.length) / sumC)
    }
    scored.groupBy(_._2).foreach { case (lang, xs) =>
      val n = xs.length.toLong
      val hist = xs.groupBy(_._4).view
        .mapValues(g => (g.length.toLong, g.map(_._3).sum)).toMap
      val bps = hist.keys.toSeq.sorted
      val cum = bps.scanLeft(0L)((acc, bp) => acc + hist(bp)._1).tail
      def cut(t: Long): Long = bps(cum.indexWhere(_ >= t))
      val c1 = cut((n + 2) / 3); val c2 = cut((2 * n + 2) / 3)
      val expect = bps.groupBy(bp =>
        if (bp <= c1) "head" else if (bp <= c2) "middle" else "tail")
        .map { case (b, bs) =>
          b -> ((bs.map(hist(_)._1).sum, bs.map(hist(_)._2).sum, bs.min, bs.max))
        }
      val got = rows.filter(_._1 == lang)
        .map(r => r._2 -> ((r._3, r._4, r._5, r._6))).toMap
      assert(got === expect, s"$lang histogram buckets")

      // whole-bucket wobble bound: each cumulative boundary overshoots
      // ceil(kn/3) by less than the cut bucket's own size
      val nHead = expect.get("head").map(_._1).getOrElse(0L)
      assert(nHead >= (n + 2) / 3 && nHead - hist(c1)._1 < (n + 2) / 3,
        s"$lang head respects the min-cut rule")
      // strict score separation between buckets (no bp value spans two)
      for (Seq(lo, hi) <- Seq("head", "middle", "tail")
             .flatMap(expect.get).sliding(2) if lo != hi)
        assert(lo._4 < hi._3, s"$lang buckets share a score value")
    }
  }

  test("q241 conserves mass, obeys the centroid rule, and flags exactly >2%") {
    val rows = run("q241_ivf_drift_audit").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getBoolean(6)))
    assert(rows.nonEmpty, "sf0.001 has centroids; audit must be non-empty")

    // every vector lands in exactly one cell: epoch masses sum to the corpus
    val nVec = Tables.embeddings(spark, sf).count()
    assert(rows.map(r => r._2 + r._3).sum === nVec, "assignment must conserve")

    rows.foreach { case (cent, nOld, nNew, ppmOld, ppmNew, shift, rebal) =>
      // cent_id really is a sampled centroid (the shared q66 LCG rule)
      assert(((cent % 2147483647L) * 1103515245L + 12345L)
        % 2147483647L % 50 === 0L, s"cell $cent not a centroid")
      assert(shift === math.abs(ppmNew - ppmOld), s"cell $cent shift")
      assert(rebal === (shift > 20000L), s"cell $cent flag")
    }

    // truncating div: each epoch's ppm column sums to 1e6 less at most
    // one ulp-per-cell of truncation loss
    val sumOld = rows.map(_._4).sum
    assert(sumOld <= 1000000L && sumOld >= 1000000L - rows.length,
      s"ppm_old mass $sumOld")
    val sumNew = rows.map(_._5).sum
    assert(sumNew <= 1000000L && sumNew >= 1000000L - rows.length,
      s"ppm_new mass $sumNew")
  }

  test("q243 interleave: sequential re-derivation + permutation laws") {
    val rows = run("q243_shuffle_shard_interleave").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))

    // re-derive shard / position / global_pos from the LCG on the driver
    val M = 2147483647L; val A = 1103515245L; val C = 12345L
    val ids = Tables.documents(spark, sf).select("doc_id").collect()
      .map(_.getLong(0))
    val keyed = ids.map { id =>
      val r1 = ((id % M) * A + C + 9L) % M
      (id, r1 % 8L, (r1 * A + C) % M)
    }
    val expect = keyed.groupBy(_._2).toSeq.flatMap { case (_, xs) =>
      xs.sortBy(x => (x._3, x._1)).zipWithIndex.map { case ((id, s2, _), i) =>
        id -> ((s2, i.toLong, i.toLong * 8L + s2))
      }
    }.toMap
    rows.foreach { case (id, shard, pos, g) =>
      assert(expect(id) === ((shard, pos, g)), s"doc $id")
    }

    // laws: global positions injective; per-shard positions contiguous 0..n-1
    assert(rows.map(_._4).distinct.length === rows.length, "global_pos clash")
    rows.groupBy(_._2).foreach { case (shard, xs) =>
      assert(xs.map(_._3).sorted.toSeq === (0L until xs.length).toSeq,
        s"shard $shard positions not contiguous")
    }

    // a different epoch addend must produce a different order (the epoch
    // really enters the keys): epoch 10's within-shard ranks differ
    val other = keyed.map { case (id, _, _) =>
      val r1 = ((id % M) * A + C + 10L) % M
      (id, r1 % 8L, (r1 * A + C) % M)
    }
    val otherPos = other.groupBy(_._2).toSeq.flatMap { case (_, xs) =>
      xs.sortBy(x => (x._3, x._1)).zipWithIndex.map { case ((id, s2, _), i) =>
        id -> (i.toLong * 8L + s2)
      }
    }.toMap
    assert(ids.exists(id => otherPos(id) != expect(id)._3),
      "changing the epoch addend must reshuffle the order")
  }

  test("q245 matches a sequential PQ-assignment reference and the flag is live") {
    val got = run("q245_pq_drift_audit").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getBoolean(6))).toMap
    assert(got.keySet === Set(0L, 1L, 2L, 3L), "one row per subspace")

    // full sequential re-derivation: strided subvectors, LCG-sampled
    // codebook, min-L2 assignment (ties to larger cent_id), floored micros
    val vecs = Tables.embeddings(spark, sf)
      .selectExpr("vec_id", "transform(embedding, x -> cast(x as double)) v")
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    def sub(v: Array[Double], m: Int): Array[Double] =
      v.indices.collect { case i if i % 4 == m => v(i) }.toArray
    val isCent = (id: Long) =>
      ((id % 2147483647L) * 1103515245L + 12345L) % 2147483647L % 31 == 0
    val cents = vecs.filter(v => isCent(v._1))
    assert(cents.nonEmpty, "sf0.001 must sample a non-empty codebook")
    val sums = scala.collection.mutable.Map.empty[(Int, Int), (Long, Long)]
      .withDefaultValue((0L, 0L)) // (m, epoch) -> (n, err_u sum)
    vecs.foreach { case (id, v) =>
      (0 until 4).foreach { m =>
        val sv = sub(v, m)
        // min over (l2, -cent_id): left-fold the squared diffs in order
        val best = cents.map { case (cid, cv) =>
          val cs = sub(cv, m)
          val l2 = sv.indices.foldLeft(0.0) { (acc, i) =>
            acc + (sv(i) - cs(i)) * (sv(i) - cs(i))
          }
          (l2, -cid)
        }.min
        val errU = math.floor(best._1 * 1000000d).toLong
        val k = (m, (id % 2).toInt)
        val (n, e) = sums(k); sums(k) = (n + 1, e + errU)
      }
    }
    (0 until 4).foreach { m =>
      val (nOld, eOld) = sums((m, 0)); val (nNew, eNew) = sums((m, 1))
      val merrOld = eOld / nOld; val merrNew = eNew / nNew
      val shift = math.abs(merrNew - merrOld)
      assert(got(m.toLong) === ((nOld, nNew, merrOld, merrNew, shift,
        shift * 40L > merrOld)), s"subspace $m")
    }
    // conservation + a LIVE relative flag (2.5% splits this corpus 2/2)
    got.values.foreach { v => assert(v._1 + v._2 === vecs.length.toLong) }
    assert(got.values.map(_._6).toSet === Set(true, false),
      "the retrain flag must be live in both directions")
  }
}
