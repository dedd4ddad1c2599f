package graft

import graft.functions.Sketches
import graft.functions.Sketches.{MinHashAgg, SimHashAgg}

/** Sketch-aggregator unit properties: estimate quality, merge associativity
  * (the partial-aggregation contract), and determinism across buffers. */
class SketchSpec extends SparkSpec {

  private def sig(elems: Seq[Long]): Array[Long] = {
    val agg = new MinHashAgg
    elems.foldLeft(agg.zero)(agg.reduce)
  }

  test("minhash estimates Jaccard within 0.15 for known-overlap sets") {
    val a = (0L until 1000L)
    val b = (200L until 1200L) // |A∩B|=800, |A∪B|=1200 → J=2/3
    val sa = sig(a)
    val sb = sig(b)
    val est = sa.zip(sb).count { case (x, y) => x == y }.toDouble / Sketches.NumMinHashes
    assert(math.abs(est - 2.0 / 3.0) < 0.15, s"est=$est")
  }

  test("minhash merge == single-pass reduce (partial aggregation contract)") {
    val agg = new MinHashAgg
    val elems = (0L until 500L).map(i => i * 2654435761L)
    val whole = sig(elems)
    val (l, r) = elems.splitAt(137)
    val merged = agg.merge(sig(l), sig(r))
    assert(merged.toSeq === whole.toSeq)
  }

  test("simhash: near-identical multisets land at small Hamming distance") {
    val agg = new SimHashAgg
    def simOf(elems: Seq[Long]): Long = agg.finish(elems.foldLeft(agg.zero)(agg.reduce))
    // 2 of 400 elements changed: each 64-bit counter moves by ≤4, so only
    // bits whose majority margin is ≤4 can flip — a handful at most.
    val base = (0L until 400L).map(i => i * 0x9e3779b97f4a7c15L)
    val tweaked = base.drop(2) ++ Seq(1L, 2L).map(_ * 7919L)
    val h = java.lang.Long.bitCount(simOf(base) ^ simOf(tweaked))
    assert(h <= 10, s"hamming=$h")
    // and unrelated sets are far apart
    val other = (10000L until 10400L).map(i => i * 0x9e3779b97f4a7c15L)
    assert(java.lang.Long.bitCount(simOf(base) ^ simOf(other)) > 10)
  }

  test("simhash merge == single-pass reduce") {
    val agg = new SimHashAgg
    val elems = (0L until 300L).map(i => i * 6364136223846793005L + 1442695040888963407L)
    val whole = agg.finish(elems.foldLeft(agg.zero)(agg.reduce))
    val (l, r) = elems.splitAt(97)
    val merged = agg.finish(agg.merge(
      l.foldLeft(agg.zero)(agg.reduce), r.foldLeft(agg.zero)(agg.reduce)))
    assert(merged === whole)
  }

  test("row-local array sketches equal the aggregate forms exactly") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val docs = Seq(
      (1L, (0L until 200L).map(i => i * 0x9e3779b97f4a7c15L).toArray),
      (2L, (50L until 120L).map(i => i * 6364136223846793005L).toArray),
      (3L, Array(42L))).toDF("doc_id", "sh")
    val exploded = docs.select(col("doc_id"), explode(col("sh")).as("h"))
    val aggMin = exploded.groupBy("doc_id").agg(Sketches.minhash(col("h")).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val arrMin = docs.select(col("doc_id"), Sketches.minhashArray(col("sh")).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(arrMin === aggMin)
    val aggSim = exploded.groupBy("doc_id").agg(Sketches.simhash(col("h")).as("sim"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val arrSim = docs.select(col("doc_id"), Sketches.simhashArray(col("sh")).as("sim"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(arrSim === aggSim)
  }

  test("LSH candidate pairs cover every exact-Jaccard>=0.8 pair (sf0.001)") {
    val mh = SparkEntry.queries("q39_dedup_minhash_lsh")(spark, sf)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = SparkEntry.queries("q41_dedup_ngram_jaccard")(spark, sf)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & mh).size.toDouble / exact.size
    assert(recall >= 0.95, s"recall=$recall (${exact.size} exact pairs, ${mh.size} candidates)")
  }

  test("ubiquitous-shingle corpus: candidate buckets stay bounded (skew guard)") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    import graft.operators.DedupQueries
    val dir = java.nio.file.Files.createTempDirectory("graft-skew").toString
    // 400 docs all sharing the same boilerplate (every boilerplate shingle
    // has df=400), each with a short unique tail — the degenerate corpus
    // that makes uncapped LSH buckets quadratic.
    val boiler = "all of these documents share this exact boilerplate " +
      "sentence which repeats across the whole corpus forever and ever"
    (0L until 400L).map(i => (i, s"$boiler unique$i token$i tail$i"))
      .toDF("doc_id", "text")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    def maxBucket(df: org.apache.spark.sql.DataFrame): Int =
      df.select(coalesce(max(size(col("docs"))), lit(0))).head().getInt(0)

    assert(maxBucket(DedupQueries.minhashBuckets(spark, dir)) <= DedupQueries.MaxBucket)
    assert(maxBucket(DedupQueries.jaccardBuckets(spark, dir)) <= DedupQueries.MaxBucket)
    // the full queries complete on the degenerate corpus (no quadratic blowup)
    assert(SparkEntry.queries("q39_dedup_minhash_lsh")(spark, dir).count() >= 0)
    assert(SparkEntry.queries("q41_dedup_ngram_jaccard")(spark, dir).count() >= 0)
    // and recall on the NORMAL corpus is unchanged: the sf0.001 coverage
    // test above ("LSH candidate pairs cover every exact pair") runs with
    // these guards active.
  }

  test("incremental dedup: new docs join a PERSISTED signature index, no corpus re-scan") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    import graft.operators.DedupQueries
    // 1. Index build (the once-per-corpus artifact): signatures -> parquet
    val indexDir = java.nio.file.Files.createTempDirectory("graft-sigidx").toString
    DedupQueries.minhashSignatures(spark, sf).write.mode("overwrite").parquet(indexDir)

    // 2. A new batch arrives: one near-dup of an existing doc (its text with
    //    one word changed) and one fresh doc
    val victim = Tables.documents(spark, sf).orderBy("doc_id").head()
    val victimText = victim.getAs[String]("text")
    val nearDup = victimText.split(" ").toSeq.updated(3, "MUTATED").mkString(" ")
    val fresh = (1 to 60).map(i => s"zz$i qq$i ww$i").mkString(" ")
    val newDocs = Seq((100001L, nearDup), (100002L, fresh)).toDF("doc_id", "text")

    // 3. New batch: row-local signatures + band keys, equi-join against the
    //    index's band keys — the corpus is touched only through the
    //    (small, bucketed) signature table, never re-scanned or re-shingled
    def withBands(df: org.apache.spark.sql.DataFrame) =
      df.select(col("doc_id"), col("sig"), explode(DedupQueries.bandKeys(col("sig"))).as("bk"))
        .select(col("doc_id"), col("sig"), col("bk.band"), col("bk.key"))
    // same fp family + signature path as the index build — one definition
    // (DedupQueries.minhashSignaturesFor) serves both ends of the pipeline
    val newSigs = DedupQueries.minhashSignaturesFor(newDocs)
    val index = spark.read.parquet(indexDir)
    val flagged = withBands(newSigs).as("n")
      .join(withBands(index).as("x"), Seq("band", "key"))
      .select(col("n.doc_id").as("new_doc"), col("x.doc_id").as("dup_of"),
        (aggregate(zip_with(col("n.sig"), col("x.sig"),
          (a, b) => when(a === b, 1).otherwise(0)), lit(0), (acc, v) => acc + v)
          / lit(graft.functions.Sketches.NumMinHashes.toDouble)).as("est_jaccard"))
      .filter(col("est_jaccard") >= 0.5)
      .dropDuplicates("new_doc", "dup_of")
      .collect()

    assert(flagged.exists(r => r.getLong(0) == 100001L &&
      r.getLong(1) == victim.getAs[Long]("doc_id")),
      s"the near-dup must be flagged against its source: ${flagged.toSeq}")
    assert(!flagged.exists(_.getLong(0) == 100002L),
      s"the fresh doc must not be flagged: ${flagged.toSeq}")
  }

  test("ANN-LSH results are a correctly-ranked subset of brute force (precision 1)") {
    val brute = SparkEntry.queries("q43_knn_bruteforce")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap
    val lsh = SparkEntry.queries("q44_knn_lsh")(spark, sf).collect()
    assert(lsh.nonEmpty)
    // every LSH (query, neighbor) carries the true cosine — exact re-ranking
    lsh.foreach { r =>
      val key = (r.getLong(0), r.getLong(1))
      brute.get(key).foreach(c => assert(math.abs(c - r.getDouble(3)) < 1e-9))
    }
    // multi-probe recall floor vs the exact top-k (calibrated at sf0.001:
    // single-probe ≈ sparse candidates; Hamming-1 probing must lift recall)
    val bruteSet = brute.keySet
    val lshSet = lsh.map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (bruteSet & lshSet).size.toDouble / bruteSet.size
    assert(recall >= 0.5, s"multi-probe LSH top-k recall too low: $recall")
  }

  test("heavy-hitters sketch honors the Misra-Gries bound against exact counts") {
    import org.apache.spark.sql.functions._
    // corpus bigrams (916 distinct at sf0.001 — more than the 256 counters,
    // so the decrement path runs) plus one injected genuinely-heavy term
    // (the corpus itself is near-uniform: max count 51 of n≈27k); SAME
    // bigram definition as q64/q85 so the exact-vs-sketch compare is real
    val bigrams = graft.functions.TextQueries.bigrams(spark, sf)
      .union(spark.range(2000).select(lit("boilerplate header").as("bigram")))
    val exact = bigrams.groupBy("bigram").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = exact.values.sum
    val k = 256
    val err = n / (k + 1)
    val sketch = bigrams
      .agg(graft.functions.Sketches.heavyHitters(col("bigram"), k).as("hh"))
      .select(explode(col("hh")).as("e"))
      .select(col("e.term"), col("e.cnt"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sketch.nonEmpty && sketch.size <= k)
    // estimates never overcount and are low by at most n/(k+1)
    sketch.foreach { case (t, est) =>
      val truth = exact.getOrElse(t, 0L)
      assert(est <= truth, s"'$t' overcounted: $est > $truth")
      assert(est >= truth - err, s"'$t' undercounted past the bound: $est < $truth - $err")
    }
    // every true heavy hitter (count > n/(k+1)) must be present
    val heavy = exact.filter(_._2 > err).keySet
    assert(heavy.nonEmpty, "test corpus must contain at least one heavy hitter")
    heavy.foreach(t => assert(sketch.contains(t), s"missing heavy hitter '$t'"))
  }

  test("connected components closes transitive chains, not just star clusters") {
    import spark.implicits._
    // a 9-node path (diameter 8 — forces multiple pointer-jump rounds),
    // an isolated pair, and a triangle
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L), (6L, 7L),
      (7L, 8L), (8L, 9L), (20L, 21L), (30L, 31L), (31L, 32L), (30L, 32L))
      .toDF("a", "b")
    val comp = operators.ClusterQueries.connectedComponents(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((1L to 9L).forall(comp(_) == 1L), s"chain must collapse to min label: $comp")
    assert(comp(20L) == 20L && comp(21L) == 20L)
    assert(Seq(30L, 31L, 32L).forall(comp(_) == 30L))
  }

  test("k-means: cost monotone non-increasing, k centroids survive, assignment total") {
    import org.apache.spark.sql.functions._
    val vectors = Tables.embeddings(spark, sf)
      .select(col("vec_id").as("id"),
        transform(col("embedding"), _.cast("double")).as("v"))
    val (cents, costs) = operators.ClusterQueries.kmeans(vectors, k = 8, maxIter = 10)
    assert(cents.count() === 8L, "every cluster must survive (empty ones keep their centroid)")
    assert(costs.size >= 2, "must run at least two rounds before converging")
    costs.sliding(2).foreach {
      case Seq(a, b) => assert(b <= a * (1 + 1e-9), s"cost increased: $costs")
      case _ =>
    }
    // the catalog audit assigns every vector to exactly one cluster
    val audit = SparkEntry.queries("q86_kmeans_train")(spark, sf).collect()
    assert(audit.map(_.getLong(1)).sum === vectors.count())
  }

  test("LSH embedding dedup: precision-1 subset of exact q42, recall on high-sim pairs") {
    val exact = SparkEntry.queries("q42_dedup_embedding_cosine")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val lsh = SparkEntry.queries("q67_dedup_embedding_lsh")(spark, sf).collect()
    assert(lsh.nonEmpty)
    // precision 1: every emitted pair is a true above-threshold pair with
    // the exact cosine (LSH only generates candidates; the filter is exact)
    lsh.foreach { r =>
      val key = (r.getLong(0), r.getLong(1))
      assert(exact.contains(key), s"false positive $key")
      assert(math.abs(exact(key) - r.getDouble(2)) < 1e-9)
    }
    // recall pinned where near-dup detection matters: comfortably-above-
    // threshold pairs (cos >= 0.45; threshold-straddling pairs at ~0.35 are
    // information-theoretically hard for any LSH at this angle)
    val high = exact.filter(_._2 >= 0.45).keySet
    val got = lsh.map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (high & got).size.toDouble / high.size
    assert(high.nonEmpty && recall >= 0.6,
      s"high-similarity recall too low: $recall over ${high.size} pairs")
  }

  test("IVF ANN: exact re-rank (precision 1) and multi-probe recall floor") {
    val brute = SparkEntry.queries("q43_knn_bruteforce")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap
    val ivf = SparkEntry.queries("q66_knn_ivf")(spark, sf).collect()
    assert(ivf.nonEmpty)
    ivf.foreach { r =>
      val key = (r.getLong(0), r.getLong(1))
      brute.get(key).foreach(c => assert(math.abs(c - r.getDouble(3)) < 1e-9))
    }
    val recall = (brute.keySet & ivf.map(r => (r.getLong(0), r.getLong(1))).toSet)
      .size.toDouble / brute.size
    assert(recall >= 0.5, s"IVF top-k recall too low: $recall")
  }

  test("q261 minhash scoreboard is the set algebra of exact panel Jaccard vs q39") {
    // exact side recomputed HERE as literal set arithmetic over the
    // collected shingle sets — not the shipped inverted-index join
    val shingles = graft.operators.DedupQueries
      .replayableShingles(Tables.documents(spark, sf))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    val panel = shingles.keys.filter(_ % 5 == 0)
    val exact = panel.flatMap { p =>
      val a = shingles(p)
      shingles.collect { case (d, b) if d != p =>
        val inter = (a & b).size
        (p, d, inter.toLong * 1000000L / (a.size + b.size - inter),
          2 * inter >= a.size + b.size - inter)
      }.filter(_._4).map(t => (t._1, t._2, t._3))
    }.toSeq
    val ap = SparkEntry.queries("q39_dedup_minhash_lsh")(spark, sf).collect()
      .flatMap(r => Seq((r.getLong(0), r.getLong(1)), (r.getLong(1), r.getLong(0))))
      .toSet
    val ev = SparkEntry.queries("q261_minhash_recall_eval")(spark, sf).collect()
    val byP = exact.groupBy(_._1)
    assert(ev.nonEmpty && ev.map(_.getLong(0)).toSet == byP.keySet,
      "q261 must cover exactly the panel docs with exact near-dup partners")
    ev.foreach { r =>
      val p = r.getLong(r.fieldIndex("panel_doc"))
      val ex = byP(p)
      val hits = ex.count(t => ap((t._1, t._2)))
      val worstMiss = ex.filter(t => !ap((t._1, t._2))).map(_._3)
        .maxOption.getOrElse(0L)
      assert(r.getLong(r.fieldIndex("exact_cnt")) == ex.size, s"doc $p exact_cnt")
      assert(r.getLong(r.fieldIndex("hits")) == hits, s"doc $p hits")
      assert(r.getLong(r.fieldIndex("recall_ppm")) ==
        hits.toLong * 1000000L / ex.size, s"doc $p recall_ppm")
      assert(r.getLong(r.fieldIndex("worst_miss_ppm")) == worstMiss,
        s"doc $p worst_miss_ppm")
    }
    // deterministic macro floor: the banding math promises ~100% at J>=0.5;
    // anything under 90% means the index family itself changed
    val macroPpm = ev.map(_.getLong(ev.head.fieldIndex("recall_ppm"))).sum / ev.length
    assert(macroPpm >= 900000L, s"q261 macro recall $macroPpm under floor 900000")
  }

  test("q262 is the set algebra of exact panel Hamming vs q40") {
    // exact side recomputed HERE from collected signatures (bit arithmetic
    // on longs), not the shipped broadcast join
    val sigs = graft.operators.DedupQueries.textSimhashSigs(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val exact = sigs.keys.filter(_ % 5 == 0).flatMap { p =>
      sigs.collect { case (d, s) if d != p =>
        (p, d, java.lang.Long.bitCount(sigs(p) ^ s).toLong)
      }.filter(_._3 <= 6)
    }.toSeq
    val ap = SparkEntry.queries("q40_dedup_simhash")(spark, sf).collect()
      .flatMap(r => Seq((r.getLong(0), r.getLong(1)), (r.getLong(1), r.getLong(0))))
      .toSet
    val ev = SparkEntry.queries("q262_simhash_recall_eval")(spark, sf).collect()
    val byP = exact.groupBy(_._1)
    assert(ev.nonEmpty && ev.map(_.getLong(0)).toSet == byP.keySet,
      "q262 must cover exactly the panel docs with Hamming-close partners")
    ev.foreach { r =>
      val p = r.getLong(r.fieldIndex("panel_doc"))
      val ex = byP(p)
      val hits = ex.count(t => ap((t._1, t._2)))
      assert(r.getLong(r.fieldIndex("exact_cnt")) == ex.size, s"doc $p exact_cnt")
      assert(r.getLong(r.fieldIndex("hits")) == hits, s"doc $p hits")
      val missMin = ex.filter(t => !ap((t._1, t._2))).map(_._3).minOption
      assert(Option(r.get(r.fieldIndex("miss_min_hamming")))
        .map(_.asInstanceOf[Long]) == missMin, s"doc $p miss_min_hamming")
    }
  }

  test("native token-shingle kernel == declarative HOF reference model, corpus + edges") {
    import spark.implicits._
    import graft.operators.DedupQueries
    // The corpus the dedup family actually runs on, plus hand-planted
    // edge shapes: unicode (multibyte lead bytes → Spark ascii() is the
    // SIGN-EXTENDED first byte), consecutive/leading/trailing spaces
    // (empty tokens fold to 0), sub-3-token docs (filtered upstream, but
    // the kernel must still agree where the filter keeps them), and
    // repeated shingles (first-occurrence distinct order).
    val edges = Seq(
      (9001L, "a b c d e"),
      (9002L, "α βγ δ ε ζ"),
      (9003L, "  double  spaces  here  "),
      (9004L, "x y z x y z x y z"),
      (9005L, "ONE Two tHRee FOUR"),
      (9006L, "emoji 🙂 mixed ascii ünïcode"),
      (9007L, "three tok ens"),
      (9008L, "a " * 40 + "b c")
    ).toDF("doc_id", "text")
    val docs = Tables.documents(spark, sf).select("doc_id", "text").unionAll(edges)
    val native = DedupQueries.replayableShingles(docs)
    val hof = DedupQueries.replayableShinglesHof(docs)
    val n = native.collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val h = hof.collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(n.keySet == h.keySet, "same docs survive the 3-token gate")
    n.foreach { case (id, sh) =>
      assert(sh == h(id), s"doc $id: native $sh != HOF ${h(id)}")
    }
  }

  test("native xxhash token-shingle kernel == declarative HOF reference model") {
    import spark.implicits._
    import graft.operators.DedupQueries
    import org.apache.spark.sql.functions._
    val edges = Seq(
      (9001L, "a b c d e"),
      (9002L, "α βγ δ ε ζ"),
      (9003L, "  double  spaces  here  "),
      (9004L, "x y z x y z x y z"),
      (9005L, "ONE Two tHRee FOUR"),
      (9006L, "emoji 🙂 mixed ascii ünïcode"),
      (9007L, "three tok ens"),
      (9008L, "a " * 40 + "b c")
    ).toDF("doc_id", "text")
    val docs = Tables.documents(spark, sf).select("doc_id", "text").unionAll(edges)
    val native = docs.filter(size(split(lower(col("text")), " ")) >= 3)
      .select(col("doc_id"), Sketches.xxhTokenShingles(col("text")).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val hof = DedupQueries.xxhShingleArraysHof(docs)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(native.keySet == hof.keySet)
    native.foreach { case (id, sh) =>
      assert(sh == hof(id), s"doc $id: native $sh != HOF ${hof(id)}")
    }
  }

  test("q264 is the set algebra of exact panel cosine vs q67") {
    import graft.operators.DedupQueries
    // exact side recomputed HERE from collected vectors (sequential
    // double dot, the same left-to-right order dotd folds), not the
    // shipped tile join
    val vecs = DedupQueries.normVecs(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val exact = vecs.keys.filter(_ % 5 == 0).flatMap { p =>
      vecs.collect { case (d, v) if d != p => (p, d, cos(vecs(p), v)) }
        .filter(_._3 >= 0.35)
    }.toSeq
    val ap = SparkEntry.queries("q67_dedup_embedding_lsh")(spark, sf).collect()
      .flatMap(r => Seq((r.getLong(0), r.getLong(1)), (r.getLong(1), r.getLong(0))))
      .toSet
    val ev = SparkEntry.queries("q264_embedding_recall_eval")(spark, sf).collect()
    val byP = exact.groupBy(_._1)
    assert(ev.nonEmpty && ev.map(_.getLong(0)).toSet == byP.keySet,
      "q264 must cover exactly the panel vecs with cosine-close partners")
    ev.foreach { r =>
      val p = r.getLong(r.fieldIndex("panel_vec"))
      val ex = byP(p)
      val hits = ex.count(t => ap((t._1, t._2)))
      assert(r.getLong(r.fieldIndex("exact_cnt")) == ex.size, s"vec $p exact_cnt")
      assert(r.getLong(r.fieldIndex("hits")) == hits, s"vec $p hits")
      val missMax = ex.filter(t => !ap((t._1, t._2)))
        .map(t => math.round(t._3 * 10000.0) / 10000.0).maxOption
      assert(Option(r.get(r.fieldIndex("miss_max_cos")))
        .map(_.asInstanceOf[Double]) == missMax, s"vec $p miss_max_cos")
    }
  }

  test("the table dial is monotone, agrees with q264 at full width, and moves with the floor") {
    import graft.operators.{DedupQueries, SimilarityQueries}
    val n = Tables.parquetRowCount(spark, sf, "embeddings")
    val e = DedupQueries.normVecs(spark, sf)
    val dial = DedupQueries.lshTableDial(e, SimilarityQueries.codeBits(n), n)
      .collect()
    assert(dial.map(_.getLong(0)).toSeq == (1L to 4L))
    // recall is non-decreasing in tables (each table only adds collisions)
    val recalls = dial.map(_.getLong(dial.head.fieldIndex("recall_ppm")))
    assert(recalls.zip(recalls.tail).forall { case (a, b) => a <= b },
      s"recall must be monotone in tables: ${recalls.mkString(",")}")
    // at full width the dial's hit count IS q264's: same exact side, and
    // a pair collides through 4 tables iff it is in the shipped pair set
    val hits4 = dial.last.getLong(dial.head.fieldIndex("hits"))
    val sb = SparkEntry.queries("q264_embedding_recall_eval")(spark, sf).collect()
    assert(hits4 == sb.map(_.getLong(sb.head.fieldIndex("hits"))).sum,
      "t=4 hits must equal the q264 scoreboard's total")
    assert(dial.last.getLong(dial.head.fieldIndex("exact_cnt")) ==
      sb.map(_.getLong(sb.head.fieldIndex("exact_cnt"))).sum)
    // exactly one chosen row; a zero floor moves the choice to one table
    assert(dial.count(_.getBoolean(dial.head.fieldIndex("chosen"))) == 1)
    val loose = DedupQueries.lshTableDial(e, SimilarityQueries.codeBits(n), n,
      floorPpm = 0L).collect()
    assert(loose.filter(_.getBoolean(loose.head.fieldIndex("chosen")))
      .head.getLong(0) == 1L)
    // the calibrated entry point serves the dial's choice
    val chosen = dial.filter(_.getBoolean(dial.head.fieldIndex("chosen")))
      .head.getLong(0).toInt
    assert(DedupQueries.calibratedLshTables(spark, sf) == chosen)
  }

  test("the embedding scoreboard detects bucket-cap loss on a saturated planted corpus") {
    import spark.implicits._
    import graft.operators.{DedupQueries, SimilarityQueries}
    import org.apache.spark.sql.functions._
    import graft.functions.VectorFunctions.dotd
    // 70 identical vectors: every pair is cosine 1.0 — a TRUE duplicate
    // family — but every LSH probe bucket holds all 70 > MaxBucket=64,
    // so the banded index drops ALL of them. The scoreboard must read
    // recall 0 with miss_max_cos 1.0 (the strongest possible miss).
    val v = Array.tabulate(64)(i => math.sin(i + 1.0))
    val e = (0L until 70L).map(id => (id, v.toSeq)).toDF("vec_id", "v")
      .select(col("vec_id"), col("v"), sqrt(dotd(col("v"), col("v"))).as("nrm"))
    val sb = DedupQueries.embeddingScoreboard(e,
      DedupQueries.lshNearDupPairsFrom(e, SimilarityQueries.codeBits(70L)), 70L)
      .collect()
    assert(sb.length == 14, s"panel 0,5,..,65 is 14 vecs, got ${sb.length}")
    sb.foreach { r =>
      assert(r.getLong(r.fieldIndex("exact_cnt")) == 69L, "69 identical partners")
      assert(r.getLong(r.fieldIndex("recall_ppm")) == 0L,
        "saturated buckets must read as recall 0, not as no pairs")
      assert(r.getDouble(r.fieldIndex("miss_max_cos")) == 1.0,
        "the strongest dropped pair is vector-identical")
    }
  }

  test("q265 is the set algebra of per-pair smallest-shared-bucket grading") {
    import graft.operators.DedupQueries
    val sigs = DedupQueries.textSimhashSigs(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // per-pair min shared-bucket size recomputed HERE from collected sigs
    val bands = DedupQueries.SimhashBands
    def keysOf(sim: Long) = bands.map { case (b, off, mask) =>
      (b, (sim >>> off) & mask)
    }
    val bucketSize = sigs.values.toSeq.flatMap(keysOf)
      .groupBy(identity).map { case (k, v) => k -> v.size }
    val exact = sigs.keys.filter(_ % 5 == 0).flatMap { p =>
      sigs.collect {
        case (d, s) if d != p &&
          java.lang.Long.bitCount(sigs(p) ^ s) <= 6 =>
          val shared = keysOf(sigs(p)).toSet.intersect(keysOf(s).toSet)
          (p, d, shared.map(bucketSize).min)
      }
    }.toSeq
    val dial = SparkEntry.queries("q265_bucket_cap_dial")(spark, sf).collect()
    assert(dial.map(_.getLong(0)).toSeq == DedupQueries.CapSweep.map(_.toLong))
    dial.foreach { r =>
      val cap = r.getLong(r.fieldIndex("cap"))
      assert(r.getLong(r.fieldIndex("exact_cnt")) == exact.size, s"cap $cap exact_cnt")
      assert(r.getLong(r.fieldIndex("hits")) == exact.count(_._3 <= cap),
        s"cap $cap hits")
    }
    // exactly one chosen row, and it is the minimal floor-meeting cap
    assert(dial.count(_.getBoolean(dial.head.fieldIndex("chosen"))) == 1)
  }

  test("the calibration manifest carries each dial's chosen reading, one row per parameter") {
    import graft.operators.{Calibration, DedupQueries, MultimodalQueries,
      SimilarityQueries}
    val m = Calibration.manifest(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m.keySet == Set("ivf_probes", "simhash_cap_text",
      "simhash_cap_media", "lsh_tables", "minhash_cap", "cdc_cap"))
    assert(m("ivf_probes") == SimilarityQueries.calibratedProbes(spark, sf).toLong)
    assert(m("simhash_cap_text") == DedupQueries.calibratedSimhashCap(spark, sf).toLong)
    assert(m("lsh_tables") == DedupQueries.calibratedLshTables(spark, sf).toLong)
    assert(m("minhash_cap") == DedupQueries.calibratedMinhashCap(spark, sf).toLong)
    assert(m("cdc_cap") == MultimodalQueries.calibratedCdcCap(spark, sf).toLong)
  }

  test("the minhash cap dial's cap-64 row reproduces q261's aggregate micro recall") {
    import graft.operators.DedupQueries
    // at the shipped cap the dial's grading criterion (min shared bucket
    // <= 64 AND est-J >= 1/2) is EXACTLY membership in the shipped q39
    // pair set, so the cap-64 row must equal the q261 scoreboard's
    // aggregate: same exact_cnt, same hits — two independently-built
    // pipelines forced to agree on the shared reading
    val dial = SparkEntry.queries("q273_minhash_cap_dial")(spark, sf).collect()
    assert(dial.map(_.getLong(0)).toSeq == DedupQueries.CapSweep.map(_.toLong))
    assert(dial.count(_.getBoolean(dial.head.fieldIndex("chosen"))) == 1)
    val row64 = dial.find(_.getLong(0) == 64L).get
    val sb = SparkEntry.queries("q261_minhash_recall_eval")(spark, sf).collect()
    assert(row64.getLong(row64.fieldIndex("exact_cnt")) ==
      sb.map(_.getLong(sb.head.fieldIndex("exact_cnt"))).sum)
    assert(row64.getLong(row64.fieldIndex("hits")) ==
      sb.map(_.getLong(sb.head.fieldIndex("hits"))).sum)
    // the abs form keeps the dial contract on its smaller panel
    val abs = SparkEntry.queries("q274_minhash_cap_dial_abs")(spark, sf).collect()
    assert(abs.map(_.getLong(0)).toSeq == DedupQueries.CapSweep.map(_.toLong))
    assert(abs.count(_.getBoolean(abs.head.fieldIndex("chosen"))) == 1)
    val a64 = abs.find(_.getLong(0) == 64L).get
    val sbAbs = SparkEntry.queries("q272_minhash_recall_eval_abs")(spark, sf)
      .collect()
    assert(a64.getLong(a64.fieldIndex("exact_cnt")) ==
      sbAbs.map(_.getLong(sbAbs.head.fieldIndex("exact_cnt"))).sum)
    assert(a64.getLong(a64.fieldIndex("hits")) ==
      sbAbs.map(_.getLong(sbAbs.head.fieldIndex("hits"))).sum)
  }

  test("the minhash cap dial moves with the floor and the chosen cap feeds the index (closed loop)") {
    import spark.implicits._
    import graft.operators.DedupQueries
    // the q265 saturation scenario on the MinHash side: 70 byte-identical
    // documents — every pair is a true duplicate (exact J = 1), every
    // signature is identical, every band bucket holds 70. The shipped cap
    // (64) drops everything; the dial must discover that 128 is the
    // minimal working cap, and the pair builder at the dial's choice must
    // recover what the default loses.
    val dir = java.nio.file.Files.createTempDirectory("graft_mh_sat").toString
    (0L until 70L)
      .map(id => (id, "alpha beta gamma delta epsilon", "en", "web", 29L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val dial = DedupQueries.minhashCapDial(spark, dir).collect()
    val chosen = dial.filter(_.getBoolean(dial.head.fieldIndex("chosen")))
    assert(chosen.length == 1 && chosen.head.getLong(0) == 128L,
      "only cap 128 clears the 70-member buckets")
    dial.foreach { r =>
      val expect = if (r.getLong(0) >= 70L) 1000000L else 0L
      assert(r.getLong(r.fieldIndex("recall_ppm")) == expect,
        s"cap ${r.getLong(0)} recall")
      // both ground-truth bounds are untouched on this corpus: buckets of
      // 70 sit far under GtBucketCap, dfs of 70 far under the df cutoff
      assert(r.getLong(r.fieldIndex("gt_dropped")) == 0L)
      assert(r.getLong(r.fieldIndex("gt_excluded_fps")) == 0L)
    }
    // floor moves the choice: any recall clears a 0 floor
    assert(DedupQueries.calibratedMinhashCap(spark, dir, floorPpm = 0L) ==
      DedupQueries.CapSweep.min)
    // closed loop: the default cap loses every pair, the dial-chosen cap
    // recovers all 70*69/2 at full signature agreement
    assert(DedupQueries.minhashPairs(spark, dir).count() == 0L)
    assert(DedupQueries.minhashNearDupCalibrated(spark, dir).count() == 69L * 35L)
  }

  test("the calibrated minhash cap entry point serves the dial's corpus choice") {
    import graft.operators.DedupQueries
    val dial = SparkEntry.queries("q273_minhash_cap_dial")(spark, sf).collect()
    val chosen = dial.filter(_.getBoolean(dial.head.fieldIndex("chosen")))
      .head.getLong(0).toInt
    assert(DedupQueries.calibratedMinhashCap(spark, sf) == chosen)
    val served = DedupQueries.minhashNearDupCalibrated(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val direct = DedupQueries.minhashPairs(spark, sf, chosen).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(served == direct,
      "the calibrated entry point must serve exactly the chosen-cap pair set")
    // the floor moves the choice: any recall clears a 0 floor, so the
    // dial falls to the cheapest swept cap
    assert(DedupQueries.calibratedMinhashCap(spark, sf, floorPpm = 0L) ==
      DedupQueries.CapSweep.min)
  }

  test("the calibrated cap entry points serve the dial's corpus choice") {
    import graft.operators.DedupQueries
    val dial = SparkEntry.queries("q265_bucket_cap_dial")(spark, sf).collect()
    val chosen = dial.filter(_.getBoolean(dial.head.fieldIndex("chosen")))
      .head.getLong(0).toInt
    assert(DedupQueries.calibratedSimhashCap(spark, sf) == chosen)
    val served = DedupQueries.simhashNearDupCalibrated(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val direct = DedupQueries.simhashNearDupPairsUnsorted(
      DedupQueries.textSimhashSigs(spark, sf), chosen).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(served == direct,
      "the calibrated entry point must serve exactly the chosen-cap pair set")
  }

  test("the cap dial moves with the floor and the chosen cap feeds the index (closed loop)") {
    import spark.implicits._
    import graft.operators.{DedupQueries, MultimodalQueries}
    // q263's saturated corpus: 70 byte-identical payloads — every pair is
    // a true duplicate, every bucket holds 70. The shipped cap (64) drops
    // everything; the dial must discover that 128 is the minimal working
    // cap, and the pair builder at the dial's choice must recover what
    // the default loses.
    val payload = Array.tabulate(64)(i => (i * 7 + 3).toByte)
    val media = (0L until 70L).map(id => (id, payload.clone))
      .toDF("doc_id", "payload")
    val sigs = MultimodalQueries.byteSimhashSigs(media)
    val dial = DedupQueries.bucketCapDial(sigs).collect()
    val chosen = dial.filter(_.getBoolean(dial.head.fieldIndex("chosen")))
    assert(chosen.length == 1 && chosen.head.getLong(0) == 128L,
      "only cap 128 clears the 70-member buckets")
    dial.foreach { r =>
      val expect = if (r.getLong(0) >= 70L) 1000000L else 0L
      assert(r.getLong(r.fieldIndex("recall_ppm")) == expect,
        s"cap ${r.getLong(0)} recall")
    }
    // floor moves the choice: any recall clears a 0 floor, so the dial
    // must fall to the cheapest swept cap
    val loose = DedupQueries.bucketCapDial(sigs, floorPpm = 0L).collect()
    assert(loose.filter(_.getBoolean(loose.head.fieldIndex("chosen")))
      .head.getLong(0) == 16L)
    // closed loop: the default cap loses every pair, the dial-chosen cap
    // recovers all 70*69/2
    assert(DedupQueries.simhashNearDupPairsUnsorted(sigs).count() == 0L)
    assert(DedupQueries.simhashNearDupPairsUnsorted(sigs, 128).count() == 69L * 35L)
  }

  test("the simhash scoreboard detects bucket-cap loss on a saturated planted corpus") {
    import spark.implicits._
    // 70 byte-identical payloads: every pair is Hamming 0 — a TRUE
    // duplicate family — but every band bucket holds 70 > MaxBucket=64,
    // so the banded index drops ALL of them. The scoreboard must read
    // recall 0 with miss_min_hamming 0 (the strongest possible miss),
    // not silently report nothing.
    val payload = Array.tabulate(64)(i => (i * 7 + 3).toByte)
    val media = (0L until 70L).map(id => (id, payload.clone))
      .toDF("doc_id", "payload")
    val sb = graft.operators.DedupQueries.simhashScoreboard(
      graft.operators.MultimodalQueries.byteSimhashSigs(media),
      graft.operators.MultimodalQueries.byteSimhashPairs(media)).collect()
    assert(sb.length == 14, s"panel 0,5,..,65 is 14 docs, got ${sb.length}")
    sb.foreach { r =>
      assert(r.getLong(r.fieldIndex("exact_cnt")) == 69L, "69 identical partners")
      assert(r.getLong(r.fieldIndex("recall_ppm")) == 0L,
        "saturated buckets must read as recall 0, not as no pairs")
      assert(r.getLong(r.fieldIndex("miss_min_hamming")) == 0L,
        "the strongest dropped pair is byte-identical")
    }
  }

  test("bounded ground truth: a saturated planted corpus completes within the gtCap budget and reports its truncation") {
    import spark.implicits._
    import graft.operators.{DedupQueries, MultimodalQueries}
    // 70 byte-identical payloads: every band bucket holds all 70 docs —
    // the degenerate corpus whose UNBOUNDED ground-truth join is
    // panel_share × Σ bucket² ≈ n², at exactly the saturation the dials
    // exist to detect. With gtCap=10 the exact side may examine at most
    // the first 10 members of each bucket, and the truncation must be
    // REPORTED, never silent.
    val payload = Array.tabulate(64)(i => (i * 7 + 3).toByte)
    val media = (0L until 70L).map(id => (id, payload.clone))
      .toDF("doc_id", "payload")
    val sigs = MultimodalQueries.byteSimhashSigs(media)
    val sb = DedupQueries.simhashScoreboard(sigs,
      MultimodalQueries.byteSimhashPairs(media), gtCap = 10).collect()
    assert(sb.length == 14, "every panel doc still appears, bounded")
    sb.foreach { r =>
      val p = r.getLong(r.fieldIndex("panel_doc"))
      // surviving candidates = bucket members ranked 1..10 (docs 0..9),
      // minus self for the two panel docs inside that prefix
      val expected = if (p < 10) 9L else 10L
      assert(r.getLong(r.fieldIndex("exact_cnt")) == expected,
        s"doc $p: exact side must stay within the gt budget")
      assert(r.getLong(r.fieldIndex("gt_dropped")) == 7L * 60L,
        s"doc $p: 7 bands × (70−10) unexamined slots must be reported")
    }
    // same bound and accounting on the cap dial: exact side 2×9 + 12×10
    // pairs, truncation = 14 panel docs × 7 bands × 60 slots on every row
    val dial = DedupQueries.bucketCapDial(sigs, gtCap = 10).collect()
    assert(dial.length == DedupQueries.CapSweep.length)
    dial.foreach { r =>
      val cap = r.getLong(r.fieldIndex("cap"))
      assert(r.getLong(r.fieldIndex("exact_cnt")) == 138L, s"cap $cap exact_cnt")
      assert(r.getLong(r.fieldIndex("gt_dropped")) == 14L * 7L * 60L,
        s"cap $cap gt_dropped")
      // every surviving pair sits only in 70-member buckets
      assert(r.getLong(r.fieldIndex("hits")) == (if (cap >= 70L) 138L else 0L),
        s"cap $cap hits")
    }
  }

  test("bounded ground truth: the real corpus reports ZERO truncation (complete ground truth, results unchanged)") {
    val ev262 = SparkEntry.queries("q262_simhash_recall_eval")(spark, sf).collect()
    assert(ev262.nonEmpty && ev262.forall(
      _.getLong(ev262.head.fieldIndex("gt_dropped")) == 0L),
      "no sf-corpus band bucket approaches GtBucketCap")
    val ev261 = SparkEntry.queries("q261_minhash_recall_eval")(spark, sf).collect()
    assert(ev261.nonEmpty && ev261.forall(
      _.getLong(ev261.head.fieldIndex("gt_excluded_fps")) == 0L),
      "no sf-corpus shingle df approaches GtBucketCap")
    val dial = SparkEntry.queries("q265_bucket_cap_dial")(spark, sf).collect()
    assert(dial.forall(_.getLong(dial.head.fieldIndex("gt_dropped")) == 0L))
  }

  test("graft_top_pairs equals the sort-based top-k reference, ties and merges included") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // heavy ties: score = id % 7 repeats ~143× per value, so the
    // (score DESC, id ASC) tie-break does the ranking work; 11 partitions
    // force the partial/merge path through serialize/deserialize
    val rows = (0L until 1000L).map(id => (id % 13, id, (id % 7).toDouble))
    val heap = rows.toDF("g", "id", "s").repartition(11)
      .groupBy("g")
      .agg(graft.functions.Sketches.topPairs(col("s"), col("id"), 5).as("top"))
      .select(col("g"), posexplode(col("top")))
      .select(col("g"), col("pos"), col("col.score"), col("col.id"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2), r.getLong(3)))
      .toSet
    val ref = rows.groupBy(_._1).flatMap { case (g, rs) =>
      rs.map(t => (t._3, t._2)).sortBy { case (s, id) => (-s, id) }.take(5)
        .zipWithIndex.map { case ((s, id), i) => (g, i, s, id) }
    }.toSet
    assert(heap === ref,
      s"heap top-k diverged from the sort reference:\nonly-heap=${heap -- ref}\nonly-ref=${ref -- heap}")
    // groups smaller than k emit all members, best-first
    val small = Seq((1L, 10L, 1.0), (1L, 11L, 3.0)).toDF("g", "id", "s")
      .groupBy("g")
      .agg(graft.functions.Sketches.topPairs(col("s"), col("id"), 5).as("top"))
      .select(explode(col("top.id")).as("id")).collect().map(_.getLong(0)).toSeq
    assert(small == Seq(11L, 10L))
  }

  test("q277 catches unaligned copied spans q114's tiling misses, and cleans exactly them") {
    import spark.implicits._
    // doc 1 copies a 6-token run of doc 0 at a 1-token offset, so NO
    // 4-token-aligned tile of q114 matches — but the rolling windows at
    // starts 1, 2, 3 do; doc 2 plants internal self-repetition (a 6-token
    // run of one word: windows at 1 and 2 collide with the keeper at 0).
    val d0 = "the quick brown fox jumps over the lazy dog tonight"
    val d1 = "oh quick brown fox jumps over the rest is unique text here"
    val d2 = "spam spam spam spam spam spam unique1 unique2 unique3 unique4"
    val dir = java.nio.file.Files.createTempDirectory("graft_span").toString
    Seq((0L, d0), (1L, d1), (2L, d2))
      .map { case (id, t) => (id, t, "en", "web", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    // q114's aligned tiles are blind to all three plants
    val tiled = SparkEntry.queries("q114_span_dedup")(spark, dir).collect()
    tiled.foreach(r => assert(r.getLong(1) == r.getLong(2),
      s"q114 should keep every aligned tile here, doc ${r.getLong(0)}"))
    val rows = SparkEntry.queries("q277_duplicate_span_extraction")(spark, dir)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))).toMap
    // the global first occurrence (doc 0) is untouched
    assert(rows(0L) == ((10L, 0L, 0L, d0)))
    // doc 1: dup window starts {1,2,3} merge to ONE maximal span covering
    // tokens 1..6 — the copied run goes, the unique tail stays
    assert(rows(1L) == ((12L, 1L, 6L, "oh rest is unique text here")))
    // doc 2: self-repetition dedups against its own keeper window at 0
    assert(rows(2L) ==
      ((10L, 1L, 5L, "spam unique1 unique2 unique3 unique4")))
  }

  test("q278 ranks contamination by verbatim run length, not scattered overlap count") {
    import spark.implicits._
    // doc 0 is the eval member (0 % 97 == 0); doc 1 embeds a 7-token
    // verbatim eval passage at offset 2 (ONE long run); doc 2 shares the
    // same NUMBER of eval 4-grams but scattered as three short runs broken
    // by novel tokens; doc 3 is clean and must be absent.
    val ev = "e1 e2 e3 e4 e5 e6 e7 e8 e9 e10 e11 e12"
    val d1 = "x1 x2 e3 e4 e5 e6 e7 e8 y1 y2"
    val d2 = "e1 e2 e3 e4 z1 e5 e6 e7 e8 z2 e9 e10 e11 e12"
    val d3 = "n1 n2 n3 n4 n5 n6 n7 n8 n9 n10"
    val dir = java.nio.file.Files.createTempDirectory("graft_contam").toString
    Seq((0L, ev), (1L, d1), (2L, d2), (3L, d3))
      .map { case (id, t) => (id, t, "en", "web", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = SparkEntry.queries("q278_contamination_runs")(spark, dir)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // BOTH train docs share exactly 3 distinct eval 4-grams — q76's count
    // cannot tell them apart; only the run structure can
    // doc 1: dup window starts {2,3,4} merge to one 6-token verbatim run
    assert(rows(1L) == ((1L, 6L, 6L)))
    // doc 2: the same overlap count scattered as three 4-token idioms
    assert(rows(2L) == ((3L, 4L, 12L)))
    assert(!rows.contains(3L), "a clean doc must not be flagged")
    assert(!rows.contains(0L), "eval docs are not graded against themselves")
  }

  test("q282 excises exactly the verbatim eval runs and keeps clean remainders whole") {
    import spark.implicits._
    // the q278 fixture: doc 0 is eval; doc 1 embeds one 6-token verbatim
    // run; doc 2 three scattered 4-token idioms; doc 3 is clean
    val ev = "e1 e2 e3 e4 e5 e6 e7 e8 e9 e10 e11 e12"
    val d1 = "x1 x2 e3 e4 e5 e6 e7 e8 y1 y2"
    val d2 = "e1 e2 e3 e4 z1 e5 e6 e7 e8 z2 e9 e10 e11 e12"
    val d3 = "n1 n2 n3 n4 n5 n6 n7 n8 n9 n10"
    val dir = java.nio.file.Files.createTempDirectory("graft_excise").toString
    Seq((0L, ev), (1L, d1), (2L, d2), (3L, d3))
      .map { case (id, t) => (id, t, "en", "web", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = SparkEntry.queries("q282_decontaminate_excise")(spark, dir)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))).toMap
    // doc 1: the copied passage goes, BOTH clean flanks stay
    assert(rows(1L) == ((10L, 1L, 6L, "x1 x2 y1 y2")))
    // doc 2: three idioms excised, the two novel separators survive
    assert(rows(2L) == ((14L, 3L, 12L, "z1 z2")))
    // doc 3: untouched — the excision form keeps clean docs whole, which
    // is the point vs q76's drop-the-document threshold
    assert(rows(3L) == ((10L, 0L, 0L, d3)))
    assert(!rows.contains(0L), "eval docs never reach the training output")
  }
}
