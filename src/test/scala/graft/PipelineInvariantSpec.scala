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

  test("q172 transition rows sum to ~1e6 ppm within each source type") {
    val rows = SparkEntry.queries("q172_event_next_pairs")(spark, sf)
      .collect().groupBy(_.getString(0))
    for ((tpe, rs) <- rows) {
      val total = rs.map(_.getLong(3)).sum
      assert(total <= 1000000L && total > 1000000L - rs.length,
        s"floor-rounded transition ppm for '$tpe' must fill the simplex")
    }
  }

  test("q178 docs at risk can only grow as k grows") {
    val rows = SparkEntry.queries("q178_k_anonymity")(spark, sf)
      .orderBy("k").collect().map(_.getLong(2))
    assert(rows.zip(rows.tail).forall { case (a, b) => a <= b },
      "a stricter k can never lower re-identification risk")
  }

  test("q179 every cohort is fully retained at offset zero") {
    val rows = SparkEntry.queries("q179_retention_cohorts")(spark, sf)
      .filter(col("week_offset") === 0).collect()
    assert(rows.nonEmpty, "offset-0 rows must exist")
    assert(rows.forall(_.getLong(3) === 1000000L),
      "by definition the whole cohort is active in its first week")
  }

  test("q180 segments partition the customers and quartiles balance") {
    val rows = SparkEntry.queries("q180_rfm_segments")(spark, sf).collect()
    val total = rows.map(_.getLong(3)).sum
    val buyers = Tables.orders(spark, sf)
      .select("o_custkey").distinct().count()
    assert(total === buyers, "every ordering customer lands in one segment")
    for (dim <- 0 to 2) {
      val per = rows.groupBy(_.getLong(dim)).view.mapValues(_.map(_.getLong(3)).sum)
      assert(per.values.max - per.values.min <= 1,
        s"ntile quartiles of dim $dim differ by at most one customer")
    }
  }

  test("q183 churn classes partition the observed users") {
    val rows = SparkEntry.queries("q183_churn_labels")(spark, sf).collect()
    val total = rows.map(_.getLong(1)).sum
    val bounds = Tables.events(spark, sf)
      .agg(min(unix_micros(col("ts"))), max(unix_micros(col("ts"))))
      .head()
    val cut = bounds.getLong(0) +
      (bounds.getLong(1) - bounds.getLong(0)) * 97 / 100
    val observed = Tables.events(spark, sf)
      .filter(unix_micros(col("ts")) < cut)
      .select("user_id").distinct().count()
    assert(total === observed,
      "every user with observation-window activity gets exactly one label")
  }

  test("q174 OOV mass shrinks (weakly) as the vocabulary cut grows") {
    val rows = SparkEntry.queries("q174_vocab_prune_impact")(spark, sf)
      .orderBy("cut_size").collect().map(_.getLong(2))
    assert(rows.zip(rows.tail).forall { case (a, b) => a >= b },
      "a larger vocabulary can never create more OOV tokens")
  }

  test("q184 pair support never exceeds either brand support or the universe") {
    val rows = SparkEntry.queries("q184_basket_affinity")(spark, sf).collect()
    rows.foreach { r =>
      val (a, b) = (r.getString(0), r.getString(1))
      val (nAb, nA, nB, nOrd) =
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(a < b, "pairs are emitted in canonical brand order")
      assert(nAb <= math.min(nA, nB),
        "co-occurrence cannot exceed either marginal support")
      assert(math.max(nA, nB) <= nOrd,
        "no brand appears in more orders than exist")
    }
  }

  test("q190 cumulative share is monotone, ends at exactly 1e6, classes ordered") {
    val rows = SparkEntry.queries("q190_pareto_abc")(spark, sf)
      .orderBy("cum_ppm", "p_brand").collect()
    val cums = rows.map(_.getLong(2))
    assert(cums.zip(cums.tail).forall { case (x, y) => x <= y })
    assert(cums.last === 1000000L,
      "the final running share is the whole, exactly (cum = tot)")
    val classes = rows.map(_.getString(3))
    assert(classes.mkString.matches("A+B*C*"),
      "ABC bands appear in order along the cumulative curve")
  }

  test("q194 EWMA is a convex combination of the user's event values") {
    val bounds = Tables.events(spark, sf)
      .groupBy("user_id")
      .agg(min(expr("CAST(floor(value * 1000000) AS BIGINT)")).as("lo"),
        max(expr("CAST(floor(value * 1000000) AS BIGINT)")).as("hi"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    SparkEntry.queries("q194_ewma_dyadic")(spark, sf).collect().foreach { r =>
      val (lo, hi) = bounds(r.getLong(0))
      val e = r.getLong(3)
      // truncating division can land 1 micro under the true convex value
      assert(e >= lo - 1 && e <= hi,
        s"EWMA $e outside the user's value range [$lo, $hi]")
    }
  }

  test("q196 Gini stays inside [0, 1e6) for every nation") {
    SparkEntry.queries("q196_gini_supplier")(spark, sf).collect().foreach { r =>
      val g = r.getLong(3)
      assert(g >= 0L && g < 1000000L, s"Gini ppm $g out of range")
    }
  }

  test("q201 confusion cells partition the corpus; marginals bound at 1e6") {
    val rows = SparkEntry.queries("q201_langid_eval")(spark, sf).collect()
    val total = rows.map(_.getLong(2)).sum
    assert(total === Tables.documents(spark, sf).count(),
      "every document lands in exactly one confusion cell")
    // row-normalized shares per true lang sum to 1e6 within truncation slack
    rows.groupBy(_.getString(0)).foreach { case (lang, cells) =>
      val s = cells.map(_.getLong(3)).sum
      assert(s <= 1000000L && s > 1000000L - cells.length,
        s"recall shares for $lang sum to $s")
    }
  }

  test("q203 shares sum to the whole at every hierarchy level") {
    val rows = SparkEntry.queries("q203_hierarchy_share")(spark, sf).collect()
    rows.groupBy(_.getString(0)).foreach { case (region, nations) =>
      val s = nations.map(_.getLong(3)).sum
      assert(s <= 1000000L && s > 1000000L - nations.length,
        s"nation shares of $region sum to $s")
    }
    val regions = rows.map(r => r.getString(0) -> r.getLong(4)).distinct
    val s = regions.map(_._2).sum
    assert(s <= 1000000L && s > 1000000L - regions.length,
      s"region shares sum to $s")
  }

  test("q205 cumulative LTV per user never decreases within a cohort") {
    SparkEntry.queries("q205_ltv_curve")(spark, sf).collect()
      .groupBy(_.getDate(0)).foreach { case (_, rows) =>
        val curve = rows.sortBy(_.getLong(1)).map(_.getLong(4))
        assert(curve.zip(curve.tail).forall { case (a, b) => a <= b },
          "purchase micros are non-negative, so the running sum is monotone")
      }
  }

  test("q206 winsorized mean lies within the caps and clipping is bounded") {
    SparkEntry.queries("q206_winsorized_stats")(spark, sf).collect().foreach { r =>
      val (n, lo, hi, mean, clipped) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(lo <= hi, "cap order")
      assert(mean >= lo && mean <= hi,
        "a mean of values clamped into [lo, hi] stays inside it")
      // at most ~5% below p05 and ~5% above p95 (ties can only reduce it)
      assert(clipped <= n / 10 + 2, s"clipped $clipped of $n exceeds the band")
    }
  }

  test("q208 verdicts match ground truth: keys hold, non-keys are violated") {
    val m = SparkEntry.queries("q208_fd_discovery")(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getInt(3), r.getLong(4))).toMap
    assert(m("supplier.suppkey->nationkey") === ((1, 0L)),
      "a primary key determines every column")
    assert(m("orders.custkey->priority")._1 === 0,
      "a repeat customer orders at more than one priority")
    m.values.foreach { case (h, v) =>
      assert(if (h == 1) v == 0L else v > 0L,
        "holds flag must agree with the violation mass")
    }
  }

  test("q215 Count-Min never underestimates (one-sided error bound)") {
    SparkEntry.queries("q215_countmin_estimate")(spark, sf).collect().foreach { r =>
      assert(r.getLong(2) >= r.getLong(1),
        s"CMS estimate below exact count for '${r.getString(0)}'")
      assert(r.getLong(3) === r.getLong(2) - r.getLong(1))
    }
  }

  test("q216 r-squared stays within [0, 1] up to pre-scaling truncation") {
    SparkEntry.queries("q216_correlated_dims")(spark, sf).collect().foreach { r =>
      val r2 = r.getLong(3)
      assert(r2 >= 0L && r2 <= 1050000L,
        s"r2_ppm $r2 outside the unit interval for pair " +
          s"(${r.getLong(0)}, ${r.getLong(1)})")
    }
  }

  test("q217 l stays within the band count and coverage sums to ~1e6") {
    val rows = SparkEntry.queries("q217_l_diversity")(spark, sf).collect()
    rows.foreach { r =>
      assert(r.getLong(0) >= 1L && r.getLong(0) <= 4L,
        "distinct sensitive values per class bounded by the 4 bands")
    }
    val s = rows.map(_.getLong(3)).sum
    assert(s <= 1000000L && s > 1000000L - rows.length,
      s"class coverage shares sum to $s")
  }

  test("q209 RRF scores recompute exactly from the two rank columns") {
    SparkEntry.queries("q209_hybrid_rrf")(spark, sf).collect().foreach { r =>
      val (bm, cos, rrf) = (r.getLong(1), r.getLong(2), r.getLong(3))
      val expect = (if (bm > 0) 1000000L / (60 + bm) else 0L) +
        (if (cos > 0) 1000000L / (60 + cos) else 0L)
      assert(rrf === expect, s"RRF mismatch for doc ${r.getLong(0)}")
      assert(bm >= 0 && bm <= 30 && cos >= 0 && cos <= 30)
      assert(bm > 0 || cos > 0, "a fused row must come from at least one arm")
    }
  }

  test("q244 conserves corpus mass, agrees with q97, and caps multiplicity at 4") {
    val rows = SparkEntry.queries("q244_softdedup_multiplicity")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))

    // every document lands in exactly one cluster (singletons included)
    assert(rows.map(_._3).sum === Tables.documents(spark, sf).count(),
      "sum of cluster sizes must equal the corpus")
    assert(rows.map(_._1).distinct.length === rows.length, "one row per cluster")

    // cap + ppm laws hold row by row
    rows.foreach { case (cid, _, n, rep, ppm) =>
      assert(rep === math.min(n, 4L), s"cluster $cid repeat_n")
      assert(ppm === (1000000L * math.min(n, 4L)) / n, s"cluster $cid keep_ppm")
    }

    // the multi-member clusters are exactly q97's, with the same canonical
    val q97 = SparkEntry.queries("q97_cluster_canonical")(spark, sf)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val multi = rows.filter(_._3 > 1)
    assert(multi.map(_._1).toSet === q97.keySet,
      "q244's multi-member clusters must be q97's clusters")
    multi.foreach { case (cid, keep, n, _, _) =>
      assert(q97(cid) === ((keep, n)), s"cluster $cid disagrees with q97")
    }

    // the 4-epoch cap must be LIVE: a 6-copy boilerplate family trains 4x
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_softdedup").toString
    val text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    (0L until 6L).map(i => (i, text, "en", "src0", text.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val capped = SparkEntry.queries("q244_softdedup_multiplicity")(spark, dir)
      .collect()
    assert(capped.length === 1 && capped.head.getLong(2) === 6L &&
      capped.head.getLong(3) === 4L && capped.head.getLong(4) === 666666L,
      "a 6-identical-doc cluster must cap at repeat_n = 4, keep_ppm = 666666")
  }
}
