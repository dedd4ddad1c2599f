package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Plan-level assertions for the 100 TB design claims: bucketed co-located
  * joins must not shuffle, and partition/filter pruning must reach the scan.
  * These inspect the physical plan — they fail if a future change silently
  * reintroduces an exchange or defeats pushdown.
  */
class ScaleDesignSpec extends SparkSpec {

  private def physicalPlan(df: org.apache.spark.sql.DataFrame): String = {
    val out = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(out)) { df.explain("formatted") }
    out.toString
  }

  test("bucketed tables join without any shuffle exchange") {
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")
    Tables.orders(spark, sf).write
      .bucketBy(8, "o_custkey").sortBy("o_custkey").saveAsTable("b_orders")
    Tables.customer(spark, sf).write
      .bucketBy(8, "c_custkey").sortBy("c_custkey").saveAsTable("b_customer")
    // disable broadcast so the join would shuffle if bucketing didn't align
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val j = spark.table("b_orders")
        .join(spark.table("b_customer"), col("o_custkey") === col("c_custkey"))
      val plan = physicalPlan(j)
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join should be exchange-free:\n$plan")
      assert(j.count() > 0)
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_customer")
    }
  }

  test("partition pruning: only the selected date partition is scanned") {
    val dir = Files.createTempDirectory("graft-part").toString + "/events_by_type"
    Tables.events(spark, sf)
      .write.partitionBy("event_type").parquet(dir)
    val pruned = spark.read.parquet(dir).filter(col("event_type") === "view")
    val plan = physicalPlan(pruned)
    // the scan's partition filters must carry the predicate
    assert(plan.contains("PartitionFilters") && plan.contains("event_type"),
      s"expected partition filter in scan:\n$plan")
    val expected = Tables.events(spark, sf).filter(col("event_type") === "view").count()
    assert(pruned.count() === expected)
  }

  test("q112: the pruned read lists only the two matching lang directories") {
    val staged = operators.RelationalQueries.partitionedDocs(spark, sf)
    val pruned = spark.read
      .schema("doc_id BIGINT, text STRING, source STRING, n_chars BIGINT, lang STRING")
      .parquet(staged)
      .filter(col("lang").isin("de", "fr"))
    // file-level: every file the executed scan actually read must live
    // under a matching partition dir — pruning happened at listing time
    // (inputFiles on the unexecuted frame reports the relation pre-pruning,
    // so ask the executed plan which files fed rows instead)
    val files = pruned.select(input_file_name()).distinct()
      .collect().map(_.getString(0))
    assert(files.nonEmpty)
    assert(files.forall(f => f.contains("lang=de") || f.contains("lang=fr")),
      s"non-matching partition scanned:\n${files.mkString("\n")}")
  }

  test("AQE splits a skewed join partition at runtime (no manual salt needed)") {
    // one key carries ~half the fact rows — the classic skew that stalls a
    // sort-merge join on a single straggler task. With AQE skew handling on
    // (thresholds lowered to trip at test scale), the FINAL adaptive plan
    // must mark the skewed side as split: salting (q59) is the engine's
    // static answer, this pins the runtime one.
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.adaptive.enabled", "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.autoBroadcastJoinThreshold")
      .map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set("spark.sql.adaptive.enabled", "true")
      conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      // sf0.01: the skewed partition must clear the (lowered) byte
      // thresholds with margin — at sf0.001 all partitions are noise-sized
      val sfSkew = "/root/testdata/sf0.01"
      // LESSON (pinned by this test): AQE splits a skewed reduce partition
      // at MAP-OUTPUT granularity. A small table scanned as ONE map task
      // makes the skewed partition one atomic block — unsplittable, and
      // the rule silently declines. The upstream repartition(16) gives the
      // join shuffle 16 map segments per reduce partition; at 100 TB map
      // tasks are plentiful and this precondition holds by construction.
      val skewed = Tables.lineitem(spark, sfSkew)
        .repartition(16)
        .select(when(col("l_orderkey") % 2 === 0, 0L)
          .otherwise(col("l_orderkey")).as("k"), col("l_extendedprice"))
      val dim = Tables.orders(spark, sfSkew)
        .select(col("o_orderkey").as("k"), col("o_totalprice"))
      val joined = skewed.join(dim, "k")
      // collect() drives THIS frame's queryExecution (count() would plan a
      // separate aggregate query and leave this one un-executed)
      assert(joined.collect().nonEmpty)
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        s"AQE did not split the skewed partition:\n$finalPlan")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }

  test("sortWithinPartitions orders every partition without a global shuffle") {
    val df = Tables.lineitem(spark, sf)
      .repartition(4, col("l_suppkey"))
      .sortWithinPartitions("l_extendedprice")
    val plan = physicalPlan(df)
    assert(!plan.contains("Exchange rangepartitioning"),
      "local sort must not plan a global range exchange")
    import org.apache.spark.sql.Row
    val ok = df.select("l_extendedprice").rdd
      .mapPartitions { it =>
        val prices = it.map(_.getDouble(0)).toArray
        Iterator.single(prices.sameElements(prices.sorted))
      }.collect()
    assert(ok.forall(identity), "each partition must be internally sorted")
  }

  test("q145 vocab lands via partial top-K, not a global token sort") {
    val plan = physicalPlan(SparkEntry.queries("q145_vocab_oov_gate")(spark, sf))
    // TakeOrdered = per-partition top-K partials + single small reduce; a
    // Sort + GlobalLimit pair here would mean a full token-count sort
    assert(plan.contains("TakeOrderedAndProject"),
      s"vocab top-K must be TakeOrdered (per-partition partials):\n$plan")
    assert(!plan.contains("GlobalLimit"),
      s"no global sort+limit may feed the vocabulary:\n$plan")
  }

  test("q149 projection is row-local: no exchange before the presentation sort") {
    val df = SparkEntry.queries("q149_random_projection")(spark, sf)
    // the EXECUTABLE plan (exchanges only exist after EnsureRequirements)
    // may carry exactly the final orderBy's range exchange — any hash or
    // single-partition exchange means the projection stopped being pure
    // map work (the plane matrix is a plan literal, never a join input)
    val plan = physicalPlan(df)
    assert(!plan.contains("hashpartitioning") && !plan.contains("SinglePartition"),
      s"projection must not shuffle beyond the presentation sort:\n$plan")
    assert(!plan.contains("Join"), "projection must not join")
  }

  test("q184 basket affinity reads the fact exactly once (single-scan token stream)") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val df = SparkEntry.queries("q184_basket_affinity")(spark, sf)
    val lineitemScans = df.queryExecution.sparkPlan.collect {
      case sc: FileSourceScanExec
        if sc.relation.location.rootPaths.exists(_.toString.contains("lineitem")) => sc
    }
    // the round-4 lesson: the pair self-join formulation scanned lineitem
    // FOUR times (group-key filter pushdown below each branch's exchange
    // defeats ReuseExchange); the token-stream rewrite must keep it at one
    assert(lineitemScans.size === 1,
      s"basket affinity re-reads the fact ${lineitemScans.size}x:\n" +
        df.queryExecution.sparkPlan)
    // and pair generation must be codegen Generates, not HOF lambdas
    assert(!df.queryExecution.optimizedPlan.toString.contains("lambdafunction"),
      "pair fan-out regressed to higher-order-function lambdas (20x slower)")
  }

  test("q215 Count-Min hashes distinct tokens, never the occurrence stream") {
    val df = SparkEntry.queries("q215_countmin_estimate")(spark, sf)
    val plan = df.queryExecution.optimizedPlan.toString
    // combine-before-hash: the base-31 fold (an aggregate HOF over the
    // token characters) must sit ABOVE a count aggregate in every branch —
    // i.e. no Generate(explode of the 4 hash structs) directly over the
    // raw token explode without an intervening Aggregate
    val gens = df.queryExecution.optimizedPlan.collect {
      case g: org.apache.spark.sql.catalyst.plans.logical.Generate
        if g.child.collectFirst {
          case _: org.apache.spark.sql.catalyst.plans.logical.Aggregate => ()
        }.isEmpty && g.toString.contains("row_i") => g
    }
    assert(gens.isEmpty,
      s"CMS cell fan-out runs below the token-count aggregate:\n$plan")
  }

  test("q42 exact cosine dedup plans a tiled equi-join, not a nested-loop product") {
    val plan = physicalPlan(SparkEntry.queries("q42_dedup_embedding_cosine")(spark, sf))
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"exact cosine join must stay an equi-join on tile keys:\n$plan")
  }

  test("q50 wire-framed replication plan has no UDF serialization boundary") {
    val plan = physicalPlan(SparkEntry.queries("q50_replication_project")(spark, sf))
    assert(plan.contains("graft_to_avro_wire") && plan.contains("graft_from_avro_wire"),
      s"q50 must exercise the wire framing path:\n$plan")
    assert(!plan.contains("UDF"), s"R7 hot path must be expression-only:\n$plan")
  }

  test("shingle pipelines build the token-hash array exactly once (no inlined re-splits)") {
    // Regression guard for the two plan poisons found in round 2: alias
    // inlining across element_at sites, and InferFiltersFromGenerate
    // pushing generator-derived predicates below staged projections — both
    // show up as the tokenizer appearing multiple times in the plan.
    Seq("q39_dedup_minhash_lsh", "q41_dedup_ngram_jaccard").foreach { q =>
      val plan = physicalPlan(SparkEntry.queries(q)(spark, sf))
      // count DOC tokenizations (split of the lowered text column); q39's
      // replayable token fold legitimately char-splits each token INSIDE
      // the one tokenize pass, which the old "transform(split" count would
      // miscount as a re-tokenization
      val n = "transform\\(split\\(lower".r.findAllIn(plan).size
      assert(n <= 1, s"$q tokenizes ${n}x — a filter or alias is re-inlining the build:\n$plan")
    }
    val p39 = physicalPlan(SparkEntry.queries("q39_dedup_minhash_lsh")(spark, sf))
    assert(p39.contains("graft_minhash_array"),
      "q39 signatures must be row-local (scalar sketch, no explode+agg)")
    // the signature-agreement score runs once per CANDIDATE PAIR — it must
    // be the native codegen count, never the interpreted zip_with fold
    assert(p39.contains("graft_eq_count") && !p39.toLowerCase.contains("zip_with"),
      s"q39 must score signature agreement with graft_eq_count:\n$p39")
    // q252's byte twin of the same poison: the payload shingle build must
    // appear EXACTLY once — a filter or alias re-inlining the build turns
    // the O(L) native pass back into O(L·sites) work per row (the defect
    // that cost 229 s at sf0.1 in round 10's HOF form).
    val p252 = physicalPlan(SparkEntry.queries("q252_media_simhash_neardup")(spark, sf))
    val n252 = "graft_byte_shingles".r.findAllIn(p252).size
    assert(n252 == 1,
      s"q252 builds the byte-shingle array ${n252}x (want exactly 1):\n$p252")
    assert(!p252.contains("split(hex"),
      s"q252 must not take the hex-string detour on the Spark side:\n$p252")
    // The CDC family walks payloads with the same one-pass kernel class;
    // its pairing is the bucket-local collect_list expansion. Sizes come
    // from the STAGED doc-grain census (r17): a sizes join against an
    // unstaged branch would silently rebuild the whole chunk stream per
    // branch (q253 measured 4 scans and q275 13 before this shape), but
    // a checkpoint-scan census carries no kernel to rebuild — so the
    // walk counts in the consuming plans tightened (q275: exact side +
    // shipped grading side; q276: exact side only).
    Seq(("q253_media_cdc_containment", 1),
        ("q275_cdc_recall_eval", 2),
        ("q276_cdc_cap_dial", 1)).foreach { case (q, want) =>
      val p = physicalPlan(SparkEntry.queries(q)(spark, sf))
      val n = "graft_cdc_chunks".r.findAllIn(p).size
      assert(n <= want,
        s"$q builds the chunk stream ${n}x (want <= $want):\n$p")
      assert(!p.contains("split(hex"),
        s"$q must not take the hex-string detour on the Spark side:\n$p")
    }
    // the rolling-window family: q277's one global shuffle must hash the
    // window build exactly once (its first form referenced the spans frame
    // twice and the optimizer duplicated the entire window-dedup pipeline
    // under each consumer); q278's two builds are the irreducible
    // independent consumers (broadcast eval set + train stream off one
    // scan)
    Seq(("q277_duplicate_span_extraction", 1),
        ("q278_contamination_runs", 2)).foreach { case (q, want) =>
      val p = physicalPlan(SparkEntry.queries(q)(spark, sf))
      val n = "xxhash64\\(concat_ws".r.findAllIn(p).size
      assert(n <= want,
        s"$q builds the rolling-window stream ${n}x (want <= $want):\n$p")
    }
    // q260 composes BOTH shingle sources: each must still build exactly once
    val p260 = physicalPlan(
      SparkEntry.queries("q260_crossmodal_dedup_consensus")(spark, sf))
    val t260 = "transform\\(split\\(lower".r.findAllIn(p260).size
    val b260 = "graft_byte_shingles".r.findAllIn(p260).size
    assert(t260 <= 1 && b260 == 1,
      s"q260 re-inlines a shingle build (text=$t260, byte=$b260):\n$p260")
    // The scoreboards self-join the signature frame, which makes
    // InferFiltersFromConstraints copy the signature expression into
    // isnotnull scan conditions. With the declarative HOF build that copy
    // is alias-FLATTENED — the token-hash array re-inlined at every
    // element_at site, O(tokens²) per row (58 s at sf0.1 for q262). The
    // text shingle build must therefore be the native one-pass kernel
    // everywhere a signature frame can feed a join, and the HOF form must
    // never appear in these plans at all.
    Seq("q39_dedup_minhash_lsh", "q40_dedup_simhash").foreach { q =>
      val p = physicalPlan(SparkEntry.queries(q)(spark, sf))
      assert(p.contains("graft_token_shingles"),
        s"$q must build text shingles with the native one-pass kernel:\n$p")
      assert(!p.contains("transform(split(lower"),
        s"$q re-introduces the HOF shingle pipeline (the inference-copy poison):\n$p")
    }
    // The scoreboards (r16 optimization) STAGE their signature frame —
    // materialize-once, the q109 rule — so their join plans read the
    // staged scan and the signature build lives in the frame's own plan:
    // the kernel rule is asserted there, and the no-HOF guard stays on
    // the full query plan (staging makes the inference-copy poison
    // structurally impossible — a checkpoint scan carries no expression
    // to copy).
    Seq("q261_minhash_recall_eval", "q262_simhash_recall_eval").foreach { q =>
      val p = physicalPlan(SparkEntry.queries(q)(spark, sf))
      assert(!p.contains("transform(split(lower"),
        s"$q re-introduces the HOF shingle pipeline (the inference-copy poison):\n$p")
    }
    val pSig = physicalPlan(operators.DedupQueries.textSimhashSigs(spark, sf))
    assert(pSig.contains("graft_token_shingles") &&
      !pSig.contains("transform(split(lower"),
      s"the signature frame must build text shingles with the native kernel:\n$pSig")
    // The MinHash signature frame (staged by q273/q274/q290 — a checkpoint
    // scan carries no expression, so the kernel rule must be asserted on
    // the frame's OWN plan, as for textSimhashSigs above).
    val pMhSig = physicalPlan(operators.DedupQueries.minhashSignatures(spark, sf))
    assert(pMhSig.contains("graft_token_shingles") &&
      !pMhSig.contains("transform(split(lower"),
      s"the MinHash signature frame must use the native shingle kernel:\n$pMhSig")
    // q41's exact-Jaccard prep is the xxhash64 sibling — same kernel rule.
    // The query itself stages its bucket frame (r16), so the kernel is
    // asserted on the bucket build's own plan; the no-HOF guard stays on
    // the full query plan.
    val p41 = physicalPlan(SparkEntry.queries("q41_dedup_ngram_jaccard")(spark, sf))
    assert(!p41.contains("transform(split(lower"),
      s"q41 re-introduces the HOF shingle pipeline:\n$p41")
    val p41b = physicalPlan(operators.DedupQueries.jaccardBuckets(spark, sf))
    assert(p41b.contains("graft_xxh_token_shingles") &&
      !p41b.contains("transform(split(lower"),
      s"q41's bucket build must use the native xxhash shingle kernel:\n$p41b")
  }

  test("ANN hot paths score with native kernels and prune with the bounded heap aggregate") {
    // Round-12 regression guards for the join-sized HOF poison: the PQ
    // codebook-assignment L2 and the SQ8 candidate scores are interpreted
    // aggregate(zip_with(…)) closures if anything re-introduces the
    // declarative form — measured as the WHOLE of q236's cost at 10×
    // sf0.1 (jstack: all samples in ZipWith.eval). And the candidate
    // prune must be the k-bounded graft_top_pairs heap (O(n) streaming,
    // map-side partials), never a row_number window that full-sorts the
    // N·Q candidate stream.
    Seq("q236_pq_ann", "q249_ivfpq_ann").foreach { q =>
      val p = physicalPlan(SparkEntry.queries(q)(spark, sf))
      assert(p.contains("graft_sqdist"),
        s"$q must assign codes with the native squared-L2 kernel:\n$p")
      assert(p.contains("graft_top_pairs"),
        s"$q must prune candidates with the bounded heap aggregate:\n$p")
      assert(!p.toLowerCase.contains("zip_with"),
        s"$q re-introduces an interpreted HOF on the hot path:\n$p")
    }
    val p130 = physicalPlan(SparkEntry.queries("q130_quantized_ann")(spark, sf))
    assert(p130.contains("graft_dotl") && p130.contains("graft_top_pairs") &&
      !p130.toLowerCase.contains("zip_with"),
      s"q130 must score with graft_dotl and prune with graft_top_pairs:\n$p130")
    // the heap aggregate must plan as ObjectHashAggregate — a silent
    // sort-based fallback (the 128-group default threshold) would pay the
    // very sort the heap exists to avoid; GraftSession raises the
    // threshold and this pins that it holds where it matters
    val p236 = physicalPlan(SparkEntry.queries("q236_pq_ann")(spark, sf))
    assert(p236.contains("ObjectHashAggregate"),
      s"graft_top_pairs must aggregate object-hash, not sort-based:\n$p236")
    // The nearest-centroid assignment is the same class of defect from the
    // other direction: a min_by/max(struct) argmax carries a struct-typed
    // aggregation buffer, which HashAggregate cannot hold — Spark silently
    // plans a SortAggregate that full-sorts the n×C assignment join (4–6 s
    // of every assignment-shaped query at 10× sf0.1). The k=1 heap is the
    // same winner without the sort; no SortAggregate may appear anywhere
    // in the IVF pipeline.
    val p66 = physicalPlan(SparkEntry.queries("q66_knn_ivf")(spark, sf))
    assert(p66.contains("graft_top_pairs"),
      s"q66 must assign cells with the k=1 heap argmax:\n$p66")
    assert(!p66.contains("SortAggregate"),
      s"q66 re-introduces a struct-buffer SortAggregate on the assignment join:\n$p66")
    // q149's projection must be the one fused kernel pass, not the
    // CodegenFallback lambda chain over a literal plane matrix
    val p149 = physicalPlan(SparkEntry.queries("q149_random_projection")(spark, sf))
    assert(p149.contains("graft_project") && !p149.toLowerCase.contains("zip_with"),
      s"q149 must project through the fused graft_project kernel:\n$p149")
  }

  test("catalog sweep: no plan contains a scale-killer, no job during construction") {
    import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
    import org.apache.spark.sql.catalyst.expressions.ScalaUDF
    import org.apache.spark.sql.execution.SortExec
    // Nested-loop joins are judged by SHAPE, not by name: a
    // BroadcastNestedLoopJoin / CartesianProduct is sanctioned iff one side
    // is STRUCTURALLY bounded — its subtree proves a constant row count
    // (global aggregate -> 1 row, literal table -> its size, limit -> k,
    // products/unions of those). A new 1-row-broadcast query is then
    // auto-checked instead of auto-excused, and a fact-sized cross join can
    // never hide behind a whitelist entry. The bound deliberately ignores
    // runtime statistics: it must hold at ANY scale factor, which is
    // exactly the 100 TB question.
    import org.apache.spark.sql.catalyst.plans.{LeftAnti, LeftSemi}
    import org.apache.spark.sql.execution.{ExpandExec, GenerateExec,
      GlobalLimitExec, LocalTableScanExec, RangeExec, SparkPlan,
      TakeOrderedAndProjectExec, UnionExec}
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    import org.apache.spark.sql.execution.joins.{BaseJoinExec,
      BroadcastNestedLoopJoinExec, CartesianProductExec}

    def rowBound(p: SparkPlan): Option[Long] = p match {
      case a: BaseAggregateExec =>
        if (a.groupingExpressions.isEmpty) Some(1L) else None
      case l: LocalTableScanExec => Some(l.rows.length.toLong)
      case g: GlobalLimitExec => Some(g.limit.toLong)
      case t: TakeOrderedAndProjectExec => Some(t.limit.toLong)
      case r: RangeExec => Some(r.numElements.toLong)
      case e: ExpandExec => rowBound(e.child).map(_ * e.projections.length)
      case u: UnionExec =>
        val bs = u.children.map(rowBound)
        if (bs.forall(_.isDefined)) Some(bs.flatten.sum) else None
      case j: BaseJoinExec => j.joinType match {
        case LeftSemi | LeftAnti => rowBound(j.left)
        case _ =>
          for (a <- rowBound(j.left); b <- rowBound(j.right)) yield a * b
      }
      case _: GenerateExec => None // row fan-out breaks any child bound
      case _ if p.children.length == 1 => rowBound(p.children.head)
      case _ => None
    }

    // The only non-structural exceptions: sides bounded by CONSTRUCTION
    // (a fixed-rate hash sample or a trained artifact behind an RDD scan),
    // which no plan-shape analysis can see. Each entry names its bound.
    val sampleBroadcastOk = Map(
      "q43_knn_bruteforce" ->
        "2% hash-sampled query side; O(n*q) IS the brute-force contract",
      "q130_quantized_ann" -> "q43's hash-sampled broadcast query side",
      "q66_knn_ivf" -> "~2% hash-sampled centroid side, collapsed map-side",
      "q86_kmeans_train" ->
        "k=8 trained centroids behind localCheckpoint's RDD scan",
      "q146_hard_negatives" -> "q43's hash-sampled broadcast anchor scan",
      "q173_contrastive_pairs" -> "q43's hash-sampled broadcast anchor set",
      "q230_semdedup" -> "q66's ~2% LCG-sampled centroid side, collapsed map-side",
      "q232_prototypicality_prune" -> "q66's ~2% LCG-sampled centroid side",
      "q234_incremental_semdedup" -> "frozen trained-centroid side (q66's rule over the existing corpus)",
      "q236_pq_ann" -> ("q43's 2% hash-sampled broadcast query side (ADC " +
        "scan) and q66's ~3% LCG-sampled codebook side (assignment)"),
      "q241_ivf_drift_audit" -> "q66's ~2% LCG-sampled centroid side, collapsed map-side",
      "q246_ann_recall_eval" ->
        "q43's + q66's hash-sampled broadcast sides (the eval runs both pipelines it grades)",
      "q247_pq_recall_eval" ->
        "q43's + q236's hash-sampled broadcast sides (the eval runs both pipelines it grades)",
      "q248_lsh_recall_eval" ->
        "q43's + q44's hash-sampled broadcast sides (the eval runs both pipelines it grades)",
      "q249_ivfpq_ann" -> ("q66's ~2% LCG-sampled centroid side (cell " +
        "assignment + query routing) and ~3% LCG-sampled codebook side " +
        "(code build); the ADC scan itself is the cent_id equi-join the " +
        "dedicated ivfpq plan test pins"),
      "q250_ivfpq_recall_eval" ->
        "q43's + q249's hash-sampled broadcast sides (the eval runs both pipelines it grades)",
      "q279_pq_ann_fixed" -> ("q236's shape under the fixed dials: the " +
        "≤64-absolute-id panel broadcast (flat ADC scan IS the PQ " +
        "contract) and the ≤256-entry capped codebook side"),
      "q280_ivfpq_ann_fixed" -> ("⌊√n⌋ LCG-sampled centroid side " +
        "(assignment + routing) and the ≤256-entry capped codebook side; " +
        "the ADC scan itself is the broadcast cent_id equi-join the " +
        "fixed-form plan test pins"),
      "q281_ivfpq_index_serve" -> ("the installed pillar's ⌊√n⌋ centroid " +
        "and ≤256-entry codebook frames broadcast for query routing/LUTs " +
        "— pillar-sized artifacts, the codes themselves meet the qside " +
        "in the stored-scan cent_id equi-join"),
      "q295_release_pinned_pq_serve" -> ("q281's exact serve plan reached " +
        "through the release pin — same pillar-sized centroid/codebook " +
        "broadcasts, same stored-scan cent_id equi-join; the release " +
        "resolution is driver-side NIO and never appears in the plan"),
      "q251_probe_depth_calibration" ->
        ("q43's + q66's hash/LCG-sampled broadcast sides: the dial sweeps " +
          "the already-sanctioned ivfTopK pipeline at each candidate depth " +
          "and grades it against the exact panel, so it plans exactly the " +
          "sampled-side BNLJs of q246, once per depth"),
      "q255_filtered_knn_ivf" ->
        ("q66's ~2% LCG-sampled centroid side (assignment + routing) plus " +
          "the 2% hash-sampled query-label broadcast; the label predicate " +
          "only FILTERS the sanctioned candidate equi-join"),
      "q256_filtered_recall_eval" ->
        ("q43's + q255's hash/LCG-sampled broadcast sides (the eval runs " +
          "both pipelines it grades; the exact side is the label-filtered " +
          "brute scan over the same 2% panel)"),
      "q258_filter_strategy_router" ->
        ("q255's sampled broadcast sides feeding the supply count; the " +
          "router's own frame is one row per panel query"),
      "q259_adaptive_filtered_knn" ->
        ("q255's + q256's sampled broadcast sides: the hybrid runs the " +
          "post-filter candidate scan and, for starved queries only, the " +
          "label-filtered brute scan over the same 2% panel"))

    val SmallSide = 128L
    def nestedLoopProblems(name: String, physical: SparkPlan): Seq[String] =
      physical.collect {
        case j: BroadcastNestedLoopJoinExec => (j: SparkPlan, j.left, j.right)
        case j: CartesianProductExec => (j: SparkPlan, j.left, j.right)
      }.flatMap { case (j, l, r) =>
        val bounded = Seq(l, r).flatMap(rowBound).exists(_ <= SmallSide)
        if (bounded || sampleBroadcastOk.contains(name)) None
        else Some(s"$name: ${j.nodeName} with no structurally bounded side " +
          s"(left=${rowBound(l)}, right=${rowBound(r)})")
      }

    val udfOk = Set("q63_scalar_udf")
    // Warm Tables' schema cache: the FIRST read of each table legitimately
    // pays one schema-inference job; after that, plan construction must be
    // job-free (explicit cached schemas, footer-based index sizing).
    Seq[(org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame](
      Tables.region, Tables.nation, Tables.customer, Tables.supplier,
      Tables.part, Tables.orders, Tables.lineitem, Tables.documents,
      Tables.embeddings, Tables.events).foreach(t => t(spark, sf).schema)
    // q78/q79/q112/q140/q224 stage their JSON/CSV/partitioned-parquet/text/
    // ORC sink on first construction (a one-time memoized write — the
    // round-trip IS the semantics); steady-state re-construction must still
    // be job-free.
    Seq("q78_json_roundtrip", "q79_csv_roundtrip", "q112_partitioned_prune",
      "q140_text_roundtrip", "q224_orc_roundtrip", "q225_avro_ocf_roundtrip",
      // q281 installs its PQ-index pillar on first construction (the same
      // memoized one-time staging); steady-state serving is job-free —
      // as do the four stored-postings pillars (q283-q286)
      "q281_ivfpq_index_serve", "q283_simhash_postings_serve",
      "q284_minhash_postings_serve", "q285_lsh_postings_serve",
      "q286_cdc_postings_serve", "q289_simhash_batch_admit",
      "q290_minhash_batch_admit", "q291_lsh_batch_admit",
      "q292_cdc_batch_admit", "q293_lsh_guarded_serve",
      "q294_simhash_lifecycle_serve", "q295_release_pinned_pq_serve",
      "q296_crossmodal_release_consensus")
      .foreach(q => SparkEntry.queries(q)(spark, sf))
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = jobs.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(listener)
    val problems = scala.collection.mutable.Buffer.empty[String]
    // q81/q86 are the iterative fixed-point operators: their rounds and
    // convergence probes are actions by design (label propagation / Lloyd's
    // cannot be a single declarative plan). They run in a separate pass
    // AFTER the listener detaches — listener events arrive on an async bus,
    // so counting around them per-query would mis-attribute late events to
    // neighboring queries and flake.
    val iterativeOk =
      Set("q81_dedup_clusters", "q86_kmeans_train", "q97_cluster_canonical",
        "q102_pagerank", "q107_bpe_train", "q109_triangle_count",
        // encode shares q107's memoized training run (actions if cold)
        "q117_bpe_encode",
        // materializes the edge list once before the hop joins (q109's rule)
        "q129_khop_neighborhood",
        // consume the memoized connected-components labels (actions if cold)
        "q137_cluster_terms", "q142_leakage_safe_split",
        "q244_softdedup_multiplicity")
    // r16 optimization: these queries STAGE a multiply-consumed derived
    // stream (signature frame, gram stream, bucket frame, ranked top-k)
    // once at construction — the q109 materialize-once rule extended to
    // the dial/scoreboard/batch-admit family, each swap A/B-measured in
    // OPTIMIZATION_r16.md. Their construction runs the staging jobs by
    // design; the plan-shape checks still apply (second pass below).
    val stagedOk =
      Set("q41_dedup_ngram_jaccard", "q99_bigram_novelty",
        "q231_dsir_importance", "q239_perplexity_buckets",
        "q239b_perplexity_buckets_hist", "q259_adaptive_filtered_knn",
        "q261_minhash_recall_eval", "q272_minhash_recall_eval_abs",
        "q262_simhash_recall_eval", "q263_media_simhash_recall_eval",
        "q265_bucket_cap_dial", "q266_media_cap_dial",
        "q251_probe_depth_calibration",
        "q273_minhash_cap_dial", "q274_minhash_cap_dial_abs",
        "q289_simhash_batch_admit", "q290_minhash_batch_admit",
        "q291_lsh_batch_admit", "q292_cdc_batch_admit",
        // r17: the CDC scoreboard/dial stage their doc-grain size census
        "q275_cdc_recall_eval", "q276_cdc_cap_dial")
    val (iterative, declarative) =
      SparkEntry.catalog.partition(q => iterativeOk(q.name) || stagedOk(q.name))
    try {
      declarative.foreach { q =>
        val df = q.run(spark, sf)
        val physical = df.queryExecution.sparkPlan
        val planStr = physical.toString
        problems ++= nestedLoopProblems(q.name, physical)
        val hasUdf = df.queryExecution.optimizedPlan.collect {
          case p if p.expressions.exists(_.collect { case u: ScalaUDF => u }.nonEmpty) => p
        }.nonEmpty
        if (!udfOk(q.name) && hasUdf)
          problems += s"${q.name}: ScalaUDF outside the sanctioned escape hatch"
        // one global Sort is the presentation orderBy every oracle query
        // ends with; a second means an interior global sort feeding another
        // operator — a scale bug (SMJ/Window sorts are per-partition and
        // don't count; sort+limit fuses to TakeOrderedAndProject)
        val globalSorts = physical.collect { case s: SortExec if s.global => s }
        if (globalSorts.size > 1)
          problems += s"${q.name}: ${globalSorts.size} global sorts (interior sort before sink)"
      }
    } finally {
      Thread.sleep(500) // listener bus drain
      spark.sparkContext.removeSparkListener(listener)
    }
    // q42/q67 size their indexes from parquet FOOTERS — building every
    // declarative plan must not launch a single Spark job (a .count() here
    // would run on every explain/bench/plan-cache rebuild at 100 TB)
    assert(jobs.get() == 0,
      s"declarative plan construction launched ${jobs.get()} Spark jobs")
    // second pass, listener detached: the iterative operators still get the
    // plan-shape checks on their final (post-fixed-point) DataFrames
    iterative.foreach { q =>
      val df = q.run(spark, sf)
      val physical = df.queryExecution.sparkPlan
      val planStr = physical.toString
      problems ++= nestedLoopProblems(q.name, physical)
      if (df.queryExecution.optimizedPlan.collect {
            case p if p.expressions.exists(_.collect { case u: ScalaUDF => u }.nonEmpty) => p
          }.nonEmpty)
        problems += s"${q.name}: ScalaUDF outside the sanctioned escape hatch"
      if (physical.collect { case s: SortExec if s.global => s }.size > 1)
        problems += s"${q.name}: interior global sort"
    }
    assert(problems.isEmpty, s"scale-killers in catalog plans:\n${problems.mkString("\n")}")
  }

  test("z-order compaction bounds BOTH dimensions per output file") {
    val root = Files.createTempDirectory("graft-zorder").toString
    val sf01 = "/root/testdata/sf0.01"
    val ev = Tables.events(spark, sf01).select(col("user_id"),
      expr("(cast(ts as long) - cast(timestamp'2024-01-01 00:00:00' as long)) div 60")
        .as("minute"))
    ev.repartition(20).write.parquet(s"$root/in")
    val Array(uMax, mMax) = ev.agg(max("user_id"), max("minute")).head()
      .toSeq.map(_.asInstanceOf[Long]).toArray
    // equal-width 8-bit codes per dimension: rank/range normalization is
    // what makes z-order genuinely two-dimensional — raw unequal bit
    // widths degenerate to a single-column sort on the wider dimension
    val zKey = functions.VectorFunctions.zorder(
      expr(s"(user_id * 256) div ${uMax + 1}"),
      expr(s"(minute * 256) div ${mMax + 1}"))
    operators.Layout.compactBy(spark, s"$root/in", s"$root/zout", zKey,
      targetBytes = 4L << 10)
    // baseline: single-column sort on minute leaves user unbounded per file
    operators.Layout.compact(spark, s"$root/in", s"$root/mout", "minute",
      targetBytes = 4L << 10)
    def avgRanges(dir: String): (Double, Double) = {
      val fs = new org.apache.hadoop.fs.Path(dir)
        .getFileSystem(spark.sessionState.newHadoopConf())
      val spans = fs.listStatus(new org.apache.hadoop.fs.Path(dir))
        .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
        .map { f =>
          val r = spark.read.parquet(f.getPath.toString)
            .agg(min("user_id"), max("user_id"), min("minute"), max("minute")).head
          ((r.getLong(1) - r.getLong(0)).toDouble / uMax,
            (r.getLong(3) - r.getLong(2)).toDouble / mMax)
        }
      (spans.map(_._1).sum / spans.length, spans.map(_._2).sum / spans.length)
    }
    val (zU, zM) = avgRanges(s"$root/zout")
    val (bU, _) = avgRanges(s"$root/mout")
    assert(zU <= 0.55, s"z-order files must bound user_id: avg span $zU")
    assert(zM <= 0.55, s"z-order files must bound minute: avg span $zM")
    assert(bU >= 0.8, s"baseline minute-sort should NOT bound user_id ($bU) " +
      "— if it does, this dataset can no longer distinguish the layouts")
    assert(zU < bU / 2, s"z-order must beat single-column sort on the " +
      s"second dimension: z=$zU baseline=$bU")
  }

  test("compaction merges small files into sorted, range-disjoint files") {
    val root = Files.createTempDirectory("graft-compact").toString
    // simulate streaming ingest debris: 40 tiny files
    Tables.orders(spark, sf).repartition(40)
      .write.parquet(s"$root/in")
    val stats = operators.Layout.compact(spark, s"$root/in", s"$root/out",
      sortCol = "o_orderkey", targetBytes = 64L << 10)
    assert(stats.inputFiles >= 40, s"ingest debris expected: $stats")
    assert(stats.outputFiles < stats.inputFiles / 4,
      s"compaction must collapse the file count: $stats")
    assert(stats.rows === Tables.orders(spark, sf).count(), "no rows lost")
    // range clustering: per-file key ranges must be pairwise disjoint, so
    // a key filter can prune whole files from parquet footers alone
    val fs = new org.apache.hadoop.fs.Path(s"$root/out")
      .getFileSystem(spark.sessionState.newHadoopConf())
    val ranges = fs.listStatus(new org.apache.hadoop.fs.Path(s"$root/out"))
      .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
      .map { f =>
        val r = spark.read.parquet(f.getPath.toString)
          .agg(min("o_orderkey"), max("o_orderkey")).head
        (r.getLong(0), r.getLong(1))
      }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hi), (lo2, _)) =>
        assert(hi <= lo2, s"file key ranges overlap: ${ranges.toSeq}")
      case _ =>
    }
  }

  test("dimension filters push into the parquet scan of fact queries") {
    val plan = physicalPlan(
      Tables.lineitem(spark, sf).filter(col("l_shipdate") >= lit("1996-06-01").cast("timestamp"))
        .select("l_orderkey", "l_extendedprice"))
    assert(plan.contains("PushedFilters") && plan.contains("l_shipdate"))
    assert(plan.contains("ReadSchema") &&
      !plan.replaceAll("(?s).*ReadSchema", "").contains("l_comment"),
      "projection should prune unused columns")
  }

  /** q224's scale claim, asserted at the plan level: the ORC scan is the
    * same pushdown-and-prune citizen as parquet — predicates reach the
    * stripe reader (min/max row-group skipping) and the projection prunes
    * unread columns, so the format swap changes nothing structural. */
  test("ORC scans push filters and prune columns like parquet") {
    // construct q224 once so its staged ORC directory exists (memoized),
    // then locate it through the scan's own file listing
    val probe = SparkEntry.queries("q224_orc_roundtrip")(spark, sf)
    val orcDir = new java.io.File(
      probe.inputFiles.head.stripPrefix("file:")).getParent
    val plan = physicalPlan(
      spark.read
        .schema("event_id BIGINT, ts TIMESTAMP, user_id BIGINT, " +
          "event_type STRING, value DOUBLE, props STRING")
        .orc(orcDir)
        .filter(col("value") > 100.0)
        .select("event_id", "value"))
    assert(plan.contains("PushedFilters") && plan.contains("value"),
      s"ORC scan did not push the value predicate:\n$plan")
    assert(plan.contains("ReadSchema") &&
      !plan.replaceAll("(?s).*ReadSchema", "").contains("props"),
      "ORC projection should prune unread columns")
  }

  /** q225's 100 TB claim at the task level: ONE multi-block container fans
    * out across MANY tasks (sync-marker byte-range splits), every record
    * lands exactly once, and the parallelism ceiling is gone — per-file
    * tasks were the r7 shape this replaces. */
  test("OCF source splits one multi-block container across many tasks, exactly once") {
    import spark.implicits._
    import graft.avro.{AvroFunctions, AvroOcf}
    val in = (1L to 2000L).map(i => (i, s"payload-$i-${"x" * 40}"))
      .toDF("id", "payload").repartition(1)
    val schemaJson = AvroFunctions.writerSchemaFor(in.schema, "Split")
    val out = Files.createTempDirectory("graft_ocf_split").toString + "/t"
    // small sync interval => many small blocks inside a single container
    AvroOcf.write(in.select(AvroFunctions.toAvro(
      struct(col("id"), col("payload")), "Split").as("b")).as[Array[Byte]],
      schemaJson, out, codec = "null", syncInterval = 256)
    val files = new java.io.File(out).listFiles()
      .filter(_.getName.endsWith(".avro"))
    assert(files.length == 1, "test needs a single multi-block container")
    val df = AvroOcf.readBinary(spark, out, Some(schemaJson),
      maxSplitBytes = 4096)
    assert(df.rdd.getNumPartitions > 1,
      s"one container must fan out: got ${df.rdd.getNumPartitions} task(s) " +
        s"for a ${files.head.length()}-byte file at 4 KiB splits")
    val back = df
      .select(AvroFunctions.fromAvro(col("avro_value"), schemaJson).as("r"))
      .select(col("r.id"))
      .groupBy(col("id")).count()
      .as[(Long, Long)].collect()
    assert(back.length == 2000, s"row loss across splits: ${back.length}/2000")
    assert(back.forall(_._2 == 1L),
      "duplicate rows across splits: a block was owned by two byte ranges")
  }

  /** The curation family's 100 TB shapes, pinned at the plan level: the
    * scrub is scan→project with no exchange but the presentation sort; the
    * repetition profile reads the corpus once per gram order (token totals
    * fall out of the word-count aggregate, not a third scan); the mixer's
    * quota side reaches the fact through broadcast only (the fact's lone
    * shuffle is the per-source window). */
  test("curation plans: scrub is exchange-free, grams scan once per order, mixer broadcasts quotas") {
    import org.apache.spark.sql.execution.FileSourceScanExec

    def docScans(df: org.apache.spark.sql.DataFrame) =
      df.queryExecution.sparkPlan.collect {
        case sc: FileSourceScanExec
          if sc.relation.location.rootPaths.exists(_.toString.contains("documents")) => sc
      }

    // q226: per-row map work — in the EXECUTABLE plan (exchanges exist only
    // after EnsureRequirements, so sparkPlan would pin nothing) the sole
    // permitted exchange is the presentation sort's range partitioning:
    // any hash or single-partition exchange means an aggregate or join
    // shuffle crept into what must stay scan→project→sort
    val scrub = SparkEntry.queries("q226_pii_denylist_scrub")(spark, sf)
    val scrubPlan = physicalPlan(scrub)
    assert(docScans(scrub).size === 1 &&
      !scrubPlan.contains("hashpartitioning") &&
      !scrubPlan.contains("SinglePartition"),
      s"scrub must be scan→project→sort (range exchange only):\n$scrubPlan")
    assert(scrubPlan.contains("rangepartitioning"),
      s"scrub's presentation sort should plan as a range exchange:\n$scrubPlan")

    // q227: one corpus read per gram order (word stream + bigram stream) —
    // a third scan means a plain count pass crept back in
    val rep = SparkEntry.queries("q227_repetition_profile")(spark, sf)
    assert(docScans(rep).size === 2,
      s"repetition profile re-reads the corpus ${docScans(rep).size}x " +
        s"(want 2: tokens + bigrams):\n${rep.queryExecution.sparkPlan}")

    // q228: the fact-side plan below the window's per-source exchange must
    // be scan→project only — quotas and totals arrive via broadcast, so no
    // aggregate/join shuffle ever carries the full corpus
    val mix = SparkEntry.queries("q228_source_mixture_sample")(spark, sf)
    val shuffledJoins = mix.queryExecution.sparkPlan.collect {
      case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j
      case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec => j
    }
    assert(shuffledJoins.isEmpty,
      s"mixer quotas must reach the fact via broadcast, found shuffled " +
        s"join(s):\n${mix.queryExecution.sparkPlan}")
    assert(mix.queryExecution.sparkPlan.collectFirst {
      case j: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => j
    }.isDefined, "mixer quota join should plan as BroadcastHashJoin")
  }

  test("selection plans: semdedup pairs equi-join on cent_id, DSIR stats broadcast, fertility one-scan") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.joins.{BaseJoinExec,
      BroadcastHashJoinExec, BroadcastNestedLoopJoinExec, CartesianProductExec,
      ShuffledHashJoinExec, SortMergeJoinExec}

    // q230: the intra-cluster pair expansion must meet in an EQUI join keyed
    // on cent_id — never a product. The only nested-loop joins permitted are
    // the sanctioned q66 centroid-assignment broadcasts (cents side).
    val sem = SparkEntry.queries("q230_semdedup")(spark, sf)
    val semPlan = sem.queryExecution.sparkPlan
    assert(semPlan.collect { case j: CartesianProductExec => j }.isEmpty,
      "semdedup must never plan a CartesianProduct")
    val pairJoin = semPlan.collect {
      case j: SortMergeJoinExec if j.leftKeys.exists(_.toString.contains("cent_id")) => j
      case j: ShuffledHashJoinExec if j.leftKeys.exists(_.toString.contains("cent_id")) => j
      case j: BroadcastHashJoinExec if j.leftKeys.exists(_.toString.contains("cent_id")) => j
    }
    assert(pairJoin.nonEmpty,
      s"semdedup pair expansion must be an equi-join on cent_id:\n$semPlan")

    // q231: the 128-row bucket-stats table and the 1-row totals reach the
    // per-document side via broadcast ONLY — a shuffled join here would
    // re-partition the whole gram stream by bucket at 100 TB
    val dsir = SparkEntry.queries("q231_dsir_importance")(spark, sf)
    val dsirShuffledJoins = dsir.queryExecution.sparkPlan.collect {
      case j: SortMergeJoinExec => j
      case j: ShuffledHashJoinExec => j
    }
    assert(dsirShuffledJoins.isEmpty,
      s"DSIR stats must arrive via broadcast, found shuffled join(s):\n" +
        s"${dsir.queryExecution.sparkPlan}")
    assert(dsir.queryExecution.sparkPlan.collectFirst {
      case j: BroadcastHashJoinExec => j
    }.isDefined, "DSIR bucket-stats join should plan as BroadcastHashJoin")

    // q233: one corpus scan, one partial+final aggregate on the 5-key lang
    // column, presentation sort — no joins at all
    val fert = SparkEntry.queries("q233_tokenizer_fertility")(spark, sf)
    val fertScans = fert.queryExecution.sparkPlan.collect {
      case sc: FileSourceScanExec
        if sc.relation.location.rootPaths.exists(_.toString.contains("documents")) => sc
    }
    assert(fertScans.size === 1,
      s"fertility audit reads the corpus ${fertScans.size}x (want 1)")
    assert(fert.queryExecution.sparkPlan.collect { case j: BaseJoinExec => j }.isEmpty,
      "fertility audit must not join anything")
  }

  test("governance plans: budget mix one-scan, PQ queries broadcast, leak audit join-free") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.joins.{BaseJoinExec,
      BroadcastNestedLoopJoinExec, CartesianProductExec}

    def docScans(df: org.apache.spark.sql.DataFrame) =
      df.queryExecution.sparkPlan.collect {
        case sc: FileSourceScanExec
          if sc.relation.location.rootPaths.exists(_.toString.contains("documents")) => sc
      }

    // q235: the corpus is touched once (the per-source token count);
    // the water-filling itself runs on O(sources) rows
    val mix = SparkEntry.queries("q235_token_budget_mix")(spark, sf)
    assert(docScans(mix).size === 1,
      s"budget mix reads the corpus ${docScans(mix).size}x (want 1)")

    // q236: query vectors reach the ADC scan via broadcast only — the
    // corpus-side reconstruction table must never be re-partitioned for
    // them, and the non-equi self-exclusion must never degrade to a product
    val pq = SparkEntry.queries("q236_pq_ann")(spark, sf)
    val pqPlan = pq.queryExecution.sparkPlan
    assert(pqPlan.collect { case j: CartesianProductExec => j }.isEmpty,
      s"PQ ANN must never plan a CartesianProduct:\n$pqPlan")
    assert(pqPlan.collect { case j: BroadcastNestedLoopJoinExec => j }.nonEmpty,
      "PQ ADC scan should reach queries via a broadcast nested-loop " +
        "(tiny query side, <> self-exclusion)")

    // q238: shard budgets reach the ranked fact via broadcast only — the
    // O(sources) plan side must never re-partition the document stream
    val admit = SparkEntry.queries("q238_token_budget_admit")(spark, sf)
    val admitShuffledJoins = admit.queryExecution.sparkPlan.collect {
      case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j
      case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec => j
    }
    assert(admitShuffledJoins.isEmpty,
      s"q238 shard budgets must arrive via broadcast:\n" +
        s"${admit.queryExecution.sparkPlan}")
    assert(docScans(admit).size === 2,
      s"q238 reads the corpus ${docScans(admit).size}x " +
        "(want 2: ranked fact + the O(sources) plan aggregate)")

    // q237: digests-only pipeline — one corpus scan, aggregates and a
    // window, no joins anywhere (document bodies never ride a shuffle)
    val leak = SparkEntry.queries("q237_split_leakage_audit")(spark, sf)
    assert(docScans(leak).size === 1,
      s"leak audit reads the corpus ${docScans(leak).size}x (want 1)")
    assert(leak.queryExecution.sparkPlan.collect { case j: BaseJoinExec => j }.isEmpty,
      "leak audit must not join anything — fp flag is a window over the " +
        "aggregated (fp, split) pairs")
  }

  test("refine plans: intra-doc scrub shuffle-free, drift audit broadcast-only") {
    import org.apache.spark.sql.execution.FileSourceScanExec

    // q240: the whole scrub is row-local array algebra — in the EXECUTABLE
    // plan the only exchange allowed is the presentation sort's range
    // partitioning (q226's discipline); a hash or single-partition
    // exchange means a per-gram aggregate crept in
    val scrub = SparkEntry.queries("q240_intradoc_repeat_scrub")(spark, sf)
    val scrubPlan = physicalPlan(scrub)
    assert(!scrubPlan.contains("hashpartitioning") &&
      !scrubPlan.contains("SinglePartition"),
      s"intra-doc scrub must be scan→project→sort:\n$scrubPlan")
    assert(scrubPlan.contains("rangepartitioning"),
      s"presentation sort should plan as a range exchange:\n$scrubPlan")

    // q241: epoch totals reach the cells via broadcast — the only shuffled
    // join keys allowed are none at all (cells aggregate + broadcast total)
    val drift = SparkEntry.queries("q241_ivf_drift_audit")(spark, sf)
    val driftShuffledJoins = drift.queryExecution.sparkPlan.collect {
      case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j
      case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec => j
    }
    assert(driftShuffledJoins.isEmpty,
      s"drift audit totals must arrive via broadcast:\n" +
        s"${drift.queryExecution.sparkPlan}")
    val embScans = drift.queryExecution.sparkPlan.collect {
      case sc: FileSourceScanExec
        if sc.relation.location.rootPaths.exists(_.toString.contains("embeddings")) => sc
    }
    // assignment (fact + centroid sample) is 2 scans; a 3rd would mean the
    // epoch split re-reads the corpus instead of riding the assignment
    assert(embScans.size === 2,
      s"drift audit reads embeddings ${embScans.size}x (want 2: fact + centroids)")

    // q245: same discipline for the PQ monitor — the codebook side reaches
    // the decomposition via broadcast (equi-join on m), never a shuffled
    // join, and the corpus is read exactly twice (fact + codebook sample)
    val pq = SparkEntry.queries("q245_pq_drift_audit")(spark, sf)
    val pqShuffledJoins = pq.queryExecution.sparkPlan.collect {
      case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j
      case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec => j
    }
    assert(pqShuffledJoins.isEmpty,
      s"PQ drift audit codebook must broadcast:\n${pq.queryExecution.sparkPlan}")
    val pqEmbScans = pq.queryExecution.sparkPlan.collect {
      case sc: FileSourceScanExec
        if sc.relation.location.rootPaths.exists(_.toString.contains("embeddings")) => sc
    }
    assert(pqEmbScans.size === 2,
      s"PQ drift audit reads embeddings ${pqEmbScans.size}x (want 2)")
  }

  test("gate and training-order plans: gate joins broadcast-only, interleave shuffles once on shard") {
    // q242: the weights table is a KB-sized literal — it must reach the
    // corpus via broadcast, never a shuffled join that moves document rows
    val gate = SparkEntry.queries("q242_classifier_gate")(spark, sf)
    val gateShuffledJoins = gate.queryExecution.sparkPlan.collect {
      case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j
      case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec => j
    }
    assert(gateShuffledJoins.isEmpty,
      s"classifier weights must broadcast:\n${gate.queryExecution.sparkPlan}")

    // q243: the ONLY data exchange is the 8-way shard hash partition for
    // the within-shard rank (plus the presentation sort's range exchange) —
    // a second hash exchange or any global sort on the LCG key would be
    // the naive ORDER BY hash(id) shuffle the operator exists to avoid
    val order = SparkEntry.queries("q243_shuffle_shard_interleave")(spark, sf)
    // count actual exchange NODES (post-EnsureRequirements, AQE unwrapped),
    // not substring occurrences of the partitioning token — plan rendering
    // can echo a partitioning across downstream operators, which would flip
    // a substring count on a Spark version/config change with no real plan
    // regression
    val orderExec = order.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
    val orderExchanges = orderExec.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike =>
        e.outputPartitioning
    }
    val hashExchanges = orderExchanges.count(
      _.isInstanceOf[org.apache.spark.sql.catalyst.plans.physical.HashPartitioning])
    val rangeExchanges = orderExchanges.count(
      _.isInstanceOf[org.apache.spark.sql.catalyst.plans.physical.RangePartitioning])
    assert(hashExchanges === 1 && rangeExchanges === 1,
      s"interleave must shuffle exactly once (shard) + presentation " +
        s"range sort, got $hashExchanges hash / $rangeExchanges range " +
        s"exchanges:\n$orderExec")
  }

  test("ivfpq plan: the ADC candidate scan is cell-pruned, never flat") {
    import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec,
      BroadcastNestedLoopJoinExec, CartesianProductExec, ShuffledHashJoinExec,
      SortMergeJoinExec}

    // q249 exists to close q236's composition gap: the candidate scan must
    // meet the query side in an EQUI-join keyed on cent_id (per-query cost
    // = probes × cell_size), and must NOT contain q236's flat broadcast
    // nested-loop of codes × query LUTs (per-query cost = O(corpus)).
    val ipq = SparkEntry.queries("q249_ivfpq_ann")(spark, sf)
    val plan = ipq.queryExecution.sparkPlan
    assert(plan.collect { case j: CartesianProductExec => j }.isEmpty,
      s"IVF-PQ must never plan a CartesianProduct:\n$plan")
    val cellJoins = plan.collect {
      case j: BroadcastHashJoinExec
        if j.leftKeys.exists(_.toString.contains("cent_id")) => j
      case j: SortMergeJoinExec
        if j.leftKeys.exists(_.toString.contains("cent_id")) => j
      case j: ShuffledHashJoinExec
        if j.leftKeys.exists(_.toString.contains("cent_id")) => j
    }
    assert(cellJoins.nonEmpty,
      s"IVF-PQ candidates must meet queries in an equi-join on cent_id:\n$plan")
    // the only nested-loop joins allowed are the sanctioned tiny-side
    // broadcasts (centroid sample, codebook); a flat ADC scan would carry
    // the query_id self-exclusion as the NLJ condition
    val flatAdc = plan.collect {
      case j: BroadcastNestedLoopJoinExec
        if j.condition.exists(_.references.exists(_.name == "query_id")) => j
    }
    assert(flatAdc.isEmpty,
      s"IVF-PQ must not fall back to q236's flat codes × LUT scan:\n$plan")
  }

  test("fixed-form ivfpq plan: cell-pruned scan with the qside broadcast retained") {
    import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec,
      CartesianProductExec}
    // q280's fixed workload bounds the qside LUT frame by construction
    // (≤64 queries × probes rows × 4·256 doubles ≈ 2.6 MB at ANY corpus
    // size), so the driver-safety gate must KEEP the broadcast hint: the
    // cent_id candidate join plans as a BroadcastHashJoin — the share
    // form's demotion to a shuffle join must never trigger here.
    val plan = SparkEntry.queries("q280_ivfpq_ann_fixed")(spark, sf)
      .queryExecution.sparkPlan
    assert(plan.collect { case j: CartesianProductExec => j }.isEmpty,
      s"fixed IVF-PQ must never plan a CartesianProduct:\n$plan")
    val bcastCell = plan.collect {
      case j: BroadcastHashJoinExec
        if (j.leftKeys ++ j.rightKeys).exists(_.toString.contains("cent_id")) => j
    }
    assert(bcastCell.nonEmpty,
      s"fixed IVF-PQ must broadcast the bounded qside into the cent_id join:\n$plan")
    // the native-kernel + heap-prune discipline carries over from the
    // share forms to both fixed forms
    Seq("q279_pq_ann_fixed", "q280_ivfpq_ann_fixed").foreach { q =>
      val p = physicalPlan(SparkEntry.queries(q)(spark, sf))
      assert(p.contains("graft_sqdist") && p.contains("graft_top_pairs") &&
        !p.toLowerCase.contains("zip_with"),
        s"$q must keep the native-kernel hot path:\n$p")
    }
  }

  test("stored PQ-index serve: dynamic partition pruning cuts the codes scan to probed cells") {
    // q281 serves from the installed pillar, whose codes are PARTITIONED
    // BY cent_id; the broadcast qside equi-join must plan a
    // dynamicpruningexpression on the stored scan — at 100 TB with
    // thousands of cells and a fixed query panel, this is what turns the
    // serve path's I/O from |index| into probes·|cell| per batch.
    val df = SparkEntry.queries("q281_ivfpq_index_serve")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruningexpression"),
      s"the stored codes scan must carry a DPP partition filter:\n$plan")
    assert(plan.contains("graft_top_pairs") &&
      !plan.toLowerCase.contains("zip_with"),
      s"the serve path must keep the heap prune and native kernels:\n$plan")
    // and the serve result IS q280 row-for-row (one contract, one oracle)
    val served = df.collect().map(_.toSeq).toSeq
    val derived = SparkEntry.queries("q280_ivfpq_ann_fixed")(spark, sf)
      .collect().map(_.toSeq).toSeq
    assert(served == derived,
      "stored codes and per-run derived codes must serve identical results")
  }
}
