package graft.operators

import graft.{GraftQuery, Tables}
import graft.Staging
import graft.Staging.StagingOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Near-dup CLUSTERING: pairwise detectors (q38–q42) emit edges; a training
  * pipeline needs the transitive groups — "these 5 docs are all the same
  * article, keep one". Connected components turns the pair list into
  * (doc, cluster, size), with min-id as the deterministic canonical keeper.
  */
object ClusterQueries {

  /** Minimum-label connected components over an undirected edge list
    * `(a, b)` — the distributed fixed-point algorithm, not a driver-side
    * union-find: labels live in a DataFrame keyed by node, and each round
    * runs (1) a neighbor-min propagation join over the edges and (2) a
    * pointer-jumping join (`comp ← comp(comp)`) that collapses label chains,
    * so convergence needs O(log diameter) rounds rather than O(diameter).
    *
    * Each round stages the labels under [[graft.Staging]]'s policy:
    * iterative plans otherwise nest one join per round and the optimizer
    * re-analyzes a growing tree. With a checkpoint dir configured (the
    * 100 TB posture) the cut is a RELIABLE `checkpoint` — a lost executor
    * mid-iteration recomputes from files instead of failing the query;
    * locally it falls back to eager `localCheckpoint`. The convergence probe is a
    * `limit(1).count` on changed labels — an intentional per-round action;
    * this is the one operator family whose work cannot be a single
    * declarative plan. Near-dup graphs converge in 2–3 rounds (clusters are
    * star-shaped); `maxIter` only guards degenerate inputs.
    */
  def connectedComponents(edges: DataFrame, maxIter: Int = 20): DataFrame = {
    // Materialize the edge list ONCE: it re-enters every round's join, and
    // without this the whole upstream pair-generation pipeline (shingling,
    // inverted index, ...) would re-execute per round.
    // (no distinct: the groupBy-min absorbs duplicate edges for free, and
    // deduplicating them would cost an extra shuffle of the edge list)
    val sym = edges.select(col("a"), col("b"))
      .union(edges.select(col("b").as("a"), col("a").as("b")))
      .staged
    var labels = sym.select(col("a").as("id")).distinct()
      .select(col("id"), col("id").as("comp"))
      .staged
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      val nbrMin = sym.join(labels, sym("b") === labels("id"))
        .select(sym("a").as("id"), col("comp"))
      // toDF re-aliases with fresh exprIds: both union children otherwise
      // share the checkpointed labels' attributes (nbrMin derives from
      // labels), which trips Union's constraint propagation
      val stepped = labels.toDF("id", "comp").union(nbrMin.toDF("id", "comp"))
        .groupBy("id").agg(min("comp").as("comp"))
      // pointer jump: comp(comp(u)) ≤ comp(u) always holds for min-labels,
      // so one extra self-join halves the remaining chain length
      val jumped = stepped.alias("l")
        .join(stepped.select(col("id").as("cid"), col("comp").as("ccomp")).alias("r"),
          col("l.comp") === col("r.cid"))
        .select(col("l.id").as("id"), col("r.ccomp").as("comp"))
      val next = jumped.staged
      converged = next.alias("n")
        .join(labels.select(col("id"), col("comp").as("prev")), "id")
        .filter(col("comp") =!= col("prev")).limit(1).count() == 0L
      Staging.release(labels)
      labels = next
      iter += 1
    }
    require(converged, s"connected components did not converge in $maxIter rounds")
    // labels is independently checkpointed — releasing the edge list here
    // doesn't touch the returned lineage
    Staging.release(sym)
    labels
  }

  /** The corpus's near-dup cluster labels (id, comp), memoized per
    * (session, corpus fingerprint): q81 (clusters) and q97 (canonical
    * selection) both need the SAME fixed point, and the labels frame is
    * already staged (checkpointed) — re-running pointer jumping per query
    * would double the bench's most expensive iterative work for an
    * identical answer. Session identity is part of the key because
    * checkpoint blocks die with their session; the file fingerprint
    * invalidates on corpus rewrite (the q67 cache lesson). SINGLE-SLOT on
    * purpose: a map would pin every superseded session (and its dead
    * checkpoint blocks) for process lifetime — replacing the one entry
    * keeps exactly the live artifact reachable. At 100 TB the same
    * artifact persists as a labels TABLE the pipeline writes once — this
    * cache is the in-process form of that discipline. */
  private var labelSlot: Option[((Int, String), DataFrame)] = None

  private[graft] def nearDupLabels(s: SparkSession, dir: String): DataFrame =
    synchronized {
      val key = (System.identityHashCode(s),
        Tables.fingerprint(s, s"$dir/documents.parquet"))
      labelSlot match {
        case Some((k, df)) if k == key => df
        case prev =>
          val edges = DedupQueries.jaccardEdges(s, dir)
            .select(col("doc_a").as("a"), col("doc_b").as("b"))
          val labels = connectedComponents(edges)
          labelSlot = Some((key, labels))
          // free the superseded labels' checkpoint blocks deterministically
          // (same live session only — a stopped session's blocks are gone)
          prev.foreach { case ((h, _), old) =>
            if (h == System.identityHashCode(s) && !s.sparkContext.isStopped)
              try old.unpersist() catch { case _: Exception => () }
          }
          labels
      }
    }

  /** Distributed Lloyd's k-means over `(id, v: array<double>)`.
    *
    * Deterministic seeding (the k lowest `xxhash64(id)` vectors — stable
    * across runs and engines, no RNG state); each round broadcasts the k
    * centroids against the corpus (the q66 assignment shape: map-side
    * `min_by` collapses the k candidate rows per vector BEFORE any
    * exchange), then re-averages per (cluster, dimension) with partial
    * aggregation — the shuffle carries k·dim cells per partition, never
    * vectors. Rounds stop when the summed within-cluster cost improves by
    * < `tol` relative — a per-round action, same sanctioned pattern as
    * [[connectedComponents]]. Returns (centroids, per-round costs).
    *
    * Centroid means sum doubles in partition order, so exact bits can
    * differ run-to-run (inherent to parallel float reduction); the COST
    * SEQUENCE contract (monotone non-increasing to tolerance) is what the
    * spec pins, matching how production k-means is validated.
    */
  def kmeans(vectors: DataFrame, k: Int, maxIter: Int, tol: Double = 1e-4)
      : (DataFrame, Seq[Double]) = {
    import graft.functions.VectorFunctions.dotd
    val vs = vectors.select(col("id"), col("v"))
      .withColumn("vv", dotd(col("v"), col("v")))
      .staged
    var cents = vs
      .withColumn("hk", xxhash64(col("id")))
      .orderBy("hk").limit(k)
      .withColumn("cid", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy("hk")).cast("long"))
      .select(col("cid"), col("v").as("c"))
      .staged
    val costs = scala.collection.mutable.Buffer.empty[Double]
    var iter = 0
    var done = false
    while (!done && iter < maxIter) {
      val cc = cents.withColumn("cc", dotd(col("c"), col("c")))
      // squared L2 via dot products: ‖v−c‖² = v·v − 2 v·c + c·c
      val assigned = vs.crossJoin(broadcast(cc))
        .withColumn("d", col("vv") - lit(2.0) * dotd(col("v"), col("c")) + col("cc"))
        .groupBy("id")
        // k=1 heap argmin — same (d ASC, cid ASC) winner as min_by(cid,
        // struct(d, cid)), whose struct agg buffer forced a SortAggregate
        // full-sort of the n×k assignment join EVERY ROUND; the winning
        // distance is recovered from the heap's score
        .agg(graft.functions.Sketches.topPairs(-col("d"), col("cid"), 1)
          .as("tp"), first(col("v")).as("v"))
        .select(col("id"), element_at(col("tp.id"), 1).as("cid"),
          (-element_at(col("tp.score"), 1)).as("d"), col("v"))
        .staged
      // coalesce: an empty corpus has no assignment cost — sum() is NULL
      // and getDouble would throw (DegenerateCorpusSpec); cost 0 converges
      // on the second round like any plateau.
      val cost = assigned.agg(coalesce(sum(greatest(col("d"), lit(0.0))), lit(0.0)))
        .head.getDouble(0)
      val next = assigned
        .select(col("cid"), posexplode(col("v")).as(Seq("dim", "x")))
        .groupBy("cid", "dim").agg(sum("x").as("sx"), count(lit(1)).as("n"))
        .groupBy("cid")
        .agg(transform(sort_array(collect_list(struct(col("dim"), (col("sx") / col("n")).as("m")))),
          p => p("m")).as("c"))
      // clusters that lost every member keep their previous centroid
      val kept = cents.join(next.select(col("cid")), Seq("cid"), "left_anti")
      val prevCents = cents
      cents = next.union(kept).staged
      // the new checkpoint is materialized: release the round's scratch
      // blocks so repeated builds don't accumulate storage pressure
      Staging.release(assigned)
      Staging.release(prevCents)
      done = costs.lastOption.exists(prev => prev - cost <= tol * math.abs(prev))
      costs += cost
      iter += 1
    }
    Staging.release(vs)
    (cents, costs.toSeq)
  }

  val all: Seq[GraftQuery] = Seq(

    GraftQuery(
      "q81_dedup_clusters",
      Some("""WITH RECURSIVE docs AS (
             |  SELECT doc_id, string_split(lower(text), ' ') w FROM documents
             |), sh0 AS (
             |  SELECT doc_id, unnest(list_distinct(list_transform(
             |           range(1, greatest(len(w)-1, 1)),
             |           i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))) s
             |  FROM docs
             |), sh AS (
             |  SELECT * FROM sh0
             |  QUALIFY count(*) OVER (PARTITION BY s) <= 64
             |), sizes AS (
             |  SELECT doc_id, count(*) n FROM sh GROUP BY doc_id
             |), pairs AS (
             |  SELECT a.doc_id doc_a, b.doc_id doc_b, count(*) c
             |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
             |  GROUP BY 1, 2
             |), scored AS (
             |  SELECT doc_a, doc_b, c*1.0/((sa.n + sb.n) - c) jac
             |  FROM pairs
             |  JOIN sizes sa ON sa.doc_id = doc_a
             |  JOIN sizes sb ON sb.doc_id = doc_b
             |), edges AS (
             |  SELECT doc_a a, doc_b b FROM scored WHERE jac >= 0.8
             |  UNION ALL
             |  SELECT doc_b, doc_a FROM scored WHERE jac >= 0.8
             |), nodes AS (
             |  SELECT DISTINCT a AS doc_id FROM edges
             |), reach AS (
             |  SELECT doc_id AS src, doc_id AS dst FROM nodes
             |  UNION
             |  SELECT r.src, e.b FROM reach r JOIN edges e ON e.a = r.dst
             |), comp AS (
             |  SELECT src AS doc_id, min(dst) AS cluster_id FROM reach GROUP BY src
             |)
             |SELECT doc_id, cluster_id,
             |       CAST(count(*) OVER (PARTITION BY cluster_id) AS BIGINT)
             |         AS cluster_size
             |FROM comp
             |ORDER BY doc_id""".stripMargin),
      "Near-dup clusters = connected components over q41's exact-Jaccard " +
        "pair list: pairwise hits are not actionable (A~B, B~C must dedup " +
        "as ONE group of three), so the engine closes them transitively " +
        "with distributed min-label propagation + pointer jumping — " +
        "O(log diameter) rounds of edge-join + groupBy-min, labels " +
        "checkpointed per round to keep the plan tree flat, never a " +
        "driver-side union-find. min(doc_id) is the deterministic canonical " +
        "keeper; cluster_size drives keep-one filtering downstream. The " +
        "oracle computes the same fixed point as a recursive transitive " +
        "closure, which is exact on the small SF while the Spark path is " +
        "the one that scales: per-round cost is one shuffle of (id, comp) " +
        "pairs — 16 B/node — regardless of document size."
    ) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      nearDupLabels(s, dir)
        .select(col("id").as("doc_id"), col("comp").as("cluster_id"))
        .withColumn("cluster_size",
          count(lit(1)).over(Window.partitionBy("cluster_id")).cast("long"))
        .orderBy("doc_id")
    },

    GraftQuery(
      "q86_kmeans_train",
      None, // iterative float optimization: cost-contract spec'd, no SQL oracle.
      "Distributed Lloyd's k-means (k=8) over the embedding corpus — the " +
        "trained-centroid index build q66's IVF note promises: " +
        "deterministic hash-order seeding, per-round broadcast assignment " +
        "with a map-side k=1 heap-argmin collapse (one row per vector " +
        "through the exchange, hash-aggregated — never the struct-buffer " +
        "min_by whose SortAggregate would re-sort the n×k join every " +
        "round), per-(cluster, dim) partial-agg re-averaging (k·dim " +
        "cells per partition through the shuffle, never vectors), " +
        "relative-tolerance cost stop. Emits the per-cluster member count " +
        "and rounds-to-converge audit. Swap the q66 centroid sample for " +
        "these centroids and the IVF query plan is unchanged — index " +
        "builds are periodic batch jobs, reads stay declarative."
    ) { (s, dir) =>
      import graft.functions.VectorFunctions.dotd
      val vectors = graft.Tables.embeddings(s, dir)
        .select(col("vec_id").as("id"),
          transform(col("embedding"), _.cast("double")).as("v"))
      // bounded round budget, as a production index build would run it
      // (this corpus is near-uniform, so cost plateaus rather than
      // converging sharply; the spec pins monotonicity, not round count)
      val (cents, costs) = kmeans(vectors, k = 8, maxIter = 6, tol = 1e-3)
      val cc = cents.withColumn("cc", dotd(col("c"), col("c")))
      vectors
        .withColumn("vv", dotd(col("v"), col("v")))
        .crossJoin(broadcast(cc))
        .withColumn("d", col("vv") - lit(2.0) * dotd(col("v"), col("c")) + col("cc"))
        .groupBy("id")
        // k=1 heap argmin, same winner as min_by(cid, struct(d, cid)) —
        // see kmeans' assignment step for the SortAggregate rationale
        .agg(graft.functions.Sketches.topPairs(-col("d"), col("cid"), 1)
          .as("tp"))
        .select(col("id"), element_at(col("tp.id"), 1).as("cid"))
        .groupBy("cid")
        .agg(count(lit(1)).as("n_members"))
        .withColumn("rounds", lit(costs.size.toLong))
        .orderBy("cid")
    },

    GraftQuery(
      "q97_cluster_canonical",
      Some("""WITH RECURSIVE docs AS (
             |  SELECT doc_id, string_split(lower(text), ' ') w FROM documents
             |), sh0 AS (
             |  SELECT doc_id, unnest(list_distinct(list_transform(
             |           range(1, greatest(len(w)-1, 1)),
             |           i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))) s
             |  FROM docs
             |), sh AS (
             |  SELECT * FROM sh0
             |  QUALIFY count(*) OVER (PARTITION BY s) <= 64
             |), sizes AS (
             |  SELECT doc_id, count(*) n FROM sh GROUP BY doc_id
             |), pairs AS (
             |  SELECT a.doc_id doc_a, b.doc_id doc_b, count(*) c
             |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
             |  GROUP BY 1, 2
             |), scored AS (
             |  SELECT doc_a, doc_b, c*1.0/((sa.n + sb.n) - c) jac
             |  FROM pairs
             |  JOIN sizes sa ON sa.doc_id = doc_a
             |  JOIN sizes sb ON sb.doc_id = doc_b
             |), edges AS (
             |  SELECT doc_a a, doc_b b FROM scored WHERE jac >= 0.8
             |  UNION ALL
             |  SELECT doc_b, doc_a FROM scored WHERE jac >= 0.8
             |), nodes AS (
             |  SELECT DISTINCT a AS doc_id FROM edges
             |), reach AS (
             |  SELECT doc_id AS src, doc_id AS dst FROM nodes
             |  UNION
             |  SELECT r.src, e.b FROM reach r JOIN edges e ON e.a = r.dst
             |), comp AS (
             |  SELECT src AS doc_id, min(dst) AS cluster_id FROM reach GROUP BY src
             |)
             |SELECT cluster_id,
             |       doc_id AS canonical_doc,
             |       CAST(count(*) OVER (PARTITION BY cluster_id) AS BIGINT)
             |         AS n_members,
             |       CAST(sum(n_chars) OVER (PARTITION BY cluster_id) AS BIGINT)
             |         AS total_chars
             |FROM comp JOIN documents USING (doc_id)
             |QUALIFY row_number() OVER (PARTITION BY cluster_id
             |                           ORDER BY n_chars DESC, doc_id ASC) = 1
             |ORDER BY cluster_id""".stripMargin),
      "Canonical-document selection — the step that turns q81's clusters " +
        "into an actual dedup decision: per near-dup cluster, keep the " +
        "richest member (max n_chars, doc_id as the total-order tiebreak) " +
        "and record how much the cluster collapses (n_members, " +
        "total_chars). One groupBy over the (doc, cluster) labels joined " +
        "to per-doc metadata: a k=1 heap aggregate carries the winner " +
        "through partial aggregation (hash-aggregated; a struct-ordered " +
        "max_by buffer would force a SortAggregate over the membership " +
        "frame), so the shuffle moves one candidate row per cluster " +
        "per partition — never the cluster's documents. Downstream, " +
        "anti-joining the corpus against (cluster members minus " +
        "canonicals) IS the dedup delete; the quality column is " +
        "swappable (model scores, recency) without touching the plan."
    ) { (s, dir) =>
      val members = nearDupLabels(s, dir)
        .select(col("id").as("doc_id"), col("comp").as("cluster_id"))
        .join(graft.Tables.documents(s, dir).select("doc_id", "n_chars"), "doc_id")
      members
        .groupBy("cluster_id")
        // k=1 heap argmax — same (n_chars DESC, doc_id ASC) winner as
        // max_by(doc_id, struct(n_chars, -doc_id)), whose struct agg
        // buffer forced a SortAggregate full-sort of the membership frame
        .agg(
          graft.functions.Sketches.topPairs(
            col("n_chars").cast("double"), col("doc_id"), 1).as("tp"),
          count(lit(1)).as("n_members"),
          sum("n_chars").as("total_chars"))
        .select(col("cluster_id"),
          element_at(col("tp.id"), 1).as("canonical_doc"),
          col("n_members"), col("total_chars"))
        .orderBy("cluster_id")
    },

    GraftQuery(
      "q244_softdedup_multiplicity",
      Some("""WITH RECURSIVE docs AS (
             |  SELECT doc_id, string_split(lower(text), ' ') w FROM documents
             |), sh0 AS (
             |  SELECT doc_id, unnest(list_distinct(list_transform(
             |           range(1, greatest(len(w)-1, 1)),
             |           i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))) s
             |  FROM docs
             |), sh AS (
             |  SELECT * FROM sh0
             |  QUALIFY count(*) OVER (PARTITION BY s) <= 64
             |), sizes AS (
             |  SELECT doc_id, count(*) n FROM sh GROUP BY doc_id
             |), pairs AS (
             |  SELECT a.doc_id doc_a, b.doc_id doc_b, count(*) c
             |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
             |  GROUP BY 1, 2
             |), scored AS (
             |  SELECT doc_a, doc_b, c*1.0/((sa.n + sb.n) - c) jac
             |  FROM pairs
             |  JOIN sizes sa ON sa.doc_id = doc_a
             |  JOIN sizes sb ON sb.doc_id = doc_b
             |), edges AS (
             |  SELECT doc_a a, doc_b b FROM scored WHERE jac >= 0.8
             |  UNION ALL
             |  SELECT doc_b, doc_a FROM scored WHERE jac >= 0.8
             |), nodes AS (
             |  SELECT DISTINCT a AS doc_id FROM edges
             |), reach AS (
             |  SELECT doc_id AS src, doc_id AS dst FROM nodes
             |  UNION
             |  SELECT r.src, e.b FROM reach r JOIN edges e ON e.a = r.dst
             |), comp AS (
             |  SELECT src AS doc_id, min(dst) AS cluster_id FROM reach GROUP BY src
             |), allc AS (
             |  SELECT d.doc_id, coalesce(c.cluster_id, d.doc_id) AS cluster_id,
             |         d.n_chars
             |  FROM documents d LEFT JOIN comp c USING (doc_id)
             |), k AS (
             |  SELECT cluster_id, doc_id AS keep_doc,
             |         CAST(count(*) OVER (PARTITION BY cluster_id) AS BIGINT)
             |           AS n_dups
             |  FROM allc
             |  QUALIFY row_number() OVER (PARTITION BY cluster_id
             |                             ORDER BY n_chars DESC, doc_id ASC) = 1
             |)
             |SELECT cluster_id, keep_doc, n_dups,
             |       CAST(least(n_dups, 4) AS BIGINT) AS repeat_n,
             |       (1000000 * least(n_dups, 4)) // n_dups AS keep_ppm
             |FROM k ORDER BY cluster_id""".stripMargin),
      "Duplicate-count-aware soft dedup — the data-constrained-scaling " +
        "practice (repeats up to ~4 epochs retain most of their value, " +
        "and a page's duplicate count is a popularity signal): instead of " +
        "hard-deleting near-dup clusters, every document lands in a " +
        "cluster (q81's components; singletons are their own), the q97 " +
        "canonical survives, and its TRAINING MULTIPLICITY is " +
        "min(cluster_size, 4) — a 50-copy boilerplate family trains 4 " +
        "times, a unique page once, and keep_ppm reports the surviving " +
        "fraction of each cluster's mass in integer ppm. One row per " +
        "cluster is the loader's repeat manifest; joining it back to the " +
        "corpus on keep_doc IS the dedup + upsample in a single pass. " +
        "Scale: rides the SAME banded shingle edges and pointer-jumping " +
        "labels as q81/q97 (nothing quadratic; the 64-doc shingle " +
        "frequency ceiling bounds bucket fan-out), the singleton " +
        "completion is a metadata-only left join on doc_id (labels exist " +
        "only for clustered docs), and the keeper selection is a k=1 heap " +
        "aggregate through partial aggregation (hash path, not a " +
        "struct-buffer SortAggregate over the corpus-sized frame) — one " +
        "candidate row per cluster per partition on the shuffle, never " +
        "document bodies."
    ) { (s, dir) =>
      val labels = nearDupLabels(s, dir)
        .select(col("id").as("doc_id"), col("comp"))
      graft.Tables.documents(s, dir).select("doc_id", "n_chars")
        .join(labels, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("comp"), col("doc_id")).as("cluster_id"),
          col("n_chars"))
        .groupBy("cluster_id")
        // k=1 heap argmax, same winner as max_by(doc_id, struct(n_chars,
        // -doc_id)) — q97's SortAggregate rationale, here over the FULL
        // corpus frame (singletons included), where the forced sort is
        // corpus-sized
        .agg(
          graft.functions.Sketches.topPairs(
            col("n_chars").cast("double"), col("doc_id"), 1).as("tp"),
          count(lit(1)).cast("long").as("n_dups"))
        .select(col("cluster_id"),
          element_at(col("tp.id"), 1).as("keep_doc"), col("n_dups"),
          least(col("n_dups"), lit(4L)).cast("long").as("repeat_n"),
          expr("(1000000 * least(n_dups, 4)) div n_dups").as("keep_ppm"))
        .orderBy("cluster_id")
    },

    GraftQuery(
      "q109_triangle_count",
      Some("""WITH docs AS (
             |  SELECT doc_id, string_split(lower(text), ' ') w FROM documents
             |), sh0 AS (
             |  SELECT doc_id, unnest(list_distinct(list_transform(
             |           range(1, greatest(len(w)-1, 1)),
             |           i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))) s
             |  FROM docs
             |), sh AS (
             |  SELECT * FROM sh0
             |  QUALIFY count(*) OVER (PARTITION BY s) <= 64
             |), sizes AS (
             |  SELECT doc_id, count(*) n FROM sh GROUP BY doc_id
             |), pairs AS (
             |  SELECT a.doc_id doc_a, b.doc_id doc_b, count(*) c
             |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
             |  GROUP BY 1, 2
             |), edges AS (
             |  SELECT doc_a a, doc_b b FROM pairs
             |  JOIN sizes sa ON sa.doc_id = doc_a
             |  JOIN sizes sb ON sb.doc_id = doc_b
             |  WHERE c*1.0/((sa.n + sb.n) - c) >= 0.8
             |), tri AS (
             |  SELECT e1.a, e1.b, e2.b AS c3
             |  FROM edges e1
             |  JOIN edges e2 ON e2.a = e1.b
             |  JOIN edges e3 ON e3.a = e1.a AND e3.b = e2.b
             |), m AS (
             |  SELECT a AS doc_id FROM tri
             |  UNION ALL SELECT b FROM tri
             |  UNION ALL SELECT c3 FROM tri
             |)
             |SELECT doc_id, count(*) AS n_triangles
             |FROM m GROUP BY doc_id
             |ORDER BY doc_id""".stripMargin),
      "Triangle counting on the near-dup graph — the local-clustering " +
        "signal that separates tight duplicate CLIQUES (template families, " +
        "mirror sites: every member pairwise-similar) from star-shaped " +
        "chains around one hub document, which q81's components cannot " +
        "distinguish. Edges are oriented low-id→high-id, so each triangle " +
        "is enumerated exactly once as (a<b<c) — the compact-forward " +
        "pattern that makes distributed triangle counting feasible: the " +
        "candidate join extends a<b by b<c and closes with an (a,c) " +
        "hash-probe, two equi-joins on id, never a cross product; at " +
        "100 TB you orient by DEGREE instead of id (same plan, provably " +
        "O(m^1.5) candidates). The edge list is MATERIALIZED once " +
        "(Staging's policy: reliable checkpoint when a dir is set, " +
        "eager localCheckpoint locally — q81's discipline) " +
        "before the three-way self-join: left in one plan, the whole " +
        "shingle→pair pipeline would execute three times, since the " +
        "three branch subtrees differ post-aggregation and ReuseExchange " +
        "cannot collapse them."
    ) { (s, dir) =>
      val e = DedupQueries.jaccardEdges(s, dir)
      val ab = e.toDF("a", "b")
      val bc = e.toDF("b2", "c3")
      val ac = e.toDF("a3", "c4")
      ab.join(bc, col("b") === col("b2"))
        .join(ac, col("a") === col("a3") && col("c3") === col("c4"))
        .select(explode(array(col("a"), col("b"), col("c3"))).as("doc_id"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_triangles"))
        .orderBy("doc_id")
    },

    GraftQuery(
      "q129_khop_neighborhood",
      Some("""WITH docs AS (
             |  SELECT doc_id, string_split(lower(text), ' ') w FROM documents
             |), sh0 AS (
             |  SELECT doc_id, unnest(list_distinct(list_transform(
             |           range(1, greatest(len(w)-1, 1)),
             |           i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))) s
             |  FROM docs
             |), sh AS (
             |  SELECT * FROM sh0
             |  QUALIFY count(*) OVER (PARTITION BY s) <= 64
             |), sizes AS (
             |  SELECT doc_id, count(*) n FROM sh GROUP BY doc_id
             |), pairs AS (
             |  SELECT a.doc_id doc_a, b.doc_id doc_b, count(*) c
             |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
             |  GROUP BY 1, 2
             |), edges AS (
             |  SELECT doc_a a, doc_b b FROM pairs
             |  JOIN sizes sa ON sa.doc_id = doc_a
             |  JOIN sizes sb ON sb.doc_id = doc_b
             |  WHERE c*1.0/((sa.n + sb.n) - c) >= 0.8
             |), sym AS (
             |  SELECT a, b FROM edges UNION ALL SELECT b, a FROM edges
             |), n1 AS (
             |  SELECT a, CAST(count(DISTINCT b) AS BIGINT) AS n_1hop
             |  FROM sym GROUP BY a
             |), two AS (
             |  SELECT DISTINCT e1.a, e2.b AS c
             |  FROM sym e1 JOIN sym e2 ON e1.b = e2.a
             |  WHERE e1.a <> e2.b
             |    AND NOT EXISTS (SELECT 1 FROM sym s
             |                    WHERE s.a = e1.a AND s.b = e2.b)
             |), n2 AS (
             |  SELECT a, CAST(count(*) AS BIGINT) AS n_2hop_new FROM two GROUP BY a
             |)
             |SELECT n1.a AS doc_id, n_1hop,
             |       COALESCE(n_2hop_new, 0) AS n_2hop_new
             |FROM n1 LEFT JOIN n2 USING (a)
             |ORDER BY doc_id""".stripMargin),
      "K-hop neighborhood expansion (k=2) on the near-dup graph — the " +
        "contamination-blast-radius question ('if this doc is bad, what " +
        "does it touch transitively within 2 steps?') that components " +
        "(everything, eventually) and triangles (k=1 density) don't " +
        "answer. One edge-join per hop — BFS frontier expansion as " +
        "relational algebra: hop-2 candidates come from a single " +
        "self-equi-join of the symmetrized edge list, dedup'd, minus " +
        "self and minus the 1-hop set via LEFT ANTI (the NOT EXISTS a " +
        "SQL user writes, executed as a hash anti-join, never per-row). " +
        "The edge list materializes ONCE (q109's discipline) and every " +
        "join keys on node id. At 100 TB k stays small because frontier " +
        "size is the product of average degree — each additional hop is " +
        "one more join stage, the same plan shape GraphFrames' BFS " +
        "emits, and degree-capped sampling bounds the hub blowup."
    ) { (s, dir) =>
      val e = DedupQueries.jaccardEdges(s, dir)
      val sym = e.select(col("doc_a").as("a"), col("doc_b").as("b"))
        .unionAll(e.select(col("doc_b").as("a"), col("doc_a").as("b")))
      val n1 = sym.groupBy("a").agg(countDistinct(col("b")).as("n_1hop"))
      val twoHop = sym.alias("e1")
        .join(sym.alias("e2"), col("e1.b") === col("e2.a"))
        .select(col("e1.a").as("a"), col("e2.b").as("c"))
        .filter(col("a") =!= col("c"))
        .distinct()
        .join(sym.toDF("a", "c"), Seq("a", "c"), "left_anti")
      n1.join(twoHop.groupBy("a").agg(count(lit(1)).as("n_2hop_new")), Seq("a"), "left")
        .select(col("a").as("doc_id"), col("n_1hop"),
          coalesce(col("n_2hop_new"), lit(0L)).as("n_2hop_new"))
        .orderBy("doc_id")
    },

    GraftQuery(
      "q137_cluster_terms",
      Some("""WITH RECURSIVE docs AS (
             |  SELECT doc_id, string_split(lower(text), ' ') w FROM documents
             |), sh0 AS (
             |  SELECT doc_id, unnest(list_distinct(list_transform(
             |           range(1, greatest(len(w)-1, 1)),
             |           i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))) s
             |  FROM docs
             |), sh AS (
             |  SELECT * FROM sh0
             |  QUALIFY count(*) OVER (PARTITION BY s) <= 64
             |), sizes AS (
             |  SELECT doc_id, count(*) n FROM sh GROUP BY doc_id
             |), pairs AS (
             |  SELECT a.doc_id doc_a, b.doc_id doc_b, count(*) c
             |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
             |  GROUP BY 1, 2
             |), scored AS (
             |  SELECT doc_a, doc_b, c*1.0/((sa.n + sb.n) - c) jac
             |  FROM pairs
             |  JOIN sizes sa ON sa.doc_id = doc_a
             |  JOIN sizes sb ON sb.doc_id = doc_b
             |), edges AS (
             |  SELECT doc_a a, doc_b b FROM scored WHERE jac >= 0.8
             |  UNION ALL
             |  SELECT doc_b, doc_a FROM scored WHERE jac >= 0.8
             |), nodes AS (
             |  SELECT DISTINCT a AS doc_id FROM edges
             |), reach AS (
             |  SELECT doc_id AS src, doc_id AS dst FROM nodes
             |  UNION
             |  SELECT r.src, e.b FROM reach r JOIN edges e ON e.a = r.dst
             |), comp AS (
             |  SELECT src AS doc_id, min(dst) AS cluster_id FROM reach GROUP BY src
             |), toks AS (
             |  SELECT c.cluster_id, unnest(string_split(lower(d.text), ' ')) AS term
             |  FROM comp c JOIN documents d USING (doc_id)
             |), tf AS (
             |  SELECT cluster_id, term, CAST(count(*) AS BIGINT) AS tf
             |  FROM toks GROUP BY 1, 2
             |), nc AS (
             |  SELECT CAST(count(DISTINCT cluster_id) AS BIGINT) AS n FROM tf
             |), dfreq AS (
             |  SELECT term, CAST(count(DISTINCT cluster_id) AS BIGINT) AS df
             |  FROM tf GROUP BY term
             |), sc AS (
             |  SELECT cluster_id, term,
             |         CAST(floor(tf * (CAST(n - df AS DOUBLE) + 0.5)
             |                       / (CAST(df AS DOUBLE) + 0.5)
             |                    * 1000000.0) AS BIGINT) AS score_micros
             |  FROM tf JOIN dfreq USING (term) CROSS JOIN nc
             |)
             |SELECT cluster_id, CAST(rk AS BIGINT) AS rk, term, score_micros
             |FROM (SELECT *, row_number() OVER (PARTITION BY cluster_id
             |                ORDER BY score_micros DESC, term) AS rk FROM sc)
             |WHERE rk <= 3
             |ORDER BY cluster_id, rk""".stripMargin),
      "Cluster characterization (c-TF-IDF, the BERTopic labeling step): " +
        "each near-dup cluster's member documents pool into one virtual " +
        "document, term frequency weighs against how many OTHER clusters " +
        "use the term — q113's rational idf shape over clusters instead " +
        "of documents, floored to integer micros so the ranking compares " +
        "exactly — and the top-3 terms become the cluster's label, the " +
        "human-auditable answer to 'what IS this duplicate family'. " +
        "Cluster labels come from the memoized connected-components " +
        "fixed point (one run serves q81/q97/q137); tokens explode only " +
        "for CLUSTER MEMBERS (the corpus at large never tokenizes — " +
        "inner join prunes first), tf aggregates map-side, cluster " +
        "count and per-term df are metadata-scale broadcasts. The " +
        "oracle recomputes the closure recursively and replays the " +
        "identical integer scoring."
    ) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val labels = nearDupLabels(s, dir)
        .select(col("id").as("doc_id"), col("comp").as("cluster_id"))
      val tf = Tables.documents(s, dir)
        .join(broadcast(labels), "doc_id")
        .select(col("cluster_id"),
          explode(split(lower(col("text")), " ")).as("term"))
        .groupBy("cluster_id", "term").agg(count(lit(1)).as("tf"))
      val nc = tf.agg(countDistinct(col("cluster_id")).as("n"))
      val dfreq = tf.groupBy("term").agg(countDistinct(col("cluster_id")).as("df"))
      tf.join(broadcast(dfreq), "term")
        .crossJoin(broadcast(nc))
        .select(col("cluster_id"), col("term"),
          floor(col("tf") * ((col("n") - col("df")).cast("double") + lit(0.5))
            / (col("df").cast("double") + lit(0.5))
            * lit(1000000.0)).as("score_micros"))
        .withColumn("rk", row_number().over(
          Window.partitionBy("cluster_id")
            .orderBy(col("score_micros").desc, col("term"))).cast("long"))
        .filter(col("rk") <= 3)
        .select(col("cluster_id"), col("rk"), col("term"), col("score_micros"))
        .orderBy("cluster_id", "rk")
    },

    GraftQuery(
      "q142_leakage_safe_split",
      Some("""WITH RECURSIVE docs AS (
             |  SELECT doc_id, string_split(lower(text), ' ') w FROM documents
             |), sh0 AS (
             |  SELECT doc_id, unnest(list_distinct(list_transform(
             |           range(1, greatest(len(w)-1, 1)),
             |           i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))) s
             |  FROM docs
             |), sh AS (
             |  SELECT * FROM sh0
             |  QUALIFY count(*) OVER (PARTITION BY s) <= 64
             |), sizes AS (
             |  SELECT doc_id, count(*) n FROM sh GROUP BY doc_id
             |), pairs AS (
             |  SELECT a.doc_id doc_a, b.doc_id doc_b, count(*) c
             |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
             |  GROUP BY 1, 2
             |), scored AS (
             |  SELECT doc_a, doc_b, c*1.0/((sa.n + sb.n) - c) jac
             |  FROM pairs
             |  JOIN sizes sa ON sa.doc_id = doc_a
             |  JOIN sizes sb ON sb.doc_id = doc_b
             |), edges AS (
             |  SELECT doc_a a, doc_b b FROM scored WHERE jac >= 0.8
             |  UNION ALL
             |  SELECT doc_b, doc_a FROM scored WHERE jac >= 0.8
             |), nodes AS (
             |  SELECT DISTINCT a AS doc_id FROM edges
             |), reach AS (
             |  SELECT doc_id AS src, doc_id AS dst FROM nodes
             |  UNION
             |  SELECT r.src, e.b FROM reach r JOIN edges e ON e.a = r.dst
             |), comp AS (
             |  SELECT src AS doc_id, min(dst) AS cluster_id FROM reach GROUP BY src
             |), grouped AS (
             |  SELECT d.doc_id, coalesce(c.cluster_id, d.doc_id) AS grp,
             |         c.cluster_id IS NOT NULL AS clustered
             |  FROM documents d LEFT JOIN comp c USING (doc_id)
             |), assigned AS (
             |  SELECT g.doc_id, g.grp, g.clustered,
             |         CASE WHEN substr(sha256(cd.text), 1, 2) < 'cc' THEN 'train'
             |              WHEN substr(sha256(cd.text), 1, 2) < 'e6' THEN 'val'
             |              ELSE 'test' END AS split
             |  FROM grouped g JOIN documents cd ON cd.doc_id = g.grp
             |)
             |SELECT split, CAST(count(*) AS BIGINT) AS n_docs,
             |       CAST(count(*) FILTER (clustered) AS BIGINT) AS n_clustered_docs,
             |       CAST(count(DISTINCT grp) AS BIGINT) AS n_groups
             |FROM assigned GROUP BY split
             |ORDER BY split""".stripMargin),
      "LEAKAGE-SAFE dataset split — q83's content-hash split upgraded " +
        "with the guarantee q83 cannot give: near-DUPLICATES (not just " +
        "exact copies) land in the same split, because the split key is " +
        "the CANONICAL member's content hash for every near-dup cluster " +
        "(memoized connected-components labels; singletons hash their " +
        "own text). Without this, a test document's 0.9-Jaccard twin " +
        "sits in train and the eval is contaminated — the known failure " +
        "mode of per-document splits on undeduplicated corpora, and the " +
        "reason dedup must precede splitting in a real pipeline. One " +
        "broadcast of the tiny label set, one join to fetch canonical " +
        "text (group-count scale, not corpus scale), then q83's pure-" +
        "map CASE; the audit reports how many documents moved under a " +
        "cluster's canonical key. The oracle recomputes the closure " +
        "recursively and replays the identical assignment."
    ) { (s, dir) =>
      val labels = nearDupLabels(s, dir)
        .select(col("id").as("doc_id"), col("comp").as("cluster_id"))
      // canonical members' hashes: corpus scan probed by the BROADCAST
      // tiny canonical-id set — the result is group-count scale
      val canonHash = Tables.documents(s, dir)
        .join(broadcast(labels.select(col("cluster_id").as("doc_id")).distinct()),
          "doc_id")
        .select(col("doc_id").as("cluster_id"),
          substring(sha2(col("text"), 256), 1, 2).as("ch"))
      // (member doc -> canonical hash) override, still tiny; every other
      // document hashes ITSELF map-side — the corpus never joins the corpus
      val overrides = labels.join(canonHash, "cluster_id")
        .select(col("doc_id"), col("cluster_id"), col("ch"))
      Tables.documents(s, dir)
        .select(col("doc_id"),
          substring(sha2(col("text"), 256), 1, 2).as("own_h"))
        .join(broadcast(overrides), Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("cluster_id"), col("doc_id")).as("grp"),
          col("cluster_id").isNotNull.as("clustered"),
          coalesce(col("ch"), col("own_h")).as("h"))
        .select(col("doc_id"), col("grp"), col("clustered"),
          when(col("h") < "cc", "train")
            .when(col("h") < "e6", "val").otherwise("test").as("split"))
        .groupBy("split")
        .agg(count(lit(1)).as("n_docs"),
          count(when(col("clustered"), lit(1))).as("n_clustered_docs"),
          countDistinct(col("grp")).as("n_groups"))
        .orderBy("split")
    },

    GraftQuery(
      "q102_pagerank",
      Some("""WITH e0 AS (
             |  SELECT DISTINCT -l.l_suppkey AS s, o.o_custkey AS c
             |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
             |), edges AS (
             |  SELECT s AS src, c AS dst FROM e0
             |  UNION ALL
             |  SELECT c AS src, s AS dst FROM e0
             |), deg AS (
             |  SELECT src, count(*) AS d FROM edges GROUP BY src
             |), r0 AS (
             |  SELECT src AS node, CAST(1000000 AS BIGINT) AS r FROM deg
             |), r1 AS (
             |  SELECT e.dst AS node, 150000 + sum((r.r * 85) // (100 * g.d)) AS r
             |  FROM edges e JOIN r0 r ON r.node = e.src JOIN deg g ON g.src = e.src
             |  GROUP BY e.dst
             |), r2 AS (
             |  SELECT e.dst AS node, 150000 + sum((r.r * 85) // (100 * g.d)) AS r
             |  FROM edges e JOIN r1 r ON r.node = e.src JOIN deg g ON g.src = e.src
             |  GROUP BY e.dst
             |), r3 AS (
             |  SELECT e.dst AS node, 150000 + sum((r.r * 85) // (100 * g.d)) AS r
             |  FROM edges e JOIN r2 r ON r.node = e.src JOIN deg g ON g.src = e.src
             |  GROUP BY e.dst
             |)
             |SELECT node, CAST(r AS BIGINT) AS rank_micros FROM r3
             |ORDER BY node""".stripMargin),
      "PageRank (3 power iterations, damping 0.85) over the bipartite " +
        "supplier↔customer graph extracted from order lines — the " +
        "importance-propagation shape used to weight training sources by " +
        "link structure. All arithmetic is INTEGER micros with per-edge " +
        "truncating division, so every contribution is order-independent " +
        "and the fixed point is bit-identical across engines, partition " +
        "counts and re-runs — a float PageRank cannot promise that " +
        "(summation order drifts the low bits). Suppliers get negative " +
        "node ids, so one BIGINT key spans both vertex families with no " +
        "tagging column. Each round is ONE co-partitioned join of the " +
        "checkpointed edge list against the rank table plus a map-side-" +
        "combined sum — the canonical message-passing round (same " +
        "execution skeleton as q81's components); the oracle unrolls the " +
        "three rounds as chained CTEs, no recursion needed for a fixed " +
        "iteration count."
    ) { (s, dir) =>
      val e0 = Tables
        .lineitem(s, dir).select(col("l_orderkey"), col("l_suppkey"))
        .join(Tables.orders(s, dir).select(col("o_orderkey"), col("o_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .select((-col("l_suppkey")).as("src0"), col("o_custkey").as("dst0"))
        .distinct()
      val edges = e0.select(col("src0").as("src"), col("dst0").as("dst"))
        .union(e0.select(col("dst0").as("src"), col("src0").as("dst")))
      pageRankMicros(edges, iters = 3)
        .select(col("node"), col("r").as("rank_micros"))
        .orderBy("node")
    }
  )

  /** Integer-micros PageRank: ranks start at 1 000 000, each round every
    * node keeps 150 000 (the 0.15 teleport share) plus the sum of
    * `(r·85) div (100·outdeg)` over its in-edges. Truncating integer
    * division per edge makes each round a sum of exact integers —
    * order-independent, so the result is reproducible bit-for-bit at any
    * parallelism, which a floating-point PageRank cannot guarantee.
    * The edge list and degree table are materialized once
    * ([[graft.Staging]]'s policy, as [[connectedComponents]] — reliable
    * `checkpoint` when a dir is configured, eager `localCheckpoint`
    * locally); each round shuffles only (node, rank). */
  def pageRankMicros(edges0: DataFrame, iters: Int): DataFrame = {
    val edges = edges0.select(col("src"), col("dst")).staged
    val deg = edges.groupBy("src").agg(count(lit(1)).as("d")).staged
    val ranks0 = deg.select(col("src").as("node"), lit(1000000L).as("r"))
    if (iters == 0) {
      // no round ever consumes the degree-annotated edge list — don't
      // stage it (r17, ADVICE: the unconditional build was a wasted
      // staging job plus a leaked checkpoint on this path)
      Staging.release(edges)
      ranks0
    } else {
      // Attach the out-degree to the edge list ONCE: `d` is round-
      // invariant, and the old per-round `.join(deg, "src")` rebuilt the
      // same broadcast relation every iteration — iters joins collapse to
      // one here, and each round is exactly one join + one map-side-
      // combined sum. Same integer per-edge arithmetic, bit-identical
      // fixed point.
      val edgesD = edges.join(deg, "src").staged
      Staging.release(edges)
      var ranks = ranks0
      var i = 0
      while (i < iters) {
        val prev = ranks
        ranks = edgesD.join(ranks, edgesD("src") === ranks("node"))
          .select(col("dst"), expr("(r * 85) div (100 * d)").as("c"))
          .groupBy("dst").agg(sum("c").as("sc"))
          .select(col("dst").as("node"), (lit(150000L) + col("sc")).as("r"))
          .staged
        if (i > 0) Staging.release(prev)
        i += 1
      }
      // the returned ranks is independently checkpointed (iters ≥ 1), so
      // the inputs can be released now — connectedComponents' discipline
      Staging.release(edgesD)
      Staging.release(deg)
      ranks
    }
  }
}
