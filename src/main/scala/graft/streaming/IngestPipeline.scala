package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.operators.{DedupQueries, IndexLifecycle}

/** The COMPOSED training-ingest admission pipeline (VERDICT r15 item 4):
  * the admission stages exist separately — decontamination
  * ([[StatefulOps.decontaminateAdmit]]), dedup admitters, token budgets,
  * postings append — but production runs them in ONE order on ONE
  * checkpointed stream. Each micro-batch of `(doc_id, lang, text)` runs:
  *
  *   1. DECONTAMINATE — q282's excision against the frozen eval-window
  *      index (broadcast membership probe; doc-local transform);
  *   2. EXACT-DEDUP ADMIT — the verbatim grain: a doc whose CLEANED
  *      text's digest matches an ADMITTED doc's is rejected (q38/q69's
  *      first-writer keeper, at arrival order; the span-grain excision
  *      operators q114/q277 compose here identically when a deployment
  *      wants sub-document granularity);
  *   3. NEAR-DUP ADMIT — SimHash pairs of the cleaned batch against the
  *      ADMITTED postings pillar plus the batch itself
  *      ([[IndexLifecycle.simhashBatchPairsAt]], q289's union-capped
  *      admission), greedily resolved in arrival order so only ADMITTED
  *      docs block (a rejected near-dup never shadows a later arrival —
  *      the chunking-invariance requirement);
  *   4. TOKEN-BUDGET ADMIT — per-lang running budget over the cleaned
  *      BPE-ish token count (q69's tokenizer), admit-in-arrival-order;
  *      a rejected doc consumes nothing and never blocks anyone;
  *   5. POSTINGS APPEND + MANIFEST — the admitted docs' signatures
  *      commit into the pillar (so the next batch admits against them),
  *      their digests land in the digest store, and ONE per-batch
  *      admission manifest records every doc's verdict and why.
  *
  * Exactly-once is the idempotent-foreachBatch discipline
  * ([[StatefulOps.decontaminateAdmit]]'s contract, extended to a
  * pipeline with CROSS-BATCH state): every landed artifact is
  * partitioned `batch=<id>` and OVERWRITTEN whole; the pillar version
  * the batch admitted against is recorded at first processing and
  * re-read on replay (the pillar itself has advanced — decisions must
  * not); budget and digest state re-derive from durable per-batch
  * artifacts with batch < id only, resolved as one consolidated
  * SNAPSHOT plus a bounded tail (per-batch read cost O(snapEvery),
  * not O(batches)). So a replayed epoch recomputes bit-identical
  * decisions and rewrites byte-identical files, and the pillar append
  * replays as its documented anti-join no-op. Retention on the ingest
  * pillar excludes [[ingestPinnedVersions]] — the versions committed
  * epochs re-decide against on replay.
  *
  * Scale: stages 1–3's heavy work (excision, signatures, banded pairs)
  * is distributed and batch-sized; only the per-doc FEATURE rows and the
  * admission-touching PAIRS are collected for the greedy resolution —
  * admission-sized driver work, the q289 discipline (a batch's verdicts
  * are a sequential function of arrival order; the corpus never moves).
  * The greedy's blocking state is the ADMITTED corpus alone, which is
  * why the decisions are chunking-invariant: any split of the same
  * arrival order yields the same admitted set (wherever no banded
  * bucket saturates — the standing streaming-admission caveat). */
object IngestPipeline {

  /** One doc's admission verdict — the manifest row. */
  final case class IngestDecision(doc_id: Long, lang: String,
                                  n_tokens: Long, excised_tokens: Long,
                                  clean_tokens: Long, exact_dup: Boolean,
                                  near_dup: Boolean, over_budget: Boolean,
                                  admitted: Boolean)

  /** Default admission-state snapshot cadence (batches). */
  val SnapEvery: Int = 8

  /** Start the composed checkpointed ingest: `docs` streams
    * (doc_id, lang, text); artifacts land under `base`
    * (manifest/, digests/, pillarv/, snap/, pillar/). Every `snapEvery`
    * batches the pipeline lands a consolidated admission-state snapshot
    * so per-batch state reads stay O(snapEvery), not O(batches). */
  def ingestAdmit(docs: DataFrame, evalW: DataFrame, budgetPerLang: Long,
                  base: String, checkpoint: String,
                  snapEvery: Int = SnapEvery)
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], id: Long) =>
        processBatch(batch.sparkSession, batch.toDF(), id, evalW,
          budgetPerLang, base, snapEvery)
      }
      .option("checkpointLocation", checkpoint)
      .outputMode(OutputMode.Append())
      .start()

  /** The SAME stages composed over one corpus frame in one pass (empty
    * initial state) — the batch sibling the spec pins the stream to,
    * row-for-row. Returns the manifest ordered by doc_id. */
  def ingestAdmitBatch(s: SparkSession, docs: DataFrame, evalW: DataFrame,
                       budgetPerLang: Long): DataFrame = {
    import s.implicits._
    val feats = features(s, docs, evalW).persist()
    try {
      val pairs = DedupQueries.simhashNearDupPairsUnsorted(
          DedupQueries.textSimhashSigsFor(
            feats.select(col("doc_id"), col("text_clean").as("text"))))
        .select("doc_a", "doc_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq
      val ids = feats.select("doc_id").collect().map(_.getLong(0)).toSet
      greedy(collectFeats(feats), Set.empty, pairs, ids,
        scala.collection.mutable.Map.empty, budgetPerLang)
        .toDS().toDF().orderBy("doc_id")
    } finally { feats.unpersist(); () }
  }

  // ---------- per-batch machinery ----------

  /** Stage-1 output plus the stage-2/4 features: (doc_id, lang,
    * n_tokens, excised_tokens, text_clean, digest, clean_tokens). */
  private def features(s: SparkSession, docs: DataFrame,
                       evalW: DataFrame): DataFrame =
    DedupQueries.exciseAgainst(docs.select("doc_id", "text"), evalW)
      .join(docs.select("doc_id", "lang"), "doc_id")
      .withColumn("digest", sha2(col("text_clean"), 256))
      .withColumn("clean_tokens",
        size(regexp_extract_all(lower(col("text_clean")),
          lit("[a-z]+|[0-9]|[^a-z0-9 ]"), lit(0))).cast("long"))

  private final case class Feat(doc_id: Long, lang: String, n_tokens: Long,
                                excised: Long, digest: String,
                                cleanTokens: Long)

  private def collectFeats(feats: DataFrame): Seq[Feat] =
    feats.select("doc_id", "lang", "n_tokens", "excised_tokens", "digest",
        "clean_tokens")
      .collect()
      .map(r => Feat(r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getString(4), r.getLong(5)))
      .sortBy(_.doc_id).toSeq

  /** The arrival-order greedy over one batch: blocking state is the
    * ADMITTED corpus only (stored digests + stored-side pair partners,
    * both admitted by construction of the stores) plus the docs this
    * walk admits. */
  private def greedy(feats: Seq[Feat], storedDigestHits: Set[String],
                     pairs: Seq[(Long, Long)], batchIds: Set[Long],
                     consumed: scala.collection.mutable.Map[String, Long],
                     budget: Long): Seq[IngestDecision] = {
    // pair partners per batch doc: stored partners always block (the
    // pillar holds admitted docs only); batch partners block iff they
    // are EARLIER arrivals that this walk admits
    val storedBlocked = scala.collection.mutable.Set.empty[Long]
    val batchBlockers = scala.collection.mutable
      .Map.empty[Long, List[Long]].withDefaultValue(Nil)
    pairs.foreach { case (x, y) =>
      (batchIds(x), batchIds(y)) match {
        case (true, true) =>
          val (early, late) = if (x < y) (x, y) else (y, x)
          batchBlockers(late) = early :: batchBlockers(late)
        case (true, false) => storedBlocked += x
        case (false, true) => storedBlocked += y
        case _ => ()
      }
    }
    val admittedHere = scala.collection.mutable.Set.empty[Long]
    val admittedDigests = scala.collection.mutable.Set.empty[String]
    feats.map { f =>
      val exactDup = storedDigestHits(f.digest) ||
        admittedDigests(f.digest)
      val nearDup = storedBlocked(f.doc_id) ||
        batchBlockers(f.doc_id).exists(admittedHere)
      val used = consumed.getOrElse(f.lang, 0L)
      val overBudget = used + f.cleanTokens > budget
      val admitted = !exactDup && !nearDup && !overBudget
      if (admitted) {
        admittedHere += f.doc_id
        admittedDigests += f.digest
        consumed(f.lang) = used + f.cleanTokens
      }
      IngestDecision(f.doc_id, f.lang, f.n_tokens, f.excised, f.cleanTokens,
        exactDup, nearDup, overBudget, admitted)
    }
  }

  /** private[graft]: the spec re-drives a committed epoch through this
    * seam to pin replay determinism without forcing a mid-commit crash. */
  private[graft] def processBatch(s: SparkSession, batch: DataFrame, id: Long,
                                  evalW: DataFrame, budget: Long,
                                  base: String,
                                  snapEvery: Int = SnapEvery): Unit = {
    import s.implicits._
    val root = s"$base/pillar"
    ensurePillar(s, root)
    val vPre = pinnedVersion(s, base, id, root)
    val tdPre = pinnedTakedownSeq(s, base, id)
    val feats = features(s, batch, evalW).persist()
    try {
      val batchSigs = DedupQueries.textSimhashSigsFor(
        feats.select(col("doc_id"), col("text_clean").as("text")))
      val pairs = IndexLifecycle.simhashBatchPairsAt(s, root, vPre, batchSigs)
        .select("doc_a", "doc_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq
      val storedHits = feats.select("digest")
        .join(digestsBefore(s, base, id, tdPre), Seq("digest"), "left_semi")
        .distinct().collect().map(_.getString(0)).toSet
      val ids = feats.select("doc_id").collect().map(_.getLong(0)).toSet
      val consumed = scala.collection.mutable.Map.empty[String, Long]
      consumedBefore(s, base, id).foreach { case (l, n) => consumed(l) = n }
      val decisions = greedy(collectFeats(feats), storedHits, pairs, ids,
        consumed, budget)

      decisions.toDS().toDF().coalesce(1).write.mode("overwrite")
        .parquet(s"$base/manifest/batch=$id")
      val admitted = decisions.filter(_.admitted).map(_.doc_id).toSet
      decisions.filter(d => admitted(d.doc_id))
        .map(_.doc_id).toDF("doc_id")
        .join(feats.select("doc_id", "digest"), "doc_id")
        .select("doc_id", "digest").coalesce(1).write.mode("overwrite")
        .parquet(s"$base/digests/batch=$id")
      if (admitted.nonEmpty) {
        // mask the append with takedowns AFTER the pinned horizon: on a
        // crash-replay that interleaved with a takedown, the deleted docs
        // are absent from the current pillar and the plain anti-join
        // would resurrect them — decisions keep the pinned horizon, the
        // append honors every takedown committed since
        val admittedSigs = batchSigs
          .join(admitted.toSeq.toDF("doc_id"), Seq("doc_id"), "left_semi")
        IndexLifecycle.appendSimhashPostings(s, root,
          takedownsAfter(s, base, tdPre).fold(admittedSigs)(td =>
            admittedSigs.join(td, Seq("doc_id"), "left_anti")))
        ()
      }
      maybeSnapshot(s, base, id, snapEvery)
    } finally { feats.unpersist(); () }
  }

  /** Install an empty v=1 pillar when none exists — the pipeline's
    * zero-state start. */
  private def ensurePillar(s: SparkSession, root: String): Unit =
    if (IndexLifecycle.latestVersion(root).isEmpty) {
      import s.implicits._
      IndexLifecycle.installSimhashPostings(s, root, 1L,
        Seq.empty[(Long, Long)].toDF("doc_id", "sim"))
      ()
    }

  private def deleteRecursively(p: java.nio.file.Path): Unit =
    if (java.nio.file.Files.exists(p)) {
      val st = java.nio.file.Files.walk(p)
      try st.sorted(java.util.Comparator.reverseOrder())
        .forEach(x => { java.nio.file.Files.delete(x); () })
      finally st.close()
    }

  /** A per-batch artifact directory counts as committed only with its
    * `_SUCCESS` marker — a crash mid-write leaves a created-but-
    * footer-less directory, and treating THAT as committed wedges every
    * replay on an unreadable frame (the exact crash-recovery scenario
    * these directories exist to serve). */
  private def committedDir(dir: String): Boolean =
    java.nio.file.Files.exists(java.nio.file.Paths.get(dir, "_SUCCESS"))

  /** Read-or-commit one pinned scalar at `dir` with the store's own
    * staging + ATOMIC_MOVE discipline: the value is written to a private
    * staging path and renamed into place, so a crash can never leave a
    * half-written pin that an exists-check would route to the read path
    * (uncommitted debris from a pre-rename crash is deleted and
    * rewritten). On a lost rename race the committed pin wins and is
    * re-read — one batch, one pin, whatever the interleaving. */
  private def pinnedScalar(s: SparkSession, dir: String, colName: String)
                          (compute: => Long): Long = {
    def readPin(): Long =
      s.read.schema(s"$colName BIGINT").parquet(dir).head.getLong(0)
    if (committedDir(dir)) return readPin()
    val target = java.nio.file.Paths.get(dir)
    deleteRecursively(target) // footer-less debris of a crashed write
    val v = compute
    java.nio.file.Files.createDirectories(target.getParent)
    val staging = java.nio.file.Files
      .createTempDirectory(target.getParent, ".pin-")
    val data = staging.resolve("d")
    s.range(1).select(lit(v).as(colName)).coalesce(1)
      .write.mode("overwrite").parquet(data.toString)
    try java.nio.file.Files.move(data, target,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    catch { case _: java.nio.file.FileSystemException => () } // race lost
    deleteRecursively(staging)
    readPin()
  }

  /** The pillar version batch `id` admits against — recorded at first
    * processing, re-read on replay so a replayed epoch decides against
    * the SAME store state even though the pillar advanced. */
  private def pinnedVersion(s: SparkSession, base: String, id: Long,
                            root: String): Long =
    pinnedScalar(s, s"$base/pillarv/batch=$id", "v")(
      IndexLifecycle.latestVersion(root).getOrElse(1L))

  // ---------- bounded admission-state bookkeeping ----------
  //
  // The pipeline's only per-batch growth terms were digestsBefore /
  // consumedBefore re-reading EVERY prior batch=N partition (VERDICT r15
  // item 3): correct and replay-safe, but a long-running ingest paid an
  // O(batches) listing + scan tax per micro-batch. Every `snapEvery`
  // batches the pipeline now lands a consolidated SNAPSHOT of the
  // admission state (`snap/upto=N`: the RAW admitted digest set and the
  // per-lang consumed totals of all batches < N), and the per-batch
  // reads resolve one snapshot + the ≤snapEvery tail partitions, listed
  // driver-side by NIO — O(snapEvery) per batch, however long the run.
  // Replay determinism is untouched: a snapshot is a PURE FUNCTION of
  // the immutable per-batch partitions below its boundary, so whichever
  // committed snapshot ≤ id a replayed epoch resolves, the derived state
  // is bit-identical to the partition-by-partition read it replaces —
  // and takedown masking stays at read time under the epoch's PINNED
  // horizon (baking a mask into the snapshot would freeze one horizon
  // for every future epoch). The snapshot write itself is index-sized
  // (40-byte digest rows) and amortized O(size/snapEvery) per batch; the
  // per-batch READ cost is what had to stop growing.

  private def emptyDigests(s: SparkSession): DataFrame =
    s.range(0).select(lit(0L).as("doc_id"), lit("").as("digest"))

  /** Committed `batch=N` subdirectories of `base/sub` with
    * `from <= N < until`, listed driver-side (never a directory-glob
    * Spark scan — the unbounded listing was the growth term). */
  private def committedBatchDirs(base: String, sub: String, from: Long,
                                 until: Long): Seq[String] = {
    val dir = java.nio.file.Paths.get(base, sub)
    if (!java.nio.file.Files.exists(dir)) return Seq.empty
    val st = java.nio.file.Files.list(dir)
    val ids =
      try {
        import scala.jdk.CollectionConverters._
        st.iterator().asScala.map(_.getFileName.toString)
          .filter(_.startsWith("batch="))
          .map(_.stripPrefix("batch=").toLong)
          .filter(n => n >= from && n < until)
          .toSeq.sorted
      } finally st.close()
    ids.map(n => s"$base/$sub/batch=$n").filter(committedDir)
  }

  /** Committed snapshot boundaries, ascending. */
  private def snapshotUptos(base: String): Seq[Long] = {
    val dir = java.nio.file.Paths.get(base, "snap")
    if (!java.nio.file.Files.exists(dir)) return Seq.empty
    val st = java.nio.file.Files.list(dir)
    val us =
      try {
        import scala.jdk.CollectionConverters._
        st.iterator().asScala.map(_.getFileName.toString)
          .filter(_.startsWith("upto="))
          .map(_.stripPrefix("upto=").toLong).toSeq.sorted
      } finally st.close()
    us.filter(u => committedDir(s"$base/snap/upto=$u/digests") &&
      committedDir(s"$base/snap/upto=$u/consumed"))
  }

  /** The newest committed snapshot usable by batch `id` (boundary ≤ id).
    * Any usable snapshot derives identical state — the choice moves only
    * how many tail partitions the read unions. */
  private def snapshotFor(base: String, id: Long): Option[Long] =
    snapshotUptos(base).filter(_ <= id).maxOption

  /** Raw (takedown-unmasked) digests admitted by batches BEFORE `id`:
    * one snapshot + the tail partitions past its boundary. */
  private def rawDigestsBefore(s: SparkSession, base: String,
                               id: Long): DataFrame = {
    val snapUpto = snapshotFor(base, id)
    val tail = committedBatchDirs(base, "digests", snapUpto.getOrElse(0L), id)
    val parts = snapUpto.map(u =>
        s.read.schema("doc_id BIGINT, digest STRING")
          .parquet(s"$base/snap/upto=$u/digests")).toSeq ++
      (if (tail.isEmpty) Seq.empty
       else Seq(s.read.schema("doc_id BIGINT, digest STRING")
         .parquet(tail: _*)))
    if (parts.isEmpty) emptyDigests(s) else parts.reduce(_ unionByName _)
  }

  /** Digests of every doc admitted by batches BEFORE `id` and not since
    * taken down (tombstone sequences ≤ `tdSeq` — the pinned takedown
    * horizon, so a replayed epoch sees the same blocking set it first
    * decided against). */
  private def digestsBefore(s: SparkSession, base: String, id: Long,
                            tdSeq: Long): DataFrame = {
    val live = rawDigestsBefore(s, base, id)
    takedownsThrough(s, base, tdSeq).fold(live)(td =>
      live.join(td, Seq("doc_id"), "left_anti"))
  }

  /** Per-lang consumed totals of batches BEFORE `id` as a frame:
    * snapshot totals + the tail manifests' sums. */
  private def rawConsumedBefore(s: SparkSession, base: String,
                                id: Long): DataFrame = {
    val snapUpto = snapshotFor(base, id)
    val tail = committedBatchDirs(base, "manifest", snapUpto.getOrElse(0L), id)
    val parts = snapUpto.map(u =>
        s.read.schema("lang STRING, n BIGINT")
          .parquet(s"$base/snap/upto=$u/consumed")).toSeq ++
      (if (tail.isEmpty) Seq.empty
       else Seq(s.read
         .schema("lang STRING, clean_tokens BIGINT, admitted BOOLEAN")
         .parquet(tail: _*)
         .filter(col("admitted"))
         .groupBy("lang").agg(sum("clean_tokens").as("n"))))
    if (parts.isEmpty) s.range(0).select(lit("").as("lang"), lit(0L).as("n"))
    else parts.reduce(_ unionByName _).groupBy("lang")
      .agg(sum("n").as("n"))
  }

  /** Land the consolidated admission-state snapshot at boundary
    * `id + 1` when the cadence fires. The consolidation is a rolling
    * fold — previous snapshot + its tail, never a rescan of history —
    * committed by staging + ATOMIC_MOVE and idempotent (a committed
    * snapshot's content is a pure function of the immutable per-batch
    * partitions below its boundary, so a replayed boundary keeps it). */
  private def maybeSnapshot(s: SparkSession, base: String, id: Long,
                            snapEvery: Int): Unit = {
    val upto = id + 1
    if (snapEvery <= 0 || upto % snapEvery != 0) return
    val target = java.nio.file.Paths.get(s"$base/snap/upto=$upto")
    if (committedDir(target.resolve("digests").toString) &&
      committedDir(target.resolve("consumed").toString)) return
    deleteRecursively(target)
    java.nio.file.Files.createDirectories(target.getParent)
    val staging = java.nio.file.Files
      .createTempDirectory(target.getParent, ".snap-")
    val data = staging.resolve("d")
    rawDigestsBefore(s, base, upto).write.mode("overwrite")
      .parquet(data.resolve("digests").toString)
    rawConsumedBefore(s, base, upto).coalesce(1).write.mode("overwrite")
      .parquet(data.resolve("consumed").toString)
    try java.nio.file.Files.move(data, target,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    catch { case _: java.nio.file.FileSystemException => () } // race lost
    deleteRecursively(staging)
  }

  /** Every pillar version some committed ingest epoch pinned — the
    * retention exclusion set for the ingest pillar, exactly
    * [[IndexLifecycle.releasePinnedVersions]]'s role for releases: a
    * keep=N prune must not reclaim a version a replayed epoch would
    * re-decide against (that would break the replay-determinism
    * contract the pins exist to keep). */
  def ingestPinnedVersions(s: SparkSession, base: String): Set[Long] = {
    val dirs = committedBatchDirs(base, "pillarv", 0L, Long.MaxValue)
    if (dirs.isEmpty) Set.empty
    else s.read.schema("v BIGINT").parquet(dirs: _*)
      .distinct().collect().map(_.getLong(0)).toSet
  }

  /** Retention for the ingest pillar with the epoch pins excluded. */
  def pruneIngestPillar(s: SparkSession, base: String,
                        keep: Int = 2): (Int, Int) =
    IndexLifecycle.pruneVersions(s"$base/pillar", keep,
      ingestPinnedVersions(s, base))

  /** Tombstoned doc_ids across takedown sequences ≤ `seq`. */
  private def takedownsThrough(s: SparkSession, base: String,
                               seq: Long): Option[DataFrame] = {
    val dir = s"$base/takedowns"
    if (seq <= 0 ||
      !java.nio.file.Files.exists(java.nio.file.Paths.get(dir))) None
    else Some(s.read.schema("doc_id BIGINT").parquet(dir)
      .withColumn("seq",
        regexp_extract(input_file_name(), "seq=(\\d+)", 1).cast("long"))
      .filter(col("seq") <= seq).select("doc_id"))
  }

  private def committedTakedownSeqs(base: String): Seq[Long] = {
    val dir = java.nio.file.Paths.get(base, "takedowns")
    if (!java.nio.file.Files.exists(dir)) return Seq.empty
    val st = java.nio.file.Files.list(dir)
    try {
      import scala.jdk.CollectionConverters._
      st.iterator().asScala.map(_.getFileName.toString)
        .filter(_.startsWith("seq=")).map(_.stripPrefix("seq=").toLong)
        .toSeq
    } finally st.close()
  }

  /** The takedown horizon batch `id` decides against — recorded at first
    * processing (the max committed tombstone sequence), re-read on
    * replay: a takedown landing AFTER a batch committed must not change
    * that batch's replayed decisions. */
  private def pinnedTakedownSeq(s: SparkSession, base: String,
                                id: Long): Long =
    pinnedScalar(s, s"$base/tdv/batch=$id", "seq")(
      committedTakedownSeqs(base).maxOption.getOrElse(0L))

  /** Tombstoned doc_ids with takedown sequence STRICTLY AFTER `seq` —
    * the takedowns that landed after a batch pinned its horizon. A
    * replayed epoch masks its pillar append with these: the takedown
    * already removed those docs from the pillar, so a replay whose
    * anti-join sees them absent would silently RE-APPEND (resurrect)
    * deleted content — the append must stay a no-op for them while the
    * batch's admission decisions keep their pinned horizon. */
  private def takedownsAfter(s: SparkSession, base: String,
                             seq: Long): Option[DataFrame] = {
    val dir = s"$base/takedowns"
    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(dir))) None
    else Some(s.read.schema("doc_id BIGINT").parquet(dir)
      .withColumn("seq",
        regexp_extract(input_file_name(), "seq=(\\d+)", 1).cast("long"))
      .filter(col("seq") > seq).select("doc_id"))
  }

  /** TAKEDOWN PROPAGATION for the composed ingest — the delete verb that
    * closes the admission lifecycle: the deleted docs leave the postings
    * pillar (so future batches' near-dup stage stops pairing against
    * them — [[IndexLifecycle.takedownSimhashPostings]]'s consolidated
    * survivor commit) and a doc_id tombstone sequence masks their
    * digests (so a re-offered verbatim copy of REMOVED content is
    * admittable again — removed content is not duplicate content).
    * Admission manifests stay untouched: decisions already made are
    * historical facts, and consumed budget is NOT refunded (the budget
    * accounts what was ingested over time). Replay stays deterministic
    * both ways: in-flight and replayed epochs decide against their
    * PINNED pillar version and takedown horizon, so a takedown landing
    * mid-stream changes only batches first processed after it. Returns
    * the committed tombstone sequence. */
  def ingestTakedown(s: SparkSession, base: String,
                     deleted: DataFrame): Long = {
    val seq = committedTakedownSeqs(base).maxOption.getOrElse(0L) + 1
    deleted.select(col("doc_id")).distinct().coalesce(1)
      .write.mode("overwrite").parquet(s"$base/takedowns/seq=$seq")
    IndexLifecycle.takedownSimhashPostings(s, s"$base/pillar", deleted)
    seq
  }

  /** Per-lang tokens consumed by batches BEFORE `id`, re-derived from
    * durable state (snapshot + tail manifests — never from mutable
    * driver state). */
  private def consumedBefore(s: SparkSession, base: String,
                             id: Long): Map[String, Long] =
    rawConsumedBefore(s, base, id).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap

  /** The union manifest of a (possibly restarted) run, ordered by
    * doc_id — what the spec compares against [[ingestAdmitBatch]]. */
  def manifestOf(s: SparkSession, base: String): DataFrame =
    s.read.parquet(s"$base/manifest")
      .select("doc_id", "lang", "n_tokens", "excised_tokens",
        "clean_tokens", "exact_dup", "near_dup", "over_budget", "admitted")
      .orderBy("doc_id")
}
