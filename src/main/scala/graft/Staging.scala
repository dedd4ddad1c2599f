package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.DataFrame

/** Lineage-truncation policy for the iterative fixed-point operators
  * (connected components, k-means, PageRank): each round must cut the plan
  * tree or the optimizer re-analyzes a join-per-round pyramid.
  *
  * The cut is RELIABLE when the session has a checkpoint directory
  * configured (`sc.setCheckpointDir` — at 100 TB, a durable warehouse
  * path): the round's frame is written to parquet under that directory in
  * ONE job and read back, so losing an executor mid-iteration recomputes
  * from files instead of failing the query — `localCheckpoint` blocks live
  * only on executor disk/memory and Spark CANNOT recompute them, which
  * makes a lost executor fatal to any in-flight iterative query on a real
  * cluster. Writing parquet ourselves rather than `Dataset.checkpoint`
  * buys two things `checkpoint` gets wrong for per-round staging:
  * `checkpoint(eager)` COMPUTES THE FRAME TWICE on an unpersisted Dataset
  * (the eager action's job, then the checkpoint-write job recomputes every
  * partition), and Spark never deletes reliable checkpoint files by
  * default — a long fixed-point run would permanently accumulate one full
  * copy of the frame per round. Here each round costs one job, and
  * [[release]] deletes a superseded round's files the moment the next
  * round is materialized, so the directory holds at most two round frames
  * per operator at any instant.
  *
  * With no checkpoint dir configured (the local dev/bench sessions), the
  * cut falls back to eager `localCheckpoint` — same call shape, zero I/O,
  * correct at any local[n] scale where executor loss means process death
  * anyway, and [[release]] degrades to `unpersist()`. One policy switch,
  * visible to every iterative operator, instead of a per-call-site choice;
  * StagingSpec pins that the reliable branch actually lands files under
  * the configured directory, that the fixed-point results are identical
  * under either policy, and that superseded round files are gone when the
  * operator returns.
  */
object Staging {

  private val counter = new AtomicLong()
  // Identity-keyed: the staged DataFrame object IS the handle to its
  // files. Entries are removed on release; frames never released (the
  // operator's returned fixed point) keep their files, which is the point.
  private val stagedPaths = java.util.Collections.synchronizedMap(
    new java.util.IdentityHashMap[DataFrame, String]())

  /** Truncate `df`'s lineage eagerly under the session's checkpoint
    * policy: one parquet-write job + read-back under the configured
    * checkpoint dir, eager `localCheckpoint` otherwise. */
  def stage(df: DataFrame): DataFrame =
    df.sparkSession.sparkContext.getCheckpointDir match {
      case Some(dir) =>
        val path = s"$dir/graft-stage-${counter.incrementAndGet()}"
        df.write.parquet(path)
        val out = df.sparkSession.read.parquet(path)
        stagedPaths.put(out, path)
        out
      case None => df.localCheckpoint(eager = true)
    }

  /** Release a superseded staged frame: delete its round files under the
    * reliable policy (via the Hadoop filesystem of the path, so HDFS-style
    * warehouse dirs release too), `unpersist()` under the local one. */
  def release(df: DataFrame): Unit = {
    val path = stagedPaths.remove(df)
    if (path != null) {
      val hp = new org.apache.hadoop.fs.Path(path)
      hp.getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration)
        .delete(hp, true)
      ()
    } else {
      df.unpersist()
      ()
    }
  }

  /** `.staged` suffix form, so iterative pipelines read like the
    * checkpoint calls they replace. */
  implicit class StagingOps(private val df: DataFrame) extends AnyVal {
    def staged: DataFrame = Staging.stage(df)
  }
}
