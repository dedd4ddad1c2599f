package graft

import org.apache.spark.sql.DataFrame

/** Lineage-truncation policy for the iterative fixed-point operators
  * (connected components, k-means, PageRank): each round must cut the plan
  * tree or the optimizer re-analyzes a join-per-round pyramid.
  *
  * The cut is RELIABLE when the session has a checkpoint directory
  * configured (`sc.setCheckpointDir` — at 100 TB, a durable warehouse
  * path): `checkpoint(eager)` writes the round's frame to that directory,
  * so losing an executor mid-iteration recomputes from files instead of
  * failing the query — `localCheckpoint` blocks live only on executor
  * disk/memory and Spark CANNOT recompute them, which makes a lost
  * executor fatal to any in-flight iterative query on a real cluster.
  *
  * With no checkpoint dir configured (the local dev/bench sessions), the
  * cut falls back to eager `localCheckpoint` — same call shape, zero I/O,
  * correct at any local[n] scale where executor loss means process death
  * anyway. One policy switch, visible to every iterative operator, instead
  * of a per-call-site choice; StagingSpec pins that the reliable branch
  * actually lands files under the configured directory and that the
  * fixed-point results are identical under either policy.
  */
object Staging {

  /** Truncate `df`'s lineage eagerly under the session's checkpoint
    * policy: reliable `checkpoint` when a checkpoint dir is set, eager
    * `localCheckpoint` otherwise. */
  def stage(df: DataFrame): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined)
      df.checkpoint(eager = true)
    else df.localCheckpoint(eager = true)

  /** `.staged` suffix form, so iterative pipelines read like the
    * checkpoint calls they replace. */
  implicit class StagingOps(private val df: DataFrame) extends AnyVal {
    def staged: DataFrame = Staging.stage(df)
  }
}
