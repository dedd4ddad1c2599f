package graft

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.SparkContext

import graft.operators.ClusterQueries

/** Pins [[Staging]]'s lineage-truncation policy — the fault-tolerance
  * contract of every iterative operator (CC / k-means / PageRank):
  *
  *  - no checkpoint dir configured → eager localCheckpoint (zero files;
  *    the local dev/bench posture);
  *  - checkpoint dir configured → RELIABLE parquet staging (one write job
  *    per round, read back from files), with the round frames demonstrably
  *    landing under the configured directory — the 100 TB posture where a
  *    lost executor mid-iteration must recompute from files instead of
  *    killing the query (Spark cannot recompute a localCheckpoint block);
  *  - superseded round files are DELETED as the fixed point advances, so
  *    a long run's checkpoint dir never grows past the live frames;
  *  - the fixed point itself is IDENTICAL under either policy.
  */
class StagingSpec extends SparkSpec {

  /** checkpointDir is private[spark] (public in bytecode): save/restore it
    * around the reliable-policy tests so the shared session's policy is
    * untouched for every other suite. */
  private def setCheckpointDir(sc: SparkContext, dir: Option[String]): Unit =
    classOf[SparkContext].getMethod("checkpointDir_$eq", classOf[Option[String]])
      .invoke(sc, dir)

  private def checkpointFiles(dir: String): Seq[String] = {
    val root = Paths.get(dir)
    if (!Files.exists(root)) Seq.empty
    else {
      val st = Files.walk(root)
      try st.iterator().asScala.filter(Files.isRegularFile(_))
        .map(_.toString).toSeq
      finally st.close()
    }
  }

  /** Staged round directories still on disk — the disk-growth contract:
    * superseded rounds are deleted, so only the frames the operator still
    * references (its returned fixed point) may remain. */
  private def stageDirs(dir: String): Seq[String] = {
    val root = Paths.get(dir)
    if (!Files.exists(root)) Seq.empty
    else {
      // setCheckpointDir nests a per-context UUID dir — walk, don't list
      val st = Files.walk(root)
      try st.iterator().asScala
        .filter(p => p.getFileName.toString.startsWith("graft-stage-"))
        .map(_.toString).toSeq
      finally st.close()
    }
  }

  test("staging without a checkpoint dir stays local; with one, files land under it") {
    import spark.implicits._
    val sc = spark.sparkContext
    val prev = sc.getCheckpointDir
    // two components: {1,2,3} chained and {10,11}
    val edges = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("a", "b")

    setCheckpointDir(sc, None)
    val localLabels =
      try ClusterQueries.connectedComponents(edges).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      finally setCheckpointDir(sc, prev.map(_.toString))
    assert(localLabels === Set((1L, 1L), (2L, 1L), (3L, 1L),
      (10L, 10L), (11L, 10L)))

    val dir = Files.createTempDirectory("graft_staging").toString
    setCheckpointDir(sc, None)
    try {
      sc.setCheckpointDir(dir)
      val reliableLabels = ClusterQueries.connectedComponents(edges).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(reliableLabels === localLabels,
        "fixed point must be identical under either staging policy")
      assert(checkpointFiles(dir).nonEmpty,
        s"reliable staging must write round frames under $dir")
      assert(stageDirs(dir).size === 1,
        s"superseded CC rounds must be deleted (only the returned labels " +
          s"frame may keep files): ${stageDirs(dir)}")
    } finally setCheckpointDir(sc, prev.map(_.toString))
  }

  test("k-means stages reliably under a configured dir with an unchanged cost contract") {
    import spark.implicits._
    val sc = spark.sparkContext
    val prev = sc.getCheckpointDir
    val vecs = (0L until 40L)
      .map(i => (i, Array((i % 4).toDouble, (i % 4).toDouble * 2)))
      .toDF("id", "v")
    val dir = Files.createTempDirectory("graft_staging_km").toString
    setCheckpointDir(sc, None)
    try {
      sc.setCheckpointDir(dir)
      val (cents, costs) = ClusterQueries.kmeans(vecs, k = 4, maxIter = 10)
      assert(cents.count() === 4L)
      assert(costs.nonEmpty && costs.zip(costs.tail).forall {
        case (a, b) => b <= a + 1e-9
      }, s"cost sequence must be monotone non-increasing: $costs")
      assert(checkpointFiles(dir).nonEmpty,
        s"reliable staging must write round frames under $dir")
      assert(stageDirs(dir).size === 1,
        s"superseded k-means rounds must be deleted (only the returned " +
          s"centroid frame may keep files): ${stageDirs(dir)}")
    } finally setCheckpointDir(sc, prev.map(_.toString))
  }
}
