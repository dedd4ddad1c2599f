package graft.operators

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** Table-layout maintenance: the operators a 100 TB pipeline runs BETWEEN
  * queries so the queries stay fast.
  *
  * Streaming ingest and fine-grained batch jobs leave thousands of small
  * files per partition; scan cost then goes to task scheduling and footer
  * reads instead of IO, and nothing is sorted so min/max row-group pruning
  * never fires. Compaction rewrites a directory into size-targeted,
  * SORT-CLUSTERED files: `repartitionByRange` on the cluster key gives
  * disjoint key ranges per file (range exchange with a sampled boundary
  * pass), `sortWithinPartitions` orders rows inside each file, and the
  * parquet writer then emits tight min/max stats — so a later filter on the
  * key prunes whole files/row-groups by footer alone.
  */
object Layout {

  final case class CompactionStats(
      inputFiles: Long, outputFiles: Long, rows: Long, bytes: Long)

  /** Rewrite `inDir` (parquet) into `outDir` as ~`targetBytes`-sized files
    * range-clustered and sorted by `sortCol`. Returns before/after stats.
    * File count derives from the INPUT's on-disk size (compressed) — the
    * honest predictor of output size for a rewrite, read from the file
    * listing, no Spark job. */
  def compact(s: SparkSession, inDir: String, outDir: String,
              sortCol: String, targetBytes: Long = 128L << 20): CompactionStats =
    compactBy(s, inDir, outDir, col(sortCol), targetBytes)

  /** [[compact]] on an arbitrary cluster-key EXPRESSION — e.g.
    * `VectorFunctions.zorder(x, y)` for a two-dimensional Morton layout,
    * where every output file's footer is tight on BOTH dimensions and a
    * filter on either one prunes files (lakehouse OPTIMIZE ZORDER). The
    * key is computed inside the write's scan stage and not persisted. */
  def compactBy(s: SparkSession, inDir: String, outDir: String,
                sortExpr: Column, targetBytes: Long = 128L << 20): CompactionStats = {
    // same hardened walk the table loaders use (recursive, skips
    // _SUCCESS/dot entries) — not a second, weaker listing
    val inFiles = graft.Tables.parquetFiles(s, inDir)
    val totalBytes = inFiles.map(_.getLen).sum
    val nOut = math.max(1L, (totalBytes + targetBytes - 1) / targetBytes).toInt
    val in = s.read.parquet(inDir)
    // withColumn would silently REPLACE a same-named input column and the
    // drop below would then delete the user's data from the rewrite
    require(!in.columns.contains("__graft_cluster_key"),
      "input already has a __graft_cluster_key column")
    val keyed = in.withColumn("__graft_cluster_key", sortExpr)
    keyed.repartitionByRange(nOut, col("__graft_cluster_key"))
      .sortWithinPartitions("__graft_cluster_key")
      .drop("__graft_cluster_key")
      .write.mode("overwrite").parquet(outDir)
    // row fidelity from the output FOOTERS — a count() here would re-read
    // the whole rewritten table as a second job
    CompactionStats(inFiles.length.toLong,
      graft.Tables.parquetFiles(s, outDir).length.toLong,
      graft.Tables.parquetRowCountAt(s, outDir), totalBytes)
  }
}
