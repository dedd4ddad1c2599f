package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated parquet tables (see /root/repo/TESTDATA.md
  * and FIXTURES.md). All reads are plain `spark.read.parquet` so Catalyst's
  * predicate pushdown / column pruning reach the scan untouched.
  */
object Tables {
  private def p(dir: String, name: String) = s"$dir/$name.parquet"

  def region(s: SparkSession, dir: String): DataFrame   = s.read.parquet(p(dir, "region"))
  def nation(s: SparkSession, dir: String): DataFrame   = s.read.parquet(p(dir, "nation"))
  def customer(s: SparkSession, dir: String): DataFrame = s.read.parquet(p(dir, "customer"))
  def supplier(s: SparkSession, dir: String): DataFrame = s.read.parquet(p(dir, "supplier"))
  def part(s: SparkSession, dir: String): DataFrame     = s.read.parquet(p(dir, "part"))
  def orders(s: SparkSession, dir: String): DataFrame   = s.read.parquet(p(dir, "orders"))
  def lineitem(s: SparkSession, dir: String): DataFrame = s.read.parquet(p(dir, "lineitem"))
  def documents(s: SparkSession, dir: String): DataFrame  = s.read.parquet(p(dir, "documents"))
  def embeddings(s: SparkSession, dir: String): DataFrame = s.read.parquet(p(dir, "embeddings"))

  /** `events.ts` is parquet `TIMESTAMP(NANOS)`, which Spark 4 rejects
    * ([PARQUET_TYPE_ILLEGAL]). The session must be BUILT with
    * `spark.sql.legacy.parquet.nanosAsLong=true` (all engine session
    * builders set it — Verify/Bench/RunOne/BenchOne/SparkSpec); the nanos
    * long is truncated to microseconds — exactly the coercion DuckDB applies
    * reading TIMESTAMP_NS into TIMESTAMP, so oracle comparisons stay
    * bit-identical. This loader deliberately does NOT mutate session conf:
    * a load-time `conf.set` would race concurrent queries in the session.
    */
  /** Total row count from parquet footers — metadata only, NO Spark job.
    * Index-sizing inputs (q42's tile count, q67's LSH code width) are
    * resolved during PLAN CONSTRUCTION, where launching a count job would
    * be a scale bug (and breaks explain-only callers). Footers already
    * carry the exact row count; at 100 TB this is the same listing the
    * scan itself performs. Cached by (path, mtime, size) per file so a
    * rewritten corpus at the same path re-reads its footers.
    */
  def parquetRowCount(s: SparkSession, dir: String, table: String): Long = {
    import org.apache.hadoop.fs.Path
    val conf = s.sessionState.newHadoopConf()
    val root = new Path(p(dir, table))
    val fs = root.getFileSystem(conf)
    val st = fs.getFileStatus(root)
    val files =
      if (st.isDirectory)
        fs.listStatus(root).toSeq
          .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
      else Seq(st)
    val key = files.map(f => s"${f.getPath}@${f.getModificationTime}:${f.getLen}")
      .sorted.mkString("|")
    rowCountCache.getOrElseUpdate(key, files.map { f =>
      val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromStatus(f, conf)
      val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      try r.getRecordCount finally r.close()
    }.sum)
  }
  private val rowCountCache = scala.collection.concurrent.TrieMap.empty[String, Long]

  def events(s: SparkSession, dir: String): DataFrame = {
    require(s.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") == "true",
      "session must be built with spark.sql.legacy.parquet.nanosAsLong=true " +
        "to read events.parquet (TIMESTAMP_NANOS)")
    s.read.parquet(p(dir, "events"))
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
}
