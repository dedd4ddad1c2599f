package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated parquet tables (see /root/repo/TESTDATA.md
  * and FIXTURES.md). All reads are plain `spark.read.parquet` so Catalyst's
  * predicate pushdown / column pruning reach the scan untouched.
  */
object Tables {
  private def p(dir: String, name: String) = s"$dir/$name.parquet"

  /** Read with a cached, explicit schema: parquet schema inference launches
    * a (tiny but real) Spark job per `spark.read.parquet` call, so every
    * plan construction — explain, bench rebuild loops, Verify — paid one
    * job per table referenced. The schema is inferred ONCE per (path,
    * mtime/size) and passed explicitly afterwards; a rewritten table at the
    * same path re-infers. Inference runs under the caller's session conf,
    * so conf-sensitive schemas (events' nanosAsLong) cache correctly per
    * the required session setup. */
  private def read(s: SparkSession, dir: String, name: String): DataFrame = {
    val path = p(dir, name)
    val schema = schemaCache.getOrElseUpdate(s"$path@${fingerprint(s, path)}",
      s.read.parquet(path).schema)
    s.read.schema(schema).parquet(path)
  }
  private val schemaCache =
    scala.collection.concurrent.TrieMap.empty[String, org.apache.spark.sql.types.StructType]

  /** Every data file under `path`, recursively (Spark-written tables nest
    * part files and don't always use a .parquet suffix); hidden/metadata
    * entries (`_SUCCESS`, dot-files) are skipped the way Spark's own file
    * listing skips them. Fails loudly on an empty table rather than letting
    * a silent 0 mis-size every footer-driven index parameter. */
  private[graft] def parquetFiles(s: SparkSession, path: String) = {
    import org.apache.hadoop.fs.{FileStatus, Path}
    val fs = new Path(path).getFileSystem(s.sessionState.newHadoopConf())
    def walk(st: FileStatus): Seq[FileStatus] = {
      val name = st.getPath.getName
      if (name.startsWith("_") || name.startsWith(".")) Nil
      else if (st.isDirectory) fs.listStatus(st.getPath).toSeq.flatMap(walk)
      else Seq(st)
    }
    val files = walk(fs.getFileStatus(new Path(path)))
    require(files.nonEmpty, s"no data files under $path")
    files
  }

  /** (mtime, length) of every file under `path` — the invalidation key for
    * the schema and row-count caches. */
  private[graft] def fingerprint(s: SparkSession, path: String): String =
    parquetFiles(s, path)
      .map(f => s"${f.getPath}@${f.getModificationTime}:${f.getLen}")
      .sorted.mkString("|")

  def region(s: SparkSession, dir: String): DataFrame   = read(s, dir, "region")
  def nation(s: SparkSession, dir: String): DataFrame   = read(s, dir, "nation")
  def customer(s: SparkSession, dir: String): DataFrame = read(s, dir, "customer")
  def supplier(s: SparkSession, dir: String): DataFrame = read(s, dir, "supplier")
  def part(s: SparkSession, dir: String): DataFrame     = read(s, dir, "part")
  def orders(s: SparkSession, dir: String): DataFrame   = read(s, dir, "orders")
  def lineitem(s: SparkSession, dir: String): DataFrame = read(s, dir, "lineitem")
  def documents(s: SparkSession, dir: String): DataFrame  = read(s, dir, "documents")
  def embeddings(s: SparkSession, dir: String): DataFrame = read(s, dir, "embeddings")

  /** Total row count from parquet footers — metadata only, NO Spark job.
    * Index-sizing inputs (q42's tile count, q67's LSH code width) are
    * resolved during PLAN CONSTRUCTION, where launching a count job would
    * be a scale bug (and breaks explain-only callers). Footers already
    * carry the exact row count; at 100 TB this is the same listing the
    * scan itself performs. Cached by (path, mtime, size) per file so a
    * rewritten corpus at the same path re-reads its footers.
    */
  def parquetRowCount(s: SparkSession, dir: String, table: String): Long =
    parquetRowCountAt(s, p(dir, table))

  private[graft] def parquetRowCountAt(s: SparkSession, path: String): Long = {
    val conf = s.sessionState.newHadoopConf()
    rowCountCache.getOrElseUpdate(s"$path@${fingerprint(s, path)}",
      parquetFiles(s, path).map { f =>
        val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromStatus(f, conf)
        val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
        try r.getRecordCount finally r.close()
      }.sum)
  }
  private val rowCountCache = scala.collection.concurrent.TrieMap.empty[String, Long]

  /** `events.ts` — the physical timestamp encoding is a DRIVER choice that
    * has changed between corpus generations, so it is PROBED from the loaded
    * schema, never assumed (the r5 regression: a hard-coded nanos branch
    * broke 42 queries when the corpus switched to micros). All shapes
    * normalize to session-TZ `TimestampType` carrying the same instant:
    *
    *  - `LongType`: parquet TIMESTAMP(NANOS) read under
    *    `spark.sql.legacy.parquet.nanosAsLong=true` (Spark 4 otherwise
    *    rejects NANOS with [PARQUET_TYPE_ILLEGAL]); truncate to micros —
    *    the same coercion DuckDB applies reading TIMESTAMP_NS.
    *  - `TimestampNTZType`: parquet TIMESTAMP(MICROS, isAdjustedToUTC=false)
    *    (the corpus shape since Aug 13). The cast to TimestampType
    *    reinterprets the wall-clock in the session time zone — which every
    *    engine entry point pins to UTC (GraftSession.scala:28), so the
    *    instant matches what DuckDB reads. HarnessContractSpec asserts the
    *    UTC precondition; a non-UTC session would shift instants silently.
    *  - `TimestampType`: TIMESTAMP(isAdjustedToUTC=true) — already an
    *    instant; pass through.
    *
    * The require for nanosAsLong applies only on the nanos branch; micros
    * corpora load in any session. This loader deliberately does NOT mutate
    * session conf: a load-time `conf.set` would race concurrent queries.
    */
  def events(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    // A TIMESTAMP(NANOS) file in a session without nanosAsLong fails inside
    // read()'s schema resolution ([PARQUET_TYPE_ILLEGAL]), BEFORE the dataType
    // probe below — so the guidance must wrap the read, not just the branch
    // (the require inside the LongType arm still covers the cached-schema
    // path, where another session's inference bypassed resolution).
    val raw =
      try read(s, dir, "events")
      catch {
        case e: Throwable if String.valueOf(e.getMessage).contains("PARQUET_TYPE_ILLEGAL") =>
          throw new IllegalStateException(
            "events.parquet carries TIMESTAMP(NANOS); build the session with " +
              "spark.sql.legacy.parquet.nanosAsLong=true (GraftSession does) " +
              "to read it",
            e)
      }
    raw.schema("ts").dataType match {
      case LongType =>
        require(s.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") == "true",
          "session must be built with spark.sql.legacy.parquet.nanosAsLong=true " +
            "to read a TIMESTAMP(NANOS) events.parquet")
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType    => raw
      case other => throw new IllegalStateException(
        s"events.ts has unsupported physical type $other at $dir — " +
          "expected long nanos, TIMESTAMP_NTZ micros, or TIMESTAMP")
    }
  }
}
