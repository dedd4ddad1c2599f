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
    * ([PARQUET_TYPE_ILLEGAL]). Read the nanos as raw long
    * (`spark.sql.legacy.parquet.nanosAsLong`) and truncate to microseconds —
    * exactly the coercion DuckDB applies reading TIMESTAMP_NS into TIMESTAMP,
    * so oracle comparisons stay bit-identical.
    */
  def events(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    s.read.parquet(p(dir, "events"))
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
}
