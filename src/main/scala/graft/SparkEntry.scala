package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * The engine's operator surface is assembled from per-family modules; each
  * query is a [[GraftQuery]] carrying its Spark implementation, its DuckDB
  * oracle (when SQL-expressible) and its 100 TB scale rationale.
  */
object SparkEntry {

  /** Every registered operator, in catalog order. */
  def catalog: Seq[GraftQuery] =
    operators.RelationalQueries.all ++
      operators.JoinQueries.all ++
      operators.WindowQueries.all ++
      functions.ScalarQueries.all ++
      operators.EventQueries.all ++
      operators.DedupQueries.all ++
      operators.ClusterQueries.all ++
      operators.SimilarityQueries.all ++
      functions.TextQueries.all ++
      operators.AvroQueries.all ++
      operators.MultimodalQueries.all ++
      operators.SqlQueries.all ++
      operators.AnalyticsQueries.all ++
      operators.StatQueries.all ++
      operators.CurationQueries.all ++
      operators.SelectionQueries.all ++
      operators.RefineQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's own pipeline in batch form — Avro decode(encode(row))
    * plus the key := value.id projection (SURVEY.md §2.1 R2/R3/R7). */
  def entry(spark: SparkSession): DataFrame =
    queries("q50_replication_project")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    GraftQuery.runMap(catalog)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    GraftQuery.oracleMap(catalog)
}
