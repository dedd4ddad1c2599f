package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable operator of the engine.
  *
  * @param name   stable id, becomes the key in `SparkEntry.queries`
  * @param oracle equivalent DuckDB SQL over the same parquet tables, when the
  *               operator is SQL-expressible (None → driver runs a weaker
  *               rows-only check)
  * @param note   100 TB scale strategy: partitioning, shuffle behavior,
  *               broadcast decisions — the design rationale the operator
  *               carries to a 1000-executor cluster
  * @param run    the Spark implementation: (session, sfDir) => result
  *
  * Determinism contract: every query ends in a total-order `orderBy` (ties
  * broken by a key column) and rounds floating-point aggregates, so the
  * driver's sorted-column value-hash compare is stable across engines.
  */
final case class GraftQuery(
    name: String,
    oracle: Option[String],
    note: String)(
    val run: (SparkSession, String) => DataFrame)

object GraftQuery {
  def oracleMap(qs: Seq[GraftQuery]): Map[String, String] =
    qs.flatMap(q => q.oracle.map(q.name -> _)).toMap
  def runMap(qs: Seq[GraftQuery]): Map[String, (SparkSession, String) => DataFrame] =
    qs.map(q => q.name -> q.run).toMap
}
