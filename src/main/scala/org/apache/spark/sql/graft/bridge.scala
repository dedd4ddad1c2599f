package org.apache.spark.sql.graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{Expression, ScalarSubquery}
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's `private[sql]` Column ↔ Expression conversions, so the
  * engine's native Catalyst expressions (graft.functions.VectorExpressions)
  * can be exposed as ordinary `Column`s. Lives under `org.apache.spark.sql`
  * solely for access; contains no logic.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Wrap a one-row, one-column DataFrame as an uncorrelated scalar
    * subquery `Column` — evaluated once per query, then visible to
    * expressions as a constant (the shape [[BloomMightContain]] requires). */
  def scalarSubquery(df: DataFrame): Column =
    ExpressionUtils.column(ScalarSubquery(
      df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
        .queryExecution.analyzed))
}
