package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graft.{ColumnBridge, DotProductD}

/** Column facade over the engine's native Catalyst vector expressions
  * (org.apache.spark.sql.graft.VectorExpressions). */
object VectorFunctions {
  /** Dot product of two `array<double>` columns — codegen'd, zero-alloc. */
  def dotd(a: Column, b: Column): Column =
    ColumnBridge.column(DotProductD(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
