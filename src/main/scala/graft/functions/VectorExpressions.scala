package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graft.{ColumnBridge, DotProductD, SignCodeD, ZOrderCode}

/** Column facade over the engine's native Catalyst vector expressions
  * (org.apache.spark.sql.graft.VectorExpressions). */
object VectorFunctions {
  /** Dot product of two `array<double>` columns — codegen'd, zero-alloc. */
  def dotd(a: Column, b: Column): Column =
    ColumnBridge.column(DotProductD(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Sign-LSH bucket code of an `array<double>` vector against `bits`
    * hyperplanes (row-major `bits × dim`) — one fused pass, codegen'd. */
  def signCode(v: Column, planes: Array[Double], bits: Int, dim: Int): Column =
    ColumnBridge.column(SignCodeD(ColumnBridge.expression(v), planes, bits, dim))

  /** 64-bit Z-order (Morton) key of two 32-bit dimension codes — the
    * two-dimensional layout sort key; codegen'd. */
  def zorder(x: Column, y: Column): Column =
    ColumnBridge.column(ZOrderCode(ColumnBridge.expression(x), ColumnBridge.expression(y)))
}
