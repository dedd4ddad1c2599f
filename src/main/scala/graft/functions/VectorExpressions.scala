package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graft.{ColumnBridge, DotProductD, DotProductL, EqCountL, ProjectD, SignCodeD, SqDistD, ZOrderCode}

/** Column facade over the engine's native Catalyst vector expressions
  * (org.apache.spark.sql.graft.VectorExpressions). */
object VectorFunctions {
  /** Dot product of two `array<double>` columns — codegen'd, zero-alloc. */
  def dotd(a: Column, b: Column): Column =
    ColumnBridge.column(DotProductD(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Squared L2 distance of two `array<double>` columns — one fused
    * codegen loop; the native form of `aggregate(zip_with((a-b)²))`,
    * which is an interpreted HOF on Spark 4's hot path. */
  def sqdistd(a: Column, b: Column): Column =
    ColumnBridge.column(SqDistD(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Exact integer dot product of two `array<long>` columns — the SQ8
    * code-scan scorer; codegen'd. */
  def dotl(a: Column, b: Column): Column =
    ColumnBridge.column(DotProductL(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Sign-LSH bucket code of an `array<double>` vector against `bits`
    * hyperplanes (row-major `bits × dim`) — one fused pass, codegen'd. */
  def signCode(v: Column, planes: Array[Double], bits: Int, dim: Int): Column =
    ColumnBridge.column(SignCodeD(ColumnBridge.expression(v), planes, bits, dim))

  /** Position-wise equality count of two `array<long>` columns — the
    * MinHash signature-agreement scorer; codegen'd, with the exact
    * semantics of the `aggregate(zip_with(…))` fold it replaces. */
  def eqCount(a: Column, b: Column): Column =
    ColumnBridge.column(EqCountL(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** All `k` plane projections of an `array<double>` vector in one fused
    * codegen pass (planes row-major `k × dim`) — SignCodeD's continuous
    * twin, the random-projection kernel. */
  def projd(v: Column, planes: Array[Double], k: Int, dim: Int): Column =
    ColumnBridge.column(ProjectD(ColumnBridge.expression(v), planes, k, dim))

  /** 64-bit Z-order (Morton) key of two 32-bit dimension codes — the
    * two-dimensional layout sort key; codegen'd. */
  def zorder(x: Column, y: Column): Column =
    ColumnBridge.column(ZOrderCode(ColumnBridge.expression(x), ColumnBridge.expression(y)))
}
