package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Divide, EqualTo, Expression, If, Literal, Multiply, Sqrt}
import org.apache.spark.sql.catalyst.expressions.aggregate.{Corr, Kurtosis, Skewness}
import org.apache.spark.sql.types.DoubleType

/** Null-safe higher-moment aggregates.
  *
  * Under ANSI mode (the Spark 4 default this engine runs with), the final
  * division inside `corr` / `skewness` / `kurtosis` THROWS `DIVIDE_BY_ZERO`
  * whenever a group's values are constant (n >= 2, central moment m2 = 0) —
  * the EdgeCorpus `rows = 8` ties-corpus finding. The DuckDB oracle yields
  * NULL there, which is also what Spark's own legacy behavior produced:
  * every one of these Catalyst aggregates carries a `nullOnDivideByZero`
  * constructor flag that ANSI merely defaults to false. Instantiating the
  * SAME aggregate with the flag forced true keeps the accumulation and
  * final formula bit-identical to the built-in on every non-degenerate
  * group (the oracle-parity property q58 already proved) and returns NULL
  * instead of throwing on the degenerate ones.
  *
  * A `when(var_samp(x) === 0, null).otherwise(skewness(x))` guard does NOT
  * work: aggregate finals evaluate unconditionally in the aggregation
  * operator, so the throwing branch runs regardless of the `when`.
  */
/** `corr` with the zero-variance hole plugged. Unlike Skewness/Kurtosis,
  * whose `nullOnDivideByZero = true` fully guards the final division,
  * Spark 4.1's PearsonCorrelation only special-cases n = 0 and n = 1 — a
  * CONSTANT group with n >= 2 reaches `ck / sqrt(xMk * yMk)` with a zero
  * denominator and throws under ANSI. This subclass keeps the buffer,
  * update and merge expressions bit-identical to the built-in (oracle
  * parity on every non-degenerate group is inherited, not re-proven) and
  * only wraps the final with a product-of-moments guard; the `If` is
  * required because aggregate finals evaluate unconditionally. The guard
  * is on xMk * yMk, not each factor, so a denormal underflow product also
  * lands on NULL instead of the throw. `withNewChildrenInternal` must
  * return this class: the inherited case-class `copy` would silently
  * revert to plain Corr on any tree transformation. */
private[graft] class CorrNullSafe(x0: Expression, y0: Expression)
    extends Corr(x0, y0, nullOnDivideByZero = true) {
  override def prettyName: String = "corr_null_safe"
  // the built-in's final (`ck / sqrt(xMk * yMk)`, n = 0/1 → NULL) re-stated
  // verbatim — `evaluateExpression` is a val upstream, so it cannot be
  // super-called — with the one extra zero-product arm. The Divide sits on
  // the guarded branch, so ANSI's divide check can never fire.
  override val evaluateExpression: Expression = {
    val nullLit = Literal.create(null, DoubleType)
    If(EqualTo(n, Literal(0.0)), nullLit,
      If(EqualTo(n, Literal(1.0)), nullLit,
        If(EqualTo(Multiply(xMk, yMk), Literal(0.0)), nullLit,
          Divide(ck, Sqrt(Multiply(xMk, yMk))))))
  }
  override def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Corr =
    new CorrNullSafe(newLeft, newRight)
  /** Class identity must participate in equality: the inherited case-class
    * equals/canEqual would compare equal to a plain
    * `Corr(x, y, nullOnDivideByZero = true)` in BOTH directions, and
    * Catalyst expression/aggregate deduplication could then substitute the
    * built-in — whose final still throws under ANSI on constant groups.
    * `canEqual` guards the plain side's generated equals (it calls
    * `that.canEqual(this)`); the `equals` override guards this side. */
  override def canEqual(that: Any): Boolean = that.isInstanceOf[CorrNullSafe]
  override def equals(other: Any): Boolean = other match {
    case _: CorrNullSafe => super.equals(other)
    case _               => false
  }
  override def hashCode(): Int = 31 * super.hashCode() + classOf[CorrNullSafe].hashCode()
}

object MomentExpressions {
  def corrNullSafe(x: Column, y: Column): Column =
    ColumnBridge.column(
      new CorrNullSafe(ColumnBridge.expression(x), ColumnBridge.expression(y))
        .toAggregateExpression())

  def skewnessNullSafe(x: Column): Column =
    ColumnBridge.column(
      Skewness(ColumnBridge.expression(x), nullOnDivideByZero = true)
        .toAggregateExpression())

  def kurtosisNullSafe(x: Column): Column =
    ColumnBridge.column(
      Kurtosis(ColumnBridge.expression(x), nullOnDivideByZero = true)
        .toAggregateExpression())
}
