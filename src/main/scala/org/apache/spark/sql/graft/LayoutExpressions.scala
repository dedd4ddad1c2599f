package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{AbstractDataType, DataType, LongType}

/** Bit math for the engine's Z-order (Morton) layout key: interleaving the
  * bits of two dimension codes makes one sort key whose prefix blocks bound
  * BOTH dimensions at once — sort-by-z then range-partition, and every
  * output file's parquet footer carries a tight min/max on each dimension,
  * so a filter on either one prunes files (a single-column sort only prunes
  * its own column). The spread uses the standard mask-shift doubling
  * (Morton 1966); 32 bits per dimension into one 64-bit key.
  */
object ZOrderMath {
  /** Spread the low 32 bits of `v` to the even bit positions. */
  def spread(v0: Long): Long = {
    var v = v0 & 0xFFFFFFFFL
    v = (v | (v << 16)) & 0x0000FFFF0000FFFFL
    v = (v | (v << 8)) & 0x00FF00FF00FF00FFL
    v = (v | (v << 4)) & 0x0F0F0F0F0F0F0F0FL
    v = (v | (v << 2)) & 0x3333333333333333L
    v = (v | (v << 1)) & 0x5555555555555555L
    v
  }

  /** Morton code: x on even bits, y on odd. Inputs are the low 32 bits —
    * callers range-bucket wider domains to 32-bit codes first. */
  def interleave(x: Long, y: Long): Long = spread(x) | (spread(y) << 1)
}

/** `graft_zorder(x, y)` — 64-bit Morton key of two 32-bit dimension codes,
  * codegen'd so layout writes compute it inside the scan stage. */
case class ZOrderCode(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def prettyName: String = "graft_zorder"
  override def dataType: DataType = LongType
  override def inputTypes: Seq[AbstractDataType] = Seq(LongType, LongType)

  override protected def nullSafeEval(x: Any, y: Any): Any =
    ZOrderMath.interleave(x.asInstanceOf[Long], y.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (x, y) =>
      s"org.apache.spark.sql.graft.ZOrderMath.interleave($x, $y)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ZOrderCode =
    copy(left = newLeft, right = newRight)
}
