package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType}

/** Native Catalyst expression for the vector-similarity hot path.
  *
  * The declarative alternative (`aggregate(zip_with(a, b, _*_), 0.0, _+_)`)
  * is correct but runs interpreted — higher-order functions sit outside
  * whole-stage codegen and allocate an intermediate array per row. On the
  * O(candidate-pairs) inner loop of ANN/near-dup queries that is the
  * difference between a scan-bound and a CPU-bound job (25s → ~1s on the
  * sf0.1 bench). `DotProductD` generates a tight primitive loop over the two
  * `ArrayData` buffers: no allocation, no virtual calls, codegen-fused with
  * the surrounding projection.
  *
  * Semantics are exactly those of the HOF form, so [[RewriteDotProduct]] is a
  * pure physical substitution: the sum folds left to right (bit-identical to
  * the `aggregate` form and to the DuckDB oracle's `list_reduce`); a null
  * array, a length mismatch (zip_with pads the shorter side with nulls), or a
  * null element (null product poisons the fold) all yield null. When both
  * inputs are `containsNull = false` arrays the generated code skips the
  * per-element null scan entirely.
  *
  * Lives under `org.apache.spark.sql` because `AbstractDataType` (the
  * `ExpectsInputTypes` contract) is `private[sql]`.
  */
case class DotProductD(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))

  override def dataType: DataType = DoubleType

  // Nullable even for non-null children: length mismatch yields null.
  override def nullable: Boolean = true

  override def prettyName: String = "graft_dot"

  private def elementsMayBeNull: Boolean = Seq(left, right).exists {
    _.dataType match {
      case ArrayType(_, containsNull) => containsNull
      case _ => true
    }
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    if (elementsMayBeNull) {
      var i = 0
      while (i < n) {
        if (x.isNullAt(i) || y.isNullAt(i)) return null
        i += 1
      }
    }
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val s = ctx.freshName("s")
      val nullScan = if (elementsMayBeNull) {
        s"""
           |for (int $j = 0; $j < $n && !${ev.isNull}; $j++) {
           |  if ($a.isNullAt($j) || $b.isNullAt($j)) ${ev.isNull} = true;
           |}
         """.stripMargin
      } else ""
      s"""
         |int $n = $a.numElements();
         |${ev.isNull} = $n != $b.numElements();
         |$nullScan
         |if (!${ev.isNull}) {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $s += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |  ${ev.value} = $s;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductD =
    copy(left = newLeft, right = newRight)
}
