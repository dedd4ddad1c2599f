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
  * Semantics: inputs are `array<double>`; the sum folds left to right —
  * bit-identical to the `aggregate` form and to the DuckDB oracle's
  * `list_reduce`. Null array → null; elements assumed non-null (embeddings).
  *
  * Lives under `org.apache.spark.sql` because `AbstractDataType` (the
  * `ExpectsInputTypes` contract) is `private[sql]`.
  */
case class DotProductD(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))

  override def dataType: DataType = DoubleType

  override def prettyName: String = "graft_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductD =
    copy(left = newLeft, right = newRight)
}
