package org.apache.spark.sql.graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/** Engine extensions, installed with
  * `SparkSession.builder().withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=org.apache.spark.sql.graft.GraftExtensions`.
  *
  * Currently injects [[RewriteDotProduct]]: users who write the idiomatic
  * declarative dot product
  * {{{ aggregate(zip_with(a, b, (x, y) => x * y), 0.0, (acc, x) => acc + x) }}}
  * silently get the codegen'd zero-allocation [[DotProductD]] kernel — the
  * optimizer owns the physical choice, exactly how Spark-first design wants
  * domain kernels delivered.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => RewriteDotProduct)
    // SQL surface: `SELECT graft_dot(a, b)` — same codegen'd kernel the
    // optimizer rewrites the HOF form to, callable directly.
    ext.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("graft_dot"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[DotProductD].getName, "graft_dot"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "graft_dot(a, b) takes exactly 2 arguments")
        DotProductD(children.head, children(1))
      }))
  }
}

/** Rewrites `aggregate(zip_with(a, b, _ * _), 0.0, _ + _)` over
  * `array<double>` inputs to [[DotProductD]] — semantics are identical
  * (left-to-right fold, 0.0 + x == x, null on length mismatch / null
  * element) and ~10× faster interpreted-HOF-free.
  *
  * The multiply/add operands must be exactly the variables bound by the
  * enclosing lambda's own argument list (matched by exprId): a fold body
  * referencing a captured outer lambda variable — e.g. `(acc, v) => acc + q`
  * inside a nested HOF — is NOT a dot product and must not rewrite.
  */
object RewriteDotProduct extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(
            ZipWith(a, b,
              LambdaFunction(Multiply(x: NamedLambdaVariable, y: NamedLambdaVariable, _),
                Seq(xArg: NamedLambdaVariable, yArg: NamedLambdaVariable), _)),
            Literal(0.0, DoubleType),
            LambdaFunction(Add(acc: NamedLambdaVariable, v: NamedLambdaVariable, _),
              Seq(accArg: NamedLambdaVariable, vArg: NamedLambdaVariable), _),
            finish)
          if isDoubleArray(a) && isDoubleArray(b) &&
            boundExactly(Seq(x, y), Seq(xArg, yArg)) &&
            boundExactly(Seq(acc, v), Seq(accArg, vArg)) &&
            isIdentityFinish(finish) =>
        DotProductD(a, b)
    }

  private def isDoubleArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  /** The operands are exactly the lambda's own two (distinct) arguments, in
    * either order — multiply and the double-add fold step are commutative in
    * their operands' values, but a captured outer variable is not allowed. */
  private def boundExactly(
      operands: Seq[NamedLambdaVariable], args: Seq[NamedLambdaVariable]): Boolean = {
    val argIds = args.map(_.exprId).toSet
    argIds.size == 2 && operands.map(_.exprId).toSet == argIds
  }

  /** The third lambda of aggregate() defaults to identity. */
  private def isIdentityFinish(e: Expression): Boolean = e match {
    case LambdaFunction(v: NamedLambdaVariable, Seq(arg: NamedLambdaVariable), _) =>
      v.exprId == arg.exprId
    case _ => false
  }
}
