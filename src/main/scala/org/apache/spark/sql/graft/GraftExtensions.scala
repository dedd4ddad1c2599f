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

    def fn(name: String, cls: Class[_], arity: Int)(
        build: Seq[Expression] => Expression): Unit =
      ext.injectFunction((
        new org.apache.spark.sql.catalyst.FunctionIdentifier(name),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          cls.getName, name),
        (children: Seq[Expression]) => {
          require(children.length == arity,
            s"$name takes exactly $arity arguments")
          build(children)
        }))
    def intLit(e: Expression, what: String): Int = e match {
      case Literal(v: Int, org.apache.spark.sql.types.IntegerType) => v
      case Literal(v: Long, org.apache.spark.sql.types.LongType) => v.toInt
      case other => throw new IllegalArgumentException(
        s"$what must be an integer literal, got $other")
    }

    // The engine's full native-kernel surface, SQL-callable — a user of
    // spark.sql gets the same codegen'd/mergeable kernels the DataFrame
    // paths use. (SignCodeD is API-only: its hyperplane-array parameter
    // has no SQL literal form.)
    fn("graft_dot", classOf[DotProductD], 2)(c => DotProductD(c.head, c(1)))
    fn("graft_sqdist", classOf[SqDistD], 2)(c => SqDistD(c.head, c(1)))
    fn("graft_dotl", classOf[DotProductL], 2)(c => DotProductL(c.head, c(1)))
    fn("graft_eq_count", classOf[EqCountL], 2)(c => EqCountL(c.head, c(1)))
    fn("graft_zorder", classOf[ZOrderCode], 2)(c => ZOrderCode(c.head, c(1)))
    fn("graft_bloom_contains", classOf[BloomMightContain], 2)(c =>
      BloomMightContain(c.head, c(1)))
    fn("graft_bloom", classOf[BloomSketch], 2)(c =>
      BloomSketch(c.head, intLit(c(1), "graft_bloom numBits")))
    fn("graft_minhash", classOf[MinHashSketch], 1)(c => MinHashSketch(c.head))
    fn("graft_simhash", classOf[SimHashSketch], 1)(c => SimHashSketch(c.head))
    def longLit(e: Expression, what: String): Long = e match {
      case Literal(v: Long, org.apache.spark.sql.types.LongType) => v
      case Literal(v: Int, org.apache.spark.sql.types.IntegerType) => v.toLong
      case other => throw new IllegalArgumentException(
        s"$what must be an integer literal, got $other")
    }
    fn("graft_byte_shingles", classOf[ByteShingles], 2)(c =>
      ByteShingles(c.head, longLit(c(1), "graft_byte_shingles modulus")))
    fn("graft_token_shingles", classOf[TokenShingles], 3)(c =>
      TokenShingles(c.head, longLit(c(1), "graft_token_shingles multiplier"),
        longLit(c(2), "graft_token_shingles modulus")))
    fn("graft_xxh_token_shingles", classOf[XxTokenShingles], 1)(c =>
      XxTokenShingles(c.head))
    fn("graft_cdc_chunks", classOf[CdcChunks], 3)(c =>
      CdcChunks(c.head, longLit(c(1), "graft_cdc_chunks divisor"),
        longLit(c(2), "graft_cdc_chunks modulus")))
    fn("graft_heavy_hitters", classOf[HeavyHitters], 2)(c =>
      HeavyHitters(c.head, intLit(c(1), "graft_heavy_hitters capacity")))
  }
}

/** Rewrites the declarative fold-over-zip patterns to their native
  * codegen kernels — semantics identical (left-to-right fold, 0 + x == x,
  * null on length mismatch / null element), interpreted-HOF-free:
  *
  *  - `aggregate(zip_with(a, b, _ * _), 0.0, _ + _)` over `array<double>`
  *    → [[DotProductD]];
  *  - `aggregate(zip_with(a, b, (x,y) => (x−y)·(x−y)), 0.0, _ + _)` over
  *    `array<double>` → [[SqDistD]] (the PQ assignment's squared L2 —
  *    evaluated per (sub-vector × codebook row) inside a join, where the
  *    interpreted form was measured as the whole of q236's 10× cost);
  * The long twin ([[DotProductL]], q130's exact integer candidate scores)
  * is deliberately NOT auto-rewritten: under ANSI mode (Spark 4's
  * default) a long `x * y` fold THROWS on overflow where the kernel's
  * Java arithmetic wraps — an explicit `dotl` call site accepts that
  * contract, a silent rewrite of user code must not change it. The
  * double patterns have no such divergence (IEEE, no overflow errors).
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

      case ArrayAggregate(
            ZipWith(a, b,
              LambdaFunction(
                Multiply(Subtract(x1: NamedLambdaVariable, y1: NamedLambdaVariable, _),
                  Subtract(x2: NamedLambdaVariable, y2: NamedLambdaVariable, _), _),
                Seq(xArg: NamedLambdaVariable, yArg: NamedLambdaVariable), _)),
            Literal(0.0, DoubleType),
            LambdaFunction(Add(acc: NamedLambdaVariable, v: NamedLambdaVariable, _),
              Seq(accArg: NamedLambdaVariable, vArg: NamedLambdaVariable), _),
            finish)
          if isDoubleArray(a) && isDoubleArray(b) &&
            // BOTH factors must be the same (xArg − yArg): (x−y)·(y−x)
            // or a captured variable is not a squared distance
            x1.exprId == xArg.exprId && x2.exprId == xArg.exprId &&
            y1.exprId == yArg.exprId && y2.exprId == yArg.exprId &&
            boundExactly(Seq(acc, v), Seq(accArg, vArg)) &&
            isIdentityFinish(finish) =>
        SqDistD(a, b)
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
