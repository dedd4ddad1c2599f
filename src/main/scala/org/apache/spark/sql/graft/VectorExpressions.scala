package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, IntegerType, LongType}

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

/** Σ(aᵢ−bᵢ)² over two `array<double>` columns — the squared-L2 twin of
  * [[DotProductD]]. The declarative form `aggregate(zip_with(a, b,
  * (x,y) => (x−y)·(x−y)), …)` is an INTERPRETED HOF in the Spark 4
  * evaluator (ZipWith/ArrayAggregate have no doGenCode): inside the PQ
  * codebook-assignment join it ran once per (sub-vector × codebook row) —
  * ~20M interpreted closures at 10× sf0.1, measured as the entirety of
  * q236/q249's build cost (the q252 poison class, join-sized instead of
  * plan-inference-sized). One fused codegen loop replaces it. */
case class SqDistD(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_sqdist"

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
    while (i < n) {
      val d = x.getDouble(i) - y.getDouble(i)
      s += d * d
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val s = ctx.freshName("s")
      val d = ctx.freshName("d")
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
         |    double $d = $a.getDouble($i) - $b.getDouble($i);
         |    $s += $d * $d;
         |  }
         |  ${ev.value} = $s;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SqDistD =
    copy(left = newLeft, right = newRight)
}

/** Σ aᵢ·bᵢ over two `array<long>` columns — the integer twin of
  * [[DotProductD]] for the SQ8 code scan (q130), whose candidate scores
  * must stay exact integer arithmetic (bit-deterministic tie-breaks).
  * Replaces the same interpreted `aggregate(zip_with(…))` HOF class. */
case class DotProductL(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_dotl"

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
    var s = 0L
    var i = 0
    while (i < n) { s += x.getLong(i) * y.getLong(i); i += 1 }
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
         |  long $s = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $s += $a.getLong($i) * $b.getLong($i);
         |  }
         |  ${ev.value} = $s;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductL =
    copy(left = newLeft, right = newRight)
}

/** Position-wise equality count of two `array<long>` columns — the MinHash
  * signature-agreement scorer (estimated Jaccard = matches / signature
  * length), native form of the `aggregate(zip_with(a, b, x==y ? 1 : 0))`
  * fold that runs interpreted on Spark 4's candidate-pair hot path.
  *
  * Semantics are EXACTLY the HOF form's, which differ from
  * [[DotProductL]]'s strictness: `zip_with` pads the shorter array with
  * nulls and `when(x === y, 1)` sends a null comparison to `otherwise(0)`,
  * so a length mismatch does NOT null the result — positions beyond the
  * shorter array, and positions where either element is null, simply count
  * zero. Only a null INPUT array yields null (a null array poisons the
  * whole fold).
  */
case class EqCountL(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = LongType
  override def nullable: Boolean = left.nullable || right.nullable
  override def prettyName: String = "graft_eq_count"

  private def elementsMayBeNull: Boolean = Seq(left, right).exists {
    _.dataType match {
      case ArrayType(_, containsNull) => containsNull
      case _ => true
    }
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0L
    var i = 0
    if (elementsMayBeNull) {
      while (i < n) {
        if (!x.isNullAt(i) && !y.isNullAt(i) && x.getLong(i) == y.getLong(i))
          s += 1L
        i += 1
      }
    } else {
      while (i < n) { if (x.getLong(i) == y.getLong(i)) s += 1L; i += 1 }
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val nullGuard =
        if (elementsMayBeNull) s"!$a.isNullAt($i) && !$b.isNullAt($i) && "
        else ""
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $s = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($nullGuard$a.getLong($i) == $b.getLong($i)) $s++;
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): EqCountL =
    copy(left = newLeft, right = newRight)
}

/** Sign-LSH bucket code of a `dim`-element `array<double>` vector against
  * `bits` fixed hyperplanes: bit b is set iff `v · planes[b] > 0`.
  *
  * The declarative form — `bits` separate `when(DotProductD(v, typedLit(
  * plane)) > 0, 1<<b)` terms summed — is semantically identical but embeds
  * every plane as a `Literal(ArrayData)` unrolled into the generated
  * projection: at 4 tables × 10 bits × 64 dims that is ~2,560 literal
  * doubles per operator, which blows generated-method size, takes seconds
  * of janino+C2 warm-up, and re-reads the vector `bits` times. Here the
  * planes live in the codegen `references` as one flat `double[]` and a
  * two-level loop computes the whole code in a single pass over the vector
  * — compact bytecode, fused into whole-stage codegen.
  *
  * Null semantics: null vector, wrong length, or (for `containsNull`
  * arrays) any null element → null, and a null code drops the row from
  * any (table, code) equi-join. NOTE this is deliberately STRICTER than
  * the when-chain it replaced, which evaluated `null > 0` as false and
  * bucketed a null-element vector at code 0: a vector with undefined
  * dimensions has no meaningful LSH bucket, and pinning all of them to
  * one bucket would manufacture a hot bucket of garbage candidates.
  *
  * `planes` is row-major `bits × dim`; instances are compared by the
  * deterministic (table-seed, bits, dim) identity the caller bakes into
  * `planes`, so the Array field's reference equality only costs CSE, never
  * correctness.
  */
case class SignCodeD(child: Expression, planes: Array[Double], bits: Int, dim: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(planes.length == bits * dim, s"planes must be bits*dim = ${bits * dim}")
  require(bits > 0 && bits <= 31, "code must fit an Int")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_sign_code"

  private def elementsMayBeNull: Boolean = child.dataType match {
    case ArrayType(_, containsNull) => containsNull
    case _ => true
  }

  override protected def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    if (x.numElements() != dim) return null
    if (elementsMayBeNull) {
      var i = 0
      while (i < dim) { if (x.isNullAt(i)) return null; i += 1 }
    }
    var code = 0
    var b = 0
    while (b < bits) {
      var s = 0.0
      var d = 0
      val off = b * dim
      while (d < dim) { s += x.getDouble(d) * planes(off + d); d += 1 }
      if (s > 0) code |= 1 << b
      b += 1
    }
    code
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val p = ctx.addReferenceObj("planes", planes, "double[]")
      val j = ctx.freshName("j")
      val b = ctx.freshName("b")
      val d = ctx.freshName("d")
      val s = ctx.freshName("s")
      val code = ctx.freshName("code")
      val nullScan = if (elementsMayBeNull) {
        s"""
           |for (int $j = 0; $j < $dim && !${ev.isNull}; $j++) {
           |  if ($a.isNullAt($j)) ${ev.isNull} = true;
           |}
         """.stripMargin
      } else ""
      s"""
         |${ev.isNull} = $a.numElements() != $dim;
         |$nullScan
         |if (!${ev.isNull}) {
         |  int $code = 0;
         |  for (int $b = 0; $b < $bits; $b++) {
         |    double $s = 0.0;
         |    for (int $d = 0; $d < $dim; $d++) {
         |      $s += $a.getDouble($d) * $p[$b * $dim + $d];
         |    }
         |    if ($s > 0) $code |= 1 << $b;
         |  }
         |  ${ev.value} = $code;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SignCodeD =
    copy(child = newChild)
}

/** All `k` plane projections of a `dim`-element `array<double>` vector in
  * ONE pass: element p is `v · planes[p]` — [[SignCodeD]]'s continuous twin
  * (keep the dot products, don't threshold them), the random-projection /
  * JL-reduction kernel. Same rationale as SignCodeD: k separate
  * `DotProductD(v, typedlit(plane))` terms would unroll k·dim literal
  * doubles into the generated projection (janino warm-up, vector re-read
  * per plane), and the `transform(typedlit(planes), …aggregate(zip_with)…)`
  * lambda chain is CodegenFallback — interpreted per element. Here the
  * plane matrix lives in codegen `references` as one flat `double[]`.
  *
  * Each element sums in ascending index order — bit-identical to the
  * `aggregate(zip_with(v, pl, a·b))` fold and to [[DotProductD]]. Null
  * semantics match SignCodeD: null vector, wrong length, or (for
  * `containsNull` arrays) any null element → null result.
  *
  * `planes` is row-major `k × dim`; instances are compared by the
  * deterministic plane identity the caller bakes in, so the Array field's
  * reference equality only costs CSE, never correctness.
  */
case class ProjectD(child: Expression, planes: Array[Double], k: Int, dim: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(planes.length == k * dim, s"planes must be k*dim = ${k * dim}")
  require(k > 0, "need at least one plane")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType =
    ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_project"

  private def elementsMayBeNull: Boolean = child.dataType match {
    case ArrayType(_, containsNull) => containsNull
    case _ => true
  }

  override protected def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    if (x.numElements() != dim) return null
    if (elementsMayBeNull) {
      var i = 0
      while (i < dim) { if (x.isNullAt(i)) return null; i += 1 }
    }
    val out = new Array[Double](k)
    var p = 0
    while (p < k) {
      var s = 0.0
      var d = 0
      val off = p * dim
      while (d < dim) { s += x.getDouble(d) * planes(off + d); d += 1 }
      out(p) = s
      p += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val pl = ctx.addReferenceObj("planes", planes, "double[]")
      val j = ctx.freshName("j")
      val p = ctx.freshName("p")
      val d = ctx.freshName("d")
      val s = ctx.freshName("s")
      val out = ctx.freshName("out")
      val nullScan = if (elementsMayBeNull) {
        s"""
           |for (int $j = 0; $j < $dim && !${ev.isNull}; $j++) {
           |  if ($a.isNullAt($j)) ${ev.isNull} = true;
           |}
         """.stripMargin
      } else ""
      s"""
         |${ev.isNull} = $a.numElements() != $dim;
         |$nullScan
         |if (!${ev.isNull}) {
         |  double[] $out = new double[$k];
         |  for (int $p = 0; $p < $k; $p++) {
         |    double $s = 0.0;
         |    for (int $d = 0; $d < $dim; $d++) {
         |      $s += $a.getDouble($d) * $pl[$p * $dim + $d];
         |    }
         |    $out[$p] = $s;
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): ProjectD =
    copy(child = newChild)
}
