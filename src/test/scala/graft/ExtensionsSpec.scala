package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The optimizer extension must turn the declarative HOF dot product into
  * the native codegen'd kernel, without changing results. */
class ExtensionsSpec extends AnyFunSuite {

  private lazy val extSpark: SparkSession = {
    // getOrCreate would return the suite-shared session (built without the
    // extension — spark.sql.extensions only applies at session build); clear
    // the default so a fresh session (sharing the SparkContext) is built.
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = GraftSession.builder("local[2]", 2)
      .appName("graft-ext")
      .withExtensions(new org.apache.spark.sql.graft.GraftExtensions)
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  test("HOF dot-product pattern is rewritten to graft_dot and results match") {
    val spark = extSpark
    // parquet-backed (a literal-backed LocalRelation would be constant-folded
    // away before the plan is observable)
    val df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("v"))
    val hof = df.select(col("vec_id"),
      aggregate(zip_with(col("v"), col("v"), (x, y) => x * y),
        lit(0.0), (acc, x) => acc + x).as("dot"))
    assert(hof.queryExecution.optimizedPlan.toString.contains("graft_dot"),
      s"expected rewrite in:\n${hof.queryExecution.optimizedPlan}")
    val native = df.select(col("vec_id"),
      graft.functions.VectorFunctions.dotd(col("v"), col("v")).as("dot"))
    val a = hof.orderBy("vec_id").collect().map(_.getDouble(1))
    val b = native.orderBy("vec_id").collect().map(_.getDouble(1))
    assert(a.toSeq === b.toSeq)
  }

  test("graft_dot is callable from SQL via the injected function") {
    val spark = extSpark
    val r = spark.sql(
      "SELECT graft_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d").head()
    assert(r.getDouble(0) === 11.0)
    // HOF-equivalent null semantics from SQL too
    val m = spark.sql(
      "SELECT graft_dot(array(1.0D, 2.0D), array(3.0D)) AS d").head()
    assert(m.isNullAt(0), "length mismatch must be null")
  }

  test("the full native-kernel surface is SQL-callable") {
    val spark = extSpark
    // zorder: interleave bits of (3, 5) = 0b011, 0b101 -> x bits at even
    // positions, y at odd: 0b100111 = 39
    assert(spark.sql("SELECT graft_zorder(3L, 5L) AS z").head().getLong(0) === 39L)
    // bloom build + probe round-trip entirely in SQL
    val hit = spark.sql(
      """SELECT graft_bloom_contains(
        |  (SELECT graft_bloom(xxhash64(id), 1024) FROM range(0, 100)),
        |  xxhash64(42L)) AS hit""".stripMargin).head().getBoolean(0)
    assert(hit, "present key must probe true")
    // minhash/simhash aggregates from SQL: shape checks
    val mh = spark.sql(
      "SELECT graft_minhash(xxhash64(id)) AS sig FROM range(0, 50)")
      .head().getSeq[Long](0)
    assert(mh.length === 64)
    spark.sql("SELECT graft_simhash(xxhash64(id)) FROM range(0, 50)").head()
    // heavy hitters: the dominant key must surface
    val hh = spark.sql(
      """SELECT graft_heavy_hitters(CASE WHEN id % 2 = 0 THEN 'a'
        |                                ELSE concat('k', id) END, 8) AS hh
        |FROM range(0, 100)""".stripMargin).head()
    assert(hh.getSeq[org.apache.spark.sql.Row](0).exists(_.getString(0) == "a"))
    // non-literal capacity is rejected loudly
    intercept[Exception] {
      spark.sql("SELECT graft_heavy_hitters(cast(id AS STRING), cast(id AS INT)) FROM range(0, 2)")
        .head()
    }
  }

  private def embDf = {
    val spark = extSpark
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("v"))
  }

  test("fold body referencing a captured outer lambda variable is NOT rewritten") {
    // (acc, x) => acc + q where q is the outer transform's variable: the Add
    // operands are NamedLambdaVariables but q is not bound by the fold lambda.
    val df = embDf.select(col("vec_id"),
      transform(array(lit(2.0)), q =>
        aggregate(zip_with(col("v"), col("v"), (x, y) => x * y),
          lit(0.0), (acc, _) => acc + q)).as("folds"))
    assert(!df.queryExecution.optimizedPlan.toString.contains("graft_dot"),
      s"captured-variable fold must not rewrite:\n${df.queryExecution.optimizedPlan}")
    // Result = n * q (every product replaced by the captured q), not the dot.
    val n = embDf.selectExpr("size(v)").head().getInt(0)
    val first = df.orderBy("vec_id").head().getSeq[Double](1)
    assert(first === Seq(n * 2.0))
  }

  test("rewrite preserves HOF null semantics: length mismatch and null elements") {
    val spark = extSpark
    val df = embDf.select(col("vec_id"), col("v"),
      slice(col("v"), 1, 3).as("v3"),
      transform(col("v"), x => when(x > 0, x)).as("vn"))
    def hofDot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)
    val hof = df.select(col("vec_id"),
      hofDot(col("v"), col("v3")).as("mismatch"),
      hofDot(col("v"), col("vn")).as("withNulls"))
    assert(hof.queryExecution.optimizedPlan.toString.contains("graft_dot"),
      s"expected rewrite in:\n${hof.queryExecution.optimizedPlan}")
    val native = df.select(col("vec_id"),
      graft.functions.VectorFunctions.dotd(col("v"), col("v3")).as("mismatch"),
      graft.functions.VectorFunctions.dotd(col("v"), col("vn")).as("withNulls"))
    val a = hof.orderBy("vec_id").collect().map(r => (r.isNullAt(1), r.isNullAt(2)))
    // Length mismatch must be null everywhere (embeddings are longer than 3).
    assert(a.forall(_._1), "zip_with pad-with-null semantics: mismatch column must be null")
    val b = native.orderBy("vec_id").collect().map(r => (r.isNullAt(1), r.isNullAt(2)))
    assert(a.toSeq === b.toSeq)
    // Some rows should have a negative element → null, some all-positive → value;
    // check values agree where non-null.
    val hv = hof.orderBy("vec_id").collect().map(r => if (r.isNullAt(2)) None else Some(r.getDouble(2)))
    val nv = native.orderBy("vec_id").collect().map(r => if (r.isNullAt(2)) None else Some(r.getDouble(2)))
    assert(hv.toSeq === nv.toSeq)
  }

  test("corr_null_safe never compares equal to plain corr (dedup substitution hazard)") {
    import org.apache.spark.sql.catalyst.expressions.AttributeReference
    import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Corr}
    import org.apache.spark.sql.graft.{ColumnBridge, MomentExpressions}
    import org.apache.spark.sql.types.DoubleType
    val x = AttributeReference("x", DoubleType)()
    val y = AttributeReference("y", DoubleType)()
    def safeFn = ColumnBridge.expression(
      MomentExpressions.corrNullSafe(ColumnBridge.column(x), ColumnBridge.column(y)))
      .asInstanceOf[AggregateExpression].aggregateFunction
    val safe = safeFn
    val plain = Corr(x, y, nullOnDivideByZero = true)
    // both directions: Catalyst expression dedup maps may probe either way,
    // and the case-class equals the subclass inherits was symmetric-true —
    // substituting the built-in whose ANSI final throws on constant groups
    assert(safe != plain, "corr_null_safe must not equal plain corr")
    assert(plain != safe, "plain corr must not equal corr_null_safe")
    // same-class instances with the same children still unify (dedup works)
    assert(safe == safeFn && safe.hashCode == safeFn.hashCode)
  }

  test("HOF squared-distance pattern is rewritten to graft_sqdist and results match") {
    val df = embDf
    val hof = df.select(col("vec_id"),
      aggregate(zip_with(col("v"), reverse(col("v")), (x, y) => (x - y) * (x - y)),
        lit(0.0), (acc, x) => acc + x).as("d2"))
    assert(hof.queryExecution.optimizedPlan.toString.contains("graft_sqdist"),
      s"expected rewrite in:\n${hof.queryExecution.optimizedPlan}")
    val native = df.select(col("vec_id"),
      graft.functions.VectorFunctions.sqdistd(col("v"), reverse(col("v"))).as("d2"))
    val a = hof.orderBy("vec_id").collect().map(_.getDouble(1))
    val b = native.orderBy("vec_id").collect().map(_.getDouble(1))
    assert(a.toSeq === b.toSeq, "rewrite must be bit-identical to the HOF fold")
  }

  test("graft_sqdist and graft_dotl are SQL-callable with HOF null semantics") {
    val spark = extSpark
    val r = spark.sql(
      "SELECT graft_sqdist(array(1.0D, 2.0D), array(3.0D, 0.0D)) AS d").head()
    assert(r.getDouble(0) === 8.0)
    assert(spark.sql(
      "SELECT graft_sqdist(array(1.0D), array(1.0D, 2.0D)) AS d").head().isNullAt(0),
      "length mismatch must be null")
    val l = spark.sql(
      "SELECT graft_dotl(array(2L, 3L), array(5L, 7L)) AS d").head()
    assert(l.getLong(0) === 31L)
    assert(spark.sql(
      "SELECT graft_dotl(array(1L), array(1L, 2L)) AS d").head().isNullAt(0))
  }

  test("graft_project equals the per-plane HOF fold reference, corpus + edges") {
    val spark = extSpark
    val df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("v"))
    val planes: Seq[Seq[Double]] =
      (0 until 16).map(j => operators.SimilarityQueries.hyperplane(0, j, 64))
    val flat = planes.flatten.toArray
    // reference model: per-plane aggregate(zip_with) fold — the declarative
    // form q149 shipped before the kernel
    val hof = df.select(col("vec_id") +:
      planes.zipWithIndex.map { case (pl, i) =>
        aggregate(zip_with(col("v"), typedlit(pl), (a, b) => a * b),
          lit(0.0), (acc, x) => acc + x).as(s"p$i")
      }: _*)
    val native = df.select(
      col("vec_id") +: (0 until 16).map(i =>
        element_at(graft.functions.VectorFunctions.projd(col("v"), flat, 16, 64),
          i + 1).as(s"p$i")): _*)
    val a = hof.orderBy("vec_id").collect()
      .map(r => (0 until 16).map(i => r.getDouble(i + 1)))
    val b = native.orderBy("vec_id").collect()
      .map(r => (0 until 16).map(i => r.getDouble(i + 1)))
    assert(a.toSeq === b.toSeq, "fused projection must be bit-identical to the fold")
    // edges: wrong length and a null element both null out the whole array
    val edge = df.limit(1).select(
      graft.functions.VectorFunctions.projd(slice(col("v"), 1, 3), flat, 16, 64)
        .as("short"),
      graft.functions.VectorFunctions.projd(
        transform(col("v"), (x, i) => when(i === 0, lit(null)).otherwise(x)),
        flat, 16, 64).as("holed")).head()
    assert(edge.isNullAt(0), "length mismatch must be null")
    assert(edge.isNullAt(1), "null element must be null")
  }

  test("graft_eq_count equals the when/zip_with fold reference, corpus + edges") {
    val spark = extSpark
    val df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"),
        transform(col("embedding"), x => (x * 100).cast("long")).as("a"))
      .withColumn("b", reverse(col("a")))
    def hofCount(x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column) =
      aggregate(zip_with(x, y, (p, q) => when(p === q, 1L).otherwise(0L)),
        lit(0L), (acc, v) => acc + v)
    val hof = df.select(col("vec_id"), hofCount(col("a"), col("b")).as("m"))
      .orderBy("vec_id").collect().map(_.getLong(1))
    val native = df.select(col("vec_id"),
      graft.functions.VectorFunctions.eqCount(col("a"), col("b")).as("m"))
      .orderBy("vec_id").collect().map(_.getLong(1))
    assert(hof.toSeq === native.toSeq)
    // edge semantics are the FOLD's, not DotProductL's strictness: length
    // mismatch counts only overlapping positions (zip_with pads with null,
    // when() sends the null comparison to otherwise(0)); a null element
    // counts 0; a null ARRAY nulls the result
    val edge = df.limit(1).select(
      hofCount(col("a"), slice(col("a"), 1, 3)).as("hm"),
      graft.functions.VectorFunctions.eqCount(col("a"), slice(col("a"), 1, 3))
        .as("nm"),
      hofCount(col("a"),
        transform(col("a"), (x, i) => when(i === 0, lit(null)).otherwise(x)))
        .as("hh"),
      graft.functions.VectorFunctions.eqCount(col("a"),
        transform(col("a"), (x, i) => when(i === 0, lit(null)).otherwise(x)))
        .as("nh"),
      graft.functions.VectorFunctions.eqCount(lit(null).cast("array<bigint>"),
        col("a")).as("nn")).head()
    assert(edge.getLong(0) === 3L && edge.getLong(1) === 3L,
      "length mismatch must count the overlapping prefix")
    assert(edge.getLong(2) === edge.getLong(3),
      "a null element must count 0, exactly as the fold does")
    assert(edge.isNullAt(4), "a null array must null the count")
    // SQL-callable through the injected registry
    assert(spark.sql(
      "SELECT graft_eq_count(array(1L, 2L, 3L), array(1L, 9L, 3L)) AS m")
      .head().getLong(0) === 2L)
  }

  test("the long dot fold is NOT auto-rewritten (ANSI overflow semantics stay the user's)") {
    // Under ANSI (Spark 4 default) a long x*y fold throws on overflow;
    // DotProductL wraps. Explicit dotl call sites accept that contract —
    // a silent rewrite of user code must not change it.
    val df = embDf.select(col("vec_id"),
      transform(col("v"), x => (x * 100).cast("long")).as("cd"))
    val hof = df.select(col("vec_id"),
      aggregate(zip_with(col("cd"), col("cd"), (x, y) => x * y),
        lit(0L), (acc, x) => acc + x).as("isc"))
    assert(!hof.queryExecution.optimizedPlan.toString.contains("graft_dotl"),
      s"long fold must stay declarative:\n${hof.queryExecution.optimizedPlan}")
    // ...but the explicit kernel agrees with the fold wherever it evaluates
    val native = df.select(col("vec_id"),
      graft.functions.VectorFunctions.dotl(col("cd"), col("cd")).as("isc"))
    assert(hof.orderBy("vec_id").collect().map(_.getLong(1)).toSeq ===
      native.orderBy("vec_id").collect().map(_.getLong(1)).toSeq)
  }

  test("a one-sided difference or cross-termed square is NOT rewritten to graft_sqdist") {
    // (x−y)·(y−x) is −(x−y)² — matching it would silently flip sign
    val df = embDf.select(col("vec_id"),
      aggregate(zip_with(col("v"), reverse(col("v")), (x, y) => (x - y) * (y - x)),
        lit(0.0), (acc, x) => acc + x).as("neg"))
    assert(!df.queryExecution.optimizedPlan.toString.contains("graft_sqdist"),
      s"cross-termed square must not rewrite:\n${df.queryExecution.optimizedPlan}")
    val v = df.orderBy("vec_id").head().getDouble(1)
    assert(v <= 0.0, "the cross-termed fold is the NEGATED squared distance")
  }
}
