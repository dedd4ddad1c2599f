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
    val s = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext")
      .config("spark.sql.shuffle.partitions", 2)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
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
}
