package graft
import org.apache.spark.sql.SparkSession

/** Dev harness: time one query N times in a warm JVM (min is the signal).
  * Usage: runMain graft.BenchOne <name> [sfDir] [reps]
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 3
    val spark = GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fn = SparkEntry.queries(name)
    val times = (1 to reps).map { _ =>
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      (System.nanoTime() - t0) / 1e9
    }
    println(f"BENCHONE $name min=${times.min}%.2f times=${times.map(t => f"$t%.2f").mkString(",")}")
    spark.stop()
  }
}
