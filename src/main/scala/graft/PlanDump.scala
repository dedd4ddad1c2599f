package graft
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.execution.ExplainMode

/** Dev harness: write `.explain("formatted")` for queries to files — the
  * before/after plan evidence for optimization rounds.
  * Usage: runMain graft.PlanDump <outDir> <suffix> [sfDir] [names...]
  * With no names, dumps every catalog query.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = Paths.get(args(0))
    val suffix = args(1)
    val sfDir = if (args.length > 2) args(2) else "/root/testdata/sf0.01"
    val names =
      if (args.length > 3) args.drop(3).toSeq else SparkEntry.catalog.map(_.name)
    Files.createDirectories(outDir)
    val spark = GraftSession.builder("local[8]", 8).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val mode = ExplainMode.fromString("formatted")
    names.foreach { n =>
      val txt =
        try SparkEntry.queries(n)(spark, sfDir).queryExecution.explainString(mode)
        catch { case e: Throwable => s"EXPLAIN FAILED: $e" }
      Files.write(outDir.resolve(s"${n}_$suffix.txt"),
        txt.getBytes(StandardCharsets.UTF_8))
      println(s"[plandump] $n -> ${n}_$suffix.txt (${txt.length} chars)")
    }
    spark.stop()
  }
}
