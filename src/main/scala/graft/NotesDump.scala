package graft

/** Regenerates SCALE.md from the catalog's per-query scale notes:
  * `sbt "runMain graft.NotesDump" > SCALE.md` (markdown on stdout). */
object NotesDump {
  def main(args: Array[String]): Unit = {
    println("# SCALE — per-operator 100 TB strategy")
    println()
    println("Generated from `GraftQuery.note` (source of truth lives next to each")
    println("implementation). Regenerate: `sbt \"runMain graft.NotesDump\" > SCALE.md`.")
    println()
    println("| query | oracle | 100 TB strategy |")
    println("|---|---|---|")
    SparkEntry.catalog.foreach { q =>
      val oracle = if (q.oracle.isDefined) "duckdb" else "spec/rows"
      val note = q.note.replace("|", "\\|").replace("\n", " ")
      println(s"| `${q.name}` | $oracle | $note |")
    }
  }
}
