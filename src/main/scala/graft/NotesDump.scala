package graft

/** Regenerates SCALE.md from the catalog's per-query scale notes:
  * `sbt "runMain graft.NotesDump"` writes the file directly (no stdout
  * redirect, so sbt's own log lines can never leak into the document). */
object NotesDump {
  def main(args: Array[String]): Unit = {
    val target = args.headOption.getOrElse("SCALE.md")
    val out = new StringBuilder
    out ++= "# SCALE — per-operator 100 TB strategy\n\n"
    out ++= "Generated from `GraftQuery.note` (source of truth lives next to each\n"
    out ++= "implementation). Regenerate: `sbt \"runMain graft.NotesDump\"`.\n\n"
    out ++= "| query | oracle | 100 TB strategy |\n"
    out ++= "|---|---|---|\n"
    SparkEntry.catalog.foreach { q =>
      val oracle = if (q.oracle.isDefined) "duckdb" else "spec/rows"
      val note = q.note.replace("|", "\\|").replace("\n", " ")
      out ++= s"| `${q.name}` | $oracle | $note |\n"
    }
    java.nio.file.Files.writeString(java.nio.file.Paths.get(target), out.toString)
    println(s"[notesdump] wrote $target (${SparkEntry.catalog.size} queries)")
  }
}
