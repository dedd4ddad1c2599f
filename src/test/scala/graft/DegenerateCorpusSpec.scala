package graft

/** Catalog-wide degenerate-input sweep: every registered query must survive
  * an EMPTY corpus and a ONE-ROW corpus (EdgeCorpus — exact TESTDATA.md
  * schemas, internally consistent FKs).
  *
  * History: the q136 stride guard, q148 sub-ppm guard and q155 empty-text
  * guard were each found reactively, one round apiece — every one was a
  * query assuming a non-trivial corpus (enough rows for a window stride, a
  * nonzero total to divide by, a non-empty token array). This spec runs
  * the WHOLE catalog against the two smallest corpora so the next guard of
  * that class fails here, not in a later round's driver gate. "Survives"
  * means: the plan constructs, executes and collects without throwing —
  * divide-by-zero must degrade to SQL NULL semantics, sizing arithmetic
  * (log2/ceil over row counts) must clamp, driver-side selections
  * (BPE merge pick) must tolerate an empty candidate set.
  *
  * The Spark==DuckDB half of the edge contract runs in the verify loop
  * (EdgeCorpus CLI + graft.Verify + tools/check.py on the same corpora);
  * this spec is the crash gate that `sbt test` can enforce hermetically.
  */
class DegenerateCorpusSpec extends SparkSpec {

  private lazy val base =
    java.nio.file.Files.createTempDirectory("graft_edge").toString

  // Both events.ts physical shapes are swept (the Aug-13 corpus regeneration
  // flipped nanos→micros and broke 42 queries; this sweep would have caught
  // it). empty runs once on the driver's current shape — the one-row sweeps
  // are what actually push data through both Tables.events branches.
  // ties: 8 duplicate-payload rows per table (only pks vary) — the maximal
  // tie-break stress. It caught q58's ANSI corr/skewness/kurtosis throw on
  // constant groups (MomentExpressions) and q197's zero-median divide the
  // bpex shape first surfaced for vocab < 11.
  Seq(("empty", 0, "micros"), ("one_row", 1, "micros"),
      ("one_row_nanos", 1, "nanos"), ("ties", 8, "micros")).foreach {
    case (label, n, shape) =>
    test(s"every catalog query survives the $label corpus") {
      val dir = s"$base/$label"
      EdgeCorpus.write(spark, dir, n, shape)
      val failures = SparkEntry.queries.toSeq.sortBy(_._1)
        .flatMap { case (name, fn) =>
          try { fn(spark, dir).collect(); None }
          catch { case e: Throwable =>
            Some(s"$name: ${e.getClass.getSimpleName} " +
              String.valueOf(e.getMessage).linesIterator.take(3)
                .mkString(" | ").take(300))
          }
        }
      assert(failures.isEmpty,
        s"${failures.size} queries crashed on the $label corpus:\n" +
          failures.mkString("\n"))
    }
  }

  // The r5 failure class, pinned BY NAME for ORC exactly as
  // HarnessContractSpec pins it for parquet: q224 reads its ORC stage back
  // with an EXPLICIT schema (inference is banned at scale), so an events.ts
  // physical-encoding drift would surface as an opaque cast error inside
  // q224's catalog row. This test round-trips the normalized ts through ORC
  // on BOTH driver shapes and compares instants exactly, so the drift fails
  // here with the format and column named.
  Seq("micros", "nanos").foreach { shape =>
    test(s"ORC timestamp round-trip is exact on the $shape events shape") {
      val dir = s"$base/orc_$shape"
      EdgeCorpus.write(spark, dir, 1, shape)
      val ev = Tables.events(spark, dir).select("event_id", "ts")
      val out = java.nio.file.Files
        .createTempDirectory(s"graft_orc_rt_$shape").toString
      ev.write.mode("overwrite").orc(out)
      val back = spark.read.schema("event_id BIGINT, ts TIMESTAMP").orc(out)
      val rows = ev.as("a")
        .join(back.as("b"), "event_id")
        .selectExpr("a.ts AS written", "b.ts AS readback")
        .collect()
      assert(rows.nonEmpty, "ORC round-trip lost every row")
      rows.foreach(r => assert(r.get(0) == r.get(1),
        s"ORC ts drift on $shape shape: wrote ${r.get(0)}, read ${r.get(1)}"))
    }
  }
}
