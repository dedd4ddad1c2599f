package graft

import graft.operators.CurationQueries
import org.apache.spark.sql.functions._

/** Regex-dialect parity for the scrub patterns where the driver corpus
  * cannot test it: documents.text contains no '@' and no digits, so
  * q226's email/IPv4 branches are exercised with ZERO matches by the
  * DuckDB oracle — a Java-vs-RE2 divergence would ship silently and only
  * bite on real PII-bearing data. The expected values below were computed
  * by running the oracle's exact SQL (same pattern strings verbatim) in
  * DuckDB 1.x over these fixtures; Spark must reproduce them cell-exact.
  */
class CurationSpec extends SparkSpec {

  private val fixtures = Seq(
    (0L, "contact me at alice.smith+spam@example.org or bob@sub.domain.co for details"),
    (1L, "server at 192.168.1.254 and backup at 10.0.0.1; fake 999.999.999.999 still matches shape"),
    (2L, "no pii here just a slow customer walking"),
    (3L, "edge: a@b.cd x@y.z 1.2.3.4.5 trailing ip 8.8.8.8"),
    (4L, "UPPER@CASE.COM should not match the lowercase-only pattern"),
    (5L, ""))

  // (doc_id, n_email, n_ip, n_deny, clean) — DuckDB's output, pinned.
  // Notable cells: '999.999.999.999' matches the SHAPE pattern (by
  // design — octet-range validation is downstream's job); '1.2.3.4.5'
  // yields one match ('1.2.3.4', the trailing '.' is a word boundary, so
  // the scrub leaves '[PII].5'); 'x@y.z' fails the two-letter TLD
  // minimum; uppercase never matches.
  private val expected = Seq(
    (0L, 2L, 0L, 0L, "contact me at [PII] or [PII] for details"),
    (1L, 0L, 3L, 0L, "server at [PII] and backup at [PII]; fake [PII] still matches shape"),
    (2L, 0L, 0L, 2L, "no pii here just a [TERM] [TERM] walking"),
    (3L, 1L, 2L, 0L, "edge: [PII] x@y.z [PII].5 trailing ip [PII]"),
    (4L, 0L, 0L, 0L, "UPPER@CASE.COM should not match the lowercase-only pattern"),
    (5L, 0L, 0L, 0L, ""))

  test("scrub patterns match DuckDB's RE2 semantics cell-exact on PII-bearing text") {
    import spark.implicits._
    val rows = fixtures.toDF("doc_id", "text")
      .select(
        col("doc_id"),
        size(regexp_extract_all(col("text"), lit(CurationQueries.emailPat), lit(0)))
          .cast("long").as("n_email"),
        size(regexp_extract_all(col("text"), lit(CurationQueries.ipPat), lit(0)))
          .cast("long").as("n_ip"),
        size(regexp_extract_all(col("text"), lit(CurationQueries.denyPat), lit(0)))
          .cast("long").as("n_deny"),
        regexp_replace(regexp_replace(
          regexp_replace(col("text"), CurationQueries.emailPat, "[PII]"),
          CurationQueries.ipPat, "[PII]"),
          CurationQueries.denyPat, "[TERM]").as("clean"))
      .orderBy("doc_id")
      .as[(Long, Long, Long, Long, String)].collect().toSeq
    assert(rows == expected)
  }

  test("the curation family survives an empty-text document without NaN leakage") {
    import spark.implicits._
    // EdgeCorpus texts are non-empty by contract, so this shape is pinned
    // here instead: text = "" gives n_chars = 0 (the q229 nullif-guard
    // case) and a single empty token; nothing may crash, and the funnel's
    // quality gate must fail CLOSED (NULL route), not report NaN
    val dir = java.nio.file.Files.createTempDirectory("graft_emptytext").toString
    Seq((0L, "", "en", "src0", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    Seq("q226_pii_denylist_scrub", "q227_repetition_profile",
        "q228_source_mixture_sample", "q229_curation_funnel").foreach { q =>
      val rows = SparkEntry.queries(q)(spark, dir).collect()
      assert(rows != null, s"$q crashed on the empty-text corpus")
    }
    val funnel = SparkEntry.queries("q229_curation_funnel")(spark, dir).collect().head
    assert(funnel.getLong(0) === 1L)            // n_total sees the doc
    assert(funnel.getLong(2) === 0L,            // n_quality: gate fails closed
      "the quality gate must reject the empty-text doc via the NULL route")
  }
}
