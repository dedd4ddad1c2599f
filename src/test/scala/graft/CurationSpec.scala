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

  test("markup extraction handles chrome the driver corpus cannot exercise") {
    import spark.implicits._
    import graft.functions.TextQueries
    // the corpus text is markup-free, so q269's oracle only proves the
    // happy path; these fixtures pin the extractor on adversarial markup
    val rows = Seq(
      // attribute-bearing script inside the article drops WITH content
      ("<x><article><script type=\"text/js\">track(1);</script>real content" +
        "</article><footer>no</footer></x>", "real content"),
      // multiple tags and runs of spaces collapse to single spaces
      ("<article><p>a</p>  <p>b</p><br/><em>c</em></article>", "a b c"),
      // nothing outside the article survives, even text-bearing chrome
      ("<nav>Home</nav><article>kept</article><div>dropped</div>", "kept"),
      // an empty article extracts to the empty string, not a crash
      ("<article></article>", ""),
      // no article at all extracts empty (regexp_extract's no-match form)
      ("<p>orphan</p>", ""),
      // multiline block: (?s) spans newlines, runs of mixed whitespace
      // (newline/tab) collapse to single spaces
      ("<article class=\"post\">line one\n\tline two\r\nline three</article>",
        "line one line two line three"),
      // attribute-bearing article tag segments like the bare one
      ("<article data-id=\"7\" class=\"a b\"><p>attr ok</p></article>",
        "attr ok"),
      // REPEATED articles all contribute, in order, chrome between dropped
      ("<article>first</article><aside>ad</aside><article>second</article>",
        "first second"),
      // nested articles: the regex extractor yields the leftmost-open to
      // first-close span — the nested opening tag strips as a tag, text
      // after the inner close drops (documented segmentation semantics,
      // not a parse tree)
      ("<article>outer <article>inner</article> tail</article>",
        "outer inner"),
      // a commented-out close tag cannot terminate the block, and comment
      // bodies vanish wholesale
      ("<article>keep <!-- </article> fake --> going</article>",
        "keep going"),
      // CDATA payloads are non-content and drop wholesale
      ("<article>a <![CDATA[ <raw> & markup ]]> b</article>", "a b"),
      // script content containing '<' still drops with its element
      ("<article><script>if(a<b){track();}</script>real</article>", "real"),
      // style elements inside the article drop with their content
      ("<article><style>.x{color:red}</style>styled</article>", "styled"),
      // multiline script spans drop under (?s)
      ("<article><script>\nvar a=1;\nif(a<2){go();}\n</script>body</article>",
        "body")
    ).toDF("html", "expected")
    val got = rows.select(TextQueries.extractMarkup(col("html")).as("x"),
      col("expected")).collect()
    got.foreach(r => assert(r.getString(0) == r.getString(1),
      s"extracted '${r.getString(0)}' != expected '${r.getString(1)}'"))
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

  test("q242 matches a sequential frozen-classifier reference and is live per language") {
    val got = SparkEntry.queries("q242_classifier_gate")(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getBoolean(7))).toMap

    val wts = Map(
      "de" -> (2L, 30L, -40L, -5L, -7700L),
      "en" -> (2L, 30L, -40L, -5L, -4200L),
      "es" -> (2L, 30L, -40L, -5L, -6400L),
      "fr" -> (2L, 30L, -40L, -5L, -9400L),
      "zh" -> (2L, 0L, -40L, -5L, 12600L))
    val stops = Set("the", "a", "and", "of")

    val docs = Tables.documents(spark, sf)
      .select("doc_id", "text", "lang").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val outcomes = scala.collection.mutable.Map.empty[String, Set[Boolean]]
    docs.foreach { case (id, text, lang) =>
      val w = text.toLowerCase.split(" ", -1)
      val nChars = text.length.toLong
      val nTokens = w.length.toLong
      val sumTokLen = w.map(_.length.toLong).sum
      val nStop = w.count(stops).toLong
      val nPunct = text.count(c =>
        !((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9') || c == ' ')).toLong
      val nUniq = w.distinct.length.toLong
      val atl = (1000L * sumTokLen) / nTokens
      val stopBp = (10000L * nStop) / nTokens
      val punctBp = if (nChars == 0) 10000L else (10000L * nPunct) / nChars
      val ttrBp = (10000L * nUniq) / nTokens
      val (wa, ws, wp, wt, b) = wts.getOrElse(lang, (2L, 30L, -40L, -5L, -20000L))
      val logit = wa * atl + ws * stopBp + wp * punctBp + wt * ttrBp + b
      assert(got(id) === ((lang, atl, stopBp, punctBp, ttrBp, logit, logit > 0)),
        s"doc $id")
      outcomes(lang) = outcomes.getOrElse(lang, Set.empty) + (logit > 0)
    }
    // the gate must be LIVE in every stratum: per-lang bias calibration
    // means each language both admits and rejects on the driver corpus
    outcomes.foreach { case (lang, o) =>
      assert(o === Set(true, false), s"$lang gate is vacuous: $o")
    }
  }

  test("q242 routes an unknown language through the strict default weights") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_unklang").toString
    // two unknown-lang docs straddling the default bias: the stopword-dense
    // pangram's raw score (~36670) clears even -20000, the distinct-token
    // line (~-17500 raw) cannot — proving the fallback is the DEFAULT row
    // exactly (logit carries bias -20000, the strictest in the table) and
    // that the left join drops nothing
    val passText = "the quick brown fox jumps over the lazy dog and runs off"
    val failText = "quick brown foxes jump over seven lazy sleeping dogs tonight quietly somewhere"
    Seq((0L, passText, "xx", "src0", passText.length.toLong),
        (1L, failText, "xx", "src0", failText.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = SparkEntry.queries("q242_classifier_gate")(spark, dir).collect()
    assert(rows.length === 2, "unknown lang must survive the left join")
    rows.foreach { r =>
      val atl = r.getLong(2); val stopBp = r.getLong(3)
      val punctBp = r.getLong(4); val ttrBp = r.getLong(5)
      assert(r.getLong(6) ===
        2L * atl + 30L * stopBp - 40L * punctBp - 5L * ttrBp - 20000L,
        s"doc ${r.getLong(0)}: fallback must use the default weight row")
      assert(r.getBoolean(7) === (r.getLong(6) > 0L), s"doc ${r.getLong(0)}")
    }
    assert(rows.map(_.getBoolean(7)).toSet === Set(true, false),
      "the default gate must be live: one doc clears -20000, one does not")
  }
}
