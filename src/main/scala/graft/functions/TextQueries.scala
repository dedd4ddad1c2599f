package graft.functions

import graft.{GraftQuery, Tables}
import graft.Staging.StagingOps
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis family for the LLM-data-pipeline surface (SURVEY.md §2.2):
  * language ID (marker-token heuristic), quality scoring, token counting
  * (whitespace + BPE-ish regex) and rolling-hash fingerprinting — all over
  * `documents.text`.
  *
  * Everything is built-in expressions (split / filter / aggregate /
  * regexp_*) — per-row, shuffle-free map work that scales embarrassingly;
  * the only exchanges are the final presentation sorts. No transcendental
  * functions in oracle-checked outputs (libm last-ulp drift across engines).
  */
object TextQueries {

  /** Base-31 polynomial fold mod 1e9+7 over a string's characters — the
    * repo's shared content fingerprint (q48/q155/q156/q168). Init-0 fold is
    * identical to DuckDB's init-free `list_reduce` (0·31+c₁ = c₁); acc
    * stays < 2^30 so acc·31+c never overflows a long. */
  /** The Count-Min hash family shared by q215, the streaming CMS operator
    * and their specs: (row, multiplier, offset) of four affine maps over the
    * [[base31Fold]] fingerprint, mod 1000003 mod 256. ONE definition so the
    * batch sketch, the streaming sketch and every probe bucket identically. */
  private[graft] val cmsParams = Seq((0, 40503L, 12289L), (1, 48271L, 25601L),
    (2, 16807L, 7919L), (3, 69621L, 104729L))

  private[graft] def base31Fold(str: Column): Column =
    aggregate(
      transform(split(str, ""), c => ascii(c).cast("long")),
      lit(0L), (a, b) => pmod(a * 31 + b, lit(1000000007L)))

  /** [[base31Fold]] in the oracles' DuckDB dialect, over any string
    * expression — q48/q155/q156/q168 (and q39/q40's LSH replay) interpolate
    * this so a fold tweak moves every oracle together with the engine (the
    * leadFingerprintSql discipline). */
  private[graft] def base31FoldSql(inner: String): String =
    s"list_reduce(list_transform(string_split($inner, ''), " +
      s"c -> CAST(ascii(c) AS BIGINT)), (a, b) -> (a * 31 + b) % 1000000007)"

  /** q148's capped mixture weight — target/actual in ppm, actual floored
    * at 1 ppm (the q136 div-zero guard), capped at 10× — over a frame with
    * `tokens`, `tt` (corpus total) and `n_langs` in scope. ONE definition
    * consumed by q148 (reports the weights) and q170 (applies them): a cap
    * or floor tweak must move both ends of the pipeline together.
    * [[cappedWeightSql]] is the identical DuckDB form. */
  private def cappedWeight: Column =
    least(expr("(1000000 div n_langs) * 1000000" +
      " div greatest(tokens * 1000000 div tt, 1L)"), lit(10000000L))

  private val cappedWeightSql: String =
    "least((1000000 // n_langs) * 1000000" +
      " // greatest(tokens * 1000000 // tt, 1), 10000000)"

  /** Frequency-ranked vocabulary — (u, n, rn, cum) plus the 1-row token
    * total — ONE definition shared by q163 (coverage curve) and q174
    * (pruning impact), so both answer questions about the SAME
    * vocabulary under the same tokenization and tie-break (count desc,
    * type asc). [[rankedVocabSql]] is the identical oracle CTE chain. */
  private def rankedVocab(
      s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    import org.apache.spark.sql.expressions.Window
    val c = Tables.documents(s, dir)
      .select(explode(split(lower(col("text")), " ")).as("u"))
      .groupBy("u").agg(count(lit(1)).as("n"))
    val tot = c.agg(sum("n").as("t"))
    val ord = Window.orderBy(col("n").desc, col("u"))
    val r = c
      .withColumn("rn", row_number().over(ord).cast("long"))
      .withColumn("cum", sum("n").over(
        ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    (r, tot)
  }

  private val rankedVocabSql: String =
    """WITH w AS (
      |  SELECT unnest(string_split(lower(text), ' ')) AS u FROM documents
      |), c AS (
      |  SELECT u, CAST(count(*) AS BIGINT) AS n FROM w GROUP BY u
      |), tot AS (
      |  SELECT CAST(sum(n) AS BIGINT) AS t FROM c
      |), r AS (
      |  SELECT u, n,
      |         row_number() OVER (ORDER BY n DESC, u) AS rn,
      |         sum(n) OVER (ORDER BY n DESC, u
      |                      ROWS UNBOUNDED PRECEDING) AS cum
      |  FROM c
      |)""".stripMargin

  /** Count of tokens of `w` that appear in the marker list. */
  private[graft] def markerCount(w: Column, markers: Seq[String]): Column =
    size(filter(w, x => x.isInCollection(markers))).cast("long")

  private[graft] val enM = Seq("the", "a", "and", "of")
  private[graft] val esM = Seq("el", "la", "de", "y")
  private[graft] val deM = Seq("der", "die", "das", "und")
  private[graft] val frM = Seq("le", "la", "et", "les")

  /** Bigram stream of `documents.text` — ONE definition shared by q64
    * (exact counts), q85 (Misra-Gries sketch) and the MG-bound spec that
    * compares them: a tokenization tweak applied to one copy would
    * silently invalidate the sketch-vs-exact contract. The split is
    * staged as a column first — inlined, it would re-tokenize the text at
    * every element_at site (O(tokens²) per doc). */
  /** Hashed 4-gram stream `(doc_id, s)` of `documents.text` — ONE
    * definition shared by q76 (broadcast-join decontamination) and q96
    * (its Bloom-prefiltered scale form), so both flag exactly the same
    * overlaps. 4-grams are hashed (xxhash64 of the four token hashes —
    * the strings never materialize); the token-hash array is staged as a
    * column before indexing (inlined it would re-hash all tokens at every
    * element_at site). */
  private[graft] def fourGramHashes(s: SparkSession, dir: String): DataFrame = {
    val w = split(lower(col("text")), " ")
    Tables.documents(s, dir)
      .filter(size(w) >= 4)
      .select(col("doc_id"), transform(w, t => xxhash64(t)).as("hw"))
      .select(col("doc_id"),
        explode(array_distinct(transform(sequence(lit(1), size(col("hw")) - 3),
          i => xxhash64(element_at(col("hw"), i), element_at(col("hw"), i + 1),
            element_at(col("hw"), i + 2), element_at(col("hw"), i + 3))))).as("s"))
  }

  /** Space-joined word bigrams of a token-array column — THE definition of
    * "bigram" for the whole file (q64/q85 via [[bigrams]], q99, q157, q165,
    * q182): a tokenization tweak applied to one copy would silently
    * decouple the collocation, diversity and signature operators from the
    * corpus n-gram statistics they claim to extend. */
  private[graft] def bigramArray(w: Column): Column =
    when(size(w) >= 2,
      transform(sequence(lit(1), size(w) - 1),
        i => concat_ws(" ", element_at(w, i), element_at(w, i + 1))))
      .otherwise(array().cast("array<string>"))

  private[graft] def bigrams(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(split(lower(col("text")), " ").as("w"))
      .select(explode(bigramArray(col("w"))).as("bigram"))

  /** q269's deterministic HTML envelope template — interpolated into BOTH
    * the Spark builder and the DuckDB oracle (the leadFingerprintSql
    * discipline), so the synthesized markup can never drift between
    * engines. No single quotes (SQL literal safety); the chrome carries
    * head/title, script + style elements, nav and footer text, and an
    * INLINE script inside the article the extractor must drop wholesale. */
  private[graft] val HtmlPre = "<html><head><title>"
  private[graft] val HtmlMid =
    "</title><script>var a=1;track();</script><style>.x{margin:0}</style>" +
      "</head><body><nav>Home | Browse | Contact</nav>" +
      "<article><script>inline();</script><p>"
  private[graft] val HtmlTail1 = "</p></article><footer>(c) "
  private[graft] val HtmlTail2 = " - all rights reserved</footer></body></html>"

  /** q269's extraction chain over any html column, hardened to
    * scraped-corpus reality (VERDICT r11 item 4):
    *
    *  1. comments and CDATA sections drop WHOLESALE first — a
    *     commented-out `</article>` must not terminate the block, and
    *     CDATA payloads are non-content;
    *  2. segmentation takes EVERY `<article …>` block (attribute-bearing
    *     opening tags included) via non-greedy `regexp_extract_all`,
    *     joined by a space — repeated articles all contribute, and `(?s)`
    *     lets blocks span lines (for nested articles the regex extractor
    *     yields the leftmost-open to first-close span — the documented
    *     regex-segmentation semantics, not a parse tree);
    *  3. script AND style elements drop with their content even when the
    *     content contains `<` (non-greedy span, not `[^<]*`);
    *  4. remaining tags strip, whitespace runs (space/tab/newline/CR/FF —
    *     an explicit class, byte-identical in Java and RE2 where `\\s`
    *     differs on \\x0B) collapse to one space.
    *
    * Dialect-portable regexes only — `(?s)` + non-greedy are RE2∩Java;
    * backreferences are NOT (RE2 lacks them), hence separate script and
    * style passes. Shared by the query and the adversarial fixture spec. */
  private[graft] def extractMarkup(html: Column): Column = {
    val cleaned = regexp_replace(
      regexp_replace(html, "(?s)<!--.*?-->", " "),
      "(?s)<!\\[CDATA\\[.*?\\]\\]>", " ")
    val body = concat_ws(" ",
      regexp_extract_all(cleaned,
        lit("(?s)<article[^>]*>(.*?)</article>"), lit(1)))
    trim(regexp_replace(
      regexp_replace(
        regexp_replace(
          regexp_replace(body, "(?s)<script[^>]*>.*?</script>", " "),
          "(?s)<style[^>]*>.*?</style>", " "),
        "<[^>]*>", " "),
      "[ \\t\\n\\r\\f]+", " "))
  }

  val all: Seq[GraftQuery] = Seq(

    GraftQuery(
      "q45_lang_id",
      Some("""WITH t AS (
             |  SELECT doc_id, lang, string_split(lower(text), ' ') w FROM documents
             |), scored AS (
             |  SELECT doc_id, lang,
             |    len(list_filter(w, x -> list_contains(['the','a','and','of'], x))) n_en,
             |    len(list_filter(w, x -> list_contains(['el','la','de','y'], x)))   n_es,
             |    len(list_filter(w, x -> list_contains(['der','die','das','und'], x))) n_de,
             |    len(list_filter(w, x -> list_contains(['le','la','et','les'], x))) n_fr
             |  FROM t
             |)
             |SELECT doc_id, lang, n_en, n_es, n_de, n_fr,
             |  CASE WHEN n_en >= n_es AND n_en >= n_de AND n_en >= n_fr AND n_en > 0 THEN 'en'
             |       WHEN n_es >= n_de AND n_es >= n_fr AND n_es > 0 THEN 'es'
             |       WHEN n_de >= n_fr AND n_de > 0 THEN 'de'
             |       WHEN n_fr > 0 THEN 'fr'
             |       ELSE 'und' END AS pred_lang
             |FROM scored
             |ORDER BY doc_id""".stripMargin),
      "Marker-token language ID: fixed lexicons folded into codegen'd array " +
        "filters — no dictionary join, no shuffle; the lexicon lives in the " +
        "instruction stream. At 100 TB swap the marker lists for per-lang " +
        "n-gram profile tables broadcast to every executor; plan unchanged."
    ) { (s, dir) =>
      val w = split(lower(col("text")), " ")
      val scored = Tables.documents(s, dir).select(
        col("doc_id"), col("lang"),
        markerCount(w, enM).as("n_en"), markerCount(w, esM).as("n_es"),
        markerCount(w, deM).as("n_de"), markerCount(w, frM).as("n_fr"))
      scored.withColumn("pred_lang",
        when(col("n_en") >= col("n_es") && col("n_en") >= col("n_de") &&
          col("n_en") >= col("n_fr") && col("n_en") > 0, "en")
          .when(col("n_es") >= col("n_de") && col("n_es") >= col("n_fr") &&
            col("n_es") > 0, "es")
          .when(col("n_de") >= col("n_fr") && col("n_de") > 0, "de")
          .when(col("n_fr") > 0, "fr")
          .otherwise("und"))
        .orderBy("doc_id")
    },

    GraftQuery(
      "q46_text_quality",
      Some("""WITH t AS (
             |  SELECT doc_id, text, string_split(lower(text), ' ') w FROM documents
             |), m AS (
             |  SELECT doc_id,
             |    CAST(len(text) AS BIGINT) n_chars,
             |    CAST(len(w) AS BIGINT) n_tokens,
             |    list_reduce(list_transform(w, x -> CAST(len(x) AS BIGINT)), (a,b) -> a+b) sum_tok_len,
             |    CAST(len(list_filter(w, x -> list_contains(['the','a','and','of'], x))) AS BIGINT) n_stop,
             |    CAST(len(regexp_extract_all(text, '[^a-z0-9 ]')) AS BIGINT) n_punct
             |  FROM t
             |)
             |SELECT doc_id, n_chars, n_tokens,
             |       round(sum_tok_len * 1.0 / n_tokens, 4) AS avg_tok_len,
             |       round(n_stop * 1.0 / n_tokens, 4)      AS stop_ratio,
             |       round(n_punct * 1.0 / n_chars, 4)      AS punct_ratio,
             |       round(0.2 * (sum_tok_len * 1.0 / n_tokens)
             |             + 3.0 * (n_stop * 1.0 / n_tokens)
             |             - 0.5 * (n_punct * 1.0 / n_chars), 4) AS quality
             |FROM m
             |ORDER BY doc_id""".stripMargin),
      "Per-document quality features (length, token stats, stopword / punct " +
        "ratios) folded into one projection — a single pass, no shuffle. The " +
        "linear quality score is deliberately transcendental-free so the " +
        "same bits fall out of any engine."
    ) { (s, dir) =>
      val w = split(lower(col("text")), " ")
      val m = Tables.documents(s, dir).select(
        col("doc_id"),
        length(col("text")).cast("long").as("n_chars"),
        size(w).cast("long").as("n_tokens"),
        aggregate(transform(w, x => length(x).cast("long")), lit(0L), (a, b) => a + b)
          .as("sum_tok_len"),
        markerCount(w, enM).as("n_stop"),
        size(regexp_extract_all(col("text"), lit("[^a-z0-9 ]"), lit(0))).cast("long")
          .as("n_punct"))
      m.select(col("doc_id"), col("n_chars"), col("n_tokens"),
        round(col("sum_tok_len") * 1.0 / col("n_tokens"), 4).as("avg_tok_len"),
        round(col("n_stop") * 1.0 / col("n_tokens"), 4).as("stop_ratio"),
        round(col("n_punct") * 1.0 / col("n_chars"), 4).as("punct_ratio"),
        round(lit(0.2) * (col("sum_tok_len") * 1.0 / col("n_tokens"))
          + lit(3.0) * (col("n_stop") * 1.0 / col("n_tokens"))
          - lit(0.5) * (col("n_punct") * 1.0 / col("n_chars")), 4).as("quality"))
        .orderBy("doc_id")
    },

    GraftQuery(
      "q47_token_count",
      Some("""SELECT doc_id,
             |  CAST(len(string_split(text, ' ')) AS BIGINT) AS ws_tokens,
             |  CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]|[^a-z0-9 ]')) AS BIGINT) AS bpe_tokens,
             |  round(len(text) * 1.0
             |        / len(regexp_extract_all(lower(text), '[a-z]+|[0-9]|[^a-z0-9 ]')), 4)
             |    AS chars_per_token
             |FROM documents
             |ORDER BY doc_id""".stripMargin),
      "Token counting two ways: whitespace split and a BPE-ish pre-token " +
        "regex (letter runs / digits / punct singletons — the GPT-2 " +
        "pre-tokenizer shape). Pure map work; the regex is the same " +
        "class-only pattern in Java and RE2 dialects."
    ) { (s, dir) =>
      val bpe = size(regexp_extract_all(lower(col("text")),
        lit("[a-z]+|[0-9]|[^a-z0-9 ]"), lit(0)))
      Tables.documents(s, dir).select(
        col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("ws_tokens"),
        bpe.cast("long").as("bpe_tokens"),
        round(length(col("text")) * lit(1.0) / bpe, 4).as("chars_per_token"))
        .orderBy("doc_id")
    },

    GraftQuery(
      "q145_vocab_oov_gate",
      Some("""WITH d AS (
             |  SELECT doc_id, lang, string_split(lower(text), ' ') AS w
             |  FROM documents
             |), toks AS (
             |  SELECT unnest(w) AS tok FROM d
             |), vocab AS (
             |  SELECT list(tok) AS vl FROM (
             |    SELECT tok FROM (SELECT tok, count(*) AS n FROM toks GROUP BY tok)
             |    ORDER BY n DESC, tok LIMIT 16)
             |), per AS (
             |  SELECT doc_id, lang, CAST(len(w) AS BIGINT) AS n_tokens,
             |         CAST(len(list_filter(w, t -> NOT list_contains(vl, t)))
             |           AS BIGINT) AS n_oov
             |  FROM d, vocab
             |)
             |SELECT doc_id, lang, n_tokens, n_oov,
             |       CAST(n_oov * 1000000 // n_tokens AS BIGINT) AS oov_ppm,
             |       n_oov * 4 <= n_tokens AS keep
             |FROM per ORDER BY doc_id""".stripMargin),
      "Vocabulary OOV-rate gate — the 'does this document look like the " +
        "target distribution' filter every pretraining pipeline runs " +
        "(CCNet's LM filter reduced to its integer core): the corpus " +
        "top-K vocabulary lands via one map-side-combined token count + " +
        "distributed partial top-K (TakeOrdered — no global sort of the " +
        "vocabulary), is collapsed to a single array row and broadcast; " +
        "each document's OOV count is then ROW-LOCAL array work " +
        "(filter + array_contains inside codegen) — no explode shuffle, " +
        "no per-token join. Gate and ppm are cross-multiplied integers, " +
        "exact on both engines. At 100 TB the only shuffle is the tiny " +
        "vocab aggregation; the scan does everything else in one pass. " +
        "The 1-row vocab crossJoin is the sanctioned q84 broadcast shape."
    ) { (s, dir) =>
      val docs = Tables.documents(s, dir)
        .select(col("doc_id"), col("lang"), split(lower(col("text")), " ").as("w"))
      val vocab = docs.select(explode(col("w")).as("tok"))
        .groupBy("tok").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("tok")).limit(16)
        .groupBy().agg(collect_list(col("tok")).as("vl"))
      docs.crossJoin(broadcast(vocab))
        .select(col("doc_id"), col("lang"),
          size(col("w")).cast("long").as("n_tokens"),
          size(filter(col("w"), t => !array_contains(col("vl"), t)))
            .cast("long").as("n_oov"))
        .withColumn("oov_ppm", expr("n_oov * 1000000 div n_tokens"))
        .withColumn("keep", col("n_oov") * 4 <= col("n_tokens"))
        .orderBy("doc_id")
    },

    GraftQuery(
      "q147_span_corruption",
      Some("""WITH d AS (
             |  SELECT doc_id, string_split(text, ' ') AS w,
             |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n
             |  FROM documents
             |), k AS (
             |  -- T5 schedule: 15% noise density / mean span 3 => n/20 spans
             |  SELECT doc_id, w, n, n // 20 AS n_spans FROM d WHERE n >= 20
             |), spans AS (
             |  -- midpoint-stride starts (the q136 systematic-sampling rule):
             |  -- span i covers [(2i+1)n / (2k), +3) — even coverage, exact ints
             |  SELECT doc_id, n, CAST(i AS BIGINT) AS span_id,
             |         least(((2 * i + 1) * n) // (2 * n_spans), n - 3) AS start
             |  FROM k, unnest(range(0, n_spans)) AS t(i)
             |)
             |SELECT s.doc_id, s.span_id, CAST(s.start AS BIGINT) AS start,
             |       CAST(3 AS BIGINT) AS span_len,
             |       array_to_string(d.w[s.start + 1 : s.start + 3], ' ')
             |         AS masked_text
             |FROM spans s JOIN d USING (doc_id)
             |ORDER BY doc_id, span_id""".stripMargin),
      "Span-corruption schedule generation — the T5/UL2 denoising " +
        "objective's data-side half, run as a corpus pass: each document " +
        "gets ⌊n/20⌋ mask spans (15% noise density at mean span 3) whose " +
        "starts follow the q136 midpoint-stride rule, so coverage is even, " +
        "deterministic and pure integer arithmetic — no RNG state to " +
        "reproduce across engines or executors, which is exactly what " +
        "makes a masking schedule auditable (same doc bytes → same spans, " +
        "any cluster size). Span extraction is a row-local array slice; " +
        "the explode produces one row per span (the training-example " +
        "grain) with no shuffle before the presentation sort. At 100 TB " +
        "this is scan-shaped map work; schedules for other objectives " +
        "(prefix-LM split points, PrefixSpan windows) swap the stride " +
        "formula only."
    ) { (s, dir) =>
      val d = Tables.documents(s, dir)
        .select(col("doc_id"), split(col("text"), " ").as("w"))
        .withColumn("n", size(col("w")).cast("long"))
        .filter(col("n") >= 20)
        .withColumn("n_spans", expr("n div 20"))
      d.select(col("doc_id"), col("w"), col("n"),
          explode(sequence(lit(0L), col("n_spans") - 1)).as("span_id"))
        .withColumn("start",
          least(expr("((2 * span_id + 1) * n) div (2 * (n div 20))"),
            col("n") - 3))
        .select(col("doc_id"), col("span_id"), col("start"),
          lit(3L).as("span_len"),
          array_join(slice(col("w"), (col("start") + 1).cast("int"), lit(3)), " ")
            .as("masked_text"))
        .orderBy("doc_id", "span_id")
    },

    GraftQuery(
      "q148_domain_reweight",
      Some(s"""WITH per AS (
             |  SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
             |         CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS tokens
             |  FROM documents GROUP BY lang
             |), tot AS (
             |  SELECT sum(tokens) AS tt, count(*) AS n_langs FROM per
             |)
             |SELECT lang, n_docs, tokens,
             |       CAST(tokens * 1000000 // tt AS BIGINT) AS actual_ppm,
             |       CAST(1000000 // n_langs AS BIGINT) AS target_ppm,
             |       -- weight = target/actual in ppm, capped 10x; actual is
             |       -- floored at 1 ppm so a <1ppm domain hits the cap
             |       -- instead of dividing by zero (the q136 guard: Spark
             |       -- NULLs a zero divisor, DuckDB raises)
             |       CAST($cappedWeightSql AS BIGINT) AS weight_ppm
             |FROM per, tot
             |ORDER BY lang""".stripMargin),
      "Domain reweighting — the DoReMi/data-mixing step that turns a " +
        "measured corpus composition into per-domain resampling weights: " +
        "actual token share per language (exact integer ppm of one tiny " +
        "map-side-combined aggregate), a target distribution (uniform " +
        "here; any broadcast table slots in), and weight = target/actual " +
        "capped at 10× — all cross-multiplied BIGINT arithmetic, so both " +
        "engines agree to the last ppm. Applying the weights downstream " +
        "is a broadcast join + one multiply per row (q136's PPS sampler " +
        "or q123's temperature mixture consume exactly this shape). At " +
        "100 TB the aggregate shuffles |domains| rows; everything else " +
        "rides the scan."
    ) { (s, dir) =>
      val per = Tables.documents(s, dir)
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(size(split(col("text"), " ")).cast("long")).as("tokens"))
      val tot = per.agg(sum("tokens").as("tt"),
        count(lit(1)).as("n_langs"))
      per.crossJoin(broadcast(tot))
        .select(col("lang"), col("n_docs"), col("tokens"),
          expr("tokens * 1000000 div tt").as("actual_ppm"),
          expr("1000000 div n_langs").as("target_ppm"),
          cappedWeight.as("weight_ppm"))
        .orderBy("lang")
    },

    GraftQuery(
      "q150_length_bucket_batching",
      Some("""WITH d AS (
             |  SELECT CAST(len(string_split(text, ' ')) AS BIGINT) AS n
             |  FROM documents
             |), b AS (
             |  SELECT n,
             |         CASE WHEN n <= 16 THEN 16 WHEN n <= 32 THEN 32
             |              WHEN n <= 64 THEN 64 ELSE 128 END AS bucket_cap
             |  FROM d
             |)
             |SELECT CAST(bucket_cap AS BIGINT) AS bucket_cap,
             |       CAST(count(*) AS BIGINT) AS n_docs,
             |       CAST(sum(n) AS BIGINT) AS tokens,
             |       CAST(count(*) * bucket_cap AS BIGINT) AS padded_tokens,
             |       CAST((count(*) * bucket_cap - sum(n)) * 1000000
             |              // (count(*) * bucket_cap) AS BIGINT) AS waste_ppm
             |FROM b GROUP BY bucket_cap
             |ORDER BY bucket_cap""".stripMargin),
      "Length-bucketed batching audit — the padding-efficiency report " +
        "behind every dynamic-batching trainer (docs padded to a fixed " +
        "per-bucket sequence length; waste = padding share): documents " +
        "land in fixed power-of-two capacity buckets via a branch-free-" +
        "friendly CASE (fixed bucket lists are what production uses — " +
        "512/1024/2048/...; an integer CASE also sidesteps the log2 " +
        "float-ulp trap at exact powers of two that would flicker " +
        "between engines), then one map-side-combined aggregate emits " +
        "docs, real tokens, padded tokens and waste in exact ppm per " +
        "bucket. At 100 TB this is one scan and a |buckets|-row shuffle " +
        "— the report that decides whether to re-cut bucket boundaries " +
        "before a training run."
    ) { (s, dir) =>
      Tables.documents(s, dir)
        .select(size(split(col("text"), " ")).cast("long").as("n"))
        .withColumn("bucket_cap",
          when(col("n") <= 16, 16L).when(col("n") <= 32, 32L)
            .when(col("n") <= 64, 64L).otherwise(128L))
        .groupBy("bucket_cap")
        .agg(count(lit(1)).as("n_docs"), sum("n").as("tokens"))
        .select(col("bucket_cap"), col("n_docs"), col("tokens"),
          (col("n_docs") * col("bucket_cap")).as("padded_tokens"),
          expr("(n_docs * bucket_cap - tokens) * 1000000" +
            " div (n_docs * bucket_cap)").as("waste_ppm"))
        .orderBy("bucket_cap")
    },

    GraftQuery(
      "q151_nsp_pairs",
      Some("""WITH d AS (
             |  SELECT doc_id,
             |         string_split(text, ' ') AS w,
             |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n
             |  FROM documents
             |), seg AS (
             |  SELECT doc_id,
             |         array_to_string(w[1 : CAST(n // 2 AS INT)], ' ') AS a_text,
             |         array_to_string(w[CAST(n // 2 + 1 AS INT) : CAST(n AS INT)], ' ')
             |           AS b_text
             |  FROM d
             |), cnt AS (
             |  SELECT count(*) AS nd FROM d
             |)
             |SELECT s.doc_id, s.a_text, s.b_text AS pos_text,
             |       CAST((s.doc_id + 1 + s.doc_id % 13) % cnt.nd AS BIGINT)
             |         AS neg_doc_id,
             |       neg.b_text AS neg_text
             |FROM seg s CROSS JOIN cnt
             |JOIN seg neg ON neg.doc_id = (s.doc_id + 1 + s.doc_id % 13) % cnt.nd
             |ORDER BY s.doc_id""".stripMargin),
      "Next-segment-prediction pair construction (the BERT NSP / " +
        "contrastive-document objective's data side): each document " +
        "splits into segment A (first half) and segment B (second half) " +
        "row-locally; the POSITIVE example is the document's own B, the " +
        "NEGATIVE is the B of a deterministically displaced partner " +
        "(doc_id + 1 + doc_id mod 13, mod corpus size — never self, no " +
        "RNG, reproducible at any parallelism; the corpus count is a " +
        "1-row broadcast). The only real join is the equi self-join " +
        "fetching the partner's segment — one shuffle on the partner " +
        "id, carrying ids and one segment string. At 100 TB the " +
        "displacement rule keeps negatives uniformly spread without a " +
        "global shuffle-and-pair pass."
    ) { (s, dir) =>
      val d = Tables.documents(s, dir)
        .select(col("doc_id"), split(col("text"), " ").as("w"))
        .withColumn("n", size(col("w")).cast("long"))
      val seg = d.select(col("doc_id"),
        expr("array_join(slice(w, 1, cast(n div 2 as int)), ' ')").as("a_text"),
        expr("array_join(slice(w, cast(n div 2 + 1 as int)," +
          " cast(n - n div 2 as int)), ' ')").as("b_text"))
      val cnt = d.agg(count(lit(1)).as("nd"))
      val withNeg = seg.crossJoin(broadcast(cnt))
        .withColumn("neg_doc_id",
          (col("doc_id") + 1 + col("doc_id") % 13) % col("nd"))
      withNeg
        .join(seg.select(col("doc_id").as("neg_doc_id"),
          col("b_text").as("neg_text")), "neg_doc_id")
        .select(col("doc_id"), col("a_text"), col("b_text").as("pos_text"),
          col("neg_doc_id"), col("neg_text"))
        .orderBy("doc_id")
    },

    GraftQuery(
      "q152_dataset_card",
      Some("""WITH base AS (
             |  SELECT source, lang, sha256(text) AS h,
             |         CAST(len(string_split(text, ' ')) AS BIGINT) AS nt
             |  FROM documents
             |), dupd AS (
             |  SELECT *, count(*) OVER (PARTITION BY h) > 1 AS is_dup FROM base
             |), per AS (
             |  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
             |         CAST(sum(nt) AS BIGINT) AS tokens,
             |         CAST(count(*) FILTER (is_dup) AS BIGINT) AS dup_docs,
             |         CAST(count(DISTINCT lang) AS BIGINT) AS n_langs
             |  FROM dupd GROUP BY source
             |), toplang AS (
             |  SELECT source, lang AS top_lang, nl FROM (
             |    SELECT source, lang, CAST(count(*) AS BIGINT) AS nl,
             |           row_number() OVER (PARTITION BY source
             |                              ORDER BY count(*) DESC, lang) AS rk
             |    FROM base GROUP BY source, lang
             |  ) WHERE rk = 1
             |)
             |SELECT p.source, p.n_docs, p.tokens, p.dup_docs, p.n_langs,
             |       t.top_lang,
             |       CAST(t.nl * 1000000 // p.n_docs AS BIGINT) AS top_lang_ppm
             |FROM per p JOIN toplang t USING (source)
             |ORDER BY p.source""".stripMargin),
      "Dataset-card generation — the per-source audit row a corpus ships " +
        "with (docs, tokens, duplicate share, language composition): " +
        "exact-dup membership comes from a window count over the content " +
        "digest (corpus-wide, so cross-source copies count in BOTH " +
        "sources — the honest number for provenance review), language " +
        "majority via the per-(source,lang) count + deterministic " +
        "rank-1 pick, shares in exact ppm. Three shuffles total (digest " +
        "window, source agg, source×lang agg), each map-side combined; " +
        "the digests never leave the window stage. At 100 TB this is " +
        "the report that runs after every ingest batch — and each piece " +
        "is the first stage of an existing operator (q38's digest, " +
        "q123's composition), so the card stays consistent with the " +
        "pipeline it describes."
    ) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val base = Tables.documents(s, dir)
        .select(col("source"), col("lang"), sha2(col("text"), 256).as("h"),
          size(split(col("text"), " ")).cast("long").as("nt"))
      val dupd = base.withColumn("is_dup",
        count(lit(1)).over(Window.partitionBy("h")) > 1)
      val per = dupd.groupBy("source")
        .agg(count(lit(1)).as("n_docs"), sum("nt").as("tokens"),
          sum(when(col("is_dup"), 1L).otherwise(0L)).as("dup_docs"),
          countDistinct("lang").as("n_langs"))
      val toplang = base.groupBy("source", "lang")
        .agg(count(lit(1)).as("nl"))
        .withColumn("rk", row_number().over(
          Window.partitionBy("source").orderBy(col("nl").desc, col("lang"))))
        .filter(col("rk") === 1)
        .select(col("source"), col("lang").as("top_lang"), col("nl"))
      per.join(toplang, "source")
        .select(col("source"), col("n_docs"), col("tokens"), col("dup_docs"),
          col("n_langs"), col("top_lang"),
          expr("nl * 1000000 div n_docs").as("top_lang_ppm"))
        .orderBy("source")
    },

    GraftQuery(
      "q153_gate_sensitivity",
      Some("""WITH d AS (
             |  SELECT string_split(lower(text), ' ') AS w FROM documents
             |), toks AS (
             |  SELECT unnest(w) AS tok FROM d
             |), vocab AS (
             |  SELECT list(tok) AS vl FROM (
             |    SELECT tok FROM (SELECT tok, count(*) AS n FROM toks GROUP BY tok)
             |    ORDER BY n DESC, tok LIMIT 16)
             |), per AS (
             |  SELECT CAST(len(w) AS BIGINT) AS n_tokens,
             |         CAST(len(list_filter(w, t -> NOT list_contains(vl, t)))
             |           AS BIGINT) AS n_oov
             |  FROM d, vocab
             |), th(pct) AS (
             |  VALUES (5), (10), (20), (30), (50)
             |)
             |SELECT CAST(pct AS BIGINT) AS threshold_pct,
             |       CAST(count(*) FILTER (n_oov * 100 <= n_tokens * pct)
             |         AS BIGINT) AS kept_docs,
             |       CAST(coalesce(sum(n_tokens)
             |              FILTER (n_oov * 100 <= n_tokens * pct), 0)
             |         AS BIGINT) AS kept_tokens,
             |       CAST(count(*) AS BIGINT) AS total_docs
             |FROM per, th
             |GROUP BY pct
             |ORDER BY threshold_pct""".stripMargin),
      "Gate-sensitivity sweep — the calibration report a pipeline runs " +
        "BEFORE freezing a quality threshold (how much data does each " +
        "candidate cutoff keep?): q145's OOV rate evaluated against five " +
        "thresholds in ONE corpus scan, by crossing each document's " +
        "(n_tokens, n_oov) pair with a 5-row threshold list and " +
        "conditionally aggregating — the broadcast fan-out costs 5 tiny " +
        "rows per doc ONLY inside the agg's map side (partials collapse " +
        "to 5 groups before the exchange), never a materialized 5× " +
        "corpus. Gates are cross-multiplied integers, exact everywhere. " +
        "At 100 TB sweeping thresholds this way is 5× cheaper than five " +
        "gate runs, and the same shape sweeps any scalar gate (length, " +
        "punct ratio, quality score)."
    ) { (s, dir) =>
      val docs = Tables.documents(s, dir)
        .select(split(lower(col("text")), " ").as("w"))
      val vocab = docs.select(explode(col("w")).as("tok"))
        .groupBy("tok").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("tok")).limit(16)
        .groupBy().agg(collect_list(col("tok")).as("vl"))
      val per = docs.crossJoin(broadcast(vocab))
        .select(size(col("w")).cast("long").as("n_tokens"),
          size(filter(col("w"), t => !array_contains(col("vl"), t)))
            .cast("long").as("n_oov"))
      val th = s.range(0, 5).select(
        element_at(typedlit(Seq(5L, 10L, 20L, 30L, 50L)), (col("id") + 1).cast("int"))
          .as("threshold_pct"))
      per.crossJoin(broadcast(th))
        .groupBy("threshold_pct")
        .agg(
          sum(when(col("n_oov") * 100 <= col("n_tokens") * col("threshold_pct"),
            1L).otherwise(0L)).as("kept_docs"),
          coalesce(sum(when(
            col("n_oov") * 100 <= col("n_tokens") * col("threshold_pct"),
            col("n_tokens"))), lit(0L)).as("kept_tokens"),
          count(lit(1)).as("total_docs"))
        .orderBy("threshold_pct")
    },

    GraftQuery(
      "q155_cdc_chunking",
      Some(s"""WITH d AS (
             |  SELECT doc_id, string_split(lower(text), ' ') AS w
             |  FROM documents
             |), t AS (
             |  SELECT doc_id, CAST(i AS BIGINT) AS pos, w[i] AS tok
             |  FROM d, unnest(range(1, len(w) + 1)) AS u(i)
             |), h AS (
             |  SELECT doc_id, pos, ${base31FoldSql("tok")} AS th
             |  FROM t
             |), c AS (
             |  SELECT doc_id, pos, th,
             |         sum(CASE WHEN th % 16 = 0 THEN 1 ELSE 0 END)
             |           OVER (PARTITION BY doc_id ORDER BY pos) AS chunk_id
             |  FROM h
             |)
             |SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
             |       CAST(count(*) AS BIGINT) AS n_tokens,
             |       CAST(list_reduce(list(th ORDER BY pos),
             |                        (a, b) -> (a * 31 + b) % 1000000007)
             |         AS BIGINT) AS chunk_hash
             |FROM c GROUP BY doc_id, chunk_id
             |ORDER BY doc_id, chunk_id""".stripMargin),
      "Content-defined chunking — variable-size chunk boundaries cut " +
        "where the CONTENT says so (token-hash ≡ 0 mod 16, the memoryless " +
        "gear-hash rule), not at fixed offsets: an insertion early in a " +
        "document shifts every q95/q128-style fixed chunk but leaves all " +
        "CDC chunks after the next boundary byte-identical — the property " +
        "storage dedup and incremental-ingest pipelines buy with this " +
        "operator (only changed chunks re-process). Token hashes are the " +
        "q48 base-31 fold (init-0 fold ≡ DuckDB's init-free fold, since " +
        "0·31+c₁ = c₁), chunk membership is one running-sum window keyed " +
        "by doc, and each chunk's address is the ordered fold of its " +
        "token hashes. One shuffle on doc_id at any scale; expected " +
        "chunk length is the modulus (16), tunable per corpus."
    ) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      // NOTE: split('', ' ') is [''] on BOTH engines (one empty token) —
      // verified empirically; show() renders [''] as [], which once made
      // this look like a divergence. Empty texts tile as one ''-chunk.
      val toks = Tables.documents(s, dir)
        .select(col("doc_id"),
          posexplode(split(lower(col("text")), " ")).as(Seq("pos", "tok")))
        .select(col("doc_id"), (col("pos") + 1).cast("long").as("pos"),
          base31Fold(col("tok")).as("th"))
      val w = Window.partitionBy("doc_id").orderBy("pos")
      toks
        .withColumn("chunk_id",
          sum(when(pmod(col("th"), lit(16L)) === 0, 1L).otherwise(0L)).over(w))
        .groupBy("doc_id", "chunk_id")
        .agg(count(lit(1)).as("n_tokens"),
          sort_array(collect_list(struct(col("pos"), col("th")))).as("seq"))
        .select(col("doc_id"), col("chunk_id"), col("n_tokens"),
          aggregate(transform(col("seq"), p => p.getField("th")),
            lit(0L), (a, b) => pmod(a * 31 + b, lit(1000000007L)))
            .as("chunk_hash"))
        .orderBy("doc_id", "chunk_id")
    },

    GraftQuery(
      "q156_corpus_digest",
      Some(s"""WITH f AS (
             |  SELECT source,
             |         ${base31FoldSql("substr(lower(text), 1, 64)")} AS fp
             |  FROM documents
             |)
             |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
             |       CAST(bit_xor(fp) AS BIGINT) AS xor_digest
             |FROM f GROUP BY source
             |ORDER BY source""".stripMargin),
      "Corpus integrity digest — the checksum a pipeline compares across " +
        "stage boundaries (post-ingest vs post-clean vs post-shuffle) to " +
        "prove no partition was dropped or doubled: per-document content " +
        "fingerprints (q48's fold) XOR-reduced per source. XOR is " +
        "associative, commutative and self-inverse, so the aggregate is " +
        "ORDER- AND PARTITIONING-INDEPENDENT — every executor folds its " +
        "split locally into 8 bytes and the merge is one XOR per " +
        "partition (bit_xor is a codegen'd Spark aggregate, matching " +
        "DuckDB's bit_xor exactly on BIGINT); re-partitioning, AQE " +
        "re-plans or speculative re-runs cannot change it, while any " +
        "lost/duplicated document flips it. The 100 TB form of 'did the " +
        "copy lose anything' that never sorts, samples or collects."
    ) { (s, dir) =>
      Tables.documents(s, dir)
        .select(col("source"),
          base31Fold(substring(lower(col("text")), 1, 64)).as("fp"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          expr("bit_xor(fp)").as("xor_digest"))
        .orderBy("source")
    },

    GraftQuery(
      "q48_fingerprint",
      Some(s"""SELECT doc_id,
             |  ${base31FoldSql("substr(lower(text), 1, 64)")} AS fp,
             |  ${base31FoldSql("substr(lower(text), 1, 64)")} % 1024 AS shard
             |FROM documents
             |ORDER BY doc_id""".stripMargin),
      "Rolling polynomial fingerprint (base-31 mod 1e9+7) over the head of " +
        "each document — a cheap content address for shard routing and " +
        "incremental dedup. acc stays < 2^30, so acc*31+c < 2^36: no " +
        "overflow under ANSI arithmetic. `shard` shows fingerprint-based " +
        "partition assignment (1024-way)."
    ) { (s, dir) =>
      val fp = base31Fold(substring(lower(col("text")), 1, 64))
      Tables.documents(s, dir).select(
        col("doc_id"), fp.as("fp"), pmod(fp, lit(1024L)).as("shard"))
        .orderBy("doc_id")
    },

    GraftQuery(
      "q64_top_ngrams",
      Some("""WITH t AS (
             |  SELECT string_split(lower(text), ' ') w FROM documents
             |), grams AS (
             |  SELECT unnest(list_transform(range(1, greatest(len(w), 1)),
             |                               i -> w[i] || ' ' || w[i+1])) g
             |  FROM t
             |)
             |SELECT g AS bigram, count(*) AS n
             |FROM grams
             |GROUP BY g
             |ORDER BY n DESC, bigram
             |LIMIT 20""".stripMargin),
      "Corpus-level n-gram statistics: explode bigrams → count → global " +
        "top-k. The count is a partial+final hash agg (shuffle carries one " +
        "row per distinct bigram per partition) and the top-20 is " +
        "TakeOrderedAndProject — per-task heaps, no global sort. The " +
        "explode multiplies rows by ~tokens-per-doc, which is why the " +
        "count must combine map-side."
    ) { (s, dir) =>
      bigrams(s, dir)
        .groupBy("bigram")
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("bigram"))
        .limit(20)
    },

    GraftQuery(
      "q69_pipeline_clean",
      Some("""WITH t AS (
             |  SELECT doc_id, lang, text, string_split(lower(text), ' ') w FROM documents
             |), m AS (
             |  SELECT doc_id, lang, text,
             |    CAST(len(w) AS BIGINT) n_tokens,
             |    CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]|[^a-z0-9 ]')) AS BIGINT) bpe_tokens,
             |    CAST(len(list_filter(w, x -> list_contains(
             |      ['the','a','and','of','el','la','de','y','der','die','das','und','le','et','les'], x))) AS BIGINT) n_stop,
             |    CAST(len(regexp_extract_all(text, '[^a-z0-9 ]')) AS BIGINT) n_punct,
             |    CAST(len(text) AS BIGINT) n_chars
             |  FROM t
             |), good AS (
             |  SELECT * FROM m
             |  WHERE n_tokens >= 10 AND n_stop * 10 >= n_tokens AND n_punct * 5 <= n_chars
             |), dedup AS (
             |  SELECT * FROM good
             |  QUALIFY row_number() OVER (PARTITION BY sha256(text) ORDER BY doc_id) = 1
             |)
             |SELECT lang, count(*) AS n_docs,
             |       CAST(sum(bpe_tokens) AS BIGINT) AS total_tokens,
             |       CAST((sum(bpe_tokens) * 100 + count(*) // 2) // count(*) AS BIGINT)
             |         AS avg_token_hundredths
             |FROM dedup
             |GROUP BY lang
             |ORDER BY lang""".stripMargin),
      "The cleaning pipeline COMPOSED: quality gates → exact dedup → " +
        "per-language corpus stats, one declarative plan. Quality gates are " +
        "pure integer arithmetic (stopword/punct ratios as cross-multiplied " +
        "longs — no float drift between engines, no second scan); dedup is " +
        "a window over the content digest (first doc_id wins, deterministic " +
        "keeper); stats aggregate exact longs — the mean is emitted as " +
        "integer hundredths (half-up long division) so the oracle compare " +
        "never touches a cross-engine double. Catalyst pipelines the gates " +
        "into the scan, and the only exchanges are the digest window and " +
        "the tiny per-lang agg — at 100 TB this whole cleaning pass is one " +
        "shuffle of the survivors plus map work."
    ) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val allMarkers = enM ++ esM ++ deM ++ frM
      val w = split(lower(col("text")), " ")
      val m = Tables.documents(s, dir).select(
        col("doc_id"), col("lang"), col("text"),
        size(w).cast("long").as("n_tokens"),
        size(regexp_extract_all(lower(col("text")),
          lit("[a-z]+|[0-9]|[^a-z0-9 ]"), lit(0))).cast("long").as("bpe_tokens"),
        markerCount(w, allMarkers).as("n_stop"),
        size(regexp_extract_all(col("text"), lit("[^a-z0-9 ]"), lit(0)))
          .cast("long").as("n_punct"),
        length(col("text")).cast("long").as("n_chars"))
      val good = m.filter(col("n_tokens") >= 10 &&
        col("n_stop") * 10 >= col("n_tokens") &&
        col("n_punct") * 5 <= col("n_chars"))
      val dedup = good
        .withColumn("rn", row_number().over(
          Window.partitionBy(sha2(col("text"), 256)).orderBy("doc_id")))
        .filter(col("rn") === 1)
      dedup.groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("bpe_tokens")).as("total_tokens"))
        // Half-up integer mean in hundredths: pure long arithmetic on both
        // engines, so the driver's hash compare never sees a double.
        .withColumn("avg_token_hundredths",
          expr("(total_tokens * 100 + n_docs div 2) div n_docs"))
        .orderBy("lang")
    },

    GraftQuery(
      "q72_hash_sample",
      Some("""WITH s AS (
             |  SELECT doc_id, lang,
             |         substr(sha256(text), 1, 2) AS bucket
             |  FROM documents
             |  WHERE substr(sha256(text), 1, 2) < '20'
             |)
             |SELECT lang, count(*) AS n_sampled, min(doc_id) AS first_doc
             |FROM s
             |GROUP BY lang
             |ORDER BY lang""".stripMargin),
      "Deterministic content-hash sampling — THE reproducible sampling for " +
        "training-data pipelines: membership depends only on the document " +
        "bytes (sha256 prefix < '20' ≈ 1/8), so re-runs, different " +
        "partitionings and different engines select the same documents, " +
        "and the filter pipelines into the scan with no RNG state. " +
        "Rate-tuning is just the threshold; stratified rates are a CASE on " +
        "the stratum. Contrast df.sample(): partition-order-dependent RNG, " +
        "irreproducible across engines or repartitioning."
    ) { (s, dir) =>
      Tables.documents(s, dir)
        .withColumn("bucket", substring(sha2(col("text"), 256), 1, 2))
        .filter(col("bucket") < "20")
        .groupBy("lang")
        .agg(count(lit(1)).as("n_sampled"), min(col("doc_id")).as("first_doc"))
        .orderBy("lang")
    },

    GraftQuery(
      "q75_redact",
      Some("""SELECT doc_id,
             |       regexp_replace(text, '\b(customer|key)\b', '<REDACTED>', 'g') AS redacted,
             |       CAST(len(regexp_extract_all(text, '\b(customer|key)\b')) AS BIGINT) AS n_redacted
             |FROM documents
             |WHERE doc_id < 200
             |ORDER BY doc_id""".stripMargin),
      "PII/sensitive-term redaction: a word-boundary regexp_replace over a " +
        "term list (in production: compiled pattern sets for emails, phone " +
        "numbers, ids), plus the per-doc redaction count for audit. Pure " +
        "codegen map work — the scrub runs inside the scan stage, no " +
        "shuffle, and composes with the cleaning pipeline's other gates."
    ) { (s, dir) =>
      val pat = "\\b(customer|key)\\b"
      Tables.documents(s, dir)
        .filter(col("doc_id") < 200)
        .select(col("doc_id"),
          regexp_replace(col("text"), pat, "<REDACTED>").as("redacted"),
          size(regexp_extract_all(col("text"), lit(pat), lit(0)))
            .cast("long").as("n_redacted"))
        .orderBy("doc_id")
    },

    GraftQuery(
      "q76_decontaminate",
      Some("""WITH t AS (
             |  SELECT doc_id, string_split(lower(text), ' ') w FROM documents
             |), sh AS (
             |  SELECT doc_id, unnest(list_distinct(list_transform(
             |           range(1, greatest(len(w)-2, 1)),
             |           i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3]))) s
             |  FROM t WHERE len(w) >= 4
             |), eval_sh AS (
             |  SELECT DISTINCT s FROM sh WHERE doc_id % 97 = 0
             |)
             |SELECT sh.doc_id, count(DISTINCT sh.s) AS n_shared
             |FROM sh JOIN eval_sh USING (s)
             |WHERE sh.doc_id % 97 <> 0
             |GROUP BY sh.doc_id
             |ORDER BY doc_id""".stripMargin),
      "Eval-set decontamination (GPT-3/Pile style): training docs sharing " +
        "any 4-gram with the held-out eval set are flagged with their " +
        "overlap count. 4-grams are HASHED (xxhash64 of the four token " +
        "hashes — the strings never materialize, q41's trick), the tiny " +
        "eval side's distinct hashes BROADCAST to an inner join against " +
        "the corpus shingle stream, and the corpus never shuffles at all: " +
        "only flagged (doc, hash) survivors reach the count. The oracle " +
        "counts the same overlaps on the actual strings — hash-green means " +
        "zero 64-bit collisions on this corpus, checked every round."
    ) { (s, dir) =>
      val sh = fourGramHashes(s, dir)
      val evalSh = sh.filter(col("doc_id") % 97 === 0).select("s").distinct()
      sh.filter(col("doc_id") % 97 =!= 0)
        .join(broadcast(evalSh), "s")
        .groupBy("doc_id")
        .agg(countDistinct(col("s")).as("n_shared"))
        .orderBy("doc_id")
    },

    GraftQuery(
      "q77_repetition",
      Some("""WITH t AS (
             |  SELECT doc_id, string_split(lower(text), ' ') w FROM documents
             |)
             |SELECT doc_id,
             |       CAST(len(w) AS BIGINT) AS n_tokens,
             |       CAST(len(list_distinct(w)) AS BIGINT) AS n_distinct,
             |       round(len(list_distinct(w)) * 1.0 / len(w), 4) AS ttr,
             |       CAST(list_max(list_transform(list_distinct(w),
             |              t -> len(list_filter(w, x -> x = t)))) AS BIGINT) AS top_tok_n
             |FROM t
             |ORDER BY doc_id""".stripMargin),
      "Repetition / diversity scoring: type-token ratio and the dominant " +
        "token's count — the classic filters for degenerate repetitive " +
        "generations in training corpora. All array HOFs inside one " +
        "projection; per-doc cost is O(distinct·n) on short docs, with the " +
        "hashed-counter variant (aggregate into a map) the swap-in for " +
        "long documents."
    ) { (s, dir) =>
      val w = split(lower(col("text")), " ")
      Tables.documents(s, dir)
        .select(col("doc_id"), w.as("w"))
        .select(col("doc_id"),
          size(col("w")).cast("long").as("n_tokens"),
          size(array_distinct(col("w"))).cast("long").as("n_distinct"),
          round(size(array_distinct(col("w"))) * lit(1.0) / size(col("w")), 4).as("ttr"),
          array_max(transform(array_distinct(col("w")),
            t => size(filter(col("w"), x => x === t)))).cast("long").as("top_tok_n"))
        .orderBy("doc_id")
    },

    GraftQuery(
      "q85_heavy_hitters",
      None, // approximate by design: Misra-Gries bound spec'd vs exact q64.
      "Approximate top-k bigrams via a native mergeable Misra-Gries " +
        "summary (k=256 counters): each task folds its rows into a " +
        "FIXED-SIZE sketch and the shuffle moves ≤256 (term, cnt) pairs " +
        "per partition, where the exact form (q64) shuffles one row per " +
        "distinct bigram per partition — unbounded vocabulary, bounded " +
        "sketch. The MG guarantee (every term with true count > n/257 " +
        "present; estimates low by ≤ n/257) is spec-checked against q64's " +
        "exact counts. THE shape for 'top URLs / templates / boilerplate " +
        "lines over 100 TB' where the distinct space itself doesn't fit."
    ) { (s, dir) =>
      val sketch = bigrams(s, dir)
        .agg(Sketches.heavyHitters(col("bigram"), 256).as("hh"))
      sketch.select(explode(col("hh")).as("e"))
        .select(col("e.term").as("bigram"), col("e.cnt").as("est_n"))
        .orderBy(col("est_n").desc, col("bigram"))
        .limit(20)
    },

    GraftQuery(
      "q91_median_gate",
      Some("""WITH m AS (
             |  SELECT doc_id, lang,
             |         CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS n_tokens
             |  FROM documents
             |), ranked AS (
             |  SELECT lang, n_tokens,
             |         row_number() OVER (PARTITION BY lang ORDER BY n_tokens, doc_id) rn,
             |         count(*) OVER (PARTITION BY lang) cnt
             |  FROM m
             |), med AS (
             |  SELECT lang, n_tokens AS med FROM ranked WHERE rn = (cnt + 1) // 2
             |)
             |SELECT m.lang, count(*) AS n_above, min(m.doc_id) AS first_doc,
             |       max(med.med) AS med
             |FROM m JOIN med USING (lang)
             |WHERE m.n_tokens > med.med
             |GROUP BY m.lang
             |ORDER BY m.lang""".stripMargin),
      "Per-group distribution gate: keep documents above their OWN " +
        "language's median length — absolute thresholds misfire across " +
        "languages with different tokenization densities. The median is " +
        "rank-selected explicitly (row at ⌊(n+1)/2⌋ of a total order), so " +
        "both engines agree by construction instead of by matching " +
        "quantile-interpolation conventions; the tiny per-lang median " +
        "table then joins back (broadcast at any scale — one row per " +
        "lang). The rank window funnels each language through one " +
        "partition: exact and fine to ~10^8 rows per group; past that, " +
        "swap in the mergeable approx_percentile sketch (q73) — same " +
        "plan, sketch instead of sort."
    ) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val m = Tables.documents(s, dir)
        .select(col("doc_id"), col("lang"),
          size(split(lower(col("text")), " ")).cast("long").as("n_tokens"))
      val med = m
        .withColumn("rn", row_number().over(
          Window.partitionBy("lang").orderBy("n_tokens", "doc_id")))
        .withColumn("cnt", count(lit(1)).over(Window.partitionBy("lang")))
        .filter(col("rn") === expr("(cnt + 1) div 2")) // integer div, as the oracle's //
        .select(col("lang"), col("n_tokens").as("med"))
      m.join(broadcast(med), "lang")
        .filter(col("n_tokens") > col("med"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_above"), min("doc_id").as("first_doc"),
          max("med").as("med"))
        .orderBy("lang")
    },

    GraftQuery(
      "q82_char_terms",
      Some("""WITH tok AS (
             |  SELECT doc_id, unnest(string_split(lower(text), ' ')) term
             |  FROM documents
             |), tf AS (
             |  SELECT doc_id, term, count(*) tf FROM tok GROUP BY 1, 2
             |), scored AS (
             |  SELECT doc_id, term, tf, count(*) OVER (PARTITION BY term) AS df
             |  FROM tf
             |), cut AS (
             |  SELECT * FROM scored
             |  WHERE df * 10 <= (SELECT count(*) FROM documents)
             |), ranked AS (
             |  SELECT doc_id, term, tf, df,
             |         row_number() OVER (PARTITION BY doc_id
             |                            ORDER BY tf DESC, df ASC, term) rk
             |  FROM cut
             |)
             |SELECT doc_id, term, CAST(rk AS BIGINT) AS rk, tf, df
             |FROM ranked WHERE rk <= 3
             |ORDER BY doc_id, rk""".stripMargin),
      "Characteristic terms per document — the TF-IDF-shaped fingerprint of " +
        "what makes each doc distinct, kept INTEGER-EXACT: terms rank by " +
        "(tf DESC, df ASC, term) with a df·10 ≤ N ubiquity cutoff, which is " +
        "rank-equivalent to tf·idf for fixed tf but cross-engine " +
        "hash-stable (a log() in the score would drift by libm ulps). N " +
        "comes from parquet footers, not a count job. Document frequency is " +
        "a groupBy (partial agg absorbs stopword skew map-side — a window " +
        "over term would funnel every 'the' row through one partition), " +
        "the cutoff drops ubiquitous terms from the tiny df side BEFORE " +
        "the equi-join back, so the join build side holds informative " +
        "terms only and the rank window partitions by doc. Nothing heavier " +
        "than (doc, term, count) ever shuffles."
    ) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val nDocs = Tables.parquetRowCount(s, dir, "documents")
      val tf = Tables.documents(s, dir)
        .select(col("doc_id"), explode(split(lower(col("text")), " ")).as("term"))
        .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      val informative = tf.groupBy("term").agg(count(lit(1)).as("df"))
        .filter(col("df") * 10 <= lit(nDocs))
      tf.join(informative, "term")
        .withColumn("rk", row_number().over(Window.partitionBy("doc_id")
          .orderBy(col("tf").desc, col("df").asc, col("term"))).cast("long"))
        .filter(col("rk") <= 3)
        .select("doc_id", "term", "rk", "tf", "df")
        .orderBy("doc_id", "rk")
    },

    GraftQuery(
      "q83_dataset_split",
      Some("""WITH assigned AS (
             |  SELECT doc_id, lang,
             |         CASE WHEN substr(sha256(text), 1, 2) < 'cc' THEN 'train'
             |              WHEN substr(sha256(text), 1, 2) < 'e6' THEN 'val'
             |              ELSE 'test' END AS split
             |  FROM documents
             |)
             |SELECT split, lang, count(*) AS n_docs,
             |       min(doc_id) AS first_doc, max(doc_id) AS last_doc
             |FROM assigned
             |GROUP BY split, lang
             |ORDER BY split, lang""".stripMargin),
      "Deterministic train/val/test split (~80/10/10 by content hash): " +
        "membership depends only on the document bytes, so the split is " +
        "reproducible across engines, re-runs and repartitionings, and a " +
        "document that appears twice lands in the SAME split — the " +
        "property that prevents train/test leakage through duplicates, " +
        "which row-number or random splits do not have. Pure map work " +
        "fused into the scan; the only exchange is the tiny per-(split, " +
        "lang) report. The audit report is the operator: at 100 TB the " +
        "same CASE is a partition column on write."
    ) { (s, dir) =>
      val h = substring(sha2(col("text"), 256), 1, 2)
      Tables.documents(s, dir)
        .select(col("doc_id"), col("lang"),
          when(h < "cc", "train").when(h < "e6", "val").otherwise("test").as("split"))
        .groupBy("split", "lang")
        .agg(count(lit(1)).as("n_docs"),
          min("doc_id").as("first_doc"), max("doc_id").as("last_doc"))
        .orderBy("split", "lang")
    },

    GraftQuery(
      "q94_pack_sequences",
      Some("""WITH t AS (
             |  SELECT doc_id, lang,
             |         CAST(len(string_split(text, ' ')) AS BIGINT) AS tok
             |  FROM documents
             |), c AS (
             |  SELECT doc_id, lang, tok,
             |         sum(tok) OVER (PARTITION BY lang ORDER BY doc_id
             |                        ROWS BETWEEN UNBOUNDED PRECEDING
             |                        AND CURRENT ROW) AS cum
             |  FROM t
             |)
             |SELECT lang, CAST((cum - tok) // 512 AS BIGINT) AS seq_id,
             |       count(*) AS n_docs, CAST(sum(tok) AS BIGINT) AS seq_tokens,
             |       min(doc_id) AS first_doc, max(doc_id) AS last_doc
             |FROM c
             |GROUP BY lang, seq_id
             |ORDER BY lang, seq_id""".stripMargin),
      "Sequence packing (GPT-style concatenate-and-cut): documents are laid " +
        "end to end in deterministic (lang, doc_id) order and cut into " +
        "fixed 512-token training blocks; each doc is assigned the block " +
        "its first token falls in via a running-sum window — no RNG, no " +
        "driver state, reproducible across re-runs and engines. The window " +
        "and the block aggregation share one hash partitioning on lang, so " +
        "packing a 100 TB corpus is a single shuffle of (doc, tokens) " +
        "pairs; at that scale lang would be the write-time partition " +
        "column and each partition packs independently — exactly this " +
        "plan, executor-parallel per language shard."
    ) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("lang").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.documents(s, dir)
        .select(col("doc_id"), col("lang"),
          size(split(col("text"), " ")).cast("long").as("tok"))
        .withColumn("cum", sum("tok").over(w))
        .withColumn("seq_id", expr("(cum - tok) div 512"))
        .groupBy("lang", "seq_id")
        .agg(count(lit(1)).as("n_docs"), sum("tok").as("seq_tokens"),
          min("doc_id").as("first_doc"), max("doc_id").as("last_doc"))
        .orderBy("lang", "seq_id")
    },

    GraftQuery(
      "q95_chunk_overlap",
      Some("""WITH t AS (
             |  SELECT doc_id,
             |         CAST(len(string_split(text, ' ')) AS BIGINT) AS tok
             |  FROM documents
             |)
             |SELECT doc_id,
             |       cs // 96 AS chunk_idx,
             |       cs AS chunk_start,
             |       least(128, tok - cs) AS chunk_len
             |FROM (
             |  SELECT doc_id, tok,
             |         unnest(generate_series(0, tok - 1, 96)) AS cs
             |  FROM t
             |)
             |ORDER BY doc_id, chunk_start""".stripMargin),
      "Overlapping chunk windows (RAG / long-doc preprocessing): each " +
        "document fans out to stride-96 windows of up to 128 tokens (32 " +
        "overlap), so every token appears in at least one chunk and " +
        "context survives the cut. The start offsets come from a Generate " +
        "over sequence(0, tok-1, 96) fused into the scan — per-row fan-out " +
        "with zero shuffle; chunk boundaries are pure arithmetic on the " +
        "token count, so the (usually much larger) text column is never " +
        "re-scanned per chunk. At 100 TB the chunk rows land partitioned " +
        "by the same doc-hash layout as the input — the fan-out is " +
        "embarrassingly parallel map work."
    ) { (s, dir) =>
      Tables.documents(s, dir)
        .select(col("doc_id"),
          size(split(col("text"), " ")).cast("long").as("tok"))
        .select(col("doc_id"), col("tok"),
          explode(sequence(lit(0L), col("tok") - 1L, lit(96L))).as("cs"))
        .select(col("doc_id"),
          expr("cs div 96").as("chunk_idx"),
          col("cs").as("chunk_start"),
          least(lit(128L), col("tok") - col("cs")).as("chunk_len"))
        .orderBy("doc_id", "chunk_start")
    },

    GraftQuery(
      "q96_bloom_decontaminate",
      // Same contract as q76 — the Bloom prefilter is an exactness-
      // preserving optimization, so the oracle is identical.
      Some("""WITH t AS (
             |  SELECT doc_id, string_split(lower(text), ' ') w FROM documents
             |), sh AS (
             |  SELECT doc_id, unnest(list_distinct(list_transform(
             |           range(1, greatest(len(w)-2, 1)),
             |           i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3]))) s
             |  FROM t WHERE len(w) >= 4
             |), eval_sh AS (
             |  SELECT DISTINCT s FROM sh WHERE doc_id % 97 = 0
             |)
             |SELECT sh.doc_id, count(DISTINCT sh.s) AS n_shared
             |FROM sh JOIN eval_sh USING (s)
             |WHERE sh.doc_id % 97 <> 0
             |GROUP BY sh.doc_id
             |ORDER BY doc_id""".stripMargin),
      "q76's decontamination at the scale where the eval set can no longer " +
        "broadcast as a JOIN side: the eval 4-gram hashes collapse into a " +
        "mergeable Bloom filter (native TypedImperativeAggregate, " +
        "bitwise-OR merge — a billion eval n-grams at 1% fp is ~1.4 GB of " +
        "bits, vs tens of GB of raw hashes), which ships once per executor " +
        "as a single broadcast row; the corpus shingle stream probes it " +
        "INSIDE whole-stage codegen (native contains expression over the " +
        "serialized bytes, materialized once per query as a scalar-subquery " +
        "constant — the same shape as Spark's runtime-filter might_contain; " +
        "a per-row binary column read would memcpy the filter per shingle) " +
        "and only the ~fp-rate survivors reach the exact confirm join — " +
        "which makes the final answer EXACT, not approximate: Bloom " +
        "filters have no false negatives, and the confirm join (AQE picks " +
        "its strategy; at this fp rate the candidate side is tiny) removes " +
        "the false positives. The corpus never shuffles; the one " +
        "data-sized exchange of q76 is gone."
    ) { (s, dir) =>
      import Sketches.{bloomContains, bloomOf}
      val sh = fourGramHashes(s, dir)
      val evalSh = sh.filter(col("doc_id") % 97 === 0).select("s").distinct()
      // size from footer stats, zero jobs (the q42/q67 sizing convention):
      // eval docs ≈ corpus/97, ≲512 distinct 4-grams each, ~10 bits/key
      val filter = bloomOf(evalSh, col("s"), Sketches.bloomBits(
        (Tables.parquetRowCount(s, dir, "documents") / 97 + 1) * 512 * 10))
      sh.filter(col("doc_id") % 97 =!= 0)
        .filter(bloomContains(filter, col("s")))
        .join(evalSh, "s")
        .groupBy("doc_id")
        .agg(countDistinct(col("s")).as("n_shared"))
        .orderBy("doc_id")
    },

    GraftQuery(
      "q99_bigram_novelty",
      Some("""WITH t AS (
             |  SELECT doc_id, string_split(lower(text), ' ') w FROM documents
             |  WHERE len(string_split(lower(text), ' ')) >= 2
             |), st AS (
             |  SELECT doc_id, unnest(list_transform(range(1, len(w)),
             |           i -> w[i] || ' ' || w[i+1])) s
             |  FROM t
             |), cnt AS (
             |  SELECT s, count(*) c FROM st GROUP BY s
             |)
             |SELECT st.doc_id,
             |       count(*) AS n_bigrams,
             |       count(*) FILTER (WHERE cnt.c <= 2) AS n_rare,
             |       (10000 * count(*) FILTER (WHERE cnt.c <= 2)) // count(*)
             |         AS novelty_bp
             |FROM st JOIN cnt USING (s)
             |GROUP BY st.doc_id
             |ORDER BY doc_id""".stripMargin),
      "Corpus-LM novelty scoring (the integer-exact core of an n-gram " +
        "language-model quality filter): every document is scored by the " +
        "fraction of its bigram tokens that are RARE in the whole corpus " +
        "(count ≤ 2) — high novelty flags gibberish/noise for the " +
        "cleaning gate, near-zero novelty flags boilerplate, exactly how " +
        "perplexity-based filters are used, but with no cross-engine " +
        "transcendental (a log-prob would drift; a count ratio in basis " +
        "points cannot). Spark side streams hashed bigrams (the q41 " +
        "narrow-shuffle trick — strings never shuffle, and hash-green " +
        "every round proves zero collisions). The bigram stream is " +
        "derived twice in this single-plan form (count side and scoring " +
        "side — their exchange subtrees differ, so ReuseExchange cannot " +
        "fire); at 100 TB you materialize it once as a columnar staging " +
        "table and both passes — the count aggregation and the scoring " +
        "join, co-partitioned on the bigram key — read the staged " +
        "stream. One doc_id shuffle then aggregates; nothing here is " +
        "corpus-quadratic."
    ) { (s, dir) =>
      val w = split(lower(col("text")), " ")
      // stage the token-hash array BEFORE indexing (the q64 lesson:
      // inlined, element_at re-evaluates the transform per site)
      val st = Tables.documents(s, dir)
        .filter(size(w) >= 2)
        .select(col("doc_id"), transform(w, t => xxhash64(t)).as("hw"))
        .select(col("doc_id"),
          explode(transform(sequence(lit(1), size(col("hw")) - 1),
            i => xxhash64(element_at(col("hw"), i), element_at(col("hw"), i + 1))))
            .as("s"))
        // materialized once — the count side and the scoring join both read
        // the staged stream (the note's own 100 TB posture, now the plan:
        // the single-plan form derived the tokenize+hash pass twice, since
        // the count side's partial agg sits below its exchange and
        // ReuseExchange cannot fire)
        .staged
      val cnt = st.groupBy("s").agg(count(lit(1)).as("c"))
      st.join(cnt, "s")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_bigrams"),
          count(when(col("c") <= 2, 1)).as("n_rare"))
        .select(col("doc_id"), col("n_bigrams"), col("n_rare"),
          expr("(10000 * n_rare) div n_bigrams").as("novelty_bp"))
        .orderBy("doc_id")
    },

    GraftQuery(
      "q100_stratified_sample",
      Some("""WITH ranked AS (
             |  SELECT lang, source, doc_id,
             |         row_number() OVER (PARTITION BY lang
             |                            ORDER BY sha256(text), doc_id) AS rk
             |  FROM documents
             |)
             |SELECT lang, CAST(rk AS BIGINT) AS pick_rank, doc_id, source
             |FROM ranked
             |WHERE rk <= CASE lang WHEN 'en' THEN 50 WHEN 'de' THEN 20
             |                      WHEN 'fr' THEN 20 WHEN 'es' THEN 15
             |                      ELSE 10 END
             |ORDER BY lang, pick_rank""".stripMargin),
      "Stratified exact-n sampling / dataset mixing: each language stratum " +
        "contributes exactly its target quota (the mixture recipe every " +
        "training run pins down), selected in content-hash order — " +
        "membership depends only on the bytes, so the sample is " +
        "reproducible across engines, re-runs and repartitionings, and " +
        "the quota is EXACT, which Bernoulli/rand() sampling cannot " +
        "give. The Spark plan is the skew-safe two-phase rank (q43's " +
        "salted top-k shape): rank within (stratum, doc_id%32 salt) and " +
        "keep quota per salt — any global top-q doc is top-q in its salt " +
        "bucket, so the prune is lossless — then re-rank the ≤32·quota " +
        "survivors per stratum. No task ever sorts a whole stratum: at " +
        "100 TB an 'en' stratum is billions of rows, and the single-" +
        "window form would funnel them into one task; the salted form " +
        "bounds every sort at stratum/32 and the final rank at 32·quota " +
        "rows. The oracle ranks each stratum whole — same answer, which " +
        "is the point: the salt is an execution detail, not a semantic."
    ) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val quota = when(col("lang") === "en", 50)
        .when(col("lang") === "de", 20).when(col("lang") === "fr", 20)
        .when(col("lang") === "es", 15).otherwise(10)
      val base = Tables.documents(s, dir)
        .select(col("lang"), col("source"), col("doc_id"),
          sha2(col("text"), 256).as("hk"))
      val salted = base
        .withColumn("rk1", row_number().over(
          Window.partitionBy(col("lang"), pmod(col("doc_id"), lit(32)))
            .orderBy("hk", "doc_id")))
        .filter(col("rk1") <= quota)
      salted
        .withColumn("rk", row_number().over(
          Window.partitionBy("lang").orderBy("hk", "doc_id")))
        .filter(col("rk") <= quota)
        .select(col("lang"), col("rk").cast("long").as("pick_rank"),
          col("doc_id"), col("source"))
        .orderBy("lang", "pick_rank")
    },

    GraftQuery(
      "q111_token_budget_sample",
      Some("""WITH t AS (
             |  SELECT source, doc_id,
             |         CAST(len(string_split(text, ' ')) AS BIGINT) AS tok,
             |         sha256(text) AS hk
             |  FROM documents
             |), c AS (
             |  SELECT source, doc_id, tok,
             |         CAST(sum(tok) OVER (PARTITION BY source
             |                             ORDER BY hk, doc_id) AS BIGINT) AS cum
             |  FROM t
             |)
             |SELECT source, doc_id, tok AS n_tokens, cum AS cum_tokens
             |FROM c WHERE cum - tok < 600
             |ORDER BY source, cum_tokens""".stripMargin),
      "Per-source TOKEN-budget selection — the other half of dataset " +
        "mixing: q100 pins document COUNTS, this pins each source's token " +
        "contribution (what the training run actually consumes), keeping " +
        "every document whose first token falls inside the budget (the " +
        "q94 cut rule, so the boundary document is kept whole and " +
        "membership is unambiguous). Selection order is the content " +
        "hash — reproducible across engines and re-runs, immune to " +
        "doc_id assignment. One running-sum window per source, one " +
        "exchange; at 100 TB a huge source first takes a cheap hash-" +
        "threshold Bernoulli cut at ~2× budget/total (no ordering " +
        "needed, footer row counts size it), and only the surviving " +
        "sliver pays the exact prefix-sum — the q100 prune-then-rank " +
        "discipline applied to budgets."
    ) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("source").orderBy("hk", "doc_id")
      Tables.documents(s, dir)
        .select(col("source"), col("doc_id"),
          size(split(col("text"), " ")).cast("long").as("tok"),
          sha2(col("text"), 256).as("hk"))
        .withColumn("cum", sum("tok").over(w))
        .filter(col("cum") - col("tok") < 600)
        .select(col("source"), col("doc_id"), col("tok").as("n_tokens"),
          col("cum").as("cum_tokens"))
        .orderBy("source", "cum_tokens")
    },

    GraftQuery(
      "q113_bm25_search",
      Some("""WITH docs AS (
             |  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS dl,
             |         string_split(text, ' ') AS w
             |  FROM documents
             |), stats AS (
             |  SELECT CAST(count(*) AS BIGINT) AS n_docs,
             |         CAST(sum(dl) AS BIGINT) AS tot
             |  FROM docs
             |), tf AS (
             |  SELECT doc_id, dl, term, CAST(count(*) AS BIGINT) AS tf
             |  FROM docs, unnest(w) AS t(term)
             |  WHERE term IN ('spark', 'vector', 'stream')
             |  GROUP BY doc_id, dl, term
             |), dfreq AS (
             |  SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
             |  FROM tf GROUP BY term
             |), scored AS (
             |  -- CASTs force DOUBLE math: a bare BIGINT op DECIMAL-literal
             |  -- expression (tf * 2.2, df + 0.5) is EXACT DECIMAL in DuckDB
             |  -- and floor() of it can differ by 1 from IEEE double by a ulp
             |  SELECT doc_id,
             |         CAST(floor((CAST(n_docs - df AS DOUBLE) + 0.5) / (CAST(df AS DOUBLE) + 0.5)
             |              * (CAST(tf AS DOUBLE) * 2.2)
             |              / (CAST(tf AS DOUBLE) + 1.2 * (0.25 + 0.75 * dl / (CAST(tot AS DOUBLE) / n_docs)))
             |              * 1000000.0) AS BIGINT) AS sc
             |  FROM tf JOIN dfreq USING (term) CROSS JOIN stats
             |)
             |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_terms,
             |       CAST(sum(sc) AS BIGINT) AS score_micros
             |FROM scored GROUP BY doc_id
             |ORDER BY score_micros DESC, doc_id
             |LIMIT 10""".stripMargin),
      "BM25 keyword search (rational-idf variant): the inverted-index " +
        "retrieval shape — tokens explode, the QUERY-TERM filter lands " +
        "before the shuffle so only matching postings ever move (at " +
        "100 TB that is the difference between shuffling 3 terms' " +
        "postings and shuffling the corpus), tf aggregates map-side, " +
        "document frequencies for the 3 terms are a 3-row broadcast, and " +
        "corpus stats (N, total tokens) a 1-row broadcast — the fact " +
        "table never re-shuffles for either. Scoring uses the classic " +
        "Robertson idf SHAPE without the log — (N-df+0.5)/(df+0.5) is " +
        "order-preserving in df, and with k1=1.2, b=0.75 the saturation " +
        "and length normalization are the textbook formula — because " +
        "transcendental libm calls are the one thing two engines " +
        "disagree on; every remaining op is an IEEE basic op on " +
        "integer-derived doubles, bit-identical in any engine, and " +
        "floor() into integer micros BEFORE the per-doc sum makes the " +
        "sum order-independent. Top-10 is TakeOrderedAndProject — a " +
        "10-row heap per task, no global sort. The q111 token counter " +
        "defines dl; the oracle replays the identical expression tree."
    ) { (s, dir) =>
      val docs = Tables.documents(s, dir)
        .select(col("doc_id"),
          size(split(col("text"), " ")).cast("long").as("dl"),
          split(col("text"), " ").as("w"))
      val stats = docs.agg(count(lit(1)).as("n_docs"), sum("dl").as("tot"))
      val tf = docs
        .select(col("doc_id"), col("dl"), explode(col("w")).as("term"))
        .filter(col("term").isin("spark", "vector", "stream"))
        .groupBy("doc_id", "dl", "term").agg(count(lit(1)).as("tf"))
      val dfreq = tf.groupBy("term").agg(countDistinct(col("doc_id")).as("df"))
      tf.join(broadcast(dfreq), "term")
        .crossJoin(broadcast(stats))
        .select(col("doc_id"),
          floor((col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))
            * (col("tf") * lit(2.2))
            / (col("tf") + lit(1.2) * (lit(0.25) + lit(0.75) * col("dl")
                / (col("tot").cast("double") / col("n_docs"))))
            * lit(1000000.0)).as("sc"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_terms"), sum("sc").as("score_micros"))
        .orderBy(col("score_micros").desc, col("doc_id"))
        .limit(10)
    },

    GraftQuery(
      "q122_phrase_search",
      Some("""WITH t AS (
             |  SELECT doc_id, string_split(text, ' ') AS w FROM documents
             |), p AS (
             |  SELECT doc_id, i AS pos, w[i] AS term
             |  FROM t, unnest(range(1, len(w) + 1)) AS r(i)
             |  WHERE w[i] IN ('data', 'column')
             |)
             |SELECT a.doc_id, CAST(count(*) AS BIGINT) AS n_occurrences
             |FROM p a JOIN p b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
             |WHERE a.term = 'data' AND b.term = 'column'
             |GROUP BY a.doc_id
             |ORDER BY a.doc_id""".stripMargin),
      "Positional phrase search — the adjacency half of the IR surface " +
        "q113's BM25 scores: a POSITIONAL posting list (doc, position, " +
        "term) is built by ordinal fan-out (posexplode) and filtered to " +
        "the phrase's terms BEFORE any exchange — only the two terms' " +
        "postings ever shuffle, the q113 discipline with positions " +
        "attached — and the phrase match is a self-equi-join on " +
        "(doc, pos+1): adjacency as a JOIN KEY, not a string scan, which " +
        "is how phrase queries stay index-shaped instead of re-reading " +
        "text. Generalizes to n-term phrases by chaining +k offsets and " +
        "to windowed proximity by banding the position. At 100 TB the " +
        "posting build is the once-per-corpus indexing pass; per-query " +
        "cost is proportional to the queried terms' postings only. " +
        "Positions are 1-based ordinals — identical integer keys in both " +
        "engines."
    ) { (s, dir) =>
      val postings = Tables.documents(s, dir)
        .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos0", "term")))
        .filter(col("term").isin("data", "column"))
        .select(col("doc_id"), (col("pos0") + 1).as("pos"), col("term"))
      postings.alias("a").filter(col("term") === "data")
        .join(postings.alias("b").filter(col("term") === "column"),
          col("a.doc_id") === col("b.doc_id") && col("b.pos") === col("a.pos") + 1)
        .groupBy(col("a.doc_id").as("doc_id"))
        .agg(count(lit(1)).as("n_occurrences"))
        .orderBy("doc_id")
    },

    GraftQuery(
      "q123_temperature_mixture",
      Some("""WITH c AS (
             |  SELECT lang, count(*) AS n FROM documents GROUP BY lang
             |), wt AS (
             |  SELECT lang, CAST(floor(sqrt(CAST(n AS DOUBLE))) AS BIGINT) AS w
             |  FROM c
             |), q AS (
             |  SELECT lang,
             |         (100 * w) // CAST((SELECT sum(w) FROM wt) AS BIGINT) AS quota
             |  FROM wt
             |), r AS (
             |  SELECT lang, doc_id, source,
             |         row_number() OVER (PARTITION BY lang
             |                            ORDER BY sha256(text), doc_id) AS rk
             |  FROM documents
             |)
             |SELECT r.lang AS lang, CAST(q.quota AS BIGINT) AS quota,
             |       CAST(rk AS BIGINT) AS pick_rank, doc_id, source
             |FROM r JOIN q ON r.lang = q.lang
             |WHERE rk <= quota
             |ORDER BY r.lang, pick_rank""".stripMargin),
      "Temperature-scaled mixture sampling (the multilingual-pretraining " +
        "recipe: sample language l proportional to n_l^alpha, alpha=0.5, " +
        "so low-resource languages are UP-weighted relative to their " +
        "share): quotas are DERIVED from the corpus itself — weight = " +
        "floor(sqrt(n)) per stratum, quota = budget*w div sum(w) — " +
        "where q100 took the recipe as given. sqrt is a correctly-" +
        "rounded IEEE op (not libm), floor makes it an integer, and the " +
        "integer quota arithmetic is order-independent — exact in any " +
        "engine, the q113 determinism rule applied to the mixture " +
        "design. Selection within a stratum is content-hash order (q100: " +
        "reproducible, engine-independent membership). The stratum-count " +
        "aggregate is rows-per-lang tiny, broadcast back onto the rank " +
        "filter; at 100 TB the rank runs salted two-phase exactly as " +
        "q100 — the quota derivation adds one metadata-scale aggregate, " +
        "nothing corpus-scale."
    ) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val quotas = Tables.documents(s, dir)
        .groupBy("lang").agg(count(lit(1)).as("n"))
        .withColumn("w", floor(sqrt(col("n").cast("double"))).cast("long"))
        .withColumn("quota",
          expr("(100 * w) div sum(w) over ()").cast("long"))
        .select(col("lang"), col("quota"))
      val base = Tables.documents(s, dir)
        .select(col("lang"), col("source"), col("doc_id"),
          sha2(col("text"), 256).as("hk"))
        .join(broadcast(quotas), "lang")
      // q100's lossless salted prune: any global top-q doc is top-q in its
      // salt bucket, so no task ever ranks a whole stratum
      val salted = base
        .withColumn("rk1", row_number().over(
          Window.partitionBy(col("lang"), pmod(col("doc_id"), lit(32)))
            .orderBy("hk", "doc_id")))
        .filter(col("rk1") <= col("quota"))
      salted
        .withColumn("rk", row_number().over(
          Window.partitionBy("lang").orderBy("hk", "doc_id")))
        .filter(col("rk") <= col("quota"))
        .select(col("lang"), col("quota"), col("rk").cast("long").as("pick_rank"),
          col("doc_id"), col("source"))
        .orderBy("lang", "pick_rank")
    },

    GraftQuery(
      "q128_nested_manifest",
      Some("""WITH toks AS (
             |  SELECT doc_id, lang, string_split(text, ' ') AS w FROM documents
             |), chunks AS (
             |  SELECT doc_id, lang, i AS chunk_idx,
             |         CAST(least(16, len(w) - i * 16) AS BIGINT) AS n_tokens
             |  FROM toks, unnest(range(0, CAST(ceil(len(w) / 16.0) AS BIGINT))) AS t(i)
             |)
             |SELECT doc_id, lang,
             |       CAST(count(*) AS BIGINT) AS n_chunks,
             |       array_to_string(
             |         list(chunk_idx || ':' || n_tokens ORDER BY chunk_idx),
             |         ',') AS chunks_csv
             |FROM chunks
             |GROUP BY doc_id, lang
             |ORDER BY doc_id""".stripMargin),
      "Nested-type result surface: the per-document CHUNK MANIFEST — an " +
        "ordered array<struct<chunk_idx,n_tokens>> column — is the shape " +
        "a training-data catalog actually stores (one row per doc, its " +
        "chunk layout nested inside), and this query pins that the " +
        "engine's nested types survive the full loop: Spark builds the " +
        "array of structs with collect_list(struct(..)) + sort_array " +
        "(struct ordering is lexicographic by field position, so the " +
        "sort is total) — the parquet repeated-group round-trip of the " +
        "nested column itself is pinned by `NestedManifestSpec`; the " +
        "DRIVER-FACING column here is the manifest's canonical " +
        "'idx:tokens,...' string (array columns crash the harness's " +
        "pandas sort — the r3 lesson), which still hash-compares element " +
        "order, field order and values. One shuffle keyed by doc; the " +
        "struct rows ride map-side collect partials. At 100 TB nested " +
        "manifests cut " +
        "the row count 10-100× vs the exploded long form (q95) while " +
        "column pruning still skips the nested column when untouched — " +
        "the q51 payload rule applied to structured metadata."
    ) { (s, dir) =>
      nestedManifest(s, dir)
        .select(col("doc_id"), col("lang"), col("n_chunks"),
          array_join(
            transform(col("chunks"), c => concat(
              c.getField("chunk_idx").cast("string"), lit(":"),
              c.getField("n_tokens").cast("string"))), ",")
            .as("chunks_csv"))
        .orderBy("doc_id")
    },

    GraftQuery(
      "q136_pps_sample",
      Some("""WITH b AS (
             |  SELECT doc_id, n_chars AS w, sha256(text) AS hk FROM documents
             |), c AS (
             |  SELECT doc_id, w, sum(w) OVER (ORDER BY hk, doc_id) AS cum FROM b
             |), t AS (
             |  -- stride floored at 1: a corpus with total weight < 25 would
             |  -- otherwise divide by 0, which Spark NULLs (silent empty
             |  -- result) while DuckDB raises — the one cross-engine
             |  -- divergence integer arithmetic doesn't close by itself
             |  SELECT CAST(sum(w) AS BIGINT) AS tw,
             |         greatest(CAST(sum(w) AS BIGINT) // 25, 1) AS stride
             |  FROM b
             |)
             |SELECT * FROM (
             |  -- + stride on BOTH dividends: shifts each quotient by the same
             |  -- +1 (so the difference is unchanged) while making the operands
             |  -- non-negative, where truncating // would drop the first
             |  -- stride point (floor vs truncate disagree below zero)
             |  SELECT doc_id, CAST(w AS BIGINT) AS w, CAST(cum AS BIGINT) AS cum,
             |         CAST((cum - stride // 2 + stride) // stride
             |            - (cum - w - stride // 2 + stride) // stride AS BIGINT)
             |           AS n_hits
             |  FROM c, t
             |)
             |WHERE n_hits > 0
             |ORDER BY cum""".stripMargin),
      "Systematic PPS sampling (probability proportional to size, the " +
        "survey-sampling workhorse): items line up in CONTENT-HASH order " +
        "(the engine's reproducible stand-in for random order — " +
        "membership depends only on bytes), weights accumulate, and a " +
        "fixed stride tw/25 with midpoint offset picks every item whose " +
        "weight interval contains a stride multiple — exactly n " +
        "expected picks, inclusion probability ∝ weight, heavy items " +
        "legitimately hit multiple times (n_hits). ALL integer " +
        "arithmetic: interval-contains-multiple is a difference of two " +
        "truncating divisions, exact in both engines — where the " +
        "classic exponential-keys weighted sample (hash^(1/w)) needs " +
        "libm pow and could never oracle-check. The prefix sum is one " +
        "running-sum window; at 100 TB it becomes the standard " +
        "two-phase distributed scan (per-partition totals, then offset " +
        "broadcast — q100's prune discipline for cumulative state); " +
        "corpus total and stride ride a 1-row broadcast."
    ) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val base = Tables.documents(s, dir)
        .select(col("doc_id"), col("n_chars").as("w"),
          sha2(col("text"), 256).as("hk"))
      // stride floored at 1: tw < 25 would otherwise divide by zero, which
      // Spark NULLs (silent empty result) while DuckDB raises
      val tot = base.agg(sum("w").as("tw"))
        .withColumn("stride", expr("greatest(tw div 25, 1L)"))
      base
        .withColumn("cum", sum("w").over(Window.orderBy("hk", "doc_id")))
        .crossJoin(broadcast(tot))
        .withColumn("n_hits",
          // + stride on both dividends: quotients shift identically (the
          // difference is invariant) and operands stay non-negative, where
          // truncating div would drop the first stride point
          expr("""(cum - stride div 2 + stride) div stride
                 | - (cum - w - stride div 2 + stride) div stride""".stripMargin
            .replace('\n', ' ')))
        .filter(col("n_hits") > 0)
        .select(col("doc_id"), col("w").cast("long").as("w"),
          col("cum").cast("long").as("cum"), col("n_hits").cast("long").as("n_hits"))
        .orderBy("cum")
    },

    GraftQuery(
      "q107_bpe_train",
      // Deterministic DuckDB REPLAY oracle (the q39/q40 pattern): the merge
      // sequence is a pure function of the corpus — argmax on (count desc,
      // pa, pb) per round, greedy leftmost application between rounds — so
      // the oracle re-derives it with a chained CTE per round. The greedy
      // fold replays EXACTLY via list_reduce over a list-of-singletons
      // (accumulator = BIGINT list), including the pa==pb overlap-chain
      // semantics; BpeSpec stays as the independent sequential cross-check.
      Some(s"""WITH ${bpeTrainCtes(3)}
              |SELECT 1::BIGINT AS round, pa AS sym_a, pb AS sym_b, c AS pair_count FROM m1
              |UNION ALL SELECT 2::BIGINT, pa, pb, c FROM m2
              |UNION ALL SELECT 3::BIGINT, pa, pb, c FROM m3
              |ORDER BY round""".stripMargin),
      "Distributed BPE merge training — the tokenizer-building step of a " +
        "training-data pipeline, not just token counting: words become " +
        "codepoint arrays, each round counts adjacent symbol pairs " +
        "corpus-wide (explode + map-side-combined groupBy — the only " +
        "shuffle, carrying (pair, count) not text), the argmax pair " +
        "(ties broken lexicographically, so the merge sequence is " +
        "deterministic) comes to the driver as ONE aggregated row (the " +
        "q86 pattern: an O(1) action per round is the sanctioned shape " +
        "for iterative trainers), and the merge applies corpus-wide as " +
        "a greedy left-to-right fold INSIDE codegen (higher-order " +
        "aggregate over each word's symbol array — no UDF). Symbol " +
        "arrays localCheckpoint between rounds exactly like q81/q86 " +
        "(at 100 TB: checkpoint). Each round is one scan of the " +
        "CURRENT symbol stream: cost is rounds × corpus, never " +
        "corpus², and the merged-id space (1e6 + round) is disjoint " +
        "from codepoints by construction."
    ) { (s, dir) =>
      bpeMerges(s, dir, rounds = 3)
    },

    GraftQuery(
      "q117_bpe_encode",
      // Same replay machinery as q107: re-learn the 3 merges in CTEs, then
      // apply them IN ORDER to every length>=1 word (train filters >=2,
      // encode does not — the oracle mirrors both populations) and
      // aggregate per doc. All-integer output, truncating // division.
      Some(s"""WITH ${bpeTrainCtes(3)},
              |ewords AS (
              |  SELECT doc_id, w FROM (
              |    SELECT doc_id, unnest(string_split_regex(lower(text), '[^a-z0-9]+')) AS w
              |    FROM documents)
              |  WHERE length(w) >= 1
              |), e0 AS (
              |  SELECT doc_id, CAST(length(w) AS BIGINT) AS n_sym0,
              |         list_transform(generate_series(1, length(w)),
              |                        i -> CAST(ascii(substring(w, i, 1)) AS BIGINT)) AS sym
              |  FROM ewords
              |), e1 AS (SELECT doc_id, n_sym0, ${bpeFoldSql("m1")} AS sym FROM e0 LEFT JOIN m1 ON TRUE),
              |e2 AS (SELECT doc_id, n_sym0, ${bpeFoldSql("m2")} AS sym FROM e1 LEFT JOIN m2 ON TRUE),
              |e3 AS (SELECT doc_id, n_sym0, ${bpeFoldSql("m3")} AS sym FROM e2 LEFT JOIN m3 ON TRUE)
              |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
              |       CAST(sum(n_sym0) AS BIGINT) AS n_sym_chars,
              |       CAST(sum(len(sym)) AS BIGINT) AS n_tokens,
              |       (10000 * CAST(sum(len(sym)) AS BIGINT)) // CAST(sum(n_sym0) AS BIGINT)
              |         AS compression_bp
              |FROM e3 GROUP BY doc_id ORDER BY doc_id""".stripMargin),
      "BPE ENCODE — the apply half of the tokenizer q107 trains, the step " +
        "a pipeline runs over every document before packing (q94) or " +
        "budgeting (q111): the learned merge table (memoized per corpus " +
        "fingerprint, so train and encode share one training run) is " +
        "baked into the plan as a chain of codegen'd greedy-fold stages — " +
        "one per merge, IN LEARNED ORDER, the canonical BPE apply rule — " +
        "so encoding is pure pipelined map work: no shuffle until the " +
        "per-document count aggregation, no UDF, no driver state beyond " +
        "the O(rounds) merge list every executor receives inside the " +
        "plan. Per word, merges that cannot fire skip the fold via the " +
        "array_contains guard. At 100 TB a real 50k-merge vocab chains " +
        "through a trie-driven native Expression instead of 50k stages, " +
        "but the data flow — broadcast-tiny vocab, embarrassingly " +
        "parallel map, one count shuffle — is exactly this. Output: " +
        "per-doc symbol counts before/after, compression in basis points."
    ) { (s, dir) =>
      val merges = learnedMerges(s, dir, rounds = 3)
      var toks = Tables.documents(s, dir)
        .select(col("doc_id"),
          explode(split(lower(col("text")), "[^a-z0-9]+")).as("w"))
        .filter(length(col("w")) >= 1)
        .select(col("doc_id"), length(col("w")).cast("long").as("n_sym0"),
          expr("transform(sequence(1, length(w)), i -> cast(ascii(substring(w, i, 1)) as bigint))")
            .as("sym"))
      merges.zipWithIndex.foreach { case ((_, pa, pb, _), i) =>
        toks = toks.withColumn("sym",
          expr(applyMergeExpr("sym", pa, pb, 1000000L + i)))
      }
      toks
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_words"),
          sum("n_sym0").as("n_sym_chars"),
          sum(size(col("sym")).cast("long")).as("n_tokens"))
        .withColumn("compression_bp",
          expr("(10000 * n_tokens) div n_sym_chars"))
        .orderBy("doc_id")
    },

    GraftQuery(
      "q157_pmi_collocations",
      Some("""WITH t AS (
             |  SELECT string_split(lower(text), ' ') AS w FROM documents
             |), uni AS (
             |  SELECT unnest(w) AS u FROM t
             |), ucnt AS (
             |  SELECT u, CAST(count(*) AS BIGINT) AS c FROM uni GROUP BY u
             |), tot AS (
             |  SELECT CAST(count(*) AS BIGINT) AS n FROM uni
             |), pairs AS (
             |  SELECT w[i] AS x, w[i + 1] AS y
             |  FROM t, unnest(range(1, len(w))) AS r(i)
             |), pcnt AS (
             |  SELECT x, y, CAST(count(*) AS BIGINT) AS n_xy
             |  FROM pairs GROUP BY x, y HAVING count(*) >= 5
             |)
             |SELECT p.x || ' ' || p.y AS bigram, p.n_xy,
             |       cx.c AS n_x, cy.c AS n_y,
             |       CAST((p.n_xy * 1000000 // cx.c) * t.n // cy.c AS BIGINT)
             |         AS lift_ppm
             |FROM pcnt p
             |JOIN ucnt cx ON p.x = cx.u
             |JOIN ucnt cy ON p.y = cy.u, tot t
             |ORDER BY lift_ppm DESC, bigram
             |LIMIT 25""".stripMargin),
      "Collocation mining by association lift — the statistic behind " +
        "multi-word-expression vocab entries and tokenizer merge " +
        "candidates. lift = P(x,y)/(P(x)P(y)) = n_xy*N/(n_x*n_y) is " +
        "monotone with PMI (log of it), so ranking by integer lift_ppm " +
        "gives the PMI order with zero libm in the oracle path. The " +
        "HAVING n_xy >= 5 support floor prunes the pair table BEFORE " +
        "the two unigram joins — at 100 TB that filter drops the " +
        "hapax-pair tail (the vast majority) so the join input is " +
        "~frequent-vocab², and the unigram side (~vocab rows) is " +
        "broadcastable. Truncating div is applied in the same order on " +
        "both engines (trunc-div == DuckDB //), keeping the ranking " +
        "bit-identical; top-25 is TakeOrderedAndProject, no global sort."
    ) { (s, dir) =>
      val t = Tables.documents(s, dir)
        .select(split(lower(col("text")), " ").as("w"))
      val uni = t.select(explode(col("w")).as("u"))
      val ucnt = uni.groupBy("u").agg(count(lit(1)).as("c"))
      val tot = uni.agg(count(lit(1)).as("n"))
      // tokens cannot contain ' ' (space-split), so the shared bigram
      // string splits back into its parts losslessly
      val pairs = t.select(explode(bigramArray(col("w"))).as("g"))
        .select(substring_index(col("g"), " ", 1).as("x"),
          substring_index(col("g"), " ", -1).as("y"))
      pairs.groupBy("x", "y").agg(count(lit(1)).as("n_xy"))
        .filter(col("n_xy") >= 5)
        .join(ucnt.select(col("u").as("x"), col("c").as("n_x")), "x")
        .join(ucnt.select(col("u").as("y"), col("c").as("n_y")), "y")
        .crossJoin(broadcast(tot))
        .select(concat_ws(" ", col("x"), col("y")).as("bigram"),
          col("n_xy"), col("n_x"), col("n_y"),
          expr("(n_xy * 1000000 div n_x) * n div n_y").as("lift_ppm"))
        .orderBy(col("lift_ppm").desc, col("bigram"))
        .limit(25)
    },

    GraftQuery(
      "q158_token_allocation",
      Some("""WITH per AS (
             |  SELECT source,
             |         CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS tokens
             |  FROM documents GROUP BY source
             |), tot AS (
             |  SELECT CAST(sum(tokens) AS BIGINT) AS tt FROM per
             |), q AS (
             |  SELECT source, tokens,
             |         1000000 * tokens // tt AS fl,
             |         (1000000 * tokens) % tt AS rem
             |  FROM per, tot
             |), lo AS (
             |  SELECT CAST(1000000 - sum(fl) AS BIGINT) AS leftover FROM q
             |), r AS (
             |  SELECT *, row_number() OVER (ORDER BY rem DESC, source) AS rk
             |  FROM q
             |)
             |SELECT r.source, r.tokens,
             |       CAST(r.fl AS BIGINT) AS floor_alloc,
             |       CAST(r.rem AS BIGINT) AS remainder,
             |       CAST(r.fl + CASE WHEN r.rk <= lo.leftover THEN 1 ELSE 0 END
             |            AS BIGINT) AS alloc
             |FROM r, lo
             |ORDER BY source""".stripMargin),
      "Token-budget apportionment — divide a 1M-token training budget " +
        "across sources proportionally to their measured token mass using " +
        "the largest-remainder (Hamilton) method, so the allocations are " +
        "integers that sum EXACTLY to the budget (floor the quotas, hand " +
        "the shortfall to the largest remainders, ties by source name). " +
        "This is the 'how many tokens do I draw from each domain' step " +
        "that feeds q136's PPS sampler / q123's mixture. All " +
        "cross-multiplied BIGINT arithmetic — both engines agree to the " +
        "last token. At 100 TB the per-source agg is one map-side-" +
        "combined shuffle of |sources| rows; the apportionment window " +
        "runs on that |sources|-row frame on one task, which is exactly " +
        "where a driver-side decision this small belongs."
    ) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val per = Tables.documents(s, dir)
        .groupBy("source")
        .agg(sum(size(split(col("text"), " ")).cast("long")).as("tokens"))
      val tot = per.agg(sum("tokens").as("tt"))
      val q = per.crossJoin(broadcast(tot))
        .select(col("source"), col("tokens"),
          expr("1000000 * tokens div tt").as("fl"),
          expr("(1000000 * tokens) % tt").as("rem"))
      val lo = q.agg((lit(1000000L) - sum("fl")).as("leftover"))
      q.withColumn("rk",
        row_number().over(Window.orderBy(col("rem").desc, col("source")))
          .cast("long"))
        .crossJoin(broadcast(lo))
        .select(col("source"), col("tokens"),
          col("fl").as("floor_alloc"), col("rem").as("remainder"),
          (col("fl") + when(col("rk") <= col("leftover"), 1L).otherwise(0L))
            .as("alloc"))
        .orderBy("source")
    },

    GraftQuery(
      "q162_distribution_drift",
      Some("""WITH d AS (
             |  -- snapshot A/B = doc_id parity (stand-in for two crawl dates)
             |  SELECT doc_id % 2 AS snap, lang,
             |         CAST(len(string_split(text, ' ')) AS BIGINT) AS tok
             |  FROM documents
             |), per AS (
             |  SELECT snap, lang, CAST(sum(tok) AS BIGINT) AS t
             |  FROM d GROUP BY snap, lang
             |), tot AS (
             |  SELECT snap, CAST(sum(t) AS BIGINT) AS tt FROM per GROUP BY snap
             |), sh AS (
             |  SELECT per.snap, lang, t * 1000000 // tt AS ppm
             |  FROM per JOIN tot ON per.snap = tot.snap
             |), w AS (
             |  SELECT lang,
             |         CAST(sum(CASE WHEN snap = 0 THEN ppm ELSE 0 END) AS BIGINT)
             |           AS ppm_a,
             |         CAST(sum(CASE WHEN snap = 1 THEN ppm ELSE 0 END) AS BIGINT)
             |           AS ppm_b
             |  FROM sh GROUP BY lang
             |)
             |SELECT lang, ppm_a, ppm_b,
             |       CAST(ppm_a - ppm_b AS BIGINT) AS delta_ppm,
             |       CAST((ppm_a - ppm_b) * (ppm_a - ppm_b)
             |              // (ppm_a + ppm_b + 1) AS BIGINT) AS chi2_contrib
             |FROM w ORDER BY lang""".stripMargin),
      "Corpus-composition drift monitor — compare the language mix of two " +
        "snapshots (doc_id parity stands in for crawl dates; any snapshot " +
        "column slots into `snap`) as token shares in exact integer ppm, " +
        "plus a chi-square-style per-language contribution " +
        "(delta²/(a+b+1), the +1 Laplace floor guards div-by-zero for a " +
        "language absent from both) whose sum is the drift alarm a " +
        "mixture re-fit (q148) is triggered by. Everything after the one " +
        "map-side-combined (snap, lang) agg runs on a |snaps|×|langs| " +
        "frame — at 100 TB this query's cost IS the scan, and the " +
        "arithmetic is cross-multiplied BIGINT, bit-identical on both " +
        "engines. The pivot-by-snap uses conditional sums, not a join, " +
        "so adding snapshots never adds shuffles."
    ) { (s, dir) =>
      val per = Tables.documents(s, dir)
        .select((col("doc_id") % 2).as("snap"), col("lang"),
          size(split(col("text"), " ")).cast("long").as("tok"))
        .groupBy("snap", "lang").agg(sum("tok").as("t"))
      val tot = per.groupBy("snap").agg(sum("t").as("tt"))
      per.join(tot, "snap")
        .select(col("snap"), col("lang"),
          expr("t * 1000000 div tt").as("ppm"))
        .groupBy("lang")
        .agg(sum(when(col("snap") === 0, col("ppm")).otherwise(0L)).as("ppm_a"),
          sum(when(col("snap") === 1, col("ppm")).otherwise(0L)).as("ppm_b"))
        .select(col("lang"), col("ppm_a"), col("ppm_b"),
          (col("ppm_a") - col("ppm_b")).as("delta_ppm"),
          expr("(ppm_a - ppm_b) * (ppm_a - ppm_b) div (ppm_a + ppm_b + 1)")
            .as("chi2_contrib"))
        .orderBy("lang")
    },

    GraftQuery(
      "q163_vocab_coverage",
      Some(s"""$rankedVocabSql, th AS (
             |  SELECT * FROM (VALUES (50), (80), (90), (95), (99)) t(pct)
             |)
             |SELECT CAST(th.pct AS BIGINT) AS pct,
             |       CAST(sum(CASE WHEN r.cum * 100 < th.pct * tot.t
             |                     THEN 1 ELSE 0 END) + 1 AS BIGINT)
             |         AS vocab_size,
             |       CAST(min(CASE WHEN r.cum * 100 >= th.pct * tot.t
             |                     THEN r.cum END) AS BIGINT)
             |         AS covered_tokens
             |FROM r, th, tot
             |GROUP BY th.pct
             |ORDER BY pct""".stripMargin),
      "Vocabulary coverage curve — the tokenizer-sizing question 'how " +
        "many types cover X% of tokens': rank types by frequency " +
        "(ties alphabetically), running-sum the counts, and for each " +
        "coverage target report the smallest vocab size reaching it — " +
        "counting ranks strictly below the threshold instead of " +
        "joining back to the crossing row, so one conditional agg " +
        "answers all five targets. The integer compare cum*100 >= " +
        "pct*total never touches a ratio. The frequency table is one " +
        "map-side-combined agg (|vocab| rows, 5–6 orders below corpus " +
        "size); the running sum is a single-task window over that " +
        "frame, which is exactly where a vocab-sized decision belongs " +
        "— at a 1e8-type extreme, swap in the two-pass prefix sum " +
        "(per-range subtotals broadcast as offsets, q104's cut-point " +
        "pattern)."
    ) { (s, dir) =>
      val (r, tot) = rankedVocab(s, dir)
      val th = s.range(0, 5).select(
        element_at(typedlit(Seq(50L, 80L, 90L, 95L, 99L)),
          (col("id") + 1).cast("int")).as("pct"))
      r.crossJoin(broadcast(th)).crossJoin(broadcast(tot))
        .groupBy("pct")
        .agg((sum(when(col("cum") * 100 < col("pct") * col("t"), 1L)
          .otherwise(0L)) + 1).as("vocab_size"),
          min(when(col("cum") * 100 >= col("pct") * col("t"), col("cum")))
            .as("covered_tokens"))
        .orderBy("pct")
    },

    GraftQuery(
      "q164_prefix_cache",
      Some("""WITH d AS (
             |  SELECT doc_id, source, string_split(lower(text), ' ') AS w
             |  FROM documents
             |), p AS (
             |  SELECT doc_id, source,
             |         list_aggregate(w[1:8], 'string_agg', ' ') AS pre,
             |         CAST(len(w) AS BIGINT) AS n
             |  FROM d
             |), r AS (
             |  SELECT *, row_number() OVER (PARTITION BY pre
             |                               ORDER BY doc_id) AS rn
             |  FROM p
             |)
             |SELECT source,
             |       CAST(count(*) AS BIGINT) AS n_docs,
             |       CAST(sum(n) AS BIGINT) AS total_tokens,
             |       CAST(sum(CASE WHEN rn > 1 THEN least(n, 8) ELSE 0 END)
             |            AS BIGINT) AS cacheable_tokens,
             |       CAST(sum(CASE WHEN rn > 1 THEN least(n, 8) ELSE 0 END)
             |              * 1000000 // sum(n) AS BIGINT) AS saving_ppm
             |FROM r GROUP BY source
             |ORDER BY source""".stripMargin),
      "Prefix-cache sharing audit — how much prefill compute a shared " +
        "KV-cache saves on this corpus: documents sharing their first " +
        "8 tokens form a cache line (the group key is the literal " +
        "prefix; swap in q48's fingerprint to move digests instead of " +
        "strings at scale), the group's first document pays the " +
        "prefill, every later one reuses min(n, 8) cached tokens. " +
        "Per-source totals and exact integer-ppm savings fall out of " +
        "one window over the prefix hash partition (per-key, no " +
        "global sort) plus one map-side-combined agg. The same shape " +
        "prices system-prompt dedup in serving logs — at 100 TB the " +
        "only exchange is the prefix-partition shuffle, and AQE's " +
        "skew split handles the one mega-prefix (empty/boilerplate " +
        "lead) this query would otherwise hot-spot on."
    ) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val p = Tables.documents(s, dir)
        .select(col("doc_id"), col("source"),
          split(lower(col("text")), " ").as("w"))
        .select(col("doc_id"), col("source"),
          concat_ws(" ", slice(col("w"), 1, 8)).as("pre"),
          size(col("w")).cast("long").as("n"))
      p.withColumn("rn",
        row_number().over(Window.partitionBy("pre").orderBy("doc_id")))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum("n").as("total_tokens"),
          sum(when(col("rn") > 1, least(col("n"), lit(8L))).otherwise(0L))
            .as("cacheable_tokens"))
        .select(col("source"), col("n_docs"), col("total_tokens"),
          col("cacheable_tokens"),
          expr("cacheable_tokens * 1000000 div total_tokens")
            .as("saving_ppm"))
        .orderBy("source")
    },

    GraftQuery(
      "q165_curriculum_order",
      Some("""WITH d AS (
             |  SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents
             |), b AS (
             |  SELECT doc_id, CAST(len(w) AS BIGINT) AS n,
             |         CAST(len(list_distinct(list_transform(
             |                range(1, len(w)), i -> w[i] || ' ' || w[i + 1])))
             |              AS BIGINT) AS db
             |  FROM d
             |), sc AS (
             |  SELECT doc_id, n,
             |         db * 1000000 // greatest(n - 1, 1) AS difficulty_ppm
             |  FROM b
             |), t AS (
             |  SELECT *, ntile(4) OVER (ORDER BY difficulty_ppm, doc_id) AS stage
             |  FROM sc
             |)
             |SELECT CAST(stage AS BIGINT) AS stage,
             |       CAST(count(*) AS BIGINT) AS n_docs,
             |       CAST(sum(n) AS BIGINT) AS tokens,
             |       CAST(min(difficulty_ppm) AS BIGINT) AS min_difficulty_ppm,
             |       CAST(max(difficulty_ppm) AS BIGINT) AS max_difficulty_ppm
             |FROM t GROUP BY stage
             |ORDER BY stage""".stripMargin),
      "Curriculum staging — order training data easy-to-hard and cut it " +
        "into four stages: difficulty is the distinct-bigram ratio " +
        "(lexical diversity) in exact integer ppm, a row-local score " +
        "(no corpus joins — deliberately, so the score scales as pure " +
        "map work), and ntile(4) over (difficulty, doc_id) assigns " +
        "stages deterministically — both engines define ntile by " +
        "equal buckets with the remainder on early buckets over the " +
        "same total order. The global ntile is the one single-task " +
        "step; at 100 TB replace it with broadcast approx-quantile " +
        "cut points (q104's histogram pattern) and a map-side CASE — " +
        "the audit agg and the score don't change. Per-stage token " +
        "mass is what the training scheduler actually consumes."
    ) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val b = Tables.documents(s, dir)
        .select(col("doc_id"), split(lower(col("text")), " ").as("w"))
        .select(col("doc_id"), size(col("w")).cast("long").as("n"),
          size(array_distinct(bigramArray(col("w")))).cast("long").as("db"))
      b.select(col("doc_id"), col("n"),
        expr("db * 1000000 div greatest(n - 1, 1L)").as("difficulty_ppm"))
        .withColumn("stage",
          ntile(4).over(Window.orderBy("difficulty_ppm", "doc_id"))
            .cast("long"))
        .groupBy("stage")
        .agg(count(lit(1)).as("n_docs"), sum("n").as("tokens"),
          min("difficulty_ppm").as("min_difficulty_ppm"),
          max("difficulty_ppm").as("max_difficulty_ppm"))
        .orderBy("stage")
    },

    GraftQuery(
      "q168_shard_balance",
      Some(s"""WITH f AS (
             |  SELECT ${base31FoldSql("substr(lower(text), 1, 64)")} % 64 AS shard
             |  FROM documents
             |), per AS (
             |  SELECT shard, CAST(count(*) AS BIGINT) AS n FROM f GROUP BY shard
             |)
             |SELECT CAST(count(*) AS BIGINT) AS n_shards,
             |       CAST(sum(n) AS BIGINT) AS n_docs,
             |       CAST(min(n) AS BIGINT) AS min_docs,
             |       CAST(max(n) AS BIGINT) AS max_docs,
             |       CAST(max(n) * count(*) * 1000000 // sum(n) AS BIGINT)
             |         AS skew_ppm
             |FROM per""".stripMargin),
      "Shard-balance audit — will q48's fingerprint-routed 64-way layout " +
        "straggle? Per-shard counts from one map-side-combined agg over " +
        "the content fingerprint (the q48/q155/q156 base-31 fold), then " +
        "a 64-row reduction to the skew factor max/avg in exact ppm — " +
        "1e6 = perfectly balanced; the number a partitioner review " +
        "reads before committing a bucketing scheme. The same two-level " +
        "agg shape audits any key: swap the fold for xxhash64(join_key) " +
        "and this is the pre-shuffle skew probe that decides salting " +
        "(q59) vs AQE. Single-row output, no sort anywhere; at 100 TB " +
        "the fingerprint rides the scan and the exchange carries 64 " +
        "rows per partition."
    ) { (s, dir) =>
      val per = Tables.documents(s, dir)
        .select(pmod(base31Fold(substring(lower(col("text")), 1, 64)), lit(64L))
          .as("shard"))
        .groupBy("shard").agg(count(lit(1)).as("n"))
      per.agg(count(lit(1)).as("n_shards"), sum("n").as("n_docs"),
        min("n").as("min_docs"), max("n").as("max_docs"))
        .select(col("n_shards"), col("n_docs"), col("min_docs"),
          col("max_docs"),
          expr("max_docs * n_shards * 1000000 div n_docs").as("skew_ppm"))
    },

    GraftQuery(
      "q170_weighted_resample",
      Some(s"""WITH per AS (
             |  SELECT lang,
             |         CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS tokens
             |  FROM documents GROUP BY lang
             |), tot AS (
             |  SELECT sum(tokens) AS tt, count(*) AS n_langs FROM per
             |), w AS (
             |  -- q148's capped target/actual weight, verbatim
             |  SELECT lang, CAST($cappedWeightSql AS BIGINT) AS weight_ppm
             |  FROM per, tot
             |), d AS (
             |  -- Lehmer hash of doc_id: deterministic uniform-ish draw in
             |  -- [0, 1e6) with no 64-bit wraparound (the q66 lesson: DuckDB
             |  -- raises on BIGINT overflow instead of wrapping)
             |  SELECT doc_id, lang,
             |         CAST(len(string_split(text, ' ')) AS BIGINT) AS tok,
             |         (doc_id * 48271) % 2147483647 % 1000000 AS u
             |  FROM documents
             |), k AS (
             |  SELECT d.lang, d.tok, w.weight_ppm,
             |         CASE WHEN d.u < least(w.weight_ppm, 1000000)
             |              THEN 1 ELSE 0 END AS keep
             |  FROM d JOIN w ON d.lang = w.lang
             |)
             |SELECT lang,
             |       CAST(max(weight_ppm) AS BIGINT) AS weight_ppm,
             |       CAST(count(*) AS BIGINT) AS n_docs,
             |       CAST(sum(keep) AS BIGINT) AS n_kept,
             |       CAST(sum(CASE WHEN keep = 1 THEN tok ELSE 0 END) AS BIGINT)
             |         AS kept_tokens
             |FROM k GROUP BY lang
             |ORDER BY lang""".stripMargin),
      "Weighted resampling — APPLY q148's domain weights instead of just " +
        "reporting them: each document draws a deterministic Lehmer-hash " +
        "uniform from its id (reproducible across runs, engines and " +
        "partitionings — no RNG state, no 64-bit wraparound) and " +
        "survives when the draw lands under its language's capped " +
        "sampling probability. The weight table is a |langs|-row " +
        "broadcast join; the draw and keep-test are map work fused into " +
        "the scan, so the 100 TB cost is the scan itself — this is the " +
        "missing half of every mixture pipeline: q148/q158 decide the " +
        "mix, this operator materializes it, and the per-lang audit " +
        "(kept docs and token mass) is the evidence the mix landed. " +
        "Upsampling (weight > 1e6) falls out of the same draw by " +
        "emitting floor(w) copies plus one Bernoulli residual " +
        "(q151's repeat pattern)."
    ) { (s, dir) =>
      val docs = Tables.documents(s, dir)
      val per = docs.groupBy("lang")
        .agg(sum(size(split(col("text"), " ")).cast("long")).as("tokens"))
      val tot = per.agg(sum("tokens").as("tt"), count(lit(1)).as("n_langs"))
      val w = per.crossJoin(broadcast(tot))
        .select(col("lang"), cappedWeight.as("weight_ppm"))
      docs
        .select(col("doc_id"), col("lang"),
          size(split(col("text"), " ")).cast("long").as("tok"),
          expr("(doc_id * 48271) % 2147483647 % 1000000").as("u"))
        .join(broadcast(w), "lang")
        .withColumn("keep",
          when(col("u") < least(col("weight_ppm"), lit(1000000L)), 1L)
            .otherwise(0L))
        .groupBy("lang")
        .agg(max("weight_ppm").as("weight_ppm"),
          count(lit(1)).as("n_docs"), sum("keep").as("n_kept"),
          sum(when(col("keep") === 1, col("tok")).otherwise(0L))
            .as("kept_tokens"))
        .orderBy("lang")
    },

    GraftQuery(
      "q171_failure_reasons",
      Some("""WITH t AS (
             |  SELECT doc_id, text, string_split(lower(text), ' ') AS w
             |  FROM documents
             |), m AS (
             |  SELECT CAST(len(w) AS BIGINT) AS n_tokens,
             |         CAST(len(list_filter(w, x -> list_contains(
             |           ['the','a','and','of','el','la','de','y','der','die',
             |            'das','und','le','et','les'], x))) AS BIGINT) AS n_stop,
             |         CAST(len(regexp_extract_all(text, '[^a-z0-9 ]'))
             |              AS BIGINT) AS n_punct,
             |         CAST(len(text) AS BIGINT) AS n_chars
             |  FROM t
             |), f AS (
             |  SELECT CASE WHEN n_tokens < 10 THEN 1 ELSE 0 END
             |       + CASE WHEN n_stop * 10 < n_tokens THEN 2 ELSE 0 END
             |       + CASE WHEN n_punct * 5 > n_chars THEN 4 ELSE 0 END
             |         AS reason_mask
             |  FROM m
             |), tot AS (
             |  SELECT CAST(count(*) AS BIGINT) AS t FROM f
             |)
             |SELECT CAST(reason_mask AS BIGINT) AS reason_mask,
             |       CAST(count(*) AS BIGINT) AS n_docs,
             |       CAST(count(*) * 1000000 // t AS BIGINT) AS share_ppm
             |FROM f, tot GROUP BY reason_mask, t
             |ORDER BY reason_mask""".stripMargin),
      "Gate-failure attribution — q69 runs the cleaning gates and keeps " +
        "the survivors; this operator answers the operator's follow-up " +
        "question, WHY documents die: each gate failure sets a bit " +
        "(1=too-short, 2=low-stopword, 4=punct-heavy), and the histogram " +
        "over reason bitmasks shows every failure COMBINATION (mask 0 = " +
        "clean, mask 6 = died twice over) with its corpus share in exact " +
        "ppm. Reason codes compose with no row explosion — 3 gates or 30, " +
        "it's one integer per doc, one map-side-combined agg, and a " +
        "2^gates-row result. The same gate arithmetic as q69 " +
        "(cross-multiplied longs), so the attribution provably matches " +
        "what the pipeline actually dropped. At 100 TB: cost is the scan."
    ) { (s, dir) =>
      val allMarkers = enM ++ esM ++ deM ++ frM
      val w = split(lower(col("text")), " ")
      val m = Tables.documents(s, dir).select(
        size(w).cast("long").as("n_tokens"),
        markerCount(w, allMarkers).as("n_stop"),
        size(regexp_extract_all(col("text"), lit("[^a-z0-9 ]"), lit(0)))
          .cast("long").as("n_punct"),
        length(col("text")).cast("long").as("n_chars"))
      val f = m.select(
        (when(col("n_tokens") < 10, 1L).otherwise(0L)
          + when(col("n_stop") * 10 < col("n_tokens"), 2L).otherwise(0L)
          + when(col("n_punct") * 5 > col("n_chars"), 4L).otherwise(0L))
          .as("reason_mask"))
      val tot = f.agg(count(lit(1)).as("t"))
      f.groupBy("reason_mask").agg(count(lit(1)).as("n_docs"))
        .crossJoin(broadcast(tot))
        .select(col("reason_mask"), col("n_docs"),
          expr("n_docs * 1000000 div t").as("share_ppm"))
        .orderBy("reason_mask")
    },

    GraftQuery(
      "q174_vocab_prune_impact",
      Some(s"""$rankedVocabSql, cuts AS (
             |  SELECT * FROM (VALUES (8), (16), (24), (32)) t(cut)
             |)
             |SELECT CAST(cuts.cut AS BIGINT) AS cut_size,
             |       CAST(sum(CASE WHEN r.rn <= cuts.cut THEN 1 ELSE 0 END)
             |            AS BIGINT) AS vocab_kept,
             |       CAST(tot.t - coalesce(max(CASE WHEN r.rn <= cuts.cut
             |                                      THEN r.cum END), 0)
             |            AS BIGINT) AS oov_tokens,
             |       CAST((tot.t - coalesce(max(CASE WHEN r.rn <= cuts.cut
             |                                       THEN r.cum END), 0))
             |              * 1000000 // tot.t AS BIGINT) AS oov_ppm
             |FROM r, cuts, tot
             |GROUP BY cuts.cut, tot.t
             |ORDER BY cut_size""".stripMargin),
      "Vocabulary pruning impact — q163 asks 'how many types for X% " +
        "coverage'; this is the decision table for the inverse question: " +
        "for each candidate vocab CUT, how many tokens fall out-of-" +
        "vocabulary (the mass that becomes <unk> or byte-fallback). Same " +
        "frequency-ranked running sum as q163, evaluated at every cut by " +
        "one conditional agg over the vocab×cuts broadcast product — the " +
        "OOV mass at cut k is total − cumulative(k), so the whole sweep " +
        "costs one |vocab|-frame pass regardless of how many cuts are " +
        "probed. Exact integer ppm; the corpus is scanned once for the " +
        "counts and never again."
    ) { (s, dir) =>
      val (r, tot) = rankedVocab(s, dir)
      val cuts = s.range(0, 4).select(
        element_at(typedlit(Seq(8L, 16L, 24L, 32L)),
          (col("id") + 1).cast("int")).as("cut"))
      r.crossJoin(broadcast(cuts)).crossJoin(broadcast(tot))
        .groupBy(col("cut").as("cut_size"), col("t"))
        .agg(
          sum(when(col("rn") <= col("cut"), 1L).otherwise(0L))
            .as("vocab_kept"),
          coalesce(max(when(col("rn") <= col("cut"), col("cum"))), lit(0L))
            .as("covered"))
        .select(col("cut_size"), col("vocab_kept"),
          (col("t") - col("covered")).as("oov_tokens"),
          expr("(t - covered) * 1000000 div t").as("oov_ppm"))
        .orderBy("cut_size")
    },

    GraftQuery(
      "q178_k_anonymity",
      Some("""WITH q AS (
             |  SELECT lang, source,
             |         CAST(len(string_split(text, ' ')) // 32 AS BIGINT)
             |           AS len_bucket
             |  FROM documents
             |), g AS (
             |  SELECT lang, source, len_bucket,
             |         CAST(count(*) AS BIGINT) AS n
             |  FROM q GROUP BY lang, source, len_bucket
             |), tot AS (
             |  SELECT CAST(sum(n) AS BIGINT) AS t FROM g
             |), ks AS (
             |  SELECT * FROM (VALUES (2), (5), (10)) t(k)
             |)
             |SELECT CAST(ks.k AS BIGINT) AS k,
             |       CAST(sum(CASE WHEN g.n < ks.k THEN 1 ELSE 0 END)
             |            AS BIGINT) AS small_groups,
             |       CAST(sum(CASE WHEN g.n < ks.k THEN g.n ELSE 0 END)
             |            AS BIGINT) AS docs_at_risk,
             |       CAST(sum(CASE WHEN g.n < ks.k THEN g.n ELSE 0 END)
             |              * 1000000 // tot.t AS BIGINT) AS risk_ppm
             |FROM g, ks, tot
             |GROUP BY ks.k, tot.t
             |ORDER BY k""".stripMargin),
      "k-anonymity audit — the release-governance gate for metadata: " +
        "group documents by their quasi-identifier tuple (lang, source, " +
        "length bucket) and count how many land in equivalence classes " +
        "smaller than k — those rows are re-identifiable from metadata " +
        "alone, the thing a dataset card (q152) must disclose and a " +
        "release either suppresses or generalizes. One map-side-combined " +
        "agg to |classes| rows, then the k-sweep reuses q153's pattern " +
        "(3-row broadcast, one conditional agg answers every k). All " +
        "integer; at 100 TB the cost is the scan — and the same " +
        "two-level shape generalizes the bucket (coarser quasi-ids) " +
        "until risk_ppm clears policy."
    ) { (s, dir) =>
      val g = Tables.documents(s, dir)
        .select(col("lang"), col("source"),
          expr("size(split(text, ' ')) div 32").cast("long").as("len_bucket"))
        .groupBy("lang", "source", "len_bucket")
        .agg(count(lit(1)).as("n"))
      val tot = g.agg(sum("n").as("t"))
      val ks = s.range(0, 3).select(
        element_at(typedlit(Seq(2L, 5L, 10L)), (col("id") + 1).cast("int"))
          .as("k"))
      g.crossJoin(broadcast(ks)).crossJoin(broadcast(tot))
        .groupBy(col("k"), col("t"))
        .agg(sum(when(col("n") < col("k"), 1L).otherwise(0L))
          .as("small_groups"),
          sum(when(col("n") < col("k"), col("n")).otherwise(0L))
            .as("docs_at_risk"))
        .select(col("k"), col("small_groups"), col("docs_at_risk"),
          expr("docs_at_risk * 1000000 div t").as("risk_ppm"))
        .orderBy("k")
    },

    GraftQuery(
      "q181_langid_margin",
      Some("""WITH t AS (
             |  SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents
             |), scored AS (
             |  SELECT doc_id,
             |    CAST(len(list_filter(w, x -> list_contains(['the','a','and','of'], x))) AS BIGINT) n_en,
             |    CAST(len(list_filter(w, x -> list_contains(['el','la','de','y'], x))) AS BIGINT)   n_es,
             |    CAST(len(list_filter(w, x -> list_contains(['der','die','das','und'], x))) AS BIGINT) n_de,
             |    CAST(len(list_filter(w, x -> list_contains(['le','la','et','les'], x))) AS BIGINT) n_fr
             |  FROM t
             |), m AS (
             |  SELECT doc_id, n_en, n_es, n_de, n_fr,
             |    greatest(n_en, n_es, n_de, n_fr) AS top1,
             |    -- 2nd-largest of four = greatest of all pairwise leasts
             |    greatest(least(n_en, n_es), least(n_en, n_de),
             |             least(n_en, n_fr), least(n_es, n_de),
             |             least(n_es, n_fr), least(n_de, n_fr)) AS top2,
             |    CASE WHEN n_en >= n_es AND n_en >= n_de AND n_en >= n_fr AND n_en > 0 THEN 'en'
             |         WHEN n_es >= n_de AND n_es >= n_fr AND n_es > 0 THEN 'es'
             |         WHEN n_de >= n_fr AND n_de > 0 THEN 'de'
             |         WHEN n_fr > 0 THEN 'fr'
             |         ELSE 'und' END AS pred_lang
             |  FROM scored
             |)
             |SELECT pred_lang,
             |       CAST(count(*) AS BIGINT) AS n_docs,
             |       CAST(sum(CASE WHEN top1 = 0 OR (top1 - top2) * 5 < top1
             |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_ambiguous,
             |       CAST(sum(top1 - top2) AS BIGINT) AS margin_sum
             |FROM m GROUP BY pred_lang
             |ORDER BY pred_lang""".stripMargin),
      "Language-ID confidence gating — q45 assigns the argmax; production " +
        "also needs to know WHEN NOT TO TRUST IT: the margin between the " +
        "best and second-best marker scores (2nd-largest of four computed " +
        "branch-free as the greatest of pairwise leasts — a codegen-" +
        "friendly identity, no sort, no explode), with a doc flagged " +
        "ambiguous when the margin is under 20% of the top score (or " +
        "nothing matched at all). Ambiguous docs are what you route to " +
        "the expensive model or drop (q69's gates consume exactly this " +
        "flag). Pure row-local integer arithmetic fused into the scan, " +
        "then a |langs|-row agg — at 100 TB this costs nothing beyond " +
        "the q45 pass it extends."
    ) { (s, dir) =>
      val w = split(lower(col("text")), " ")
      val scored = Tables.documents(s, dir).select(
        col("doc_id"),
        markerCount(w, enM).as("n_en"), markerCount(w, esM).as("n_es"),
        markerCount(w, deM).as("n_de"), markerCount(w, frM).as("n_fr"))
      val m = scored
        .withColumn("top1",
          greatest(col("n_en"), col("n_es"), col("n_de"), col("n_fr")))
        .withColumn("top2", greatest(
          least(col("n_en"), col("n_es")), least(col("n_en"), col("n_de")),
          least(col("n_en"), col("n_fr")), least(col("n_es"), col("n_de")),
          least(col("n_es"), col("n_fr")), least(col("n_de"), col("n_fr"))))
        .withColumn("pred_lang",
          when(col("n_en") >= col("n_es") && col("n_en") >= col("n_de") &&
            col("n_en") >= col("n_fr") && col("n_en") > 0, "en")
            .when(col("n_es") >= col("n_de") && col("n_es") >= col("n_fr") &&
              col("n_es") > 0, "es")
            .when(col("n_de") >= col("n_fr") && col("n_de") > 0, "de")
            .when(col("n_fr") > 0, "fr")
            .otherwise("und"))
      m.groupBy("pred_lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("top1") === 0 ||
            (col("top1") - col("top2")) * 5 < col("top1"), 1L).otherwise(0L))
            .as("n_ambiguous"),
          sum(col("top1") - col("top2")).as("margin_sum"))
        .orderBy("pred_lang")
    },

    GraftQuery(
      "q182_source_signatures",
      Some("""WITH t AS (
             |  SELECT source, string_split(lower(text), ' ') AS w FROM documents
             |), grams AS (
             |  SELECT source, w[i] || ' ' || w[i + 1] AS g
             |  FROM t, unnest(range(1, len(w))) AS r(i)
             |), per AS (
             |  SELECT source, g, CAST(count(*) AS BIGINT) AS n
             |  FROM grams GROUP BY source, g
             |), tot AS (
             |  SELECT source, CAST(sum(n) AS BIGINT) AS t FROM per GROUP BY source
             |), top AS (
             |  SELECT source, g, n,
             |         row_number() OVER (PARTITION BY source
             |                            ORDER BY n DESC, g) AS rk
             |  FROM per
             |)
             |SELECT top.source, top.g AS signature_bigram, top.n,
             |       CAST(top.n * 1000000 // tot.t AS BIGINT) AS share_ppm
             |FROM top JOIN tot ON top.source = tot.source
             |WHERE top.rk = 1
             |ORDER BY top.source""".stripMargin),
      "Source signature detection — each source's single most frequent " +
        "bigram and its share of the source's bigram mass: a share far " +
        "above the corpus norm means injected boilerplate (nav text, " +
        "cookie banners, template headers) that q155's chunking or a " +
        "targeted strip rule should remove before training. Per-source " +
        "top-1 is a window over the (source, bigram) counts — partition-" +
        "local, never global — and the share denominator joins back from " +
        "a |sources|-row agg. At 100 TB the bigram count combines " +
        "map-side and the signature table is |sources| rows — the " +
        "input a boilerplate-strip rule engine actually takes."
    ) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val grams = Tables.documents(s, dir)
        .select(col("source"), split(lower(col("text")), " ").as("w"))
        .select(col("source"), explode(bigramArray(col("w"))).as("g"))
      val per = grams.groupBy("source", "g").agg(count(lit(1)).as("n"))
      val tot = per.groupBy("source").agg(sum("n").as("t"))
      per.withColumn("rk", row_number().over(
        Window.partitionBy("source").orderBy(col("n").desc, col("g"))))
        .filter(col("rk") === 1)
        .join(broadcast(tot), "source")
        .select(col("source"), col("g").as("signature_bigram"), col("n"),
          expr("n * 1000000 div t").as("share_ppm"))
        .orderBy("source")
    },

    GraftQuery(
      "q215_countmin_estimate",
      Some {
        val fp = base31FoldSql("token")
        val rows = Seq((0, 40503L, 12289L), (1, 48271L, 25601L),
          (2, 16807L, 7919L), (3, 69621L, 104729L))
        val probesSql = rows.map { case (i, a, b) =>
          s"SELECT token, n, $i AS row_i," +
            s" (($fp * $a + $b) % 1000003) % 256 AS bucket FROM exact"
        }.mkString("\n  UNION ALL ")
        s"""WITH toks AS (
           |  SELECT unnest(string_split(lower(text), ' ')) AS token
           |  FROM documents
           |), exact AS (
           |  SELECT token, CAST(count(*) AS BIGINT) AS n
           |  FROM toks GROUP BY token
           |), probes AS (
           |  $probesSql
           |), sketch AS (
           |  SELECT row_i, bucket, CAST(sum(n) AS BIGINT) AS c
           |  FROM probes GROUP BY row_i, bucket
           |)
           |SELECT p.token, max(p.n) AS exact_n,
           |       CAST(min(s.c) AS BIGINT) AS cms_est,
           |       CAST(min(s.c) - max(p.n) AS BIGINT) AS overestimate
           |FROM probes p JOIN sketch s
           |  ON p.row_i = s.row_i AND p.bucket = s.bucket
           |GROUP BY p.token
           |ORDER BY exact_n DESC, token
           |LIMIT 15""".stripMargin
      },
      "Count-Min sketch, fully declarative and exactly replayable: " +
        "4 hash rows × 256 buckets, hashes are affine maps of the " +
        "shared base-31 fingerprint (the fold every fingerprint oracle " +
        "uses, so both engines bucket identically), and the sketch is " +
        "built COMBINE-BEFORE-HASH: occurrences first collapse to " +
        "(token, count) — the map-side-combined agg the count needs " +
        "anyway — and only the |vocab| distinct tokens are folded and " +
        "fanned out, their counts summed per cell; a point query is " +
        "min over a token's 4 cells. The output pairs every estimate " +
        "with its exact count — CMS's one-sided guarantee (est ≥ " +
        "exact, overestimate ≥ 0) is visible per row, which is the " +
        "whole point of shipping the sketch next to its ground truth " +
        "on test data. At 100 TB the sketch IS the wide state: 1024 " +
        "mergeable longs regardless of corpus size, the q85/q92 " +
        "mergeable-partial discipline with an even smaller footprint."
    ) { (s, dir) =>
      val params = TextQueries.cmsParams
      // the fold runs ONCE per occurrence; the 4 bucket maps are affine in fp
      def buckets(fpCol: Column) = explode(array(params.map { case (i, a, b) =>
        struct(lit(i).as("row_i"),
          pmod(pmod(fpCol * lit(a) + lit(b), lit(1000003L)), lit(256L)).as("bucket"))
      }: _*))
      val toks = Tables.documents(s, dir)
        .select(explode(split(lower(col("text")), " ")).as("token"))
      val exact = toks.groupBy("token").agg(count(lit(1)).as("n"))
      // combine-before-hash: fold and fan out the |vocab| distinct tokens,
      // never the occurrence stream — the sketch cells are WEIGHTED sums
      val probes = exact.withColumn("fp", base31Fold(col("token")))
        .select(col("token"), col("n"), buckets(col("fp")).as("t"))
        .select(col("token"), col("n"),
          col("t.row_i").as("row_i"), col("t.bucket").as("bucket"))
      val sketch = probes.groupBy("row_i", "bucket").agg(sum("n").as("c"))
      probes.join(broadcast(sketch), Seq("row_i", "bucket"))
        .groupBy("token")
        .agg(max("n").as("exact_n"), min("c").as("cms_est"),
          (min("c") - max("n")).as("overestimate"))
        .orderBy(col("exact_n").desc, col("token"))
        .limit(15)
    },

    GraftQuery(
      "q269_markup_extract",
      Some(s"""WITH h AS (
              |  SELECT doc_id, text,
              |         concat('$HtmlPre', source, '$HtmlMid', text,
              |                '$HtmlTail1', source, '$HtmlTail2') AS html
              |  FROM documents
              |), c AS (
              |  SELECT doc_id, text, html,
              |         regexp_replace(
              |           regexp_replace(html, '(?s)<!--.*?-->', ' ', 'g'),
              |           '(?s)<!\\[CDATA\\[.*?\\]\\]>', ' ', 'g') AS cleaned
              |  FROM h
              |), x AS (
              |  SELECT doc_id, text, html,
              |         trim(regexp_replace(
              |           regexp_replace(
              |             regexp_replace(
              |               regexp_replace(
              |                 coalesce(array_to_string(
              |                   regexp_extract_all(cleaned,
              |                     '(?s)<article[^>]*>(.*?)</article>', 1),
              |                   ' '), ''),
              |                 '(?s)<script[^>]*>.*?</script>', ' ', 'g'),
              |               '(?s)<style[^>]*>.*?</style>', ' ', 'g'),
              |             '<[^>]*>', ' ', 'g'),
              |           '[ \\t\\n\\r\\f]+', ' ', 'g')) AS extracted
              |  FROM c
              |)
              |SELECT doc_id,
              |       CAST(len(html) AS BIGINT) AS n_html_chars,
              |       CAST(len(extracted) AS BIGINT) AS n_extracted_chars,
              |       CAST(len(extracted) * 1000000 // len(html) AS BIGINT)
              |         AS content_ratio_ppm,
              |       extracted = text AS intact
              |FROM x ORDER BY doc_id""".stripMargin),
      "Markup boilerplate extraction — the readability-style main-content " +
        "pass every scraped corpus runs before any quality gate: documents " +
        "ride inside a deterministic HTML envelope (head/title, script and " +
        "style elements, nav and footer chrome, the body text inside an " +
        "article element — including an INLINE script the extractor must " +
        "drop with its content, not just its tags), and extraction is " +
        "segment-then-strip: take the article region, remove script " +
        "elements wholesale, strip remaining tags, collapse runs of " +
        "spaces. `intact` pins the round trip — the extracted content " +
        "equals the original text exactly, so chrome removal provably " +
        "lost nothing — and content_ratio_ppm is the text-to-markup " +
        "density signal extraction pipelines gate on (chrome-heavy pages " +
        "score low). Hardened to scraped-corpus reality: comments and " +
        "CDATA drop wholesale before segmentation (a commented-out close " +
        "tag cannot terminate the block), attribute-bearing and repeated " +
        "article tags all contribute (non-greedy regexp_extract_all, " +
        "joined), (?s) spans multiline blocks, and script/style drop " +
        "with content even when it contains '<'. Every regex sticks to " +
        "dialect-portable constructs — (?s) and non-greedy are RE2-and-" +
        "Java-common, whitespace collapses through an explicit class " +
        "(Java and RE2 disagree on \\\\s at \\\\x0B), and NO " +
        "backreferences (RE2 lacks them: separate script and style " +
        "passes) — so both engines agree byte-for-byte. At 100 TB this is one " +
        "codegen'd scan pass — regexp_replace/extract are " +
        "whole-stage-codegen expressions, no UDF boundary — and the " +
        "envelope synthesis column swaps for the real crawl payload " +
        "column with the extraction chain unchanged."
    ) { (s, dir) =>
      val html = concat(lit(HtmlPre), col("source"), lit(HtmlMid), col("text"),
        lit(HtmlTail1), col("source"), lit(HtmlTail2))
      val extracted = extractMarkup(html)
      Tables.documents(s, dir)
        .select(col("doc_id"),
          length(html).cast("long").as("n_html_chars"),
          length(extracted).cast("long").as("n_extracted_chars"),
          (extracted === col("text")).as("intact"))
        .withColumn("content_ratio_ppm",
          expr("n_extracted_chars * 1000000 div n_html_chars"))
        .select(col("doc_id"), col("n_html_chars"), col("n_extracted_chars"),
          col("content_ratio_ppm"), col("intact"))
        .orderBy("doc_id")
    }
  )

  /** Run `rounds` BPE merge rounds over the lowercase-ASCII words of
    * `documents.text`; returns the learned merge table
    * (round, sym_a, sym_b, pair_count). Greedy leftmost application, ties
    * on count broken by (sym_a, sym_b) — the reference semantics BpeSpec
    * mirrors with a sequential implementation. */
  private[graft] def bpeMerges(s: SparkSession, dir: String, rounds: Int) = {
    import s.implicits._
    learnedMerges(s, dir, rounds).toDF("round", "sym_a", "sym_b", "pair_count")
      .orderBy("round")
  }

  /** q128's nested build, pre-serialization: one row per document with the
    * ordered array<struct<chunk_idx,n_tokens>> chunk manifest. Exposed so
    * `NestedManifestSpec` can pin the parquet repeated-group round-trip of
    * the nested column itself, while the catalog query serializes it to a
    * driver-sortable canonical string. */
  private[graft] def nestedManifest(s: SparkSession, dir: String) = {
    val toks = Tables.documents(s, dir)
      .select(col("doc_id"), col("lang"), split(col("text"), " ").as("w"))
    toks
      .select(col("doc_id"), col("lang"), size(col("w")).as("n"),
        explode(sequence(lit(0),
          ceil(size(col("w")) / 16.0).cast("int") - 1)).as("chunk_idx"))
      .select(col("doc_id"), col("lang"),
        col("chunk_idx").cast("long").as("chunk_idx"),
        least(lit(16), col("n") - col("chunk_idx") * 16).cast("long").as("n_tokens"))
      .groupBy("doc_id", "lang")
      .agg(count(lit(1)).as("n_chunks"),
        sort_array(collect_list(struct(col("chunk_idx"), col("n_tokens"))))
          .as("chunks"))
  }

  /** The learned merge table, memoized per (corpus files, rounds) so q107
    * (train) and q117 (encode) share one training run per bench/verify
    * process; the file fingerprint in the key invalidates on rewrite (the
    * q67 cache lesson: never key a corpus-derived artifact by path alone). */
  private val mergeCache =
    scala.collection.concurrent.TrieMap.empty[String, Seq[(Long, Long, Long, Long)]]

  private[graft] def learnedMerges(
      s: SparkSession, dir: String, rounds: Int): Seq[(Long, Long, Long, Long)] = {
    val key = Tables.fingerprint(s, s"$dir/documents.parquet") + s"#$rounds"
    mergeCache.getOrElseUpdate(key, trainMerges(s, dir, rounds))
  }

  private def trainMerges(
      s: SparkSession, dir: String, rounds: Int): Seq[(Long, Long, Long, Long)] = {
    var syms = Tables.documents(s, dir)
      .select(explode(split(lower(col("text")), "[^a-z0-9]+")).as("w"))
      .filter(length(col("w")) >= 2)
      .select(expr(
        "transform(sequence(1, length(w)), i -> cast(ascii(substring(w, i, 1)) as bigint))")
        .as("sym"))
      .localCheckpoint(true)
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Long)]
    var r = 0
    var exhausted = false
    while (r < rounds && !exhausted) {
      val topOpt = syms.filter(size(col("sym")) >= 2)
        .select(explode(expr(
          "transform(sequence(1, size(sym) - 1), " +
            "i -> struct(element_at(sym, i) AS pa, element_at(sym, i + 1) AS pb))"))
          .as("p"))
        .groupBy(col("p.pa").as("pa"), col("p.pb").as("pb"))
        .agg(count(lit(1)).as("c"))
        .orderBy(col("c").desc, col("pa"), col("pb"))
        .limit(1).collect().headOption
      topOpt match {
        case None =>
          // degenerate corpus or rounds > available merges: every word is
          // down to one symbol — stop with the rounds learned so far
          exhausted = true
        case Some(top) =>
          val (pa, pb, c) = (top.getLong(0), top.getLong(1), top.getLong(2))
          val m = 1000000L + r
          merges += ((r.toLong + 1L, pa, pb, c))
          // words that cannot contain the pair pass through untouched — the
          // quadratic-ish fold (concat per element) only runs where a merge
          // can actually fire, which for most pairs is a small corpus slice
          val next = syms
            .select(expr(applyMergeExpr("sym", pa, pb, m)).as("sym"))
            .localCheckpoint(true)
          syms.unpersist()
          syms = next
          r += 1
      }
    }
    syms.unpersist()
    merges.toSeq
  }

  /** DuckDB replay of `trainMerges` as a chained-CTE fragment (the q39/q40
    * replay-oracle pattern): per round r, `p{r}` counts adjacent symbol
    * pairs over the current stream, `m{r}` is the 0-or-1-row argmax on
    * (count DESC, pa, pb) carrying the merged id m = 1e6 + r - 1, and
    * `s{r}` applies the merge via the same greedy leftmost fold
    * [[bpeFoldSql]] replays. Mirrors `trainMerges` exactly: words are
    * lowercase [a-z0-9]+ runs of length >= 2; a round with no pairs
    * (degenerate corpus) yields an empty `m{r}` and a no-op fold —
    * matching the Spark trainer's early stop. Validated cell-exact against
    * a sequential reimplementation on sf0.001/sf0.01 and a one-word corpus
    * with two empty rounds. */
  private[graft] def bpeTrainCtes(rounds: Int): String = {
    val head =
      """words AS (
        |  SELECT w FROM (
        |    SELECT unnest(string_split_regex(lower(text), '[^a-z0-9]+')) AS w
        |    FROM documents)
        |  WHERE length(w) >= 2
        |), s0 AS (
        |  SELECT list_transform(generate_series(1, length(w)),
        |                        i -> CAST(ascii(substring(w, i, 1)) AS BIGINT)) AS sym
        |  FROM words
        |)""".stripMargin
    val steps = (1 to rounds).map { r =>
      s"""p$r AS (
         |  SELECT sym[i] AS pa, sym[i + 1] AS pb, CAST(count(*) AS BIGINT) AS c
         |  FROM s${r - 1}, unnest(range(1, len(sym))) AS ri(i)
         |  GROUP BY 1, 2
         |), m$r AS (
         |  SELECT pa, pb, c, CAST(${1000000L + (r - 1)} AS BIGINT) AS m
         |  FROM p$r ORDER BY c DESC, pa, pb LIMIT 1
         |), s$r AS (
         |  SELECT ${bpeFoldSql(s"m$r")} AS sym FROM s${r - 1} LEFT JOIN m$r ON TRUE
         |)""".stripMargin
    }
    (head +: steps).mkString(",\n")
  }

  /** `applyMergeExpr`'s exact semantics as a DuckDB expression over the
    * current `sym` list and the 0-or-1-row merge table `t` (columns
    * pa/pb/m, LEFT JOINed ON TRUE): list_reduce over a list-of-singletons
    * so the accumulator is a BIGINT list, last element replaced by m on a
    * (pa, pb) hit — preserving the pa==pb overlap-chain semantics (a
    * freshly merged id never re-matches pa). A NULL merge pair (empty
    * round joined ON TRUE) is a no-op returning sym unchanged. */
  private[graft] def bpeFoldSql(t: String): String =
    s"""CASE WHEN $t.pa IS NULL THEN sym
       | WHEN NOT (list_contains(sym, $t.pa) AND list_contains(sym, $t.pb)) THEN sym
       | ELSE list_reduce(list_transform(sym, s -> [s]),
       |   (acc, x) -> CASE WHEN len(acc) > 0 AND acc[-1] = $t.pa AND x[1] = $t.pb
       |               THEN list_append(list_slice(acc, 1, len(acc) - 1), $t.m)
       |               ELSE list_concat(acc, x) END)
       | END""".stripMargin.replace('\n', ' ')

  /** The greedy leftmost merge pass as a codegen expression over a symbol
    * array column — shared by training (per round) and encoding (per
    * learned merge, in order). */
  private[graft] def applyMergeExpr(symCol: String, pa: Long, pb: Long, m: Long): String =
    s"""CASE WHEN array_contains($symCol, ${pa}L) AND array_contains($symCol, ${pb}L)
       |THEN aggregate($symCol, cast(array() as array<bigint>), (acc, x) ->
       |CASE WHEN size(acc) > 0 AND element_at(acc, -1) = ${pa}L AND x = ${pb}L
       |THEN concat(slice(acc, 1, size(acc) - 1), array(${m}L))
       |ELSE concat(acc, array(x)) END)
       |ELSE $symCol END""".stripMargin.replace('\n', ' ')
}
