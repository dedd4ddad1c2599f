package graft.operators

import graft.{GraftQuery, Tables}
import graft.functions.TextQueries.{deM, enM, esM, frM, markerCount}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-curation family for the LLM-data-pipeline surface: the cleaning
  * passes that sit between raw crawl and training shards — PII / denylist
  * scrubbing, Gopher-style repetition profiling, temperature-weighted
  * source mixing, and the combined cleaning funnel that reports per-stage
  * survivor counts.
  *
  * Everything is built-in expressions plus hash-partitioned aggregations —
  * the scrub and feature passes are per-row map work (embarrassingly
  * parallel at 100 TB); the repetition profile shuffles on (doc_id, gram)
  * which is near-unique so partial aggregation collapses it; the mixer's
  * only non-map step is a per-source row_number over an LCG order, a
  * shuffle on the low-cardinality source key with a skew ceiling equal to
  * the largest single source.
  */
object CurationQueries {

  /** Java AND RE2 compatible (no backrefs, no lookaround): email, IPv4 and
    * a denylist alternation. Kept class-only so the same pattern text is
    * passed verbatim to both engines. */
  private[graft] val emailPat = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z][a-z]+"
  private[graft] val ipPat = "\\b(?:[0-9]{1,3}\\.){3}[0-9]{1,3}\\b"
  private[graft] val denyPat = "\\b(?:customer|slow)\\b"

  /** Shared by q227 and q229 so the funnel's repetition gate is exactly the
    * profiler's flag at the same threshold. */
  private val topWordMax = 0.20

  val all: Seq[GraftQuery] = Seq(

    GraftQuery(
      "q226_pii_denylist_scrub",
      Some(s"""WITH m AS (
              |  SELECT doc_id,
              |    CAST(len(regexp_extract_all(text, '$emailPat')) AS BIGINT) AS n_email,
              |    CAST(len(regexp_extract_all(text, '$ipPat')) AS BIGINT) AS n_ip,
              |    CAST(len(regexp_extract_all(text, '$denyPat')) AS BIGINT) AS n_deny,
              |    regexp_replace(regexp_replace(regexp_replace(
              |      text, '$emailPat', '[PII]', 'g'), '$ipPat', '[PII]', 'g'),
              |      '$denyPat', '[TERM]', 'g') AS clean_text
              |  FROM documents
              |)
              |SELECT doc_id, n_email, n_ip, n_deny, clean_text,
              |       CAST(len(clean_text) AS BIGINT) AS clean_chars
              |FROM m
              |ORDER BY doc_id""".stripMargin),
      "PII + denylist scrub: count and replace email/IPv4/banned-term " +
        "matches in one projection — per-row map work, no shuffle but the " +
        "presentation sort; the patterns live in the instruction stream " +
        "(class-only regex, codegen'd). At 100 TB this is the shape of " +
        "every redaction pass: scan-bandwidth bound, embarrassingly " +
        "parallel, output written back partition-local."
    ) { (s, dir) =>
      val clean = regexp_replace(regexp_replace(
        regexp_replace(col("text"), emailPat, "[PII]"), ipPat, "[PII]"),
        denyPat, "[TERM]")
      Tables.documents(s, dir).select(
        col("doc_id"),
        size(regexp_extract_all(col("text"), lit(emailPat), lit(0)))
          .cast("long").as("n_email"),
        size(regexp_extract_all(col("text"), lit(ipPat), lit(0)))
          .cast("long").as("n_ip"),
        size(regexp_extract_all(col("text"), lit(denyPat), lit(0)))
          .cast("long").as("n_deny"),
        clean.as("clean_text"),
        length(clean).cast("long").as("clean_chars"))
        .orderBy("doc_id")
    },

    GraftQuery(
      "q227_repetition_profile",
      Some("""WITH tok AS (
             |  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS word
             |  FROM documents
             |), nt AS (
             |  SELECT doc_id, CAST(count(*) AS BIGINT) n_tokens FROM tok GROUP BY doc_id
             |), topw AS (
             |  SELECT doc_id, max(c) AS top_word_c FROM (
             |    SELECT doc_id, word, CAST(count(*) AS BIGINT) c
             |    FROM tok GROUP BY doc_id, word
             |  ) GROUP BY doc_id
             |), big AS (
             |  SELECT doc_id, w[i] || ' ' || w[i + 1] AS bg
             |  FROM (SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents),
             |       unnest(range(1, len(w))) AS t(i)
             |), bstat AS (
             |  SELECT doc_id, max(c) AS top_bigram_c, sum(c) AS n_bigrams,
             |         sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS dup_bigram_occ
             |  FROM (SELECT doc_id, bg, CAST(count(*) AS BIGINT) c
             |        FROM big GROUP BY doc_id, bg)
             |  GROUP BY doc_id
             |)
             |SELECT nt.doc_id AS doc_id, nt.n_tokens,
             |  round(topw.top_word_c * 1.0 / nt.n_tokens, 4) AS top_word_frac,
             |  round(bstat.top_bigram_c * 1.0 / bstat.n_bigrams, 4) AS top_bigram_frac,
             |  round(bstat.dup_bigram_occ * 1.0 / bstat.n_bigrams, 4) AS dup_bigram_frac,
             |  (topw.top_word_c * 1.0 / nt.n_tokens > 0.20
             |   OR bstat.dup_bigram_occ * 1.0 / bstat.n_bigrams > 0.50) AS repetitive
             |FROM nt
             |JOIN topw ON nt.doc_id = topw.doc_id
             |JOIN bstat ON nt.doc_id = bstat.doc_id
             |ORDER BY doc_id""".stripMargin),
      "Gopher-style repetition profile: most-common-word fraction, top " +
        "bigram fraction and duplicate-bigram mass per document. Grams " +
        "explode to (doc_id, gram) rows and hash-aggregate — near-unique " +
        "keys so partial agg collapses the map side; no self-joins, no " +
        "per-row quadratic work. Exactly one explode+agg pipeline per gram " +
        "order (token totals fall out of the word-count aggregate, not a " +
        "separate pass), shuffle bounded by distinct grams per doc; the " +
        "doc-level joins shuffle on doc_id at scale (AQE broadcasts them " +
        "at test size). Single-token docs carry no bigram and drop (same " +
        "inner-join contract on both engines)."
    ) { (s, dir) =>
      val docs = Tables.documents(s, dir)
        .select(col("doc_id"), split(lower(col("text")), " ").as("w"))
      val tok = docs.select(col("doc_id"), explode(col("w")).as("word"))
      // ONE token pass: n_tokens is the sum of per-word counts, so the
      // word-count aggregate feeds both the mode and the total — no
      // second scan+explode of the corpus for a plain count
      val topw = tok.groupBy("doc_id", "word").agg(count(lit(1)).as("c"))
        .groupBy("doc_id").agg(
          max("c").as("top_word_c"),
          sum("c").cast("long").as("n_tokens"))
      val bg = docs.select(col("doc_id"),
        explode(zip_with(
          slice(col("w"), lit(1), size(col("w")) - 1),
          slice(col("w"), lit(2), size(col("w")) - 1),
          (a, b) => concat(a, lit(" "), b))).as("bg"))
      val bstat = bg.groupBy("doc_id", "bg").agg(count(lit(1)).as("c"))
        .groupBy("doc_id").agg(
          max("c").as("top_bigram_c"),
          sum("c").as("n_bigrams"),
          sum(when(col("c") > 1, col("c")).otherwise(0L)).as("dup_bigram_occ"))
      topw.join(bstat, "doc_id")
        .select(col("doc_id"), col("n_tokens"),
          round(col("top_word_c") * 1.0 / col("n_tokens"), 4).as("top_word_frac"),
          round(col("top_bigram_c") * 1.0 / col("n_bigrams"), 4).as("top_bigram_frac"),
          round(col("dup_bigram_occ") * 1.0 / col("n_bigrams"), 4).as("dup_bigram_frac"),
          (col("top_word_c") * 1.0 / col("n_tokens") > topWordMax ||
            col("dup_bigram_occ") * 1.0 / col("n_bigrams") > 0.50).as("repetitive"))
        .orderBy("doc_id")
    },

    GraftQuery(
      "q228_source_mixture_sample",
      Some("""WITH src AS (
             |  SELECT source, CAST(count(*) AS BIGINT) cnt FROM documents GROUP BY source
             |), w AS (
             |  SELECT source, cnt,
             |         CAST(floor(sqrt(CAST(cnt AS DOUBLE))) AS BIGINT) AS f
             |  FROM src
             |), tot AS (
             |  SELECT CAST(sum(f) AS BIGINT) AS sumf, CAST(sum(cnt) AS BIGINT) AS total
             |  FROM w
             |), quota AS (
             |  SELECT source, CAST(((total // 2) * f) // sumf AS BIGINT) AS quota
             |  FROM w, tot
             |), ranked AS (
             |  SELECT d.doc_id AS doc_id, d.source AS source,
             |    CAST(row_number() OVER (PARTITION BY d.source
             |      ORDER BY (d.doc_id * 1103515245 + 12345) % 2147483648, d.doc_id)
             |      AS BIGINT) AS rk
             |  FROM documents d
             |)
             |SELECT r.doc_id, r.source, r.rk, quota.quota
             |FROM ranked r JOIN quota ON r.source = quota.source
             |WHERE r.rk <= quota.quota
             |ORDER BY r.doc_id""".stripMargin),
      "Temperature-weighted source mixing (alpha = 0.5): per-source integer " +
        "weights floor(sqrt(count)) set quotas for a half-size mix, and a " +
        "deterministic LCG over doc_id picks the sample — a seeded shuffle " +
        "both engines replay bit-identically (all integer arithmetic; " +
        "sqrt-of-integer is IEEE-exact). Scale: one count agg, a 1-row " +
        "totals broadcast, and a per-source row_number — shuffle on the " +
        "low-cardinality source key; at 100 TB a mega-source is pre-split " +
        "by LCG range so no single partition holds a whole source " +
        "(rank = range offset + within-range row_number, same order). " +
        "Contract note: doc_id * 1103515245 stays in i64 up to ~8.4e9 ids; " +
        "past that swap in a 64-bit mix (e.g. splitmix64) — the contract " +
        "is any engine-replayable integer hash, not this LCG."
    ) { (s, dir) =>
      val docs = Tables.documents(s, dir)
      val w = docs.groupBy("source").agg(count(lit(1)).as("cnt"))
        .withColumn("f", floor(sqrt(col("cnt").cast("double"))).cast("long"))
      val tot = w.agg(sum("f").as("sumf"), sum("cnt").as("total"))
      val quota = w.crossJoin(broadcast(tot))
        .select(col("source"),
          expr("((total div 2) * f) div sumf").cast("long").as("quota"))
      val lcg = (col("doc_id") * lit(1103515245L) + lit(12345L)) % lit(2147483648L)
      val ranked = docs.select(col("doc_id"), col("source"),
        row_number().over(
          Window.partitionBy("source").orderBy(lcg.asc, col("doc_id").asc))
          .cast("long").as("rk"))
      ranked.join(broadcast(quota), "source")
        .filter(col("rk") <= col("quota"))
        .select(col("doc_id"), col("source"), col("rk"), col("quota"))
        .orderBy("doc_id")
    },

    GraftQuery(
      "q229_curation_funnel",
      Some("""WITH t AS (
             |  SELECT doc_id, text, string_split(lower(text), ' ') w FROM documents
             |), feat AS (
             |  SELECT doc_id,
             |    CAST(len(w) AS BIGINT) n_tokens,
             |    CAST(len(text) AS BIGINT) n_chars,
             |    list_reduce(list_transform(w, x -> CAST(len(x) AS BIGINT)), (a,b) -> a+b) stl,
             |    CAST(len(list_filter(w, x -> list_contains(['the','a','and','of'], x))) AS BIGINT) n_en,
             |    CAST(len(list_filter(w, x -> list_contains(['el','la','de','y'], x))) AS BIGINT) n_es,
             |    CAST(len(list_filter(w, x -> list_contains(['der','die','das','und'], x))) AS BIGINT) n_de,
             |    CAST(len(list_filter(w, x -> list_contains(['le','la','et','les'], x))) AS BIGINT) n_fr,
             |    CAST(len(regexp_extract_all(text, '[^a-z0-9 ]')) AS BIGINT) n_punct
             |  FROM t
             |), topw AS (
             |  SELECT doc_id, max(c) AS top_word_c FROM (
             |    SELECT doc_id, word, CAST(count(*) AS BIGINT) c
             |    FROM (SELECT doc_id, unnest(w) AS word FROM t)
             |    GROUP BY doc_id, word
             |  ) GROUP BY doc_id
             |), flags AS (
             |  SELECT f.doc_id,
             |    (f.n_en + f.n_es + f.n_de + f.n_fr > 0) AS lang_ok,
             |    (0.2 * (CAST(f.stl AS DOUBLE) / f.n_tokens)
             |     + 3.0 * (CAST(f.n_en AS DOUBLE) / f.n_tokens)
             |     - 0.5 * (CAST(f.n_punct AS DOUBLE) / nullif(f.n_chars, 0))) >= 1.05 AS quality_ok,
             |    (CAST(topw.top_word_c AS DOUBLE) / f.n_tokens) <= 0.20 AS rep_ok,
             |    (f.n_tokens BETWEEN 20 AND 80) AS len_ok
             |  FROM feat f JOIN topw ON f.doc_id = topw.doc_id
             |)
             |SELECT CAST(count(*) AS BIGINT) AS n_total,
             |  CAST(sum(CASE WHEN lang_ok THEN 1 ELSE 0 END) AS BIGINT) AS n_lang,
             |  CAST(sum(CASE WHEN lang_ok AND quality_ok THEN 1 ELSE 0 END) AS BIGINT) AS n_quality,
             |  CAST(sum(CASE WHEN lang_ok AND quality_ok AND rep_ok THEN 1 ELSE 0 END) AS BIGINT) AS n_repetition,
             |  CAST(sum(CASE WHEN lang_ok AND quality_ok AND rep_ok AND len_ok THEN 1 ELSE 0 END) AS BIGINT) AS n_length
             |FROM flags""".stripMargin),
      "The cleaning funnel end-to-end: language-ID gate, quality-score " +
        "gate (q46's transcendental-free linear score), repetition gate " +
        "(q227's top-word fraction at the same 0.20 threshold) and a " +
        "token-length window, reported as cumulative survivor counts — the " +
        "per-stage loss accounting every curation run ships with. One " +
        "feature projection + one word-count agg + a 5-number global " +
        "rollup: at 100 TB the funnel reads the corpus twice (the feature " +
        "scan, plus the per-doc word-count the repetition gate needs — " +
        "q227's exact 2-scan shape), each collapsed by partial " +
        "aggregation; the four gates share those scans, so there are no " +
        "per-STAGE re-scans."
    ) { (s, dir) =>
      val w = split(lower(col("text")), " ")
      val feat = Tables.documents(s, dir).select(
        col("doc_id"),
        size(w).cast("long").as("n_tokens"),
        length(col("text")).cast("long").as("n_chars"),
        aggregate(transform(w, x => length(x).cast("long")), lit(0L),
          (a, b) => a + b).as("stl"),
        markerCount(w, enM).as("n_en"), markerCount(w, esM).as("n_es"),
        markerCount(w, deM).as("n_de"), markerCount(w, frM).as("n_fr"),
        size(regexp_extract_all(col("text"), lit("[^a-z0-9 ]"), lit(0)))
          .cast("long").as("n_punct"))
      val topw = Tables.documents(s, dir)
        .select(col("doc_id"), explode(w).as("word"))
        .groupBy("doc_id", "word").agg(count(lit(1)).cast("long").as("c"))
        .groupBy("doc_id").agg(max("c").as("top_word_c"))
      val flags = feat.join(topw, "doc_id").select(
        (col("n_en") + col("n_es") + col("n_de") + col("n_fr") > 0).as("lang_ok"),
        // nullif-guard: an empty text has n_chars = 0; Spark's double /0
        // yields NaN (compares false) while DuckDB's yields NULL (CASE
        // else-branch) — they land on the same 0 by different routes, so
        // pin the SAME route: NULL on both, gate fails closed
        (lit(0.2) * (col("stl").cast("double") / col("n_tokens"))
          + lit(3.0) * (col("n_en").cast("double") / col("n_tokens"))
          - lit(0.5) * (col("n_punct").cast("double") /
            nullif(col("n_chars"), lit(0))) >= 1.05)
          .as("quality_ok"),
        (col("top_word_c").cast("double") / col("n_tokens") <= topWordMax)
          .as("rep_ok"),
        col("n_tokens").between(20, 80).as("len_ok"))
      flags.agg(
        count(lit(1)).cast("long").as("n_total"),
        sum(when(col("lang_ok"), 1L).otherwise(0L)).cast("long").as("n_lang"),
        sum(when(col("lang_ok") && col("quality_ok"), 1L).otherwise(0L))
          .cast("long").as("n_quality"),
        sum(when(col("lang_ok") && col("quality_ok") && col("rep_ok"), 1L)
          .otherwise(0L)).cast("long").as("n_repetition"),
        sum(when(col("lang_ok") && col("quality_ok") && col("rep_ok") &&
          col("len_ok"), 1L).otherwise(0L)).cast("long").as("n_length"))
    },

    GraftQuery(
      "q235_token_budget_mix",
      Some(s"""$budgetAllocSqlCtes
              |SELECT source, n_docs, tokens, wt AS weight, cap_epochs,
              |  cap AS cap_tokens, (sat = 1) AS saturated, alloc_tokens,
              |  alloc_tokens * 1000000 // tokens AS epochs_ppm
              |FROM quota ORDER BY source""".stripMargin),
      "Epoch-capped token-budget allocation (exact water-filling): the " +
        "global token budget (2× the corpus, i.e. two average epochs) is " +
        "split across sources proportionally to q228's sqrt-temperature " +
        "weights, but no source may exceed its per-source repetition cap " +
        "of 1–4 epochs (high-quality sources repeat, crawl-grade sources " +
        "don't — the cap table is the curator's policy artifact, modeled " +
        "here as a deterministic hash of the source name so both engines " +
        "replay it; in production it is a tiny broadcast join). The " +
        "water-filling is CLOSED FORM, not iterative: sorted ascending by " +
        "cap/weight, the saturated set is exactly a prefix, so one " +
        "row_number, two prefix sums and a running min find the waterline " +
        "and every unsaturated source gets floor(remaining_budget × w / " +
        "remaining_w) — all integer arithmetic after an IEEE-exact " +
        "sqrt-and-divide sort key. Scale: the corpus is touched ONCE (the " +
        "per-source token count, partial-agg collapsed); everything after " +
        "runs on O(sources) rows, so the windows' single partition holds " +
        "hundreds of rows, not documents. i64 contract: (budget − satcap) " +
        "× weight stays in range up to ~1e12 tokens at sqrt weights; past " +
        "that, promote the multiply to DECIMAL(38) — the contract is the " +
        "allocation rule, not the word size."
    ) { (s, dir) =>
      budgetAlloc(s, dir)
        .select(col("source"), col("n_docs"), col("tokens"), col("weight"),
          col("cap_epochs"), col("cap").as("cap_tokens"),
          (col("sat") === 1).as("saturated"), col("alloc_tokens"),
          expr("alloc_tokens * 1000000 div tokens").as("epochs_ppm"))
        .orderBy("source")
    },

    GraftQuery(
      "q238_token_budget_admit",
      Some(s"""$budgetAllocSqlCtes, ranked AS (
              |  SELECT d.doc_id, d.source,
              |    CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_tokens,
              |    CAST(row_number() OVER (PARTITION BY d.source
              |      ORDER BY (d.doc_id * 1103515245 + 12345) % 2147483648,
              |               d.doc_id) AS BIGINT) AS rk
              |  FROM documents d
              |), cum AS (
              |  SELECT *,
              |    CAST(coalesce(sum(n_tokens) OVER (PARTITION BY source
              |      ORDER BY rk ROWS BETWEEN UNBOUNDED PRECEDING
              |      AND 1 PRECEDING), 0) AS BIGINT) cum_prev
              |  FROM ranked
              |)
              |SELECT c.doc_id, c.source, c.n_tokens, c.rk,
              |  c.cum_prev + c.n_tokens AS cum_tokens,
              |  q.alloc_tokens // q.cap_epochs AS shard_tokens
              |FROM cum c JOIN quota q ON c.source = q.source
              |WHERE c.cum_prev < q.alloc_tokens // q.cap_epochs
              |ORDER BY c.doc_id""".stripMargin),
      "Token-budget admission — the EXECUTOR of q235's plan: each source " +
        "repeats its shard exactly cap_epochs times, so the shard of " +
        "UNIQUE documents to materialize carries alloc div cap_epochs " +
        "tokens (shard × epochs = allocation; for a saturated source the " +
        "shard is the whole source). Documents queue in q228's " +
        "deterministic LCG priority order and are admitted while the " +
        "tokens already admitted ahead of them stay below the shard " +
        "budget — the last admission may overshoot by less than one " +
        "document, the admit-then-saturate rule that makes each decision " +
        "independent of later arrivals, which is what lets the streaming " +
        "form StatefulOps.tokenBudgetAdmitTws decide each arrival " +
        "exactly once with 8 bytes of state per source. Admission is a " +
        "prefix by construction: once the running sum crosses the shard " +
        "every later-priority document is rejected, so the gate is one " +
        "per-source cumulative-sum window — no join between documents, " +
        "no iteration. Scale: the fact side is one scan + one window " +
        "shuffle on the low-cardinality source key (q228's mega-source " +
        "pre-split applies verbatim); shard budgets arrive as an " +
        "O(sources) broadcast. Together q235/q238 are plan-then-admit: " +
        "the same pair of passes a production mixer runs nightly."
    ) { (s, dir) =>
      val quota = budgetAlloc(s, dir).select(col("source"),
        expr("alloc_tokens div cap_epochs").as("shard_tokens"))
      val lcg = (col("doc_id") * lit(1103515245L) + lit(12345L)) % lit(2147483648L)
      val ranked = Tables.documents(s, dir)
        .select(col("doc_id"), col("source"),
          size(split(col("text"), " ")).cast("long").as("n_tokens"))
        .withColumn("rk", row_number().over(
          Window.partitionBy("source").orderBy(lcg.asc, col("doc_id").asc))
          .cast("long"))
      val cumPrev = Window.partitionBy("source").orderBy("rk")
        .rowsBetween(Window.unboundedPreceding, -1)
      ranked
        .withColumn("cum_prev", coalesce(sum("n_tokens").over(cumPrev), lit(0L)))
        .join(broadcast(quota), "source")
        .filter(col("cum_prev") < col("shard_tokens"))
        .select(col("doc_id"), col("source"), col("n_tokens"), col("rk"),
          (col("cum_prev") + col("n_tokens")).as("cum_tokens"),
          col("shard_tokens"))
        .orderBy("doc_id")
    },

    GraftQuery(
      "q237_split_leakage_audit",
      Some(s"""WITH f AS (
              |  SELECT doc_id,
              |    CASE WHEN (${sourceFoldSql}) % 10 < 8 THEN 'train'
              |         WHEN (${sourceFoldSql}) % 10 = 8 THEN 'valid'
              |         ELSE 'test' END AS split,
              |    ${graft.operators.DedupQueries.leadFingerprintSql} AS fp
              |  FROM documents
              |), pf AS (
              |  SELECT fp, split, CAST(count(*) AS BIGINT) c, min(doc_id) mdoc
              |  FROM f GROUP BY fp, split
              |), nf AS (
              |  SELECT *, count(*) OVER (PARTITION BY fp) nsplits FROM pf
              |)
              |SELECT split, CAST(sum(c) AS BIGINT) n_docs,
              |  CAST(count(*) AS BIGINT) n_fps,
              |  CAST(sum(CASE WHEN nsplits > 1 THEN c ELSE 0 END) AS BIGINT)
              |    AS n_leaked,
              |  CAST(sum(CASE WHEN nsplits > 1 THEN c ELSE 0 END) AS BIGINT)
              |    * 1000000 // CAST(sum(c) AS BIGINT) AS leak_ppm,
              |  min(CASE WHEN nsplits > 1 THEN mdoc END) AS first_leaked_doc
              |FROM nf GROUP BY split ORDER BY split""".stripMargin),
      "Train/valid/test split assignment + leakage audit: membership is a " +
        "hash of the SOURCE (all of a source lands in one split — the " +
        "grouping that stops a crawl re-serving one site across splits), " +
        "and the audit counts documents whose canonical lead fingerprint " +
        "(q160's sha256-of-first-8-words, one shared definition) appears " +
        "in more than one split — the cross-split near-dup leakage an " +
        "eval-integrity gate must catch BEFORE training, the complement " +
        "of q76/q96's decontamination against a fixed eval set. Scale: " +
        "one corpus scan to (fp, split) partial-agg pairs — document " +
        "bodies never ride a shuffle, only 32-byte digests; the " +
        "multi-split flag is a count window on fp over the ALREADY " +
        "aggregated pairs (≤ 3 rows per fp), and the final rollup is a " +
        "3-key aggregate. first_leaked_doc gives the auditor a concrete " +
        "offender per split (NULL when clean)."
    ) { (s, dir) =>
      import graft.functions.TextQueries.base31Fold
      val fold = base31Fold(col("source")) % 10
      val f = Tables.documents(s, dir).select(col("doc_id"),
        when(fold < 8, "train").when(fold === 8, "valid").otherwise("test")
          .as("split"),
        DedupQueries.leadFingerprint.as("fp"))
      val pf = f.groupBy("fp", "split").agg(
        count(lit(1)).cast("long").as("c"), min("doc_id").as("mdoc"))
      pf.withColumn("nsplits", count(lit(1)).over(Window.partitionBy("fp")))
        .groupBy("split").agg(
          sum("c").cast("long").as("n_docs"),
          count(lit(1)).cast("long").as("n_fps"),
          sum(when(col("nsplits") > 1, col("c")).otherwise(0L)).cast("long")
            .as("n_leaked"),
          min(when(col("nsplits") > 1, col("mdoc"))).as("first_leaked_doc"))
        .select(col("split"), col("n_docs"), col("n_fps"), col("n_leaked"),
          expr("n_leaked * 1000000 div n_docs").as("leak_ppm"),
          col("first_leaked_doc"))
        .orderBy("split")
    },

    GraftQuery(
      "q242_classifier_gate",
      Some("""WITH t AS (
             |  SELECT doc_id, lang, text, string_split(lower(text), ' ') w
             |  FROM documents
             |), m AS (
             |  SELECT doc_id, lang,
             |    CAST(len(text) AS BIGINT) n_chars,
             |    CAST(len(w) AS BIGINT) n_tokens,
             |    list_reduce(list_transform(w, x -> CAST(len(x) AS BIGINT)),
             |                (a,b) -> a+b) sum_tok_len,
             |    CAST(len(list_filter(w, x ->
             |      list_contains(['the','a','and','of'], x))) AS BIGINT) n_stop,
             |    CAST(len(regexp_extract_all(text, '[^a-z0-9 ]')) AS BIGINT)
             |      n_punct,
             |    CAST(len(list_distinct(w)) AS BIGINT) n_uniq
             |  FROM t
             |), f AS (
             |  SELECT doc_id, lang,
             |    (1000 * sum_tok_len) // n_tokens AS atl_milli,
             |    (10000 * n_stop) // n_tokens AS stop_bp,
             |    coalesce((10000 * n_punct) // nullif(n_chars, 0), 10000)
             |      AS punct_bp,
             |    (10000 * n_uniq) // n_tokens AS ttr_bp
             |  FROM m
             |), wt(lang, w_atl, w_stop, w_punct, w_ttr, bias) AS (
             |  VALUES ('de', 2, 30, -40, -5, -7700),
             |         ('en', 2, 30, -40, -5, -4200),
             |         ('es', 2, 30, -40, -5, -6400),
             |         ('fr', 2, 30, -40, -5, -9400),
             |         ('zh', 2,  0, -40, -5, 12600)
             |), g AS (
             |  SELECT f.doc_id, f.lang, f.atl_milli, f.stop_bp, f.punct_bp,
             |    f.ttr_bp,
             |    CAST(coalesce(w.w_atl, 2) * f.atl_milli
             |       + coalesce(w.w_stop, 30) * f.stop_bp
             |       + coalesce(w.w_punct, -40) * f.punct_bp
             |       + coalesce(w.w_ttr, -5) * f.ttr_bp
             |       + coalesce(w.bias, -20000) AS BIGINT) AS logit
             |  FROM f LEFT JOIN wt w ON f.lang = w.lang
             |)
             |SELECT doc_id, lang, atl_milli, stop_bp, punct_bp, ttr_bp,
             |       logit, (logit > 0) AS passed
             |FROM g ORDER BY doc_id""".stripMargin),
      "Frozen-classifier quality gate — model-based filtering in the " +
        "DCLM / fastText-classifier shape: a per-language linear model " +
        "over q46's exact feature definitions (mean token length in " +
        "milli, stopword / punctuation / type-token ratios in basis " +
        "points — ONE feature contract serves the profiler and the gate) " +
        "scores every document with an integer logit; pass = logit > 0. " +
        "The weight matrix is the curator's frozen policy artifact: " +
        "per-language rows (zh zeroes the Latin-stopword weight; biases " +
        "calibrated per stratum, exactly CCNet's per-language threshold " +
        "practice) delivered by a BROADCAST left join, with strict " +
        "defaults (bias -20000) so an unknown language fails toward " +
        "reject, and empty text coalesces punct_bp to 10000 — the gate " +
        "fails closed on degenerate rows, the q229 discipline. All " +
        "integer arithmetic: the same bits fall out of any engine, and " +
        "a margin audit can bucket logits without float drift. Scale: " +
        "one corpus scan of per-row map work joined to a KB-sized " +
        "broadcast — no shuffle touches document rows; retraining the " +
        "classifier only replaces the tiny weights table, never the " +
        "plan. In production the weights row count is O(languages); the " +
        "gate composes with q229's funnel as just another survivor stage."
    ) { (s, dir) =>
      import s.implicits._
      val wts = broadcast(Seq(
        ("de", 2L, 30L, -40L, -5L, -7700L),
        ("en", 2L, 30L, -40L, -5L, -4200L),
        ("es", 2L, 30L, -40L, -5L, -6400L),
        ("fr", 2L, 30L, -40L, -5L, -9400L),
        ("zh", 2L, 0L, -40L, -5L, 12600L))
        .toDF("lang", "w_atl", "w_stop", "w_punct", "w_ttr", "bias"))
      val w = split(lower(col("text")), " ")
      val m = Tables.documents(s, dir).select(
        col("doc_id"), col("lang"),
        length(col("text")).cast("long").as("n_chars"),
        size(w).cast("long").as("n_tokens"),
        aggregate(transform(w, x => length(x).cast("long")), lit(0L),
          (a, b) => a + b).as("sum_tok_len"),
        markerCount(w, enM).as("n_stop"),
        size(regexp_extract_all(col("text"), lit("[^a-z0-9 ]"), lit(0)))
          .cast("long").as("n_punct"),
        size(array_distinct(w)).cast("long").as("n_uniq"))
      val f = m.select(col("doc_id"), col("lang"),
        expr("(1000 * sum_tok_len) div n_tokens").as("atl_milli"),
        expr("(10000 * n_stop) div n_tokens").as("stop_bp"),
        coalesce(expr("(10000 * n_punct) div nullif(n_chars, 0)"), lit(10000L))
          .as("punct_bp"),
        expr("(10000 * n_uniq) div n_tokens").as("ttr_bp"))
      f.join(wts, Seq("lang"), "left")
        .select(col("doc_id"), col("lang"), col("atl_milli"), col("stop_bp"),
          col("punct_bp"), col("ttr_bp"),
          (coalesce(col("w_atl"), lit(2L)) * col("atl_milli")
            + coalesce(col("w_stop"), lit(30L)) * col("stop_bp")
            + coalesce(col("w_punct"), lit(-40L)) * col("punct_bp")
            + coalesce(col("w_ttr"), lit(-5L)) * col("ttr_bp")
            + coalesce(col("bias"), lit(-20000L))).cast("long").as("logit"))
        .withColumn("passed", col("logit") > 0L)
        .orderBy("doc_id")
    })

  /** `base31Fold(source)` in the oracles' DuckDB dialect — the policy /
    * split hash both q235 and q237 key on the source name. */
  private def sourceFoldSql: String =
    "list_reduce(list_transform(string_split(source, ''), " +
      "c -> CAST(ascii(c) AS BIGINT)), (a, b) -> (a * 31 + b) % 1000000007)"

  /** q235's water-filled allocation frame, through `alloc_tokens` — ONE
    * definition shared by q235 (reports the plan) and q238 (admits under
    * it): an allocation-rule tweak must move the planner and the admitter
    * together, the leadFingerprint discipline. Columns: source, n_docs,
    * tokens, weight, cap_epochs, cap, b, wsum, sat, alloc_tokens (+
    * intermediates). Totals are whole-partition windows over the
    * O(sources) aggregate, so the corpus is scanned exactly once. */
  private def budgetAlloc(s: SparkSession, dir: String):
      org.apache.spark.sql.DataFrame = {
    import graft.functions.TextQueries.base31Fold
    val w = Tables.documents(s, dir).groupBy("source").agg(
        count(lit(1)).cast("long").as("n_docs"),
        sum(size(split(col("text"), " ")).cast("long")).cast("long").as("tokens"))
      .withColumn("weight", floor(sqrt(col("tokens").cast("double"))).cast("long"))
      .withColumn("cap_epochs", (base31Fold(col("source")) % 4 + 1).cast("long"))
      .withColumn("cap", col("cap_epochs") * col("tokens"))
    val wPrev = Window.orderBy("rn")
      .rowsBetween(Window.unboundedPreceding, -1)
    val wRun = Window.orderBy("rn")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.orderBy("rn")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    w.withColumn("rn", row_number().over(Window.orderBy(
        (col("cap").cast("double") / col("weight")).asc, col("source").asc)))
      .withColumn("b", (sum("tokens").over(wAll) * 2).cast("long"))
      .withColumn("wsum", sum("weight").over(wAll).cast("long"))
      .withColumn("scap_prev", coalesce(sum("cap").over(wPrev), lit(0L)))
      .withColumn("sw_prev", coalesce(sum("weight").over(wPrev), lit(0L)))
      .withColumn("satraw", when(
        (col("b") - col("scap_prev")) * col("weight") >=
          col("cap") * (col("wsum") - col("sw_prev")), 1).otherwise(0))
      .withColumn("sat", min("satraw").over(wRun))
      .withColumn("satcap",
        sum(when(col("sat") === 1, col("cap")).otherwise(0L)).over(wAll)
          .cast("long"))
      .withColumn("satw",
        sum(when(col("sat") === 1, col("weight")).otherwise(0L)).over(wAll)
          .cast("long"))
      .withColumn("alloc_tokens", when(col("sat") === 1, col("cap"))
        .otherwise(expr("((b - satcap) * weight) div (wsum - satw)")))
  }

  /** [[budgetAlloc]] in the oracles' DuckDB dialect, ending in a `quota`
    * CTE with `alloc_tokens` — interpolated by both the q235 and q238
    * oracles so they replay the identical waterline. */
  private def budgetAllocSqlCtes: String =
    s"""WITH bd AS (
       |  SELECT source, CAST(count(*) AS BIGINT) n_docs,
       |         CAST(sum(CAST(len(string_split(text, ' ')) AS BIGINT))
       |              AS BIGINT) tokens
       |  FROM documents GROUP BY source
       |), bw AS (
       |  SELECT source, n_docs, tokens,
       |         CAST(floor(sqrt(CAST(tokens AS DOUBLE))) AS BIGINT) wt,
       |         CAST(1 + (${sourceFoldSql}) % 4 AS BIGINT) AS cap_epochs
       |  FROM bd
       |), btot AS (
       |  SELECT CAST(sum(tokens) AS BIGINT) * 2 AS b,
       |         CAST(sum(wt) AS BIGINT) AS wsum FROM bw
       |), bord AS (
       |  SELECT bw.*, btot.b, btot.wsum, cap_epochs * tokens AS cap,
       |         row_number() OVER (ORDER BY
       |           CAST(cap_epochs * tokens AS DOUBLE) / wt, source) rn
       |  FROM bw, btot
       |), bpre AS (
       |  SELECT *,
       |    coalesce(sum(cap) OVER (ORDER BY rn
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) scap_prev,
       |    coalesce(sum(wt) OVER (ORDER BY rn
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) sw_prev
       |  FROM bord
       |), bflg AS (
       |  SELECT *, CASE WHEN (b - scap_prev) * wt >= cap * (wsum - sw_prev)
       |                 THEN 1 ELSE 0 END satraw
       |  FROM bpre
       |), brun AS (
       |  SELECT *, min(satraw) OVER (ORDER BY rn
       |    ROWS UNBOUNDED PRECEDING) sat FROM bflg
       |), bfin AS (
       |  SELECT *,
       |    CAST(sum(CASE WHEN sat = 1 THEN cap ELSE 0 END) OVER ()
       |         AS BIGINT) satcap,
       |    CAST(sum(CASE WHEN sat = 1 THEN wt ELSE 0 END) OVER ()
       |         AS BIGINT) satw
       |  FROM brun
       |), quota AS (
       |  SELECT *, CASE WHEN sat = 1 THEN cap
       |       ELSE ((b - satcap) * wt) // (wsum - satw) END AS alloc_tokens
       |  FROM bfin
       |)""".stripMargin
}
