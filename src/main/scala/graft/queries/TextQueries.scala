package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.TextAnalysis
import graft.sources.Sources.table

/** Text-analysis queries over `documents` (X3): token stats, quality
  * scoring, lang-ID, fingerprints, corpus rollup. All DuckDB-oracle
  * checked — the heuristics are ASCII-regex and integer-ratio based
  * precisely so both engines compute identical values, and the rolling
  * polynomial hash is reproduced in SQL ([[OracleHashSql]]). */
object TextQueries extends QueryPack {

  private val toksSql =
    """list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '')"""
  private val stopSql =
    "['the','a','of','and','to','in','is','that','it','was']"

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x8_text_tokens" -> ((s: SparkSession, d: String) =>
      TextAnalysis.tokenStats(table(s, d, "documents"))),

    // Context-length capping: first-128-token cut, rebuilt text +
    // truncation flag; whitespace-normalized identically in both engines.
    "x77_truncate_tokens" -> ((s: SparkSession, d: String) =>
      TextAnalysis.truncateTokens(table(s, d, "documents"), maxTokens = 128)),

    // Per-language length normalization: exact integer moments → a fixed
    // IEEE op sequence both engines replay bit-for-bit.
    "x56_normalize_zscore" -> ((s: SparkSession, d: String) =>
      graft.operators.Profiling
        .zscore(table(s, d, "documents"), "n_chars", "lang")
        .select(col("doc_id"), col("lang"), col("n_chars"), col("z"))),

    // Exact-p99 length clip via the distinct-value histogram (never a
    // global sort or a driver TakeOrdered of 0.99·n rows).
    "x54_outlier_clip" -> ((s: SparkSession, d: String) =>
      graft.operators.Profiling
        .clipAbovePercentile(table(s, d, "documents"), "n_chars", 0.99)
        .select(col("doc_id"), col("n_chars"))),

    "x9_text_quality" -> ((s: SparkSession, d: String) =>
      TextAnalysis.qualityScore(table(s, d, "documents"))),

    "x10_lang_id" -> ((s: SparkSession, d: String) =>
      TextAnalysis.langId(table(s, d, "documents"))),

    "x11_fingerprint_md5" -> ((s: SparkSession, d: String) =>
      TextAnalysis.fingerprints(table(s, d, "documents"))
        .select(col("doc_id"), col("md5_fp"))),

    "x12_fingerprint_rolling" -> ((s: SparkSession, d: String) =>
      TextAnalysis.fingerprints(table(s, d, "documents"))
        .select(col("doc_id"), col("rolling_fp"))),

    "x23_pii_scrub" -> ((s: SparkSession, d: String) =>
      table(s, d, "documents").select(
        col("doc_id"),
        TextAnalysis.scrubPii(col("text")).as("scrubbed"),
        (TextAnalysis.scrubPii(col("text")) =!= col("text")).as("was_scrubbed"))),

    // Single-pass rollup: token counts via the TokenCount kernel on the
    // same scan that carries `source` — no self-join, one shuffle.
    "x13_corpus_stats" -> ((s: SparkSession, d: String) =>
      graft.operators.TextAnalysis.corpusStats(table(s, d, "documents"))),

    "x29_top_tokens" -> ((s: SparkSession, d: String) =>
      graft.operators.TextAnalysis.topTokens(table(s, d, "documents"), k = 10)),

    // Bounded-memory heavy-hitter variant: exact counts (candidates are
    // recounted), with the per-row boolean certifying the MG containment
    // bound held — the oracle is the exact top-k plus TRUE literals, the
    // q12 technique for approximate operators.
    "x32_top_tokens_sketch" -> ((s: SparkSession, d: String) =>
      graft.operators.TextAnalysis.topTokensSketch(
        table(s, d, "documents"), k = 10, capacity = 256)),

    "x39_tfidf_keywords" -> ((s: SparkSession, d: String) =>
      graft.operators.TextAnalysis.tfIdf(table(s, d, "documents"), k = 5)),

    "x42_budget_select" -> ((s: SparkSession, d: String) =>
      graft.operators.Sampling.budgetSelect(table(s, d, "documents"), BudgetTokens)),

    "x44_unigram_logprob" -> ((s: SparkSession, d: String) =>
      graft.operators.TextAnalysis.unigramLogProb(table(s, d, "documents"))),

    "x45_gopher_rules" -> ((s: SparkSession, d: String) =>
      graft.operators.TextAnalysis.gopherRules(table(s, d, "documents"))))

  private val BudgetTokens = 10000L

  override val oracleSql: Map[String, String] = Map(
    // Mirrors Profiling.zscore's exact op sequence: integer sums, then
    // mean = s/n, var = sq/n - mean*mean, std = sqrt(var) — every step a
    // single correctly-rounded IEEE op in both engines.
    "x56_normalize_zscore" ->
      """WITH st AS (
        |  SELECT lang, sum(n_chars)::BIGINT AS s,
        |    sum(n_chars * n_chars)::BIGINT AS sq, count(*) AS n
        |  FROM documents GROUP BY lang),
        |ms AS (
        |  SELECT lang, s::DOUBLE / n::DOUBLE AS mean,
        |    sqrt(sq::DOUBLE / n::DOUBLE
        |         - (s::DOUBLE / n::DOUBLE) * (s::DOUBLE / n::DOUBLE)) AS std
        |  FROM st)
        |SELECT doc_id, lang, n_chars,
        |  round(CASE WHEN std = 0 THEN 0
        |        ELSE (n_chars::DOUBLE - mean) / std END, 6) AS z
        |FROM documents JOIN ms USING (lang)""".stripMargin,

    // Same definition as Profiling.percentileByHistogram: threshold =
    // smallest value whose cumulative count reaches ceil(0.99·n).
    "x54_outlier_clip" ->
      """WITH c AS (SELECT n_chars, count(*) AS cnt FROM documents GROUP BY n_chars),
        |cum AS (SELECT n_chars, sum(cnt) OVER (ORDER BY n_chars) AS cum FROM c),
        |thr AS (SELECT min(n_chars) AS t FROM cum
        |        WHERE cum >= (SELECT ceil(0.99 * sum(cnt))::BIGINT FROM c))
        |SELECT doc_id, n_chars FROM documents
        |WHERE n_chars <= (SELECT t FROM thr)""".stripMargin,

    "x8_text_tokens" ->
      s"""SELECT doc_id, length(text) AS n_chars,
         |  len($toksSql) AS ws_tokens,
         |  len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS bpe_ish_tokens,
         |  CAST(ceil(length(text) / 4.0) AS BIGINT) AS est_tokens
         |FROM documents""".stripMargin,

    "x77_truncate_tokens" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS toks
        |  FROM documents)
        |SELECT doc_id, len(toks)::BIGINT AS n_tokens,
        |  array_to_string(toks[1:128], ' ') AS text_trunc,
        |  len(toks) > 128 AS truncated
        |FROM t""".stripMargin,

    "x9_text_quality" ->
      s"""WITH s AS (
         |  SELECT doc_id, text, len($toksSql) AS n_tokens,
         |    len(list_filter($toksSql, x -> list_contains($stopSql, x))) AS stops,
         |    CASE WHEN length(text) = 0 THEN 0.0
         |         ELSE (length(text) - length(regexp_replace(text, '[^A-Za-z0-9\\s]', '', 'g')))::DOUBLE
         |              / length(text) END AS pr
         |  FROM documents)
         |SELECT doc_id, n_tokens,
         |  round(CASE WHEN n_tokens = 0 THEN 0.0 ELSE stops::DOUBLE / n_tokens END, 6) AS stopword_ratio,
         |  round(pr, 6) AS punct_ratio,
         |  round(0.4 * least(1.0, n_tokens / 100.0)
         |      + 0.4 * least(1.0, (CASE WHEN n_tokens = 0 THEN 0.0 ELSE stops::DOUBLE / n_tokens END) * 5.0)
         |      + 0.2 * (1.0 - pr), 6) AS quality
         |FROM s""".stripMargin,

    "x10_lang_id" ->
      s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
         |s AS (SELECT doc_id,
         |  len(list_filter(toks, x -> list_contains(['der','die','das','und','ist','ein','eine','zu','mit','von'], x))) AS score_de,
         |  len(list_filter(toks, x -> list_contains($stopSql, x))) AS score_en,
         |  len(list_filter(toks, x -> list_contains(['el','los','las','que','y','en','un','una','por','como'], x))) AS score_es,
         |  len(list_filter(toks, x -> list_contains(['le','la','les','des','et','est','dans','pour','du','au'], x))) AS score_fr,
         |  0::BIGINT AS score_zh
         |  FROM t)
         |SELECT doc_id,
         |  CASE WHEN score_de = best AND best > 0 THEN 'de'
         |       WHEN score_en = best AND best > 0 THEN 'en'
         |       WHEN score_es = best AND best > 0 THEN 'es'
         |       WHEN score_fr = best AND best > 0 THEN 'fr'
         |       WHEN score_zh = best AND best > 0 THEN 'zh'
         |       ELSE 'und' END AS lang_pred,
         |  score_de, score_en, score_es, score_fr, score_zh
         |FROM (SELECT *, greatest(score_de, score_en, score_es, score_fr, score_zh) AS best FROM s)""".stripMargin,

    "x11_fingerprint_md5" ->
      "SELECT doc_id, md5(text) AS md5_fp FROM documents",

    "x12_fingerprint_rolling" -> OracleHashSql.rollingFingerprintSql,

    "x23_pii_scrub" ->
      """SELECT doc_id,
        |  regexp_replace(regexp_replace(text,
        |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '[(]?[0-9][0-9 ().-]{6,}[0-9]', '<PHONE>', 'g') AS scrubbed,
        |  (regexp_replace(regexp_replace(text,
        |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '[(]?[0-9][0-9 ().-]{6,}[0-9]', '<PHONE>', 'g') <> text) AS was_scrubbed
        |FROM documents""".stripMargin,

    "x13_corpus_stats" ->
      s"""SELECT source, count(*) AS n_docs,
         |  sum(len($toksSql))::BIGINT AS total_tokens,
         |  round(avg(length(text)), 4) AS avg_chars
         |FROM documents GROUP BY source""".stripMargin,

    "x29_top_tokens" ->
      s"""SELECT source, token, n, rank FROM (
         |  SELECT source, token, count(*) AS n,
         |    row_number() OVER (PARTITION BY source
         |      ORDER BY count(*) DESC, token ASC) AS rank
         |  FROM (SELECT source, unnest($toksSql) AS token FROM documents)
         |  GROUP BY source, token)
         |WHERE rank <= 10""".stripMargin,

    // When every returned count clears the N/(capacity+1) containment
    // bound, the sketch output IS the exact top-k; the TRUE literals
    // assert the bound held on the Spark side.
    "x32_top_tokens_sketch" ->
      s"""SELECT source, token, n, rank, TRUE AS heavy_guaranteed FROM (
         |  SELECT source, token, count(*) AS n,
         |    row_number() OVER (PARTITION BY source
         |      ORDER BY count(*) DESC, token ASC) AS rank
         |  FROM (SELECT source, unnest($toksSql) AS token FROM documents)
         |  GROUP BY source, token)
         |WHERE rank <= 10""".stripMargin,

    // Scores round to 6 decimals BEFORE the rank order, mirroring the
    // Spark side: ln() is not correctly rounded in either engine, so
    // ranking unrounded values could flip on a last-ulp disagreement.
    // The window frame is ROWS (not the RANGE default) — ordering is
    // unique per row so they agree, but ROWS says so explicitly.
    "x42_budget_select" ->
      s"""WITH s AS (
         |  SELECT doc_id, len($toksSql) AS n_tokens,
         |    len(list_filter($toksSql, x -> list_contains($stopSql, x))) AS stops,
         |    CASE WHEN length(text) = 0 THEN 0.0
         |         ELSE (length(text) - length(regexp_replace(text, '[^A-Za-z0-9\\s]', '', 'g')))::DOUBLE
         |              / length(text) END AS pr
         |  FROM documents),
         |q AS (
         |  SELECT doc_id, n_tokens,
         |    round(0.4 * least(1.0, n_tokens / 100.0)
         |        + 0.4 * least(1.0, (CASE WHEN n_tokens = 0 THEN 0.0 ELSE stops::DOUBLE / n_tokens END) * 5.0)
         |        + 0.2 * (1.0 - pr), 6) AS quality
         |  FROM s),
         |c AS (
         |  SELECT doc_id, quality, n_tokens,
         |    (sum(n_tokens) OVER (ORDER BY quality DESC, doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::BIGINT AS cum_tokens
         |  FROM q)
         |SELECT doc_id, quality, n_tokens, cum_tokens FROM c
         |WHERE cum_tokens <= $BudgetTokens""".stripMargin,

    // Two-stage rounding (per-token 6dp, avg 4dp) absorbs both engines'
    // ln() ulp skew and partition-order sum skew.
    "x44_unigram_logprob" ->
      s"""WITH t AS (
         |  SELECT doc_id, unnest($toksSql) AS token FROM documents),
         |cnt AS (SELECT token, count(*)::BIGINT AS c FROM t GROUP BY token),
         |n AS (SELECT sum(c)::BIGINT AS total FROM cnt),
         |s AS (
         |  SELECT doc_id, round(ln(cnt.c::DOUBLE / n.total::DOUBLE), 6) AS lp
         |  FROM t JOIN cnt USING (token) CROSS JOIN n)
         |SELECT doc_id, count(*)::BIGINT AS n_tokens,
         |  round(avg(lp), 4) AS avg_logprob
         |FROM s GROUP BY doc_id""".stripMargin,

    // The verdict compares the ROUNDED signals on both sides, so the
    // threshold decisions are made on identical doubles.
    "x45_gopher_rules" ->
      s"""WITH t AS (SELECT doc_id, text, $toksSql AS toks FROM documents),
         |b AS (
         |  SELECT doc_id, text, toks, len(toks)::BIGINT AS n_words,
         |    CASE WHEN len(toks) < 2 THEN []::VARCHAR[]
         |         ELSE list_transform(range(1, len(toks)),
         |                i -> toks[i] || ' ' || toks[i + 1]) END AS bis
         |  FROM t),
         |s AS (
         |  SELECT doc_id, n_words,
         |    round(CASE WHEN n_words = 0 THEN 0.0
         |      ELSE list_sum(list_transform(toks, x -> len(x)))::DOUBLE
         |           / n_words::DOUBLE END, 4) AS mean_word_len,
         |    round(CASE WHEN length(text) = 0 THEN 0.0
         |      ELSE (length(text) - length(regexp_replace(text, '[^A-Za-z0-9\\s]', '', 'g')))::DOUBLE
         |           / length(text)::DOUBLE END, 6) AS symbol_ratio,
         |    round(CASE WHEN n_words = 0 THEN 0.0
         |      ELSE len(list_filter(toks, x -> regexp_matches(x, '[a-z]')))::DOUBLE
         |           / n_words::DOUBLE END, 6) AS alpha_word_ratio,
         |    round(CASE WHEN len(bis) = 0 THEN 0.0
         |      ELSE (len(bis) - len(list_distinct(bis)))::DOUBLE
         |           / len(bis)::DOUBLE END, 6) AS dup_bigram_frac
         |  FROM b)
         |SELECT *,
         |  (n_words BETWEEN 50 AND 100000 AND mean_word_len BETWEEN 3 AND 10
         |   AND symbol_ratio < 0.1 AND alpha_word_ratio > 0.8
         |   AND dup_bigram_frac < 0.3) AS passes
         |FROM s""".stripMargin,

    "x39_tfidf_keywords" ->
      s"""WITH t AS (
         |  SELECT doc_id, unnest($toksSql) AS token FROM documents),
         |tf AS (
         |  SELECT doc_id, token, count(*)::BIGINT AS tf FROM t GROUP BY doc_id, token),
         |df AS (
         |  SELECT token, count(*)::BIGINT AS df FROM tf GROUP BY token),
         |n AS (SELECT count(DISTINCT doc_id)::BIGINT AS n_docs FROM tf),
         |s AS (
         |  SELECT tf.doc_id, tf.token, tf.tf, df.df,
         |    round(tf.tf * ln(n.n_docs::DOUBLE / df.df::DOUBLE), 6) AS tf_idf
         |  FROM tf JOIN df USING (token) CROSS JOIN n)
         |SELECT doc_id, rank, token, tf, df, tf_idf FROM (
         |  SELECT *, row_number() OVER (PARTITION BY doc_id
         |    ORDER BY tf_idf DESC, token ASC) AS rank
         |  FROM s)
         |WHERE rank <= 5""".stripMargin)
}
