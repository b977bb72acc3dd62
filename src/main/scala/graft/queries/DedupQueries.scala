package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.Dedup
import graft.sources.Sources.table

/** Dedup queries over `documents`/`embeddings` (X1 + near-dup variants).
  * Every variant is DuckDB-oracle checked: the portable ones with plain
  * SQL, MinHash/SimHash with [[OracleHashSql]] reproductions of the
  * FNV-1a/splitmix64 kernels (bit-exact in DuckDB's HUGEINT domain),
  * plus synthetic-corpus recall assertions in DedupSpec. */
object DedupQueries extends QueryPack {

  private val JaccardThreshold = 0.5
  private val CosineThreshold = 0.45

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x3_dedup_exact" -> ((s: SparkSession, d: String) =>
      Dedup.exactByText(table(s, d, "documents"))),

    "x4_dedup_ngram_jaccard" -> ((s: SparkSession, d: String) =>
      Dedup.ngramJaccardPairs(table(s, d, "documents"), "source", JaccardThreshold)
        .withColumn("jaccard", round(col("jaccard"), 4))),

    "x5_dedup_minhash" -> ((s: SparkSession, d: String) =>
      Dedup.minHashPairs(table(s, d, "documents"), JaccardThreshold)
        .withColumn("jaccard", round(col("jaccard"), 4))),

    "x6_dedup_simhash" -> ((s: SparkSession, d: String) =>
      Dedup.simHashPairs(table(s, d, "documents"), maxHamming = 3)),

    // Wide (128-bit) fingerprint: 32-bit chunk banding cuts the candidate
    // birthday term 2^16x — the sf1-measured fix for x6's quadratic
    // candidate growth; stricter relative-distance operating point.
    "x34_dedup_simhash_wide" -> ((s: SparkSession, d: String) =>
      Dedup.simHash128Pairs(table(s, d, "documents"), maxHamming = 3)),

    // Exact all-pairs baseline on a bounded slice (ids ≡ 0 mod 3): the
    // oracle anchor for the LSH/SemDeDup scale paths. The slice keeps the
    // O(n²) formulation inside embeddingPairs' operating-regime guard at
    // every SF — the full corpus belongs to x33's banded LSH.
    "x7_dedup_embedding" -> ((s: SparkSession, d: String) =>
      Dedup.embeddingPairs(
          table(s, d, "embeddings").filter(col("vec_id") % 3 === 0),
          CosineThreshold)
        .withColumn("cosine", round(col("cosine"), 6))),

    // The guard's escape hatch, oracle-checked: blocking by `label`
    // scopes the exact self-join to equal-label pairs (Σ|block|²/2 work,
    // co-located per block) — the formulation the guard points large
    // corpora at when near-dups can't cross a partition key.
    "x62_dedup_embedding_blocked" -> ((s: SparkSession, d: String) =>
      Dedup.embeddingPairs(table(s, d, "embeddings"), CosineThreshold,
                           blockCol = Some(col("label")))
        .withColumn("cosine", round(col("cosine"), 6))),

    "x24_dedup_clusters" -> ((s: SparkSession, d: String) =>
      Dedup.clusterPairs(
        Dedup.ngramJaccardPairs(table(s, d, "documents"), "source", JaccardThreshold)
          .select(col("id_a"), col("id_b")))),

    "x27_repeated_spans" -> ((s: SparkSession, d: String) =>
      Dedup.repeatedSpans(table(s, d, "documents"), n = 10, minDocs = 2)),

    // src19 stands in for a held-out benchmark: keep only documents
    // sharing no 8-token span with it (src19 drops itself, as must any
    // doc quoting it — e.g. the planted cross-source near-dups).
    "x30_decontaminate" -> ((s: SparkSession, d: String) => {
      val docs = table(s, d, "documents")
      Dedup.decontaminate(docs, docs.filter(col("source") === "src19"), n = 8)
        .select(col("doc_id"), col("source"))
    }),

    // Character-level near-dup pairs: same-source, Levenshtein ≤ 5 — the
    // tight typo/OCR regime the operator is designed for (d ≪ median doc
    // length; candidates from lossless length-band blocking). Loose
    // thresholds trip the operator's guard and belong to MinHash/SimHash.
    "x59_dedup_levenshtein" -> ((s: SparkSession, d: String) =>
      Dedup.levenshteinPairs(table(s, d, "documents"), maxDist = 5)),

    // Incremental ingest dedup: a re-delivered shard (ids ≡ 0 mod 3)
    // anti-joined by md5 fingerprint against the already-ingested corpus
    // (ids ≡ 0 mod 7) — the mod-21 overlap must drop (the fixture has no
    // cross-id exact dups, so the overlap IS the planted re-delivery).
    "x55_dedup_against" -> ((s: SparkSession, d: String) => {
      val docs = table(s, d, "documents")
      Dedup.dedupAgainst(docs.filter(col("doc_id") % 3 === 0),
                         docs.filter(col("doc_id") % 7 === 0))
        .select(col("doc_id"), col("source"))
    }),

    // x55's near-dup sibling on the SAME batch/history split: banded
    // MinHash candidates vs history, exact-Jaccard verified — catches the
    // re-ingests that changed a few tokens and so slip x55's md5 match.
    "x63_dedup_near_against" -> ((s: SparkSession, d: String) => {
      val docs = table(s, d, "documents")
      Dedup.minHashLshAgainst(docs.filter(col("doc_id") % 3 === 0),
                              docs.filter(col("doc_id") % 7 === 0),
                              JaccardThreshold)
        .select(col("doc_id"), col("source"))
    }),

    // Continuous contamination score (fraction of a doc's distinct
    // 8-token spans found in the src19 benchmark) — x30's threshold-free
    // companion.
    "x47_contamination_score" -> ((s: SparkSession, d: String) => {
      val docs = table(s, d, "documents")
      Dedup.contaminationScore(docs, docs.filter(col("source") === "src19"), n = 8)
    }))

  override val oracleSql: Map[String, String] = Map(
    "x3_dedup_exact" ->
      """SELECT min(doc_id) AS doc_id, md5(text) AS fingerprint,
        |  count(*) AS n_copies
        |FROM documents GROUP BY text""".stripMargin,

    "x4_dedup_ngram_jaccard" ->
      s"""WITH sh AS (
         |  SELECT doc_id, source,
         |    list_distinct(CASE WHEN len(toks) - 2 <= 0 THEN []::VARCHAR[]
         |      ELSE list_transform(range(1, len(toks) - 1),
         |             i -> array_to_string(list_slice(toks, i, i + 2), ' ')) END) AS s
         |  FROM (SELECT doc_id, source,
         |          list_filter(string_split_regex(lower(text), '\\s+'),
         |                      t -> t <> '') AS toks
         |        FROM documents))
         |SELECT id_a, id_b, round(jaccard, 4) AS jaccard FROM (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |    len(list_intersect(a.s, b.s))::DOUBLE
         |      / len(list_distinct(list_concat(a.s, b.s))) AS jaccard
         |  FROM sh a JOIN sh b ON a.source = b.source AND a.doc_id < b.doc_id)
         |WHERE jaccard >= $JaccardThreshold""".stripMargin,

    "x5_dedup_minhash" ->
      OracleHashSql.minHashPairsSql(JaccardThreshold, numHashes = 64, bands = 16),

    "x6_dedup_simhash" ->
      OracleHashSql.simHashPairsSql(maxHamming = 3),

    "x34_dedup_simhash_wide" ->
      OracleHashSql.simHash128PairsSql(maxHamming = 3),

    "x7_dedup_embedding" ->
      s"""SELECT id_a, id_b, round(cosine, 6) AS cosine FROM (
         |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         |    list_cosine_similarity(a.embedding::DOUBLE[],
         |                           b.embedding::DOUBLE[]) AS cosine
         |  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
         |  WHERE a.vec_id % 3 = 0 AND b.vec_id % 3 = 0)
         |WHERE cosine >= $CosineThreshold""".stripMargin,

    "x62_dedup_embedding_blocked" ->
      s"""SELECT id_a, id_b, round(cosine, 6) AS cosine FROM (
         |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         |    list_cosine_similarity(a.embedding::DOUBLE[],
         |                           b.embedding::DOUBLE[]) AS cosine
         |  FROM embeddings a JOIN embeddings b
         |    ON a.label = b.label AND a.vec_id < b.vec_id)
         |WHERE cosine >= $CosineThreshold""".stripMargin,

    "x24_dedup_clusters" ->
      s"""WITH RECURSIVE sh AS (
         |  SELECT doc_id, source,
         |    list_distinct(CASE WHEN len(toks) - 2 <= 0 THEN []::VARCHAR[]
         |      ELSE list_transform(range(1, len(toks) - 1),
         |             i -> array_to_string(list_slice(toks, i, i + 2), ' ')) END) AS s
         |  FROM (SELECT doc_id, source,
         |          list_filter(string_split_regex(lower(text), '\\s+'),
         |                      t -> t <> '') AS toks
         |        FROM documents)),
         |pairs AS (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
         |  FROM sh a JOIN sh b ON a.source = b.source AND a.doc_id < b.doc_id
         |  WHERE len(list_intersect(a.s, b.s))::DOUBLE
         |          / len(list_distinct(list_concat(a.s, b.s))) >= $JaccardThreshold),
         |edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
         |          UNION ALL SELECT id_b, id_a FROM pairs),
         |reach(src, dst) AS (
         |  SELECT src, dst FROM edges
         |  UNION
         |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src)
         |SELECT n.id AS doc_id, least(n.id, min(r.dst)) AS cluster_rep
         |FROM (SELECT DISTINCT src AS id FROM edges) n
         |  JOIN reach r ON r.src = n.id
         |GROUP BY n.id""".stripMargin,

    "x30_decontaminate" ->
      """WITH t AS (
        |  SELECT doc_id, source,
        |    list_filter(string_split_regex(lower(text), '\s+'),
        |                t -> t <> '') AS toks
        |  FROM documents),
        |sp AS (
        |  SELECT doc_id, source,
        |    unnest(list_distinct(CASE WHEN len(toks) - 7 <= 0 THEN []::VARCHAR[]
        |      ELSE list_transform(range(1, len(toks) - 6),
        |             i -> array_to_string(list_slice(toks, i, i + 7), ' ')) END)) AS span
        |  FROM t),
        |bench AS (SELECT DISTINCT span FROM sp WHERE source = 'src19'),
        |bad AS (SELECT DISTINCT sp.doc_id FROM sp JOIN bench USING (span))
        |SELECT doc_id, source FROM documents
        |WHERE doc_id NOT IN (SELECT doc_id FROM bad)""".stripMargin,

    // The length filter mirrors the engine's lossless blocking bound, so
    // both engines verify the identical candidate set.
    "x59_dedup_levenshtein" ->
      """SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  levenshtein(a.text, b.text)::BIGINT AS distance
        |FROM documents a JOIN documents b
        |  ON a.source = b.source AND a.doc_id < b.doc_id
        |  AND abs(length(a.text) - length(b.text)) <= 5
        |WHERE levenshtein(a.text, b.text) <= 5""".stripMargin,

    "x55_dedup_against" ->
      """SELECT doc_id, source FROM documents
        |WHERE doc_id % 3 = 0
        |  AND md5(text) NOT IN (SELECT md5(text) FROM documents
        |                        WHERE doc_id % 7 = 0)""".stripMargin,

    "x63_dedup_near_against" ->
      OracleHashSql.minHashAgainstSql(JaccardThreshold, numHashes = 64,
        bands = 16, newPred = id => s"$id % 3 = 0",
        seenPred = id => s"$id % 7 = 0"),

    "x47_contamination_score" ->
      """WITH t AS (
        |  SELECT doc_id, source,
        |    list_filter(string_split_regex(lower(text), '\s+'),
        |                t -> t <> '') AS toks
        |  FROM documents),
        |d AS (
        |  SELECT doc_id, source,
        |    list_distinct(CASE WHEN len(toks) - 7 <= 0 THEN []::VARCHAR[]
        |      ELSE list_transform(range(1, len(toks) - 6),
        |             i -> array_to_string(list_slice(toks, i, i + 7), ' ')) END) AS spans
        |  FROM t),
        |bench AS (SELECT DISTINCT unnest(spans) AS span FROM d WHERE source = 'src19'),
        |sp AS (SELECT doc_id, unnest(spans) AS span FROM d),
        |hits AS (SELECT doc_id, count(*) AS n_hits
        |         FROM sp JOIN bench USING (span) GROUP BY doc_id)
        |SELECT d.doc_id, len(d.spans)::BIGINT AS n_spans,
        |  coalesce(h.n_hits, 0)::BIGINT AS n_hits,
        |  round(CASE WHEN len(d.spans) = 0 THEN 0
        |        ELSE coalesce(h.n_hits, 0) / len(d.spans) END, 4) AS contamination
        |FROM d LEFT JOIN hits h USING (doc_id)""".stripMargin,

    // Same tokenization/shingling as the jaccard oracles, at n=10.
    "x27_repeated_spans" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(lower(text), '\s+'),
        |                t -> t <> '') AS toks
        |  FROM documents),
        |s AS (
        |  SELECT doc_id,
        |    unnest(list_distinct(CASE WHEN len(toks) - 9 <= 0 THEN []::VARCHAR[]
        |      ELSE list_transform(range(1, len(toks) - 8),
        |             i -> array_to_string(list_slice(toks, i, i + 9), ' ')) END)) AS span
        |  FROM t)
        |SELECT span, count(DISTINCT doc_id)::BIGINT AS n_docs
        |FROM s GROUP BY span HAVING count(DISTINCT doc_id) >= 2""".stripMargin)
}
