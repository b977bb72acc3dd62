package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.Retrieval
import graft.sources.Sources.table

/** Lexical + hybrid retrieval queries (Retrieval.scala) over
  * `documents`/`embeddings`. BM25 replays in DuckDB because every input
  * is an exact integer (tf/dl/df/N; avgdl is one division of two exact
  * integers), the only library call is `ln` (±1 ulp, absorbed by
  * x39's rounding-before-rank), and the per-doc term sum folds
  * left-associatively in term order on BOTH sides (`aggregate ∘
  * array_sort` ≡ `list_reduce ∘ list(… ORDER BY term)`), so double
  * addition order — the one thing a distributed agg would not pin — is
  * fixed. RRF needs no rounding at all: 1/(c+rank) on integer ranks is
  * one correctly-rounded division and one exact-operand addition, so
  * the fused scores hash bit-identically unrounded. */
object RetrievalQueries extends QueryPack {

  private val K = 5
  private val Depth = 20
  private val RrfC = 60
  private val K1 = 1.2
  private val B = 0.75
  // the persisted IVF index's operating point (VectorQueries builds it
  // with 16 cells; its replay CTE bakes the same) — probe width here
  private val IvfNProbe = 4

  /** Fixed serving queries: term lists over the corpus vocabulary; for
    * the hybrid shape, query_id doubles as the vec_id whose stored
    * embedding is the vector arm's query (doc_id ≡ vec_id alignment). */
  private val BmQueries: Seq[(Long, Seq[String])] = Seq(
    0L -> Seq("spark", "join", "fast"),
    1L -> Seq("customer", "order", "table"),
    2L -> Seq("hash", "merge", "batch"),
    3L -> Seq("window", "scan", "slow"))

  private def queriesDf(s: SparkSession): DataFrame =
    s.createDataFrame(BmQueries).toDF("query_id", "terms")

  /** Persisted inverted index, materialized once per JVM per fixture
    * (the index-builder convention — stale on-disk state from an
    * earlier round is deleted first). */
  private val builtIndexes = scala.collection.mutable.HashSet.empty[String]
  private[queries] def lexIndexTable(s: SparkSession, d: String): String = synchronized {
    val path = new org.apache.hadoop.fs.Path(
      s.conf.get("spark.sql.warehouse.dir"),
      "graft_lex_index_" + d.replaceAll("[^A-Za-z0-9.]", "_")).toString
    if (!builtIndexes.contains(path)) {
      val p = new org.apache.hadoop.fs.Path(path)
      p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
      graft.operators.LexIndex.build(table(s, d, "documents"), path)
      builtIndexes += path
    }
    path
  }

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x98_bm25_topk" -> ((s: SparkSession, d: String) =>
      Retrieval.bm25TopK(table(s, d, "documents"), queriesDf(s), K,
        k1 = K1, b = B)),

    "x99_hybrid_rrf" -> ((s: SparkSession, d: String) =>
      Retrieval.hybridTopK(table(s, d, "documents"),
        table(s, d, "embeddings"), queriesDf(s), K, Depth, RrfC)),

    // The at-rest serving form: same queries, same oracle STRING as
    // x98 — the probe must hash-match the flat scan exactly (and the
    // shared oracle makes them interleaved bench twins).
    "x100_lex_index_search" -> ((s: SparkSession, d: String) =>
      graft.operators.LexIndex.search(s, lexIndexTable(s, d),
        queriesDf(s), K, k1 = K1, b = B)),

    // The fully at-rest hybrid probe: lexical arm from the inverted
    // index, vector arm from the persisted IVF index, RRF-fused — the
    // RAG probe with zero corpus scans (query vectors fetched by id,
    // so the vector arm self-excludes; the oracle replays both arms).
    "x101_hybrid_serve" -> ((s: SparkSession, d: String) =>
      graft.operators.Retrieval.hybridServe(s, lexIndexTable(s, d),
        VectorQueries.ivfIndexTable(s, d), queriesDf(s), K, Depth,
        IvfNProbe, RrfC)))

  private val toksSql =
    """list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '')"""

  private def qtValues(qs: Seq[(Long, Seq[String])]) = qs
    .flatMap { case (qid, ts) => ts.map(t => s"(${qid}::BIGINT, '$t')") }
    .mkString(",\n  ")

  /** The BM25 scoring CTEs shared by every retrieval oracle (x98/x99
    * and the NL twins' single-query variants): ranks documents by the
    * rounded score. Constants interpolate from the SAME Scala doubles
    * the operator uses (`Double.toString` round-trips, so DuckDB
    * parses the bit-identical value). */
  private def bm25Ctes(qs: Seq[(Long, Seq[String])]): String =
    s"""qt(query_id, term) AS (VALUES
       |  ${qtValues(qs)}),
       |toks AS (SELECT doc_id, unnest($toksSql) AS term FROM documents),
       |tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf
       |       FROM toks GROUP BY doc_id, term),
       |dl AS (SELECT doc_id, sum(tf)::BIGINT AS dl FROM tf GROUP BY doc_id),
       |stats AS (SELECT count(*)::BIGINT AS n, sum(dl)::BIGINT AS sum_dl FROM dl),
       |tfq AS (SELECT tf.* FROM tf
       |        JOIN (SELECT DISTINCT term FROM qt) USING (term)),
       |dft AS (SELECT term, count(*)::BIGINT AS df FROM tfq GROUP BY term),
       |contrib AS (
       |  SELECT qt.query_id, t.doc_id, t.term,
       |    ln((s.n::DOUBLE - d.df::DOUBLE + 0.5::DOUBLE)
       |         / (d.df::DOUBLE + 0.5::DOUBLE) + 1.0::DOUBLE)
       |      * (t.tf::DOUBLE * ${K1 + 1.0}::DOUBLE)
       |      / (t.tf::DOUBLE + ${K1}::DOUBLE
       |           * (${1.0 - B}::DOUBLE + ${B}::DOUBLE * l.dl::DOUBLE
       |                / (s.sum_dl::DOUBLE / s.n::DOUBLE))) AS contrib
       |  FROM tfq t JOIN dft d USING (term) JOIN dl l USING (doc_id)
       |       JOIN qt ON qt.term = t.term CROSS JOIN stats s),
       |sc AS (
       |  SELECT query_id, doc_id,
       |    round(list_reduce(list(contrib ORDER BY term), (a, x) -> a + x),
       |          6) AS score
       |  FROM contrib GROUP BY query_id, doc_id),
       |lex AS (
       |  SELECT query_id, doc_id, score, row_number() OVER (
       |    PARTITION BY query_id ORDER BY score DESC, doc_id ASC) AS rank
       |  FROM sc)""".stripMargin

  /** Full BM25 replay for any query set — shared with the NL twins. */
  private[queries] def bm25ReplaySql(qs: Seq[(Long, Seq[String])],
                                     k: Int): String =
    s"""WITH ${bm25Ctes(qs)}
       |SELECT query_id, doc_id, rank, score FROM lex
       |WHERE rank <= $k""".stripMargin

  /** Full hybrid (BM25 ∪ cosine, RRF) replay for any query set. */
  private[queries] def hybridReplaySql(qs: Seq[(Long, Seq[String])],
                                       k: Int, depth: Int): String =
    s"""WITH ${bm25Ctes(qs)},
       |vec AS (
       |  SELECT q.vec_id AS query_id, c.vec_id AS doc_id,
       |    row_number() OVER (PARTITION BY q.vec_id
       |      ORDER BY list_cosine_similarity(q.embedding::DOUBLE[],
       |                                      c.embedding::DOUBLE[]) DESC,
       |               c.vec_id ASC) AS rank
       |  FROM embeddings q CROSS JOIN embeddings c
       |  WHERE q.vec_id IN (SELECT DISTINCT query_id FROM qt)),
       |fused AS (
       |  SELECT coalesce(l.query_id, v.query_id) AS query_id,
       |    coalesce(l.doc_id, v.doc_id) AS doc_id,
       |    coalesce(1.0::DOUBLE / (${RrfC.toDouble}::DOUBLE + l.rank::DOUBLE),
       |             0.0::DOUBLE)
       |    + coalesce(1.0::DOUBLE / (${RrfC.toDouble}::DOUBLE + v.rank::DOUBLE),
       |               0.0::DOUBLE) AS score
       |  FROM (SELECT * FROM lex WHERE rank <= $depth) l
       |  FULL OUTER JOIN (SELECT * FROM vec WHERE rank <= $depth) v
       |    ON l.query_id = v.query_id AND l.doc_id = v.doc_id)
       |SELECT query_id, doc_id, rank, score FROM (
       |  SELECT *, row_number() OVER (PARTITION BY query_id
       |    ORDER BY score DESC, doc_id ASC) AS rank
       |  FROM fused)
       |WHERE rank <= $k""".stripMargin

  /** The at-rest hybrid replay: both arms' existing replays (BM25 and
    * the IVF Lloyd replay with its probed-cell candidate restriction)
    * as nested-WITH sub-CTEs, RRF-fused — approximation is no obstacle
    * because every choice in both arms is deterministic and already
    * oracle-proven separately. The vector arm self-excludes (the
    * fetched-by-id serving semantics; the candidate CTE already does). */
  private def hybridServeReplaySql(qs: Seq[(Long, Seq[String])],
                                   k: Int, depth: Int, nprobe: Int): String = {
    val idPred = s"vec_id IN (${qs.map(_._1).mkString(", ")})"
    s"""WITH lexr AS (
       |${bm25ReplaySql(qs, depth)}
       |),
       |vecr AS (
       |${VectorQueries.ivfReplaySqlFor(idPred, nprobe, depth)}
       |),
       |hfused AS (
       |  SELECT coalesce(l.query_id, v.query_id) AS query_id,
       |    coalesce(l.doc_id, v.doc_id) AS doc_id,
       |    coalesce(1.0::DOUBLE / (${RrfC.toDouble}::DOUBLE + l.rank::DOUBLE),
       |             0.0::DOUBLE)
       |    + coalesce(1.0::DOUBLE / (${RrfC.toDouble}::DOUBLE + v.rank::DOUBLE),
       |               0.0::DOUBLE) AS score
       |  FROM lexr l
       |  FULL OUTER JOIN (SELECT query_id, neighbor_id AS doc_id, rank
       |                   FROM vecr) v
       |    ON l.query_id = v.query_id AND l.doc_id = v.doc_id)
       |SELECT query_id, doc_id, rank, score FROM (
       |  SELECT *, row_number() OVER (PARTITION BY query_id
       |    ORDER BY score DESC, doc_id ASC) AS rank
       |  FROM hfused)
       |WHERE rank <= $k""".stripMargin
  }

  override val oracleSql: Map[String, String] = Map(
    "x98_bm25_topk"  -> bm25ReplaySql(BmQueries, K),
    "x99_hybrid_rrf" -> hybridReplaySql(BmQueries, K, Depth),
    // identical string to x98's — the index stores tf/dl/N/Σdl as exact
    // integers and scores through the same tail, so the replay is the
    // same SQL (and the driver's twin grouping interleaves the pair)
    "x100_lex_index_search" -> bm25ReplaySql(BmQueries, K),
    "x101_hybrid_serve" ->
      hybridServeReplaySql(BmQueries, K, Depth, IvfNProbe))
}
