package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Packing
import graft.sources.Sources.table

/** Sequence-packing queries (the pretraining bin-assignment step,
  * [[graft.operators.Packing]]). The oracle replays the greedy
  * first-fit-in-order recurrence with a recursive CTE walking each
  * bucket's doc_id order — bit-exact because bucket assignment, order,
  * and token counts are all integer-deterministic. */
object PackingQueries extends QueryPack {

  private val Budget = 512
  private val Buckets = 32
  private val ChunkWindow = 128
  private val ChunkOverlap = 16

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x35_pack_sequences" -> ((s: SparkSession, d: String) =>
      Packing.packSequences(table(s, d, "documents"), Budget, Buckets).toDF()),

    "x36_packing_summary" -> ((s: SparkSession, d: String) =>
      Packing.packingSummary(
        Packing.packSequences(table(s, d, "documents"), Budget, Buckets),
        Budget)),

    "x38_chunk_documents" -> ((s: SparkSession, d: String) =>
      Packing.chunkDocuments(table(s, d, "documents"), ChunkWindow, ChunkOverlap)))

  import OracleHashSql.toksSql

  /** Greedy packing as a recursive CTE: the working set holds one row
    * per bucket per step (the bucket's rn-th document with its running
    * (bin, acc) state), so recursion depth is max docs-per-bucket and
    * width is the bucket count. */
  private val packSql: String =
    s"""WITH RECURSIVE ord AS (
       |  SELECT doc_id, doc_id % $Buckets AS bucket,
       |    len($toksSql)::BIGINT AS n_tokens,
       |    row_number() OVER (PARTITION BY doc_id % $Buckets
       |                       ORDER BY doc_id) AS rn
       |  FROM documents),
       |pack AS (
       |  SELECT doc_id, bucket, n_tokens, rn,
       |    0::BIGINT AS bin, n_tokens AS acc
       |  FROM ord WHERE rn = 1
       |  UNION ALL
       |  SELECT o.doc_id, o.bucket, o.n_tokens, o.rn,
       |    CASE WHEN p.acc > 0 AND p.acc + o.n_tokens > $Budget
       |         THEN p.bin + 1 ELSE p.bin END,
       |    CASE WHEN p.acc > 0 AND p.acc + o.n_tokens > $Budget
       |         THEN o.n_tokens ELSE p.acc + o.n_tokens END
       |  FROM pack p JOIN ord o ON o.bucket = p.bucket AND o.rn = p.rn + 1)""".stripMargin

  override val oracleSql: Map[String, String] = Map(
    "x35_pack_sequences" ->
      s"""$packSql
         |SELECT doc_id, bucket, n_tokens, bin FROM pack""".stripMargin,

    "x36_packing_summary" ->
      s"""$packSql
         |SELECT bucket, bin, count(*) AS n_docs,
         |  sum(n_tokens)::BIGINT AS tokens,
         |  round(sum(n_tokens)::BIGINT / ${Budget.toDouble}, 6) AS fill
         |FROM pack GROUP BY bucket, bin""".stripMargin,

    // Chunk k covers 1-based token positions [k*stride + 1, k*stride + W]
    // (DuckDB list_slice is inclusive and clamps at the list end, matching
    // Spark's slice(start, length) truncation).
    "x38_chunk_documents" -> {
      val stride = ChunkWindow - ChunkOverlap
      s"""WITH t AS (
         |  SELECT doc_id, $toksSql AS toks FROM documents),
         |n AS (
         |  SELECT doc_id, toks, len(toks)::BIGINT AS n FROM t WHERE len(toks) > 0),
         |k AS (
         |  SELECT doc_id, toks, n,
         |    unnest(range(0, CASE WHEN n <= $ChunkWindow THEN 1
         |      ELSE (n - $ChunkWindow + $stride - 1) // $stride + 1 END)) AS k
         |  FROM n)
         |SELECT doc_id, k AS chunk_id, k * $stride AS start_tok,
         |  len(list_slice(toks, k * $stride + 1, k * $stride + $ChunkWindow))::BIGINT AS n_tokens,
         |  array_to_string(list_slice(toks, k * $stride + 1, k * $stride + $ChunkWindow), ' ') AS chunk_text
         |FROM k""".stripMargin
    })
}
