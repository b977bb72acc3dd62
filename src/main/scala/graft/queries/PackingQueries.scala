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

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x35_pack_sequences" -> ((s: SparkSession, d: String) =>
      Packing.packSequences(table(s, d, "documents"), Budget, Buckets).toDF()),

    "x36_packing_summary" -> ((s: SparkSession, d: String) =>
      Packing.packingSummary(
        Packing.packSequences(table(s, d, "documents"), Budget, Buckets),
        Budget)))

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
         |FROM pack GROUP BY bucket, bin""".stripMargin)
}
