package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.Similarity
import graft.sources.Sources.table

/** Similarity-search queries over the `embeddings` table (X2).
  * Brute-force top-k is oracle-checked against DuckDB's
  * `list_cosine_similarity` (both sides accumulate sequentially in double
  * precision → bit-identical scores, verified in VectorFunctionsSpec). The
  * LSH variant is approximate by construction, so it gets the rows-only
  * check plus recall assertions in its spec. */
object VectorQueries extends QueryPack {

  private val K = 5
  private val NQueries = 8

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x1_ann_bruteforce" -> ((s: SparkSession, d: String) => {
      val emb = table(s, d, "embeddings")
      Similarity.bruteForceTopK(
          emb.filter(col("vec_id") < NQueries), emb, K)
        .withColumn("score", round(col("score"), 6))
    }),

    "x2_ann_lsh" -> ((s: SparkSession, d: String) => {
      val emb = table(s, d, "embeddings")
      Similarity.lshTopK(emb.filter(col("vec_id") < NQueries), emb, K)
        .withColumn("score", round(col("score"), 6))
    }),

    "x20_ann_ivf" -> ((s: SparkSession, d: String) => {
      val emb = table(s, d, "embeddings")
      Similarity.ivfTopK(emb.filter(col("vec_id") < NQueries), emb, K)
        .withColumn("score", round(col("score"), 6))
    }))

  override val oracleSql: Map[String, String] = Map(
    "x1_ann_bruteforce" ->
      s"""SELECT query_id, neighbor_id, rank, round(score, 6) AS score FROM (
         |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         |    row_number() OVER (PARTITION BY q.vec_id
         |      ORDER BY list_cosine_similarity(q.embedding::DOUBLE[],
         |                                      c.embedding::DOUBLE[]) DESC,
         |               c.vec_id ASC) AS rank,
         |    list_cosine_similarity(q.embedding::DOUBLE[],
         |                           c.embedding::DOUBLE[]) AS score
         |  FROM embeddings q CROSS JOIN embeddings c
         |  WHERE q.vec_id < $NQueries AND c.vec_id <> q.vec_id)
         |WHERE rank <= $K""".stripMargin)
    // x2_ann_lsh / x20_ann_ivf: approximate — no portable SQL oracle;
    // rows-only checks + recall/subset assertions in VectorFunctionsSpec.
}
