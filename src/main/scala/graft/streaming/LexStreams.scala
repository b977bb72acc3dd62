package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.{LexIndex, Retrieval}

/** Streaming twins of the LEXICAL and HYBRID serving surface — the
  * [[VectorStreams]] recipe applied to the inverted index: a
  * continuous stream of `(query_id, terms)` keyword queries probes the
  * persisted [[LexIndex]] (or the composed lexical+vector pair) as it
  * arrives, while [[LexIndex.ingest]] is the write half.
  *
  * Same shape and guarantees as the vector twin: `foreachBatch`
  * because a probe's bounded driver work (manifest read, probed-term
  * collect) happens per micro-batch by design — each batch probes the
  * index AS OF that moment (atomic manifest flip; a mid-stream
  * append/compact/rebuild is picked up whole at the next boundary),
  * and each batch overwrites its own `batch=<id>` directory, so
  * restart replay is idempotent without a dedup pass. */
object LexStreams {

  /** Serve a streaming frame of `(query_id, terms: array<string>)`
    * queries against the inverted index at `path`
    * ([[LexIndex.search]]); `pred` applies the candidate metadata
    * filter inside every batch's probe (the index must store the
    * attribute — [[LexIndex.build]]'s `attrs`). Results land under
    * `outPath/batch=<id>/` as parquet
    * `(query_id, doc_id, rank, score)`. */
  def serve(queries: DataFrame, path: String, outPath: String,
            checkpoint: String, k: Int,
            k1: Double = 1.2, b: Double = 0.75,
            pred: Option[Column] = None): StreamingQuery =
    queries.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          val spark = batch.sparkSession
          LexIndex.search(spark, path, batch, k, k1, b, pred)
            .write.mode("overwrite").parquet(s"$outPath/batch=$batchId")
        }
        ()
      }
      .start()

  /** Quoted-PHRASE serving, streaming: each batch's `(query_id,
    * phrase: array<string>)` queries run [[LexIndex.searchPhrase]]
    * against the POSITIONAL index as of the batch's manifest —
    * adjacency from stored position lists on the pruned candidate
    * rows, the batch twin's exact semantics per micro-batch. */
  def servePhrase(phrases: DataFrame, path: String, outPath: String,
                  checkpoint: String, k: Int,
                  k1: Double = 1.2, b: Double = 0.75,
                  pred: Option[Column] = None): StreamingQuery =
    phrases.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          val spark = batch.sparkSession
          LexIndex.searchPhrase(spark, path, batch, k, k1, b, pred)
            .write.mode("overwrite").parquet(s"$outPath/batch=$batchId")
        }
        ()
      }
      .start()

  /** SLOPPY-phrase serving, streaming: each batch's `(query_id,
    * phrase: array<string>)` queries run [[LexIndex.searchPhraseSloppy]]
    * — ordered chains within `slop` extra positions from the
    * positional index's stored position lists, per micro-batch. */
  def serveSloppy(phrases: DataFrame, path: String, outPath: String,
                  checkpoint: String, k: Int, slop: Int,
                  k1: Double = 1.2, b: Double = 0.75,
                  pred: Option[Column] = None): StreamingQuery =
    phrases.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          val spark = batch.sparkSession
          LexIndex.searchPhraseSloppy(spark, path, batch, k, slop, k1, b,
              pred)
            .write.mode("overwrite").parquet(s"$outPath/batch=$batchId")
        }
        ()
      }
      .start()

  /** PROXIMITY serving, streaming: each batch's `(query_id, terms)`
    * queries run [[LexIndex.searchProximity]] — all terms inside some
    * `window`-token run, answered from stored positions per
    * micro-batch. */
  def serveProximity(queries: DataFrame, path: String, outPath: String,
                     checkpoint: String, k: Int, window: Int,
                     k1: Double = 1.2, b: Double = 0.75,
                     pred: Option[Column] = None): StreamingQuery =
    queries.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          val spark = batch.sparkSession
          LexIndex.searchProximity(spark, path, batch, k, window, k1, b,
              pred)
            .write.mode("overwrite").parquet(s"$outPath/batch=$batchId")
        }
        ()
      }
      .start()

  /** BM25F serving, streaming: each batch's `(query_id, terms)`
    * queries run [[LexIndex.searchFielded]] against the FIELDED index
    * with the given probe-time weights, per micro-batch. */
  def serveFielded(queries: DataFrame, path: String, outPath: String,
                   checkpoint: String, k: Int,
                   weights: Seq[(String, Double)],
                   k1: Double = 1.2, b: Double = 0.75,
                   pred: Option[Column] = None): StreamingQuery =
    queries.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          val spark = batch.sparkSession
          LexIndex.searchFielded(spark, path, batch, k, weights, k1, b,
              pred)
            .write.mode("overwrite").parquet(s"$outPath/batch=$batchId")
        }
        ()
      }
      .start()

  /** FIELDED phrase serving, streaming: each batch's `(query_id,
    * phrase: array<string>)` queries run
    * [[LexIndex.searchPhraseFielded]] — "the phrase in the TITLE",
    * within-field adjacency from the fielded positional index, BM25F
    * scoring at the probe-time weights, per micro-batch. `slop`
    * switches to the ordered-within-slop chain
    * ([[LexIndex.searchPhraseSloppyFielded]]); slop 0 ≡ exact. */
  def serveFieldedPhrase(phrases: DataFrame, path: String, outPath: String,
                         checkpoint: String, k: Int,
                         weights: Seq[(String, Double)],
                         phraseField: String, slop: Int = 0,
                         k1: Double = 1.2, b: Double = 0.75,
                         pred: Option[Column] = None): StreamingQuery =
    phrases.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          val spark = batch.sparkSession
          (if (slop == 0)
             LexIndex.searchPhraseFielded(spark, path, batch, k, weights,
               phraseField, k1, b, pred)
           else
             LexIndex.searchPhraseSloppyFielded(spark, path, batch, k,
               weights, phraseField, slop, k1, b, pred))
            .write.mode("overwrite").parquet(s"$outPath/batch=$batchId")
        }
        ()
      }
      .start()

  /** The LITERAL-query hybrid, streaming — the production serving
    * sentence continuously: each batch's `(query_id, terms, embedding)`
    * queries (a FRESH embedding plus keywords, nothing stored) run
    * [[Retrieval.hybridServeLiteral]] against both indexes as of the
    * batch's manifests — zero corpus scans per batch, no
    * self-exclusion (external queries have no "self"). */
  def serveHybridLiteral(queries: DataFrame, lexPath: String,
                         ivfPath: String, outPath: String,
                         checkpoint: String, k: Int, depth: Int,
                         nprobe: Int, c: Int = 60,
                         pred: Option[Column] = None): StreamingQuery =
    queries.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          val spark = batch.sparkSession
          Retrieval.hybridServeLiteral(spark, lexPath, ivfPath, batch, k,
              depth, nprobe, c, pred)
            .write.mode("overwrite").parquet(s"$outPath/batch=$batchId")
        }
        ()
      }
      .start()

  /** The FIELDED hybrid, streaming: each batch's `(query_id, terms)`
    * queries run [[Retrieval.hybridServeFielded]] — BM25F lexical arm
    * at the given probe-time weights + the by-id vector arm,
    * RRF-fused against both indexes as of the batch's manifests. */
  def serveHybridFielded(queries: DataFrame, lexPath: String,
                         ivfPath: String, outPath: String,
                         checkpoint: String, k: Int, depth: Int,
                         nprobe: Int, weights: Seq[(String, Double)],
                         c: Int = 60,
                         pred: Option[Column] = None): StreamingQuery =
    queries.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          val spark = batch.sparkSession
          Retrieval.hybridServeFielded(spark, lexPath, ivfPath, batch, k,
              depth, nprobe, weights, c, pred)
            .write.mode("overwrite").parquet(s"$outPath/batch=$batchId")
        }
        ()
      }
      .start()

  /** The fully at-rest HYBRID probe, streaming: each batch's
    * `(query_id, terms)` queries run [[Retrieval.hybridServe]] —
    * lexical arm from the inverted index, vector arm from the
    * persisted IVF index by the query id's stored embedding,
    * RRF-fused — against both indexes as of the batch's manifests. */
  def serveHybrid(queries: DataFrame, lexPath: String, ivfPath: String,
                  outPath: String, checkpoint: String, k: Int, depth: Int,
                  nprobe: Int, c: Int = 60,
                  pred: Option[Column] = None): StreamingQuery =
    queries.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          val spark = batch.sparkSession
          Retrieval.hybridServe(spark, lexPath, ivfPath, batch, k, depth,
              nprobe, c, pred)
            .write.mode("overwrite").parquet(s"$outPath/batch=$batchId")
        }
        ()
      }
      .start()

  /** Everything the stream has served so far, across batches — empty
    * with the serving schema when no batch has landed yet (a normal
    * state for a monitor polling a fresh stream). */
  def served(spark: org.apache.spark.sql.SparkSession,
             outPath: String): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(outPath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val hasBatch = fs.exists(p) &&
      fs.listStatus(p).exists(_.getPath.getName.startsWith("batch="))
    if (!hasBatch)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType.fromDDL(
          "query_id BIGINT, doc_id BIGINT, rank BIGINT, score DOUBLE"))
    else
      spark.read
        .option("basePath", outPath)
        .parquet(outPath)
        .select(col("query_id"), col("doc_id"), col("rank"), col("score"))
  }
}
