package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.IvfIndex

/** Streaming twins of the vector-serving surface: a continuous stream
  * of query vectors probes the persisted IVF index as it arrives —
  * the online half of the serving story, where [[IvfIndex.ingest]] is
  * the write half.
  *
  * Shape: `foreachBatch`, because a probe's bounded driver work
  * (manifest read, centroid fetch, probed-cell collect) happens per
  * micro-batch by design — each batch probes the INDEX AS OF that
  * moment, so a concurrent ingest/compact/rebuild is picked up at the
  * next batch boundary (the manifest flip is atomic; a batch never
  * sees a torn index).
  *
  * Replay safety: each batch writes its results to its OWN
  * `batch=<id>` directory with overwrite semantics, so a restarted
  * stream that re-delivers a batch rewrites the same directory with
  * the same deterministic content — duplicate-free output without a
  * dedup pass (the per-batch-directory idempotence recipe, not the
  * log's batch-tag one, because results are per-batch-partitioned
  * reads downstream, not one merged table).
  */
object VectorStreams {

  /** Serve a streaming frame of `(vec_id, embedding)` queries against
    * the index at `path`: exact rescore probes ([[IvfIndex.search]]),
    * the PQ/ADC layer ([[IvfIndex.searchAdc]]) when `pq = true`, or
    * the per-vector int8 layer ([[IvfIndex.searchSq8]]) when
    * `sq8 = true`; `pred` applies a candidate metadata filter inside
    * every batch's pruned scan (the index must store the attribute —
    * [[IvfIndex.build]]'s `attrs`). Results land under
    * `outPath/batch=<id>/` as parquet
    * `(query_id, neighbor_id, rank, score)`. */
  def serve(queries: DataFrame, path: String, outPath: String,
            checkpoint: String, k: Int, nprobe: Int,
            pq: Boolean = false, sq8: Boolean = false,
            pred: Option[org.apache.spark.sql.Column] = None): StreamingQuery =
    queries.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          val spark = batch.sparkSession
          val res =
            if (sq8) IvfIndex.searchSq8(spark, path, batch, k, nprobe,
                                        pred = pred)
            else if (pq) IvfIndex.searchAdc(spark, path, batch, k, nprobe,
                                            pred = pred)
            else IvfIndex.search(spark, path, batch, k, nprobe, pred = pred)
          res.write.mode("overwrite").parquet(s"$outPath/batch=$batchId")
        }
        ()
      }
      .start()

  /** Everything the stream has served so far, across batches. A stream
    * that has not yet written a batch (or an `outPath` not created yet)
    * reads as an EMPTY result with the serving schema — "nothing served
    * yet" is a normal state for a monitor polling a fresh stream, not
    * an AnalysisException. */
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
          "query_id BIGINT, neighbor_id BIGINT, rank BIGINT, score DOUBLE"))
    else
      spark.read
        .option("basePath", outPath)
        .parquet(outPath)
        .select(col("query_id"), col("neighbor_id"), col("rank"), col("score"))
  }
}
