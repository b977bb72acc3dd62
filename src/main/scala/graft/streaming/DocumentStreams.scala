package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis

/** The training-data ingest pipeline as a stream: documents arrive
  * continuously (`doc_id, text, ingest_ts`), get quality-scored,
  * filtered, fingerprinted, and exact-deduped — the streaming face of
  * the batch operators in [[graft.operators.TextAnalysis]] /
  * [[graft.operators.Dedup]] (identical column logic, so a corpus can
  * be backfilled in batch and kept fresh by the stream).
  *
  * Scale notes: quality/fingerprint are stateless per-row column work;
  * dedup state is keyed by content fingerprint and bounded by the
  * watermark (`dropDuplicatesWithinWatermark`), so state size tracks the
  * dedup horizon, not the corpus. */
object DocumentStreams {

  /** quality-filter → md5 fingerprint → within-watermark exact dedup. */
  def cleanAndDedup(docs: DataFrame, minQuality: Double,
                    watermark: String = "10 minutes"): DataFrame =
    docs
      .withColumn("quality", TextAnalysis.qualityColumn(col("text")))
      .filter(col("quality") >= minQuality)
      .withColumn("fingerprint", md5(col("text")))
      .withWatermark("ingest_ts", watermark)
      .dropDuplicatesWithinWatermark("fingerprint")

  /** Normalization-insensitive streaming dedup: the fingerprint is an
    * *exact* hash of the lowercased whitespace-normalized token sequence,
    * so duplicates differing only in case/whitespace (which md5 misses)
    * still collapse — and nothing else does. A similarity-preserving
    * fingerprint (SimHash) must NOT be used as an exact dedup key here:
    * it is order-invariant and collision-by-design, so genuinely distinct
    * documents land on the same key and the stream silently drops real
    * data. Near-dup (hamming>0) detection stays a batch concern — the
    * banded join in [[graft.operators.Dedup.simHashPairs]]. */
  def dedupNormalized(docs: DataFrame, watermark: String = "10 minutes"): DataFrame =
    docs
      .withColumn("fingerprint",
        xxhash64(concat_ws(" ", graft.operators.Dedup.tokens(col("text")))))
      .withWatermark("ingest_ts", watermark)
      .dropDuplicatesWithinWatermark("fingerprint")

  /** Rolling per-source token throughput over tumbling windows — the
    * monitoring aggregate for an ingest stream. */
  def tokenThroughput(docs: DataFrame, width: String = "1 minute",
                      watermark: String = "5 minutes"): DataFrame =
    docs
      .withColumn("ws_tokens",
        size(TextAnalysis.tokens(col("text"))).cast("long"))
      .withWatermark("ingest_ts", watermark)
      .groupBy(window(col("ingest_ts"), width).as("w"), col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("ws_tokens")).as("tokens"))
      .select(col("w.start").as("window_start"), col("source"),
              col("n_docs"), col("tokens"))
}
