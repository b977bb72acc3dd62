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

  /** Streaming benchmark decontamination — the realistic ingest shape of
    * [[graft.operators.Dedup.decontaminate]]: the benchmark is a STATIC
    * frame (eval sets change rarely; its distinct span set is tiny vs the
    * corpus and broadcasts), the documents arrive as a stream, and each
    * emitted document is guaranteed to share no n-token span with the
    * benchmark.
    *
    * Shape: spans explode map-side (`explode_outer`, so span-less short
    * documents survive — they cannot be contaminated), candidate matches
    * come from a broadcast stream-static equi-join on the span, and a
    * watermark-bounded aggregation keyed by the full document row emits
    * it once the watermark passes — with null max(hit) meaning "no span
    * matched anywhere". State per document lives only to its watermark
    * horizon. At extreme scale the span strings would be joined by their
    * 64-bit hash (same note as the batch twin, Dedup.scala). */
  def decontaminate(docs: DataFrame, benchmark: DataFrame, n: Int = 8,
                    watermark: String = "10 minutes",
                    textCol: String = "text"): DataFrame = {
    import graft.functions.HashedShinglesFunctions.stringShingles
    val benchSpans = benchmark
      .select(explode(stringShingles(col(textCol), n)).as("span"))
      .distinct()
      .withColumn("__hit", lit(1))
    val docCols = docs.columns.toSeq
    docs
      .withWatermark("ingest_ts", watermark)
      .withColumn("span", explode_outer(stringShingles(col(textCol), n)))
      .join(broadcast(benchSpans), Seq("span"), "left_outer")
      .groupBy(docCols.map(col): _*)
      .agg(max(col("__hit")).as("__hits"))
      .filter(col("__hits").isNull)
      .drop("__hits")
  }

  /** Streaming repeated-span detection — the windowed face of
    * [[graft.operators.Dedup.repeatedSpans]]: n-token spans appearing in
    * ≥ minDocs documents within each ingest-time window (per-document
    * spans are distinct by construction, so count(*) is the document
    * frequency, exactly as in batch). One watermark-bounded shuffle on
    * (window, span); emitted when the watermark closes the window. */
  def repeatedSpans(docs: DataFrame, n: Int = 10, minDocs: Int = 2,
                    width: String = "1 hour",
                    watermark: String = "2 hours",
                    textCol: String = "text"): DataFrame = {
    import graft.functions.HashedShinglesFunctions.stringShingles
    docs
      .withWatermark("ingest_ts", watermark)
      .select(col("ingest_ts"), explode(stringShingles(col(textCol), n)).as("span"))
      .groupBy(window(col("ingest_ts"), width).as("w"), col("span"))
      .agg(count(lit(1)).as("n_docs"))
      .filter(col("n_docs") >= minDocs)
      .select(col("w.start").as("window_start"), col("span"), col("n_docs"))
  }

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
