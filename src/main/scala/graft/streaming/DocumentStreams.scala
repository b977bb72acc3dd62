package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

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

  /** Streaming near-dup ingest screen — the continuous face of
    * [[graft.operators.Dedup.minHashLshAgainst]]: history is a STATIC
    * corpus whose banded MinHash signature rows broadcast (at scale this
    * side IS the persisted signature index; the shingle arrays ride
    * along only for the exact verify and would become a candidate-only
    * text fetch); documents arrive as a stream; every emitted document
    * has no history near-dup with Jaccard ≥ `threshold`.
    *
    * Shape: stream-side signatures are stateless map work (fused shingle
    * kernel → 64-lane MinHash → per-band bucket hashes, `explode_outer`
    * so signature-less short documents survive); candidates come from a
    * broadcast stream-static equi-join on (band, bucket); the exact
    * sorted-shingle Jaccard verify runs inline on each candidate row —
    * a spurious band collision never drops a document; and a
    * watermark-bounded aggregation keyed by the full document row emits
    * it iff no candidate verified. State per document lives only to its
    * watermark horizon. */
  def nearDedupAgainst(docs: DataFrame, seen: DataFrame, threshold: Double,
                       numHashes: Int = 64, bands: Int = 16, n: Int = 3,
                       watermark: String = "10 minutes",
                       textCol: String = "text"): DataFrame = {
    import graft.functions.ArrayJaccardFunctions.sortedJaccard
    import graft.operators.Dedup
    require(numHashes % bands == 0, "bands must divide numHashes")
    require(threshold > 0.0 && threshold <= 1.0,
      s"jaccard threshold must be in (0, 1], got $threshold")
    val rowsPerBand = numHashes / bands
    def bandArray(sig: org.apache.spark.sql.Column) =
      array((0 until bands).map { b =>
        struct(lit(b).as("band"),
               xxhash64(lit(b), slice(sig, b * rowsPerBand + 1, rowsPerBand))
                 .as("bucket"))
      }: _*)
    val seenIdx = seen
      .select(Dedup.hashedShingles(col(textCol), n).as("sh_b"))
      .filter(size(col("sh_b")) > 0)
      .withColumn("__bb",
        explode(bandArray(Dedup.minHashSignature(col("sh_b"), numHashes))))
      .select(col("__bb.band").as("band"), col("__bb.bucket").as("bucket"),
              col("sh_b"))
    val docCols = docs.columns.toSeq
    docs
      .withWatermark("ingest_ts", watermark)
      .withColumn("__sh", Dedup.hashedShingles(col(textCol), n))
      .withColumn("__bb", explode_outer(when(size(col("__sh")) > 0,
        bandArray(Dedup.minHashSignature(col("__sh"), numHashes)))))
      .join(broadcast(seenIdx),
            col("__bb.band") === col("band") &&
              col("__bb.bucket") === col("bucket"),
            "left_outer")
      .withColumn("__hit",
        when(sortedJaccard(col("__sh"), col("sh_b")) >= threshold, 1))
      .groupBy(docCols.map(col): _*)
      .agg(max(col("__hit")).as("__hits"))
      .filter(col("__hits").isNull)
      .drop("__hits")
  }

  /** Streaming contamination scoring — the incremental face of
    * [[graft.operators.Dedup.contaminationScore]]: per arriving document,
    * the fraction of its distinct n-token spans found in the static
    * benchmark span set. Span totals ride along map-side (`size` of the
    * fused kernel — no second pass), matches come from the same
    * broadcast stream-static span join as [[decontaminate]], and the
    * watermark-bounded per-document aggregation emits one scored row per
    * doc. Unlike the binary drop, every document emits — score 0 when
    * nothing (or nothing scoreable) matched. */
  def contaminationScore(docs: DataFrame, benchmark: DataFrame, n: Int = 8,
                         watermark: String = "10 minutes",
                         textCol: String = "text",
                         idCol: String = "doc_id"): DataFrame = {
    import graft.functions.HashedShinglesFunctions.stringShingles
    val benchSpans = benchmark
      .select(explode(stringShingles(col(textCol), n)).as("span"))
      .distinct()
      .withColumn("__hit", lit(1))
    docs
      .withWatermark("ingest_ts", watermark)
      .select(col("ingest_ts"), col(idCol),
              size(stringShingles(col(textCol), n)).cast("long").as("n_spans"),
              explode_outer(stringShingles(col(textCol), n)).as("span"))
      .join(broadcast(benchSpans), Seq("span"), "left_outer")
      .groupBy(col("ingest_ts"), col(idCol), col("n_spans"))
      .agg(sum(col("__hit")).as("__hits"))
      .select(col(idCol), col("n_spans"),
        coalesce(col("__hits"), lit(0L)).as("n_hits"),
        round(when(col("n_spans") === 0L, 0d)
          .otherwise(coalesce(col("__hits"), lit(0L)).cast("double") /
                     col("n_spans").cast("double")), 4).as("contamination"))
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

  /** One emitted heavy-hitter candidate from [[heavyTokensSketch]]:
    * the true count in the (window, source) lies in [count_lb, count_ub];
    * `heavy_guaranteed` certifies count_lb alone clears the MG
    * containment threshold n_tokens/(capacity+1). */
  final case class HeavyHitter(window_start: java.sql.Timestamp, source: String,
                               token: String, count_lb: Long, count_ub: Long,
                               n_tokens: Long, heavy_guaranteed: Boolean)

  /** Streaming heavy-hitter tokens per (tumbling window, source) — the
    * online face of [[TextAnalysis.topTokensSketch]]: a Misra-Gries
    * sketch with the batch aggregator's exact update rule
    * ([[TextAnalysis.MisraGriesAgg.reduce]], reused directly) held in
    * `flatMapGroupsWithState` state and emitted once the watermark
    * closes the window.
    *
    * The batch twin's second exact-recount pass needs the corpus again,
    * which an unbounded stream cannot offer; the online deliverable is
    * the MG guarantee itself, which holds under ANY arrival order:
    * every token whose true count in the (window, source) exceeds
    * n/(capacity+1) is present in the emitted survivors, and each
    * survivor's true count lies in [count_lb, count_lb + n/(capacity+1)].
    * Rows with `heavy_guaranteed` are certified heavy from the lower
    * bound alone.
    *
    * Scale shape: state is O(capacity) counters per open (window,
    * source) group — never the window's vocabulary — and the shuffle
    * moves raw tokens once, partitioned by group key. At 100 TB the
    * per-executor state store holds (open windows × sources × capacity)
    * entries, bounded by the watermark horizon. */
  def heavyTokensSketch(docs: DataFrame, capacity: Int = 256,
                        width: String = "1 hour",
                        watermark: String = "2 hours",
                        groupCol: String = "source",
                        textCol: String = "text"): Dataset[HeavyHitter] = {
    val session = docs.sparkSession
    import session.implicits._
    val mg = new TextAnalysis.MisraGriesAgg(capacity)

    // (windowStartSec, windowEndSec, source, tokens, ingest_ts) rows; the
    // watermark on ingest_ts drives both window close and state timeout.
    // The raw ingest_ts column rides along untouched because Spark's
    // event-time-timeout checker requires a column still carrying the
    // watermark tag in the flatMapGroupsWithState input — casting w.start
    // to long (or even extracting w.end) strips that metadata.
    val rows = docs
      .withWatermark("ingest_ts", watermark)
      .select(window(col("ingest_ts"), width).as("w"),
              col(groupCol).cast("string").as("src"),
              TextAnalysis.tokens(col(textCol)).as("toks"),
              col("ingest_ts"))
      .select(col("w.start").cast("long").as("start_s"),
              col("w.end").cast("long").as("end_s"),
              col("src"), col("toks"), col("ingest_ts"))
      .as[(Long, Long, String, Seq[String], java.sql.Timestamp)]

    def emit(startS: Long, src: String,
             st: (Long, Map[String, Long], Long)): Iterator[HeavyHitter] = {
      val (_, items, n) = st
      val slack = n / (capacity + 1) // floor: the MG undercount bound
      items.iterator.map { case (tok, c) =>
        HeavyHitter(new java.sql.Timestamp(startS * 1000L), src, tok,
                    c, c + slack, n, c > slack)
      }
    }

    rows
      .groupByKey { case (startS, _, src, _, _) => (startS, src) }
      .flatMapGroupsWithState(
          OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: (Long, String),
         batch: Iterator[(Long, Long, String, Seq[String], java.sql.Timestamp)],
         state: GroupState[(Long, Map[String, Long], Long)]) =>
          if (state.hasTimedOut) {
            val out = state.getOption.map(emit(key._1, key._2, _))
              .getOrElse(Iterator.empty)
            state.remove()
            out
          } else {
            var endMs = 0L
            var sk = TextAnalysis.MGSketch(Map.empty)
            var n = 0L
            state.getOption.foreach { case (e, items, m) =>
              endMs = e; sk = TextAnalysis.MGSketch(items); n = m
            }
            batch.foreach { case (_, endS, _, toks, _) =>
              endMs = endS * 1000L
              toks.foreach { t => sk = mg.reduce(sk, t) }
              n += toks.size
            }
            state.update((endMs, sk.items, n))
            // Fire once the watermark passes the window end (must stay
            // strictly ahead of the current watermark or Spark rejects it).
            state.setTimeoutTimestamp(
              math.max(endMs, state.getCurrentWatermarkMs() + 1L))
            Iterator.empty
          }
      }
  }
}
