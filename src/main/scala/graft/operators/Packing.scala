package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Sequence packing — the pretraining-pipeline step that bins documents
  * into fixed token-budget training sequences (the reference's pipeline
  * stops at per-document transforms; packing is the step a user feeds
  * those documents into next).
  *
  * Semantics: documents are assigned to `buckets` deterministic streams
  * (`doc_id % buckets`), and within each bucket — in ascending doc_id
  * order — greedily packed first-fit-in-order: a document opens a new
  * bin when adding it would push the running token total past `budget`
  * (a document longer than the budget gets a bin of its own). The
  * result assigns every document a stable (bucket, bin) coordinate.
  *
  * Why this shape at 100 TB: greedy packing is a prefix recurrence
  * (`acc_i` depends on `acc_{i-1}` through a non-associative reset), so
  * it cannot be a window aggregate or a Catalyst expression — but it
  * NEVER needs global order either. Bucketing by `doc_id % buckets`
  * makes each stream independent: one shuffle on the bucket key, then a
  * sequential per-bucket scan that parallelizes across buckets (set
  * `buckets` ≳ executor cores; packing efficiency is unaffected because
  * greedy is local to a stream). `mapPartitions` is the honest tool for
  * the scan — the same class of inherently-ordered state as
  * sessionization, which Spark itself runs as a sort-based physical op.
  * Determinism: bucket assignment and in-bucket order are pure functions
  * of doc_id, so the output is bit-stable under any partitioning — and
  * exactly replayable by a recursive CTE
  * ([[graft.queries.PackingQueries]]).
  */
object Packing {

  /** One packed document: its stream, bin within the stream, and the
    * whitespace token count that drove the packing. */
  final case class PackedDoc(doc_id: Long, bucket: Long, n_tokens: Long, bin: Long)

  /** Greedy first-fit-in-order packing of `docs` into `buckets`
    * independent streams of ≤ `budget`-token bins.
    * Output: (doc_id, bucket, n_tokens, bin). */
  def packSequences(docs: DataFrame, budget: Int = 512, buckets: Int = 32,
                    textCol: String = "text",
                    idCol: String = "doc_id"): Dataset[PackedDoc] = {
    require(budget > 0, s"budget must be positive, got $budget")
    require(buckets > 0, s"buckets must be positive, got $buckets")
    val session = docs.sparkSession
    import session.implicits._
    docs
      .select(col(idCol).cast("long").as("doc_id"),
              (col(idCol).cast("long") % buckets).as("bucket"),
              size(Dedup.tokens(col(textCol))).cast("long").as("n_tokens"))
      .repartition(col("bucket"))
      .sortWithinPartitions("bucket", "doc_id")
      .as[(Long, Long, Long)]
      .mapPartitions { it =>
        // several buckets may share a partition; state resets on the
        // bucket boundary (rows arrive bucket-clustered by the sort)
        var curBucket = Long.MinValue
        var bin = 0L
        var acc = 0L
        it.map { case (id, b, nt) =>
          if (b != curBucket) { curBucket = b; bin = 0L; acc = 0L }
          if (acc > 0L && acc + nt > budget) { bin += 1L; acc = nt }
          else acc += nt
          PackedDoc(id, b, nt, bin)
        }
      }
  }

  /** Sliding-window document chunking — the context-window prep step
    * that splits long documents into ≤`window`-token chunks whose
    * starts advance by `window - overlap` tokens, so consecutive chunks
    * share `overlap` tokens of context. Chunk k of a document with n
    * tokens covers token positions [k·stride, min(k·stride + window, n));
    * the chunk count is 1 when n ≤ window and ⌈(n − window)/stride⌉ + 1
    * otherwise (the final chunk may be short but always holds the tail).
    * Zero-token documents emit no chunks.
    *
    * Scale shape: pure per-row column work — tokenize, explode a
    * `sequence` of chunk indices, `slice` the token array — no shuffle,
    * no UDF, fully codegen'd, so throughput is scan-bound. Output size
    * is input size × (1 + overlap/stride) in tokens; all arithmetic is
    * integer, so the DuckDB oracle replays it exactly. */
  def chunkDocuments(docs: DataFrame, window: Int = 128, overlap: Int = 0,
                     textCol: String = "text",
                     idCol: String = "doc_id"): DataFrame = {
    require(window > 0, s"window must be positive, got $window")
    require(overlap >= 0 && overlap < window,
            s"overlap must be in [0, window), got $overlap for window $window")
    val stride = window - overlap
    val toks = Dedup.tokens(col(textCol))
    val kMax = when(col("n") <= window, lit(0L))
      .otherwise(floor((col("n") - window + stride - 1) / lit(stride)).cast("long"))
    val start = col("k") * stride // 0-based first token position
    val chunk = slice(col("toks"), (start + 1).cast("int"), lit(window))
    docs
      .select(col(idCol).cast("long").as("doc_id"), toks.as("toks"),
              size(toks).cast("long").as("n"))
      .where(col("n") > 0)
      .select(col("doc_id"), col("toks"), col("n"),
              explode(sequence(lit(0L), kMax)).as("k"))
      .select(col("doc_id"), col("k").as("chunk_id"),
              start.as("start_tok"),
              size(chunk).cast("long").as("n_tokens"),
              concat_ws(" ", chunk).as("chunk_text"))
  }

  /** Bin-level summary of a packing: per (bucket, bin) the document
    * count, token total, and fill ratio against the budget — the
    * packing-efficiency report a pipeline operator watches. */
  def packingSummary(packed: Dataset[PackedDoc], budget: Int): DataFrame =
    packed.groupBy(col("bucket"), col("bin"))
      .agg(count(lit(1)).as("n_docs"),
           sum(col("n_tokens")).as("tokens"))
      .withColumn("fill", round(col("tokens") / lit(budget.toDouble), 6))

  /** Streaming packer — the ingest face of [[packSequences]]: documents
    * arrive continuously and each is assigned its (bucket, bin)
    * coordinate the moment it is seen. State per bucket is just the open
    * bin's (index, token total) — O(buckets) across the whole stream,
    * never evicted (a bucket's packing never "closes"; bins only grow
    * forward), so no watermark is needed and every input row emits
    * exactly one output row in the same micro-batch.
    *
    * Order contract: greedy packing is order-defined, and a stream's
    * order IS arrival order — within a micro-batch, ties break by
    * doc_id for determinism. Replayed in doc_id order it reproduces the
    * batch packing bit-for-bit (StreamBatchEquivalenceSpec); in live
    * ingest it packs the arrival permutation, which is the standard
    * online-packing semantics. */
  def packSequencesStream(docs: DataFrame, budget: Int = 512, buckets: Int = 32,
                          textCol: String = "text",
                          idCol: String = "doc_id"): Dataset[PackedDoc] = {
    require(budget > 0, s"budget must be positive, got $budget")
    require(buckets > 0, s"buckets must be positive, got $buckets")
    val session = docs.sparkSession
    import session.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    docs
      .select(col(idCol).cast("long").as("doc_id"),
              (col(idCol).cast("long") % buckets).as("bucket"),
              size(Dedup.tokens(col(textCol))).cast("long").as("n_tokens"))
      .as[(Long, Long, Long)]
      .groupByKey(_._2)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (bucket: Long, batch: Iterator[(Long, Long, Long)],
         state: GroupState[(Long, Long)]) =>
          var (bin, acc) = state.getOption.getOrElse((0L, 0L))
          val out = batch.toSeq.sortBy(_._1).map { case (id, _, nt) =>
            if (acc > 0L && acc + nt > budget) { bin += 1L; acc = nt }
            else acc += nt
            PackedDoc(id, bucket, nt, bin)
          }
          state.update((bin, acc))
          out.iterator
      }
  }
}
