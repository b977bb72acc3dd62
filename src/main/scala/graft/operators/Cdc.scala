package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Changelog (CDC) apply: materialize the current snapshot of a keyed
  * entity from an upsert/tombstone log — the operator a training-data
  * pipeline uses to turn a mutable upstream store's change stream into
  * an immutable snapshot for curation. The reference's pipeline reads
  * static CSVs only (`agentic_workflow_transformation.py:239-247`), so
  * this is extension surface (SURVEY.md §2.2 X4 adjacency), but it is
  * the standard first step of any pipeline fed by an operational
  * database rather than files.
  *
  * Semantics: the latest log row per key — event-time order with the
  * unique sequence id as tiebreaker — decides the key's fate. A
  * tombstone op deletes the key (it is absent from the read view); any
  * other op upserts its payload. The materialized form is
  * [[compactLog]], which RETAINS latest-tombstone rows — exactly log
  * compaction's contract — because that is what makes incremental
  * maintenance associative: `compact(compact(A) ∪ B) = compact(A ∪ B)`
  * for ANY split of the log, even batches interleaved in event time
  * (proved in CdcSpec). Dropping tombstones eagerly would lose deletion
  * markers and resurrect keys when a stale batch arrives late.
  * [[applyChangelog]] is the read view: compact, then filter
  * tombstones.
  *
  * Scale shape: one `max_by` aggregation keyed on the entity key —
  * partial+final (max_by over the totally-ordered `(ts, seq)` struct is
  * merge-order-free), so map-side combine collapses each scan partition
  * to one row per key before the shuffle; no window sort over the log,
  * nothing driver-side. (The struct-typed buffer plans as
  * SortAggregate, not HashAggregate — still partial+final; the sort is
  * per-partition on the key, not a global window sort.) The incremental
  * path is what runs at 100 TB: per micro-batch/ingest increment, union
  * the (small) delta with the compacted snapshot and re-aggregate —
  * with both sides bucketed on the key (`sources.Bucketing`) the union
  * aggregates without a shuffle, which is the storage-side MERGE
  * pattern of a lakehouse table format, expressed as a plain keyed
  * aggregation. Tombstones older than every reader's checkpoint can be
  * swept by an occasional filter pass, mirroring compaction retention.
  */
object Cdc {

  private val DefaultPayload = Seq("event_id", "ts_us", "event_type", "value")

  /** Latest row per key with tombstones RETAINED — the materialized,
    * incrementally-maintainable form. `opCol` is always carried so the
    * read view can filter. */
  def compactLog(log: DataFrame, keyCol: String = "user_id",
                 tsCol: String = "ts_us", seqCol: String = "event_id",
                 opCol: String = "event_type",
                 payloadCols: Seq[String] = DefaultPayload): DataFrame =
    Events.latestSnapshot(log, keyCol, tsCol, seqCol,
                          (payloadCols :+ opCol).distinct)

  /** The read view of the full log: compact, then drop keys whose
    * latest op is the tombstone. */
  def applyChangelog(log: DataFrame, keyCol: String = "user_id",
                     tsCol: String = "ts_us", seqCol: String = "event_id",
                     opCol: String = "event_type", tombstone: String = "error",
                     payloadCols: Seq[String] = DefaultPayload): DataFrame =
    compactLog(log, keyCol, tsCol, seqCol, opCol, payloadCols)
      .filter(col(opCol) =!= tombstone)
      .select(col(keyCol) +: payloadCols.map(col): _*)

  /** Incremental maintenance: fold a new log batch into a compacted
    * snapshot. Compacted rows re-enter carrying their original
    * `(ts, seq)` — a delta row older than the compacted row correctly
    * loses, and a retained tombstone keeps deleting until something
    * newer upserts the key.
    *
    * SCHEMA EVOLUTION: either side may lack payload columns the other
    * has (state written before a column was appended to the log, or a
    * delta read under an older pinned schema) — missing columns
    * null-fill, so pre-evolution state migrates through the merge
    * instead of failing the union. A same-name TYPE conflict still
    * fails loudly (Spark's union refuses it; the log's append guard
    * rejects retyping upstream anyway). */
  def mergeCompacted(compacted: DataFrame, delta: DataFrame,
                     keyCol: String = "user_id", tsCol: String = "ts_us",
                     seqCol: String = "event_id", opCol: String = "event_type",
                     payloadCols: Seq[String] = DefaultPayload): DataFrame = {
    val names = keyCol +: (payloadCols :+ opCol).distinct
    def aligned(df: DataFrame): DataFrame = {
      val have = df.columns.toSet
      df.select(names.map(c => if (have(c)) col(c) else lit(null).as(c)): _*)
    }
    compactLog(aligned(compacted).unionByName(aligned(delta)),
               keyCol, tsCol, seqCol, opCol, payloadCols)
  }

  /** [[applyChangelog]]'s filter, for reading a compacted snapshot. */
  def readView(compacted: DataFrame, keyCol: String = "user_id",
               opCol: String = "event_type", tombstone: String = "error",
               payloadCols: Seq[String] = DefaultPayload): DataFrame =
    compacted.filter(col(opCol) =!= tombstone)
      .select(col(keyCol) +: payloadCols.map(col): _*)
}
