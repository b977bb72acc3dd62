package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.{DataFrame, Dataset}

/** Structured Streaming formulations of the event-time operators
  * (SURVEY.md §2.2 X4; the reference is strictly batch, so this is pure
  * extension surface). The batch operators in
  * [[graft.operators.Events]] and these streaming ones share semantics:
  * identical window/gap rules, so a pipeline can be validated in batch and
  * deployed streaming.
  *
  * Scale notes: watermarks bound state (late data beyond the watermark is
  * dropped, state for closed windows/sessions is evicted); the stateful
  * sessionizer keys state by user so it distributes with the shuffle; all
  * aggregations are incremental (no per-trigger rescans).
  */
object EventStreams extends Serializable {

  final case class Event(event_id: Long, ts: Timestamp, user_id: Long,
                         event_type: String, value: Double)

  final case class SessionSummary(user_id: Long, session_start: Timestamp,
                                  session_end: Timestamp, n_events: Long,
                                  total_value: Double)

  /** Tumbling event-time window counts with a watermark. */
  def tumblingCounts(events: DataFrame, width: String = "1 hour",
                     watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), width).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
           round(sum(col("value")), 2).as("total_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
              col("n_events"), col("total_value"))

  /** Sliding event-time window counts — same incremental state-store
    * aggregation as tumbling; each event updates width/slide open
    * windows. */
  def slidingCounts(events: DataFrame, width: String = "1 hour",
                    slide: String = "15 minutes",
                    watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), width, slide).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
           round(sum(col("value")), 2).as("total_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
              col("n_events"), col("total_value"))

  /** Native streaming session windows (state-store merged). */
  def sessionWindowCounts(events: DataFrame, gapMinutes: Int = 30,
                          watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), s"$gapMinutes minutes").as("sw"),
               col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("sw.start").as("session_start"),
              col("sw.end").as("session_end"), col("n_events"))

  /** Streaming latest-wins snapshot — the incremental twin of
    * [[graft.operators.Events.latestSnapshot]]: one row per user, the
    * event with the max (ts, event_id), maintained by the same
    * declarative `max_by` the batch side uses so the state per key is one
    * candidate row (not the log). Run in `complete` mode against a memory
    * sink for a queryable snapshot, or `update` mode against an upsert
    * sink (the production shape — state is bounded by the key space
    * either way, which is what makes a changelog→snapshot view viable on
    * an unbounded stream). No watermark: a snapshot has no notion of
    * "too late", later data always wins by timestamp. */
  def latestSnapshot(events: DataFrame): DataFrame =
    events
      .groupBy(col("user_id"))
      .agg(max_by(
        struct(col("event_id"), col("ts"), col("event_type"), col("value")),
        struct(col("ts"), col("event_id"))).as("latest"))
      .select(col("user_id"), col("latest.event_id").as("event_id"),
              col("latest.ts").as("ts"), col("latest.event_type").as("event_type"),
              col("latest.value").as("value"))

  /** Streaming CDC read view — the incremental twin of
    * [[graft.operators.Cdc.applyChangelog]]: the latest-wins compacted
    * snapshot ([[latestSnapshot]], which retains the op column exactly so
    * this filter can run downstream of it) minus keys whose latest op is
    * the tombstone. Correct in `complete` mode against a memory/queryable
    * sink: each trigger re-emits the full surviving key set, so a key
    * that transitions TO the tombstone simply drops out. In `update`
    * mode this filtered form would emit nothing for such a transition —
    * an upsert sink would keep the stale row — so the production upsert
    * shape consumes the UNfiltered [[latestSnapshot]] stream and maps
    * latest-op = tombstone to a sink-side DELETE, mirroring the batch
    * split between [[graft.operators.Cdc.compactLog]] (materialized,
    * tombstones retained) and [[graft.operators.Cdc.readView]]. */
  def cdcReadView(events: DataFrame, tombstone: String = "error"): DataFrame =
    latestSnapshot(events).filter(col("event_type") =!= tombstone)

  /** Continuous ingest into the day-partitioned log layout — the
    * streaming twin of [[graft.operators.Events.writeDayPartitioned]]:
    * each micro-batch appends files under `dt=yyyy-MM-dd` directories,
    * so the accumulating tree is exactly what
    * [[graft.operators.Events.loadRangePartitioned]] directory-prunes.
    * The file sink's commit log makes the append exactly-once across
    * restarts. `dt` derives from EVENT time, so a late event lands in
    * its own (closed) day's directory as a new file instead of
    * rewriting anything — the append-only property that keeps per-day
    * compaction and pruned readers safe to run concurrently with
    * ingest. `dt` derives timezone-independently ([[graft.operators.Events.utcDt]])
    * so the directories agree with the batch writer and the UTC range
    * reader under any session timezone. */
  def ingestDayPartitioned(events: DataFrame, path: String,
                           checkpoint: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    events
      .withColumn("dt", graft.operators.Events.utcDt(col("ts")))
      .writeStream
      .format("parquet")
      .option("path", path)
      .option("checkpointLocation", checkpoint)
      .partitionBy("dt")
      .outputMode(OutputMode.Append())
      .start()

  /** Streaming CONSUMER twin of
    * [[graft.operators.Events.loadRangePartitioned]]: a `readStream`
    * tail of a day-partitioned log from `fromUs` onward, with the same
    * two-level pruning the batch reader gets — the `dt` bounds prune
    * day partitions inside each micro-batch's scan and the range
    * predicate lands on the NATIVE `ts` column
    * ([[graft.operators.Events.timeRange]]) so parquet row groups prune
    * too — then the same normalization, so batch and streaming reads of
    * the same tree are row-identical over `[fromUs, toUs)`.
    *
    * New files appended by [[ingestDayPartitioned]] (or a batch append)
    * surface in later micro-batches; when the tree is an ACTIVE file
    * sink (`_spark_metadata` present), the source reads the sink's
    * commit log, so the tail sees exactly the committed files —
    * end-to-end exactly-once from ingest to tail. The upper bound
    * defaults to the largest µs [[graft.operators.Events.timeRange]]
    * can push without overflow, i.e. effectively unbounded.
    * `maxFilesPerTrigger` bounds each micro-batch's file count — a
    * fresh tail over a deep history otherwise swallows the entire
    * backlog as ONE batch (at 100 TB: one executor-flattening scan);
    * bounded, the backlog drains as a sequence of right-sized batches
    * before the tail goes steady-state. */
  def tailDayPartitioned(spark: org.apache.spark.sql.SparkSession,
                         path: String, fromUs: Long,
                         toUs: Long = Long.MaxValue / 1000L,
                         maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    // file sources need an explicit schema; probe it with a batch read
    // (footer-only — no data scan)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.parquet(path).schema
    val fromDt = graft.operators.Events.usLocalDateTime(fromUs)
      .toLocalDate.toString
    val toDt = graft.operators.Events.usLocalDateTime(toUs - 1L)
      .toLocalDate.toString
    val reader = spark.readStream.schema(schema)
    maxFilesPerTrigger.foreach(n =>
      reader.option("maxFilesPerTrigger", n.toString))
    val pruned = reader.parquet(path)
      .filter(col("dt") >= fromDt && col("dt") <= toDt)
    graft.operators.Events.normalizeEventTime(
      graft.operators.Events.timeRange(pruned, fromUs, toUs)).drop("dt")
  }

  /** Epoch microseconds of a Timestamp. `getTime` alone truncates to
    * milliseconds, which would make the streaming gap rule disagree with
    * the µs-exact batch [[graft.operators.Events.sessionize]] on data with
    * sub-millisecond timestamps (the events fixture carries nanos). */
  private[streaming] def micros(t: Timestamp): Long =
    Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L

  private[streaming] def microsToTs(us: Long): Timestamp = {
    val t = new Timestamp(Math.floorDiv(us, 1000000L) * 1000L)
    t.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
    t
  }

  /** Custom stateful sessionizer via flatMapGroupsWithState — the escape
    * hatch for session semantics `session_window` can't express (here:
    * emitting event-count and value totals per closed session, with
    * event-time timeout eviction). Emits a session when a subsequent event
    * arrives ≥ gap later, or when the group times out past the watermark.
    *
    * Gap arithmetic is in epoch *microseconds* and totals round with the
    * same HALF_UP rule as Spark's `round()`, so session structure (user,
    * start/end µs, event count) is bit-identical to the batch twin
    * [[graft.operators.Events.sessionize]] and totals agree exactly on
    * the fixture (`StreamBatchEquivalenceSpec`); a total could still
    * differ in the last ulp pre-rounding when the batch sum's merge order
    * differs, which only shows if the sum lands exactly on a .005
    * boundary. */
  def statefulSessionize(events: Dataset[Event], gapMinutes: Int = 30,
                         watermark: String = "1 hour"): Dataset[SessionSummary] = {
    import events.sparkSession.implicits._
    val gapUs = gapMinutes * 60L * 1000000L

    final case class Open(startUs: Long, lastUs: Long, n: Long, total: Double)
    // Spark's round() on doubles is BigDecimal.valueOf(_).setScale(2,
    // HALF_UP); replicate it exactly (math.rint is half-even — it disagreed
    // with the batch twin on totals landing on a .005 boundary).
    def round2(v: Double): Double =
      java.math.BigDecimal.valueOf(v)
        .setScale(2, java.math.RoundingMode.HALF_UP).doubleValue()
    def summary(userId: Long, s: Open): SessionSummary =
      SessionSummary(userId, microsToTs(s.startUs), microsToTs(s.lastUs),
                     s.n, round2(s.total))

    def update(userId: Long, batch: Iterator[Event],
               state: GroupState[(Long, Long, Long, Double)]): Iterator[SessionSummary] = {
      def toOpen(t: (Long, Long, Long, Double)) = Open(t._1, t._2, t._3, t._4)
      if (state.hasTimedOut) {
        val out = state.getOption.map(t => summary(userId, toOpen(t))).iterator
        state.remove()
        out
      } else {
        val sorted = batch.toSeq.sortBy(e => (micros(e.ts), e.event_id))
        var closed = List.empty[SessionSummary]
        var cur = state.getOption.map(toOpen)
        sorted.foreach { e =>
          val t = micros(e.ts)
          cur match {
            case Some(s) if t - s.lastUs >= gapUs =>
              closed ::= summary(userId, s)
              cur = Some(Open(t, t, 1, e.value))
            case Some(s) =>
              cur = Some(Open(s.startUs, t, s.n + 1, s.total + e.value))
            case None =>
              cur = Some(Open(t, t, 1, e.value))
          }
        }
        cur match {
          case Some(s) =>
            state.update((s.startUs, s.lastUs, s.n, s.total))
            // timeout API is millis; round up so it never fires before the
            // µs-exact gap boundary
            state.setTimeoutTimestamp(Math.floorDiv(s.lastUs + gapUs + 999L, 1000L))
          case None => ()
        }
        closed.reverse.iterator
      }
    }

    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(update)
  }

  final case class FunnelResult(user_id: Long, first_from_us: Long,
                                first_to_us: Option[Long], converted: Boolean)

  final case class RetentionCell(user_id: Long, cohort_week: Long,
                                 weeks_since: Long)

  /** Streaming cohort retention — the incremental twin of
    * [[graft.operators.Events.cohortRetention]]: per user, emit one cell
    * the first time the user is active `weeks_since` epoch-weeks after
    * their first event (cohort_week = epoch-week of that first event).
    * Aggregating the emitted cells per (cohort_week, weeks_since) gives
    * the batch retention matrix incrementally.
    *
    * State per user: the first-seen timestamp (the funnel twin's shape)
    * plus a BITSET of weeks already emitted — exactly 16 bytes per user,
    * keyed to the `horizonWeeks` retention horizon (≤ 64 so the bitset is
    * one long), never the log. State lifetime is bounded the way
    * [[statefulFunnel]]'s is: an event-time timeout evicts the user once
    * the horizon closes (first + horizonWeeks weeks past the watermark) —
    * no cell can emit after that, so eviction is lossless; a user
    * returning later re-enters as a NEW cohort (re-acquisition
    * semantics, documented).
    *
    * Same micro-batch discipline as the funnel: `first` settles over the
    * whole sorted batch before cells are computed, so a same-batch event
    * pair can never see a stale first-timestamp. Cross-batch the cohort
    * base is FROZEN at first sight: a later-arriving earlier first event
    * no longer silently re-bases cohort_week/weeks_since under already-
    * emitted cells (the double-count the old Seq formulation allowed) —
    * events before the frozen base are skipped, the same
    * within-watermark-order trade the funnel makes, now fail-safe
    * instead of fail-corrupt. */
  def statefulCohortCells(events: Dataset[Event],
                          horizonWeeks: Int = 64,
                          watermark: String = "1 hour"): Dataset[RetentionCell] = {
    import events.sparkSession.implicits._
    require(horizonWeeks > 0 && horizonWeeks <= 64,
      s"horizonWeeks must be in 1..64 (one-long bitset): $horizonWeeks")
    val weekUs = 7L * 24 * 3600 * 1000000L

    def update(userId: Long, batch: Iterator[Event],
               state: GroupState[(Long, Long)]): Iterator[RetentionCell] = {
      if (state.hasTimedOut) {
        // horizon closed: every emittable cell has emitted; drop the state
        state.remove()
        Iterator.empty
      } else {
        val sorted = batch.toSeq.sortBy(e => (micros(e.ts), e.event_id))
        val existing = state.getOption
        var first = existing.map(_._1).getOrElse(Long.MaxValue)
        if (existing.isEmpty)
          sorted.foreach { e => val t = micros(e.ts); if (t < first) first = t }
        var seenBits = existing.map(_._2).getOrElse(0L)
        val cohort = Math.floorDiv(first, weekUs)
        val out = List.newBuilder[RetentionCell]
        sorted.foreach { e =>
          val w = Math.floorDiv(micros(e.ts) - first, weekUs)
          if (w >= 0 && w < horizonWeeks && (seenBits & (1L << w)) == 0L) {
            seenBits |= 1L << w
            out += RetentionCell(userId, cohort, w)
          }
        }
        state.update((first, seenBits))
        // evict when the horizon closes in event time (timeout API is
        // millis and must sit past the current watermark)
        val horizonEndMs =
          Math.floorDiv(first + horizonWeeks.toLong * weekUs + 999L, 1000L)
        state.setTimeoutTimestamp(
          math.max(horizonEndMs, state.getCurrentWatermarkMs() + 1L))
        out.result().iterator
      }
    }

    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(update)
  }

  /** Streaming conversion funnel — the incremental twin of
    * [[graft.operators.Events.funnel]]: per user, the first `fromType`
    * event and the first `toType` at-or-after it. State is two optional
    * timestamps per user (O(users) total, evicted on timeout); a user's
    * row emits once, when `horizonMinutes` of event time pass without
    * further events for that user (the online stand-in for batch's
    * end-of-data). Assumes within-watermark arrival order for the
    * signup→purchase race, like the sessionizer: a purchase surfacing
    * before a LATER-arriving earlier signup is the documented trade of
    * bounded state. */
  def statefulFunnel(events: Dataset[Event], fromType: String = "signup",
                     toType: String = "purchase",
                     horizonMinutes: Int = 60,
                     watermark: String = "1 hour"): Dataset[FunnelResult] = {
    import events.sparkSession.implicits._
    val horizonUs = horizonMinutes * 60L * 1000000L

    def update(userId: Long, batch: Iterator[Event],
               state: GroupState[(Long, Long, Long)]): Iterator[FunnelResult] = {
      // state: (firstFromUs | Long.MaxValue, firstToUs | Long.MaxValue, lastSeenUs)
      if (state.hasTimedOut) {
        val out = state.getOption.collect {
          case (from, to, _) if from != Long.MaxValue =>
            FunnelResult(userId, from,
              if (to != Long.MaxValue) Some(to) else None, to != Long.MaxValue)
        }.iterator
        state.remove()
        out
      } else {
        var (from, to, last) = state.getOption.getOrElse(
          (Long.MaxValue, Long.MaxValue, Long.MinValue))
        val sorted = batch.toSeq.sortBy(e => (micros(e.ts), e.event_id))
        // Two passes: settle `from` over the WHOLE micro-batch before
        // scanning for conversions. Batch funnel's `ts_us >= first_from_us`
        // is inclusive, so a toType event sharing its user's first-fromType
        // timestamp must count even when it sorts earlier by event_id — a
        // single interleaved pass would still see from = MaxValue there.
        sorted.foreach { e =>
          val t = micros(e.ts)
          last = math.max(last, t)
          if (e.event_type == fromType && t < from) from = t
        }
        sorted.foreach { e =>
          val t = micros(e.ts)
          if (e.event_type == toType && t >= from && t < to) to = t
        }
        state.update((from, to, last))
        state.setTimeoutTimestamp(Math.floorDiv(last + horizonUs + 999L, 1000L))
        Iterator.empty
      }
    }

    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(update)
  }
}
