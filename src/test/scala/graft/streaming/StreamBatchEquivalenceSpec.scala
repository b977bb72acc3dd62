package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.SparkSpec
import graft.operators.{Dedup, Events, TextAnalysis}
import graft.streaming.EventStreams.Event

/** Streaming ≡ batch equivalence anchor.
  *
  * The streaming operators replay the REAL sf0.001 fixtures through
  * `MemoryStream` and must reproduce the result set of their
  * oracle-checked batch twins (x15 sessionize, x3 exact dedup):
  *
  *  - [[EventStreams.statefulSessionize]] vs [[Events.sessionize]] —
  *    identical session structure (user, µs-exact start/end, event count)
  *    over every one of the fixture's 1000 events, fed in 10
  *    chronological micro-batches to exercise cross-batch state carry,
  *    gap-close AND watermark-timeout emission paths.
  *  - [[DocumentStreams.cleanAndDedup]] vs quality-filter +
  *    [[Dedup.exactByText]] — identical surviving fingerprint set.
  *  - [[DocumentStreams.dedupNormalized]] vs its batch formulation —
  *    identical surviving normalized-fingerprint set.
  *  - [[EventStreams.tumblingCounts]] vs [[Events.tumblingCounts]] (the
  *    x14-oracle-checked twin) — identical (window, type) → (count,
  *    total) map once the watermark closes every real window; same for
  *    [[EventStreams.slidingCounts]] vs the x28 twin and the native
  *    [[EventStreams.sessionWindowCounts]] vs the x16 twin.
  *
  * Feeding order note: chunks are globally chronological, so no event is
  * ever behind the watermark when it arrives and no timeout can fire
  * before the µs gap boundary of a session that still has events coming —
  * the two emission paths (gap-close, timeout) partition the sessions and
  * both must agree with batch.
  */
class StreamBatchEquivalenceSpec extends SparkSpec {

  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  private def stopQuietly(q: StreamingQuery): Unit =
    try q.stop() catch { case _: Exception => () }

  test("statefulSessionize reproduces batch Events.sessionize on the events fixture") {
    val events = Events.load(spark, sfDir)

    // Batch truth (the x15-oracle-checked formulation), keyed for comparison.
    val batch = Events.sessionize(events, gapMinutes = 30)
      .select("user_id", "session_start_us", "session_end_us", "n_events", "total_value")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) -> r.getDouble(4))
    val batchKeys = batch.map(_._1)
    assert(batchKeys.distinct.length == batchKeys.length, "batch sessions must be unique")
    assert(batchKeys.length > 100, "fixture should produce a non-trivial session count")

    // Stream the same events in 10 chronological chunks.
    val typed = events
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      .as[Event]
      .collect()
      .sortBy(e => (EventStreams.micros(e.ts), e.event_id))
    val chunks = typed.grouped(math.max(1, typed.length / 10)).toSeq
    val maxUs = EventStreams.micros(typed.last.ts)
    val dayUs = 24L * 3600L * 1000000L

    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = EventStreams.statefulSessionize(input.toDS(), gapMinutes = 30,
        watermark = "1 hour")
      .writeStream.format("memory").queryName("equiv_sessions").outputMode("append").start()
    try {
      chunks.foreach { c => input.addData(c.toSeq); q.processAllAvailable() }
      // Two far-future sentinel batches: the first advances the watermark
      // past every real session's timeout, the second gives the state store
      // a batch in which those timeouts actually fire.
      input.addData(Event(-1L, EventStreams.microsToTs(maxUs + 10 * dayUs), -1L, "s", 0.0))
      q.processAllAvailable()
      input.addData(Event(-2L, EventStreams.microsToTs(maxUs + 20 * dayUs), -1L, "s", 0.0))
      q.processAllAvailable()

      val streamed = spark.table("equiv_sessions")
        .filter(col("user_id") >= 0)
        .collect()
        .map { r =>
          (r.getLong(0),
           EventStreams.micros(r.getTimestamp(1)),
           EventStreams.micros(r.getTimestamp(2)),
           r.getLong(3)) -> r.getDouble(4)
        }
      assert(streamed.map(_._1).distinct.length == streamed.length,
        "streamed sessions must be unique")

      val batchMap = batch.toMap
      val streamMap = streamed.toMap
      val missing = batchMap.keySet -- streamMap.keySet
      val extra = streamMap.keySet -- batchMap.keySet
      assert(missing.isEmpty && extra.isEmpty,
        s"session structure diverged: ${missing.size} batch-only " +
          s"(e.g. ${missing.take(3)}), ${extra.size} stream-only (e.g. ${extra.take(3)})")
      // Totals: both sides now round(sum, 2) with the same HALF_UP rule,
      // and on this fixture the pre-rounding sums never land close enough
      // to a .005 boundary for addition order to show — exact equality.
      val badTotals = batchMap.collect {
        case (k, v) if v != streamMap(k) => (k, v, streamMap(k))
      }
      assert(badTotals.isEmpty, s"session totals diverged: ${badTotals.take(5)}")
    } finally stopQuietly(q)
  }

  /** Replays the events fixture through a streaming windowed aggregation
    * and asserts its (window_start_ms, type) → (count, total) map equals
    * the batch reference exactly. A far-future sentinel advances the
    * watermark past every real window's end so append mode emits them
    * all; the sentinel's own window never closes and is filtered out. */
  private def assertWindowedEquivalence(
      name: String,
      streaming: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame,
      batchRef: org.apache.spark.sql.DataFrame): Unit = {
    val events = Events.load(spark, sfDir)
    val batch = batchRef.collect()
      .map(r => (r.getLong(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    assert(batch.size > 50, "fixture should produce a non-trivial window count")

    val typed = events
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      .as[Event]
      .collect()
      .sortBy(e => (EventStreams.micros(e.ts), e.event_id))
    val chunks = typed.grouped(math.max(1, typed.length / 10)).toSeq
    val maxUs = EventStreams.micros(typed.last.ts)
    val dayUs = 24L * 3600L * 1000000L

    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = streaming(input.toDF())
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      chunks.foreach { c => input.addData(c.toSeq); q.processAllAvailable() }
      input.addData(Event(-1L, EventStreams.microsToTs(maxUs + 10 * dayUs),
                          -1L, "zz_sentinel", 0.0))
      q.processAllAvailable()

      val streamed = spark.table(name)
        .filter(col("event_type") =!= "zz_sentinel")
        .collect()
        .map(r => (EventStreams.micros(r.getTimestamp(0)) / 1000L, r.getString(1)) ->
                  (r.getLong(2), r.getDouble(3)))
        .toMap
      assert(streamed == batch,
        s"$name diverged: batch-only=${(batch.keySet -- streamed.keySet).take(3)} " +
          s"stream-only=${(streamed.keySet -- batch.keySet).take(3)} " +
          s"value-diffs=${batch.collect { case (k, v) if streamed.get(k).exists(_ != v) =>
            (k, v, streamed(k)) }.take(3)}")
    } finally stopQuietly(q)
  }

  test("streaming tumblingCounts reproduces batch Events.tumblingCounts on the fixture") {
    assertWindowedEquivalence("equiv_tumbling",
      df => EventStreams.tumblingCounts(df, width = "1 hour", watermark = "2 hours"),
      Events.tumblingCounts(Events.load(spark, sfDir), width = "1 hour"))
  }

  test("streaming slidingCounts reproduces batch Events.slidingCounts on the fixture") {
    assertWindowedEquivalence("equiv_sliding",
      df => EventStreams.slidingCounts(df, "1 hour", "15 minutes", "2 hours"),
      Events.slidingCounts(Events.load(spark, sfDir), "1 hour", "15 minutes"))
  }

  test("streaming session_window reproduces batch sessionWindowCounts on the fixture") {
    // the last streaming operator without a fixture anchor: the native
    // state-store-merged session_window vs its x16-oracle-checked batch twin
    val events = Events.load(spark, sfDir)
    val batch = Events.sessionWindowCounts(events, gapMinutes = 30)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) -> r.getLong(3))
      .toMap
    assert(batch.size > 100)

    val typed = events
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      .as[Event]
      .collect()
      .sortBy(e => (EventStreams.micros(e.ts), e.event_id))
    val chunks = typed.grouped(math.max(1, typed.length / 10)).toSeq
    val maxUs = EventStreams.micros(typed.last.ts)
    val dayUs = 24L * 3600L * 1000000L

    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = EventStreams.sessionWindowCounts(input.toDF(), gapMinutes = 30,
        watermark = "1 hour")
      .writeStream.format("memory").queryName("equiv_session_window")
      .outputMode("append").start()
    try {
      chunks.foreach { c => input.addData(c.toSeq); q.processAllAvailable() }
      input.addData(Event(-1L, EventStreams.microsToTs(maxUs + 10 * dayUs),
                          -1L, "s", 0.0))
      q.processAllAvailable()

      val streamed = spark.table("equiv_session_window")
        .filter(col("user_id") >= 0)
        .collect()
        .map(r => (r.getLong(0),
                   EventStreams.micros(r.getTimestamp(1)),
                   EventStreams.micros(r.getTimestamp(2))) -> r.getLong(3))
        .toMap
      assert(streamed == batch,
        s"session windows diverged: batch-only=${(batch.keySet -- streamed.keySet).take(3)} " +
          s"stream-only=${(streamed.keySet -- batch.keySet).take(3)}")
    } finally stopQuietly(q)
  }

  test("streaming latestSnapshot reproduces batch Events.latestSnapshot (x46) on the fixture") {
    val events = Events.load(spark, sfDir)
    val batch = Events.latestSnapshot(events)
      .select("user_id", "event_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(batch.size > 10, "fixture should hold a non-trivial user count")

    val typed = events
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      .as[Event]
      .collect()
      .sortBy(e => (EventStreams.micros(e.ts), e.event_id))
    val chunks = typed.grouped(math.max(1, typed.length / 10)).toSeq

    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    // complete mode: the sink holds the whole snapshot, updated per batch
    val q = EventStreams.latestSnapshot(input.toDF())
      .writeStream.format("memory").queryName("equiv_snapshot")
      .outputMode("complete").start()
    try {
      chunks.foreach { c => input.addData(c.toSeq); q.processAllAvailable() }
      val streamed = spark.table("equiv_snapshot")
        .select("user_id", "event_id")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(streamed == batch,
        s"snapshot diverged on users ${(batch.toSet diff streamed.toSet).take(5)}")
    } finally stopQuietly(q)
  }

  test("cleanAndDedup reproduces batch quality-filter + exactByText on the documents fixture") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val minQuality = 0.3

    val batchKept = Dedup.exactByText(
        docs.filter(TextAnalysis.qualityColumn(col("text")) >= minQuality))
      .select("fingerprint").collect().map(_.getString(0)).sorted
    assert(batchKept.nonEmpty)

    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String, Timestamp)]
    val streamDocs = input.toDF().toDF("doc_id", "text", "ingest_ts")
    val q = DocumentStreams.cleanAndDedup(streamDocs, minQuality = minQuality)
      .select("doc_id", "fingerprint")
      .writeStream.format("memory").queryName("equiv_docs").outputMode("append").start()
    try {
      val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime
      val rows = docs.select("doc_id", "text").collect()
        .map(r => (r.getLong(0), r.getString(1), new Timestamp(base + r.getLong(0))))
        .sortBy(_._1)
      input.addData(rows.toSeq)
      q.processAllAvailable()
      val streamKept = spark.table("equiv_docs").collect().map(_.getString(1)).sorted
      // Representative choice is first-arrival in the stream vs min-id in
      // batch; the *content set* (which texts survive) must be identical.
      assert(streamKept.toSeq == batchKept.toSeq,
        s"fingerprint sets diverged: batch=${batchKept.length} stream=${streamKept.length}")
    } finally stopQuietly(q)
  }

  test("streaming nearDedupAgainst reproduces batch Dedup.minHashLshAgainst (x63) on the fixture") {
    // x63's exact batch/history split: stream side = doc_id % 3, static
    // history = doc_id % 7; surviving doc_id sets must be identical
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val batchSide = docs.filter(col("doc_id") % 3 === 0)
    val seen = docs.filter(col("doc_id") % 7 === 0)
    val batchKept = Dedup.minHashLshAgainst(batchSide, seen, 0.5)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(batchKept.nonEmpty && batchKept.length < batchSide.count(),
      "fixture must have both surviving and near-duplicated docs")

    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String, String, Timestamp)]
    val streamDocs = input.toDF().toDF("doc_id", "source", "text", "ingest_ts")
    val q = DocumentStreams.nearDedupAgainst(streamDocs, seen, 0.5)
      .select("doc_id")
      .writeStream.format("memory").queryName("equiv_near_against")
      .outputMode("append").start()
    try {
      val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime
      val rows = batchSide.select("doc_id", "source", "text").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2),
                   new Timestamp(base + r.getLong(0))))
        .sortBy(_._1)
      // three chunks exercise cross-batch grouping state; the far-future
      // sentinel (too short to shingle, so never near-duplicated)
      // advances the watermark past every real document
      rows.grouped(math.max(1, rows.length / 3))
        .foreach { c => input.addData(c.toSeq); q.processAllAvailable() }
      input.addData((-1L, "zz", "sentinel",
                     new Timestamp(base + 30L * 24 * 3600 * 1000)))
      q.processAllAvailable()

      val streamKept = spark.table("equiv_near_against")
        .collect().map(_.getLong(0)).filter(_ >= 0).sorted
      assert(streamKept.toSeq == batchKept.toSeq,
        s"survivor sets diverged: batch=${batchKept.length} stream=${streamKept.length}")
    } finally stopQuietly(q)
  }

  test("streaming decontaminate reproduces batch Dedup.decontaminate (x30) on the fixture") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val bench = docs.filter(col("source") === "src19")
    val batchKept = Dedup.decontaminate(docs, bench, n = 8)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(batchKept.nonEmpty && batchKept.length < docs.count(),
      "fixture must have both surviving and contaminated docs")

    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String, String, Timestamp)]
    val streamDocs = input.toDF().toDF("doc_id", "source", "text", "ingest_ts")
    val q = DocumentStreams.decontaminate(streamDocs, bench, n = 8)
      .select("doc_id")
      .writeStream.format("memory").queryName("equiv_decontam")
      .outputMode("append").start()
    try {
      val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime
      val rows = docs.select("doc_id", "source", "text").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2),
                   new Timestamp(base + r.getLong(0))))
        .sortBy(_._1)
      // three chunks exercise cross-batch grouping state; the far-future
      // sentinel (too short to span, so never contaminated) advances the
      // watermark past every real document so append mode emits them all
      rows.grouped(math.max(1, rows.length / 3))
        .foreach { c => input.addData(c.toSeq); q.processAllAvailable() }
      input.addData((-1L, "zz", "sentinel",
                     new Timestamp(base + 30L * 24 * 3600 * 1000)))
      q.processAllAvailable()

      val streamKept = spark.table("equiv_decontam")
        .filter(col("doc_id") >= 0).collect().map(_.getLong(0)).sorted
      assert(streamKept.toSeq == batchKept.toSeq,
        s"surviving-id sets diverged: batch=${batchKept.length} stream=${streamKept.length}")
    } finally stopQuietly(q)
  }

  test("statefulFunnel reproduces batch Events.funnel (x57) on the fixture") {
    val events = Events.load(spark, sfDir)
    val batch = Events.funnel(events).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), if (r.isNullAt(2)) -1L else r.getLong(2), r.getBoolean(3)))
      .toMap
    assert(batch.nonEmpty && batch.values.exists(_._3),
      "fixture must contain converters (at sf0.001 every user converts)")

    val typed = events
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      .as[Event].collect()
      .sortBy(e => (EventStreams.micros(e.ts), e.event_id))
    val chunks = typed.grouped(math.max(1, typed.length / 10)).toSeq
    val maxUs = EventStreams.micros(typed.last.ts)
    val dayUs = 24L * 3600L * 1000000L

    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    // horizon must exceed the largest intra-user gap (days, in this
    // fixture) or the funnel re-opens per activity epoch — the online
    // semantics, but not batch's end-of-data view
    val q = EventStreams.statefulFunnel(input.toDS(), horizonMinutes = 7 * 24 * 60)
      .writeStream.format("memory").queryName("equiv_funnel")
      .outputMode("append").start()
    try {
      chunks.foreach { c => input.addData(c.toSeq); q.processAllAvailable() }
      input.addData(Event(-1L, EventStreams.microsToTs(maxUs + 10 * dayUs), -1L, "s", 0.0))
      q.processAllAvailable()
      input.addData(Event(-2L, EventStreams.microsToTs(maxUs + 20 * dayUs), -1L, "s", 0.0))
      q.processAllAvailable()

      val streamed = spark.table("equiv_funnel")
        .filter(col("user_id") >= 0).collect()
        .map(r => r.getLong(0) ->
          (r.getLong(1), if (r.isNullAt(2)) -1L else r.getLong(2), r.getBoolean(3)))
        .toMap
      assert(streamed == batch,
        s"funnels diverged, e.g. ${batch.collect { case (k, v) if streamed.get(k) != Some(v) =>
          (k, v, streamed.get(k)) }.take(3)}")
    } finally stopQuietly(q)
  }

  test("statefulFunnel counts a purchase sharing its first-signup timestamp") {
    // the purchase (event_id 1) SORTS BEFORE the same-ts signup (event_id
    // 2): batch's inclusive ts_us >= first_from_us counts it, and the
    // two-pass micro-batch scan must agree (a single interleaved pass
    // would still see from = MaxValue at the purchase)
    val t0 = 1700000000000000L
    val evs = Seq(
      Event(1L, EventStreams.microsToTs(t0), 1L, "purchase", 1.0),
      Event(2L, EventStreams.microsToTs(t0), 1L, "signup", 0.0),
      Event(3L, EventStreams.microsToTs(t0 + 1000000L), 2L, "signup", 0.0))
    val batchDf = evs.toDF().withColumn("ts_us", unix_micros(col("ts")))
    val batch = Events.funnel(batchDf).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), if (r.isNullAt(2)) -1L else r.getLong(2), r.getBoolean(3)))
      .toMap
    assert(batch(1L) == ((t0, t0, true)), s"batch semantics changed: $batch")

    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = EventStreams.statefulFunnel(input.toDS(), horizonMinutes = 60)
      .writeStream.format("memory").queryName("equiv_funnel_ts")
      .outputMode("append").start()
    try {
      input.addData(evs)
      q.processAllAvailable()
      val dayUs = 24L * 3600L * 1000000L
      input.addData(Event(-1L, EventStreams.microsToTs(t0 + dayUs), -1L, "s", 0.0))
      q.processAllAvailable()
      input.addData(Event(-2L, EventStreams.microsToTs(t0 + 2 * dayUs), -1L, "s", 0.0))
      q.processAllAvailable()
      val streamed = spark.table("equiv_funnel_ts")
        .filter(col("user_id") >= 0).collect()
        .map(r => r.getLong(0) ->
          (r.getLong(1), if (r.isNullAt(2)) -1L else r.getLong(2), r.getBoolean(3)))
        .toMap
      assert(streamed == batch, s"stream=$streamed batch=$batch")
    } finally stopQuietly(q)
  }

  test("statefulCohortCells aggregates to batch Events.cohortRetention (x58)") {
    val events = Events.load(spark, sfDir)
    val batch = Events.cohortRetention(events).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(batch.nonEmpty && batch.values.sum > batch.size,
      "fixture should produce a multi-week retention matrix")

    val typed = events
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      .as[Event]
      .collect()
      .sortBy(e => (EventStreams.micros(e.ts), e.event_id))
    val chunks = typed.grouped(math.max(1, typed.length / 10)).toSeq

    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = EventStreams.statefulCohortCells(input.toDS())
      .writeStream.format("memory").queryName("equiv_cohort")
      .outputMode("append").start()
    try {
      chunks.foreach { c => input.addData(c.toSeq); q.processAllAvailable() }
      // cells are unique per (user, cohort, week) by construction, so a
      // plain count per cell IS the distinct-user count batch computes
      val streamed = spark.table("equiv_cohort")
        .groupBy(col("cohort_week"), col("weeks_since"))
        .agg(count(lit(1)).as("n_users"))
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      assert(streamed == batch,
        s"matrices diverged, e.g. ${batch.collect { case (k, v) if streamed.get(k) != Some(v) =>
          (k, v, streamed.get(k)) }.take(3)}")
    } finally stopQuietly(q)
  }

  test("streaming contaminationScore reproduces batch Dedup.contaminationScore (x47)") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val bench = docs.filter(col("source") === "src19")
    val batch = Dedup.contaminationScore(docs, bench, n = 8)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    assert(batch.values.exists(_._3 > 0.0) && batch.values.exists(_._3 == 0.0),
      "fixture must mix contaminated and clean docs")

    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String, String, Timestamp)]
    val streamDocs = input.toDF().toDF("doc_id", "source", "text", "ingest_ts")
    val q = DocumentStreams.contaminationScore(streamDocs, bench, n = 8)
      .writeStream.format("memory").queryName("equiv_contam_score")
      .outputMode("append").start()
    try {
      val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime
      val rows = docs.select("doc_id", "source", "text").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2),
                   new Timestamp(base + r.getLong(0))))
        .sortBy(_._1)
      rows.grouped(math.max(1, rows.length / 3))
        .foreach { c => input.addData(c.toSeq); q.processAllAvailable() }
      input.addData((-1L, "zz", "sentinel",
                     new Timestamp(base + 30L * 24 * 3600 * 1000)))
      q.processAllAvailable()

      val streamed = spark.table("equiv_contam_score")
        .filter(col("doc_id") >= 0).collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
        .toMap
      assert(streamed == batch,
        s"scores diverged, e.g. ${batch.collect { case (k, v) if streamed.get(k) != Some(v) =>
          (k, v, streamed.get(k)) }.take(3)}")
    } finally stopQuietly(q)
  }

  test("streaming repeatedSpans reproduces batch Dedup.repeatedSpans within one window") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val batch = Dedup.repeatedSpans(docs, n = 10, minDocs = 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(batch.nonEmpty, "fixture must contain repeated spans")

    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String, Timestamp)]
    val streamDocs = input.toDF().toDF("doc_id", "text", "ingest_ts")
    val q = DocumentStreams.repeatedSpans(streamDocs, n = 10, minDocs = 2,
        width = "1 day", watermark = "2 hours")
      .writeStream.format("memory").queryName("equiv_spans")
      .outputMode("append").start()
    try {
      // all documents share one ingest timestamp, so the whole corpus
      // lands in a single window and the streamed counts are comparable
      // to the windowless batch operator
      val ts = Timestamp.valueOf("2024-01-01 06:00:00")
      val rows = docs.select("doc_id", "text").collect()
        .map(r => (r.getLong(0), r.getString(1), ts)).sortBy(_._1)
      rows.grouped(math.max(1, rows.length / 3))
        .foreach { c => input.addData(c.toSeq); q.processAllAvailable() }
      input.addData((-1L, "sentinel",
                     new Timestamp(ts.getTime + 30L * 24 * 3600 * 1000)))
      q.processAllAvailable()

      val streamed = spark.table("equiv_spans")
        .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
      assert(streamed == batch,
        s"span counts diverged: batch-only=${(batch.keySet -- streamed.keySet).take(3)} " +
          s"stream-only=${(streamed.keySet -- batch.keySet).take(3)} " +
          s"count-diffs=${batch.collect { case (k, v) if streamed.get(k).exists(_ != v) =>
            (k, v, streamed(k)) }.take(3)}")
    } finally stopQuietly(q)
  }

  test("dedupNormalized reproduces the batch normalized-fingerprint dedup") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val batchKept = docs
      .select(xxhash64(concat_ws(" ", Dedup.tokens(col("text")))).as("fingerprint"))
      .distinct().collect().map(_.getLong(0)).sorted

    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String, Timestamp)]
    val streamDocs = input.toDF().toDF("doc_id", "text", "ingest_ts")
    val q = DocumentStreams.dedupNormalized(streamDocs)
      .select("doc_id", "fingerprint")
      .writeStream.format("memory").queryName("equiv_norm").outputMode("append").start()
    try {
      val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime
      val rows = docs.select("doc_id", "text").collect()
        .map(r => (r.getLong(0), r.getString(1), new Timestamp(base + r.getLong(0))))
        .sortBy(_._1)
      input.addData(rows.toSeq)
      q.processAllAvailable()
      val streamKept = spark.table("equiv_norm").collect().map(_.getLong(1)).sorted
      assert(streamKept.toSeq == batchKept.toSeq,
        s"normalized fingerprint sets diverged: batch=${batchKept.length} stream=${streamKept.length}")
    } finally stopQuietly(q)
  }

  test("streaming chunkDocuments equals batch (stateless op, no streaming twin needed)") {
    import graft.operators.Packing
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val batch = Packing.chunkDocuments(docs, window = 32, overlap = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
                           r.getLong(3), r.getString(4))).sortBy(t => (t._1, t._2)).toSeq
    assert(batch.exists(_._2 > 0), "fixture must produce multi-chunk docs")

    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val q = Packing.chunkDocuments(input.toDF().toDF("doc_id", "text"),
        window = 32, overlap = 8)
      .writeStream.format("memory").queryName("equiv_chunk").outputMode("append").start()
    try {
      val rows = docs.select("doc_id", "text").collect()
        .map(r => (r.getLong(0), r.getString(1)))
      rows.grouped(math.max(1, rows.length / 3))
        .foreach { c => input.addData(c.toSeq); q.processAllAvailable() }
      val streamed = spark.table("equiv_chunk").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
                   r.getLong(3), r.getString(4))).sortBy(t => (t._1, t._2)).toSeq
      assert(streamed == batch, "chunking must be identical batch vs stream")
    } finally stopQuietly(q)
  }

  test("streaming packSequencesStream reproduces batch packing on doc_id-ordered replay") {
    import graft.operators.Packing
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val batch = Packing.packSequences(docs, budget = 128, buckets = 8)
      .collect().map(p => (p.doc_id, p.bucket, p.n_tokens, p.bin)).sortBy(_._1).toSeq
    assert(batch.map(_._4).max > 0, "fixture must produce multiple bins")

    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val streamDocs = input.toDF().toDF("doc_id", "text")
    val q = Packing.packSequencesStream(streamDocs, budget = 128, buckets = 8)
      .writeStream.format("memory").queryName("equiv_pack").outputMode("append").start()
    try {
      // five chronological chunks exercise cross-batch (bin, acc) carry
      val rows = docs.select("doc_id", "text").collect()
        .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
      rows.grouped(math.max(1, rows.length / 5))
        .foreach { c => input.addData(c.toSeq); q.processAllAvailable() }
      val streamed = spark.table("equiv_pack").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .sortBy(_._1).toSeq
      assert(streamed == batch,
        s"packings diverged: first diff=${
          streamed.zip(batch).find { case (a, b) => a != b }}")
    } finally stopQuietly(q)
  }

  test("streaming heavyTokensSketch honors the MG containment + bound contract vs exact batch counts") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    // Two tumbling day-windows: doc_id parity picks the day, so the batch
    // truth can replicate the window assignment exactly.
    val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime
    val dayMs = 24L * 3600 * 1000
    def tsOf(docId: Long) = new Timestamp(base + (docId % 2) * dayMs + 3600 * 1000)

    // Exact truth: (day, source) -> token counts + total token count.
    val exact = docs
      .select((col("doc_id") % 2).as("day"), col("source"),
              explode(TextAnalysis.tokens(col("text"))).as("token"))
      .groupBy("day", "source", "token").count()
      .collect()
      .groupBy(r => (r.getLong(0), r.getString(1)))
      .map { case (k, rs) =>
        k -> rs.map(r => r.getString(2) -> r.getLong(3)).toMap
      }
    assert(exact.nonEmpty && exact.forall(_._2.size > 8),
      "every (day, source) group should have vocabulary above the small capacity")

    // capacity 8 forces constant MG overflow; 256 is the x32 operating point.
    for (capacity <- Seq(8, 256)) {
      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[(Long, String, String, Timestamp)]
      val streamDocs = input.toDF().toDF("doc_id", "source", "text", "ingest_ts")
      val name = s"equiv_heavy_$capacity"
      val q = DocumentStreams.heavyTokensSketch(streamDocs, capacity = capacity,
          width = "1 day", watermark = "2 hours")
        .writeStream.format("memory").queryName(name).outputMode("append").start()
      try {
        // Event-time-ordered replay: the stateful exec drops rows behind
        // the watermark (its input carries the watermarked ingest_ts), so
        // a doc_id-ordered feed would interleave the two days and lose
        // day-0 rows once a day-1 row has advanced the watermark.
        val rows = docs.select("doc_id", "source", "text").collect()
          .map(r => (r.getLong(0), r.getString(1), r.getString(2), tsOf(r.getLong(0))))
          .sortBy(t => (t._4.getTime, t._1))
        rows.grouped(math.max(1, rows.length / 3))
          .foreach { c => input.addData(c.toSeq); q.processAllAvailable() }
        // Two far-future sentinels: advance the watermark past both real
        // windows, then give the state store a batch for timeouts to fire.
        input.addData((-1L, "zz", "sentinel",
                       new Timestamp(base + 30L * dayMs)))
        q.processAllAvailable()
        input.addData((-2L, "zz", "sentinel2",
                       new Timestamp(base + 31L * dayMs)))
        q.processAllAvailable()

        val streamed = spark.table(name)
          .filter(col("source") =!= "zz")
          .collect()
          .map(r => (r.getTimestamp(0), r.getString(1), r.getString(2),
                     r.getLong(3), r.getLong(4), r.getLong(5), r.getBoolean(6)))
          .groupBy(t => ((t._1.getTime - base) / dayMs, t._2))

        // A group may legitimately emit NOTHING: a final Misra-Gries
        // decrement cascade can empty the sketch, which is the sketch
        // saying "no token is certified heavy" — valid iff no token
        // actually clears the n/(capacity+1) threshold (checked by the
        // containment loop below over an empty survivor set). So the
        // emitted keys must be a subset of the exact keys, not equal.
        assert(streamed.keySet.subsetOf(exact.keySet),
          s"unexpected (day, source) keys: ${(streamed.keySet -- exact.keySet).take(3)}")
        for (key <- exact.keys) {
          val rows = streamed.getOrElse(key, Array.empty)
          val truth = exact(key)
          val n = truth.values.sum
          assert(rows.forall(_._6 == n),
            s"$key: emitted n_tokens ${rows.map(_._6).distinct.toList} " +
              s"over ${rows.length} rows must equal the exact total $n")
          val slack = n / (capacity + 1)
          // Per-survivor bound: count_lb <= exact <= count_ub.
          rows.foreach { case (_, _, tok, lb, ub, _, guaranteed) =>
            val ex = truth.getOrElse(tok, 0L)
            assert(lb <= ex && ex <= ub,
              s"$key/$tok: exact $ex outside [$lb, $ub] at capacity $capacity")
            if (guaranteed) assert(ex > slack,
              s"$key/$tok: certified heavy but exact $ex <= $slack")
          }
          // Containment: every true heavy hitter survives the sketch.
          val survivors = rows.map(_._3).toSet
          truth.foreach { case (tok, ex) =>
            if (ex > slack) assert(survivors.contains(tok),
              s"$key: true heavy $tok (count $ex > $slack) missing at capacity $capacity")
          }
          assert(rows.size <= capacity,
            s"$key: ${rows.size} survivors exceed capacity $capacity")
        }
      } finally stopQuietly(q)
    }
  }
}
