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
}
