package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.StreamingQuery

import graft.SparkSpec
import graft.streaming.EventStreams.Event

class EventStreamsSpec extends SparkSpec {

  import spark.implicits._

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 ${minute / 60}%02d:${minute % 60}%02d:00")

  private def stopQuietly(q: StreamingQuery): Unit =
    try q.stop() catch { case _: Exception => () }

  test("tumbling window counts over a memory stream (complete mode)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = EventStreams.tumblingCounts(input.toDF(), width = "1 hour")
      .writeStream.format("memory").queryName("tumbling").outputMode("complete").start()
    try {
      input.addData(
        Event(1, ts(5), 1, "view", 1.0),
        Event(2, ts(20), 1, "view", 2.0),
        Event(3, ts(65), 2, "click", 3.0))
      q.processAllAvailable()
      val rows = spark.table("tumbling").collect()
        .map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2))).toSet
      assert(rows == Set(
        ("2024-01-01 00:00:00.0", "view", 2L),
        ("2024-01-01 01:00:00.0", "click", 1L)))
    } finally stopQuietly(q)
  }

  test("streaming session_window merges events within the gap") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = EventStreams.sessionWindowCounts(input.toDF(), gapMinutes = 30,
        watermark = "10 minutes")
      .writeStream.format("memory").queryName("sessions_sw").outputMode("append").start()
    try {
      // user 1: events at 0 and 10 min (one session); user 2 at 0 min
      input.addData(Event(1, ts(0), 1, "view", 1.0),
                    Event(2, ts(10), 1, "view", 1.0),
                    Event(3, ts(0), 2, "view", 1.0))
      q.processAllAvailable()
      // push watermark far past session close so append emits results
      input.addData(Event(9, ts(600), 9, "view", 0.0))
      q.processAllAvailable()
      val rows = spark.table("sessions_sw").collect()
        .map(r => (r.getLong(0), r.getTimestamp(1).toString, r.getLong(3))).toSet
      assert(rows.contains((1L, "2024-01-01 00:00:00.0", 2L)))
      assert(rows.contains((2L, "2024-01-01 00:00:00.0", 1L)))
    } finally stopQuietly(q)
  }

  test("stateful sessionizer emits closed sessions with totals") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = EventStreams.statefulSessionize(input.toDS(), gapMinutes = 30,
        watermark = "5 minutes")
      .writeStream.format("memory").queryName("sessions_custom").outputMode("append").start()
    try {
      // session A: user 1, minutes 0-10, values 1.5+2.5; then a gap > 30min
      input.addData(Event(1, ts(0), 1, "view", 1.5),
                    Event(2, ts(10), 1, "click", 2.5))
      q.processAllAvailable()
      // event at minute 60 closes session A (gap 50min >= 30min)
      input.addData(Event(3, ts(60), 1, "view", 7.0))
      q.processAllAvailable()
      val rows = spark.table("sessions_custom").collect()
        .map(r => (r.getLong(0), r.getTimestamp(1).toString,
                   r.getTimestamp(2).toString, r.getLong(3), r.getDouble(4)))
      assert(rows.contains((1L, "2024-01-01 00:00:00.0", "2024-01-01 00:10:00.0", 2L, 4.0)),
        s"got: ${rows.mkString(", ")}")
    } finally stopQuietly(q)
  }

  test("cohort cells: frozen base, horizon bitset bound, lossless eviction") {
    implicit val sqlCtx = spark.sqlContext
    val weekMin = 7 * 24 * 60
    val input = MemoryStream[Event]
    // 2-week horizon: weeks_since ∈ {0, 1} only, state evicts after that
    val q = EventStreams.statefulCohortCells(input.toDS(), horizonWeeks = 2,
        watermark = "1 minute")
      .writeStream.format("memory").queryName("cohort_bound").outputMode("append").start()
    try {
      // user 1 active in weeks 0 and 1 → two cells, cohort = epoch week of ts(0)
      input.addData(Event(1, ts(10), 1, "view", 0.0))
      q.processAllAvailable()
      input.addData(Event(2, ts(10 + weekMin), 1, "view", 0.0))
      q.processAllAvailable()
      // a LATE event before the frozen first must not re-base the cohort
      // (fail-safe skip, not a silent double-count under new cohort_week)
      input.addData(Event(3, ts(5), 1, "view", 0.0))
      q.processAllAvailable()
      // beyond the horizon: no third cell even though the user is active
      input.addData(Event(4, ts(10 + 2 * weekMin), 1, "view", 0.0))
      q.processAllAvailable()
      val cells = spark.table("cohort_bound").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val cohort = Math.floorDiv(
        EventStreams.micros(ts(10)), 7L * 24 * 3600 * 1000000L)
      assert(cells == Set((1L, cohort, 0L), (1L, cohort, 1L)),
        s"expected exactly the two in-horizon cells at the frozen base: $cells")
    } finally stopQuietly(q)
  }
}
