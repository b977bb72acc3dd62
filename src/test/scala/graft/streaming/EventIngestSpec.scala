package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import graft.operators.Events
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming ingest into the day-partitioned log layout must accumulate
  * the SAME directory tree the batch writer produces, readable by the
  * same pruned range reads — including a late event arriving after its
  * day closed, which must land as a new file in its own day's directory
  * (append-only; no closed-day rewrite).
  */
class EventIngestSpec extends SparkSpec {

  import EventStreams.Event

  private def ts(iso: String): Timestamp =
    Timestamp.from(java.time.Instant.parse(iso))

  test("streamed day-partitioned ingest ≡ batch layout; late day appends") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-ingest").toString
    val path = s"$dir/log"
    val ckpt = s"$dir/ckpt"

    val batch1 = Seq(
      Event(1L, ts("2024-01-10T06:00:00Z"), 10L, "view", 1.0),
      Event(2L, ts("2024-01-10T18:30:00Z"), 11L, "click", 2.0),
      Event(3L, ts("2024-01-11T03:15:00Z"), 10L, "view", 3.0))
    val batch2 = Seq( // second trigger: new day + a LATE event for day 10
      Event(4L, ts("2024-01-12T09:00:00Z"), 12L, "purchase", 4.0),
      Event(5L, ts("2024-01-10T23:59:59Z"), 11L, "view", 5.0))

    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = EventStreams.ingestDayPartitioned(input.toDF(), path, ckpt)
    try {
      input.addData(batch1: _*); q.processAllAvailable()
      val daysAfter1 = new java.io.File(path).listFiles()
        .filter(f => f.isDirectory && f.getName.startsWith("dt=")).map(_.getName).toSet
      assert(daysAfter1 == Set("dt=2024-01-10", "dt=2024-01-11"))
      val d10files = new java.io.File(s"$path/dt=2024-01-10").listFiles()
        .count(_.getName.endsWith(".parquet"))

      input.addData(batch2: _*); q.processAllAvailable()
      val daysAfter2 = new java.io.File(path).listFiles()
        .filter(f => f.isDirectory && f.getName.startsWith("dt=")).map(_.getName).toSet
      assert(daysAfter2 == Set("dt=2024-01-10", "dt=2024-01-11", "dt=2024-01-12"))
      // the late event APPENDED a file to the closed day
      val d10after = new java.io.File(s"$path/dt=2024-01-10").listFiles()
        .count(_.getName.endsWith(".parquet"))
      assert(d10after > d10files, "late event must append, not rewrite")
    } finally q.stop()

    // the accumulated tree reads back through the SAME pruned range read
    // as a batch-written layout of the same rows
    val all = batch1 ++ batch2
    val batchPath = s"$dir/batch"
    Events.writeDayPartitioned(all.toDF(), batchPath)
    val fromUs = 1704844800000000L // 2024-01-10T00:00:00Z
    val toUs   = 1705017600000000L // 2024-01-12T00:00:00Z
    def rows(p: String): Set[(Long, Long)] =
      Events.loadRangePartitioned(spark, p, fromUs, toUs)
        .select("event_id", "ts_us").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val streamed = rows(path)
    assert(streamed == rows(batchPath))
    assert(streamed.map(_._1) == Set(1L, 2L, 3L, 5L)) // day 12 pruned
  }
}
