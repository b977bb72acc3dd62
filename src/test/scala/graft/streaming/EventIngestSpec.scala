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

  test("compactClosedDays compacts exactly the closed fragmented days") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-ingest-cc").toString
    val path = s"$dir/log"

    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = EventStreams.ingestDayPartitioned(input.toDF(), path, s"$dir/ckpt")
    try {
      // day 10: three triggers → three files (fragmented, closed)
      // day 11: one trigger → one file (closed but already compact)
      // day 12: two triggers → two files (fragmented but OPEN)
      Seq(
        Seq(Event(1L, ts("2024-01-10T01:00:00Z"), 1L, "view", 1.0)),
        Seq(Event(2L, ts("2024-01-10T12:00:00Z"), 2L, "view", 1.0)),
        Seq(Event(3L, ts("2024-01-10T23:00:00Z"), 3L, "click", 1.0)),
        Seq(Event(4L, ts("2024-01-11T08:00:00Z"), 1L, "view", 1.0)),
        Seq(Event(5L, ts("2024-01-12T02:00:00Z"), 2L, "view", 1.0)),
        Seq(Event(6L, ts("2024-01-12T04:00:00Z"), 3L, "purchase", 1.0))
      ).foreach { batch => input.addData(batch: _*); q.processAllAvailable() }
    } finally q.stop()

    def fileCount(dt: String): Int =
      new java.io.File(s"$path/dt=$dt").listFiles()
        .count(_.getName.endsWith(".parquet"))
    assert(fileCount("2024-01-10") == 3 && fileCount("2024-01-11") == 1 &&
      fileCount("2024-01-12") == 2)

    // ingest watermark sits at the start of day 12: days 10/11 closed
    val wm = Events.dayBoundsUs("2024-01-12")._1
    // still sink-log-managed → discovery refuses like compactDay does
    val e = intercept[RuntimeException](
      Events.compactClosedDays(spark, path, wm))
    assert(e.getMessage.contains("_spark_metadata"))
    org.apache.commons.io.FileUtils.deleteDirectory(
      new java.io.File(s"$path/_spark_metadata"))

    val fromUs = 1704844800000000L // 2024-01-10T00:00:00Z
    val before = Events.loadRangePartitioned(spark, path,
      fromUs, wm + 86400000000L).select("event_id")
      .collect().map(_.getLong(0)).toSet
    val done = Events.compactClosedDays(spark, path, wm)
    // day 10 was the only closed AND fragmented day
    assert(done == Map("2024-01-10" -> 1L))
    assert(fileCount("2024-01-10") == 1, "closed fragmented day compacts")
    assert(fileCount("2024-01-11") == 1, "already-compact day untouched")
    assert(fileCount("2024-01-12") == 2, "open day never touched")
    val after = Events.loadRangePartitioned(spark, path,
      fromUs, wm + 86400000000L).select("event_id")
      .collect().map(_.getLong(0)).toSet
    assert(after == before && after == Set(1L, 2L, 3L, 4L, 5L, 6L))
    // idempotent: a second sweep finds nothing to do
    assert(Events.compactClosedDays(spark, path, wm).isEmpty)
  }

  test("streaming tail ≡ batch range read; later appends surface in-range") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-tail").toString
    val path = s"$dir/log"
    Events.writeDayPartitioned(
      Events.load(spark, "/root/testdata/sf0.001"), path)
    val fromUs = 1705276800000000L // 2024-01-15T00:00:00Z
    val toUs   = 1705536000000000L // 2024-01-18T00:00:00Z

    def keys(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("event_id", "ts_us").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet

    // one file per micro-batch: a deep backlog drains as many small
    // batches (the 100 TB cold-start shape), same final content
    val tail = EventStreams.tailDayPartitioned(spark, path, fromUs, toUs,
      maxFilesPerTrigger = Some(1))
    assert(tail.isStreaming)
    val q = tail.writeStream.format("memory").queryName("graft_tail_q")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val batchRows = keys(Events.loadRangePartitioned(spark, path, fromUs, toUs))
      assert(keys(spark.table("graft_tail_q")) == batchRows && batchRows.nonEmpty)

      // append two late files: one in range, one in a pruned-out day
      val late = Seq(
        Event(900001L, ts("2024-01-16T12:00:00Z"), 7L, "view", 1.0),
        Event(900002L, ts("2024-01-25T12:00:00Z"), 7L, "view", 1.0))
      late.toDF()
        .withColumn("ts_us", unix_micros(col("ts")))
        .withColumn("dt", Events.utcDt(col("ts")))
        .write.mode("append").partitionBy("dt").parquet(path)
      q.processAllAvailable()
      val after = keys(spark.table("graft_tail_q"))
      assert(after == batchRows + ((900001L, 1705406400000000L)),
        "in-range append surfaces; out-of-range day stays pruned")
      assert(after ==
        keys(Events.loadRangePartitioned(spark, path, fromUs, toUs)))
    } finally q.stop()
  }
}
