package graft.operators

import java.sql.Timestamp

import graft.SparkSpec
import graft.streaming.EventStreams
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Per-day compaction of the partitioned event-log layout: many small
  * files (the shape streaming ingest leaves behind) collapse into
  * ts-range-tiled files with identical content, and a tree still
  * managed by a streaming sink log refuses to compact until graduated.
  */
class EventCompactionSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private def dayFiles(path: String, dt: String): Array[java.io.File] =
    new java.io.File(s"$path/dt=$dt").listFiles()
      .filter(_.getName.endsWith(".parquet"))

  test("compactDay collapses small files, preserves rows, tiles by ts") {
    val path = java.nio.file.Files.createTempDirectory("graft-compact")
      .toString + "/log"
    // 16 shuffled partitions → 16 small files per day directory
    Events.writeDayPartitioned(
      Events.load(spark, sfDir).repartition(16), path)
    val dt = "2024-01-10"
    val before = dayFiles(path, dt)
    // one file per input partition holding rows for this day (a round-
    // robin partition can miss a thin day, so allow a small shortfall)
    assert(before.length >= 8, s"expected many small files, got ${before.length}")
    val beforeRows = spark.read.parquet(s"$path/dt=$dt")
      .select("event_id").collect().map(_.getLong(0)).toSet

    val n = Events.compactDay(spark, path, dt)
    val after = dayFiles(path, dt)
    assert(after.length.toLong == n && n < before.length)
    val afterRows = spark.read.parquet(s"$path/dt=$dt")
      .select("event_id").collect().map(_.getLong(0)).toSet
    assert(afterRows == beforeRows)
    // files tile the day: per-file [min, max] ts ranges do not overlap
    val ranges = after.map { f =>
      val r = spark.read.parquet(f.toString)
        .agg(min("ts"), max("ts")).head
      (r.getTimestamp(0).getTime, r.getTimestamp(1).getTime)
    }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hi), (lo, _)) => assert(hi <= lo, "file ranges overlap")
      case _ => ()
    }
    // untouched days still read through the root with dt intact
    val viaRoot = Events.loadRangePartitioned(spark, path,
      1704844800000000L, 1705708800000000L)
    assert(viaRoot.count() ==
      Events.loadRange(spark, sfDir, 1704844800000000L, 1705708800000000L).count())
  }

  test("a sink-log-managed tree refuses compaction until graduated") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-compact-s").toString
    val path = s"$dir/log"
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EventStreams.Event]
    val q = EventStreams.ingestDayPartitioned(input.toDF(), path, s"$dir/ckpt")
    try {
      (1 to 5).foreach { i =>
        input.addData(EventStreams.Event(i.toLong,
          Timestamp.from(java.time.Instant.parse(f"2024-01-10T0$i%d:00:00Z")),
          i.toLong, "view", 1.0))
        q.processAllAvailable()
      }
    } finally q.stop()
    assert(dayFiles(path, "2024-01-10").length == 5, "one file per trigger")

    val e = intercept[RuntimeException](
      Events.compactDay(spark, path, "2024-01-10"))
    assert(e.getMessage.contains("_spark_metadata"))

    // graduate: ingest stopped, drop the sink log, compact, re-read
    val rowsBefore = spark.read.parquet(path)
      .select("event_id").collect().map(_.getLong(0)).toSet
    org.apache.commons.io.FileUtils.deleteDirectory(
      new java.io.File(s"$path/_spark_metadata"))
    val n = Events.compactDay(spark, path, "2024-01-10")
    assert(n == 1L && dayFiles(path, "2024-01-10").length == 1)
    val rowsAfter = spark.read.parquet(path)
      .select("event_id").collect().map(_.getLong(0)).toSet
    assert(rowsAfter == rowsBefore)
  }
}
