package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Day-partitioned event-log layout: writeDayPartitioned lays the log
  * out as dt=yyyy-MM-dd directories; loadRangePartitioned must prune
  * whole days from the FILE LISTING (PartitionFilters) — at 100 TB the
  * pruning that happens before any parquet footer is opened — and still
  * return exactly the rows the single-file range scan returns.
  */
class EventPartitionedLayoutSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"
  private val fromUs = 1704844800000000L // 2024-01-10T00:00:00Z
  private val toUs   = 1705708800000000L // 2024-01-20T00:00:00Z

  private lazy val layoutPath = {
    val p = java.nio.file.Files.createTempDirectory("graft-daylayout")
      .toString + "/events_day"
    Events.writeDayPartitioned(Events.load(spark, sfDir), p)
    p
  }

  test("layout writes one dt=yyyy-MM-dd directory per UTC day") {
    val days = new java.io.File(layoutPath).listFiles()
      .filter(_.isDirectory).map(_.getName).filter(_.startsWith("dt="))
    assert(days.length == 30, s"got ${days.toSeq.sorted}") // fixture spans Jan 2024
    assert(days.forall(_.matches("dt=2024-01-\\d{2}")))
  }

  test("range read prunes day directories via PartitionFilters") {
    val plan = Events.loadRangePartitioned(spark, layoutPath, fromUs, toUs)
      .queryExecution.executedPlan.toString
    val scan = plan.linesIterator.find(_.contains("FileScan parquet"))
      .getOrElse(fail(plan))
    assert(scan.contains("PartitionFilters: [") &&
           scan.contains("(dt#") && scan.contains("2024-01-10"), scan)
    // the ts predicate still prunes row groups within surviving days
    assert(scan.contains("GreaterThanOrEqual(ts"), scan)
  }

  test("partitioned range read equals the single-file range scan") {
    val viaLayout = Events.loadRangePartitioned(spark, layoutPath, fromUs, toUs)
      .select("event_id", "ts_us").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val viaFile = Events.loadRange(spark, sfDir, fromUs, toUs)
      .select("event_id", "ts_us").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaLayout == viaFile)
    assert(viaLayout.nonEmpty)
  }

  test("files ascend by ts, so row-group stats carry tight time ranges") {
    val day = new java.io.File(layoutPath).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("dt=")).minBy(_.getName)
    day.listFiles().filter(_.getName.endsWith(".parquet")).foreach { f =>
      val ts = spark.read.parquet(f.toString)
        .select("ts").collect().map(_.getTimestamp(0).getTime)
      assert(ts.sameElements(ts.sorted), s"${f.getName} not ts-ascending")
    }
  }

  test("dt derivation is session-timezone independent") {
    // Under a non-UTC session, date_format(ts, ...) would shift day
    // boundaries: an event at 2024-01-10T02:00Z formats as 2024-01-09 in
    // America/Los_Angeles, so the written directories would disagree
    // with loadRangePartitioned's hardcoded-UTC dt bounds and boundary
    // rows would silently drop. utcDt derives the day arithmetically
    // from epoch micros, so writer and reader agree under any zone.
    val tzKey = "spark.sql.session.timeZone"
    val saved = spark.conf.get(tzKey)
    val p = java.nio.file.Files.createTempDirectory("graft-daylayout-tz")
      .toString + "/events_day"
    try {
      spark.conf.set(tzKey, "America/Los_Angeles")
      Events.writeDayPartitioned(Events.load(spark, sfDir), p)
      val viaLayout = Events.loadRangePartitioned(spark, p, fromUs, toUs)
        .select("event_id").collect().map(_.getLong(0)).toSet
      spark.conf.set(tzKey, saved)
      val viaFile = Events.loadRange(spark, sfDir, fromUs, toUs)
        .select("event_id").collect().map(_.getLong(0)).toSet
      assert(viaLayout == viaFile)
      assert(viaLayout.nonEmpty)
      val days = new java.io.File(p).listFiles()
        .filter(_.isDirectory).map(_.getName).filter(_.startsWith("dt="))
      assert(days.length == 30, s"got ${days.toSeq.sorted}") // the UTC day set
    } finally spark.conf.set(tzKey, saved)
  }

  test("timeRange rejects bounds whose nanos overflow Long") {
    val ev = spark.range(1).selectExpr("id as ts") // LongType ts
    intercept[ArithmeticException] {
      Events.timeRange(ev.toDF(), Long.MaxValue / 100L, Long.MaxValue / 99L)
    }
  }

  test("dt bounds cover ragged ranges: mid-day from, mid-day to") {
    val f = fromUs + 7L * 3600 * 1000000 // 07:00 into the first day
    val t = toUs - 5L * 3600 * 1000000   // 19:00 into the last day
    val viaLayout = Events.loadRangePartitioned(spark, layoutPath, f, t)
      .select("event_id").collect().map(_.getLong(0)).toSet
    val viaFile = Events.loadRange(spark, sfDir, f, t)
      .select("event_id").collect().map(_.getLong(0)).toSet
    assert(viaLayout == viaFile)
  }
}
