package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.Row

/** Scan-pruning contract for event time-range reads: the predicate must
  * reach the parquet scan (`PushedFilters`) so row-group/page min-max
  * stats prune I/O — at 100 TB the difference between scanning a day and
  * scanning the whole log. Pins the API guidance:
  *  - [[Events.loadRange]] / [[Events.timeRange]] push for EVERY ts
  *    encoding (predicate expressed in the column's native type);
  *  - a range filter on the normalized `ts` ALSO pushes (Catalyst
  *    unwraps the UTC NTZ cast in comparisons);
  *  - a range filter on the derived `ts_us` does NOT push
  *    (`unix_micros(cast(...))` never reaches the scan) — if this ever
  *    starts pushing, the guidance in Events.timeRange can relax.
  */
class EventScanPruningSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"
  private val fromUs = 1704844800000000L // 2024-01-10T00:00:00Z
  private val toUs   = 1705708800000000L // 2024-01-20T00:00:00Z

  private def scanLine(df: DataFrame): String = {
    val plan = df.queryExecution.executedPlan.toString
    plan.linesIterator.find(_.contains("FileScan parquet")).getOrElse(
      fail(s"no FileScan in plan:\n$plan"))
  }

  test("loadRange pushes both range bounds into the parquet scan") {
    val scan = scanLine(Events.loadRange(spark, sfDir, fromUs, toUs))
    assert(scan.contains("GreaterThanOrEqual(ts"), scan)
    assert(scan.contains("LessThan(ts"), scan)
  }

  test("range filter on normalized ts pushes; on ts_us it does not") {
    val ev = Events.load(spark, sfDir)
    val onTs = scanLine(ev.filter(
      col("ts") >= lit(Events.usInstant(fromUs)) &&
      col("ts") < lit(Events.usInstant(toUs))))
    assert(onTs.contains("GreaterThanOrEqual(ts"), onTs)
    val onUs = scanLine(ev.filter(
      col("ts_us") >= fromUs && col("ts_us") < toUs))
    assert(!onUs.contains("GreaterThanOrEqual(ts"),
      s"ts_us range now pushes — relax the guidance in Events.timeRange: $onUs")
  }

  test("loadRange equals load + post-hoc ts_us filter, bounds half-open") {
    val viaRange = Events.loadRange(spark, sfDir, fromUs, toUs)
      .select("event_id").collect().map(_.getLong(0)).toSet
    val viaFilter = Events.load(spark, sfDir)
      .filter(col("ts_us") >= fromUs && col("ts_us") < toUs)
      .select("event_id").collect().map(_.getLong(0)).toSet
    assert(viaRange == viaFilter)
    assert(viaRange.nonEmpty, "range must select something at sf0.001")
    val us = Events.loadRange(spark, sfDir, fromUs, toUs)
      .agg(min("ts_us"), max("ts_us")).head
    assert(us.getLong(0) >= fromUs && us.getLong(1) < toUs)
  }

  test("timeRange pushes on the legacy nanos-long encoding too") {
    val path = java.nio.file.Files.createTempDirectory("graft-nsrange")
      .toString + "/events.parquet"
    val micros = Seq(fromUs - 1L, fromUs, (fromUs + toUs) / 2, toUs - 1L, toUs)
    spark.createDataFrame(
      java.util.Arrays.asList(micros.zipWithIndex.map { case (us, i) =>
        Row(i.toLong, us * 1000L) }: _*),
      StructType(Seq(StructField("event_id", LongType), StructField("ts", LongType))))
      .write.mode("overwrite").parquet(path)
    val pruned = Events.timeRange(spark.read.parquet(path), fromUs, toUs)
    val scan = scanLine(pruned)
    assert(scan.contains("GreaterThanOrEqual(ts"), scan)
    // half-open [from, to): boundary rows resolve exactly
    assert(pruned.select("event_id").collect().map(_.getLong(0)).toSet
      == Set(1L, 2L, 3L))
  }

  test("NL route compiles to the same pushed-scan shape as loadRange") {
    val nl = graft.Engine.run(
      "Keep events between '2024-01-10T00:00:00Z' and '2024-01-20T00:00:00Z'.",
      Events.load(spark, sfDir))
    val scan = scanLine(nl)
    assert(scan.contains("GreaterThanOrEqual(ts"), scan)
    assert(nl.count() ==
      Events.loadRange(spark, sfDir, fromUs, toUs).count())
  }

  test("NL route accepts zoneless and date-only ISO forms") {
    val a = graft.Engine.run(
      "Keep events between '2024-01-10T00:00:00' and '2024-01-20T00:00:00'.",
      Events.load(spark, sfDir)).count()
    val b = graft.Engine.run(
      "Keep events between '2024-01-10' and '2024-01-20'.",
      Events.load(spark, sfDir)).count()
    val direct = Events.loadRange(spark, sfDir, fromUs, toUs).count()
    assert(a == direct && b == direct)
  }

  test("empty or reversed range fails at parse time with a named error") {
    val e = intercept[graft.plans.NLParser.ParseException](graft.plans.NLParser.parse(
      "Keep events between '2024-01-20' and '2024-01-10'."))
    assert(e.getMessage.contains("empty"))
  }
}
