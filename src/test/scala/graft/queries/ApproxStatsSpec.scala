package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Sketch aggregates have no portable oracle; assert accuracy bounds
  * against exact computation instead. */
class ApproxStatsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("approx_count_distinct within 5% of exact; percentiles bracket exact rank") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val approx = graft.SparkEntry.queries("q12_approx_stats")(spark, sf)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    val exact = li.groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("d"),
           expr("percentile(l_extendedprice, 0.5)").as("p50"),
           expr("percentile(l_extendedprice, 0.95)").as("p95"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    exact.foreach { case (flag, (d, p50, p95)) =>
      val (ad, ap50, ap95) = approx(flag)
      assert(math.abs(ad - d).toDouble / d < 0.05, s"$flag: HLL off: $ad vs $d")
      assert(math.abs(ap50 - p50) / p50 < 0.05, s"$flag: p50 off: $ap50 vs $p50")
      assert(math.abs(ap95 - p95) / p95 < 0.05, s"$flag: p95 off: $ap95 vs $p95")
    }
  }
}
