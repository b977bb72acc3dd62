package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The sketch query's verified output is exact columns plus within-5%
  * booleans (the DuckDB oracle asserts the booleans TRUE). This spec
  * checks the same contract end-to-end at sf0.001 and additionally
  * recomputes the exact side independently, so a bug that made BOTH the
  * query's exact columns and its booleans wrong together would still
  * surface. */
class ApproxStatsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("q12 emits exact stats plus all-true approximation bounds") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val out = graft.SparkEntry.queries("q12_approx_stats")(spark, sf)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getBoolean(3), r.getBoolean(4), r.getBoolean(5))).toMap
    val exact = li.groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"), countDistinct(col("l_partkey")).as("d"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out.keySet == exact.keySet)
    exact.foreach { case (flag, (n, d)) =>
      val (qn, qd, partsOk, p50Ok, p95Ok) = out(flag)
      assert(qn == n, s"$flag: exact count mismatch: $qn vs $n")
      assert(qd == d, s"$flag: exact distinct mismatch: $qd vs $d")
      assert(partsOk, s"$flag: HLL estimate outside 5% of exact")
      assert(p50Ok, s"$flag: approx p50 outside 5% of exact")
      assert(p95Ok, s"$flag: approx p95 outside 5% of exact")
    }
  }

  test("independent recomputation: approximations really are within 5% of exact") {
    // The query's booleans compare values it computed itself; this check
    // recomputes BOTH sides from scratch so a wiring bug inside the query
    // (e.g. comparing ap50 against ep95) cannot self-certify.
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val rows = li.groupBy(col("l_returnflag"))
      .agg(approx_count_distinct(col("l_partkey")).as("ad"),
           countDistinct(col("l_partkey")).as("d"),
           percentile_approx(col("l_extendedprice"), lit(0.5), lit(1000)).as("ap50"),
           expr("percentile(l_extendedprice, 0.5)").as("p50"),
           percentile_approx(col("l_extendedprice"), lit(0.95), lit(1000)).as("ap95"),
           expr("percentile(l_extendedprice, 0.95)").as("p95"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val flag = r.getString(0)
      assert(math.abs(r.getLong(1) - r.getLong(2)).toDouble / r.getLong(2) < 0.05,
        s"$flag: HLL off: ${r.getLong(1)} vs ${r.getLong(2)}")
      assert(math.abs(r.getDouble(3) - r.getDouble(4)) / r.getDouble(4) < 0.05,
        s"$flag: p50 off: ${r.getDouble(3)} vs ${r.getDouble(4)}")
      assert(math.abs(r.getDouble(5) - r.getDouble(6)) / r.getDouble(6) < 0.05,
        s"$flag: p95 off: ${r.getDouble(5)} vs ${r.getDouble(6)}")
    }
  }
}
