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
}
