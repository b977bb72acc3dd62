package graft

/** Driver-contract invariants: the shapes Verify/Bench and the DuckDB
  * compare depend on. */
class SparkEntrySpec extends SparkSpec {

  test("entry returns rows on sf0.001 (driver smoke)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key names an implemented query") {
    val orphans = SparkEntry.oracleSql.keySet diff SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracle entries without queries: $orphans")
  }

  test("rows-only queries are the documented engine-random set") {
    // x5/x6/x12 are deterministic hash pipelines and carry full DuckDB
    // oracles (OracleHashSql); only genuinely engine-random structures
    // (seeded LSH planes, kmeans centroids, sketch internals) remain
    // rows-only, each with a recall/accuracy spec instead.
    val rowsOnly = SparkEntry.queries.keySet diff SparkEntry.oracleSql.keySet
    assert(rowsOnly == Set("x2_ann_lsh", "x20_ann_ivf", "q12_approx_stats"),
      s"unexpected rows-only set: $rowsOnly — add an oracle or document why not")
  }

  test("oracle SQL never carries tabs/CRs that would break the driver's JSON") {
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      assert(!sql.contains("\t") && !sql.contains("\r"), s"$name has tab/CR")
    }
  }

  test("every query runs and returns a non-degenerate schema at sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, "/root/testdata/sf0.001")
      assert(df.columns.nonEmpty, s"$name has no columns")
      assert(df.columns.length == df.columns.distinct.length,
        s"$name has duplicate column names: ${df.columns.mkString(",")}")
    }
  }
}
