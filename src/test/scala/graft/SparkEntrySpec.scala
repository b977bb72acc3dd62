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

  test("every query carries a full DuckDB oracle — no rows-only checks") {
    // Once the LSH planes became a pure splitmix64 function (baked into
    // SQL), IVF centroids proved RNG-free, and the sketch query gained
    // its error-bound boolean oracle, nothing engine-random remained.
    // Any new query must ship with an oracle or fail here loudly.
    val rowsOnly = SparkEntry.queries.keySet diff SparkEntry.oracleSql.keySet
    assert(rowsOnly.isEmpty,
      s"rows-only queries: $rowsOnly — add an oracle or document why not")
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
