package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A named group of driver-checkable queries: every entry in `queries` is
  * runnable as `fn(spark, sfDir)` over the TESTDATA.md parquet tables, and
  * every key in `oracleSql` gives the equivalent ANSI SQL that DuckDB runs
  * over the same tables for the hash compare (Verify.scala). Keys without
  * an oracle get the driver's weaker rows-only check (hash-seeded or
  * engine-specific operators where no portable SQL exists). */
trait QueryPack {
  def queries: Map[String, (SparkSession, String) => DataFrame]
  def oracleSql: Map[String, String]
}
