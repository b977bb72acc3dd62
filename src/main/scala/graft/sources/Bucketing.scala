package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table layout for co-located fact⋈fact joins.
  *
  * At 100 TB the recurring cost of a lineitem⋈orders-shaped join is the
  * shuffle of both fact sides. Writing both tables bucketed (and
  * sorted) by the join key puts co-joining rows in matching files, so
  * Catalyst plans the join with NO Exchange on either side — the shuffle
  * is paid once at write time and amortized over every subsequent join.
  * BucketedJoinSpec asserts the exchange-free plan. */
object Bucketing {

  /** Write `df` as a bucketed+sorted managed table (parquet).
    *
    * A managed-table LOCATION can outlive the session that wrote it (the
    * default in-memory catalog forgets the table, the warehouse files
    * remain), and `saveAsTable(overwrite)` only replaces locations the
    * CURRENT catalog knows — so drop both the catalog entry and any
    * stale location before writing. */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val loc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), table.toLowerCase)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    df.write
      .bucketBy(buckets, key)
      .sortBy(key)
      .mode("overwrite")
      .format("parquet")
      .saveAsTable(table)
  }

  /** Join two bucketed tables on their bucket key. When both sides are
    * bucketed with the same bucket count on the join key, the plan has no
    * shuffle (and no sort, if sortBy matched). */
  def coLocatedJoin(spark: SparkSession, leftTable: String,
                    rightTable: String, leftKey: String,
                    rightKey: String): DataFrame = {
    val l = spark.table(leftTable)
    val r = spark.table(rightTable)
    l.join(r, l(leftKey) === r(rightKey))
  }
}
