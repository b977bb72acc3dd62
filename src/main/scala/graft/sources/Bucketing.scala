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

  /** Write `df` as a bucketed+sorted managed table (parquet). */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int): Unit =
    df.write
      .bucketBy(buckets, key)
      .sortBy(key)
      .mode("overwrite")
      .format("parquet")
      .saveAsTable(table)

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
