package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

import graft.functions.ZOrderFunctions.zvalue

/** Multi-dimensional data layout (Z-order clustering).
  *
  * A 100 TB fact table is usually range-laid-out on ONE key; queries
  * filtering on a second dimension then scan everything. Writing the
  * table ordered by the Morton code of the two filter keys makes every
  * file a 2-d tile: a predicate on EITHER key prunes ~√(files) instead
  * of none, straight from parquet min/max footer stats — no index, no
  * extra service, just row order.
  *
  * `zOrdered` is the write-time shape: range-repartition on the z-value
  * (so files tile the curve) and sort within partitions (so each file's
  * min/max stats are tight). The curve key itself ([[zvalue]]) is a
  * codegen'd branch-free interleave. */
object Layout {

  /** Rewrite `df` in Z-order of (`aCol`, `bCol`): range partition + sort
    * on the interleaved key, ready for a stats-pruned write. */
  def zOrdered(df: DataFrame, aCol: String, bCol: String,
               partitions: Int = 0): DataFrame = {
    val keyed = df.withColumn("zvalue", zvalue(col(aCol), col(bCol)))
    val n = if (partitions > 0) partitions
            else df.sparkSession.sessionState.conf.numShufflePartitions
    keyed.repartitionByRange(n, col("zvalue"))
      .sortWithinPartitions(col("zvalue"))
  }
}
