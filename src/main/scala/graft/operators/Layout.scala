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

  /** Small-file compaction: rewrite a parquet directory into files of
    * roughly `targetBytes` each — the maintenance pass every streaming
    * or frequently-appended table needs (a 100 TB table that ingests in
    * 1 MB increments is unreadable long before it is full; file count,
    * not data size, kills the driver's split enumeration and S3 listing).
    *
    * The partition count comes from the CURRENT on-disk byte size (file
    * status, no data scan) — compression ratio is preserved by
    * construction since the data is recompressed the same way. Uses
    * round-robin repartition (no key skew: files come out uniform), and
    * writes to a fresh directory — atomic swap is the caller's move. */
  def compactFiles(spark: org.apache.spark.sql.SparkSession,
                   inDir: String, outDir: String,
                   targetBytes: Long = 128L << 20): Long = {
    require(targetBytes > 0, "targetBytes must be positive")
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(inDir), spark.sparkContext.hadoopConfiguration)
    // recursive byte total: a hive-partitioned table keeps its parquet
    // under key=.../ subdirectories, where a top-level listing sees zero
    // bytes and would collapse everything into one partition
    val totalBytes = fs.getContentSummary(
      new org.apache.hadoop.fs.Path(inDir)).getLength
    val parts = math.max(1L, (totalBytes + targetBytes - 1) / targetBytes).toInt
    spark.read.parquet(inDir).repartition(parts)
      .write.mode("overwrite").parquet(outDir)
    parts.toLong
  }
}
