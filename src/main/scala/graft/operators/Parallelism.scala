package graft.operators

import org.apache.spark.sql.DataFrame

/** Partitioning guard for CPU-bound per-row stages (codecs, scoring,
  * DP kernels): their cost must scale with CORES, not with how few
  * splits a compact input file happens to scan as (a single parquet
  * file at local scale reads as 1-2 partitions, idling the rest of the
  * machine through the expensive stage — measured 4.5× on the sf1 image
  * decode). `spreadToCores` repartitions up to the cluster's default
  * parallelism and NEVER shrinks an already-wide frame, so at real
  * scale (scans already wider than the core count) it is a no-op. */
object Parallelism {
  def spreadToCores(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= target) df else df.repartition(target)
  }
}
