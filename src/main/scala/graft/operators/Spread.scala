package graft.operators

import org.apache.spark.sql.DataFrame

/** Probe-side parallelism guard for pair-expansion joins.
  *
  * The self-join family (all-pairs cosine, LSH band buckets, length-band
  * levenshtein blocks, shingle prefix filters) shares a failure mode on
  * compact inputs: the probe side is a few MB, so it arrives as ONE scan
  * split (and the fixtures carry a single parquet row group, so
  * `maxPartitionBytes` can't split it either), the build side broadcasts
  * — and the O(candidates) join-condition work, orders of magnitude
  * larger than the input, runs in a single task while every other core
  * idles. AQE makes it worse for shuffled variants: partition coalescing
  * targets shuffle-READ bytes and is blind to join-output expansion, so
  * it happily merges the probe side back to one partition. Measured at
  * sf1: 10-14s → 0.7-2s per query once spread (16 cosine/levenshtein
  * queries were 75s of a 284s suite).
  *
  * [[ensure]] round-robins the frame up to `defaultParallelism` ONLY
  * when the planned scan has fewer partitions — on a real cluster where
  * a 100 TB corpus already reads as thousands of splits it is a no-op,
  * so it never inserts a corpus-wide shuffle where the layout is
  * already parallel.
  */
object Spread {
  def ensure(df: DataFrame): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    if (df.queryExecution.toRdd.getNumPartitions < p) df.repartition(p) else df
  }
}
