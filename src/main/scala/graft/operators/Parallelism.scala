package graft.operators

import org.apache.spark.sql.DataFrame

/** Partitioning guard for CPU-bound per-row stages (codecs, scoring,
  * DP kernels) AND for pair-expansion join probes (all-pairs cosine,
  * LSH band buckets, simhash chunks, length-band levenshtein): their
  * cost must scale with CORES, not with how few splits a compact input
  * file happens to scan as (a single parquet file at local scale reads
  * as 1-2 partitions, idling the rest of the machine through the
  * expensive stage — measured 4.5× on the sf1 image decode and 7-13×
  * on the sf1 pair-dedup family). AQE cannot fix the join case: its
  * partition coalescing targets shuffle-READ bytes and is blind to
  * join-OUTPUT expansion, so it happily merges a few-MB probe side back
  * to one partition ahead of an O(n²/buckets) candidate loop.
  * `spreadToCores` repartitions up to the cluster's default parallelism
  * and NEVER shrinks an already-wide frame, so at real scale (scans
  * already wider than the core count) it is a no-op and never inserts
  * a corpus-wide shuffle where the layout is already parallel.
  *
  * NOT for stages whose OUTPUT depends on partition merge order —
  * genuine floating-point reductions whose partials are non-integer.
  * Two lookalikes are actually safe and spread: integer-valued double
  * sums (exact in double below 2^53 at any merge order, e.g.
  * corpusStats' length average) and the Misra-Gries candidate sketch
  * (order-dependent STATE, but the exact-count re-rank makes the
  * output invariant whenever the top-k clear the heaviness bound the
  * operator contract asserts). */
object Parallelism {
  def spreadToCores(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    // Partition count from the Dataset's OWN cached QueryExecution:
    // `df.rdd` would wrap the plan in DeserializeToObject and run a
    // SECOND analyze/optimize/plan pass on every guarded call (plus a
    // row-conversion stage nobody executes). `toRdd` reuses the physical
    // plan the subsequent action will execute anyway — still no job for
    // the scan-rooted frames this guard sees (partition enumeration is
    // file-split listing, already cached in the FileIndex).
    val current = df.queryExecution.toRdd.getNumPartitions
    if (current >= target) df else df.repartition(target)
  }
}
