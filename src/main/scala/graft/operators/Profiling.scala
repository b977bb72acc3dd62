package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Data-profiling operators — the "what does this column look like"
  * pass a pipeline runs before choosing filters and mixtures.
  *
  * Both operators are exact and engine-deterministic (integer counts,
  * closed-form bin arithmetic), so they carry full value-level oracles —
  * no approximation to bound. */
object Profiling {

  /** Fixed-bin equi-width histogram of `valueCol` per `groupCol`:
    * bin i covers [lo + i·w, lo + (i+1)·w), w = (hi−lo)/bins, with
    * underflow clamped to bin 0 and overflow to bin `bins−1`.
    *
    * One shuffle of (group, bin) partial counts — the profile of a
    * 100 TB column moves `groups × bins` longs, nothing else. Bins are
    * data-independent (caller-fixed lo/hi), which is what makes
    * histograms of separate shards/days MERGEABLE by plain bin-sum —
    * the same property the HLL sketches provide for distinct counts. */
  def histogram(df: DataFrame, valueCol: String, groupCol: String,
                lo: Double, hi: Double, bins: Int): DataFrame = {
    require(bins > 0 && hi > lo, s"need bins>0 and hi>lo, got $bins, [$lo,$hi)")
    val w = (hi - lo) / bins
    val bin = least(greatest(
      floor((col(valueCol) - lit(lo)) / lit(w)).cast("long"),
      lit(0L)), lit((bins - 1).toLong))
    df.groupBy(col(groupCol), bin.as("bin"))
      .agg(count(lit(1)).as("n"))
      .select(col(groupCol), col("bin"),
              (lit(lo) + col("bin") * lit(w)).as("bin_lo"),
              col("n"))
  }

  /** Exact percentile threshold of an integer-domain column via its
    * value histogram: the smallest value v with cum_count(≤v) ≥ ⌈p·n⌉.
    *
    * Scale shape: ONE shuffle builds the distinct-value histogram
    * (bounded by the value domain, not the row count — document lengths,
    * token counts, prices-in-cents all qualify); the driver folds the
    * tiny histogram into a cumulative sum. Never a global sort, never a
    * TakeOrdered of 0.99·n rows. */
  def percentileByHistogram(df: DataFrame, valueCol: String,
                            p: Double): Long = {
    require(p > 0.0 && p <= 1.0, s"percentile out of (0,1]: $p")
    val hist = df.groupBy(col(valueCol).cast("long").as("__v"))
      .agg(count(lit(1)).as("cnt"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    require(hist.nonEmpty, "percentile of an empty frame")
    val n = hist.map(_._2).sum
    val k = math.ceil(p * n).toLong
    var cum = 0L
    hist.find { case (_, c) => cum += c; cum >= k }.get._1
  }

  /** Per-group z-score normalization of an INTEGER-domain column.
    *
    * Determinism: the moments are exact integer sums (`sum(x)` and
    * `sum(x²)` over longs — order-free), so mean/std come from a fixed
    * sequence of single-rounded IEEE ops (two divisions, one multiply,
    * one subtract, one sqrt) that DuckDB reproduces bit-for-bit — the
    * reason this avoids float `avg`/`stddev`, whose partial-merge order
    * would differ per partitioning. A constant group (std = 0) scores 0,
    * not NaN.
    *
    * Shape: one tiny per-group stats aggregate (broadcast back), then
    * map-side arithmetic — the corpus is scanned twice, shuffled never.
    * Precondition: Σx² must fit a long (true for lengths/counts/cents at
    * any corpus size that fits a cluster; overflow throws, not wraps,
    * under ANSI mode — and the oracle's HUGEINT would expose it). */
  def zscore(df: DataFrame, valueCol: String, groupCol: String): DataFrame = {
    // cast BEFORE multiplying: an IntegerType column's int×int product
    // overflows at 46341² even when the long sum is fine
    val v = col(valueCol).cast("long")
    val stats = df.groupBy(col(groupCol)).agg(
        sum(v).as("__s"),
        sum(v * v).as("__sq"),
        count(lit(1)).as("__n"))
      .withColumn("__mean", col("__s").cast("double") / col("__n").cast("double"))
      .withColumn("__std",
        sqrt(col("__sq").cast("double") / col("__n").cast("double")
          - col("__mean") * col("__mean")))
      .select(col(groupCol), col("__mean"), col("__std"))
    df.join(stats, Seq(groupCol))
      .withColumn("z", round(
        when(col("__std") === 0d, 0d)
          .otherwise((col(valueCol).cast("double") - col("__mean")) / col("__std")),
        6))
      .drop("__mean", "__std")
  }

  /** Outlier clip: rows with `valueCol` ≤ the exact p-th percentile —
    * the standard "drop the pathological tail before training" cut. */
  def clipAbovePercentile(df: DataFrame, valueCol: String,
                          p: Double): DataFrame =
    df.filter(col(valueCol) <= lit(percentileByHistogram(df, valueCol, p)))
}
