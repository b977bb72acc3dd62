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

  /** Exact percentile threshold of an integer-domain column: the
    * smallest value v with cum_count(≤v) ≥ ⌈p·n⌉. Null values are
    * excluded (the same rows `countDistinct`/aggregates skip), never
    * folded into bin 0.
    *
    * Scale shape, small domains (lengths, token counts, cents —
    * distinct values ≤ `maxDriverValues`): ONE shuffle builds the
    * distinct-value histogram, the driver folds the tiny histogram into
    * a cumulative sum. Never a global sort, never a TakeOrdered of
    * 0.99·n rows.
    *
    * High-cardinality domains (a 64-bit id column) would materialize
    * millions of rows on the driver, so a distinct-count precheck routes
    * them to a binned refinement instead: equi-width bin counts locate
    * the bin holding the k-th value, then recurse into that bin — the
    * span shrinks ×`maxDriverValues` per pass, so a full 64-bit domain
    * resolves in ≤ 4 scans with a bounded (≤ maxDriverValues rows)
    * driver fold each. Both paths return the identical exact value, so
    * the route never shows in results or oracles. */
  def percentileByHistogram(df: DataFrame, valueCol: String, p: Double,
                            maxDriverValues: Int = 1 << 16): Long = {
    require(p > 0.0 && p <= 1.0, s"percentile out of (0,1]: $p")
    // ≥16 keeps ceil(2⁶⁴/bins) inside a long even for the full domain
    require(maxDriverValues >= 16, s"need ≥16 driver bins, got $maxDriverValues")
    val vals = df.filter(col(valueCol).isNotNull)
      .select(col(valueCol).cast("long").as("__v"))
    val agg = vals.agg(count(lit(1)).as("n"), min(col("__v")).as("lo"),
        max(col("__v")).as("hi"),
        approx_count_distinct(col("__v")).as("nd")).head()
    require(agg.getLong(0) > 0, "percentile of an empty frame")
    val k = math.ceil(p * agg.getLong(0)).toLong
    // routing only — both branches compute the same exact value, so the
    // HLL estimate's few-% error can at worst let a slightly-oversized
    // histogram through, never change the answer
    if (agg.getLong(3) <= maxDriverValues)
      kthExact(vals, k, agg.getLong(1), agg.getLong(2))
    else kthByRange(vals, k, agg.getLong(1), agg.getLong(2), maxDriverValues)
  }

  /** Driver cumsum over the exact distinct-value histogram of
    * `vals.__v` restricted to [lo, hi]. */
  private def kthExact(vals: DataFrame, k: Long, lo: Long, hi: Long): Long = {
    val hist = vals.filter(col("__v").between(lo, hi))
      .groupBy(col("__v")).agg(count(lit(1)).as("cnt"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    var cum = 0L
    hist.find { case (_, c) => cum += c; cum >= k }.get._1
  }

  /** Binned narrowing for domains too wide for one driver histogram:
    * count per equi-width bin over [lo, hi], descend into the bin
    * containing the k-th value. BigInt span/edge arithmetic (hi−lo can
    * overflow a long across the full 64-bit domain); the bin key is an
    * exact integral `DIV` over a decimal offset — v−lo is nonnegative so
    * truncation IS floor, and decimal(38,0) holds the 20-digit offsets
    * exactly (a float/decimal true-division `floor` would round at the
    * result scale and could misplace boundary values into the adjacent
    * bin). */
  @annotation.tailrec
  private def kthByRange(vals: DataFrame, k: Long, lo: Long, hi: Long,
                         bins: Int): Long = {
    val span = BigInt(hi) - BigInt(lo) + 1
    if (span <= bins) kthExact(vals, k, lo, hi)
    else {
      val width = ((span + bins - 1) / bins).toLong
      val counts = vals.filter(col("__v").between(lo, hi))
        .selectExpr(s"(CAST(__v AS DECIMAL(38,0)) - ($lo)) DIV ${width}L AS __b")
        .groupBy(col("__b")).agg(count(lit(1)).as("cnt"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
      var before = 0L
      val b = counts.find { case (_, c) =>
        if (before + c >= k) true else { before += c; false }
      }.get._1
      val newLo = (BigInt(lo) + BigInt(b) * width).toLong
      val newHi = (BigInt(newLo) + (width - 1)).min(BigInt(hi)).toLong
      kthByRange(vals, k - before, newLo, newHi, bins)
    }
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
