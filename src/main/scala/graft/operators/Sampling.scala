package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

import graft.functions.SketchFunctions.sampleHash

/** Corpus sampling and mixture weighting — how a training run draws from
  * heterogeneous sources at target proportions.
  *
  * Two families:
  *  - **hash-deterministic** (`hashSample` / `stratifiedHash` /
  *    `mixtureHash`): inclusion is a pure function of (row id, seed) —
  *    `splitmix64(id ^ salt)` bucketed into [0, 2⁵³), kept when the
  *    bucket falls under `fraction·2⁵³`. Reproducible across runs,
  *    partitionings, and engines (DuckDB-oracle checked), and the sample
  *    *monotonically grows* with the fraction (a 1% sample is a subset of
  *    a 2% sample) — the property a training pipeline needs to scale a
  *    mixture up without resampling everything.
  *  - **rand-based** (`stratified` / `mixture` / `qualitySample`): thin
  *    wrappers over Spark's Bernoulli sampling; deterministic only for a
  *    fixed partitioning, kept for API parity with `DataFrame.sample`.
  *
  * Both are map-side filters (no shuffle, no collect). Proportions are
  * expectations, not exact counts — exactness would require a global sort
  * or count, which is the wrong trade at 100 TB.
  */
object Sampling {

  /** 2⁵³ buckets: the hash is shifted to 53 bits so thresholds are exact
    * in the double→long conversion and positive in signed comparisons. */
  private val BucketBits = 53

  /** fraction → inclusion threshold in [0, 2⁵³]. */
  def threshold(fraction: Double): Long = {
    require(fraction >= 0.0 && fraction <= 1.0, s"fraction out of range: $fraction")
    (fraction * (1L << BucketBits)).toLong
  }

  /** The row's sample bucket in [0, 2⁵³): top 53 bits of the mixed hash. */
  def sampleBucket(id: Column, seed: Long): Column =
    shiftrightunsigned(sampleHash(id, seed), 64 - BucketBits)

  /** Deterministic Bernoulli(fraction) keyed on `idCol` — pure map-side. */
  def hashSample(df: DataFrame, fraction: Double, seed: Long,
                 idCol: String = "doc_id"): DataFrame =
    df.filter(sampleBucket(col(idCol), seed) < lit(threshold(fraction)))

  /** Deterministic per-stratum sampling: keep rows of stratum s when the
    * bucket falls under threshold(fractions(s)); absent strata keep 0. */
  def stratifiedHash(df: DataFrame, stratumCol: String,
                     fractions: Map[String, Double], seed: Long,
                     idCol: String = "doc_id"): DataFrame = {
    val thr = fractions.toSeq.sortBy(_._1).foldLeft(lit(0L)) {
      case (acc, (stratum, f)) =>
        when(col(stratumCol) === stratum, lit(threshold(f))).otherwise(acc)
    }
    df.filter(sampleBucket(col(idCol), seed) < thr)
  }

  /** Temperature-flattened source mixing at T=2 (α=1/2): each source s
    * is down-sampled at rate √(min_n / n_s), so post-sample source
    * proportions go as √n_s — the standard temperature rebalance that
    * keeps rare domains from drowning (the smallest source keeps rate 1;
    * nothing upsamples — compose with [[upsample]] for α-weights > 1).
    *
    * α is FIXED at 1/2 deliberately: `sqrt` and division are IEEE
    * correctly-rounded single operations, so `√(min_n/n_s)` is
    * bit-identical in the JVM and DuckDB and the thresholds bake into the
    * oracle exactly. A free-α variant would ride on `pow`, which carries
    * no cross-engine rounding guarantee — determinism would quietly
    * become "probably equal".
    *
    * Two passes: a counts aggregate (one row per source — driver-tiny,
    * same class of action as the IVF centroid fetch) and a map-side
    * threshold filter. No data-sized shuffle. */
  def temperatureSample(df: DataFrame, sourceCol: String, seed: Long,
                        idCol: String = "doc_id"): DataFrame = {
    // stratify on a string view of the column so integer/date domains
    // work through the same string-keyed rate map; nulls coalesce to a
    // reserved sentinel so they form their own stratum (sampled at the
    // temperature rate) instead of silently vanishing through a null map
    // key that stratifiedHash's equality chain can never match
    val keyed = df.withColumn("__stratum",
      coalesce(col(sourceCol).cast("string"), lit("\u0000__null__")))
    val counts = keyed.groupBy(col("__stratum")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
    require(counts.nonEmpty, "temperatureSample on an empty frame")
    val minN = counts.map(_._2).min
    val rates = counts.map { case (s, n) =>
      s -> StrictMath.sqrt(minN.toDouble / n.toDouble)
    }.toMap
    stratifiedHash(keyed, "__stratum", rates, seed, idCol).drop("__stratum")
  }

  /** Deterministic weighted mixture: each source hash-sampled at its
    * weight and tagged — reproducible pre-training mixture weighting.
    * Weights > 1.0 are capped (upsampling needs explicit replication). */
  def mixtureHash(sources: Seq[(String, DataFrame, Double)], seed: Long,
                  idCol: String = "doc_id"): DataFrame = {
    require(sources.nonEmpty)
    sources.map { case (name, df, weight) =>
      hashSample(df, math.min(weight, 1.0), seed, idCol)
        .withColumn("mixture_source", lit(name))
    }.reduce(_ unionByName _)
  }

  /** Deterministic exactly-k sample: the k rows with the smallest
    * (sample bucket, id) — a uniform-without-replacement draw of fixed
    * size with a total engine-independent order (fraction-based
    * [[hashSample]] can only hit a size in expectation). Compiles to
    * `TakeOrderedAndProject`: each partition keeps its local top-k, the
    * driver merges k-sized heaps — no global sort, no single-partition
    * window, so it holds at any corpus size. */
  def sampleExactK(df: DataFrame, k: Int, seed: Long,
                   idCol: String = "doc_id"): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    df.orderBy(sampleBucket(col(idCol), seed).asc, col(idCol).asc).limit(k)
  }

  /** Deterministic upsampling: replicate every row ⌊times⌋ times (tagged
    * epoch 0..⌊times⌋-1) plus a hash-sampled fraction of the rows once
    * more (epoch ⌊times⌋) — how a pre-training mixture runs a source for
    * a non-integer number of epochs without RNG state. Pure map-side
    * explode + filter: no shuffle, and membership of the fractional
    * epoch is the same (id, seed)-pure predicate as [[hashSample]], so
    * the replication plan is reproducible row-for-row at any scale. */
  def upsample(df: DataFrame, times: Double, seed: Long,
               idCol: String = "doc_id"): DataFrame = {
    require(times > 0.0, s"times must be positive, got $times")
    val full = math.floor(times).toInt
    val frac = times - full
    val fullPart =
      if (full > 0) Seq(df.withColumn("epoch",
        explode(array((0 until full).map(e => lit(e.toLong)): _*))))
      else Nil
    val fracPart =
      if (frac > 1e-12) Seq(hashSample(df, frac, seed, idCol)
        .withColumn("epoch", lit(full.toLong)))
      else Nil
    val parts = fullPart ++ fracPart
    // times ∈ (0, 1e-12]: no full epoch and the fractional arm rounds to
    // nothing — an empty replication, not an error
    if (parts.isEmpty) df.limit(0).withColumn("epoch", lit(0L))
    else parts.reduce(_ unionByName _)
  }

  /** Deterministic weighted mixture WITH upsampling: each source runs
    * `weight` epochs via [[upsample]] and is tagged — the full mixture
    * table of a pre-training run (the capped [[mixtureHash]] covers the
    * downsample-only case). */
  def mixtureUpsampled(sources: Seq[(String, DataFrame, Double)], seed: Long,
                       idCol: String = "doc_id"): DataFrame = {
    require(sources.nonEmpty)
    sources.map { case (name, df, weight) =>
      upsample(df, weight, seed, idCol).withColumn("mixture_source", lit(name))
    }.reduce(_ unionByName _)
  }

  /** Deterministic per-group cap: keep at most `k` rows per group, chosen
    * by ascending (sample bucket, id) — a uniform-without-replacement
    * draw per group with a total, engine-independent order, so the DuckDB
    * oracle reproduces the exact kept set. The "cap each domain's
    * contribution" step of mixture building (a fraction-based sample
    * can't bound a pathologically large source; a cap does).
    *
    * One shuffle on the group key; the rank input is the group's rows.
    * For groups too large to co-locate, the partial top-k `Aggregator`
    * pattern (ANN TopK / TopTokensAgg) bounds it to k per partition. */
  def capPerGroup(df: DataFrame, groupCol: String, k: Int, seed: Long,
                  idCol: String = "doc_id"): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
      .orderBy(sampleBucket(col(idCol), seed), col(idCol))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .drop("__rn")
  }

  /** Deterministic train/validation/test split: every row is labeled by
    * its sample bucket against cumulative fraction thresholds, so the
    * assignment is a pure function of (id, seed) — stable under
    * repartitioning, reruns, and incremental appends (a new row's label
    * never depends on other rows), which is the property a 100 TB
    * pipeline needs to keep held-out data held out across rebuilds. The
    * final split absorbs the bucket tail, so fractions that sum to 1
    * partition every row. Pure map-side column work, no shuffle. */
  def assignSplits(df: DataFrame, splits: Seq[(String, Double)], seed: Long,
                   idCol: String = "doc_id"): DataFrame = {
    require(splits.nonEmpty, "need at least one split")
    require(splits.forall(_._2 > 0.0), s"split fractions must be positive: $splits")
    require(splits.map(_._1).distinct.size == splits.size,
            s"split labels must be distinct: ${splits.map(_._1)}")
    val total = splits.map(_._2).sum
    require(math.abs(total - 1.0) < 1e-9, s"split fractions must sum to 1, got $total")
    val bucket = sampleBucket(col(idCol), seed)
    val cum = splits.map(_._2).scanLeft(0.0)(_ + _).tail
    val label = splits.init.zip(cum.init).foldRight(lit(splits.last._1)) {
      case (((l, _), c), acc) => when(bucket < lit(threshold(c)), lit(l)).otherwise(acc)
    }
    df.withColumn("split", label)
  }

  /** Per-stratum Bernoulli sampling: keep rows of stratum s with
    * probability fractions(s) (absent strata keep 0). */
  def stratified(df: DataFrame, stratumCol: String,
                 fractions: Map[String, Double], seed: Long): DataFrame =
    df.stat.sampleBy(stratumCol, fractions, seed)

  /** Weighted mixture of sources: each source Bernoulli-sampled at its
    * weight and tagged with its name — the "mixture weights" step of a
    * pre-training data pipeline. Weights > 1.0 are capped (upsampling
    * needs explicit replication, not sampling). */
  def mixture(sources: Seq[(String, DataFrame, Double)], seed: Long): DataFrame = {
    require(sources.nonEmpty)
    sources.map { case (name, df, weight) =>
      df.sample(withReplacement = false, math.min(weight, 1.0), seed)
        .withColumn("mixture_source", lit(name))
    }.reduce(_ unionByName _)
  }

  /** Token-budget corpus selection: keep documents in (quality desc,
    * id asc) order while the running token total stays within
    * `tokenBudget` — "fill the training budget with the best data", the
    * curation step after quality scoring. A document is kept iff its
    * inclusive prefix total ≤ budget, so selection stops at the first
    * overflowing document and the kept set is a strict prefix of the
    * quality ordering (deterministic, engine-independent).
    *
    * Scale shape: a naive `Window.orderBy(quality)` running sum pulls
    * the corpus into ONE partition — wrong at any scale. Instead:
    * quality is rounded to 6 decimals (≤10⁶ distinct values), so a
    * per-quality histogram (one groupBy shuffle) + a window over that
    * TINY table computes each quality's prefix offset; the offsets
    * broadcast back and a window partitioned BY quality (parallel
    * across values) finishes the in-group prefix by id. The corpus
    * never passes through a single partition. */
  def budgetSelect(docs: DataFrame, tokenBudget: Long,
                   textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(tokenBudget > 0, s"token budget must be positive, got $tokenBudget")
    import org.apache.spark.sql.expressions.Window
    // the regex-heavy quality scoring runs once per BRANCH (offsets +
    // join side) and would otherwise run at input-split parallelism —
    // spread the raw docs to cores first (no-op on already-wide scans;
    // measured 9.9s → 6.7s at sf1). A repartition-on-quality
    // ReusedExchange variant was measured and did NOT collapse the two
    // scoring passes (the broadcast branch replans under AQE), so the
    // simpler shape stays.
    // coalesce marks the quality join key NON-NULLABLE: the
    // offsets-join otherwise implies isnotnull(quality), which Catalyst
    // pushes through the respread exchange down to the scan — re-running
    // the whole regex scorer on the scan's single split before the
    // spread can help (measured: the pushed null-check alone was ~2/3 of
    // the operator's sf1 wall clock). With the key non-nullable the
    // null-check folds to true and the scorer runs only post-spread.
    // Semantics: a null text scores 0 and sorts last (the fixture has
    // none; previously such rows silently dropped at the join).
    // n_tokens from the same fused stats struct the quality column uses:
    // canonically-equal kernel calls, so codegen CSE runs the text scan
    // once per row
    val scored = Parallelism.spreadToCores(docs).select(
      col(idCol).cast("long").as("doc_id"),
      coalesce(TextAnalysis.qualityColumn(col(textCol)), lit(0.0)).as("quality"),
      TextAnalysis.qualityStats(col(textCol)).getField("n_tokens").as("n_tokens"))
    val wq = Window.orderBy(col("quality").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = scored.groupBy("quality")
      .agg(sum("n_tokens").as("q_tokens"))
      .withColumn("cum_before", coalesce(sum("q_tokens").over(wq), lit(0L)))
      .select("quality", "cum_before")
    val wb = Window.partitionBy("quality").orderBy(col("doc_id").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    scored.join(broadcast(offsets), "quality")
      .withColumn("cum_tokens", col("cum_before") + sum("n_tokens").over(wb))
      .filter(col("cum_tokens") <= tokenBudget)
      .select(col("doc_id"), col("quality"), col("n_tokens"), col("cum_tokens"))
  }

  /** Quality-gated sample: the standard "filter then sample" corpus cut. */
  /** Deterministic epoch shuffle: every row gets a pseudo-random but
    * REPRODUCIBLE position (`shuffle_key` — its splitmix64 sample
    * bucket) and a `shard` in [0, numShards) (`key % numShards`). The
    * training order of an epoch is then (shard, shuffle_key, id) — a
    * pure function of (id, seed), so a restarted/re-run job replays the
    * identical order on any partitioning or cluster size, and changing
    * `seed` gives an independent permutation per epoch. Map-side only —
    * assignment itself shuffles nothing. */
  def shuffleAssign(df: DataFrame, numShards: Int, seed: Long,
                    idCol: String = "doc_id"): DataFrame = {
    require(numShards > 0, s"numShards must be positive, got $numShards")
    df.withColumn("shuffle_key", sampleBucket(col(idCol), seed))
      .withColumn("shard", pmod(col("shuffle_key"), lit(numShards.toLong)))
  }

  /** Materialize [[shuffleAssign]] as a `shard=K/` directory per shard,
    * each holding its rows ascending by (shuffle_key, id) — the on-disk
    * shape a training loader streams sequentially. One hash shuffle on
    * the uniform shard key (no global sort, no skew, no driver pass);
    * the per-partition sort leads with `shard` because hash partitioning
    * may co-locate several shards, and the dynamic-partition writer then
    * splits them into their directories without a second sort. Uniform
    * hash ⇒ shard sizes concentrate tightly around corpus/numShards, so
    * the files that reach a 1000-executor training job are balanced. */
  def writeShuffleShards(df: DataFrame, path: String, numShards: Int,
                         seed: Long, idCol: String = "doc_id"): Unit =
    shuffleAssign(df, numShards, seed, idCol)
      .repartition(numShards, col("shard"))
      .sortWithinPartitions(col("shard"), col("shuffle_key"), col(idCol))
      .write.mode("overwrite").partitionBy("shard").parquet(path)

  def qualitySample(docs: DataFrame, minQuality: Double, fraction: Double,
                    seed: Long): DataFrame =
    docs.withColumn("quality", TextAnalysis.qualityColumn(col("text")))
      .filter(col("quality") >= minQuality)
      .sample(withReplacement = false, fraction, seed)
}
