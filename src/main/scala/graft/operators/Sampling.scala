package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Corpus sampling and mixture weighting — how a training run draws from
  * heterogeneous sources at target proportions.
  *
  * Sampling is a map-side filter over `rand(seed)` (no shuffle, no
  * collect); deterministic for a fixed seed and input partitioning.
  * Proportions are expectations, not exact counts — exactness would
  * require a global sort or count, which is the wrong trade at 100 TB.
  */
object Sampling {

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

  /** Quality-gated sample: the standard "filter then sample" corpus cut. */
  def qualitySample(docs: DataFrame, minQuality: Double, fraction: Double,
                    seed: Long): DataFrame =
    docs.withColumn("quality", TextAnalysis.qualityColumn(col("text")))
      .filter(col("quality") >= minQuality)
      .sample(withReplacement = false, fraction, seed)
}
