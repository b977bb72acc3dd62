package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.Sampling
import graft.sources.Sources.table

/** Deterministic corpus-sampling queries — the pre-training mixture
  * surface. Inclusion is `splitmix64(doc_id ^ salt)` bucketed to 2⁵³
  * ([[graft.operators.Sampling]]), so the DuckDB oracle reproduces the
  * sample bit-for-bit via [[OracleHashSql.sampleBucketCtes]]: full
  * row/schema/hash checks, not rows-only. */
object SamplingQueries extends QueryPack {

  private val Seed = 7L
  private val MixSeed = 11L

  /** Per-source sampling rates: a typical "downweight the big noisy
    * source, keep the curated one" stratification. Sources absent from
    * the map are dropped (rate 0). */
  private val StratFractions: Map[String, Double] =
    Map("src0" -> 0.8, "src1" -> 0.5, "src2" -> 0.25, "src3" -> 0.1)

  private val HeadSources = Seq("src0", "src1")
  private val MidSources = Seq("src2", "src3", "src4")
  private val HeadWeight = 0.75
  private val MidWeight = 0.4
  private val TailWeight = 1.0 // weight-1 frame: kept in full

  private def mixtureFrames(docs: DataFrame): Seq[(String, DataFrame, Double)] =
    Seq(
      ("head", docs.filter(col("source").isin(HeadSources: _*)), HeadWeight),
      ("mid", docs.filter(col("source").isin(MidSources: _*)), MidWeight),
      ("tail", docs.filter(col("source") === "src5"), TailWeight))

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Temperature-2 rebalance: rates √(min_n/n_s) derived from the data,
    // every arithmetic step IEEE-exact so the oracle recomputes them.
    // Keyed on `lang` — the skewed column (en ≈ 3× fr at every SF), so
    // the rebalance actually rebalances (`source` counts are uniform).
    "x51_temperature_sample" -> ((s: SparkSession, d: String) =>
      Sampling.temperatureSample(table(s, d, "documents"), "lang", Seed)
        .select(col("doc_id"), col("lang"))),

    "x25_sample_stratified" -> ((s: SparkSession, d: String) =>
      Sampling.stratifiedHash(table(s, d, "documents"), "source",
          StratFractions, Seed)
        .select(col("doc_id"), col("source"))),

    "x26_sample_mixture" -> ((s: SparkSession, d: String) =>
      Sampling.mixtureHash(mixtureFrames(table(s, d, "documents")), MixSeed)
        .select(col("doc_id"), col("mixture_source"))),

    "x31_sample_cap_per_group" -> ((s: SparkSession, d: String) =>
      Sampling.capPerGroup(table(s, d, "documents"), "source", 5, Seed)
        .select(col("doc_id"), col("source"))),

    "x40_split_assign" -> ((s: SparkSession, d: String) =>
      Sampling.assignSplits(table(s, d, "documents"), SplitSpec, Seed)
        .select(col("doc_id"), col("split"))),

    "x41_mixture_upsampled" -> ((s: SparkSession, d: String) =>
      Sampling.mixtureUpsampled(
          upsampleFrames(table(s, d, "documents")), MixSeed)
        .select(col("doc_id"), col("mixture_source"), col("epoch"))),

    "x43_sample_exact_k" -> ((s: SparkSession, d: String) =>
      Sampling.sampleExactK(table(s, d, "documents"), ExactK, Seed)
        .select(col("doc_id"), col("source"))),

    // Deterministic epoch shuffle: position + shard are pure functions
    // of (doc_id, seed), so the oracle replays the permutation exactly.
    "x68_shuffle_shards" -> ((s: SparkSession, d: String) =>
      Sampling.shuffleAssign(table(s, d, "documents"), NumShards, ShardSeed)
        .select(col("doc_id"), col("shard"), col("shuffle_key"))))

  private val ExactK = 100
  private val ShardSeed = 13L
  private val NumShards = 8

  /** The canonical 80/10/10 train/validation/test cut. */
  private val SplitSpec: Seq[(String, Double)] =
    Seq(("train", 0.8), ("validation", 0.1), ("test", 0.1))

  /** Epoch weights: curated head run 2.5 epochs, mid 1.0, noisy tail
    * downsampled — the full upsample+downsample mixture in one spec. */
  private val UpWeights = Seq(("head", 2.5), ("mid", 1.0), ("tail", 0.25))

  private def upsampleFrames(docs: DataFrame): Seq[(String, DataFrame, Double)] =
    Seq(
      ("head", docs.filter(col("source").isin(HeadSources: _*)), UpWeights(0)._2),
      ("mid", docs.filter(col("source").isin(MidSources: _*)), UpWeights(1)._2),
      ("tail", docs.filter(col("source") === "src5"), UpWeights(2)._2))

  private def caseThreshold: String =
    StratFractions.toSeq.sortBy(_._1).map { case (src, f) =>
      s"WHEN '$src' THEN ${Sampling.threshold(f)}"
    }.mkString("CASE source ", " ", " ELSE 0 END")

  override val oracleSql: Map[String, String] = Map(
    // Thresholds recomputed in SQL: floor(√(min_n/n_s)·2⁵³) — sqrt and
    // division are correctly-rounded IEEE ops, ::BIGINT after floor
    // truncates exactly like Scala's .toLong on a nonnegative double.
    "x51_temperature_sample" ->
      s"""WITH ${OracleHashSql.sampleBucketCtes(Seed, "doc_id, lang")},
         |cnt AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
         |mn AS (SELECT min(n) AS m FROM cnt),
         |thr AS (SELECT lang,
         |    floor(sqrt((SELECT m FROM mn)::DOUBLE / n::DOUBLE)
         |          * 9007199254740992::DOUBLE)::BIGINT AS t
         |  FROM cnt)
         |SELECT pb.doc_id, pb.lang FROM pb JOIN thr USING (lang)
         |WHERE pb.bucket < thr.t""".stripMargin,

    "x25_sample_stratified" ->
      s"""WITH ${OracleHashSql.sampleBucketCtes(Seed, "doc_id, source")}
         |SELECT doc_id, source FROM pb
         |WHERE bucket < $caseThreshold""".stripMargin,

    "x68_shuffle_shards" ->
      s"""WITH ${OracleHashSql.sampleBucketCtes(ShardSeed, "doc_id")}
         |SELECT doc_id, CAST(bucket % $NumShards AS BIGINT) AS shard,
         |       CAST(bucket AS BIGINT) AS shuffle_key
         |FROM pb""".stripMargin,

    "x31_sample_cap_per_group" ->
      s"""WITH ${OracleHashSql.sampleBucketCtes(Seed, "doc_id, source")}
         |SELECT doc_id, source FROM (
         |  SELECT doc_id, source,
         |    row_number() OVER (PARTITION BY source
         |      ORDER BY bucket, doc_id) AS rn
         |  FROM pb)
         |WHERE rn <= 5""".stripMargin,

    "x26_sample_mixture" ->
      s"""WITH ${OracleHashSql.sampleBucketCtes(MixSeed, "doc_id, source")}
         |SELECT doc_id, 'head' AS mixture_source FROM pb
         |  WHERE source IN (${HeadSources.map("'" + _ + "'").mkString(", ")})
         |    AND bucket < ${Sampling.threshold(HeadWeight)}
         |UNION ALL
         |SELECT doc_id, 'mid' FROM pb
         |  WHERE source IN (${MidSources.map("'" + _ + "'").mkString(", ")})
         |    AND bucket < ${Sampling.threshold(MidWeight)}
         |UNION ALL
         |SELECT doc_id, 'tail' FROM pb
         |  WHERE source = 'src5'
         |    AND bucket < ${Sampling.threshold(TailWeight)}""".stripMargin,

    // Cumulative thresholds are computed Scala-side and inlined as exact
    // BIGINT literals, so only one engine ever does float arithmetic.
    "x40_split_assign" -> {
      val cum = SplitSpec.map(_._2).scanLeft(0.0)(_ + _).tail
      val cases = SplitSpec.init.zip(cum.init).map { case ((l, _), c) =>
        s"WHEN bucket < ${Sampling.threshold(c)} THEN '$l'"
      }.mkString(" ")
      s"""WITH ${OracleHashSql.sampleBucketCtes(Seed, "doc_id")}
         |SELECT doc_id,
         |  CASE $cases ELSE '${SplitSpec.last._1}' END AS split
         |FROM pb""".stripMargin
    },

    // Full epochs are an unnest(range(⌊w⌋)) cross; the fractional epoch
    // reuses the sample-bucket CTEs with thresholds computed Scala-side
    // from the SAME `w - floor(w)` float arithmetic Spark used.
    "x41_mixture_upsampled" -> {
      def sourcePred(name: String): String = name match {
        case "head" => s"source IN (${HeadSources.map("'" + _ + "'").mkString(", ")})"
        case "mid"  => s"source IN (${MidSources.map("'" + _ + "'").mkString(", ")})"
        case _      => "source = 'src5'"
      }
      val arms = UpWeights.map { case (name, w) =>
        val full = math.floor(w).toInt
        val frac = w - full
        val fullArm =
          if (full > 0)
            Some(s"""SELECT doc_id, '$name' AS mixture_source, e.e AS epoch
                    |FROM pb, unnest(range(0, $full)) AS e(e)
                    |WHERE ${sourcePred(name)}""".stripMargin)
          else None
        val fracArm =
          if (frac > 1e-12)
            Some(s"""SELECT doc_id, '$name', $full
                    |FROM pb WHERE ${sourcePred(name)}
                    |  AND bucket < ${Sampling.threshold(frac)}""".stripMargin)
          else None
        (fullArm.toSeq ++ fracArm.toSeq).mkString("\nUNION ALL\n")
      }
      s"""WITH ${OracleHashSql.sampleBucketCtes(MixSeed, "doc_id, source")}
         |${arms.mkString("\nUNION ALL\n")}""".stripMargin
    },

    "x43_sample_exact_k" ->
      s"""WITH ${OracleHashSql.sampleBucketCtes(Seed, "doc_id, source")}
         |SELECT doc_id, source FROM pb
         |ORDER BY bucket, doc_id LIMIT $ExactK""".stripMargin)
}
