package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SamplingSpec extends SparkSpec {

  import spark.implicits._

  private lazy val docs = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet").cache()

  test("stratified sampling is deterministic for a fixed seed") {
    val fractions = Map("en" -> 0.5, "de" -> 0.2, "fr" -> 1.0)
    val a = Sampling.stratified(docs, "lang", fractions, seed = 7L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val b = Sampling.stratified(docs, "lang", fractions, seed = 7L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a == b, "same seed must reproduce the same sample")
    val c = Sampling.stratified(docs, "lang", fractions, seed = 8L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a != c, "different seed should (overwhelmingly) differ")
  }

  test("stratified proportions are approximately honored; absent strata drop") {
    val fractions = Map("en" -> 0.5, "fr" -> 1.0)
    val out = Sampling.stratified(docs, "lang", fractions, seed = 7L)
    val counts = out.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val base = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.keySet == Set("en", "fr"), s"unexpected strata: ${counts.keySet}")
    assert(counts("fr") == base("fr"), "fraction 1.0 keeps everything")
    val ratio = counts("en").toDouble / base("en")
    assert(ratio > 0.3 && ratio < 0.7, s"en ratio $ratio far from 0.5")
  }

  test("mixture tags every row with its source and respects weights") {
    val a = docs.filter($"lang" === "en")
    val b = docs.filter($"lang" === "de")
    val mix = Sampling.mixture(Seq(("web", a, 1.0), ("books", b, 0.3)), seed = 11L)
    val tags = mix.groupBy("mixture_source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(tags("web") == a.count(), "weight 1.0 keeps the whole source")
    assert(tags("books") < b.count(), "weight 0.3 subsamples")
    assert(tags("books") > 0)
  }

  test("quality-gated sample only contains docs above the threshold") {
    val out = Sampling.qualitySample(docs, minQuality = 0.5, fraction = 0.5, seed = 3L)
    assert(out.filter(col("quality") < 0.5).count() == 0)
    assert(out.count() > 0)
  }
}
