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

  test("hashSample: deterministic, partition-invariant, monotone in fraction") {
    val a = Sampling.hashSample(docs, 0.3, seed = 7L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val b = Sampling.hashSample(docs.repartition(13), 0.3, seed = 7L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a == b, "hash sample must not depend on partitioning (rand(seed) does)")
    val bigger = Sampling.hashSample(docs, 0.6, seed = 7L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a.subsetOf(bigger),
      "a smaller fraction must be a subset of a larger one (threshold monotonicity)")
    val n = docs.count().toDouble
    assert(a.size / n > 0.15 && a.size / n < 0.45, s"ratio ${a.size / n} far from 0.3")
    val other = Sampling.hashSample(docs, 0.3, seed = 8L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a != other, "different seed should (overwhelmingly) differ")
  }

  test("stratifiedHash honors per-stratum rates; absent strata drop; edge fractions") {
    val out = Sampling.stratifiedHash(docs, "source",
      Map("src0" -> 1.0, "src1" -> 0.5, "src2" -> 0.0), seed = 7L)
    val counts = out.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val base = docs.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.getOrElse("src0", 0L) == base("src0"), "fraction 1.0 keeps everything")
    assert(!counts.contains("src2"), "fraction 0.0 keeps nothing")
    assert(counts.keySet.subsetOf(Set("src0", "src1")), s"absent strata leaked: ${counts.keySet}")
  }

  test("mixtureHash tags rows and is reproducible row-for-row") {
    val frames = Seq(
      ("web", docs.filter($"source".isin("src0", "src1")), 1.0),
      ("books", docs.filter($"source" === "src2"), 0.4))
    val m1 = Sampling.mixtureHash(frames, seed = 11L)
      .select("doc_id", "mixture_source").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    val m2 = Sampling.mixtureHash(frames, seed = 11L)
      .select("doc_id", "mixture_source").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(m1 == m2)
    assert(m1.exists(_._2 == "web") && m1.exists(_._2 == "books"))
    val webCount = m1.count(_._2 == "web")
    assert(webCount == docs.filter($"source".isin("src0", "src1")).count(),
      "weight 1.0 keeps the whole source")
  }

  test("capPerGroup: at most k per group, deterministic, subset of input") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val capped = Sampling.capPerGroup(docs, "source", 3, 7L)
    val perGroup = capped.groupBy("source").count().collect()
    assert(perGroup.nonEmpty)
    assert(perGroup.forall(_.getLong(1) <= 3))
    val ids1 = capped.select("doc_id").collect().map(_.getLong(0)).toSet
    val ids2 = Sampling.capPerGroup(docs.repartition(7), "source", 3, 7L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids1 == ids2, "kept set must be partition-invariant")
    assert(ids1.subsetOf(docs.select("doc_id").collect().map(_.getLong(0)).toSet))
    // a different seed draws a different set (overwhelmingly likely)
    val ids3 = Sampling.capPerGroup(docs, "source", 3, 8L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids1 != ids3)
  }

  test("temperatureSample flattens lang proportions toward sqrt(n)") {
    // keyed on `lang` — the skewed fixture column (en dominates); the
    // uniform `source` column would make the rebalance a no-op
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val in = docs.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(in.values.max > 2 * in.values.min, "fixture lang counts must be skewed")
    val out = Sampling.temperatureSample(docs, "lang", seed = 7L)
      .groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // subset semantics + every lang survives (smallest keeps rate 1)
    assert(out.keySet == in.keySet)
    out.foreach { case (s, n) => assert(n <= in(s)) }
    // expected kept count per lang is sqrt(min*n) — check within
    // binomial noise (4 sigma)
    val minN = in.values.min.toDouble
    in.foreach { case (s, n) =>
      val exp = math.sqrt(minN * n)
      val sd = math.sqrt(exp * math.max(0.0, 1 - exp / n))
      assert(math.abs(out(s) - exp) <= 4 * sd + 2, s"$s kept=${out(s)} exp=$exp")
    }
    // deterministic + partition-invariant
    val again = Sampling.temperatureSample(docs.repartition(13), "lang", seed = 7L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val first = Sampling.temperatureSample(docs, "lang", seed = 7L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(again == first)
  }

  test("temperatureSample works on a non-string stratum column") {
    val df = spark.range(300).selectExpr("id as doc_id", "id % 3 as bucket")
    val out = Sampling.temperatureSample(df, "bucket", seed = 7L)
    assert(out.columns.toSeq == Seq("doc_id", "bucket"))
    // equal-sized strata → rate 1 everywhere → no rows dropped
    assert(out.count() == 300)
  }

  test("temperatureSample gives null source values their own stratum") {
    import spark.implicits._
    // 200 null-source rows + 200 "a" rows: equal strata → rate 1 both →
    // nothing dropped; pre-fix the null rows silently vanished
    val df = spark.range(400).selectExpr(
      "id as doc_id", "CASE WHEN id < 200 THEN NULL ELSE 'a' END AS src")
    val out = Sampling.temperatureSample(df, "src", seed = 7L)
    assert(out.count() == 400)
    assert(out.filter($"src".isNull).count() == 200)
    // skewed case: nulls are the minority stratum and survive at rate 1
    val skew = spark.range(1000).selectExpr(
      "id as doc_id", "CASE WHEN id < 10 THEN NULL ELSE 'a' END AS src")
    val kept = Sampling.temperatureSample(skew, "src", seed = 7L)
    assert(kept.filter($"src".isNull).count() == 10)
    assert(kept.filter($"src".isNotNull).count() < 990)
  }

  test("quality-gated sample only contains docs above the threshold") {
    val out = Sampling.qualitySample(docs, minQuality = 0.5, fraction = 0.5, seed = 3L)
    assert(out.filter(col("quality") < 0.5).count() == 0)
    assert(out.count() > 0)
  }

  test("sampleExactK: exact size, deterministic, partition-invariant, TakeOrdered plan") {
    val k = 100
    val out = Sampling.sampleExactK(docs, k, seed = 7L)
    assert(out.count() == k)
    val a = out.select("doc_id").collect().map(_.getLong(0)).toSet
    val b = Sampling.sampleExactK(docs.repartition(13, col("source")), k, 7L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a == b, "sample membership must not depend on partitioning")
    // ascending (bucket, id) prefix: the kept set is the k smallest buckets
    val allBuckets = docs.select(col("doc_id"),
        Sampling.sampleBucket(col("doc_id"), 7L).as("bucket"))
      .collect().map(r => (r.getLong(1), r.getLong(0))).sorted
    assert(allBuckets.take(k).map(_._2).toSet == a)
    // scale shape: no global sort-exchange, a TakeOrdered top-k instead
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"expected TakeOrderedAndProject in:\n$plan")
  }

  test("budgetSelect: strict prefix of the quality order within the token budget") {
    import graft.operators.TextAnalysis
    val budget = 5000L
    val out = Sampling.budgetSelect(docs, budget).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2), r.getLong(3)))
    assert(out.nonEmpty)
    assert(out.map(_._4).max <= budget)

    // driver-side truth: sort by (quality desc, id), prefix-sum, cut
    val truth = docs.select(
        col("doc_id"), TextAnalysis.qualityColumn(col("text")).as("q"),
        size(TextAnalysis.tokens(col("text"))).cast("long").as("n"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
      .sortBy { case (id, q, _) => (-q, id) }
    var cum = 0L
    val expected = truth.iterator.map { case (id, q, n) =>
      cum += n; (id, q, n, cum)
    }.takeWhile(_._4 <= budget).toSeq
    assert(out.sortBy(t => (-t._2, t._1)).toSeq == expected,
      "kept set must be the exact greedy prefix with matching running totals")
    // the next document after the cut would overflow
    assert(expected.size < truth.length && {
      val next = truth(expected.size)
      expected.last._4 + next._3 > budget
    })
  }

  test("upsample: fractional epochs replicate deterministically") {
    val out = Sampling.upsample(docs, times = 2.5, seed = 11L)
      .groupBy(col("doc_id")).agg(collect_list(col("epoch")).as("epochs"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).sorted).toMap
    val n = docs.count()
    assert(out.size == n, "every doc appears")
    // every doc gets epochs 0 and 1; roughly half also get epoch 2
    assert(out.values.forall(e => e.startsWith(Seq(0L, 1L))))
    val third = out.values.count(_.length == 3)
    assert(math.abs(third.toDouble / n - 0.5) < 0.07, s"fractional epoch kept $third/$n")
    // fractional membership equals hashSample at the fractional rate
    val sampled = Sampling.hashSample(docs, 0.5, 11L).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(out.filter(_._2.length == 3).keySet == sampled)
    // pure integer weight: no sampling arm at all
    val twice = Sampling.upsample(docs, times = 2.0, seed = 11L)
    assert(twice.count() == 2 * n)
    // vanishing weight: empty replication, not an empty.reduce crash
    val none = Sampling.upsample(docs, times = 1e-13, seed = 11L)
    assert(none.columns.contains("epoch") && none.count() == 0)
    // mixture tags ride along
    val mixed = Sampling.mixtureUpsampled(
      Seq(("a", docs.filter(col("source") === "src0"), 2.0),
          ("b", docs.filter(col("source") === "src1"), 0.25)), 11L)
    assert(mixed.select("mixture_source").distinct().collect()
      .map(_.getString(0)).toSet == Set("a", "b"))
    assert(mixed.filter(col("mixture_source") === "a").count() ==
      2 * docs.filter(col("source") === "src0").count())
  }

  test("assignSplits: total partition, deterministic, append-stable, ~proportional") {
    val spec = Seq(("train", 0.8), ("validation", 0.1), ("test", 0.1))
    val out = Sampling.assignSplits(docs, spec, seed = 7L)
      .select(col("doc_id"), col("split")).collect()
      .map(r => r.getLong(0) -> r.getString(1))
    // every row gets exactly one label
    assert(out.length == docs.count())
    assert(out.map(_._2).toSet == Set("train", "validation", "test"))
    // proportions are roughly honored (53-bit hash, 500 docs)
    val frac = out.groupBy(_._2).view.mapValues(_.size.toDouble / out.length)
    assert(math.abs(frac("train") - 0.8) < 0.06, s"train ${frac("train")}")
    assert(math.abs(frac("validation") - 0.1) < 0.05)
    // label is a pure function of (id, seed): a subset keeps its labels
    val half = docs.filter(col("doc_id") % 2 === 0)
    val halfOut = Sampling.assignSplits(half, spec, seed = 7L)
      .select(col("doc_id"), col("split")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val full = out.toMap
    assert(halfOut.forall { case (id, s) => full(id) == s },
      "labels must not depend on which other rows are present")
    // invalid specs are rejected
    intercept[IllegalArgumentException] {
      Sampling.assignSplits(docs, Seq(("a", 0.5), ("b", 0.4)), 1L).collect()
    }
    intercept[IllegalArgumentException] {
      Sampling.assignSplits(docs, Seq(("a", 0.5), ("a", 0.5)), 1L).collect()
    }
  }

  test("shuffleAssign: total, deterministic, seed-independent permutations") {
    val n = docs.count()
    val a = Sampling.shuffleAssign(docs, 8, seed = 3L)
    assert(a.count() == n, "shuffle assignment keeps every row")
    val pos = a.select("doc_id", "shard", "shuffle_key").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // pure function of (id, seed): a differently-partitioned input agrees
    val b = Sampling.shuffleAssign(docs.repartition(7), 8, seed = 3L)
      .select("doc_id", "shard", "shuffle_key").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(pos == b, "assignment must be partition-invariant")
    assert(pos.values.forall { case (s, k) => s == Math.floorMod(k, 8L) })
    // another seed is a different permutation of the same rows
    val c = Sampling.shuffleAssign(docs, 8, seed = 4L)
      .select("doc_id", "shuffle_key").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(pos.keySet == c.keySet && pos.exists { case (id, (_, k)) => c(id) != k })
    // shards are near-uniform: no shard more than 2x the ideal share
    val sizes = a.groupBy("shard").count().collect().map(_.getLong(1))
    assert(sizes.length == 8 && sizes.max <= 2 * n / 8)
  }

  test("writeShuffleShards: one sorted dir per shard, union is the corpus") {
    val path = java.nio.file.Files.createTempDirectory("graft-shards")
      .toString + "/shards"
    Sampling.writeShuffleShards(docs, path, numShards = 8, seed = 3L)
    val dirs = new java.io.File(path).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("shard=")).map(_.getName)
    assert(dirs.toSet == (0 until 8).map(i => s"shard=$i").toSet)
    val back = spark.read.parquet(path)
    assert(back.count() == docs.count())
    assert(back.select("doc_id").collect().map(_.getLong(0)).toSet ==
      docs.select("doc_id").collect().map(_.getLong(0)).toSet)
    // every shard directory holds exactly its rows, ascending by
    // (shuffle_key, doc_id) — the order a training loader streams
    (0 until 8).foreach { s =>
      val rows = spark.read.parquet(s"$path/shard=$s")
        .select("shuffle_key", "doc_id").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      assert(rows.forall { case (k, _) => Math.floorMod(k, 8L) == s })
      assert(rows.sameElements(rows.sortBy(identity)),
        s"shard $s must be stored in training order")
    }
  }
}
