package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Histogram profiling + exact percentile-by-histogram. */
class ProfilingSpec extends SparkSpec {

  import spark.implicits._

  test("histogram: bins partition the rows, clamp under/overflow, mergeable by sum") {
    val df = Seq(("a", -5.0), ("a", 0.0), ("a", 9.9), ("a", 10.0), ("a", 99.9),
                 ("a", 100.0), ("b", 55.0)).toDF("g", "v")
    val h = Profiling.histogram(df, "v", "g", lo = 0.0, hi = 100.0, bins = 10)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(3)).toMap
    // -5 clamps to bin 0; 100.0 clamps to bin 9; bin edges are [lo, hi)
    assert(h(("a", 0L)) == 3L) // -5.0, 0.0, 9.9
    assert(h(("a", 1L)) == 1L) // 10.0
    assert(h(("a", 9L)) == 2L) // 99.9, 100.0(clamped)
    assert(h(("b", 5L)) == 1L)
    assert(h.values.sum == df.count())
    // bin totals over a split frame merge by plain sum to the full profile
    val h1 = Profiling.histogram(df.filter($"v" < 50), "v", "g", 0.0, 100.0, 10)
    val h2 = Profiling.histogram(df.filter($"v" >= 50), "v", "g", 0.0, 100.0, 10)
    val merged = h1.unionByName(h2).groupBy("g", "bin")
      .agg(sum("n").as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(merged == h)
  }

  test("percentileByHistogram matches a brute-force sorted-rank oracle") {
    val vals = Seq(1L, 1L, 2L, 3L, 3L, 3L, 7L, 9L, 50L, 100L)
    val df = vals.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
    for (p <- Seq(0.1, 0.5, 0.9, 0.99, 1.0)) {
      val k = math.ceil(p * vals.size).toInt
      val expected = vals.sorted.apply(k - 1)
      assert(Profiling.percentileByHistogram(df, "v", p) == expected, s"p=$p")
    }
    intercept[IllegalArgumentException] {
      Profiling.percentileByHistogram(df, "v", 0.0)
    }
  }

  test("zscore: known moments, constant groups score 0, partition-invariant") {
    val df = Seq(("a", 1L, 2L), ("a", 2L, 4L), ("a", 3L, 6L),
                 ("b", 4L, 5L), ("b", 5L, 5L)).toDF("g", "id", "v")
    val z = Profiling.zscore(df, "v", "g")
      .collect().map(r => r.getLong(1) -> r.getDouble(3)).toMap
    // group a: mean 4, var (4+16+36)/3 - 16 = 2.666…, std 1.63299…
    assert(math.abs(z(1L) - (-1.224745)) < 1e-6)
    assert(math.abs(z(2L) - 0.0) < 1e-12)
    assert(math.abs(z(3L) - 1.224745) < 1e-6)
    // constant group b scores 0, never NaN
    assert(z(4L) == 0.0 && z(5L) == 0.0)
    // bit-stable under repartitioning (integer moments are order-free)
    val again = Profiling.zscore(df.repartition(7), "v", "g")
      .collect().map(r => r.getLong(1) -> r.getDouble(3)).toMap
    assert(again == z)
  }

  test("review regressions: int-typed columns survive zscore and percentile") {
    // IntegerType values past 46341 would overflow an int×int product
    val df = Seq(("a", 1, 50000), ("a", 2, 50002), ("a", 3, 50004))
      .toDF("g", "id", "v")
    val z = Profiling.zscore(df, "v", "g")
      .collect().map(r => r.getInt(1) -> r.getDouble(3)).toMap
    assert(math.abs(z(2)) < 1e-9 && z(1) < 0 && z(3) > 0)
    assert(Profiling.percentileByHistogram(df, "v", 0.5) == 50002L)
  }

  test("percentileByHistogram excludes nulls instead of folding them into 0") {
    val df = Seq[(Long, java.lang.Long)]((1L, 5L), (2L, null), (3L, 7L),
      (4L, null), (5L, 9L)).toDF("id", "v")
    // of the non-null {5, 7, 9} the median is 7 — a null→0 fold would give 5
    assert(Profiling.percentileByHistogram(df, "v", 0.5) == 7L)
  }

  test("percentileByHistogram: high-cardinality domains route through binned refinement") {
    // ~5k distinct wide-spread longs incl. negatives; maxDriverValues=64
    // forces the recursive range path, which must agree with both the
    // sorted-rank oracle and the single-histogram exact path
    val vals = (0 until 5000).map(i => (i * 2654435761L) % 1000000007L - 500000003L)
    val df = vals.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
    val sorted = vals.sorted
    for (p <- Seq(0.25, 0.5, 0.99, 1.0)) {
      val expected = sorted(math.ceil(p * vals.size).toInt - 1)
      assert(Profiling.percentileByHistogram(df, "v", p, maxDriverValues = 64)
        == expected, s"binned p=$p")
      assert(Profiling.percentileByHistogram(df, "v", p) == expected, s"exact p=$p")
    }
  }

  test("percentileByHistogram survives the full 64-bit domain without overflow") {
    // >16 distinct values spanning Long.MinValue..Long.MaxValue forces the
    // binned path at its widest: span 2⁶⁴ (overflows long), width 2⁶⁰
    val vals = Seq(Long.MinValue, Long.MinValue + 1, -1L, 0L, 1L, Long.MaxValue) ++
      (1 to 34).map(i => i * 123456789012345L - 2000000000000000L)
    val df = vals.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
    val sorted = vals.sorted
    for (p <- Seq(0.1, 0.5, 1.0)) {
      val expected = sorted(math.ceil(p * vals.size).toInt - 1)
      assert(Profiling.percentileByHistogram(df, "v", p, maxDriverValues = 16)
        == expected, s"p=$p")
    }
  }

  test("clipAbovePercentile drops ~1% tail on the documents fixture, keeps the rest") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val n = docs.count()
    val kept = Profiling.clipAbovePercentile(docs, "n_chars", 0.99)
    val keptN = kept.count()
    assert(keptN >= math.ceil(0.99 * n).toLong && keptN < n,
      s"kept $keptN of $n — p99 clip must drop a non-empty <=1% tail")
    val thr = Profiling.percentileByHistogram(docs, "n_chars", 0.99)
    assert(kept.filter(col("n_chars") > thr).count() == 0)
  }
}
