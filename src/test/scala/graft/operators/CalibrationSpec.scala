package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** LSH/IVF parameter calibration on a corpus whose cosine geometry is
  * deliberately DIFFERENT from the synthetic testdata fixtures: tight
  * clusters with within-cluster cosine ≈ 0.95 (the testdata embeddings
  * are near-uniform with neighbor cosines ≈ 0.3–0.45, the regime the
  * shipped defaults were sized for). The calibrator must find working
  * parameters here by MEASUREMENT, not by assuming that regime. */
class CalibrationSpec extends SparkSpec {

  import spark.implicits._

  private val Dim = 16
  private val Clusters = 10
  private val Members = 40

  /** Deterministic clustered fixture: cluster bases and per-member noise
    * both come from the splitmix64 Gaussian generator (no RNG object),
    * so the fixture is bit-identical across runs. */
  private lazy val clustered = {
    val bases = Similarity.hyperplanes(Dim, Clusters, 1, seed = 7L)
    val noise = Similarity.hyperplanes(Dim, Clusters * Members, 1, seed = 13L)
    val rows = (0 until Clusters * Members).map { i =>
      val b = bases(i % Clusters)
      val nz = noise(i)
      (i.toLong, Array.tabulate(Dim)(d => b(d) + 0.15f * nz(d)))
    }
    rows.toDF("vec_id", "embedding").cache()
  }

  test("fixture sanity: neighbor cosines are far above the testdata regime") {
    val truth = Similarity.bruteForceTopK(
      clustered.filter($"vec_id" < 8), clustered, k = 5)
    val scores = truth.select("score").collect().map(_.getDouble(0))
    assert(scores.forall(_ > 0.8),
      s"within-cluster neighbors should sit near cosine 0.95, got min ${scores.min}")
  }

  test("calibrateLsh finds parameters hitting the target on this geometry") {
    val cal = Similarity.calibrateLsh(clustered, targetRecall = 0.8)
    assert(cal.recall >= 0.8, s"calibrated point missed target: $cal")
    assert(cal.candidateFraction < 1.0,
      s"calibration should not degenerate to all-pairs: $cal")
    // deterministic: the same corpus calibrates to the same answer
    assert(Similarity.calibrateLsh(clustered, targetRecall = 0.8) == cal)
  }

  test("calibrated LSH parameters generalize to held-out queries") {
    val cal = Similarity.calibrateLsh(clustered, targetRecall = 0.8)
    val heldOut = clustered.filter($"vec_id" >= 200 && $"vec_id" < 208)
    val truth = Similarity.bruteForceTopK(heldOut, clustered, k = 5)
      .select("query_id", "neighbor_id").collect()
      .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
    val approx = Similarity.lshTopK(heldOut, clustered, k = 5,
        cal.bands, cal.bitsPerBand, Dim)
      .select("query_id", "neighbor_id").collect()
      .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
    val hit = truth.map { case (q, t) =>
      (t intersect approx.getOrElse(q, Set.empty)).size }.sum
    val recall = hit.toDouble / truth.map(_._2.size).sum
    assert(recall >= 0.7,
      s"held-out recall $recall with bands=${cal.bands} bits=${cal.bitsPerBand}")
  }

  test("calibrateIvf finds a sub-full-scan operating point at the target") {
    val cal = Similarity.calibrateIvf(clustered, targetRecall = 0.8)
    assert(cal.recall >= 0.8, s"calibrated IVF point missed target: $cal")
    assert(cal.scanFraction < 1.0, s"IVF calibration degenerated: $cal")
    assert(Similarity.calibrateIvf(clustered, targetRecall = 0.8) == cal)
  }

  test("an unreachable target falls back to the best measured point") {
    // k larger than any bucket can fully cover on a tiny grid: ask for
    // perfect recall with a deliberately weak grid and expect max-recall
    val cal = Similarity.calibrateLsh(clustered, targetRecall = 1.0,
      grid = Seq((1, 12)))
    assert(cal.bands == 1 && cal.bitsPerBand == 12)
    assert(cal.recall <= 1.0)
  }

  /** The calibrator's in-process kernel mirrors must measure EXACTLY what
    * the distributed operators do — otherwise a calibrated pick describes
    * a different operator than the one that runs. A single-point grid
    * returns that point's measured values whatever the target, so each
    * grid point is directly comparable against a Spark-side measurement
    * built from the real kernels. */
  test("in-process measurement equals the distributed operators' quantities") {
    val k = 5
    for ((bands, bits) <- Seq((4, 4), (8, 6))) {
      val cal = Similarity.calibrateLsh(clustered, targetRecall = 0.01,
        k = k, grid = Seq((bands, bits)))
      assert(cal.bands == bands && cal.bitsPerBand == bits)

      // Spark-side replay: sample = whole fixture (400 < 512), queries =
      // 8 smallest ids — the calibrator's own recipe, via the real kernels
      val sample = clustered
      val n = sample.count()
      val queries = sample.orderBy($"vec_id").limit(8)
      val truth = Similarity.bruteForceTopK(queries, sample, k)
        .select("query_id", "neighbor_id").collect()
        .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
      val approx = Similarity.lshTopK(queries, sample, k, bands, bits, Dim)
        .select("query_id", "neighbor_id").collect()
        .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
      val hits = truth.map { case (q, t) =>
        (t intersect approx.getOrElse(q, Set.empty)).size }.sum
      val sparkRecall = hits.toDouble / truth.map(_._2.size).sum

      val planes = Similarity.hyperplanes(Dim, bands, bits)
      val qb = Similarity.withLshBuckets(
        queries.select($"vec_id".as("query_id"), $"embedding".as("q_vec")),
        planes, bands, bits, "q_vec")
        .select($"query_id", $"band", $"bucket")
      val cb = Similarity.withLshBuckets(
        sample.select($"vec_id".as("neighbor_id"), $"embedding".as("c_vec")),
        planes, bands, bits, "c_vec")
        .select($"neighbor_id", $"band", $"bucket")
      val cand = cb.join(qb, Seq("band", "bucket"))
        .filter($"neighbor_id" =!= $"query_id")
        .select($"query_id", $"neighbor_id").distinct().count()
      val sparkFrac = cand.toDouble / (truth.size.toLong * (n - 1))

      assert(cal.recall == sparkRecall,
        s"($bands,$bits): in-process recall ${cal.recall} != Spark $sparkRecall")
      assert(cal.candidateFraction == sparkFrac,
        s"($bands,$bits): in-process frac ${cal.candidateFraction} != Spark $sparkFrac")
    }
  }

  test("parameterless lshTopK calibrates: target recall with no hand-picked point") {
    val queries = clustered.filter($"vec_id" < 8)
    val truth = Similarity.bruteForceTopK(queries, clustered, k = 5)
      .select("query_id", "neighbor_id").collect()
      .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
    val approx = Similarity.lshTopK(queries, clustered, k = 5, dim = Dim)
      .select("query_id", "neighbor_id").collect()
      .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
    val hit = truth.map { case (q, t) =>
      (t intersect approx.getOrElse(q, Set.empty)).size }.sum
    val recall = hit.toDouble / truth.map(_._2.size).sum
    assert(recall >= Similarity.DefaultTargetRecall,
      s"calibrated default path should hit ${Similarity.DefaultTargetRecall}: $recall")
  }

  test("parameterless ivfTopK calibrates to a working operating point") {
    val queries = clustered.filter($"vec_id" < 8)
    val truth = Similarity.bruteForceTopK(queries, clustered, k = 5)
      .select("query_id", "neighbor_id").collect()
      .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
    val approx = Similarity.ivfTopK(queries, clustered, k = 5)
      .select("query_id", "neighbor_id").collect()
      .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
    val hit = truth.map { case (q, t) =>
      (t intersect approx.getOrElse(q, Set.empty)).size }.sum
    val recall = hit.toDouble / truth.map(_._2.size).sum
    assert(recall >= Similarity.DefaultTargetRecall,
      s"calibrated IVF default path should hit ${Similarity.DefaultTargetRecall}: $recall")
  }

  test("calibrateIvf rejects a grid with no admissible point") {
    val e = intercept[IllegalArgumentException] {
      Similarity.calibrateIvf(clustered, targetRecall = 0.8,
        centroidGrid = Seq(100000))
    }
    assert(e.getMessage.contains("no admissible grid point"))
  }
}
