package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Johnson–Lindenstrauss random projection: the codegen'd plane-dot
  * kernel against a hand recompute, the map-only plan shape (the whole
  * point — a projection that shuffles would be useless as a scan-side
  * transform), and the projected-candidates + exact-re-rank ANN path's
  * exactness/recall contract vs brute force. */
class RandomProjectionSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"
  private val Dim = 64
  private val OutDim = 16
  private val K = 5
  private val NQueries = 8

  private def embs = spark.read.parquet(s"$sfDir/embeddings.parquet")

  private def ranked(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Long, Double)] =
    df.select("query_id", "neighbor_id", "rank", "score").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSeq.sorted

  test("plane_project equals the hand recompute (double dots in index order)") {
    val planes = Similarity.projectionPlanes(Dim, OutDim)
    val div = StrictMath.sqrt(OutDim.toDouble)
    val rows = Similarity.randomProject(embs.limit(40), Dim, OutDim)
      .select("embedding", "projected").collect()
    assert(rows.length == 40)
    rows.foreach { r =>
      val v = r.getSeq[Float](0).toArray
      val got = r.getSeq[Double](1).toArray
      assert(got.length == OutDim)
      for (p <- 0 until OutDim) {
        var dot = 0.0
        for (d <- 0 until Dim) dot += v(d).toDouble * planes(p)(d).toDouble
        assert(got(p) == dot / div, s"plane $p") // bit-exact, not approx
      }
    }
  }

  test("projection planes are the one-bit-per-band hyperplanes (shared generator)") {
    val jl = Similarity.projectionPlanes(Dim, OutDim)
    val lsh = Similarity.hyperplanes(Dim, OutDim, 1)
    assert(jl.length == OutDim)
    assert(jl.zip(lsh).forall { case (a, b) => a.sameElements(b) })
  }

  test("randomProject is map-only: zero exchanges, one file scan") {
    val df = Similarity.randomProject(embs, Dim, OutDim)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"projection must not shuffle:\n$plan")
    assert(SparkSpec.executedFileScans(df).length == 1)
  }

  test("with rerank = corpus size the projected path IS brute force") {
    val q = embs.filter(col("vec_id") < NQueries)
    val n = embs.count().toInt
    val exact = ranked(Similarity.bruteForceTopK(q, embs, K))
    val viaProj = ranked(Similarity.projectedTopK(q, embs, K, rerank = n,
      Dim, OutDim))
    assert(viaProj == exact)
  }

  /** Clustered fixture in the CalibrationSpec mold (within-cluster cosine
    * ≈ 0.95): JL preserves GAPS, so its recall claim needs geometry with
    * gaps — the near-uniform testdata embeddings (neighbor cosines
    * 0.3–0.45) are the worst case for ANY distance sketch and are covered
    * by the exactness test above instead. */
  private lazy val clustered = {
    import spark.implicits._
    val clusters = 10
    val members = 40
    val bases = Similarity.hyperplanes(Dim, clusters, 1, seed = 7L)
    val noise = Similarity.hyperplanes(Dim, clusters * members, 1, seed = 13L)
    val rows = (0 until clusters * members).map { i =>
      val b = bases(i % clusters)
      val nz = noise(i)
      (i.toLong, Array.tabulate(Dim)(d => b(d) + 0.15f * nz(d)))
    }
    rows.toDF("vec_id", "embedding").cache()
  }

  test("recall at the 4x-compression operating point (outDim 16, rerank 50)") {
    val q = clustered.filter(col("vec_id") < NQueries)
    val exactRows = ranked(Similarity.bruteForceTopK(q, clustered, K))
    val gotRows = ranked(Similarity.projectedTopK(q, clustered, K,
      rerank = 50, Dim, OutDim))
    val exact = exactRows.map { case (qid, nid, _, _) => (qid, nid) }.toSet
    val got = gotRows.map { case (qid, nid, _, _) => (qid, nid) }.toSet
    val recall = (exact & got).size.toDouble / exact.size
    assert(recall >= 0.9, s"recall@$K = $recall")
    // and the re-ranked scores are the EXACT full-dim cosines: every hit
    // shares the exact pipeline's score bit-for-bit
    val exactScores = exactRows
      .map { case (qid, nid, _, s) => (qid, nid) -> s }.toMap
    gotRows.foreach { case (qid, nid, _, s) =>
      exactScores.get((qid, nid)).foreach(es => assert(es == s))
    }
  }

  test("rerank < k and outDim > dim are rejected") {
    intercept[IllegalArgumentException] {
      Similarity.projectedTopK(embs.limit(1), embs, 5, rerank = 3, Dim, OutDim)
    }
    intercept[IllegalArgumentException] {
      Similarity.randomProject(embs, Dim, Dim + 1)
    }
  }
}
