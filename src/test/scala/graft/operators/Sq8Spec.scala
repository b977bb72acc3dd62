package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** SQ8 serving path: the candidate codes agree with the x37 storage
  * quantizer, the quantized cosine degenerates to brute force at
  * rerank = corpus, recall holds on clustered geometry (int8 rounding
  * is ~1/254 per coordinate — far tighter than a JL sketch), and zero
  * vectors score 0 instead of NaN. */
class Sq8Spec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"
  private val Dim = 64
  private val K = 5
  private val NQueries = 8

  private def embs = spark.read.parquet(s"$sfDir/embeddings.parquet")

  private def ranked(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Long, Double)] =
    df.select("query_id", "neighbor_id", "rank", "score").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSeq.sorted

  test("sq8_encode codes equal the x37 storage quantizer's q values") {
    val codes = embs.limit(100).select(col("vec_id"),
        posexplode(graft.functions.SketchFunctions.sq8Encode(col("embedding")))
          .as(Seq("pos", "c")))
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getFloat(2).toLong)
      .toMap
    val stored = Similarity.quantizeInt8(embs.limit(100))
      .collect().map(r => (r.getLong(0), r.getLong(1).toInt) -> r.getLong(2))
    assert(stored.nonEmpty)
    stored.foreach { case (key, q) =>
      assert(codes(key) == q, s"code mismatch at $key")
    }
  }

  test("with rerank = corpus size the SQ8 path IS brute force") {
    val q = embs.filter(col("vec_id") < NQueries)
    val n = embs.count().toInt
    val exact = ranked(Similarity.bruteForceTopK(q, embs, K))
    val viaSq8 = ranked(Similarity.sq8TopK(q, embs, K, rerank = n))
    assert(viaSq8 == exact)
  }

  test("recall at rerank 50 on the testdata geometry") {
    // int8 rounding barely perturbs cosines, so unlike the JL sketch
    // this holds even on the near-uniform testdata embeddings
    val q = embs.filter(col("vec_id") < NQueries)
    val exactRows = ranked(Similarity.bruteForceTopK(q, embs, K))
    val gotRows = ranked(Similarity.sq8TopK(q, embs, K, rerank = 50))
    val exact = exactRows.map { case (qid, nid, _, _) => (qid, nid) }.toSet
    val got = gotRows.map { case (qid, nid, _, _) => (qid, nid) }.toSet
    val recall = (exact & got).size.toDouble / exact.size
    assert(recall >= 0.9, s"recall@$K = $recall")
    // re-ranked hits carry the exact pipeline's score bit-for-bit
    val exactScores = exactRows
      .map { case (qid, nid, _, s) => (qid, nid) -> s }.toMap
    gotRows.foreach { case (qid, nid, _, s) =>
      exactScores.get((qid, nid)).foreach(es => assert(es == s))
    }
  }

  test("a zero vector scores 0 in the candidate pass, never NaN") {
    import spark.implicits._
    val corpus = Seq(
      (0L, Array.fill(4)(0f)),
      (1L, Array(1f, 0f, 0f, 0f)),
      (2L, Array(0.9f, 0.1f, 0f, 0f)),
      (3L, Array(0.1f, 1f, 0f, 0f))
    ).toDF("vec_id", "embedding")
    val q = corpus.filter(col("vec_id") === 1L)
    // rerank = 2: the zero vector (score 0) must lose to both real
    // candidates (positive quantized cosines)
    val got = ranked(Similarity.sq8TopK(q, corpus, 2, rerank = 2))
    assert(got.map(_._2) == Seq(2L, 3L))
    assert(got.forall(r => !r._4.isNaN))
  }

  test("the exact re-rank scan is IN-pruned to the candidate ids") {
    val q = embs.filter(col("vec_id") < NQueries)
    val res = Similarity.sq8TopK(q, embs, K, rerank = 50)
    res.collect()
    val pushed = SparkSpec.executedFileScans(res)
      .map(_.metadata.getOrElse("PushedFilters", "")).mkString("\n")
    assert(pushed.contains("In(vec_id"),
      s"rescore must push the candidate-id IN filter to the scan:\n$pushed")
  }

  test("byte codes and the binary cosine equal the float-codes path bit-for-bit") {
    import graft.functions.SketchFunctions.{sq8Cos, sq8Encode, sq8EncodeBytes}
    import graft.functions.VectorFunctions.cosineSim
    // elementwise: every packed byte equals the float code
    embs.limit(200)
      .select(sq8Encode(col("embedding")).as("f"),
              sq8EncodeBytes(col("embedding")).as("b"))
      .collect().foreach { r =>
        val f = r.getSeq[Float](0)
        val b = r.getAs[Array[Byte]](1)
        assert(f.length == b.length)
        f.indices.foreach(i => assert(f(i) == b(i).toFloat, s"pos $i"))
      }
    // pairwise: the binary kernel's score is the cosine kernel's score
    val a = embs.filter(col("vec_id") < 4)
      .select(col("vec_id").as("qa"),
        sq8Encode(col("embedding")).as("fa"),
        sq8EncodeBytes(col("embedding")).as("ba"))
    val b = embs.filter(col("vec_id") >= 4 && col("vec_id") < 40)
      .select(col("vec_id").as("qb"),
        sq8Encode(col("embedding")).as("fb"),
        sq8EncodeBytes(col("embedding")).as("bb"))
    a.crossJoin(b)
      .select(cosineSim(col("fa"), col("fb")).as("viaFloat"),
              sq8Cos(col("ba"), col("bb")).as("viaBytes"))
      .collect().foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
  }

  test("rerank < k is rejected") {
    intercept[IllegalArgumentException] {
      Similarity.sq8TopK(embs.limit(1), embs, 5, rerank = 3)
    }
  }
}
