package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** BM25 + RRF hybrid retrieval (Retrieval.scala): scores against a
  * driver-side reference implementation, exact-k/no-overlap edges,
  * rank determinism, and the fusion arithmetic. */
class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  private val docsFx = Seq(
    (0L, "spark join fast spark"),
    (1L, "join slow table join join"),
    (2L, "spark spark spark"),
    (3L, "hash merge batch"),
    (4L, "fast fast join spark table"))

  private def docsDf = docsFx.toDF("doc_id", "text")

  /** Driver-side BM25 reference: same tokenization, same formula,
    * contributions summed in term order. */
  private def refBm25(terms: Seq[String], k1: Double = 1.2,
                      b: Double = 0.75): Map[Long, Double] = {
    val toks = docsFx.map { case (id, t) =>
      id -> t.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq }
    val n = toks.size.toDouble
    val dl = toks.map { case (id, ts) => id -> ts.size.toDouble }.toMap
    val avgdl = dl.values.sum / n
    val df = terms.map(t => t -> toks.count(_._2.contains(t)).toDouble).toMap
    toks.flatMap { case (id, ts) =>
      val score = terms.sorted.map { t =>
        val tf = ts.count(_ == t).toDouble
        if (tf == 0 || df(t) == 0) 0.0
        else math.log((n - df(t) + 0.5) / (df(t) + 0.5) + 1.0) *
          (tf * (k1 + 1.0)) /
          (tf + k1 * ((1.0 - b) + b * dl(id) / avgdl))
      }.sum
      if (score > 0) Some(id -> math.rint(score * 1e6) / 1e6) else None
    }.toMap
  }

  private def queriesDf(qs: (Long, Seq[String])*) =
    spark.createDataFrame(qs).toDF("query_id", "terms")

  test("bm25TopK matches the driver-side reference") {
    val out = Retrieval.bm25TopK(docsDf, queriesDf(7L -> Seq("spark", "join")), 5)
      .collect().map(r => (r.getLong(1), r.getDouble(3))).toMap
    val ref = refBm25(Seq("spark", "join"))
    assert(out.keySet == ref.keySet)
    out.foreach { case (id, s) => assert(math.abs(s - ref(id)) < 1e-9, s"doc $id") }
  }

  test("bm25TopK ranks by score desc with doc_id tiebreak, capped at k") {
    val rows = Retrieval.bm25TopK(docsDf, queriesDf(7L -> Seq("spark", "join")), 3)
      .orderBy("rank").collect()
    assert(rows.length == 3)
    assert(rows.map(_.getLong(2)).toSeq == Seq(1L, 2L, 3L))
    val scores = rows.map(_.getDouble(3))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
  }

  test("bm25TopK: a query sharing no term with the corpus returns no rows") {
    assert(Retrieval.bm25TopK(docsDf, queriesDf(7L -> Seq("zebra")), 5).count() == 0)
  }

  test("bm25TopK matches terms case-insensitively") {
    val lo = Retrieval.bm25TopK(docsDf, queriesDf(7L -> Seq("spark")), 5)
      .collect().map(r => (r.getLong(1), r.getDouble(3))).toSet
    val hi = Retrieval.bm25TopK(docsDf, queriesDf(7L -> Seq("SPARK")), 5)
      .collect().map(r => (r.getLong(1), r.getDouble(3))).toSet
    assert(lo == hi && lo.nonEmpty)
  }

  test("rrfFuse: hand-checked fusion, absent side contributes nothing") {
    val a = Seq((1L, 10L, 1L), (1L, 20L, 2L)).toDF("query_id", "doc_id", "rank")
    val b = Seq((1L, 20L, 1L), (1L, 30L, 2L)).toDF("query_id", "doc_id", "rank")
    val out = Retrieval.rrfFuse(a, b, 3, c = 60)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getDouble(3))).toList
      .sortBy(_._2)
    // doc 20: 1/62 + 1/61 (both arms); doc 10: 1/61; doc 30: 1/62
    assert(out == List(
      (20L, 1L, 1.0 / 62 + 1.0 / 61),
      (10L, 2L, 1.0 / 61),
      (30L, 3L, 1.0 / 62)))
  }

  test("rrfFuse ties break on doc_id ascending") {
    val a = Seq((1L, 50L, 1L), (1L, 40L, 2L)).toDF("query_id", "doc_id", "rank")
    val b = Seq((1L, 40L, 1L), (1L, 50L, 2L)).toDF("query_id", "doc_id", "rank")
    // both docs fuse to 1/61 + 1/62 — rank order must be doc_id asc
    val out = Retrieval.rrfFuse(a, b, 2).collect()
      .sortBy(_.getLong(2)).map(_.getLong(1)).toSeq
    assert(out == Seq(40L, 50L))
  }

  test("hybridTopK fuses the lexical and vector arms") {
    // embeddings aligned with docs; doc 0's vector is the query (id 0)
    val embs = Seq(
      (0L, Array(1f, 0f)), (1L, Array(0f, 1f)), (2L, Array(1f, 0.1f)),
      (3L, Array(-1f, 0f)), (4L, Array(0.5f, 0.5f))).toDF("vec_id", "embedding")
    val out = Retrieval.hybridTopK(docsDf, embs,
        queriesDf(0L -> Seq("spark", "join")), 3, depth = 5)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.length == 3)
    // the query's own doc (vector rank 1, no self-exclusion) must appear
    val top = out.find(_._1 == 0L)
    assert(top.isDefined)
    // its fused score carries the vector arm's 1/(60+1)
    val lexRanks = Retrieval.bm25TopK(docsDf, queriesDf(0L -> Seq("spark", "join")), 5)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toMap
    val expected = 1.0 / 61 + lexRanks.get(0L).map(r => 1.0 / (60.0 + r)).getOrElse(0.0)
    assert(math.abs(top.get._3 - expected) < 1e-12)
  }

  test("bm25TopK over an empty corpus returns an empty result") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val out = Retrieval.bm25TopK(empty, queriesDf(1L -> Seq("x")), 3)
    assert(out.columns.toSeq == Seq("query_id", "doc_id", "rank", "score"))
    assert(out.count() == 0)
  }

  test("bm25TopK construction triggers no Spark jobs (stats ride the plan)") {
    val sc = spark.sparkContext
    val before = sc.statusTracker.getJobIdsForGroup(null).length
    Retrieval.bm25TopK(docsDf, queriesDf(7L -> Seq("spark")), 3) // no action
    val after = sc.statusTracker.getJobIdsForGroup(null).length
    // the corpus-stats pass is a broadcast 1-row frame INSIDE the plan,
    // not an eager driver collect at construction time
    assert(after == before)
  }
}
