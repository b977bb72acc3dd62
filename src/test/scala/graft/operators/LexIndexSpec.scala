package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Persisted inverted index (LexIndex.scala): probe ≡ flat BM25 scan
  * (score-identical — the shared tail + exact-integer stats), appends
  * fold in ≡ rebuild, and the probe's executed scan reads only the
  * query terms' bucket partitions with the term filter pushed. */
class LexIndexSpec extends SparkSpec {
  import spark.implicits._

  private def freshPath(): String =
    java.nio.file.Files.createTempDirectory("graft-lex").toString + "/idx"

  private val docsFx = Seq(
    (0L, "spark join fast spark"),
    (1L, "join slow table join join"),
    (2L, "spark spark spark"),
    (3L, "hash merge batch"),
    (4L, "fast fast join spark table"),
    (5L, "merge table scan window"),
    (6L, "window scan scan batch slow"))
  private def docsDf = docsFx.toDF("doc_id", "text")

  private def queriesDf(qs: (Long, Seq[String])*) =
    spark.createDataFrame(qs).toDF("query_id", "terms")

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet

  test("index probe is score-identical to the flat BM25 scan") {
    val p = freshPath()
    LexIndex.build(docsDf, p)
    val qs = queriesDf(1L -> Seq("spark", "join"), 2L -> Seq("table", "scan"))
    assert(rows(LexIndex.search(spark, p, qs, 3)) ==
      rows(Retrieval.bm25TopK(docsDf, qs, 3)))
  }

  test("append ≡ rebuild: same content, stats summed exactly") {
    val (p1, p2) = (freshPath(), freshPath())
    val (half, rest) = docsFx.partition(_._1 % 2 == 0)
    LexIndex.build(half.toDF("doc_id", "text"), p1)
    LexIndex.append(rest.toDF("doc_id", "text"), p1)
    LexIndex.build(docsDf, p2)
    val m1 = LexIndex.readManifest(spark, p1)
    val m2 = LexIndex.readManifest(spark, p2)
    assert((m1.nDocs, m1.sumDl) == (m2.nDocs, m2.sumDl))
    assert(m1.segments.size == 2 && m1.version == 2L)
    val qs = queriesDf(1L -> Seq("spark", "window"))
    assert(rows(LexIndex.search(spark, p1, qs, 5)) ==
      rows(LexIndex.search(spark, p2, qs, 5)))
    // and both still equal the flat scan over the full corpus
    assert(rows(LexIndex.search(spark, p1, qs, 5)) ==
      rows(Retrieval.bm25TopK(docsDf, qs, 5)))
  }

  test("probe reads only the probed buckets with the term filter pushed") {
    val p = freshPath()
    LexIndex.build(docsDf, p, buckets = 16)
    val qs = queriesDf(1L -> Seq("spark", "join"))
    val res = LexIndex.search(spark, p, qs, 3)
    res.collect()
    val scans = graft.SparkSpec.executedFileScans(res)
      .filter(_.relation.location.rootPaths.exists(_.toString.contains("/seg-")))
    assert(scans.nonEmpty, "no index scan in the executed plan")
    val partitionsRead = scans.map(s =>
      s.metrics.get("numPartitions").map(_.value).getOrElse(
        sys.error(s"scan has no partition metric: ${s.metrics.keys}"))).sum
    val probedBuckets = Seq("spark", "join")
      .map(LexIndex.termBucket(_, 16)).distinct.size
    assert(partitionsRead <= probedBuckets,
      s"probe read $partitionsRead bucket partitions for $probedBuckets buckets")
    // the term restriction reaches the parquet scan as a pushed filter
    assert(scans.exists(_.metadata.get("PushedFilters")
      .exists(f => f.contains("term") && f.contains("In"))),
      "term IN (…) not pushed into the postings scan")
  }

  test("terms absent from the corpus score nothing; unknown index fails loudly") {
    val p = freshPath()
    LexIndex.build(docsDf, p)
    assert(LexIndex.search(spark, p, queriesDf(1L -> Seq("zebra")), 3).count() == 0)
    val e = intercept[RuntimeException] {
      LexIndex.readManifest(spark, freshPath())
    }
    assert(e.getMessage.contains("not a lexical index"))
  }

  test("hybridServe fuses the two at-rest arms; only index files are read") {
    val lexP = freshPath()
    LexIndex.build(docsDf, lexP)
    val ivfP = freshPath()
    // aligned embeddings: doc_id ≡ vec_id, 4 dims, deterministic
    val embs = docsFx.map { case (id, _) =>
      (id, Array.tabulate(4)(j => ((id * 7 + j * 3) % 10 / 10.0f) - 0.4f)) }
      .toDF("vec_id", "embedding")
    IvfIndex.build(embs, ivfP, cells = 2)
    val qs = queriesDf(0L -> Seq("spark", "join"))
    val out = Retrieval.hybridServe(spark, lexP, ivfP, qs, 3,
      depth = 5, nprobe = 1)
    out.collect()
    // every executed file scan is an index segment — zero corpus scans
    val scans = graft.SparkSpec.executedFileScans(out)
    assert(scans.nonEmpty)
    assert(scans.forall(_.relation.location.rootPaths
      .forall(_.toString.contains("/seg-"))),
      "hybridServe read a non-index file")
    // equals the hand-composed arms (vector arm self-excluded by the
    // fetched-by-id semantics)
    val lex = LexIndex.search(spark, lexP, qs, 5)
      .select("query_id", "doc_id", "rank")
    val vec = IvfIndex.search(spark, ivfP,
        embs.filter(col("vec_id") === 0L), 5, 1)
      .select(col("query_id"), col("neighbor_id").as("doc_id"), col("rank"))
    assert(rows(out) == rows(Retrieval.rrfFuse(lex, vec, 3)))
    assert(!vec.collect().map(_.getLong(1)).contains(0L))
  }

  test("a racing manifest version fails loudly (atomic publish)") {
    val p = freshPath()
    LexIndex.build(docsDf, p)
    // simulate the loser: a second build targeting the same next version
    // publishes fine (build reads newest version first), so force the
    // collision through a stale manifest write — append's retry covers
    // the benign case; here we just pin newest-wins reads
    val v2 = LexIndex.append(Seq((100L, "spark zebra")).toDF("doc_id", "text"), p)
    assert(v2 == 2L)
    assert(LexIndex.readManifest(spark, p).version == 2L)
    assert(LexIndex.readManifest(spark, p).nDocs == docsFx.size + 1L)
  }
}
