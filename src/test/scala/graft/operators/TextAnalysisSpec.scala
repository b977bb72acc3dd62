package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.RollingHash64
import graft.functions.RollingHashFunctions.rollingHash
import org.apache.spark.unsafe.types.UTF8String

class TextAnalysisSpec extends SparkSpec {

  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "the quick brown fox and the lazy dog"),
    (2L, "der schnelle braune fuchs und der faule hund ist mit von"),
    (3L, "el que y en un una por como los las"),
    (4L, "numbers 123 and punct!! marks, here."),
    (5L, "")).toDF("doc_id", "text")

  test("token stats: whitespace vs bpe-ish segmentation") {
    val out = TextAnalysis.tokenStats(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap
    assert(out(1L) == ((8L, 8L)))
    // "numbers 123 and punct!! marks, here." → ws 6; bpe-ish: 5 words +
    // '123' + 2×'!' + ',' + '.' = 10
    assert(out(4L) == ((6L, 10L)))
    assert(out(5L) == ((0L, 0L)))
  }

  test("quality: empty doc scores length 0 and no NaN") {
    val q = TextAnalysis.qualityScore(docs).filter($"doc_id" === 5L).head
    assert(q.getLong(1) == 0L)
    assert(!q.getDouble(4).isNaN)
  }

  test("quality: punctuation lowers the score, stopwords raise it") {
    val q = TextAnalysis.qualityScore(docs).collect()
      .map(r => r.getLong(0) -> r.getDouble(4)).toMap
    assert(q(1L) > q(4L), s"stopword-rich doc should beat punct-y doc: $q")
  }

  test("lang id: marker words dominate; ties break alphabetically") {
    val out = TextAnalysis.langId(docs).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "en")
    assert(out(2L) == "de")
    assert(out(3L) == "es")
    assert(out(5L) == "und", "no markers → undetermined")
  }

  test("rolling hash kernel: deterministic, matches reference fold") {
    def ref(s: String): Long =
      s.getBytes("UTF-8").foldLeft(0L)((h, b) => (h * 131L + (b & 0xff)) % 1000000007L)
    val samples = Seq("", "a", "hello world", "the quick brown fox")
    samples.foreach { s =>
      assert(RollingHash64.compute(UTF8String.fromString(s)) == ref(s), s"mismatch on '$s'")
    }
    val viaDf = docs.select($"doc_id", rollingHash($"text")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaDf(1L) == ref("the quick brown fox and the lazy dog"))
  }

  test("fingerprints: md5 matches commons digest of utf-8 bytes") {
    val fp = TextAnalysis.fingerprints(docs).filter($"doc_id" === 1L).head
    val expected = java.security.MessageDigest.getInstance("MD5")
      .digest("the quick brown fox and the lazy dog".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(fp.getString(1) == expected)
  }

  test("topTokens aggregator equals the window-rank formulation on real docs") {
    val real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    def key(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    val agg = key(TextAnalysis.topTokens(real, k = 10))
    val win = key(TextAnalysis.topTokensWindow(real, k = 10))
    assert(agg.nonEmpty)
    assert(agg == win)
  }

  test("tfIdf aggregator equals the window-rank formulation") {
    val real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    def key(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id", "rank", "token", "tf", "df", "tf_idf").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
                   r.getLong(3), r.getLong(4), r.getDouble(5))).toSet
    val agg = key(TextAnalysis.tfIdf(real, k = 5))
    val win = key(TextAnalysis.tfIdfWindow(real, k = 5))
    assert(agg.nonEmpty)
    assert(agg == win)
  }

  test("Misra-Gries sketch: containment and undercount bounds hold") {
    val m = 4
    val agg = new TextAnalysis.MisraGriesAgg(m)
    // 100 'hot' + 90 tokens of 30-token noise vocabulary, interleaved:
    // N=190, bound N/(m+1)=38 < 100, so 'hot' MUST survive with estimate
    // >= 100 - 38 and never overcounted.
    val stream = (0 until 100).flatMap(i => Seq("hot", s"noise${i % 30}"))
      .take(190)
    val sketch = stream.foldLeft(agg.zero)(agg.reduce).items
    assert(sketch.contains("hot"), "guaranteed heavy hitter evicted")
    assert(sketch("hot") <= 100 && sketch("hot") >= 100 - 190 / (m + 1))
    // mergeability: two halves merged give the same guarantees
    val (a, b) = stream.splitAt(95)
    val merged = agg.merge(a.foldLeft(agg.zero)(agg.reduce),
                           b.foldLeft(agg.zero)(agg.reduce)).items
    assert(merged.size <= m)
    assert(merged.contains("hot"))
    assert(merged("hot") <= 100 && merged("hot") >= 100 - 190 / (m + 1))
  }

  test("topTokensSketch equals exact topTokens on real docs, all rows certified") {
    val real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val exact = TextAnalysis.topTokens(real, k = 10).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    val sk = TextAnalysis.topTokensSketch(real, k = 10, capacity = 256).collect()
    assert(sk.forall(_.getBoolean(4)),
      "every returned count must clear the N/(capacity+1) containment bound")
    assert(sk.map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
      == exact)
  }

  test("unigramLogProb: matches driver-side recomputation; rarer text scores lower") {
    val corpus = Seq(
      (1L, "the the the the"),          // most typical possible
      (2L, "zzz qqq ppp www"),          // all rare singletons
      (3L, "the aardvark")).toDF("doc_id", "text")
    val out = TextAnalysis.unigramLogProb(corpus).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(_._1)

    val toks = Map(1L -> Seq.fill(4)("the"),
                   2L -> Seq("zzz", "qqq", "ppp", "www"),
                   3L -> Seq("the", "aardvark"))
    val cnt = toks.values.flatten.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val total = cnt.values.sum.toDouble
    def r6(v: Double) = BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def r4(v: Double) = BigDecimal(v).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expected = toks.toSeq.map { case (id, ts) =>
      val lps = ts.map(t => r6(math.log(cnt(t) / total)))
      (id, ts.size.toLong, r4(lps.sum / lps.size))
    }.sortBy(_._1)
    assert(out.toSeq == expected)
    // all-'the' doc is the most corpus-typical, singleton-heavy the least
    assert(out(0)._3 > out(2)._3 && out(2)._3 > out(1)._3)
  }

  test("gopherRules: signals match driver recomputation; thresholds gate as specified") {
    val fifty = (1 to 25).flatMap(i => Seq("alpha", s"tok$i")).mkString(" ")
    val corpus = Seq(
      (1L, fifty),                            // exactly 50 distinct-ish words -> passes
      (2L, "short doc only"),                 // 3 words -> fails n_words
      (3L, "go go go go go go " * 10),        // heavy repetition -> fails dup_bigram_frac
      (4L, "!!! ### $$$ %%% " * 20),          // symbols -> fails symbol+alpha
      (5L, "")).toDF("doc_id", "text")
    val out = TextAnalysis.gopherRules(corpus).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
                 r.getDouble(4), r.getDouble(5), r.getBoolean(6)))
      .sortBy(_._1)

    def r(v: Double, s: Int) =
      BigDecimal(v).setScale(s, BigDecimal.RoundingMode.HALF_UP).toDouble
    val doc1 = out(0)
    val toks1 = fifty.toLowerCase.split("\\s+").filter(_.nonEmpty)
    assert(doc1._2 == 50L)
    assert(doc1._3 == r(toks1.map(_.length).sum.toDouble / 50, 4))
    val bis1 = toks1.sliding(2).map(_.mkString(" ")).toSeq
    assert(doc1._6 == r((bis1.size - bis1.distinct.size).toDouble / bis1.size, 6))
    assert(doc1._7, "50 clean words must pass")

    assert(!out(1)._7 && out(1)._2 == 3L)                  // too short
    assert(!out(2)._7 && out(2)._6 > 0.3)                  // repetitive
    assert(!out(3)._7 && out(3)._4 > 0.1 && out(3)._5 == 0.0) // symbols, no alpha
    assert(out(4) == ((5L, 0L, 0.0, 0.0, 0.0, 0.0, false))) // empty text
  }

  test("tfIdf: scores match a driver-side recomputation; rarer terms outrank common ones") {
    val corpus = Seq(
      (1L, "apple banana apple cherry"),
      (2L, "banana cherry banana date"),
      (3L, "cherry date elderberry apple"),
      (4L, "fig fig fig banana")).toDF("doc_id", "text")
    val out = TextAnalysis.tfIdf(corpus, k = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
                 r.getLong(3), r.getLong(4), r.getDouble(5)))

    // driver-side truth
    val toks = Map(
      1L -> Seq("apple", "banana", "apple", "cherry"),
      2L -> Seq("banana", "cherry", "banana", "date"),
      3L -> Seq("cherry", "date", "elderberry", "apple"),
      4L -> Seq("fig", "fig", "fig", "banana"))
    val dfm = toks.values.flatMap(_.distinct).groupBy(identity).view.mapValues(_.size).toMap
    val n = toks.size.toDouble
    def score(tf: Int, df: Int): Double =
      BigDecimal(tf * math.log(n / df))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expected = toks.flatMap { case (id, ts) =>
      val tfs = ts.groupBy(identity).view.mapValues(_.size)
      tfs.toSeq.map { case (t, tf) => (id, t, tf, dfm(t), score(tf, dfm(t))) }
        .sortBy { case (_, t, _, _, s) => (-s, t) }
        .take(3).zipWithIndex
        .map { case ((i, t, tf, df, s), r) => (i, r + 1L, t, tf.toLong, df.toLong, s) }
    }.toSet
    assert(out.toSet == expected, s"got ${out.toSet -- expected}, missed ${expected -- out.toSet}")

    // fig appears 3x in doc 4 and in only one doc: its tfidf must top doc 4
    val doc4 = out.filter(_._1 == 4L).minBy(_._2)
    assert(doc4._3 == "fig")
    // each doc emits at most k rows with ranks 1..k
    out.groupBy(_._1).foreach { case (_, rows) =>
      assert(rows.map(_._2).sorted.sameElements(1L to rows.length))
    }
  }
}
