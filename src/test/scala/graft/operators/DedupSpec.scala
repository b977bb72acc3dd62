package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DedupSpec extends SparkSpec {

  import spark.implicits._

  /** Synthetic corpus with a known dup structure: 1↔2 exact dups,
    * 3≈4 near-dups (one word changed), 5 unrelated. */
  private lazy val corpus = Seq(
    (1L, "the quick brown fox jumps over the lazy dog again and again", "s1"),
    (2L, "the quick brown fox jumps over the lazy dog again and again", "s1"),
    (3L, "spark engines shuffle data across wide partitions during joins every day", "s1"),
    (4L, "spark engines shuffle data across wide partitions during joins every night", "s1"),
    (5L, "completely different content about databases and storage layers here now", "s2"))
    .toDF("doc_id", "text", "source")

  test("shingles: distinct word trigrams, empty when too short") {
    val sh = corpus.select(Dedup.shingles($"text", 3).as("s")).collect()
    assert(sh.forall(_.getSeq[String](0).nonEmpty))
    val short = Seq((1L, "one two")).toDF("id", "text")
      .select(Dedup.shingles($"text", 3)).head.getSeq[String](0)
    assert(short.isEmpty)
  }

  test("StringShingles kernel equals the HOF shingle formulation on real docs") {
    import graft.functions.HashedShinglesFunctions.stringShingles
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val cmp = docs.select(
        Dedup.shingles($"text", 10).as("hof"),
        stringShingles($"text", 10).as("kernel"))
      .collect()
    assert(cmp.nonEmpty)
    cmp.foreach(r => assert(r.getSeq[String](0) == r.getSeq[String](1)))
  }

  test("sorted-jaccard kernel equals string-array jaccard on real docs") {
    import graft.functions.ArrayJaccardFunctions.sortedJaccard
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .limit(40)
    val withBoth = docs.select(
      $"doc_id", Dedup.shingles($"text", 3).as("sh_str"),
      Dedup.hashedShingles($"text", 3).as("sh_hash"))
    val l = withBoth.as("l"); val r = withBoth.as("r")
    val cmp = l.join(r, col("l.doc_id") < col("r.doc_id"))
      .select(
        Dedup.jaccard(col("l.sh_str"), col("r.sh_str")).as("ref"),
        sortedJaccard(col("l.sh_hash"), col("r.sh_hash")).as("fast"))
      .collect()
    assert(cmp.nonEmpty)
    cmp.foreach(row => assert(row.getDouble(0) == row.getDouble(1)))
  }

  test("exact dedup collapses identical texts to min id") {
    val out = Dedup.exactByText(corpus).collect()
    assert(out.length == 4)
    val dup = out.find(_.getLong(2) == 2L).get
    assert(dup.getLong(0) == 1L, "representative should be min(doc_id)")
  }

  test("ngram jaccard finds the near-dup pair and not the unrelated one") {
    val pairs = Dedup.ngramJaccardPairs(corpus, "source", 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSet == Set((1L, 2L), (3L, 4L)))
  }

  test("minhash LSH recovers exact and near dup pairs") {
    val pairs = Dedup.minHashPairs(corpus, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSet == Set((1L, 2L), (3L, 4L)))
  }

  test("minhash re-join variant equals the inline variant on real documents") {
    // Same banding, same verification — only the shuffle payload differs
    // (compact (id, band, bucket) triples + re-join vs arrays carried
    // through the band join). Results must be identical pair-for-pair.
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    def collectPairs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val rejoin = collectPairs(Dedup.minHashPairs(docs, 0.5))
    val inline = collectPairs(Dedup.minHashPairsInline(docs, 0.5))
    assert(rejoin.nonEmpty)
    assert(rejoin == inline)
  }

  test("prefix-filtered jaccard equals the all-pairs formulation on real documents") {
    // Prefix filtering is a theorem (lossless), not a recall knob: the
    // candidate set shrinks but surviving pairs and their jaccard values
    // must be identical at every threshold, including a low one where
    // prefixes are nearly the whole shingle set.
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    def collectPairs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    for (t <- Seq(0.3, 0.5, 0.9)) {
      val pref = collectPairs(Dedup.ngramJaccardPairs(docs, "source", t))
      val all  = collectPairs(Dedup.ngramJaccardPairsAllPairs(docs, "source", t))
      assert(pref == all, s"prefix filtering changed results at t=$t")
    }
    assert(collectPairs(Dedup.ngramJaccardPairs(docs, "source", 0.3)).nonEmpty)
  }

  test("repeated spans: shared n-grams across docs, unique spans dropped") {
    // docs 1/2 are identical and docs 3/4 differ only in their last word,
    // so both pairs share 10-gram spans; doc 5's spans are unique
    val out = Dedup.repeatedSpans(corpus, n = 10, minDocs = 2).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val spansOf = corpus.select($"doc_id", Dedup.shingles($"text", 10).as("s"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSet).toMap
    val expected = (spansOf(1L) intersect spansOf(2L)) union
                   (spansOf(3L) intersect spansOf(4L))
    assert(expected.nonEmpty)
    assert(out.keySet == expected)
    assert(out.values.forall(_ == 2L))
    // raising minDocs empties the result on this corpus
    assert(Dedup.repeatedSpans(corpus, n = 10, minDocs = 3).count() == 0L)
  }

  test("decontaminate drops span-overlapping docs and the benchmark itself") {
    // benchmark = doc 3; doc 4 shares its first 10-token span (differs
    // only in the last word), docs 1/2/5 share nothing at n=10
    val bench = corpus.filter($"doc_id" === 3L)
    val kept = Dedup.decontaminate(corpus, bench, n = 10)
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 2L, 5L))
    // a benchmark with no spans (too short) drops nothing
    val tiny = Seq((99L, "short text", "s9")).toDF("doc_id", "text", "source")
    assert(Dedup.decontaminate(corpus, tiny, n = 10).count() == corpus.count())
  }

  test("char-histogram counting filter: L1/2 lower-bounds levenshtein") {
    import graft.functions.CharHistKernel
    import org.apache.spark.unsafe.types.UTF8String
    def l1(a: String, b: String): Long = {
      val ha = CharHistKernel.compute(UTF8String.fromString(a)).toLongArray()
      val hb = CharHistKernel.compute(UTF8String.fromString(b)).toLongArray()
      ha.zip(hb).map { case (x, y) => math.abs(x - y) }.sum
    }
    def lev(a: String, b: String): Int = {
      val dp = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0 }
      for (i <- 1 to a.length; j <- 1 to b.length)
        dp(i)(j) = math.min(math.min(dp(i - 1)(j) + 1, dp(i)(j - 1) + 1),
          dp(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      dp(a.length)(b.length)
    }
    val samples = Seq(
      ("kitten", "sitting"), ("day", "night"), ("", "abc"),
      ("the quick brown fox", "the quick brown dog"),
      ("aaaa", "bbbb"), ("spark shuffles data", "data shuffles spark"))
    samples.foreach { case (a, b) =>
      assert(l1(a, b) <= 2L * lev(a, b), s"bound violated on ($a, $b)")
    }
  }

  test("levenshteinPairs: length-band blocking is lossless vs brute force") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val blocked = Dedup.levenshteinPairs(docs, maxDist = 60,
        allowLooseThreshold = true)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // brute force within source, no blocking
    val d = docs.select($"doc_id", $"source", $"text")
    val brute = d.as("a").join(d.as("b"),
        $"a.source" === $"b.source" && $"a.doc_id" < $"b.doc_id")
      .select($"a.doc_id", $"b.doc_id",
        org.apache.spark.sql.functions.levenshtein($"a.text", $"b.text")
          .cast("long").as("dist"))
      .filter($"dist" <= 60)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(blocked == brute, s"blocking lost pairs: brute=${brute.size} blocked=${blocked.size}")
    assert(blocked.nonEmpty, "fixture should contain at least one close pair")
    // the small hand corpus: identical docs 1/2 at distance 0, 3/4 one
    // word apart, unrelated docs excluded
    val tiny = Dedup.levenshteinPairs(corpus, maxDist = 10, blockCol = "source",
        allowLooseThreshold = true)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(tiny(1L -> 2L) == 0L)
    assert(tiny(3L -> 4L) == 5L) // "day" -> "night"
    assert(!tiny.keySet.exists { case (a, b) => Set(a, b).contains(5L) })
  }

  test("levenshteinPairs guards against loose thresholds, pointing at MinHash") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    // median fixture length ~300 chars: d=60 is the measured O(n²)
    // operating point and must be refused loudly…
    val e = intercept[IllegalArgumentException] {
      Dedup.levenshteinPairs(docs, maxDist = 60).collect()
    }
    assert(e.getMessage.contains("minHashLsh"), e.getMessage)
    // …while the tight typo/OCR regime passes the guard
    assert(Dedup.levenshteinPairs(docs, maxDist = 5).count() >= 0)
  }

  test("dedupAgainst drops exact-text matches of the seen corpus only") {
    // docs 1/2 share text; seen corpus = doc 1 → doc 2 drops, 3/4/5 stay
    val batch = corpus.filter($"doc_id" =!= 1L)
    val seen = corpus.filter($"doc_id" === 1L)
    val kept = Dedup.dedupAgainst(batch, seen)
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(3L, 4L, 5L))
    // empty history drops nothing; the anti-join never invents rows
    val none = corpus.filter($"doc_id" === -1L)
    assert(Dedup.dedupAgainst(batch, none).count() == batch.count())
  }

  test("minHashLshAgainst drops near-dups of history, keeps the rest") {
    // history = docs 1 and 3; batch doc 2 is byte-identical to 1
    // (jaccard 1) and doc 4 a one-word near-dup of 3 (jaccard ≈ 0.64,
    // banding-caught per the minHashPairs test) → both drop; 5 survives
    val batch = corpus.filter($"doc_id".isin(2L, 4L, 5L))
    val seen = corpus.filter($"doc_id".isin(1L, 3L))
    val kept = Dedup.minHashLshAgainst(batch, seen, 0.5)
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(5L))
    // a stricter threshold keeps the near-dup and still drops the exact one
    val strict = Dedup.minHashLshAgainst(batch, seen, 0.9)
      .collect().map(_.getLong(0)).toSet
    assert(strict == Set(4L, 5L))
    // empty history drops nothing; docs shorter than n tokens have no
    // signature and always survive
    val shortDoc = Seq((9L, "one two", "s3")).toDF("doc_id", "text", "source")
    val none = corpus.filter($"doc_id" === -1L)
    assert(Dedup.minHashLshAgainst(batch.union(shortDoc), none, 0.5).count()
           == batch.count() + 1)
    assert(Dedup.minHashLshAgainst(shortDoc, seen, 0.5)
      .collect().map(_.getLong(0)).toSet == Set(9L))
    // a doc present on BOTH sides is its own near-dup and drops — the
    // re-ingest shape (no id ordering on cross-side candidates)
    val both = Dedup.minHashLshAgainst(seen, seen, 0.5)
    assert(both.count() == 0)
  }

  test("contaminationScore: per-doc overlap fraction, short docs score 0") {
    // benchmark = doc 3 (11 tokens -> 2 distinct 10-token spans); doc 4
    // shares exactly the first of its own 2 spans, doc 3 scores 1.0
    val bench = corpus.filter($"doc_id" === 3L)
    val scores = Dedup.contaminationScore(corpus, bench, n = 10)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    assert(scores(3L) == ((2L, 2L, 1.0)))
    assert(scores(4L) == ((2L, 1L, 0.5)))
    assert(scores(1L)._2 == 0L && scores(1L)._3 == 0.0)
    assert(scores(5L)._2 == 0L)
    // a doc shorter than n tokens has zero spans and scores 0, not null
    val withShort = corpus.union(Seq((9L, "too short", "s3")).toDF("doc_id", "text", "source"))
    val s9 = Dedup.contaminationScore(withShort, bench, n = 10)
      .filter($"doc_id" === 9L).head
    assert(s9.getLong(1) == 0L && s9.getLong(2) == 0L && s9.getDouble(3) == 0.0)
  }

  test("minhash signature is deterministic across evaluations") {
    val sig = corpus.select(
      Dedup.minHashSignature(Dedup.hashedShingles($"text", 3), 16).as("sig"))
    assert(sig.collect().map(_.getSeq[Long](0)).toSeq ==
           sig.collect().map(_.getSeq[Long](0)).toSeq)
  }

  test("simhash: identical docs collide, near-dups within small hamming") {
    val pairs = Dedup.simHashPairs(corpus, maxHamming = 3)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    assert(pairs.contains((1L, 2L)))
    assert(pairs((1L, 2L)) == 0, "exact dup must have hamming 0")
    // near-dup 3≈4: 1 word of 11 changed — simhash should be close, and in
    // any case must NOT pair the unrelated doc 5 with anything
    assert(!pairs.keys.exists { case (a, b) => a == 5L || b == 5L })
  }

  test("embedding pairs above threshold, blocked and unblocked agree on block") {
    val embs = Seq(
      (1L, Seq(1f, 0f, 0f), 0),
      (2L, Seq(0.99f, 0.1f, 0f), 0),
      (3L, Seq(0f, 1f, 0f), 0)).toDF("vec_id", "embedding", "label")
    val allPairs = Dedup.embeddingPairs(embs, 0.9).collect()
    assert(allPairs.map(r => (r.getLong(0), r.getLong(1))).toSet == Set((1L, 2L)))
    val blocked = Dedup.embeddingPairs(embs, 0.9, Some(col("label"))).collect()
    assert(blocked.map(r => (r.getLong(0), r.getLong(1))).toSet == Set((1L, 2L)))
  }

  test("simhash128: banded pairs equal brute-force 128-bit hamming (pigeonhole lossless)") {
    import graft.functions.SimHashFunctions.simhash128
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val fp = docs.select(col("doc_id").as("id"), simhash128(col("text")).as("w"))
      .select(col("id"), col("w")(0).as("fp0"), col("w")(1).as("fp1"))
    val brute = fp.as("l").join(fp.as("r"), col("l.id") < col("r.id"))
      .select(col("l.id"), col("r.id"),
        (bit_count(col("l.fp0").bitwiseXOR(col("r.fp0"))) +
         bit_count(col("l.fp1").bitwiseXOR(col("r.fp1")))).cast("long").as("h"))
      .filter(col("h") <= 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val banded = Dedup.simHash128Pairs(docs, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(banded == brute, "32-bit chunk banding must lose nothing at hamming <= 3")
    assert(banded.exists(_._3 == 0L), "exact dups in the fixture must land at hamming 0")
  }

  test("semanticDedupPairs auto cell count equals the explicit max(16, floor(sqrt(n)))") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val n = emb.count()
    val expectedK = math.max(16L, math.sqrt(n.toDouble).toLong).toInt
    val auto = Dedup.semanticDedupPairs(emb, 0.45)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val explicit = Dedup.semanticDedupPairs(emb, 0.45, centroids = expectedK)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(auto == explicit, s"auto (n=$n) must pick k=$expectedK")
  }

  test("semanticDedupPairs is a same-cell subset of all-pairs with identical cosines") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val sem = Dedup.semanticDedupPairs(emb, 0.45, centroids = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val all = Dedup.embeddingPairs(emb, 0.45)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(sem.nonEmpty, "no semantic pairs found at sf0.001")
    assert(sem.keySet.subsetOf(all.keySet))
    sem.foreach { case (k, c) => assert(all(k) == c) }
    // recall on this fixture is measured, not assumed: the synthetic
    // embeddings are near-uniform, so threshold-0.45 pairs are borderline
    // and 16-cell recall is genuinely low (~0.14); the lever is the
    // centroid count — coarser cells must recover recall monotonically
    val sem4 = Dedup.semanticDedupPairs(emb, 0.45, centroids = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall16 = sem.size.toDouble / all.size
    val recall4 = sem4.size.toDouble / all.size
    assert(recall4 >= recall16 && recall4 >= 0.3,
      s"recall(4 cells)=$recall4 recall(16 cells)=$recall16")
  }

  test("all-pairs embedding dedup guards its operating regime") {
    val embs = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    // over the bound and unblocked: throws, pointing at the scale paths
    val e = intercept[IllegalArgumentException] {
      Dedup.embeddingPairs(embs, 0.45, maxAllPairsRows = 100)
    }
    assert(e.getMessage.contains("embeddingPairsLsh"),
      "the guard error must name the scale alternative")
    // a block column bounds the self-join: no count probe, no throw
    assert(Dedup.embeddingPairs(embs, 0.45,
      blockCol = Some(org.apache.spark.sql.functions.col("label")),
      maxAllPairsRows = 100).count() >= 0)
    // an explicit opt-out for measured operating points
    assert(Dedup.embeddingPairs(embs, 0.45, maxAllPairsRows = 0).count() > 0)
  }

  test("blocked embedding pairs equal all-pairs restricted to equal blocks") {
    val embs = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val lbl = embs.select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val all = Dedup.embeddingPairs(embs, 0.45)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val blocked = Dedup.embeddingPairs(embs, 0.45,
        blockCol = Some(org.apache.spark.sql.functions.col("label")))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(blocked == all.filter { case (a, b) => lbl(a) == lbl(b) },
      "blocking must be exactly the equal-block restriction of all-pairs")
  }

  test("LSH embedding pairs are a subset of all-pairs with identical cosines") {
    val embs = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val all = pairs(Dedup.embeddingPairs(embs, 0.45))
    val lsh = pairs(Dedup.embeddingPairsLsh(embs, 0.45, 8, 6, 64))
    assert(lsh.nonEmpty, "banding should recover some pairs at this point")
    assert(lsh.keySet.subsetOf(all.keySet), "LSH must never invent pairs")
    lsh.foreach { case (k, c) => assert(c == all(k), s"cosine differs for $k") }
    val recall = lsh.size.toDouble / all.size
    info(f"embedding LSH recall = $recall%.2f (${lsh.size}/${all.size} pairs, 8x6 bands)")
    // theory: 1-(1-p^6)^8 ~= 0.46 at cosine 0.45; wide band for fixture noise
    assert(recall > 0.2 && recall <= 1.0)
  }

  test("embedding LSH re-join default equals the inline variant pair-for-pair") {
    // Same banding, same verify — only where the vectors travel differs
    // (fetched back by two id joins vs carried through the band join;
    // the re-join default measured 2.2x faster at sf1, see operator doc).
    val embs = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val rejoin = pairs(Dedup.embeddingPairsLsh(embs, 0.45, 8, 6, 64))
    val inline = pairs(Dedup.embeddingPairsLshInline(embs, 0.45, 8, 6, 64))
    assert(rejoin.nonEmpty)
    assert(rejoin == inline)
  }

  test("clusterPairs: transitivity, chains, cycles, min-id representative") {
    // components: {1,2,3,4} via chain 1-2-3-4, {7,8,9} via cycle, {11,12}
    val pairs = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L),
      (7L, 8L), (8L, 9L), (7L, 9L),
      (11L, 12L)).toDF("id_a", "id_b")
    val out = Dedup.clusterPairs(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      7L -> 7L, 8L -> 7L, 9L -> 7L,
      11L -> 11L, 12L -> 11L))
  }

  test("clusterPairs: pointer-doubling converges on a path far longer than the cap") {
    // A 200-node path has diameter 199 — plain min-label propagation would
    // need 199 rounds and previously exited the 20-round cap with silently
    // wrong labels. Pointer-doubling converges in O(log d) ≈ 8 rounds.
    val pairs = (0L until 199L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val out = Dedup.clusterPairs(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.size == 200)
    assert(out.values.forall(_ == 0L),
      s"all labels must reach the min id, got ${out.values.toSet}")
  }

  test("clusterPairs: non-convergence is loud, never silently wrong") {
    // With a 2-iteration cap, a 100-node path cannot converge (horizon
    // ~2^2); the contract is an exception, not wrong cluster_rep values.
    val pairs = (0L until 99L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val e = intercept[IllegalStateException](
      Dedup.clusterPairs(pairs, maxIterations = 2).collect())
    assert(e.getMessage.contains("did not converge"))
  }

  test("driver dedup queries are non-trivial on real documents at sf0.001") {
    val d = "/root/testdata/sf0.001"
    val ngramPairs = graft.queries.DedupQueries.queries("x4_dedup_ngram_jaccard")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val minhashPairs = graft.queries.DedupQueries.queries("x5_dedup_minhash")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    info(s"ngram(same-source) pairs=${ngramPairs.size} minhash(global) pairs=${minhashPairs.size}")
    assert(ngramPairs.nonEmpty, "expected planted near-dups in documents table")
    assert(minhashPairs.nonEmpty)
    // minhash searches globally (no source blocking), so it must recover
    // the same-source exact pairs (banding recall ≈ 1 at jaccard ≥ 0.5)
    assert(ngramPairs.subsetOf(minhashPairs),
      s"minhash missed same-source pairs: ${ngramPairs diff minhashPairs}")
  }
}
