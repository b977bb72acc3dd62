package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class PackingSpec extends SparkSpec {

  import spark.implicits._

  private lazy val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  test("packSequences: bins respect the budget except singleton oversized docs") {
    val packed = Packing.packSequences(docs, budget = 128, buckets = 8)
    val bins = packed.groupBy($"bucket", $"bin")
      .agg(count(lit(1)).as("n_docs"), sum($"n_tokens").as("tokens"))
      .collect()
    assert(bins.nonEmpty)
    bins.foreach { r =>
      val (nDocs, tokens) = (r.getLong(2), r.getLong(3))
      assert(tokens <= 128 || nDocs == 1,
        s"bucket ${r.getLong(0)} bin ${r.getLong(1)}: $tokens tokens across $nDocs docs")
    }
  }

  test("packSequences: bins are contiguous and greedy within each bucket") {
    val budget = 128
    val packed = Packing.packSequences(docs, budget = budget, buckets = 8)
      .collect().groupBy(_.bucket)
    packed.foreach { case (bucket, rows) =>
      val ordered = rows.sortBy(_.doc_id)
      // bins start at 0 and only ever step by one, in doc_id order
      assert(ordered.head.bin == 0L, s"bucket $bucket must start at bin 0")
      ordered.sliding(2).foreach { case Array(a, b) =>
        assert(b.bin == a.bin || b.bin == a.bin + 1,
          s"bucket $bucket: bin jumped ${a.bin} -> ${b.bin}")
      }
      // greedy: the doc that opens bin k+1 would NOT have fit in bin k
      val binTotals = ordered.groupBy(_.bin).view.mapValues(_.map(_.n_tokens).sum)
      ordered.sliding(2).foreach { case Array(a, b) =>
        if (b.bin == a.bin + 1)
          assert(binTotals(a.bin) + b.n_tokens > budget,
            s"bucket $bucket: doc ${b.doc_id} opened bin ${b.bin} but fit in ${a.bin}")
      }
    }
  }

  test("packSequences is partition-invariant (bit-stable under input layout)") {
    def run(df: org.apache.spark.sql.DataFrame) =
      Packing.packSequences(df, budget = 512, buckets = 32)
        .collect().map(p => (p.doc_id, p.bucket, p.n_tokens, p.bin)).sortBy(_._1).toSeq
    val a = run(docs)
    val b = run(docs.repartition(7, $"source"))
    val c = run(docs.orderBy($"text"))
    assert(a == b && a == c, "packing must not depend on input partitioning or order")
  }

  test("packingSummary fill ratio is tokens/budget rounded to 6") {
    val packed = Packing.packSequences(docs, budget = 512, buckets = 32)
    val summary = Packing.packingSummary(packed, budget = 512).collect()
    assert(summary.nonEmpty)
    summary.foreach { r =>
      val expected = BigDecimal(r.getLong(3).toDouble / 512.0)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r.getDouble(4) == expected)
    }
    // most bins of a greedy packing at this corpus should be well filled
    val medianFill = summary.map(_.getDouble(4)).sorted.apply(summary.length / 2)
    assert(medianFill > 0.5, s"median fill $medianFill suspiciously low")
  }

  test("chunkDocuments: coverage, overlap, and tail semantics") {
    val (w, v) = (32, 8)
    val stride = w - v
    val chunks = Packing.chunkDocuments(docs, window = w, overlap = v).collect()
    assert(chunks.nonEmpty)
    val nTokens = docs.select($"doc_id",
        size(Dedup.tokens($"text")).cast("long").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    chunks.groupBy(_.getLong(0)).foreach { case (docId, rows) =>
      val n = nTokens(docId)
      val expected = if (n <= w) 1L else (n - w + stride - 1) / stride + 1L
      assert(rows.length == expected,
        s"doc $docId ($n tokens): ${rows.length} chunks, expected $expected")
      val ordered = rows.sortBy(_.getLong(1))
      ordered.zipWithIndex.foreach { case (r, k) =>
        assert(r.getLong(2) == k.toLong * stride, "start must advance by stride")
        val len = r.getLong(3)
        assert(len == math.min(w.toLong, n - k * stride), s"doc $docId chunk $k length $len")
        assert(r.getString(4).split(" ").length.toLong == len,
          "chunk_text must hold exactly n_tokens tokens")
      }
      // every token position is covered: last chunk reaches the tail
      val last = ordered.last
      assert(last.getLong(2) + last.getLong(3) == n, s"doc $docId tail uncovered")
      // consecutive chunks overlap by exactly `v` tokens (unless the tail is short)
      ordered.sliding(2).foreach {
        case Array(a, b) =>
          val aEnd = a.getLong(2) + a.getLong(3)
          if (a.getLong(3) == w) assert(aEnd - b.getLong(2) == v,
            s"doc $docId: overlap ${aEnd - b.getLong(2)} != $v")
        case _ => ()
      }
    }
    // zero-token docs emit nothing
    import spark.implicits._
    val empty = Packing.chunkDocuments(
      Seq((1L, "   "), (2L, "one two")).toDF("doc_id", "text"), 4, 1).collect()
    assert(empty.map(_.getLong(0)).toSet == Set(2L))
  }

  test("NL route parses and compiles the chunking clause") {
    import graft.plans.{NLParser, Op => O}
    assert(NLParser.parse(
      "Chunk documents into 128 token windows with 16 token overlap.").ops ==
      List(O.ChunkDocuments(128, 16)))
    assert(NLParser.parse("Chunk into 64 token windows.").ops ==
      List(O.ChunkDocuments(64, 0)))
    assertThrows[NLParser.ParseException] {
      NLParser.parse("Chunk documents into 32 token windows with 32 token overlap.")
    }
    val out = graft.Engine.run(
      "Chunk documents into 64 token windows with 8 token overlap.", docs)
    assert(out.columns.toSeq ==
      Seq("doc_id", "chunk_id", "start_tok", "n_tokens", "chunk_text"))
    assert(out.count() >= docs.where(length(trim($"text")) > 0).count())
  }

  test("NL route parses and compiles the packing clause") {
    import graft.plans.{NLParser, Op => O}
    assert(NLParser.parse(
      "Pack documents into sequences of 512 tokens across 32 buckets.").ops ==
      List(O.PackSequences(512, 32)))
    assert(NLParser.parse("Pack into sequences of 256 tokens.").ops ==
      List(O.PackSequences(256, 32)))
    val out = graft.Engine.run(
      "Pack documents into sequences of 128 tokens across 8 buckets.", docs)
    assert(out.columns.toSeq == Seq("doc_id", "bucket", "n_tokens", "bin"))
    assert(out.count() == docs.count())
  }
}
