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
