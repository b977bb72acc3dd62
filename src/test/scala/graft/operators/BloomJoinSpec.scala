package graft.operators

import graft.SparkSpec
import graft.functions.BloomKernel
import org.apache.spark.sql.functions._

/** Bloom-pruned semi-join: kernel contract (no false negatives, sane
  * false-positive rate), end-to-end equality with the plain semi-join,
  * and the pre-exchange prune in the physical plan. */
class BloomJoinSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("kernel: inserted keys always probe true (no false negatives)") {
    val bits = new Array[Long](BloomKernel.words(1 << 14))
    val keys = (0 until 10000).map(i => i * 2654435761L + 17)
    keys.foreach(k => BloomKernel.insert(bits, k, 7))
    assert(keys.forall(k => BloomKernel.mightContain(bits, k, 7)))
  }

  test("kernel: false-positive rate is near theory at 10 bits/key") {
    // 1000 keys into 2^14 bits ≈ 16.4 bits/key, k=7 -> theoretical fpp
    // (1-e^(-kn/m))^k ≈ 0.2%; allow an order of magnitude headroom
    val bits = new Array[Long](BloomKernel.words(1 << 14))
    (0 until 1000).foreach(i => BloomKernel.insert(bits, i * 7919L + 3, 7))
    val probes = (0 until 20000).map(i => -(i * 104729L + 11))
    val fp = probes.count(k => BloomKernel.mightContain(bits, k, 7))
    assert(fp < 400, s"false-positive count $fp out of 20000 is implausibly high")
  }

  test("kernel: numBits must be a power of two") {
    intercept[IllegalArgumentException] { BloomKernel.words(100) }
  }

  test("bloomSemiJoin equals the plain left-semi join on real tables") {
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val urgent = spark.read.parquet(s"$sfDir/orders.parquet")
      .filter(col("o_orderpriority") === "1-URGENT")
    val pruned = BloomJoin.bloomSemiJoin(li, urgent, "l_orderkey", "o_orderkey")
      .select(col("l_orderkey"), col("l_linenumber"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    val plain = li.join(urgent, col("l_orderkey") === col("o_orderkey"), "left_semi")
      .select(col("l_orderkey"), col("l_linenumber"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(pruned == plain && pruned.nonEmpty)
  }

  test("the bloom probe filters inside whole-stage codegen before any exchange") {
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val urgent = spark.read.parquet(s"$sfDir/orders.parquet")
      .filter(col("o_orderpriority") === "1-URGENT")
    val plan = BloomJoin.bloomSemiJoin(li, urgent, "l_orderkey", "o_orderkey")
      .queryExecution.executedPlan.toString
    assert(plan.contains("bloom_might_contain"), plan)
    // the probe's Filter must sit DIRECTLY on the fact scan (its child
    // line is the lineitem FileScan — no exchange between filter and scan)
    val lines = plan.linesIterator.toVector
    val i = lines.indexWhere(l =>
      l.contains("Filter") && l.contains("bloom_might_contain(l_orderkey"))
    assert(i >= 0, plan)
    assert(lines(i + 1).contains("FileScan") && lines(i + 1).contains("lineitem"),
      "bloom probe must filter the fact scan directly\n" + plan)
  }

  test("null dim keys are skipped, matching plain semi-join semantics") {
    import spark.implicits._
    val fact = Seq((1L, "x"), (2L, "y"), (3L, "z")).toDF("k", "v")
    val dim = Seq(Some(1L), None, Some(3L)).toDF("dk")
    val pruned = BloomJoin.bloomSemiJoin(fact, dim, "k", "dk")
      .select("k").collect().map(_.getLong(0)).toSet
    val plain = fact.join(dim, col("k") === col("dk"), "left_semi")
      .select("k").collect().map(_.getLong(0)).toSet
    assert(pruned == plain && pruned == Set(1L, 3L))
  }

  test("fact and dim sharing the key column name joins without ambiguity") {
    import spark.implicits._
    val fact = Seq((1L, "x"), (2L, "y"), (3L, "z")).toDF("k", "v")
    val dim = Seq(1L, 3L, 4L).toDF("k")
    val pruned = BloomJoin.bloomSemiJoin(fact, dim, "k", "k")
      .select("k").collect().map(_.getLong(0)).toSet
    assert(pruned == Set(1L, 3L))
  }

  test("bloom build is deterministic and independent of partitioning") {
    val urgent = spark.read.parquet(s"$sfDir/orders.parquet")
      .filter(col("o_orderpriority") === "1-URGENT")
    val a = BloomJoin.buildBloom(urgent, "o_orderkey")
    val b = BloomJoin.buildBloom(urgent.repartition(7), "o_orderkey")
    assert(java.util.Arrays.equals(a, b))
  }
}
