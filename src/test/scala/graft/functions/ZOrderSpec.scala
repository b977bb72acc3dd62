package graft.functions

import graft.SparkSpec
import graft.operators.Layout
import org.apache.spark.sql.functions._

/** Morton interleave kernel + the z-ordered layout shape. */
class ZOrderSpec extends SparkSpec {

  test("kernel: known interleaves, monotone per dimension, range check") {
    assert(ZOrderKernel.interleave(0, 0) == 0L)
    assert(ZOrderKernel.interleave(1, 0) == 1L)
    assert(ZOrderKernel.interleave(0, 1) == 2L)
    assert(ZOrderKernel.interleave(3, 1) == 7L)   // 0b11 ⨉ 0b01 → 0b0111
    assert(ZOrderKernel.interleave(2, 3) == 14L)  // 0b10 ⨉ 0b11 → 0b1110
    // max 31-bit keys stay positive (62 bits)
    val m = ZOrderKernel.interleave(0x7fffffffL, 0x7fffffffL)
    assert(m > 0 && m == (1L << 62) - 1)
    // fixing one dimension, z is monotone in the other
    val zs = (0 until 64).map(i => ZOrderKernel.interleave(i.toLong, 5L))
    assert(zs == zs.sorted && zs.distinct.size == zs.size)
    intercept[IllegalArgumentException] { ZOrderKernel.interleave(-1L, 0L) }
    intercept[IllegalArgumentException] { ZOrderKernel.interleave(0L, 1L << 31) }
  }

  test("zvalue expression matches the kernel and stays codegen'd") {
    val df = spark.range(1000).select(
      (col("id") % 37).as("a"), (col("id") % 53).as("b"))
    val rows = df.select(col("a"), col("b"),
        ZOrderFunctions.zvalue(col("a"), col("b")).as("z"))
      .collect()
    rows.foreach { r =>
      assert(r.getLong(2) == ZOrderKernel.interleave(r.getLong(0), r.getLong(1)))
    }
    // "*(n)" prefixes mark whole-stage-codegen'd operators in toString
    val plan = df.select(ZOrderFunctions.zvalue(col("a"), col("b")))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), plan)
  }

  test("z-order clusters aligned 2-d tiles into contiguous runs; row-major scatters them") {
    // full 64×64 grid; query box = the aligned 8×8 tile a,b ∈ [16,24).
    // Morton order lays an aligned power-of-two tile out as EXACTLY one
    // contiguous run (shared high-bit prefix + all suffixes); a-major
    // order scatters the same 64 cells across a 7×64-wide span — the
    // footer-stats pruning difference z-order exists for.
    val grid = for (a <- 0 until 64; b <- 0 until 64) yield (a.toLong, b.toLong)
    val inBox = (p: (Long, Long)) =>
      p._1 >= 16 && p._1 < 24 && p._2 >= 16 && p._2 < 24
    val zPos = grid.sortBy(p => ZOrderKernel.interleave(p._1, p._2))
      .zipWithIndex.collect { case (p, i) if inBox(p) => i }
    assert(zPos.size == 64)
    assert(zPos.max - zPos.min + 1 == 64,
      s"aligned tile must be one contiguous z-run, spanned ${zPos.max - zPos.min + 1}")
    val rowPos = grid.sortBy(p => p._1 * 64 + p._2)
      .zipWithIndex.collect { case (p, i) if inBox(p) => i }
    assert(rowPos.max - rowPos.min + 1 == 7 * 64 + 8,
      "row-major span of the same tile should scatter across 456 positions")
  }

  test("zOrdered write shape: range partitions tile the curve disjointly") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val parts = Layout.zOrdered(li, "l_partkey", "l_suppkey", partitions = 4)
      .select(col("zvalue"))
      .rdd.mapPartitions(it => {
        val zs = it.map(_.getLong(0)).toArray
        if (zs.isEmpty) Iterator.empty
        else Iterator((zs.min, zs.max, zs.sameElements(zs.sorted)))
      }).collect()
    assert(parts.forall(_._3), "each partition must be internally sorted")
    val ranges = parts.map(p => (p._1, p._2)).sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array(lo, hi) => assert(lo._2 <= hi._1, s"overlapping tiles: $lo $hi")
      case _             => ()
    }
  }
}
