package graft.operators

import graft.SparkSpec
import graft.functions.HllKernel
import org.apache.spark.sql.functions._

/** Mergeable HLL sketches: kernel accuracy, shard-invariant merging,
  * and the sketch/merge/estimate pipeline over real tables. */
class CardinalitySpec extends SparkSpec {

  test("kernel: estimates within 5% across three orders of magnitude") {
    for (n <- Seq(100, 5000, 200000)) {
      val regs = HllKernel.emptyRegs(12)
      (0 until n).foreach(i => HllKernel.add(regs, i * 0x9e3779b97f4a7c15L + 1))
      val est = HllKernel.estimate(regs)
      assert(math.abs(est - n) <= n * 0.05, s"n=$n est=$est")
    }
  }

  test("kernel: duplicate keys never move the estimate") {
    val a = HllKernel.emptyRegs(12)
    val b = HllKernel.emptyRegs(12)
    (0 until 1000).foreach { i => HllKernel.add(a, i.toLong) }
    (0 until 1000).foreach { i => HllKernel.add(b, i.toLong); HllKernel.add(b, i.toLong) }
    assert(a.toSeq == b.toSeq)
  }

  test("kernel: merge of disjoint shards equals the direct union sketch") {
    val all = HllKernel.emptyRegs(12)
    val s1 = HllKernel.emptyRegs(12)
    val s2 = HllKernel.emptyRegs(12)
    (0 until 20000).foreach { i =>
      HllKernel.add(all, i.toLong)
      HllKernel.add(if (i % 2 == 0) s1 else s2, i.toLong)
    }
    HllKernel.merge(s1, s2)
    assert(s1.toSeq == all.toSeq)
  }

  test("sketchBy + mergeSketches: per-day partials merge to the direct sketch") {
    val ev = Events.load(spark, "/root/testdata/sf0.001")
    val direct = Cardinality.sketchBy(ev, "event_type", "user_id")
    val daily = Cardinality.sketchBy(
      ev.withColumn("g", concat_ws("|", col("event_type"),
        date_format(col("ts"), "yyyy-MM-dd"))), "g", "user_id")
    val merged = Cardinality.mergeSketches(
      daily.withColumn("event_type", split(col("g"), "\\|").getItem(0)),
      "event_type")
    val joined = direct.withColumnRenamed("sketch", "a")
      .join(merged.withColumnRenamed("sketch", "b"), "event_type")
    assert(joined.count() > 0)
    assert(joined.filter(not(col("a") === col("b"))).count() == 0)
    // estimates agree with exact distincts within the 5% bound
    val exact = ev.groupBy("event_type")
      .agg(countDistinct("user_id").as("n")).join(direct, "event_type")
      .select(col("n"), Cardinality.estimate(col("sketch")).as("est"))
      .collect()
    exact.foreach { r =>
      assert(math.abs(r.getDouble(1) - r.getLong(0)) <= r.getLong(0) * 0.05,
        s"n=${r.getLong(0)} est=${r.getDouble(1)}")
    }
  }

  test("sketchBy accepts non-string group columns (int day)") {
    val ev = Events.load(spark, "/root/testdata/sf0.001")
      .withColumn("day", dayofmonth(col("ts")))
    val byDay = Cardinality.sketchBy(ev, "day", "user_id")
    assert(byDay.count() > 0)
    // string-cast grouping must partition identically to the native int
    val exactDays = ev.select(col("day").cast("string")).distinct().count()
    assert(byDay.count() == exactDays)
  }

  test("sketch build is deterministic under repartitioning") {
    val ev = Events.load(spark, "/root/testdata/sf0.001")
    val a = Cardinality.sketchBy(ev, "event_type", "user_id")
      .collect().map(r => r.getString(0) -> r.getAs[Array[Byte]](1).toSeq).toMap
    val b = Cardinality.sketchBy(ev.repartition(13), "event_type", "user_id")
      .collect().map(r => r.getString(0) -> r.getAs[Array[Byte]](1).toSeq).toMap
    assert(a == b)
  }
}
