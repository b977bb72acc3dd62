package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Bucketing is the write-once/join-many layout for recurring fact⋈fact
  * joins: both sides bucketed+sorted on the key ⇒ join plans with no
  * Exchange on either side. */
class BucketedJoinSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  /** Auto-broadcast hides the bucketing effect at test scale (the tiny
    * side gets a BroadcastExchange and the planner disables bucketed
    * reads); disable it so the plan shows the fact⋈fact shape that
    * matters at 100 TB, where neither side broadcasts. */
  private def withoutAutoBroadcast[A](body: => A): A = {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try body finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("bucketed orders⋈lineitem joins without any shuffle") {
    spark.conf.set("spark.sql.sources.bucketing.enabled", "true")
    val orders = spark.read.parquet(s"$sf/orders.parquet")
    val lineitem = spark.read.parquet(s"$sf/lineitem.parquet")
    Bucketing.writeBucketed(orders, "graft_orders_b", "o_orderkey", 4)
    Bucketing.writeBucketed(lineitem, "graft_lineitem_b", "l_orderkey", 4)

    withoutAutoBroadcast {
      val joined = Bucketing.coLocatedJoin(spark, "graft_lineitem_b",
        "graft_orders_b", "l_orderkey", "o_orderkey")
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"bucketed join must not shuffle:\n${plan.take(1500)}")
      assert(plan.contains("SortMergeJoin"), plan.take(1500))

      // the same join over the unbucketed parquet shuffles both sides
      val unbucketed = lineitem.join(orders,
        lineitem("l_orderkey") === orders("o_orderkey"))
      unbucketed.collect()
      assert(unbucketed.queryExecution.executedPlan.toString.contains("Exchange"),
        "control: unbucketed fact join is expected to shuffle")
      assert(joined.count() == unbucketed.count())
    }
  }

  test("the NL bucketed-write route joins exchange-free and round-trips content") {
    spark.conf.set("spark.sql.sources.bucketing.enabled", "true")
    val orders = spark.read.parquet(s"$sf/orders.parquet")
    val lineitem = spark.read.parquet(s"$sf/lineitem.parquet")
    Bucketing.writeBucketed(lineitem, "graft_lineitem_nl_b", "l_orderkey", 4)
    val readBack = graft.Engine.run(
      "Write orders bucketed by o_orderkey into 4 buckets as graft_orders_nl_b.",
      orders)
    // round-trip fidelity: the route's result IS the written table
    assert(readBack.count() == orders.count())
    assert(readBack.select("o_orderkey").collect().map(_.getLong(0)).sorted.toSeq ==
           orders.select("o_orderkey").collect().map(_.getLong(0)).sorted.toSeq)
    withoutAutoBroadcast {
      val joined = Bucketing.coLocatedJoin(spark, "graft_lineitem_nl_b",
        "graft_orders_nl_b", "l_orderkey", "o_orderkey")
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"NL-written bucketed join must not shuffle:\n${plan.take(1500)}")
    }
  }

  test("aggregation on the bucket key also skips the exchange") {
    withoutAutoBroadcast {
      val agg = spark.table("graft_orders_b")
        .groupBy(col("o_orderkey")).agg(sum(col("o_totalprice")).as("t"))
      agg.collect()
      val plan = agg.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"bucketed agg must not shuffle:\n${plan.take(1500)}")
    }
  }
}
