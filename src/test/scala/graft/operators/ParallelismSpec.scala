package graft.operators

import graft.SparkSpec

/** The spreadToCores guard: widens narrow frames to the cluster's
  * default parallelism, never shrinks an already-wide frame, and makes
  * its decision from the Dataset's own cached QueryExecution (no second
  * `df.rdd` deserializer plan). */
class ParallelismSpec extends SparkSpec {

  test("narrow frame spreads to defaultParallelism") {
    import spark.implicits._
    val target = spark.sparkContext.defaultParallelism
    val narrow = Seq.tabulate(100)(i => (i.toLong, s"d$i")).toDF("id", "s")
      .coalesce(1)
    val spread = Parallelism.spreadToCores(narrow)
    assert(spread.queryExecution.toRdd.getNumPartitions == target)
    // content untouched
    assert(spread.count() == 100L)
  }

  test("already-wide frame passes through unrepartitioned (same plan)") {
    import spark.implicits._
    val target = spark.sparkContext.defaultParallelism
    val wide = Seq.tabulate(100)(i => (i.toLong, s"d$i")).toDF("id", "s")
      .repartition(target * 2)
    val out = Parallelism.spreadToCores(wide)
    // eq: the SAME DataFrame back, not a new repartition over it
    assert(out eq wide)
  }

  test("decision runs no Spark job for a scan-rooted frame") {
    val dir = java.nio.file.Files.createTempDirectory("graft-spread").toString
    import spark.implicits._
    Seq.tabulate(64)(i => (i.toLong, s"d$i")).toDF("id", "s")
      .coalesce(1).write.mode("overwrite").parquet(dir)
    val scan = spark.read.parquet(dir)
    val before = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
    Parallelism.spreadToCores(scan) // decision only — no action yet
    val after = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
    assert(after == before, "spreadToCores must not launch a job to decide")
  }
}
