package graft

/** Dev-only single-query timing probe: run a subset of
  * [[SparkEntry.queries]] by name against `SPARK_GRAFT_SF_DIR`, print
  * per-rep wall clock and optionally the formatted plan
  * (`SPARK_GRAFT_PROBE_EXPLAIN=1`). Bench times the whole suite with a
  * fixed protocol; this is the iterate-on-one-operator loop.
  *
  * Usage: runMain graft.Probe <query> [query ...]
  */
object Probe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: Probe <query> [query ...]")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_PROBE_REPS", "3").toInt
    val spark = Sessions.local(cpus, "graft-probe")
    spark.sparkContext.setLogLevel("ERROR")
    args.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name,
        sys.error(s"no such query: $name"))
      if (sys.env.get("SPARK_GRAFT_PROBE_EXPLAIN").contains("1"))
        fn(spark, sfDir).explain("formatted")
      (1 to reps).foreach { r =>
        val t0 = System.nanoTime()
        if (sys.env.get("SPARK_GRAFT_PROBE_PHASES").contains("1")) {
          // split the wall clock into build (DataFrame construction —
          // driver-side, includes any bounded collects the operator
          // does), plan (analyze+optimize+physical planning), execute
          val df = fn(spark, sfDir)
          val t1 = System.nanoTime()
          df.queryExecution.executedPlan
          val t2 = System.nanoTime()
          val n = df.count()
          val t3 = System.nanoTime()
          println(f"PROBE $name rep$r ${(t3 - t0) / 1e9}%.3f s ($n rows) " +
            f"build=${(t1 - t0) / 1e9}%.3f plan=${(t2 - t1) / 1e9}%.3f " +
            f"exec=${(t3 - t2) / 1e9}%.3f")
        } else {
          val n = fn(spark, sfDir).count()
          println(f"PROBE $name rep$r ${(System.nanoTime() - t0) / 1e9}%.3f s ($n rows)")
        }
      }
    }
    spark.stop()
  }
}
