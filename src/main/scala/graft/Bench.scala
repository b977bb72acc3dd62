package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}


/** Benchmark main — the driver's per-round timing probe.
  *
  * Contract (BENCH_r{N}.json): ONE complete JSON line printed FIRST on
  * stdout (before Spark shutdown chatter can interleave), and the same
  * JSON written to `/root/repo/BENCH.json` so a tail-truncated capture
  * can never lose it. Each query carries `{"sec": t, "reps": n, "ok":
  * bool}` where `sec` is the MEDIAN of `reps` timed runs (default 3,
  * `SPARK_GRAFT_BENCH_REPS` overrides) — single-rep numbers on a shared
  * box jitter ±20-40%, which two rounds running made unchanged code look
  * 10% slower. A failing query still reports its wall clock but is
  * flagged, never silently folded into the total as a suspiciously fast
  * number.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = Sessions.local(cpus, "graft-bench")
    spark.sparkContext.setLogLevel("ERROR")
    // JVM warmup: classloading + first-codegen otherwise lands entirely on
    // whichever query happens to run first; touch the tables and run one
    // small end-to-end query so per-query numbers reflect steady state.
    try {
      Seq("customer", "lineitem", "orders", "documents", "embeddings")
        .foreach(t => spark.read.parquet(s"$sfDir/$t.parquet").limit(1).count())
      SparkEntry.entry(spark).count()
    } catch { case _: Throwable => () }
    // malformed env must not break the always-emit-one-JSON-line contract
    val reps = scala.util.Try(sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt)
      .getOrElse(3).max(1)
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      // median of `reps` runs; a failure aborts the rep loop (no point
      // timing a broken query thrice) and flags the query
      var ok = true
      def runOnce(): Double = {
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() }
        catch {
          case e: Throwable =>
            System.err.println(s"BENCH FAILURE $name: ${e.getClass.getName}: ${e.getMessage}")
            ok = false
        }
        (System.nanoTime() - t0) / 1e9
      }
      // One untimed warm rep per query: first-touch costs (kernel codegen,
      // parquet footer reads) otherwise land on whichever of a twin pair
      // benches first — nl* sorts before x*, so identical plans looked 4×
      // apart. The warm run also absorbs the failure path, so `sec` is the
      // median of SUCCESSFUL timed reps only (a failed query reports its
      // failing wall clock, flagged, never mixed into a success median).
      val warm = runOnce()
      val times = Seq.newBuilder[Double]
      var r = 0
      while (ok && r < reps) {
        val t = runOnce()
        if (ok) times += t
        r += 1
      }
      val ts = times.result().sorted
      val median =
        if (ts.isEmpty) warm
        else if (ts.size % 2 == 1) ts(ts.size / 2)
        else (ts(ts.size / 2 - 1) + ts(ts.size / 2)) / 2.0
      (name, median, ts.size, ok)
    }
    val qs = results.map { case (k, t, n, ok) =>
      s""""$k":{"sec":$t,"reps":$n,"ok":$ok}"""
    }.mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val failed = results.filterNot(_._4).map(_._1)
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","reps":$reps,"n_queries":${results.size},"n_failed":${failed.size},"failed":$failedJson,"queries":$qs,"sf":"$sfDir"}"""
    // File first (immune to stdout truncation), then the single stdout line.
    try Files.write(Paths.get("/root/repo/BENCH.json"),
                    (json + "\n").getBytes(StandardCharsets.UTF_8))
    catch { case _: Throwable => () }
    println(json)
    spark.stop()
    if (failed.nonEmpty) sys.exit(1)
  }
}
