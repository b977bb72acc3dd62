package graft.operators

import org.apache.spark.sql.functions.col

/** Dev-only reproduction probe for the racing-backfill-appenders flake:
  * loops the race with fresh dirs, printing each append's RETURNED
  * version plus the final manifest chain, to catch the interleaving
  * where the converged version is 1 instead of 2.
  * `sbt "Test/runMain graft.operators.RaceProbe [iters]"` */
object RaceProbe {
  def main(args: Array[String]): Unit = {
    val iters = args.headOption.map(_.toInt).getOrElse(20)
    val spark = graft.Sessions.local("4", "graft-race-probe")
    spark.sparkContext.setLogLevel("ERROR")
    val sfDir = "/root/testdata/sf0.001"
    val ev = Events.load(spark, sfDir).drop("ts_us")
    val total = ev.count()
    for (i <- 1 to iters) {
      val p = java.nio.file.Files.createTempDirectory("graft-race-probe")
        .toString + "/events_log"
      val a = ev.filter(col("event_id") % 2 === 0)
      val b = ev.filter(col("event_id") % 2 === 1)
      import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
      val pool = Executors.newFixedThreadPool(2)
      val start = new CountDownLatch(1)
      val results = new java.util.concurrent.ConcurrentHashMap[String, Any]
      Seq("A" -> a, "B" -> b).foreach { case (tag, batch) =>
        pool.submit(new Runnable {
          def run(): Unit = {
            start.await()
            try results.put(tag, ManifestedLog.append(batch, p))
            catch { case t: Throwable => results.put(tag, t) }
          }
        })
      }
      start.countDown(); pool.shutdown()
      pool.awaitTermination(300, TimeUnit.SECONDS)
      val (v, _) = ManifestedLog.readManifest(spark, p)
      val n = ManifestedLog.load(spark, p).count()
      val versions = ManifestedLog.versions(spark, p)
      val line = s"iter=$i A=${results.get("A")} B=${results.get("B")} " +
        s"final=$v versions=${versions.mkString(",")} rows=$n/$total"
      if (v != 2L || n != total) {
        println(s"RACE ANOMALY $line")
        val root = new org.apache.hadoop.fs.Path(p)
        val f = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
        f.listStatus(root).map(_.getPath.getName).sorted
          .foreach(d => println(s"  DIR $d"))
      } else println(s"RACE ok $line")
    }
    spark.stop()
  }
}
