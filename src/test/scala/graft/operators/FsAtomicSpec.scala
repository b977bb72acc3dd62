package graft.operators

import org.apache.hadoop.fs.Path

import graft.SparkSpec

/** The manifest-publish primitive: EXACTLY ONE of N contenders racing
  * the same target may win, under real thread contention on the real
  * filesystem. This is the invariant whose absence was the long-flaky
  * "racing appenders converge (backfill)" — a bare local rename both
  * passes the exists() pre-check AND silently replaces the winner's
  * file (POSIX rename(2)), measured at ~15% double-wins per 4-way
  * contended round before the hard-link fix. 300 rounds × 4 threads
  * reproduced it reliably; the suite pins zero forever. */
class FsAtomicSpec extends SparkSpec {

  test("N racing publishers onto one target: exactly one wins, winner's " +
       "content is what readers see, losers' tmps are reclaimable") {
    import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
    val rounds = 300
    val threads = 4
    val dir = java.nio.file.Files.createTempDirectory("graft-fsatomic")
    val root = new Path(dir.toString)
    val f = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(f.getScheme == "file", "this pin is about the local-FS publish path")
    val pool = Executors.newFixedThreadPool(threads)
    try {
      (0 until rounds).foreach { r =>
        val target = new Path(root, f"manifest-$r%09d.txt")
        val start = new CountDownLatch(1)
        val wins = new java.util.concurrent.ConcurrentLinkedQueue[Int]
        val done = new CountDownLatch(threads)
        (0 until threads).foreach { id =>
          pool.submit(new Runnable {
            def run(): Unit = {
              try {
                val tmp = new Path(root, s".tmp-$r-$id")
                val out = f.create(tmp, true)
                try out.write(s"writer$id\n".getBytes("UTF-8"))
                finally out.close()
                start.await()
                if (!f.exists(target) && // the racy pre-check, kept as in publish()
                    FsAtomic.renameNoReplace(f, tmp, target)) wins.add(id)
                else f.delete(tmp, false)
              } finally done.countDown()
            }
          })
        }
        start.countDown()
        assert(done.await(60, TimeUnit.SECONDS), s"round $r hung")
        import scala.jdk.CollectionConverters._
        val winners = wins.asScala.toSeq
        assert(winners.size == 1,
          s"round $r: ${winners.size} publishers 'won' the same target " +
            s"($winners) — the publish primitive is not atomic-no-replace")
        val in = f.open(target)
        val content = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
                      finally in.close()
        assert(content == s"writer${winners.head}\n",
          s"round $r: target content '$content' is not the winner's")
      }
    } finally { pool.shutdownNow(); f.delete(root, true) }
  }
}
