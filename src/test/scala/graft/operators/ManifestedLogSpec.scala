package graft.operators

import graft.SparkSpec
import org.apache.hadoop.fs.Path

/** Manifest-backed day-partitioned log: immutable versioned day
  * directories + an atomic manifest pointer — the table-format shape
  * that closes compactDay's delete/rename windows. */
class ManifestedLogSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"
  private val fromUs = 1704844800000000L // 2024-01-10T00:00:00Z
  private val toUs   = 1705708800000000L // 2024-01-20T00:00:00Z

  private def freshTable(): String = {
    val p = java.nio.file.Files.createTempDirectory("graft-manifest")
      .toString + "/events_log"
    ManifestedLog.write(Events.load(spark, sfDir), p)
    p
  }

  private def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
    df.select("event_id").collect().map(_.getLong(0)).toSet

  test("write publishes v1 day dirs + manifest; range read equals the file scan") {
    val p = freshTable()
    val (version, days) = ManifestedLog.readManifest(spark, p)
    assert(version == 1L)
    assert(days.size == 30 && days.values.forall(_.endsWith(".v1")))
    val viaManifest = ids(ManifestedLog.loadRange(spark, p, fromUs, toUs))
    val viaFile = ids(Events.loadRange(spark, sfDir, fromUs, toUs))
    assert(viaManifest == viaFile && viaManifest.nonEmpty)
  }

  test("compactDay flips the manifest, preserves rows, leaves the old version") {
    val p = freshTable()
    val before = ids(ManifestedLog.load(spark, p))
    val n = ManifestedLog.compactDay(spark, p, "2024-01-10")
    assert(n >= 1L)
    val (version, days) = ManifestedLog.readManifest(spark, p)
    assert(version == 2L)
    assert(days("2024-01-10") == "dt=2024-01-10.v2")
    assert(days.count(_._2.endsWith(".v1")) == 29)
    // old version dir still on disk: in-flight readers keep their view
    val fs = new Path(p).getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.exists(new Path(p, "dt=2024-01-10.v1")))
    assert(ids(ManifestedLog.load(spark, p)) == before)
  }

  test("a reader resolved before compaction is undisturbed by it") {
    val p = freshTable()
    // resolve the day dirs under manifest v1 the way loadRange does
    val (_, daysV1) = ManifestedLog.readManifest(spark, p)
    val oldDir = new Path(new Path(p), daysV1("2024-01-10")).toString
    val oldRows = spark.read.parquet(oldDir).count()
    ManifestedLog.compactDay(spark, p, "2024-01-10")
    // the directory the old reader resolved still reads in full
    assert(spark.read.parquet(oldDir).count() == oldRows)
  }

  test("a crash before manifest publish leaves the table unchanged") {
    val p = freshTable()
    val before = ManifestedLog.readManifest(spark, p)
    // simulate the crash remnant: a half-written next-version dir that
    // no manifest references
    val fs = new Path(p).getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new Path(p, "dt=2024-01-10.v2"))
    assert(ManifestedLog.readManifest(spark, p) == before)
    val viaManifest = ids(ManifestedLog.loadRange(spark, p, fromUs, toUs))
    assert(viaManifest == ids(Events.loadRange(spark, sfDir, fromUs, toUs)))
    // vacuum reclaims the orphan
    assert(ManifestedLog.vacuum(spark, p) >= 1L)
    assert(!fs.exists(new Path(p, "dt=2024-01-10.v2")))
  }

  test("vacuum removes superseded versions and old manifests, keeps data") {
    val p = freshTable()
    ManifestedLog.compactDay(spark, p, "2024-01-10")
    ManifestedLog.compactDay(spark, p, "2024-01-11")
    val before = ids(ManifestedLog.load(spark, p))
    val removed = ManifestedLog.vacuum(spark, p)
    assert(removed >= 4L) // 2 old day dirs + 2 old manifests
    val fs = new Path(p).getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new Path(p, "dt=2024-01-10.v1")))
    assert(!fs.exists(new Path(p, "dt=2024-01-11.v1")))
    assert(ids(ManifestedLog.load(spark, p)) == before)
  }

  test("compaction collapses files and keeps in-day rows identical") {
    val p = freshTable()
    val day = "2024-01-12"
    val (_, days) = ManifestedLog.readManifest(spark, p)
    val oldDir = new Path(new Path(p), days(day))
    val fs = oldDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val oldRows = spark.read.parquet(oldDir.toString).count()
    ManifestedLog.compactDay(spark, p, day)
    val (_, days2) = ManifestedLog.readManifest(spark, p)
    val newDir = new Path(new Path(p), days2(day))
    val newFiles = fs.listStatus(newDir)
      .count(_.getPath.getName.endsWith(".parquet"))
    assert(newFiles == 1) // tiny day: one ~targetBytes file
    assert(spark.read.parquet(newDir.toString).count() == oldRows)
  }

  test("append bootstraps, copies-on-write touched days, is idempotent") {
    val p = java.nio.file.Files.createTempDirectory("graft-manifest-append")
      .toString + "/events_log"
    val all = Events.load(spark, sfDir)
    import org.apache.spark.sql.functions.col
    val batch1 = all.filter(col("ts_us") < fromUs).drop("ts_us")
    val batch2 = all.filter(col("ts_us") >= fromUs).drop("ts_us")
    // bootstrap: first append initializes the table at version 1
    assert(ManifestedLog.append(batch1, p) == 1L)
    val (_, d1) = ManifestedLog.readManifest(spark, p)
    // append dirs are `dt=<day>.v1-<token>` (writer-unique suffix)
    assert(d1.values.forall(_.contains(".v1")))
    val n1 = ManifestedLog.load(spark, p).count()
    assert(n1 == batch1.count())
    // second batch: new days v1; the boundary day (late tail) rewrites v2
    assert(ManifestedLog.append(batch2, p) == 2L)
    assert(ids(ManifestedLog.load(spark, p)) == ids(all))
    // re-delivering batch2 wholesale: key-dedup makes it a no-op on rows
    val v3 = ManifestedLog.append(batch2, p)
    assert(v3 == 3L)
    assert(ids(ManifestedLog.load(spark, p)) == ids(all))
  }

  test("appended table range-reads identically to the file scan") {
    val p = java.nio.file.Files.createTempDirectory("graft-manifest-append2")
      .toString + "/events_log"
    val all = Events.load(spark, sfDir)
    import org.apache.spark.sql.functions.col
    // three arbitrary slices, out of time order (late data path)
    ManifestedLog.append(all.filter(col("event_id") % 3 === 2), p)
    ManifestedLog.append(all.filter(col("event_id") % 3 === 0), p)
    ManifestedLog.append(all.filter(col("event_id") % 3 === 1), p)
    val viaManifest = ids(ManifestedLog.loadRange(spark, p, fromUs, toUs))
    assert(viaManifest == ids(Events.loadRange(spark, sfDir, fromUs, toUs)))
  }

  test("streaming ingest lands micro-batches as atomic manifest flips") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-manifest-stream").toString
    val p = s"$dir/events_log"
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[graft.streaming.EventStreams.Event]
    val q = ManifestedLog.ingest(input.toDF(), p, s"$dir/ckpt")
    def ev(id: Long, us: Long) = graft.streaming.EventStreams.Event(
      id, java.sql.Timestamp.from(Events.usInstant(us)), id % 5, "click", 1.0)
    val day0 = 1704844800000000L // 2024-01-10T00:00:00Z
    input.addData(ev(1, day0), ev(2, day0 + 3600000000L))
    q.processAllAvailable()
    input.addData(ev(3, day0 + 86400000000L), ev(2, day0 + 3600000000L)) // dup id 2
    q.processAllAvailable()
    q.stop()
    val rows = ManifestedLog.load(spark, p)
    assert(rows.count() == 3L) // duplicate re-delivery deduped by key
    assert(ids(rows) == Set(1L, 2L, 3L))
    val (version, days) = ManifestedLog.readManifest(spark, p)
    assert(version == 2L && days.keySet == Set("2024-01-10", "2024-01-11"))
  }

  test("time travel: a pinned version reads its exact content until vacuumed") {
    val p = java.nio.file.Files.createTempDirectory("graft-manifest-tt")
      .toString + "/events_log"
    val all = Events.load(spark, sfDir)
    import org.apache.spark.sql.functions.col
    val batch1 = all.filter(col("event_id") % 2 === 0).drop("ts_us")
    ManifestedLog.append(batch1, p)                       // v1
    ManifestedLog.append(all.filter(col("event_id") % 2 === 1).drop("ts_us"), p) // v2
    ManifestedLog.compactDay(spark, p, "2024-01-10")      // v3
    assert(ManifestedLog.versions(spark, p) == Seq(1L, 2L, 3L))
    // v1 still reads exactly batch1 even though the table moved on
    assert(ids(ManifestedLog.loadAt(spark, p, 1L)) == ids(batch1))
    assert(ids(ManifestedLog.loadAt(spark, p, 3L)) == ids(all))
    // retention window 2: v1 goes, v2/v3 (and every dir they list) stay
    ManifestedLog.vacuum(spark, p, keepVersions = 2)
    assert(ManifestedLog.versions(spark, p) == Seq(2L, 3L))
    assert(ids(ManifestedLog.loadAt(spark, p, 2L)) == ids(all))
    // the pre-compaction v2 still resolves its (now superseded) day dir
    val (_, d2) = (2L, ManifestedLog.readManifestAt(spark, p, 2L))
    assert(d2("2024-01-10") != ManifestedLog.readManifest(spark, p)._2("2024-01-10"))
    // a vacuumed version fails loudly, never silently reads "newest"
    val e = intercept[RuntimeException](ManifestedLog.loadAt(spark, p, 1L))
    assert(e.getMessage.contains("not retained"))
  }

  test("compactClosedDays rewrites closed fragmented days in ONE flip") {
    val p = java.nio.file.Files.createTempDirectory("graft-manifest-cc")
      .toString + "/events_log"
    // fragment every day: 8 round-robin input partitions → up to 8
    // files per day directory
    ManifestedLog.write(Events.load(spark, sfDir).repartition(8), p)
    val before = ids(ManifestedLog.load(spark, p))
    val (v1, days1) = ManifestedLog.readManifest(spark, p)
    assert(days1.values.forall(_.endsWith(".v1")))

    // watermark at the end of 2024-01-12: every day through the 12th is
    // closed (and fragmented), everything after stays open
    val wm = Events.dayBoundsUs("2024-01-12")._2
    val expected = days1.keySet.filter(d => Events.dayBoundsUs(d)._2 <= wm)
    val done = ManifestedLog.compactClosedDays(spark, p, wm)
    assert(done.keySet == expected && expected.contains("2024-01-10") &&
      expected.size < days1.size)
    val (v2, days2) = ManifestedLog.readManifest(spark, p)
    assert(v2 == v1 + 1, "all rewritten days publish as one manifest flip")
    done.keySet.foreach(d => assert(days2(d) == s"dt=$d.v2"))
    assert(days2.collect { case (d, dir) if !done.contains(d) => dir }
      .forall(_.endsWith(".v1")))
    assert(ids(ManifestedLog.load(spark, p)) == before)
    // a pinned pre-compaction read still resolves the old layout
    assert(ids(ManifestedLog.loadAt(spark, p, v1)) == before)
    // second sweep: nothing fragmented below the watermark → no publish
    assert(ManifestedLog.compactClosedDays(spark, p, wm).isEmpty)
    assert(ManifestedLog.readManifest(spark, p)._1 == v2)
  }

  test("change feed emits exactly the rows added between versions") {
    val p = java.nio.file.Files.createTempDirectory("graft-manifest-cf")
      .toString + "/events_log"
    val all = Events.load(spark, sfDir)
    import org.apache.spark.sql.functions.col
    val sliceA = all.filter(col("event_id") % 3 =!= 1).drop("ts_us")
    val sliceB = all.filter(col("event_id") % 3 === 1).drop("ts_us")
    ManifestedLog.append(sliceA, p)                  // v1
    ManifestedLog.append(sliceB, p)                  // v2
    ManifestedLog.compactDay(spark, p, "2024-01-10") // v3: layout-only

    assert(ids(ManifestedLog.changesBetween(spark, p, 1L, 2L)) == ids(sliceB))
    // compaction changed directories but not content → empty delta
    assert(ManifestedLog.changesBetween(spark, p, 2L, 3L).count() == 0L)
    assert(ids(ManifestedLog.changesBetween(spark, p, 1L, 3L)) == ids(sliceB))
    // a re-delivered batch adds nothing, so its delta is empty too
    ManifestedLog.append(sliceB, p)                  // v4: idempotent no-op
    assert(ManifestedLog.changesBetween(spark, p, 3L, 4L).count() == 0L)
    // cursor-style consumption: delta since v1 runs to the newest version
    val (cursor, delta) = ManifestedLog.changesSince(spark, p, 1L)
    assert(cursor == 4L && ids(delta) == ids(sliceB))
    // few-days regime (hot/cold batch): a batch touching one or two
    // days takes the per-day broadcast path and emits its new keys
    val tiny = all.filter(col("event_id").isin(1L, 2L))
      .withColumn("event_id", col("event_id") + 10000000L)
    val v5 = ManifestedLog.append(tiny, p)
    assert(ids(ManifestedLog.changesBetween(spark, p, 4L, v5)) == ids(tiny))
    // identical bounds → empty, same schema as a load
    val same = ManifestedLog.changesBetween(spark, p, 2L, 2L)
    assert(same.count() == 0L &&
      same.columns.toSet == ManifestedLog.load(spark, p).columns.toSet)
    intercept[IllegalArgumentException](
      ManifestedLog.changesBetween(spark, p, 3L, 1L))
  }

  test("schema evolution: new columns null-fill old days, compaction migrates") {
    val p = java.nio.file.Files.createTempDirectory("graft-manifest-se")
      .toString + "/events_log"
    val all = Events.load(spark, sfDir).drop("ts_us")
    import org.apache.spark.sql.functions.{col, lit, unix_micros}
    val mid = 1705276800000000L // 2024-01-15T00:00:00Z
    val early = all.filter(unix_micros(col("ts")) < mid)
    val late = all.filter(unix_micros(col("ts")) >= mid)
      .withColumn("quality", col("value") * 2)
    ManifestedLog.append(early, p) // v1: base schema
    ManifestedLog.append(late, p)  // v2: + quality column
    val t = ManifestedLog.load(spark, p)
    assert(t.count() == all.count())
    // untouched early days read under the evolved schema: null quality
    assert(t.filter(col("ts_us") < mid && col("quality").isNotNull).count() == 0)
    assert(t.filter(col("ts_us") >= mid && col("quality").isNull).count() == 0)
    // the change feed carries the evolved schema too
    assert(ManifestedLog.changesBetween(spark, p, 1L, 2L)
      .columns.contains("quality"))
    // physically, an early day's files predate the column...
    val (_, days) = ManifestedLog.readManifest(spark, p)
    def physicalCols(day: String): Set[String] =
      spark.read.parquet(new Path(new Path(p), days(day)).toString)
        .columns.toSet
    assert(!physicalCols("2024-01-10").contains("quality"))
    // ...until compaction rewrites it under the table schema
    ManifestedLog.compactDay(spark, p, "2024-01-10")
    val (_, days2) = ManifestedLog.readManifest(spark, p)
    assert(spark.read.parquet(new Path(new Path(p), days2("2024-01-10")).toString)
      .columns.contains("quality"))
    assert(ids(ManifestedLog.load(spark, p)) == ids(all))
    // retyping an existing column is refused, not coerced
    val bad = late.withColumn("quality", lit("high"))
    val e = intercept[RuntimeException](ManifestedLog.append(bad, p))
    assert(e.getMessage.contains("schema conflict"))
  }

  test("manifest range pruning reads only qualifying day directories") {
    val p = freshTable()
    // a one-day range must produce a plan over exactly one directory
    val oneDay = ManifestedLog.loadRange(spark, p,
      fromUs, fromUs + 86400000000L)
    val read = oneDay.inputFiles
    assert(read.nonEmpty && read.forall(_.contains("dt=2024-01-10.v1")),
      s"expected only the 2024-01-10 day dir, read: ${read.mkString(", ")}")
  }

  test("backfill append (one dt-partitioned pass) equals the per-day regime") {
    import org.apache.spark.sql.functions.col
    val ev = Events.load(spark, sfDir).drop("ts_us")
    val base = java.nio.file.Files.createTempDirectory("graft-backfill").toString
    // backfill regime: the full 30-day corpus in ONE append
    val pBack = base + "/events_backfill"
    assert(ManifestedLog.append(ev, pBack) == 1L)
    // per-day regime: the same corpus in <=8-day slices
    val pSlice = base + "/events_sliced"
    val days = ev.select(Events.utcDt(col("ts")).as("dt")).distinct()
      .collect().map(_.getString(0)).sorted
    assert(days.length > 8,
      "fixture must span >8 days for the backfill regime to engage")
    days.grouped(8).foreach { slice =>
      ManifestedLog.append(
        ev.filter(Events.utcDt(col("ts")).isin(slice.toSeq: _*)), pSlice)
    }
    // identical table content under both regimes
    val back = ManifestedLog.load(spark, pBack)
    val sliced = ManifestedLog.load(spark, pSlice)
    assert(back.exceptAll(sliced).isEmpty && sliced.exceptAll(back).isEmpty,
      "backfill and per-day regimes published different content")
    // sidecars landed in every backfill day dir (range reads file-skip)
    val (_, dayMap) = ManifestedLog.readManifest(spark, pBack)
    val f = new Path(pBack).getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(dayMap.values.forall(d =>
      f.exists(new Path(new Path(pBack), s"$d/_stats.txt"))))
    // re-delivering the whole backfill is a no-op (idempotent, COW path)
    assert(ManifestedLog.append(ev, pBack) == 2L)
    val again = ManifestedLog.load(spark, pBack)
    assert(again.count() == back.count() &&
      again.exceptAll(back).isEmpty, "re-delivered backfill changed content")
  }

  test("a pinned version survives vacuum; unpinning releases it") {
    val p = freshTable()                              // v1
    ManifestedLog.compactDay(spark, p, "2024-01-10")  // v2
    val before = ids(ManifestedLog.loadAt(spark, p, 1L))
    assert(ManifestedLog.pin(spark, p, "trainer", 1L) == 1L)
    assert(ManifestedLog.pins(spark, p) == Map("trainer" -> 1L))
    ManifestedLog.vacuum(spark, p, keepVersions = 1)
    // the pinned manifest AND the data dirs it lists survived
    assert(ManifestedLog.versions(spark, p) == Seq(1L, 2L))
    assert(ids(ManifestedLog.loadAt(spark, p, 1L)) == before)
    // released pin → next vacuum reclaims; late re-pin fails loudly
    assert(ManifestedLog.unpin(spark, p, "trainer"))
    ManifestedLog.vacuum(spark, p, keepVersions = 1)
    assert(ManifestedLog.versions(spark, p) == Seq(2L))
    intercept[RuntimeException](ManifestedLog.loadAt(spark, p, 1L))
    val e = intercept[RuntimeException](
      ManifestedLog.pin(spark, p, "late", 1L))
    assert(e.getMessage.contains("not retained"))
  }

  test("minAge shields just-published manifests from vacuum") {
    val p = freshTable()                              // v1, seconds old
    ManifestedLog.compactDay(spark, p, "2024-01-10")  // v2
    ManifestedLog.vacuum(spark, p, keepVersions = 1, minAgeMs = 3600000L)
    assert(ManifestedLog.versions(spark, p) == Seq(1L, 2L),
      "a manifest published within minAge must survive the sweep")
    ManifestedLog.vacuum(spark, p, keepVersions = 1)
    assert(ManifestedLog.versions(spark, p) == Seq(2L))
  }

  test("deleteByKey erases exactly the key; Blooms bound the rewrite") {
    import org.apache.spark.sql.functions.col
    val p = freshTable()
    val full = ManifestedLog.load(spark, p)
    // a single event lives in exactly one day — the shape where the
    // Bloom prune must show (the fixture's 15 users each span ~28 of 30
    // days, so a USER delete legitimately rewrites almost everything)
    val eid = full.select("event_id").head().getLong(0)
    val (v1, days1) = ManifestedLog.readManifest(spark, p)
    val v2 = ManifestedLog.deleteByKey(spark, p, "event_id", Seq(eid))
    assert(v2 == v1 + 1)
    val after = ManifestedLog.load(spark, p)
    assert(ids(after) == ids(full) - eid)
    // every day holding the key rewrote; the Bloom prune kept the
    // rewrite to a small fraction of the table (fp-rate tolerance)
    val (_, days2) = ManifestedLog.readManifest(spark, p)
    val rewritten = days2.keySet.filter(d => days1(d) != days2(d))
    val daysWithKey = full.filter(col("event_id") === eid)
      .select(Events.utcDt(col("ts")).as("dt")).distinct()
      .collect().map(_.getString(0)).toSet
    assert(daysWithKey.subsetOf(rewritten), "a day holding the key survived")
    assert(rewritten.size <= math.max(2, days2.size / 4),
      s"single-event delete rewrote ${rewritten.size}/${days2.size} days — no pruning")
    // the pre-delete bytes remain until vacuum (and then are gone)
    assert(ids(ManifestedLog.loadAt(spark, p, v1)) == ids(full))
    // idempotent: the fresh sidecars carry no Bloom hit for the key
    assert(ManifestedLog.deleteByKey(spark, p, "event_id", Seq(eid)) == v2)
    // a multi-day USER erasure is correct too (no pruning claim here)
    val u = after.select("user_id").head().getLong(0)
    ManifestedLog.deleteByKey(spark, p, "user_id", Seq(u))
    val erased = ManifestedLog.load(spark, p)
    assert(erased.filter(col("user_id") === u).count() == 0L)
    assert(ids(erased) == ids(after.filter(col("user_id") =!= u)))
    ManifestedLog.vacuum(spark, p, keepVersions = 1)
    intercept[RuntimeException](ManifestedLog.loadAt(spark, p, v1))
  }

  /** Two appenders racing the same table must BOTH land exactly-once:
    * staged day dirs are writer-token-named (no mutual overwrite), the
    * loser's publish throws ConcurrentWriteException, and append's
    * bounded retry rebuilds against the winner's manifest. Run for both
    * write regimes; any thread interleaving must converge to the union
    * in a linear version chain. */
  private def raceAppenders(a: org.apache.spark.sql.DataFrame,
                            b: org.apache.spark.sql.DataFrame,
                            p: String): Seq[Long] = {
    import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
    val pool = Executors.newFixedThreadPool(2)
    val start = new CountDownLatch(1)
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
    val published = new java.util.concurrent.ConcurrentLinkedQueue[Long]
    try {
      Seq(a, b).foreach { batch =>
        pool.submit(new Runnable {
          def run(): Unit = {
            start.await()
            try published.add(ManifestedLog.append(batch, p))
            catch { case t: Throwable => failures.add(t) }
          }
        })
      }
      start.countDown()
      pool.shutdown()
      assert(pool.awaitTermination(300, TimeUnit.SECONDS), "appenders hung")
    } finally pool.shutdownNow()
    assert(failures.isEmpty,
      s"racing append failed: ${Option(failures.peek()).map(_.toString)}")
    import scala.jdk.CollectionConverters._
    published.asScala.toSeq.sorted
  }

  test("two racing appenders converge to the union (per-day regime)") {
    import org.apache.spark.sql.functions.col
    val ev = Events.load(spark, sfDir).drop("ts_us")
    // restrict to 3 days so both appends take the per-day COW path
    val days3 = Seq("2024-01-10", "2024-01-11", "2024-01-12")
    val slice = ev.filter(Events.utcDt(col("ts")).isin(days3: _*))
    val p = java.nio.file.Files.createTempDirectory("graft-race-cow")
      .toString + "/events_log"
    ManifestedLog.write(slice.filter(col("event_id") % 3 === 0), p) // v1
    val a = slice.filter(col("event_id") % 3 === 1)
    val b = slice.filter(col("event_id") % 3 === 2)
    raceAppenders(a, b, p)
    // both batches landed, one linear version chain, no lost update
    assert(ManifestedLog.readManifest(spark, p)._1 == 3L)
    assert(ids(ManifestedLog.load(spark, p)) == ids(slice))
    // staged leftovers of the losing attempt were cleaned eagerly
    val f = new Path(p).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val (_, live) = ManifestedLog.readManifest(spark, p)
    val liveAt1 = ManifestedLog.readManifestAt(spark, p, 1L).values.toSet
    val liveAt2 = ManifestedLog.readManifestAt(spark, p, 2L).values.toSet
    val onDisk = f.listStatus(new Path(p)).map(_.getPath.getName)
      .filter(_.startsWith("dt=")).toSet
    assert(onDisk == live.values.toSet ++ liveAt1 ++ liveAt2,
      s"orphaned staged dirs left behind: ${onDisk -- live.values.toSet -- liveAt1 -- liveAt2}")
  }

  test("a compaction sweep racing a live appender converges (maintain-vs-ingest)") {
    import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
    import org.apache.spark.sql.functions.col
    val ev = Events.load(spark, sfDir).drop("ts_us")
    val p = java.nio.file.Files.createTempDirectory("graft-race-compact")
      .toString + "/events_log"
    // fragmented base so the sweep has work to find
    ManifestedLog.write(ev.filter(col("event_id") % 2 === 0).repartition(6), p)
    val batch = ev.filter(col("event_id") % 2 === 1)
    val wm = Events.dayBoundsUs("2024-02-01")._2 // everything closed
    val pool = Executors.newFixedThreadPool(2)
    val start = new CountDownLatch(1)
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
    def submit(task: () => Unit): Unit = pool.submit(new Runnable {
      def run(): Unit = {
        start.await()
        try task() catch { case t: Throwable => failures.add(t) }
      }
    })
    submit(() => { ManifestedLog.append(batch, p); () })
    submit(() => { ManifestedLog.compactClosedDays(spark, p, wm); () })
    start.countDown(); pool.shutdown()
    assert(pool.awaitTermination(300, TimeUnit.SECONDS), "race hung")
    assert(failures.isEmpty,
      s"maintain-vs-ingest race failed: ${Option(failures.peek()).map(_.toString)}")
    // whatever the interleaving, content is the union and nothing tore
    assert(ids(ManifestedLog.load(spark, p)) == ids(ev))
  }

  test("vacuum's orphan age guard protects in-flight append staging") {
    val p = freshTable()                              // v1
    ManifestedLog.compactDay(spark, p, "2024-01-10")  // v2 (supersedes a dir)
    val f = new Path(p).getFileSystem(spark.sparkContext.hadoopConfiguration)
    // simulate an in-flight appender: a token-named day dir and staging
    // tree that NO manifest references yet
    val inflight = new Path(p, "dt=2024-01-11.v2-abcd1234")
    val staging = new Path(p, ".staging-append-v3-abcd1234")
    f.mkdirs(inflight); f.mkdirs(staging)
    ManifestedLog.vacuum(spark, p, keepVersions = 1, orphanMinAgeMs = 3600000L)
    // never-referenced young entries survived the sweep...
    assert(f.exists(inflight) && f.exists(staging),
      "vacuum deleted an in-flight appender's staging — table corruption race")
    // ...but the superseded PUBLISHED dir (referenced by deleted v1) is
    // reclaimed immediately despite the orphan guard
    assert(!f.exists(new Path(p, "dt=2024-01-10.v1")))
    assert(ManifestedLog.versions(spark, p) == Seq(2L))
    // an eager sweep (default 0) still reclaims the orphans
    ManifestedLog.vacuum(spark, p, keepVersions = 1)
    assert(!f.exists(inflight) && !f.exists(staging))
  }

  test("two racing appenders converge to the union (backfill regime)") {
    import org.apache.spark.sql.functions.col
    val ev = Events.load(spark, sfDir).drop("ts_us") // 30 days > BackfillDays
    val p = java.nio.file.Files.createTempDirectory("graft-race-backfill")
      .toString + "/events_log"
    val a = ev.filter(col("event_id") % 2 === 0)
    val b = ev.filter(col("event_id") % 2 === 1)
    val published = raceAppenders(a, b, p) // includes a racing BOOTSTRAP
    val (finalV, _) = ManifestedLog.readManifest(spark, p)
    assert(finalV == 2L,
      s"final=$finalV versions=${ManifestedLog.versions(spark, p)} " +
        s"published=$published")
    assert(ids(ManifestedLog.load(spark, p)) == ids(ev))
  }
}
