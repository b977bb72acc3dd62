package graft.operators

import graft.SparkSpec
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

/** Incrementally-maintained CDC snapshot over a manifested log: every
  * update folds only the change feed into the compacted state, and the
  * result must equal the full-log recompute at every version. */
class SnapshotTableSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  /** A three-version log: v1 = two thirds of the corpus, v2 and v3
    * append one half of the remainder each. */
  private def threeVersionLog(): String = {
    val p = java.nio.file.Files.createTempDirectory("graft-snap-log")
      .toString + "/events_log"
    val ev = Events.load(spark, sfDir).drop("ts_us")
    ManifestedLog.append(ev.filter(col("event_id") % 3 =!= 0), p)
    ManifestedLog.append(ev.filter(col("event_id") % 6 === 0), p)
    ManifestedLog.append(ev.filter(col("event_id") % 6 === 3), p)
    p
  }

  private def snapDir(): String =
    java.nio.file.Files.createTempDirectory("graft-snap").toString + "/snapshot"

  private def keyed(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("user_id", "event_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("bootstrap + incremental updates equal the full recompute at each version") {
    val log = threeVersionLog()
    val snap = snapDir()
    for (v <- 1L to 3L) {
      assert(SnapshotTable.update(spark, log, snap, toVersion = Some(v)) == v)
      val got = keyed(SnapshotTable.readView(spark, snap))
      val want = keyed(Cdc.applyChangelog(
        ManifestedLog.loadAt(spark, log, v)))
      assert(got == want, s"version $v: incremental != full recompute")
    }
    assert(SnapshotTable.version(spark, snap) == 3L)
  }

  test("update to an unchanged version is a no-op; snapshots never move backward") {
    val log = threeVersionLog()
    val snap = snapDir()
    SnapshotTable.update(spark, log, snap)
    val before = keyed(SnapshotTable.read(spark, snap))
    assert(SnapshotTable.update(spark, log, snap) == 3L)
    assert(keyed(SnapshotTable.read(spark, snap)) == before)
    val e = intercept[RuntimeException](
      SnapshotTable.update(spark, log, snap, toVersion = Some(2L)))
    assert(e.getMessage.contains("only advances"))
  }

  test("tombstones keep deleting across incremental merges") {
    val log = threeVersionLog()
    val snap = snapDir()
    SnapshotTable.update(spark, log, snap)
    // a user whose latest row is a tombstone must be absent from the
    // view but PRESENT (as a tombstone) in the compacted state
    val compacted = SnapshotTable.read(spark, snap)
    val dead = compacted.filter(col("event_type") === "error")
      .select("user_id").collect().map(_.getLong(0))
    if (dead.nonEmpty) {
      val view = SnapshotTable.readView(spark, snap)
      assert(view.filter(col("user_id").isin(dead.take(5): _*)).count() == 0L)
    }
  }

  test("a crash before the commit marker leaves the snapshot unchanged") {
    val log = threeVersionLog()
    val snap = snapDir()
    SnapshotTable.update(spark, log, snap, toVersion = Some(2L))
    val before = keyed(SnapshotTable.read(spark, snap))
    // simulate the crash remnant: a half-written v3 dir, no marker
    val f = new Path(snap).getFileSystem(spark.sparkContext.hadoopConfiguration)
    f.mkdirs(new Path(snap, "v3"))
    assert(SnapshotTable.version(spark, snap) == 2L)
    assert(keyed(SnapshotTable.read(spark, snap)) == before)
    // the next update overwrites the orphan and commits
    assert(SnapshotTable.update(spark, log, snap) == 3L)
    assert(keyed(SnapshotTable.readView(spark, snap)) ==
      keyed(Cdc.applyChangelog(ManifestedLog.load(spark, log))))
  }

  test("streaming ingest keeps the snapshot current after every trigger") {
    import spark.implicits._
    import graft.streaming.EventStreams.Event
    def ts(iso: String): java.sql.Timestamp =
      java.sql.Timestamp.from(java.time.Instant.parse(iso))
    val dir = java.nio.file.Files.createTempDirectory("graft-snap-stream").toString
    val log = s"$dir/log"; val snap = s"$dir/snapshot"
    val batch1 = Seq(
      Event(1L, ts("2024-01-10T06:00:00Z"), 10L, "view", 1.0),
      Event(2L, ts("2024-01-10T07:00:00Z"), 11L, "click", 2.0))
    val batch2 = Seq( // upsert user 10, tombstone user 11
      Event(3L, ts("2024-01-10T08:00:00Z"), 10L, "purchase", 3.0),
      Event(4L, ts("2024-01-10T09:00:00Z"), 11L, "error", 4.0))
    implicit val sqlCtx = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Event]
    val q = SnapshotTable.ingestMaintained(input.toDF(), log, snap, s"$dir/ckpt")
    try {
      input.addData(batch1: _*); q.processAllAvailable()
      assert(keyed(SnapshotTable.readView(spark, snap)) ==
        keyed(Cdc.applyChangelog(ManifestedLog.load(spark, log))))
      input.addData(batch2: _*); q.processAllAvailable()
      val view = keyed(SnapshotTable.readView(spark, snap))
      assert(view == keyed(Cdc.applyChangelog(ManifestedLog.load(spark, log))))
      assert(view == Set((10L, 3L))) // user 11 tombstoned, user 10 upserted
    } finally q.stop()
  }

  test("maintain: one sweep compacts, advances the snapshot, trims history") {
    val log = threeVersionLog()
    val snap = snapDir()
    val maxUs = ManifestedLog.load(spark, log)
      .agg(max(col("ts_us"))).collect().head.getLong(0)
    val (compacted, snapV) = ManifestedLog.maintain(
      spark, log, watermarkUs = maxUs + 86400000000L,
      snapshotPath = Some(snap), keepVersions = 1)
    // every closed fragmented day got one rewrite; the snapshot is
    // current; only the newest manifest survives
    assert(snapV.contains(ManifestedLog.readManifest(spark, log)._1))
    assert(ManifestedLog.versions(spark, log).size == 1)
    assert(keyed(SnapshotTable.readView(spark, snap)) ==
      keyed(Cdc.applyChangelog(ManifestedLog.load(spark, log))))
    // post-maintenance reads are intact and every kept day is compact
    val f = new Path(log).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val (_, days) = ManifestedLog.readManifest(spark, log)
    if (compacted.nonEmpty) days.foreach { case (_, dir) =>
      val files = f.listStatus(new Path(new Path(log), dir))
        .count(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      assert(files == 1, s"$dir still fragmented after maintain: $files files")
    }
    // a second sweep is a no-op (nothing fragmented, snapshot current)
    val (again, v2) = ManifestedLog.maintain(
      spark, log, maxUs + 86400000000L, Some(snap), keepVersions = 1)
    assert(again.isEmpty && v2 == snapV)
  }

  test("vacuum keeps the newest versions and reclaims the rest") {
    val log = threeVersionLog()
    val snap = snapDir()
    for (v <- 1L to 3L) SnapshotTable.update(spark, log, snap, toVersion = Some(v))
    val before = keyed(SnapshotTable.read(spark, snap))
    assert(SnapshotTable.vacuum(spark, snap) >= 2L)
    val f = new Path(snap).getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!f.exists(new Path(snap, "v1")) && !f.exists(new Path(snap, "v2")))
    assert(keyed(SnapshotTable.read(spark, snap)) == before)
  }

  test("point lookup prunes state files via the sidecar, same rows as the view") {
    val log = threeVersionLog()
    val snap = snapDir()
    SnapshotTable.update(spark, log, snap)
    val view = SnapshotTable.readView(spark, snap)
    val stateDir = new Path(snap, s"v${SnapshotTable.version(spark, snap)}")
    val f = stateDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(f.exists(new Path(stateDir, "_stats.txt")),
      "publish must leave a sidecar in the state dir")
    val allFiles = f.listStatus(stateDir)
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      .map(_.getPath.toUri.getPath).toSet
    // pick live keys actually present and check exact equality + pruning
    val someKeys = view.select("user_id").limit(3).collect().map(_.getLong(0))
    for (k <- someKeys) {
      val got = SnapshotTable.readViewByKey(spark, snap, Seq(k))
      assert(keyed(got) == keyed(view.filter(col("user_id") === k)),
        s"key $k: pruned lookup != view filter")
      // the exact file set holding the key (ground truth from the data)
      val holding = allFiles.filter(p =>
        spark.read.parquet(p).filter(col("user_id") === k).count() > 0)
      val readSet = got.inputFiles.map(p => new java.net.URI(p).getPath).toSet
      assert(readSet == holding,
        s"key $k: read $readSet, expected exactly $holding")
    }
    // absent key: no files read at all (bloom skips every file)
    val absent = SnapshotTable.readViewByKey(spark, snap, Seq(-987654321L))
    assert(absent.count() == 0L)
    // multi-key lookups equal the view filter too
    val multi = SnapshotTable.readViewByKey(spark, snap, someKeys.toSeq)
    assert(keyed(multi) ==
      keyed(view.filter(col("user_id").isin(someKeys.toSeq: _*))))
  }

  test("point lookup on a non-bounds column stays exact (no false negatives)") {
    // publish writes bounds + Bloom for the DEFAULT keyCol (user_id);
    // a lookup keyed on a different column must not compare its keys
    // against user_id's min/max — that bounds check silently skipped
    // files holding matching rows (event_ids are far outside the
    // user_id range). The sidecar's '#bounds' column is now parsed and
    // the bounds apply only when it matches the queried column; the
    // Bloom path already keys on (file, col) and conservatively
    // includes on mismatch.
    val log = threeVersionLog()
    val snap = snapDir()
    SnapshotTable.update(spark, log, snap)
    val view = SnapshotTable.readView(spark, snap)
    val someEids = view.select("event_id").limit(3).collect().map(_.getLong(0))
    for (eid <- someEids) {
      val got = SnapshotTable.readViewByKey(spark, snap, Seq(eid),
        keyCol = "event_id")
      assert(keyed(got) == keyed(view.filter(col("event_id") === eid)),
        s"event_id $eid: lookup on a non-bounds column lost rows")
    }
  }

  test("a column added mid-log flows through the incremental snapshot") {
    // state written BEFORE the evolution must migrate through update's
    // keyed merge: null for keys last touched pre-evolution, populated
    // for keys the evolved delta upserts — and incremental must equal
    // the full recompute under the evolved schema at every step.
    val log = threeVersionLog()
    val snap = snapDir()
    SnapshotTable.update(spark, log, snap, toVersion = Some(3L))
    assert(!SnapshotTable.read(spark, snap).columns.contains("note"))
    // v4 appends a batch carrying a brand-new column
    val evolved = Events.load(spark, sfDir).drop("ts_us")
      .filter(col("event_id") % 7 === 0)
      .withColumn("event_id", col("event_id") + 50000000L)
      .withColumn("note", concat(lit("n"), col("user_id")))
    ManifestedLog.append(evolved, log)
    SnapshotTable.update(spark, log, snap)
    val view = SnapshotTable.readView(spark, snap)
    assert(view.columns.contains("note"),
      "evolved column lost in the snapshot merge")
    // equals the full recompute with the evolved payload
    val want = Cdc.applyChangelog(ManifestedLog.load(spark, log),
      payloadCols = Seq("event_id", "ts_us", "event_type", "value", "note"))
    assert(keyed(view) == keyed(want))
    val gotNotes = view.select("user_id", "note").collect()
      .map(r => (r.getLong(0), Option(r.getString(1)))).toMap
    val wantNotes = want.select("user_id", "note").collect()
      .map(r => (r.getLong(0), Option(r.getString(1)))).toMap
    assert(gotNotes == wantNotes,
      "evolved column values diverge from the full recompute")
    // both populated and null-migrated keys exist (the fixture split
    // guarantees pre-evolution keys survive the evolved upserts)
    assert(gotNotes.values.exists(_.isDefined))
    assert(gotNotes.values.exists(_.isEmpty))
    // a later no-evolution update keeps the migrated column
    val more = Events.load(spark, sfDir).drop("ts_us")
      .filter(col("event_id") % 11 === 0)
      .withColumn("event_id", col("event_id") + 90000000L)
    ManifestedLog.append(more, log)
    SnapshotTable.update(spark, log, snap)
    assert(SnapshotTable.readView(spark, snap).columns.contains("note"))
    // point lookups read the evolved state too
    val k = evolved.select("user_id").head().getLong(0)
    val byKey = SnapshotTable.readViewByKey(spark, snap, Seq(k))
    assert(byKey.columns.contains("note"))
  }

  test("a physical delete needs a snapshot re-bootstrap (pinned caveat + recipe)") {
    // changesBetween diffs ADDED keys, so a physical deleteByKey emits
    // NO delta — an incrementally-advanced snapshot retains the erased
    // key (the documented caveat), and the documented recipe (fresh
    // bootstrap) completes the erasure. Both halves pinned here.
    val log = threeVersionLog()
    val snap = snapDir()
    SnapshotTable.update(spark, log, snap)
    val victim = SnapshotTable.readView(spark, snap)
      .select("user_id").head().getLong(0)
    ManifestedLog.deleteByKey(spark, log, "user_id", Seq(victim))
    SnapshotTable.update(spark, log, snap) // advances, but sees no delta
    assert(SnapshotTable.readView(spark, snap)
      .filter(col("user_id") === victim).count() > 0L,
      "caveat no longer holds — update saw the physical delete; revisit the docs")
    // the recipe: re-bootstrap a fresh snapshot
    val snap2 = snapDir()
    SnapshotTable.update(spark, log, snap2)
    assert(SnapshotTable.readView(spark, snap2)
      .filter(col("user_id") === victim).count() == 0L)
    assert(keyed(SnapshotTable.readView(spark, snap2)) ==
      keyed(Cdc.applyChangelog(ManifestedLog.load(spark, log))))
  }

  test("maintain honors reader pins across the log AND snapshot chain") {
    val log = threeVersionLog()
    val snap = snapDir()
    // snapshot advanced at every version, so commits v1..v3 exist
    for (v <- 1L to 3L) SnapshotTable.update(spark, log, snap, toVersion = Some(v))
    val pinnedLog = ids(ManifestedLog.loadAt(spark, log, 2L))
    ManifestedLog.pin(spark, log, "replica", 2L)
    val maxUs = ManifestedLog.load(spark, log)
      .agg(max(col("ts_us"))).collect().head.getLong(0)
    ManifestedLog.maintain(spark, log, watermarkUs = maxUs + 86400000000L,
      snapshotPath = Some(snap), keepVersions = 1)
    // the pinned log version survived the sweep with its data...
    assert(ManifestedLog.versions(spark, log).contains(2L))
    assert(ids(ManifestedLog.loadAt(spark, log, 2L)) == pinnedLog)
    // ...and so did its matching snapshot commit (v1 did not)
    val f = new Path(snap).getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(f.exists(new Path(snap, "v2")) && !f.exists(new Path(snap, "v1")))
    // the pinned snapshot state is still readable
    assert(spark.read.parquet(new Path(snap, "v2").toString).count() > 0L)
  }

  private def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
    df.select("event_id").collect().map(_.getLong(0)).toSet
}
