package graft.plans

import graft.SparkSpec
import graft.operators.{Events, ManifestedLog}
import graft.plans.{Op => O}

/** NL maintenance + time-travel verbs over a manifested table: parse
  * shapes, head-position and bound-path requirements, and end-to-end
  * semantics (loadAt pins content; compact/vacuum advance the table but
  * never change what it reads back). */
class TableOpSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private def freshTable(): String = {
    val p = java.nio.file.Files.createTempDirectory("graft-tableop")
      .toString + "/events_log"
    // round-robin repartition ahead of the day-partitioned write leaves
    // every day dir with 4 files — guaranteed fragmentation for the
    // compaction verb to find at this fixture scale
    ManifestedLog.write(Events.load(spark, sfDir).repartition(4), p)
    p
  }

  private def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
    df.select("event_id").collect().map(_.getLong(0)).toSet

  // ------------------------------------------------------------- parse

  test("time-travel, compaction, and vacuum verbs parse to their ops") {
    assert(NLParser.parse("Read the table at version 3.").ops ==
      List(O.LoadAtVersion(3L)))
    assert(NLParser.parse("Load the log at version 12.").ops ==
      List(O.LoadAtVersion(12L)))
    assert(NLParser.parse(
      "Compact closed days before '2024-02-01T00:00:00Z'.").ops ==
      List(O.CompactClosedDays(1706745600000000L)))
    assert(NLParser.parse(
      "Compact the table with watermark '2024-02-01T00:00:00Z'.").ops ==
      List(O.CompactClosedDays(1706745600000000L)))
    assert(NLParser.parse("Vacuum the table keeping 3 versions.").ops ==
      List(O.VacuumKeep(3)))
    assert(NLParser.parse("Vacuum keep 1 version.").ops ==
      List(O.VacuumKeep(1)))
  }

  test("snapshot and point-lookup verbs parse to their ops") {
    assert(NLParser.parse("Maintain the snapshot of the table.").ops ==
      List(O.SnapshotMaintain))
    assert(NLParser.parse("Maintain the snapshot.").ops ==
      List(O.SnapshotMaintain))
    assert(NLParser.parse("Lookup key 42 in the snapshot.").ops ==
      List(O.SnapshotLookup(Seq(42L))))
    assert(NLParser.parse("Lookup keys 42, 43 in the snapshot.").ops ==
      List(O.SnapshotLookup(Seq(42L, 43L))))
    assert(NLParser.parse("Lookup user_id 42.").ops ==
      List(O.KeyLookup("user_id", Seq(42L))))
    assert(NLParser.parse(
      "Lookup user_id 42 between '2024-01-10T00:00:00Z' and " +
        "'2024-01-20T00:00:00Z'.").ops ==
      List(O.KeyLookup("user_id", Seq(42L),
        Some(1704844800000000L), Some(1705708800000000L))))
    intercept[NLParser.ParseException](
      NLParser.parse("Lookup user_id 42 between '2024-01-20T00:00:00Z' " +
        "and '2024-01-10T00:00:00Z'.")) // empty range
    intercept[NLParser.ParseException](
      NLParser.parse("Lookup key 42.")) // snapshot form needs its table
    assert(NLParser.parse("Delete user_id 42 from the table.").ops ==
      List(O.DeleteByKey("user_id", Seq(42L))))
    assert(NLParser.parse("Forget user_id 42, 43.").ops ==
      List(O.DeleteByKey("user_id", Seq(42L, 43L))))
    assert(NLParser.parse("Erase event_id 7 from the log.").ops ==
      List(O.DeleteByKey("event_id", Seq(7L))))
  }

  test("table verbs compose with downstream clauses") {
    val plan = NLParser.parse(
      "Read the table at version 2 and keep events between " +
        "'2024-01-10T00:00:00Z' and '2024-01-12T00:00:00Z' and " +
        "select columns event_id and user_id.")
    assert(plan.ops == List(
      O.LoadAtVersion(2L),
      O.EventTimeRange(1704844800000000L, 1705017600000000L),
      O.Select(Seq("event_id", "user_id"))))
  }

  test("bad shapes fail at parse time with named errors") {
    intercept[NLParser.ParseException](
      NLParser.parse("Read the table at version 0."))
    intercept[NLParser.ParseException](
      NLParser.parse("Vacuum the table keeping 0 versions."))
    intercept[NLParser.ParseException](
      NLParser.parse("Compact closed days."))
  }

  // ----------------------------------------------------------- compile

  test("a table op without a bound table path fails loudly") {
    val input = Events.load(spark, sfDir)
    val e = intercept[InvalidPlanException](
      graft.Engine.run("Read the table at version 1.", input))
    assert(e.getMessage.contains("manifested table"))
  }

  test("a table op not leading the plan fails loudly") {
    val input = Events.load(spark, sfDir)
    val e = intercept[InvalidPlanException](
      graft.Engine.run(
        "Select columns event_id and read the table at version 1.",
        input, tablePath = Some("/nonexistent")))
    assert(e.getMessage.contains("must lead the plan"))
  }

  // -------------------------------------------------------- end-to-end

  test("NL time travel reads the pinned version's exact content") {
    val p = freshTable()                              // v1
    ManifestedLog.compactDay(spark, p, "2024-01-10")  // v2
    val want = ids(ManifestedLog.loadAt(spark, p, 1L))
    val got = ids(graft.Engine.run(
      "Read the table at version 1 and select columns event_id, " +
        "user_id, ts_us, event_type, value.",
      ManifestedLog.load(spark, p), tablePath = Some(p)))
    assert(got == want && got.nonEmpty)
    // an unretained version fails loudly through the NL route too
    ManifestedLog.vacuum(spark, p, keepVersions = 1)
    val e = intercept[RuntimeException](graft.Engine.run(
      "Read the table at version 1.",
      ManifestedLog.load(spark, p), tablePath = Some(p)).collect())
    assert(e.getMessage.contains("not retained"))
  }

  test("NL compact + vacuum mutate the table, never its content") {
    val p = freshTable()
    val before = ids(ManifestedLog.load(spark, p))
    val (v1, _) = ManifestedLog.readManifest(spark, p)
    val afterCompact = ids(graft.Engine.run(
      "Compact closed days before '2030-01-01T00:00:00Z' and " +
        "select columns event_id, user_id, ts_us, event_type, value.",
      ManifestedLog.load(spark, p), tablePath = Some(p)))
    assert(afterCompact == before)
    val (v2, _) = ManifestedLog.readManifest(spark, p)
    assert(v2 > v1, "compaction found fragmented closed days and flipped")
    val afterVacuum = ids(graft.Engine.run(
      "Vacuum the table keeping 1 versions and " +
        "select columns event_id, user_id, ts_us, event_type, value.",
      ManifestedLog.load(spark, p), tablePath = Some(p)))
    assert(afterVacuum == before)
    assert(ManifestedLog.versions(spark, p) == Seq(v2),
      "vacuum trimmed history to the newest version")
  }

  test("NL snapshot maintain + lookup run against the colocated snapshot") {
    import org.apache.spark.sql.functions.col
    val p = freshTable()
    val view = graft.Engine.run(
      "Maintain the snapshot of the table and select columns user_id, " +
        "event_id, ts_us, event_type and value.",
      ManifestedLog.load(spark, p), tablePath = Some(p))
    val want = graft.operators.Cdc.applyChangelog(ManifestedLog.load(spark, p))
    assert(ids(view) == ids(want) && ids(view).nonEmpty)
    // the snapshot landed under <table>/_snapshot and is now current
    val snap = new org.apache.hadoop.fs.Path(p, "_snapshot").toString
    assert(graft.operators.SnapshotTable.version(spark, snap) ==
      ManifestedLog.readManifest(spark, p)._1)
    // point lookup equals the view filter
    val k = want.select("user_id").head().getLong(0)
    val got = graft.Engine.run(
      s"Lookup key $k in the snapshot and select columns user_id, " +
        "event_id, ts_us, event_type and value.",
      ManifestedLog.load(spark, p), tablePath = Some(p))
    assert(ids(got) == ids(want.filter(col("user_id") === k)))
    // vacuum does not reclaim the underscore-named snapshot
    ManifestedLog.vacuum(spark, p, keepVersions = 1)
    assert(graft.operators.SnapshotTable.versionOpt(spark, snap).nonEmpty)
  }

  test("NL key lookup equals the full-scan filter, ranged and unranged") {
    import org.apache.spark.sql.functions.col
    val p = freshTable()
    val full = ManifestedLog.load(spark, p)
    // a key guaranteed to have events inside the spoken range
    val k = full.filter(col("ts_us") >= 1704844800000000L &&
        col("ts_us") < 1705708800000000L)
      .select("user_id").head().getLong(0)
    val plain = graft.Engine.run(
      s"Lookup user_id $k and select columns event_id, user_id, ts_us, " +
        "event_type and value.",
      full, tablePath = Some(p))
    assert(ids(plain) == ids(full.filter(col("user_id") === k)))
    val ranged = graft.Engine.run(
      s"Lookup user_id $k between '2024-01-10T00:00:00Z' and " +
        "'2024-01-20T00:00:00Z' and select columns event_id, user_id, " +
        "ts_us, event_type and value.",
      full, tablePath = Some(p))
    assert(ids(ranged) == ids(full.filter(col("user_id") === k &&
      col("ts_us") >= 1704844800000000L && col("ts_us") < 1705708800000000L)))
    assert(ids(ranged).nonEmpty && ids(ranged).subsetOf(ids(plain)))
  }
}
