package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** CDC changelog apply: latest-wins upsert/tombstone semantics, and the
  * compaction associativity that justifies incremental maintenance at
  * scale — including batches interleaved in event time, where eager
  * tombstone dropping would resurrect deleted keys. */
class CdcSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private def log() = Events.load(spark, sfDir)

  test("tombstoned keys are absent; upserted keys carry their latest payload") {
    import spark.implicits._
    // (key, ts_us, seq, op, value)
    val rows = Seq(
      (1L, 10L, 1L, "set", 1.0), (1L, 20L, 2L, "set", 2.0),   // upsert twice
      (2L, 10L, 3L, "set", 3.0), (2L, 20L, 4L, "del", 0.0),   // deleted
      (3L, 20L, 5L, "del", 0.0), (3L, 30L, 6L, "set", 9.0),   // resurrected
      (4L, 10L, 7L, "del", 0.0))                              // only a tombstone
      .toDF("user_id", "ts_us", "event_id", "event_type", "value")
    val snap = Cdc.applyChangelog(rows, tombstone = "del",
        payloadCols = Seq("ts_us", "event_type", "value"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(3))).toMap
    assert(snap == Map(1L -> (20L, 2.0), 3L -> (30L, 9.0)))
  }

  test("seq breaks ts ties: the higher event_id wins") {
    import spark.implicits._
    val rows = Seq(
      (1L, 10L, 1L, "set", 1.0), (1L, 10L, 2L, "del", 0.0),
      (2L, 10L, 4L, "set", 5.0), (2L, 10L, 3L, "del", 0.0))
      .toDF("user_id", "ts_us", "event_id", "event_type", "value")
    val snap = Cdc.applyChangelog(rows, tombstone = "del",
        payloadCols = Seq("event_id", "value"))
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(snap == Map(2L -> 5.0)) // key 1's latest (seq 2) is the tombstone
  }

  test("compaction is associative: incremental merge over an INTERLEAVED " +
       "split equals the full-log apply") {
    val ev = log()
    // event_id parity interleaves the batches in event time — the split a
    // tombstone-dropping merge gets wrong
    val first = ev.filter(col("event_id") % 2 === 0)
    val second = ev.filter(col("event_id") % 2 =!= 0)
    val incr = Cdc.readView(Cdc.mergeCompacted(Cdc.compactLog(first), second))
    val full = Cdc.applyChangelog(ev)
    assert(incr.exceptAll(full).isEmpty && full.exceptAll(incr).isEmpty)
    assert(full.count() > 0)
  }

  test("a retained tombstone keeps deleting against a LATE stale batch; " +
       "a newer delta upsert resurrects") {
    import spark.implicits._
    val pay = Seq("ts_us", "event_id", "event_type", "value")
    val batch1 = Seq((1L, 10L, 1L, "set", 1.0), (1L, 20L, 2L, "del", 0.0))
      .toDF("user_id", "ts_us", "event_id", "event_type", "value")
    val compacted = Cdc.compactLog(batch1, payloadCols = pay)
    assert(Cdc.readView(compacted, payloadCols = pay, tombstone = "del").isEmpty)
    // late-arriving batch OLDER than the tombstone: key must stay deleted
    val stale = Seq((1L, 15L, 9L, "set", 4.0))
      .toDF("user_id", "ts_us", "event_id", "event_type", "value")
    val afterStale = Cdc.mergeCompacted(compacted, stale, payloadCols = pay)
    assert(Cdc.readView(afterStale, payloadCols = pay, tombstone = "del").isEmpty)
    // genuinely newer upsert: key reappears
    val fresh = Seq((1L, 30L, 3L, "set", 7.0))
      .toDF("user_id", "ts_us", "event_id", "event_type", "value")
    val afterFresh = Cdc.mergeCompacted(afterStale, fresh, payloadCols = pay)
    assert(Cdc.readView(afterFresh, payloadCols = pay, tombstone = "del")
      .select("user_id", "value").as[(Long, Double)].collect()
      .toSeq == Seq((1L, 7.0)))
  }

  test("the apply is one partial+final aggregate — no window sort over the log") {
    val plan = Cdc.applyChangelog(log()).queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"unexpected window sort:\n$plan")
    assert(plan.contains("partial_max_by"),
           s"expected a partial (map-side) max_by before the exchange:\n$plan")
  }
}
