package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Batch event-time operators over the driver's ns-precision parquet. */
class EventsProbeSpec extends SparkSpec {

  private lazy val events = Events.load(spark, "/root/testdata/sf0.001")

  test("fixture loads with exact epoch-micro ts_us whatever its ts encoding") {
    val r = events.select(col("ts_us"), col("ts")).head
    assert(r.getLong(0) > 1500000000000000L, "epoch micros expected")
    assert(r.getTimestamp(1).getTime == r.getLong(0) / 1000, "ts must be µs-derived")
  }

  test("tumbling counts cover the whole month and sum to row count") {
    val total = events.count()
    val windows = Events.tumblingCounts(events)
    assert(windows.agg(sum("n_events")).head.getLong(0) == total)
  }

  test("sliding windows place every event in exactly width/slide windows") {
    val total = events.count()
    val windows = Events.slidingCounts(events, "1 hour", "15 minutes")
    assert(windows.agg(sum("n_events")).head.getLong(0) == 4 * total)
    // window starts are slide-aligned
    assert(windows.filter(col("window_start_ms") % (15 * 60 * 1000L) =!= 0).count() == 0)
  }

  test("sessionize partitions all events; bounds ordered; gap rule holds") {
    val sessions = Events.sessionize(events, gapMinutes = 30)
    val total = events.count()
    assert(sessions.agg(sum("n_events")).head.getLong(0) == total)
    assert(sessions.filter(col("session_end_us") < col("session_start_us")).count() == 0)
    // consecutive sessions of one user must be >= gap apart
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("session_start_us")
    val gaps = sessions
      .withColumn("prev_end", lag(col("session_end_us"), 1).over(w))
      .filter(col("prev_end").isNotNull)
      .filter(col("session_start_us") - col("prev_end") < 30L * 60 * 1000000)
    assert(gaps.count() == 0, "sessions closer than the gap must have merged")
  }

  test("latestSnapshot keeps exactly the max-(ts,id) row per user, one exchange, no window") {
    val snap = Events.latestSnapshot(events)
    assert(snap.count() == events.select("user_id").distinct.count())
    // agree with the row_number formulation it replaces
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("ts_us").desc, col("event_id").desc)
    val expect = events.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).select("user_id", "event_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = snap.select("user_id", "event_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == expect)
    // one shuffle (partial agg before it), never a WindowExec over the log
    val plan = snap.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan)
    assert("Exchange".r.findAllIn(plan).size == 1, plan)
  }

  test("funnel: conversion ordering, null for non-converters, no phantom users") {
    val f = Events.funnel(events).collect()
    assert(f.nonEmpty)
    // every row's user had a signup; converters purchased at-or-after it
    f.foreach { r =>
      assert(!r.isNullAt(1), "first_from_us must be present")
      if (r.getBoolean(3)) assert(r.getLong(2) >= r.getLong(1))
      else assert(r.isNullAt(2))
    }
    // row count == users with >=1 signup; converted count matches an
    // independent formulation over the raw events
    val signupUsers = events.filter(col("event_type") === "signup")
      .select("user_id").distinct().count()
    assert(f.length.toLong == signupUsers)
    val expected = events.filter(col("event_type") === "signup")
      .groupBy("user_id").agg(min("ts_us").as("s_us"))
      .join(events.filter(col("event_type") === "purchase")
              .select(col("user_id"), col("ts_us").as("p_us")), Seq("user_id"))
      .filter(col("p_us") >= col("s_us"))
      .select("user_id").distinct().count()
    assert(f.count(_.getBoolean(3)).toLong == expected)
  }

  test("cohortRetention: week-0 diagonal covers every user, cells non-negative") {
    val m = Events.cohortRetention(events).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(m.keys.forall { case (_, w) => w >= 0 },
      "weeks_since can never be negative")
    // every user is active in their own first week, so the week-0 cells
    // sum to the distinct user count
    val users = events.select("user_id").distinct().count()
    assert(m.collect { case ((_, 0L), n) => n }.sum == users)
    // no cell can exceed its cohort's size
    val cohortSize = m.collect { case ((c, 0L), n) => c -> n }.toMap
    m.foreach { case ((c, _), n) => assert(n <= cohortSize(c)) }
  }

  test("session_window agrees with lag-based sessionization") {
    val viaLag = Events.sessionize(events, 30)
      .select(col("user_id"), col("session_start_us"), col("n_events"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val viaNative = Events.sessionWindowCounts(events, 30)
      .select(col("user_id"), col("session_start_us"), col("n_events"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(viaLag == viaNative)
  }

  test("intervalJoin matches the brute-force range join exactly once per pair") {
    import spark.implicits._
    // intervals deliberately: multi-bin spans, sub-bin spans, an empty
    // [x, x) interval, overlapping intervals, and boundary-exact points
    val bin = 1000L
    val iv = Seq(
      (1L, 0L, 2500L),     // spans bins 0-2
      (2L, 2400L, 2600L),  // sub-bin, overlaps interval 1
      (3L, 5000L, 5000L),  // empty: matches nothing
      (4L, 999L, 1001L)    // straddles a bin boundary
    ).toDF("iv_id", "lo", "hi")
    val pts = Seq(0L, 999L, 1000L, 2400L, 2499L, 2500L, 2599L, 5000L)
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("p_id", "t")
    val got = Events.intervalJoin(pts, "t", iv, "lo", "hi", binUs = bin)
      .select("p_id", "iv_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    val brute = for {
      (pid, t) <- Seq(0L, 999L, 1000L, 2400L, 2499L, 2500L, 2599L, 5000L)
        .zipWithIndex.map { case (t, i) => (i.toLong, t) }
      (ivId, lo, hi) <- Seq((1L, 0L, 2500L), (2L, 2400L, 2600L),
        (3L, 5000L, 5000L), (4L, 999L, 1001L))
      if t >= lo && t < hi
    } yield (pid, ivId)
    // sets equal AND no duplicate pairs (each match exactly once)
    assert(got.toSet == brute.toSet && got.length == brute.length)
    // hi is exclusive, lo inclusive: t=2500 missed iv1, t=999/1000 hit iv4
    assert(!got.contains((5L, 1L)) && got.contains((1L, 4L)) && got.contains((2L, 4L)))
  }

  test("intervalJoin on the fixture: purchases within watched sessions") {
    val iv = Events.sessionize(events.filter(col("user_id") % 100 === 7))
      .select(col("user_id").as("watch_user"), col("session_idx"),
        col("session_start_us").as("lo"), (col("session_end_us") + 1).as("hi"))
    val pts = events.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("ts_us"))
    val got = Events.intervalJoin(pts, "ts_us", iv, "lo", "hi")
    val brute = pts.join(iv, col("ts_us") >= col("lo") && col("ts_us") < col("hi"))
    assert(got.count() == brute.count() && got.count() > 0)
    // the composed plan must be an equi-join, not a nested-loop cross
    val plan = got.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"intervalJoin must equi-join on bins:\n${plan.take(600)}")
  }
}
