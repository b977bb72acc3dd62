package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.Events

/** Event-time queries (X4). The DuckDB oracle sees the fixture as a µs
  * TIMESTAMP (native for the current µs/NTZ encoding; coerced by ns→µs
  * truncation for the legacy nanos one) — the identical view
  * Events.normalizeEventTime produces — so window starts and session
  * bounds compare as exact integers under either encoding. */
object EventQueries extends QueryPack {

  /** Day-partitioned layouts built this JVM, keyed by materialized path
    * (which embeds the fixture dir, so sf0.01 verify and sf0.1 bench
    * never read each other's tree). Per-JVM, not per-existence: a fresh
    * process always rebuilds, so a stale warehouse from an earlier round
    * can't serve wrong rows. */
  private val builtLayouts = scala.collection.mutable.HashSet.empty[String]

  private def deleteDir(s: SparkSession, path: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
  }

  private def dayLayout(s: SparkSession, sfDir: String): String = synchronized {
    val path = new org.apache.hadoop.fs.Path(
      s.conf.get("spark.sql.warehouse.dir"),
      "graft_events_day_" + sfDir.replaceAll("[^A-Za-z0-9.]", "_")).toString
    if (!builtLayouts.contains(path)) {
      Events.writeDayPartitioned(Events.load(s, sfDir), path)
      builtLayouts += path
    }
    path
  }

  /** Two-version incremental table for the change-feed query: version 1
    * is the corpus minus every third event, version 2 appends the rest —
    * so `changesBetween(1, 2)` has a closed-form oracle (the appended
    * slice). NOT vacuumed: the feed needs both versions retained. */
  private[queries] def manifestIncrLayout(s: SparkSession, sfDir: String): String = synchronized {
    import org.apache.spark.sql.functions.col
    val path = new org.apache.hadoop.fs.Path(
      s.conf.get("spark.sql.warehouse.dir"),
      "graft_events_manifest_incr_" + sfDir.replaceAll("[^A-Za-z0-9.]", "_")).toString
    if (!builtLayouts.contains(path)) {
      // fresh-process rule, enforced for manifest tables too: appending
      // onto a previous JVM's table would silently extend its version
      // chain (stale state under a changed fixture — the r9 drift class)
      deleteDir(s, path)
      val ev = Events.load(s, sfDir).drop("ts_us")
      graft.operators.ManifestedLog.append(ev.filter(col("event_id") % 3 =!= 1), path)
      graft.operators.ManifestedLog.append(ev.filter(col("event_id") % 3 === 1), path)
      builtLayouts += path
    }
    path
  }

  /** Manifested twin of [[dayLayout]]: built once per JVM per fixture,
    * then one day compacted and vacuumed so the read path runs against
    * a post-maintenance table (the steady state of a real log). */
  private[queries] def manifestLayout(s: SparkSession, sfDir: String): String = synchronized {
    val path = new org.apache.hadoop.fs.Path(
      s.conf.get("spark.sql.warehouse.dir"),
      "graft_events_manifest_" + sfDir.replaceAll("[^A-Za-z0-9.]", "_")).toString
    if (!builtLayouts.contains(path)) {
      deleteDir(s, path) // fresh-process rule (see manifestIncrLayout)
      graft.operators.ManifestedLog.write(Events.load(s, sfDir), path)
      graft.operators.ManifestedLog.compactDay(s, path, "2024-01-10")
      // 2024-01-15 compacts into ~256 KB ts-range-tiled files so the
      // sub-day range read (x71) has sidecar file skipping to exercise
      // at every fixture scale
      graft.operators.ManifestedLog.compactDay(s, path, "2024-01-15",
        targetBytes = 256L << 10)
      graft.operators.ManifestedLog.vacuum(s, path)
      builtLayouts += path
    }
    path
  }

  /** Mutable maintenance twin of [[manifestLayout]] for the NL
    * maintenance routes (nl95/nl96): compaction and vacuum MUTATE the
    * table (they advance its manifest chain), so they get their own
    * per-JVM copy instead of disturbing the shared read-only layout.
    * Both verbs preserve content, so the full-corpus oracle applies in
    * either execution order, and both are idempotent across bench
    * repetitions. */
  private[queries] def manifestMaintLayout(s: SparkSession, sfDir: String): String = synchronized {
    val path = new org.apache.hadoop.fs.Path(
      s.conf.get("spark.sql.warehouse.dir"),
      "graft_events_manifest_maint_" + sfDir.replaceAll("[^A-Za-z0-9.]", "_")).toString
    if (!builtLayouts.contains(path)) {
      deleteDir(s, path) // fresh-process rule (see manifestIncrLayout)
      graft.operators.ManifestedLog.write(Events.load(s, sfDir), path)
      builtLayouts += path
    }
    path
  }

  /** Mutable layout for the PHYSICAL-DELETE routes (x81/nl101): the
    * delete changes table content, so it gets its own copy. Both routes
    * erase the same key, so the delete is idempotent across reps and
    * execution order (the first call rewrites the may-match days; later
    * calls find no Bloom hit and no-op), and one corpus-minus-key
    * oracle certifies both. */
  private[queries] def manifestDeleteLayout(s: SparkSession, sfDir: String): String = synchronized {
    val path = new org.apache.hadoop.fs.Path(
      s.conf.get("spark.sql.warehouse.dir"),
      "graft_events_manifest_del_" + sfDir.replaceAll("[^A-Za-z0-9.]", "_")).toString
    if (!builtLayouts.contains(path)) {
      deleteDir(s, path) // fresh-process rule (see manifestIncrLayout)
      graft.operators.ManifestedLog.write(Events.load(s, sfDir), path)
      builtLayouts += path
    }
    path
  }

  /** Snapshot table bootstrapped at log version 1 once per JVM per
    * fixture (stale on-disk state from an earlier round is deleted —
    * the same fresh-process rule as the layouts above); the query then
    * advances it incrementally. */
  private def snapshotLayout(s: SparkSession, sfDir: String,
                             logPath: String): String = synchronized {
    val path = new org.apache.hadoop.fs.Path(
      s.conf.get("spark.sql.warehouse.dir"),
      "graft_events_snapshot_" + sfDir.replaceAll("[^A-Za-z0-9.]", "_")).toString
    if (!builtLayouts.contains(path)) {
      val p = new org.apache.hadoop.fs.Path(path)
      p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
      graft.operators.SnapshotTable.update(s, logPath, path, toVersion = Some(1L))
      builtLayouts += path
    }
    path
  }

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x14_event_tumbling" -> ((s: SparkSession, d: String) =>
      Events.tumblingCounts(Events.load(s, d))),

    "x15_event_sessionize" -> ((s: SparkSession, d: String) =>
      Events.sessionize(Events.load(s, d))),

    "x28_event_sliding" -> ((s: SparkSession, d: String) =>
      Events.slidingCounts(Events.load(s, d))),

    "x16_event_session_window" -> ((s: SparkSession, d: String) =>
      Events.sessionWindowCounts(Events.load(s, d))),

    // As-of semantics composed from window functions (SURVEY.md §2.2
    // preference order (a)): each event joined to the user's most recent
    // signup at-or-before it — no custom strategy needed, one shuffle on
    // user_id.
    "x21_event_asof_signup" -> ((s: SparkSession, d: String) => {
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.functions._
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_us"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Events.load(s, d).select(
        col("event_id"), col("user_id"), col("ts_us"),
        last(when(col("event_type") === "signup", col("ts_us")),
             ignoreNulls = true).over(w).as("last_signup_us"))
    }),

    // CDC snapshot compaction: collapse the event log to one
    // latest-wins row per user (map-side-partial max_by, no window sort).
    "x46_latest_snapshot" -> ((s: SparkSession, d: String) =>
      Events.latestSnapshot(Events.load(s, d))),

    // x46's full CDC semantics: the log is upserts + tombstones
    // ('error' = delete marker); a key whose LATEST row is a tombstone
    // is absent from the snapshot. Incremental merge ≡ full re-apply is
    // proved in CdcSpec.
    "x64_cdc_apply" -> ((s: SparkSession, d: String) =>
      graft.operators.Cdc.applyChangelog(Events.load(s, d))),

    // Mergeable HLL sketches: per-type distinct users, estimated from a
    // binary sketch column; per-(type,day) partial sketches re-merged per
    // type must be register-identical to the direct sketch (the property
    // that lets a pipeline pre-aggregate sketches per ingest partition).
    // q12-style error-bound oracle: exact count + TRUE flags.
    "x49_hll_distinct" -> ((s: SparkSession, d: String) => {
      import org.apache.spark.sql.functions._
      import graft.operators.Cardinality
      val ev = Events.load(s, d)
      val direct = Cardinality.sketchBy(ev, "event_type", "user_id")
      // composite key joined on \u0001 — a character no event_type can
      // plausibly contain (unlike '|'), so the split-back is collision-free
      val daily = Cardinality.sketchBy(
        ev.withColumn("g", concat_ws("\u0001", col("event_type"),
          date_format(col("ts"), "yyyy-MM-dd"))), "g", "user_id")
      val merged = Cardinality.mergeSketches(
          daily.withColumn("event_type", split(col("g"), "\u0001").getItem(0)),
          "event_type")
        .withColumnRenamed("sketch", "merged_sketch")
      val exact = Events.load(s, d).groupBy(col("event_type"))
        .agg(countDistinct(col("user_id")).as("n_users"))
      exact.join(direct, "event_type").join(merged, "event_type")
        .select(col("event_type"), col("n_users"),
          (abs(Cardinality.estimate(col("sketch")) - col("n_users"))
            <= col("n_users") * 0.05).as("hll_within_5pct"),
          (col("sketch") === col("merged_sketch")).as("merged_equals_direct"))
    }),

    // Conversion funnel: first signup → first purchase at-or-after it.
    "x57_event_funnel" -> ((s: SparkSession, d: String) =>
      Events.funnel(Events.load(s, d))),

    // Retention matrix keyed on integer epoch-weeks.
    "x58_cohort_retention" -> ((s: SparkSession, d: String) =>
      Events.cohortRetention(Events.load(s, d))),

    // Event-time range scan: the [from, to) predicate is applied in the
    // raw ts column's native type, so it reaches the parquet scan as a
    // pushed min-max-prunable filter (at 100 TB: scan a day, not the
    // log). Pruning pinned in EventScanPruningSpec.
    "x65_event_range_scan" -> ((s: SparkSession, d: String) =>
      Events.loadRange(s, d,
          fromUs = 1704844800000000L,  // 2024-01-10T00:00:00Z
          toUs   = 1705708800000000L)  // 2024-01-20T00:00:00Z
        .select("event_id", "user_id", "ts_us", "event_type", "value")),

    // Day-partitioned log layout: write dt=yyyy-MM-dd directories, read
    // the same range back with PartitionFilters directory pruning plus
    // in-day row-group pruning (EventPartitionedLayoutSpec pins both).
    // Same rows as x65, so it shares the oracle modulo the layout.
    // Write-once/read-many: the layout builds once per JVM per fixture
    // (the production shape — a log is laid out once, range-read
    // forever), so Bench's warm rep pays the write and the timed reps
    // measure the READ path, which is the number that matters at 100 TB.
    "x66_event_partitioned_range" -> ((s: SparkSession, d: String) =>
      Events.loadRangePartitioned(s, dayLayout(s, d),
          fromUs = 1704844800000000L,  // 2024-01-10T00:00:00Z
          toUs   = 1705708800000000L)  // 2024-01-20T00:00:00Z
        .select("event_id", "user_id", "ts_us", "event_type", "value")),

    // Manifest-backed log (immutable versioned day dirs + atomic
    // manifest pointer — the table-format layout whose compaction never
    // disturbs readers, ManifestedLogSpec): same range, day pruning
    // against the manifest, then the pushed ts predicate. The table
    // builds once per JVM and is compacted+vacuumed before reading, so
    // the timed path exercises the post-compaction read.
    "x67_event_manifest_range" -> ((s: SparkSession, d: String) =>
      graft.operators.ManifestedLog.loadRange(s, manifestLayout(s, d),
          fromUs = 1704844800000000L,  // 2024-01-10T00:00:00Z
          toUs   = 1705708800000000L)  // 2024-01-20T00:00:00Z
        .select("event_id", "user_id", "ts_us", "event_type", "value")),

    // Sub-day range over the manifested log: manifest day pruning cuts
    // the read to one day, then the day's `_stats.txt` sidecar (per-file
    // ts bounds captured from parquet footers at write time) skips the
    // day's non-overlapping files WITHOUT listing the directory or
    // opening their footers — at 100 TB the planning cost of a range
    // read becomes O(days-in-range) sidecar reads, not O(files) footer
    // round-trips. ManifestedLogStatsSpec pins the skipped-file set.
    "x71_manifest_file_skip" -> ((s: SparkSession, d: String) =>
      graft.operators.ManifestedLog.loadRange(s, manifestLayout(s, d),
          fromUs = 1705298400000000L,  // 2024-01-15T06:00:00Z
          toUs   = 1705320000000000L)  // 2024-01-15T12:00:00Z
        .select("event_id", "user_id", "ts_us", "event_type", "value")),

    // Incrementally-maintained CDC snapshot: bootstrap compacts log
    // version 1, then every call folds only the CHANGE FEED into the
    // stored state (one keyed merge over state ∪ delta) and publishes a
    // new immutable version with an atomic commit marker — maintenance
    // cost proportional to the delta, never the log. The oracle
    // recomputes the snapshot from the full event table, so the hash
    // match proves incremental ≡ recompute (CdcSpec's associativity,
    // now end-to-end through the on-disk table).
    "x76_incremental_snapshot" -> ((s: SparkSession, d: String) => {
      val log = manifestIncrLayout(s, d)
      val snap = snapshotLayout(s, d, log)
      graft.operators.SnapshotTable.update(s, log, snap) // delta-only (no-op when current)
      graft.operators.SnapshotTable.readView(s, snap)
        .select("user_id", "event_id", "ts_us", "event_type", "value")
    }),

    // Point lookup into the CURRENT CDC state: "what is user 42's live
    // row NOW". The snapshot's state files get the same sidecar
    // treatment at publish (key Bloom + key bounds), so the lookup
    // reads only the state files that can hold the key instead of the
    // whole materialized view — composing x76's incremental maintenance
    // with x75's pruned-read discipline. The oracle recomputes the
    // CDC view from the full event table and filters, so the hash match
    // proves pruned-incremental == full-recompute-filtered.
    "x78_snapshot_point_lookup" -> ((s: SparkSession, d: String) => {
      val log = manifestIncrLayout(s, d)
      val snap = snapshotLayout(s, d, log)
      graft.operators.SnapshotTable.update(s, log, snap) // no-op when current
      graft.operators.SnapshotTable.readViewByKey(s, snap, Seq(42L))
        .select("user_id", "event_id", "ts_us", "event_type", "value")
    }),

    // Point lookup on the UNCLUSTERED key: files tile on ts, so "all
    // events of user 42" would read every file of every day; the
    // per-file Bloom filters in the stats sidecars shrink the read set
    // to the files that can match (no false negatives — result equals
    // the full-scan filter exactly, which is what the oracle runs).
    "x75_manifest_point_lookup" -> ((s: SparkSession, d: String) =>
      graft.operators.ManifestedLog.loadByKey(
          s, manifestLayout(s, d), "user_id", Seq(42L))
        .select("event_id", "user_id", "ts_us", "event_type", "value")),

    // Physical compliance erasure ("forget user 42"): sidecar Blooms
    // bound the rewrite to the may-match days (copy-on-write v<n+1>
    // dirs, one atomic flip); the post-delete read must equal the
    // corpus minus the key. Idempotent: once deleted, the fresh
    // sidecars have no Bloom hit and later calls no-op.
    "x81_delete_by_key" -> ((s: SparkSession, d: String) => {
      val p = manifestDeleteLayout(s, d)
      graft.operators.ManifestedLog.deleteByKey(s, p, "user_id", Seq(42L))
      graft.operators.ManifestedLog.load(s, p)
        .select("event_id", "user_id", "ts_us", "event_type", "value")
    }),

    // Key + time-range lookup — "user 42 that week", the realistic
    // point query: all three metadata layers compose (manifest day
    // pruning on the range, per-file sidecar ts-bounds AND key-Bloom —
    // a file survives only if it can match BOTH — then the pushed
    // conjunction prunes row groups in the survivors).
    "x79_manifest_key_range" -> ((s: SparkSession, d: String) =>
      graft.operators.ManifestedLog.loadByKeyRange(
          s, manifestLayout(s, d), "user_id", Seq(42L),
          fromUs = 1704844800000000L,  // 2024-01-10T00:00:00Z
          toUs   = 1705708800000000L)  // 2024-01-20T00:00:00Z
        .select("event_id", "user_id", "ts_us", "event_type", "value")),

    // Metadata-only per-day profile of the manifested log: row counts
    // and ts bounds come from the manifest + sidecars (exact footer
    // counts, exact normalized-µs bounds) — zero data bytes read. The
    // oracle computes the same profile by scanning the events table, so
    // the hash check proves metadata == data.
    "x72_log_day_stats" -> ((s: SparkSession, d: String) =>
      graft.operators.ManifestedLog.dayStats(s, manifestLayout(s, d))
        .select("dt", "n_rows", "min_ts_us", "max_ts_us")),

    // Change feed over the manifested table: only the rows ADDED between
    // two retained versions, diffed day-wise against the manifests —
    // unchanged days are skipped without a read. Incremental consumption
    // is what lets a downstream pipeline keep up with a growing log
    // without rescanning it.
    "x69_manifest_changes" -> ((s: SparkSession, d: String) =>
      graft.operators.ManifestedLog.changesBetween(
          s, manifestIncrLayout(s, d), 1L, 2L)
        .select("event_id", "user_id", "ts_us", "event_type", "value")),

    // Generic keyless interval join: purchases landing inside ANY
    // session of a watched user cohort — the range-join shape Spark
    // would otherwise nested-loop. Bin-bucketed equi-join, candidates
    // bounded by points + interval bin covers.
    "x70_interval_join" -> ((s: SparkSession, d: String) => {
      import org.apache.spark.sql.functions.col
      val ev = Events.load(s, d)
      val iv = Events.sessionize(ev.filter(col("user_id") % 100 === 7))
        .select(col("user_id").as("watch_user"), col("session_idx"),
          col("session_start_us").as("lo"),
          (col("session_end_us") + 1).as("hi"))
      val pts = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("ts_us"))
      Events.intervalJoin(pts, "ts_us", iv, "lo", "hi")
        .select(col("event_id"), col("watch_user"), col("session_idx"))
    }),

    // JSON column surface: extract props.k and aggregate per event type.
    "x22_event_props_json" -> ((s: SparkSession, d: String) => {
      import org.apache.spark.sql.functions._
      Events.load(s, d)
        .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_events"),
             sum(col("k")).as("sum_k"),
             round(avg(col("k")), 4).as("avg_k"))
    }))

  override val oracleSql: Map[String, String] = Map(
    "x14_event_tumbling" ->
      """SELECT epoch_ms(date_trunc('hour', ts)) AS window_start_ms,
        |  event_type, count(*) AS n_events,
        |  round(sum(value), 2) AS total_value
        |FROM events GROUP BY 1, 2""".stripMargin,

    // Each event lands in width/slide = 4 epoch-aligned windows:
    // start = (floor(t/slide) - k)*slide, k = 0..3 — the same window set
    // Spark's window(ts, '1 hour', '15 minutes') generates.
    "x28_event_sliding" ->
      """WITH e AS (SELECT epoch_us(ts) AS t, event_type, value FROM events),
        |w AS (SELECT ((t // 900000000) - k) * 900000000 AS ws, event_type, value
        |      FROM e, unnest(range(4)) AS kk(k))
        |SELECT ws // 1000 AS window_start_ms, event_type,
        |  count(*) AS n_events, round(sum(value), 2) AS total_value
        |FROM w GROUP BY 1, 2""".stripMargin,

    "x15_event_sessionize" ->
      """WITH flagged AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS ts_us, value,
        |    CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
        |           OR epoch_us(ts) - lag(epoch_us(ts)) OVER w >= 30*60*1000000
        |         THEN 1 ELSE 0 END AS new_session
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)),
        |sessions AS (
        |  SELECT *, sum(new_session) OVER (PARTITION BY user_id
        |    ORDER BY ts_us, event_id ROWS UNBOUNDED PRECEDING)::BIGINT AS session_idx
        |  FROM flagged)
        |SELECT user_id, session_idx,
        |  min(ts_us) AS session_start_us, max(ts_us) AS session_end_us,
        |  count(*) AS n_events, round(sum(value), 2) AS total_value
        |FROM sessions GROUP BY user_id, session_idx""".stripMargin,

    "x16_event_session_window" ->
      """WITH flagged AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS ts_us,
        |    CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
        |           OR epoch_us(ts) - lag(epoch_us(ts)) OVER w >= 30*60*1000000
        |         THEN 1 ELSE 0 END AS new_session
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)),
        |sessions AS (
        |  SELECT *, sum(new_session) OVER (PARTITION BY user_id
        |    ORDER BY ts_us, event_id ROWS UNBOUNDED PRECEDING)::BIGINT AS session_idx
        |  FROM flagged)
        |SELECT user_id,
        |  min(ts_us) AS session_start_us,
        |  max(ts_us) + 30*60*1000000 AS session_end_us,
        |  count(*) AS n_events
        |FROM sessions GROUP BY user_id, session_idx""".stripMargin,

    "x21_event_asof_signup" ->
      """SELECT event_id, user_id, epoch_us(ts) AS ts_us,
        |  last_value(CASE WHEN event_type = 'signup' THEN epoch_us(ts) END IGNORE NULLS)
        |    OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
        |          ROWS UNBOUNDED PRECEDING) AS last_signup_us
        |FROM events""".stripMargin,

    "x58_cohort_retention" ->
      """WITH fs AS (
        |  SELECT user_id, min(epoch_us(ts)) AS first_us
        |  FROM events GROUP BY user_id),
        |a AS (
        |  SELECT DISTINCT e.user_id,
        |    fs.first_us // 604800000000 AS cohort_week,
        |    (epoch_us(e.ts) - fs.first_us) // 604800000000 AS weeks_since
        |  FROM events e JOIN fs USING (user_id))
        |SELECT cohort_week, weeks_since, count(*) AS n_users
        |FROM a GROUP BY 1, 2""".stripMargin,

    "x57_event_funnel" ->
      """WITH f AS (
        |  SELECT user_id,
        |    min(CASE WHEN event_type = 'signup' THEN epoch_us(ts) END)
        |      AS first_from_us
        |  FROM events GROUP BY user_id),
        |fx AS (SELECT user_id, first_from_us FROM f
        |       WHERE first_from_us IS NOT NULL),
        |c AS (
        |  SELECT e.user_id, min(epoch_us(e.ts)) AS first_to_us
        |  FROM events e JOIN fx USING (user_id)
        |  WHERE e.event_type = 'purchase'
        |    AND epoch_us(e.ts) >= fx.first_from_us
        |  GROUP BY e.user_id)
        |SELECT fx.user_id, fx.first_from_us, c.first_to_us,
        |  c.first_to_us IS NOT NULL AS converted
        |FROM fx LEFT JOIN c USING (user_id)""".stripMargin,

    "x49_hll_distinct" ->
      """SELECT event_type, count(DISTINCT user_id) AS n_users,
        |  TRUE AS hll_within_5pct, TRUE AS merged_equals_direct
        |FROM events GROUP BY event_type""".stripMargin,

    "x46_latest_snapshot" ->
      """SELECT user_id, event_id, ts_us, event_type, value FROM (
        |  SELECT user_id, event_id, epoch_us(ts) AS ts_us, event_type, value,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
        |  FROM events) WHERE rn = 1""".stripMargin,

    "x64_cdc_apply" ->
      """SELECT user_id, event_id, ts_us, event_type, value FROM (
        |  SELECT user_id, event_id, epoch_us(ts) AS ts_us, event_type, value,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
        |  FROM events) WHERE rn = 1 AND event_type <> 'error'""".stripMargin,

    "x65_event_range_scan" ->
      """SELECT event_id, user_id, epoch_us(ts) AS ts_us, event_type, value
        |FROM events
        |WHERE ts >= TIMESTAMP '2024-01-10 00:00:00'
        |  AND ts <  TIMESTAMP '2024-01-20 00:00:00'""".stripMargin,

    "x66_event_partitioned_range" ->
      """SELECT event_id, user_id, epoch_us(ts) AS ts_us, event_type, value
        |FROM events
        |WHERE ts >= TIMESTAMP '2024-01-10 00:00:00'
        |  AND ts <  TIMESTAMP '2024-01-20 00:00:00'""".stripMargin,

    "x67_event_manifest_range" ->
      """SELECT event_id, user_id, epoch_us(ts) AS ts_us, event_type, value
        |FROM events
        |WHERE ts >= TIMESTAMP '2024-01-10 00:00:00'
        |  AND ts <  TIMESTAMP '2024-01-20 00:00:00'""".stripMargin,

    "x69_manifest_changes" ->
      """SELECT event_id, user_id, epoch_us(ts) AS ts_us, event_type, value
        |FROM events
        |WHERE event_id % 3 = 1""".stripMargin,

    "x71_manifest_file_skip" ->
      """SELECT event_id, user_id, epoch_us(ts) AS ts_us, event_type, value
        |FROM events
        |WHERE ts >= TIMESTAMP '2024-01-15 06:00:00'
        |  AND ts <  TIMESTAMP '2024-01-15 12:00:00'""".stripMargin,

    "x75_manifest_point_lookup" ->
      """SELECT event_id, user_id, epoch_us(ts) AS ts_us, event_type, value
        |FROM events WHERE user_id = 42""".stripMargin,

    "x79_manifest_key_range" ->
      """SELECT event_id, user_id, epoch_us(ts) AS ts_us, event_type, value
        |FROM events WHERE user_id = 42
        |  AND ts >= TIMESTAMP '2024-01-10 00:00:00'
        |  AND ts <  TIMESTAMP '2024-01-20 00:00:00'""".stripMargin,

    "x81_delete_by_key" ->
      """SELECT event_id, user_id, epoch_us(ts) AS ts_us, event_type, value
        |FROM events WHERE user_id <> 42""".stripMargin,

    "x76_incremental_snapshot" ->
      """SELECT user_id, event_id, ts_us, event_type, value FROM (
        |  SELECT user_id, event_id, epoch_us(ts) AS ts_us, event_type, value,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
        |  FROM events) WHERE rn = 1 AND event_type <> 'error'""".stripMargin,

    "x78_snapshot_point_lookup" ->
      """SELECT user_id, event_id, ts_us, event_type, value FROM (
        |  SELECT user_id, event_id, epoch_us(ts) AS ts_us, event_type, value,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
        |  FROM events) WHERE rn = 1 AND event_type <> 'error'
        |  AND user_id = 42""".stripMargin,

    "x72_log_day_stats" ->
      """SELECT strftime(ts, '%Y-%m-%d') AS dt, count(*) AS n_rows,
        |  min(epoch_us(ts)) AS min_ts_us, max(epoch_us(ts)) AS max_ts_us
        |FROM events GROUP BY 1""".stripMargin,

    "x70_interval_join" ->
      """WITH flagged AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS ts_us,
        |    CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
        |           OR epoch_us(ts) - lag(epoch_us(ts)) OVER w >= 30*60*1000000
        |         THEN 1 ELSE 0 END AS new_session
        |  FROM events WHERE user_id % 100 = 7
        |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)),
        |sessions AS (
        |  SELECT *, sum(new_session) OVER (PARTITION BY user_id
        |    ORDER BY ts_us, event_id ROWS UNBOUNDED PRECEDING)::BIGINT AS session_idx
        |  FROM flagged),
        |iv AS (
        |  SELECT user_id AS watch_user, session_idx,
        |    min(ts_us) AS lo, max(ts_us) + 1 AS hi
        |  FROM sessions GROUP BY user_id, session_idx)
        |SELECT e.event_id, iv.watch_user, iv.session_idx
        |FROM (SELECT event_id, epoch_us(ts) AS ts_us FROM events
        |      WHERE event_type = 'purchase') e
        |JOIN iv ON e.ts_us >= iv.lo AND e.ts_us < iv.hi""".stripMargin,

    "x22_event_props_json" ->
      """SELECT event_type, count(*) AS n_events,
        |  sum(json_extract(props, '$.k')::BIGINT)::BIGINT AS sum_k,
        |  round(avg(json_extract(props, '$.k')::BIGINT), 4) AS avg_k
        |FROM events GROUP BY event_type""".stripMargin)
}
