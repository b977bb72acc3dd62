package graft.operators

import graft.SparkSpec
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

/** File-statistics sidecars on the manifested log: per-file rows and
  * ts bounds captured from parquet footers at write time, file skipping
  * on range reads, and the metadata-only dayStats profile. */
class ManifestedLogStatsSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"
  // an intra-day window: 2024-01-10 06:00 → 12:00 UTC
  private val fromUs = 1704866400000000L
  private val toUs   = 1704888000000000L

  private def freshTable(): String = {
    val p = java.nio.file.Files.createTempDirectory("graft-manifest-stats")
      .toString + "/events_log"
    ManifestedLog.write(Events.load(spark, sfDir), p)
    p
  }

  private def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
    df.select("event_id").collect().map(_.getLong(0)).toSet

  private def fs(p: String) =
    new Path(p).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def statLines(p: String, dir: String): Seq[Array[String]] = {
    val f = fs(p)
    val sp = new Path(new Path(p), s"$dir/_stats.txt")
    assert(f.exists(sp), s"missing sidecar $sp")
    val in = f.open(sp)
    val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
               finally in.close()
    val lines = text.linesIterator.toList
    assert(lines.head == "graft-day-stats-v1")
    lines.tail.filter(l => l.nonEmpty && !l.startsWith("#")).map(_.split('\t'))
  }

  test("write() leaves a sidecar in every day dir with exact rows and ts bounds") {
    val p = freshTable()
    val (_, days) = ManifestedLog.readManifest(spark, p)
    val expected = ManifestedLog.load(spark, p)
      .groupBy(Events.utcDt(col("ts")).as("dt"))
      .agg(count(lit(1)).as("n"), min(col("ts_us")).as("lo"), max(col("ts_us")).as("hi"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    days.foreach { case (day, dir) =>
      val lines = statLines(p, dir)
      // every parquet file of the dir is covered, with parsed bounds
      val names = fs(p).listStatus(new Path(new Path(p), dir))
        .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
        .map(_.getPath.getName).toSet
      assert(lines.map(_(0)).toSet == names)
      val (n, lo, hi) = expected(day)
      assert(lines.map(_(1).toLong).sum == n)
      assert(lines.map(_(2)).forall(_ != "?") && lines.map(_(3)).forall(_ != "?"))
      assert(lines.map(_(2).toLong).min == lo)
      assert(lines.map(_(3).toLong).max == hi)
    }
  }

  test("range read skips non-overlapping files via the sidecar, same rows") {
    val p = freshTable()
    // fragment the day into many ts-tiled files so skipping is observable
    ManifestedLog.compactDay(spark, p, "2024-01-10", targetBytes = 1024L)
    val (_, days) = ManifestedLog.readManifest(spark, p)
    val dayDir = new Path(new Path(p), days("2024-01-10"))
    val total = fs(p).listStatus(dayDir)
      .count(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
    assert(total >= 3, s"fixture too small to fragment: $total files")
    val df = ManifestedLog.loadRange(spark, p, fromUs, toUs)
    val read = df.inputFiles
    assert(read.nonEmpty && read.length < total,
      s"expected file skipping: read ${read.length} of $total")
    assert(read.forall(_.contains(days("2024-01-10"))))
    assert(ids(df) == ids(Events.loadRange(spark, sfDir, fromUs, toUs)))
  }

  test("a day without a sidecar falls back to the whole-directory read") {
    val p = freshTable()
    val (_, days) = ManifestedLog.readManifest(spark, p)
    fs(p).delete(new Path(new Path(p), s"${days("2024-01-10")}/_stats.txt"), false)
    val df = ManifestedLog.loadRange(spark, p, fromUs, toUs)
    assert(ids(df) == ids(Events.loadRange(spark, sfDir, fromUs, toUs)))
  }

  test("a window overlapping no file of the day reads no data files from it") {
    val p = freshTable()
    // 23:59:59.5 → midnight of the last covered day may hold no events;
    // instead probe a sub-second slice far from any fixture timestamp
    // granularity boundary and assert correctness regardless of count
    val df = ManifestedLog.loadRange(spark, p, fromUs, fromUs + 1L)
    assert(ids(df) == ids(Events.loadRange(spark, sfDir, fromUs, fromUs + 1L)))
  }

  test("append rewrites the touched day's sidecar in the new version dir") {
    val p = freshTable()
    val extra = ManifestedLog.load(spark, p)
      .filter(col("ts_us") >= fromUs && col("ts_us") < toUs)
      .limit(5)
      .withColumn("event_id", col("event_id") + 10000000L)
      .drop("ts_us")
    val added = extra.count()
    assert(added > 0)
    ManifestedLog.append(extra, p)
    val (_, days) = ManifestedLog.readManifest(spark, p)
    // append dirs carry a writer-unique token: dt=<day>.v2-<token>
    assert(days("2024-01-10").startsWith("dt=2024-01-10.v2"))
    val lines = statLines(p, days("2024-01-10"))
    val dayCount = ManifestedLog.load(spark, p)
      .filter(Events.utcDt(col("ts")) === "2024-01-10").count()
    assert(lines.map(_(1).toLong).sum == dayCount)
  }

  test("point lookup equals the full-scan filter for present and absent keys") {
    val p = freshTable()
    val full = ManifestedLog.load(spark, p)
    for (user <- Seq(7L, 42L, 101L)) {
      val got = ids(ManifestedLog.loadByKey(spark, p, "user_id", Seq(user)))
      val want = ids(full.filter(col("user_id") === user))
      assert(got == want, s"user $user: $got != $want")
    }
    // multi-value lookup
    val got2 = ids(ManifestedLog.loadByKey(spark, p, "user_id", Seq(7L, 42L)))
    assert(got2 == ids(full.filter(col("user_id").isin(7L, 42L))))
    // absent key: empty, and schema preserved
    val absent = ManifestedLog.loadByKey(spark, p, "user_id", Seq(-987654321L))
    assert(absent.count() == 0L)
    assert(absent.columns.contains("ts_us"))
    // the single-record ops lookup: event_id blooms keep it to the one
    // file that can hold the row
    val oneId = full.select("event_id").limit(1).collect().head.getLong(0)
    val one = ManifestedLog.loadByKey(spark, p, "event_id", Seq(oneId))
    assert(ids(one) == Set(oneId))
    assert(one.inputFiles.length <= 2,
      s"event_id lookup read ${one.inputFiles.length} files")
  }

  test("bloom prune skips files whose day holds a disjoint user population") {
    import spark.implicits._
    // two days, disjoint user ranges: a lookup for a day-1 user must not
    // read day 2's files
    val day1 = 1704844800000000L // 2024-01-10T00:00:00Z
    val day2 = day1 + 86400000000L
    val ev = (0 until 200).map { i =>
      val (dayStart, user) =
        if (i % 2 == 0) (day1, (i % 10).toLong) else (day2, (100 + i % 10).toLong)
      (i.toLong, user, dayStart + i * 1000000L, "view", 1.0, "{}")
    }.toDF("event_id", "user_id", "ts", "event_type", "value", "props")
      .withColumn("ts", timestamp_micros(col("ts")))
    val p = java.nio.file.Files.createTempDirectory("graft-bloom-lookup")
      .toString + "/events_log"
    ManifestedLog.write(ev, p)
    val df = ManifestedLog.loadByKey(spark, p, "user_id", Seq(4L))
    val read = df.inputFiles
    assert(read.nonEmpty && read.forall(_.contains("dt=2024-01-10")),
      s"expected only day-1 files, read: ${read.mkString(", ")}")
    assert(ids(df) == ids(ManifestedLog.load(spark, p)
      .filter(col("user_id") === 4L)))
    // and a day-2 user reads only day-2 files
    val df2 = ManifestedLog.loadByKey(spark, p, "user_id", Seq(105L))
    assert(df2.inputFiles.nonEmpty && df2.inputFiles.forall(_.contains("dt=2024-01-11")))
    // the equality predicate reaches the scan (row-group pruning inside
    // surviving files: min-max, dictionary, or native bloom per regime)
    val scan = df2.queryExecution.executedPlan.toString
      .linesIterator.find(_.contains("PushedFilters")).getOrElse("")
    assert(scan.contains("EqualTo(user_id,105)"),
      s"user_id equality not pushed into the scan: $scan")
  }

  test("key+range lookup composes both pruning layers, same rows as full filter") {
    val p = freshTable()
    val full = ManifestedLog.load(spark, p)
    for (user <- Seq(7L, 42L)) {
      val got = ids(ManifestedLog.loadByKeyRange(
        spark, p, "user_id", Seq(user), fromUs, toUs))
      val want = ids(full.filter(col("user_id") === user &&
        col("ts_us") >= fromUs && col("ts_us") < toUs))
      assert(got == want, s"user $user in range: $got != $want")
    }
    // the day pruning layer is active: only the window's day is read
    val df = ManifestedLog.loadByKeyRange(spark, p, "user_id", Seq(7L), fromUs, toUs)
    assert(df.inputFiles.forall(_.contains("dt=2024-01-10")))
  }

  test("half-open key+range lookups work (one sentinel end, one finite)") {
    // a sentinel extreme must not reach usLocalDateTime (DateTimeException)
    // or the data predicate (multiplyExact overflow) — only the finite
    // side prunes and filters
    val p = freshTable()
    val full = ManifestedLog.load(spark, p)
    val upTo = ids(ManifestedLog.loadByKeyRange(
      spark, p, "user_id", Seq(7L), Long.MinValue, toUs))
    assert(upTo == ids(full.filter(col("user_id") === 7L && col("ts_us") < toUs)))
    val from = ids(ManifestedLog.loadByKeyRange(
      spark, p, "user_id", Seq(7L), fromUs, Long.MaxValue))
    assert(from == ids(full.filter(col("user_id") === 7L && col("ts_us") >= fromUs)))
    // both halves tile the unbounded lookup exactly
    assert((upTo ++ from) == ids(ManifestedLog.loadByKey(spark, p, "user_id", Seq(7L))))
  }

  test("a sidecar without bloom lines still serves lookups (conservative include)") {
    val p = freshTable()
    val (_, days) = ManifestedLog.readManifest(spark, p)
    // strip the #bloom lines of one day (simulating a pre-bloom sidecar)
    val dayDir = new Path(new Path(p), days("2024-01-10"))
    val sp = new Path(dayDir, "_stats.txt")
    val in = fs(p).open(sp)
    val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
               finally in.close()
    val stripped = text.linesIterator.filterNot(_.startsWith("#bloom"))
      .mkString("", "\n", "\n")
    val out = fs(p).create(sp, true)
    try out.write(stripped.getBytes("UTF-8")) finally out.close()
    val got = ids(ManifestedLog.loadByKey(spark, p, "user_id", Seq(42L)))
    assert(got == ids(ManifestedLog.load(spark, p)
      .filter(col("user_id") === 42L)))
  }

  // Native parquet row-group pruning on the point-lookup key has two
  // regimes, and each must hold in its own: a LOW-cardinality chunk is
  // fully dictionary-encoded and parquet-mr deliberately skips the bloom
  // (DictionaryFilter already answers exact membership per row group);
  // once the key outgrows the dictionary page the encoding falls back to
  // PLAIN and the enabled bloom must actually be written.
  private def userIdChunk(p: String, dir: String)
      : (Boolean, Boolean) = { // (fullyDictEncoded, bloomPresent)
    import scala.jdk.CollectionConverters._
    val conf = spark.sparkContext.hadoopConfiguration
    val file = fs(p).listStatus(new Path(new Path(p), dir)).map(_.getPath)
      .filter(_.getName.endsWith(".parquet")).head
    val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(file, conf))
    try {
      val block = reader.getFooter.getBlocks.asScala.head
      val cc = block.getColumns.asScala
        .find(_.getPath.toDotString == "user_id").get
      val dict = !cc.getEncodings.asScala.exists(e =>
        e == org.apache.parquet.column.Encoding.PLAIN)
      (dict, reader.getBloomFilterDataReader(block).readBloomFilter(cc) != null)
    } finally reader.close()
  }

  test("low-cardinality key: fully dictionary-encoded (exact row-group pruning)") {
    val p = freshTable()
    val (_, days) = ManifestedLog.readManifest(spark, p)
    val (dict, _) = userIdChunk(p, days("2024-01-10"))
    assert(dict, "fixture-scale user_id chunk should be dictionary-encoded")
  }

  test("high-cardinality key: native parquet bloom is written") {
    import spark.implicits._
    // 200k unique user ids: the dictionary page (8 B/entry, 1 MiB cap)
    // overflows, encoding falls back to PLAIN, the bloom must appear
    val day = 1704844800000000L
    val ev = spark.range(200000).select(
      col("id").as("event_id"), col("id").as("user_id"),
      timestamp_micros(lit(day) + col("id")).as("ts"),
      lit("view").as("event_type"), lit(1.0).as("value"), lit("{}").as("props"))
    val p = java.nio.file.Files.createTempDirectory("graft-bloom-native")
      .toString + "/events_log"
    ManifestedLog.write(ev, p)
    val (_, days) = ManifestedLog.readManifest(spark, p)
    val (dict, bloom) = userIdChunk(p, days("2024-01-10"))
    assert(!dict, "200k unique ids should overflow the dictionary")
    assert(bloom, "no native parquet bloom for high-cardinality user_id")
  }

  test("dayStats is metadata-exact against the scanned per-day aggregate") {
    val p = freshTable()
    // include a compacted day so stats survive maintenance
    ManifestedLog.compactDay(spark, p, "2024-01-12", targetBytes = 4096L)
    val got = ManifestedLog.dayStats(spark, p)
      .select("dt", "n_rows", "min_ts_us", "max_ts_us")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    val want = ManifestedLog.load(spark, p)
      .groupBy(Events.utcDt(col("ts")).as("dt"))
      .agg(count(lit(1)).as("n"), min(col("ts_us")).as("lo"), max(col("ts_us")).as("hi"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(got.toSeq == want.toSeq)
  }
}
