package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.Row

/** The fixture's `ts` has drifted between parquet encodings across driver
  * regenerations (TIMESTAMP(NANOS)-as-long → native µs TIMESTAMP_NTZ).
  * [[Events.normalizeEventTime]] must produce IDENTICAL (ts_us, ts) for
  * every encoding, so the next drift is caught here instead of as 20
  * broken driver queries. Fabricates the same instants in all three
  * encodings and asserts bit-equal normalization.
  */
class EventTimeEncodingSpec extends SparkSpec {

  // instants with sub-ms digits so a truncation bug can't hide
  private val micros = Seq(1717243800123456L, 1717243800123999L,
                           1700000000000001L, 1731500000999999L)

  private def tmp(name: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-$name").toString + "/events.parquet"

  private lazy val paths: Map[String, String] = {
    val ids = micros.indices.map(_.toLong)
    // 1) legacy: raw BIGINT nanos (what nanosAsLong exposes for TIMESTAMP(NANOS))
    val nanosPath = tmp("ns")
    spark.createDataFrame(
      java.util.Arrays.asList(ids.zip(micros).map { case (i, us) =>
        Row(i, us * 1000L + 789L) }: _*),  // non-zero ns remainder: div must truncate
      StructType(Seq(StructField("event_id", LongType), StructField("ts", LongType))))
      .write.mode("overwrite").parquet(nanosPath)
    // 2) native µs TIMESTAMP (isAdjustedToUTC = true)
    val tzPath = tmp("tz")
    spark.createDataFrame(
      java.util.Arrays.asList(ids.zip(micros).map { case (i, us) =>
        Row(i, java.time.Instant.EPOCH.plus(us, java.time.temporal.ChronoUnit.MICROS)) }: _*),
      StructType(Seq(StructField("event_id", LongType), StructField("ts", TimestampType))))
      .write.mode("overwrite").parquet(tzPath)
    // 3) native µs TIMESTAMP_NTZ (isAdjustedToUTC = false) — the current fixture
    val ntzPath = tmp("ntz")
    spark.createDataFrame(
      java.util.Arrays.asList(ids.zip(micros).map { case (i, us) =>
        Row(i, java.time.LocalDateTime.ofEpochSecond(
          us / 1000000L, (us % 1000000L).toInt * 1000, java.time.ZoneOffset.UTC)) }: _*),
      StructType(Seq(StructField("event_id", LongType), StructField("ts", TimestampNTZType))))
      .write.mode("overwrite").parquet(ntzPath)
    Map("nanos-as-long" -> nanosPath, "timestamp-us" -> tzPath, "timestamp-ntz" -> ntzPath)
  }

  private def normalized(path: String): Seq[(Long, Long, Long)] = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    Events.normalizeEventTime(spark.read.parquet(path))
      .select(col("event_id"), col("ts_us"), unix_micros(col("ts")))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1).toSeq
  }

  test("all three ts encodings normalize to identical (ts_us, ts)") {
    val expect = micros.indices.map(i => (i.toLong, micros(i), micros(i)))
    paths.foreach { case (enc, path) =>
      assert(normalized(path) == expect, s"encoding: $enc")
    }
  }

  test("normalized ts is TimestampType for every encoding") {
    paths.foreach { case (enc, path) =>
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val df = Events.normalizeEventTime(spark.read.parquet(path))
      assert(df.schema("ts").dataType == TimestampType, s"encoding: $enc")
      assert(df.schema("ts_us").dataType == LongType, s"encoding: $enc")
    }
  }

  test("an unsupported ts type fails with a named error, not a plan error") {
    val df = spark.range(1).select(col("id").cast(StringType).as("ts"))
    val e = intercept[RuntimeException](Events.normalizeEventTime(df))
    assert(e.getMessage.contains("events.ts has unsupported type"))
  }

  test("normalizeEventTimeIfPossible passes ts-less frames through unchanged") {
    val df = spark.range(3).toDF("x")
    assert(Events.normalizeEventTimeIfPossible(df) eq df)
  }
}
