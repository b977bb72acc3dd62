package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.StreamingQuery

import graft.SparkSpec

class DocumentStreamsSpec extends SparkSpec {

  import spark.implicits._

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 00:$minute%02d:00")

  private def stopQuietly(q: StreamingQuery): Unit =
    try q.stop() catch { case _: Exception => () }

  private val richText =
    "the quick brown fox jumps over the lazy dog and it was a fine day in the town of springfield that morning"

  test("streaming clean+dedup: quality filter drops junk, dedup keeps one copy") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String, Timestamp)]
    val docs = input.toDF().toDF("doc_id", "text", "ingest_ts")
    val q = DocumentStreams.cleanAndDedup(docs, minQuality = 0.3)
      .select("doc_id", "fingerprint", "quality")
      .writeStream.format("memory").queryName("clean_docs").outputMode("append").start()
    try {
      input.addData(
        (1L, richText, ts(0)),
        (2L, richText, ts(1)),       // exact dup of 1 within watermark
        (3L, "!!", ts(1)),           // junk: fails quality
        (4L, richText + " extended with more words entirely", ts(2)))
      q.processAllAvailable()
      val rows = spark.table("clean_docs").collect()
      val kept = rows.map(_.getLong(0)).toSet
      assert(!kept.contains(3L), "low-quality doc must be filtered")
      // exactly one of the two identical docs survives
      assert(kept.intersect(Set(1L, 2L)).size == 1, s"kept=$kept")
      assert(kept.contains(4L))
    } finally stopQuietly(q)
  }

  test("normalized dedup collapses case/whitespace variants md5 would miss") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String, Timestamp)]
    val docs = input.toDF().toDF("doc_id", "text", "ingest_ts")
    val q = DocumentStreams.dedupNormalized(docs)
      .writeStream.format("memory").queryName("norm_dedup").outputMode("append").start()
    try {
      input.addData(
        (1L, "The Quick   Brown FOX", ts(0)),
        (2L, "the quick brown fox", ts(1)),     // same after normalization
        (3L, "a different document entirely", ts(1)))
      q.processAllAvailable()
      val kept = spark.table("norm_dedup").collect().map(_.getLong(0)).toSet
      assert(kept.intersect(Set(1L, 2L)).size == 1, s"kept=$kept")
      assert(kept.contains(3L))
    } finally stopQuietly(q)
  }

  test("normalized dedup keeps distinct documents that SimHash-collide") {
    // SimHash is a bag-of-tokens bit vote — word order never changes it —
    // so these two genuinely different documents collide at Hamming
    // distance 0. Using SimHash as the exact dedup key silently dropped
    // one of them (the round-2 ADVICE medium finding); the exact
    // normalized-token fingerprint must keep both.
    val docA = "alpha beta gamma delta epsilon zeta"
    val docB = "zeta epsilon delta gamma beta alpha"
    val fps = Seq(docA, docB).toDF("text")
      .select(graft.functions.SimHashFunctions.simhash64($"text"))
      .collect().map(_.getLong(0))
    assert(fps(0) == fps(1), "precondition: the pair must SimHash-collide")

    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String, Timestamp)]
    val docs = input.toDF().toDF("doc_id", "text", "ingest_ts")
    val q = DocumentStreams.dedupNormalized(docs)
      .writeStream.format("memory").queryName("collide_dedup").outputMode("append").start()
    try {
      input.addData((1L, docA, ts(0)), (2L, docB, ts(1)))
      q.processAllAvailable()
      val kept = spark.table("collide_dedup").collect().map(_.getLong(0)).toSet
      assert(kept == Set(1L, 2L), s"distinct documents must both survive, kept=$kept")
    } finally stopQuietly(q)
  }

  test("file source → parquet sink: checkpointed restart is exactly-once") {
    // the production ingest shape: json files arrive in a directory,
    // the cleaned stream lands in parquet with a checkpoint. Stop the
    // query, restart from the SAME checkpoint with the old files still
    // present, add a new file — already-committed files must not
    // reprocess, and every surviving doc lands exactly once.
    val src = java.nio.file.Files.createTempDirectory("graft-src").toString
    val out = java.nio.file.Files.createTempDirectory("graft-sink").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    val ddl = "doc_id long, text string, source string, ingest_ts timestamp"

    def writeChunk(name: String, ids: Range): Unit = {
      val lines = ids.map(i =>
        s"""{"doc_id":$i,"text":"$richText unique token nr$i","source":"s${i % 3}",""" +
        s""""ingest_ts":"2024-01-01 00:${10 + i % 40}:00"}""")
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$src/$name.json"),
        String.join("\n", lines: _*).getBytes)
    }
    def start() =
      DocumentStreams.cleanAndDedup(
          spark.readStream.schema(ddl).json(src), minQuality = 0.0)
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .outputMode("append").start()

    writeChunk("a", 1 to 10)
    writeChunk("b", 11 to 20)
    val q1 = start()
    try q1.processAllAvailable() finally stopQuietly(q1)

    writeChunk("c", 21 to 30)
    val q2 = start() // same checkpoint; files a/b still in the directory
    try q2.processAllAvailable() finally stopQuietly(q2)

    val landed = spark.read.parquet(out).select("doc_id")
      .collect().map(_.getLong(0)).sorted
    assert(landed.length == landed.distinct.length,
      s"sink duplicated rows: ${landed.length} vs ${landed.distinct.length}")
    assert(landed.toSet == (1 to 30).map(_.toLong).toSet,
      s"expected all 30 unique docs, got ${landed.length}")
  }

  test("token throughput aggregates per window and source") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String, String, Timestamp)]
    val docs = input.toDF().toDF("doc_id", "text", "source", "ingest_ts")
    val q = DocumentStreams.tokenThroughput(docs, width = "1 minute")
      .writeStream.format("memory").queryName("throughput").outputMode("complete").start()
    try {
      input.addData(
        (1L, "one two three", "s1", ts(0)),
        (2L, "four five", "s1", ts(0)),
        (3L, "six", "s2", ts(1)))
      q.processAllAvailable()
      val rows = spark.table("throughput").collect()
        .map(r => (r.getString(1), r.getLong(2), r.getLong(3))).toSet
      assert(rows.contains(("s1", 2L, 5L)), s"got $rows")
      assert(rows.contains(("s2", 1L, 1L)))
    } finally stopQuietly(q)
  }
}
