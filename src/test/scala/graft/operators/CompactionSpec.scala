package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Small-file compaction: many tiny files → few target-size files with
  * identical content. */
class CompactionSpec extends SparkSpec {

  test("compactFiles collapses a fragmented directory, content-identical") {
    val in = java.nio.file.Files.createTempDirectory("graft-frag").toString
    val out = java.nio.file.Files.createTempDirectory("graft-compact").toString
    // fragment the fixture into ~60 small files (a streaming sink's wake)
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    docs.repartition(60).write.mode("overwrite").parquet(in)
    def parquetFiles(dir: String) =
      new java.io.File(dir).listFiles.filter(_.getName.endsWith(".parquet"))
    val fragmented = parquetFiles(in)
    assert(fragmented.length >= 50, s"expected ~60 fragments, got ${fragmented.length}")

    val totalBytes = fragmented.map(_.length).sum
    val target = totalBytes / 4 // aim for ~4 output files
    val parts = Layout.compactFiles(spark, in, out, targetBytes = target)
    val compacted = parquetFiles(out)
    assert(compacted.length.toLong == parts)
    assert(compacted.length <= 6 && compacted.length >= 3,
      s"expected ~4-5 compacted files, got ${compacted.length}")

    // content survives byte-for-byte at the row level
    val a = docs.orderBy("doc_id").collect().map(_.toString)
    val b = spark.read.parquet(out).orderBy("doc_id").collect().map(_.toString)
    assert(a.sameElements(b))
  }
}
