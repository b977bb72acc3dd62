package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The scale-path sink: partitioned parquet whose partition column prunes
  * at scan time — a reader filtering on the partition key must touch only
  * that partition's files. */
class PartitionedSinkSpec extends SparkSpec {

  test("partitionBy layout round-trips and prunes the scan") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val out = java.nio.file.Files.createTempDirectory("graft-part").toString
    Sinks.parquetPartitioned(docs, out, partitionCols = Seq("lang"))

    // physical layout: one directory per lang value
    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory)
      .map(_.getName).filter(_.startsWith("lang=")).sorted
    assert(dirs.length == 5, s"expected 5 lang partitions, got ${dirs.mkString(",")}")

    val back = spark.read.parquet(out)
    assert(back.count() == docs.count())

    // partition pruning: the filter must land in PartitionFilters, and the
    // scan's selected partition count must be 1
    val q = back.filter(col("lang") === "de")
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(lang"),
      s"lang filter not used for pruning:\n${plan.take(800)}")
    val deCount = docs.filter(col("lang") === "de").count()
    assert(q.count() == deCount)
  }

  test("writing with repartition on the partition key avoids small files") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val out = java.nio.file.Files.createTempDirectory("graft-part2").toString
    // one file per partition value: repartition on the key first
    Sinks.parquetPartitioned(docs.repartition(col("lang")), out, Seq("lang"))
    val filesPerPartition = new java.io.File(out).listFiles()
      .filter(d => d.isDirectory && d.getName.startsWith("lang="))
      .map(_.listFiles().count(_.getName.endsWith(".parquet")))
    assert(filesPerPartition.forall(_ == 1),
      s"expected exactly one file per partition, got ${filesPerPartition.mkString(",")}")
  }

  test("csvSingleFile renders array/binary columns as text instead of failing") {
    import spark.implicits._
    // the shape an index read exports: id + float vector + code bytes
    val df = Seq((1L, Array(0.5f, -1.25f), Array[Byte](0x0a, 0x7f)))
      .toDF("vec_id", "embedding", "codes")
    val out = java.nio.file.Files.createTempDirectory("graft-csvsafe").toString
    val path = Sinks.csvSingleFile(df, out, "export.csv")
    val lines = java.nio.file.Files.readAllLines(path)
    assert(lines.get(0) == "vec_id,embedding,codes")
    assert(lines.get(1) == "1,\"[0.5,-1.25]\",0A7F",
      s"unexpected rendering: ${lines.get(1)}")
  }
}
