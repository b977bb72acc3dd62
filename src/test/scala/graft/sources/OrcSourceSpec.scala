package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** ORC scan surface: round-trip fidelity, predicate pushdown, and an
  * operator running unchanged over the format. */
class OrcSourceSpec extends SparkSpec {

  test("orc round-trips the documents table and pushes filters to the scan") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val dir = java.nio.file.Files.createTempDirectory("graft-orc").toString
    docs.write.mode("overwrite").orc(dir)

    val back = Sources.orc(spark, dir)
    assert(back.schema == docs.schema)
    assert(back.count() == docs.count())
    val a = docs.select("doc_id", "source").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    val b = back.select("doc_id", "source").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(a == b)

    // the ORC reader takes pushed filters just like parquet
    val plan = back.filter(col("doc_id") < 100)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [") && plan.contains("LessThan(doc_id,100)"),
      plan.take(600))

    // a corpus operator runs unchanged over the format
    val viaOrc = graft.operators.Dedup.exactByText(back)
      .collect().map(_.getLong(0)).toSet
    val viaParquet = graft.operators.Dedup.exactByText(docs)
      .collect().map(_.getLong(0)).toSet
    assert(viaOrc == viaParquet)
  }
}
