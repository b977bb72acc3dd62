package graft.operators

import graft.SparkSpec

class PiiScrubSpec extends SparkSpec {

  import spark.implicits._

  test("emails and phone-like digit runs are replaced; clean text untouched") {
    val docs = Seq(
      (1L, "contact me at jane.doe+test@example.co.uk for details"),
      (2L, "call 415-555-0199 or (020) 7946 0958 now"),
      (3L, "plain text with the number 42 kept"),
      (4L, "mixed: bob@corp.io then 555 123 4567 done")).toDF("doc_id", "text")
    val out = docs.select($"doc_id", TextAnalysis.scrubPii($"text").as("s"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "contact me at <EMAIL> for details")
    assert(out(2L) == "call <PHONE> or <PHONE> now")
    assert(out(3L) == "plain text with the number 42 kept", "short numbers survive")
    assert(out(4L) == "mixed: <EMAIL> then <PHONE> done")
  }
}
