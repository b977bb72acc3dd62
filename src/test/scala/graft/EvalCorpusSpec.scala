package graft

import graft.operators.EvalHarness
import graft.sources.Sources

/** End-to-end eval corpus: the 20 verbatim reference descriptions
  * (agentic_workflow_transformation.py:339-362) against the canonical
  * 10-row fixture (input.csv:1-11), asserting the hand-computed expected
  * row counts and output schemas from FIXTURES.md §3. */
class EvalCorpusSpec extends SparkSpec {

  private lazy val sample = Sources.canonicalSample(spark).cache()

  /** (eval id, expected rows, expected columns) — FIXTURES.md §3. */
  private val expected: Seq[(Int, Long, Seq[String])] = Seq(
    (1, 7, Seq("name", "age")),
    (2, 1, Seq("name", "city")),
    (3, 3, Seq("name", "age")),
    (4, 3, Seq("name", "age", "city")),
    (5, 10, Seq("city", "count")),
    (6, 10, Seq("name", "age", "city", "is_adult")),
    (7, 1, Seq("name", "city")),
    (8, 10, Seq("full_name", "age", "city")),
    (9, 10, Seq("name", "age")),
    (10, 0, Seq("name", "age", "city")),
    (11, 0, Seq("name", "age", "city")),
    (12, 8, Seq("name", "age")),
    (13, 1, Seq("name", "age", "city")),
    (14, 2, Seq("name", "age", "city")),
    (15, 1, Seq("name", "age", "city")),
    (16, 1, Seq("name", "age", "city")),
    (17, 6, Seq("name", "age", "city")),
    (18, 2, Seq("name", "age", "city")),
    (19, 7, Seq("city", "average_age")),
    (20, 2, Seq("name", "age", "city")))

  expected.foreach { case (id, rows, cols) =>
    val desc = EvalHarness.descriptions(id - 1)
    test(f"eval $id%02d: $desc") {
      val out = Engine.run(desc, sample)
      assert(out.columns.toSeq == cols, s"schema mismatch for eval $id")
      assert(out.count() == rows, s"row count mismatch for eval $id")
    }
  }

  test("eval 4 returns the top-3 oldest: Ian, Diana, Fiona") {
    val out = Engine.run(EvalHarness.descriptions(3), sample)
    assert(out.select("name").collect().map(_.getString(0)).toSeq ==
      Seq("Ian", "Diana", "Fiona"))
  }

  test("eval 14 returns Charlie and Alice") {
    val out = Engine.run(EvalHarness.descriptions(13), sample)
    assert(out.select("name").collect().map(_.getString(0)).toSet == Set("Charlie", "Alice"))
  }

  test("eval 18 returns Ian then Diana") {
    val out = Engine.run(EvalHarness.descriptions(17), sample)
    assert(out.select("name").collect().map(_.getString(0)).toSeq == Seq("Ian", "Diana"))
  }

  test("eval 19 excludes New York, Boston, Miami") {
    val out = Engine.run(EvalHarness.descriptions(18), sample)
    val cities = out.select("city").collect().map(_.getString(0)).toSet
    assert(cities == Set("Los Angeles", "Chicago", "Seattle", "San Francisco",
      "Denver", "Austin", "Portland"))
  }

  test("eval harness summary has 20 passing rows") {
    val res = EvalHarness.run(spark, sample)
    assert(res.count() == 20)
    assert(res.filter("pass").count() == 20)
    assert(res.columns.toSeq ==
      Seq("id", "description", "actual_rows", "pass", "output_path"))
  }
}
