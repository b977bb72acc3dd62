package graft.plans

import graft.{Engine, SparkSpec}

/** pandas↔Spark semantic-gap regressions (SURVEY.md §5.2 item 5): the
  * reference's pandas semantics drop NaN rows from comparisons; Spark's
  * three-valued logic drops null rows from filters — same observable
  * behavior, pinned here so a future change can't silently diverge. */
class NullSemanticsSpec extends SparkSpec {

  import spark.implicits._

  private lazy val withNulls = Seq[(String, Option[Long], String)](
    ("Alice", Some(25L), "NY"),
    ("Bob", None, "LA"),       // pandas NaN age
    ("Cara", Some(40L), null), // missing city
    ("Dan", Some(35L), "NY"))
    .toDF("name", "age", "city")

  test("numeric filter drops null ages (pandas NaN-comparison parity)") {
    val out = Engine.run("Filter rows where age > 30.", withNulls)
    assert(out.select("name").collect().map(_.getString(0)).toSet == Set("Cara", "Dan"))
  }

  test("negated filter also drops nulls — p and !p both exclude them") {
    val p = Engine.run("Filter rows where age > 30.", withNulls).count()
    val notP = Engine.run("Filter rows where not age > 30.", withNulls).count()
    assert(p + notP == 3, "the null-age row belongs to neither side")
  }

  test("string predicates skip null cells without throwing") {
    val out = Engine.run("Filter rows where city == 'NY'.", withNulls)
    assert(out.count() == 2)
    val contains = Engine.run("Filter where city contains 'Y'.", withNulls)
    assert(contains.count() == 2)
  }

  test("derived boolean column is null (not false) for null input") {
    val out = Engine.run("Add is_adult column where is_adult = age >= 18.", withNulls)
    val bobRow = out.filter($"name" === "Bob").head
    assert(bobRow.isNullAt(bobRow.fieldIndex("is_adult")))
  }

  test("group-by places null keys in their own group (vs pandas dropping them)") {
    val out = Engine.run("Group by city and count names.", withNulls)
    // Spark keeps a null-key group — documented intentional difference
    // from pandas groupby(dropna=True); count(name) still counts rows.
    assert(out.count() == 3)
  }
}
