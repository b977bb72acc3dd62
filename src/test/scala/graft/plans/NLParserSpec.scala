package graft.plans

import org.scalatest.funsuite.AnyFunSuite

import graft.plans.{Op => O, Pred => P}

/** Parser unit tests: every description shape from the reference's corpus
  * (agentic_workflow_transformation.py:339-362) maps to the expected IR. */
class NLParserSpec extends AnyFunSuite {

  test("default description: filter + select") {
    val plan = NLParser.parse("Filter rows where age > 30 and select columns name and age.")
    assert(plan.ops == List(
      O.Filter(P.Cmp(P.Gt, "age", Lit.Num(30))),
      O.Select(Seq("name", "age"))))
  }

  test("string equality + comma select list") {
    val plan = NLParser.parse("Filter rows where city == 'New York' and select name, city.")
    assert(plan.ops == List(
      O.Filter(P.Cmp(P.Eq, "city", Lit.Str("New York"))),
      O.Select(Seq("name", "city"))))
  }

  test("sort desc + top k") {
    val plan = NLParser.parse("Sort by age descending and keep top 3 rows.")
    assert(plan.ops == List(O.Sort(Seq("age" -> false)), O.Limit(3)))
  }

  test("group by + count") {
    val plan = NLParser.parse("Group by city and count names.")
    assert(plan.ops == List(
      O.GroupAgg(Seq("city"), Seq(AggSpec(AggFunc.Count, "names", "count")))))
  }

  test("derive boolean column") {
    val plan = NLParser.parse("Add is_adult column where is_adult = age >= 18.")
    assert(plan.ops == List(O.DeriveBool("is_adult", P.Cmp(P.Ge, "age", Lit.Num(18)))))
  }

  test("rename and drop") {
    assert(NLParser.parse("Rename name to full_name.").ops == List(O.Rename("name", "full_name")))
    assert(NLParser.parse("Drop city column.").ops == List(O.Drop(Seq("city"))))
  }

  test("uppercase AND stays in predicate; lowercase 'and select' splits") {
    val plan = NLParser.parse(
      "Filter rows where age > 30 AND city == 'New York' and select name, age, city.")
    assert(plan.ops == List(
      O.Filter(P.And(P.Cmp(P.Gt, "age", Lit.Num(30)), P.Cmp(P.Eq, "city", Lit.Str("New York")))),
      O.Select(Seq("name", "age", "city"))))
  }

  test("between consumes its own 'and'") {
    val plan = NLParser.parse(
      "Filter rows where age between 30 and 45 and name starts with 'J'.")
    assert(plan.ops == List(
      O.Filter(P.And(
        P.Between("age", Lit.Num(30), Lit.Num(45)),
        P.StartsWith("name", "J")))))
  }

  test("parenthesized compound") {
    val plan = NLParser.parse(
      "Select rows where (age > 30 AND city == 'Chicago') OR (age <= 25 AND city == 'New York').")
    assert(plan.ops == List(O.Filter(P.Or(
      P.And(P.Cmp(P.Gt, "age", Lit.Num(30)), P.Cmp(P.Eq, "city", Lit.Str("Chicago"))),
      P.And(P.Cmp(P.Le, "age", Lit.Num(25)), P.Cmp(P.Eq, "city", Lit.Str("New York")))))))
  }

  test("in-list") {
    val plan = NLParser.parse("Filter rows where age > 30 and city in ('Chicago', 'Boston').")
    assert(plan.ops == List(O.Filter(P.And(
      P.Cmp(P.Gt, "age", Lit.Num(30)),
      P.In("city", Seq(Lit.Str("Chicago"), Lit.Str("Boston")))))))
  }

  test("negation") {
    val plan = NLParser.parse("Filter rows where age > 30 and not city == 'Los Angeles'.")
    assert(plan.ops == List(O.Filter(P.And(
      P.Cmp(P.Gt, "age", Lit.Num(30)),
      P.Not(P.Cmp(P.Eq, "city", Lit.Str("Los Angeles")))))))
  }

  test("sort, then filter, then top-k composition keeps stated order") {
    val plan = NLParser.parse("Sort by age desc and then filter age > 30 and keep top 2.")
    assert(plan.ops == List(
      O.Sort(Seq("age" -> false)),
      O.Filter(P.Cmp(P.Gt, "age", Lit.Num(30))),
      O.Limit(2)))
  }

  test("group + avg + having") {
    val plan = NLParser.parse("Group by city and show average age where average_age > 30.")
    assert(plan.ops == List(
      O.GroupAgg(Seq("city"), Seq(AggSpec(AggFunc.Avg, "age", "average_age"))),
      O.Having(P.Cmp(P.Gt, "average_age", Lit.Num(30)))))
  }

  test("contains + between") {
    val plan = NLParser.parse("Filter where name contains 'an' and age between 30 and 50.")
    assert(plan.ops == List(O.Filter(P.And(
      P.Contains("name", "an"),
      P.Between("age", Lit.Num(30), Lit.Num(50))))))
  }

  test("out-of-grammar input raises ParseException") {
    assertThrows[NLParser.ParseException] {
      NLParser.parse("Pivot the table by month and melt everything.")
    }
  }

  test("all 20 reference descriptions parse") {
    graft.operators.EvalHarness.descriptions.foreach { d =>
      NLParser.parse(d) // must not throw
    }
  }
}
