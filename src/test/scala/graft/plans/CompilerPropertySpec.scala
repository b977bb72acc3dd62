package graft.plans

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec
import graft.plans.{Op => O, Pred => P}

/** Property-based compiler laws (SURVEY.md §5.2): structural invariants
  * that must hold for every plan the parser can produce, checked over
  * randomized predicates and data (seeded scalacheck generators —
  * deterministic across runs). */
class CompilerPropertySpec extends SparkSpec {

  import spark.implicits._

  /** Deterministic forAll replacement: sample `gen` across `n` seeds. */
  private def forAll[A](gen: Gen[A], n: Int = 20)(f: A => Unit): Unit =
    (0 until n).foreach { i =>
      gen(Gen.Parameters.default, Seed(42L + i)).foreach(f)
    }

  private def forAll2[A, B](ga: Gen[A], gb: Gen[B], n: Int = 20)(f: (A, B) => Unit): Unit =
    (0 until n).foreach { i =>
      for {
        a <- ga(Gen.Parameters.default, Seed(42L + i))
        b <- gb(Gen.Parameters.default, Seed(1042L + i))
      } f(a, b)
    }

  private def whenever(cond: Boolean)(body: => Unit): Unit = if (cond) body

  private val rowsGen: Gen[List[(String, Long, String)]] = Gen.listOfN(
    30,
    for {
      name <- Gen.oneOf("Alice", "Bob", "Cara", "Dan", "Eve", "Fay")
      age <- Gen.choose(1L, 90L)
      city <- Gen.oneOf("NY", "LA", "SF", "CHI")
    } yield (name, age, city))

  private val predGen: Gen[Pred] = {
    val atom: Gen[Pred] = Gen.oneOf(
      Gen.choose(1L, 90L).map(v => P.Cmp(P.Gt, "age", Lit.Num(v.toDouble))),
      Gen.choose(1L, 90L).map(v => P.Cmp(P.Le, "age", Lit.Num(v.toDouble))),
      Gen.oneOf("NY", "LA", "SF").map(c => P.Cmp(P.Eq, "city", Lit.Str(c))),
      Gen.oneOf("A", "B", "C").map(p => P.StartsWith("name", p)),
      for { lo <- Gen.choose(1L, 50L); hi <- Gen.choose(50L, 90L) }
        yield P.Between("age", Lit.Num(lo.toDouble), Lit.Num(hi.toDouble)))
    def tree(depth: Int): Gen[Pred] =
      if (depth <= 0) atom
      else Gen.frequency(
        3 -> atom,
        1 -> Gen.lzy(for { l <- tree(depth - 1); r <- tree(depth - 1) } yield P.And(l, r)),
        1 -> Gen.lzy(for { l <- tree(depth - 1); r <- tree(depth - 1) } yield P.Or(l, r)),
        1 -> Gen.lzy(tree(depth - 1).map(P.Not)))
    tree(2)
  }

  test("filter output is a subset of input; p and !p partition the input") {
    forAll2(rowsGen, predGen) { (rows, pred) =>
      whenever(rows.nonEmpty) {
        val df = rows.toDF("name", "age", "city")
        val total = df.count()
        val kept = Compiler.compile(Plan(List(O.Filter(pred))), df)
        val dropped = Compiler.compile(Plan(List(O.Filter(P.Not(pred)))), df)
        assert(kept.count() + dropped.count() == total)
        val inputSet = df.collect().map(_.toSeq).toSet
        assert(kept.collect().map(_.toSeq).forall(inputSet.contains))
      }
    }
  }

  test("limit(k) returns at most k rows") {
    forAll2(rowsGen, Gen.choose(0, 40)) { (rows, k) =>
      val df = rows.toDF("name", "age", "city")
      val out = Compiler.compile(Plan(List(O.Limit(k))), df)
      assert(out.count() <= k)
    }
  }

  test("rename preserves row count and data, only the header changes") {
    forAll(rowsGen) { rows =>
      val df = rows.toDF("name", "age", "city")
      val out = Compiler.compile(Plan(List(O.Rename("name", "nm"))), df)
      assert(out.columns.toSeq == Seq("nm", "age", "city"))
      assert(out.collect().map(_.toSeq).toSeq.sortBy(_.toString) ==
             df.collect().map(_.toSeq).toSeq.sortBy(_.toString))
    }
  }

  test("group-by counts sum to the input row count") {
    forAll(rowsGen) { rows =>
      whenever(rows.nonEmpty) {
        val df = rows.toDF("name", "age", "city")
        val out = Compiler.compile(Plan(List(
          O.GroupAgg(Seq("city"), Seq(AggSpec(AggFunc.Count, "name", "count"))))), df)
        assert(out.agg(org.apache.spark.sql.functions.sum("count"))
          .head.getLong(0) == rows.size)
      }
    }
  }

  test("sort is a permutation; descending head is the maximum") {
    forAll(rowsGen) { rows =>
      whenever(rows.nonEmpty) {
        val df = rows.toDF("name", "age", "city")
        val out = Compiler.compile(Plan(List(O.Sort(Seq("age" -> false)))), df)
        val ages = out.select("age").collect().map(_.getLong(0))
        assert(ages.head == rows.map(_._2).max)
        assert(ages.sorted.toSeq == rows.map(_._2).sorted)
      }
    }
  }

  test("parser round-trip: rendered filter descriptions re-parse to the same plan") {
    def render(p: Pred): String = p match {
      case P.Cmp(P.Gt, c, Lit.Num(v)) => s"$c > ${v.toLong}"
      case P.Cmp(P.Le, c, Lit.Num(v)) => s"$c <= ${v.toLong}"
      case P.Cmp(P.Eq, c, Lit.Str(s)) => s"$c == '$s'"
      case P.StartsWith(c, s)         => s"$c starts with '$s'"
      case P.Between(c, Lit.Num(a), Lit.Num(b)) => s"$c between ${a.toLong} and ${b.toLong}"
      case P.And(l, r) => s"(${render(l)} AND ${render(r)})"
      case P.Or(l, r)  => s"(${render(l)} OR ${render(r)})"
      case P.Not(x)    => s"not ${render(x)}"
      case other       => throw new IllegalArgumentException(other.toString)
    }
    forAll(predGen) { pred =>
      val plan = NLParser.parse(s"Filter rows where ${render(pred)}.")
      assert(plan.ops.length == 1)
      assert(plan.ops.head == O.Filter(pred))
    }
  }
}
