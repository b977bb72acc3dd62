package graft.plans

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Parser total-function guarantee: any input either parses to a Plan or
  * throws ParseException — never another exception type, never a hang.
  * (The reference's equivalent failure mode was an LLM emitting arbitrary
  * code into `exec()`; our failure mode must be a typed error.) */
class ParserFuzzSpec extends AnyFunSuite {

  private val wordGen = Gen.oneOf(
    "filter", "rows", "where", "and", "or", "not", "select", "columns",
    "sort", "by", "keep", "top", "group", "count", "show", "average",
    "rename", "drop", "add", "column", "between", "starts", "with",
    "contains", "in", "to", "age", "name", "city", "desc", "'x'", "42",
    "(", ")", ",", ">", "<=", "==", "garbage", "émoji", ".")

  private val inputGen: Gen[String] =
    Gen.choose(0, 14).flatMap(n => Gen.listOfN(n, wordGen)).map(_.mkString(" "))

  test("random token soups parse or raise ParseException, nothing else") {
    var parsed = 0
    var rejected = 0
    (0 until 500).foreach { i =>
      inputGen(Gen.Parameters.default, Seed(1234L + i)).foreach { s =>
        try { NLParser.parse(s); parsed += 1 }
        catch {
          case _: NLParser.ParseException => rejected += 1
          case e: Throwable => fail(s"non-ParseException on '$s': $e")
        }
      }
    }
    info(s"parsed=$parsed rejected=$rejected")
    assert(parsed + rejected > 0)
  }

  test("pathological inputs: empty, whitespace, quotes, deep nesting") {
    val cases = Seq("", "   ", ".", "'", "''", "((((((((((",
      "Filter rows where " + "( " * 50 + "age > 1" + " )" * 50 + ".",
      "Filter rows where age > " + "9" * 400,
      "Select rows where name starts with 'unterminated")
    cases.foreach { s =>
      try NLParser.parse(s)
      catch {
        case _: NLParser.ParseException => ()
        case e: Throwable => fail(s"non-ParseException on '${s.take(40)}': $e")
      }
    }
  }
}
