package graft.plans

import org.scalatest.funsuite.AnyFunSuite

import graft.plans.{AggFunc, AggSpec, Lit, NLParser, Op => O, Pred => P}

/** Seeded randomized grammar coverage — a hand-rolled property test (no
  * scalacheck runner needed for determinism): hundreds of generated
  * well-formed descriptions must parse to exactly the IR they were built
  * from, and arbitrary garbage must fail ONLY with ParseException — the
  * parser's total-function contract (the reference's equivalent failure
  * mode is an LLM emitting code that throws arbitrarily at exec();
  * AGENTIC_WORKFLOW.md's repair loop exists because of it). */
class GrammarFuzzSpec extends AnyFunSuite {

  private val cols = Vector("age", "salary", "score", "count", "cluster",
                            "n", "quality", "c_acctbal", "delta")
  private val strs = Vector("New York", "src0", "BUILDING", "ab-ish")

  test("500 generated filter/sort/agg descriptions round-trip to their IR") {
    val rnd = new scala.util.Random(20260812L)
    def col() = cols(rnd.nextInt(cols.size))
    def num() = Lit.Num(rnd.nextInt(2001) - 1000)

    def atom(): (String, P) = rnd.nextInt(5) match {
      case 0 =>
        val (c, v) = (col(), num())
        (s"$c > ${v.value.toInt}", P.Cmp(P.Gt, c, v))
      case 1 =>
        val (c, v) = (col(), num())
        (s"$c <= ${v.value.toInt}", P.Cmp(P.Le, c, v))
      case 2 =>
        val c = col(); val s = strs(rnd.nextInt(strs.size))
        (s"""$c == '$s'""", P.Cmp(P.Eq, c, Lit.Str(s)))
      case 3 =>
        val c = col(); val (lo, hi) = (rnd.nextInt(100), 100 + rnd.nextInt(100))
        (s"$c between $lo and $hi", P.Between(c, Lit.Num(lo), Lit.Num(hi)))
      case 4 =>
        val c = col(); val s = strs(rnd.nextInt(strs.size))
        (s"""$c starts with '$s'""", P.StartsWith(c, s))
    }

    def pred(depth: Int): (String, P) =
      if (depth == 0) atom()
      else rnd.nextInt(4) match {
        case 0 =>
          val (sa, pa) = pred(depth - 1); val (sb, pb) = atom()
          (s"($sa AND $sb)", P.And(pa, pb))
        case 1 =>
          val (sa, pa) = pred(depth - 1); val (sb, pb) = atom()
          (s"($sa OR $sb)", P.Or(pa, pb))
        case 2 =>
          val (sa, pa) = atom()
          (s"not $sa", P.Not(pa))
        case 3 => atom()
      }

    (1 to 500).foreach { i =>
      val (ps, pp) = pred(rnd.nextInt(3))
      val (desc, expected) = rnd.nextInt(4) match {
        case 0 =>
          (s"Filter rows where $ps.", List(O.Filter(pp)))
        case 1 =>
          val (c1, c2) = (col(), col())
          (s"Filter rows where $ps and sort by $c1 desc, $c2 and keep top ${i % 50 + 1} rows.",
           List(O.Filter(pp),
                O.Sort(Seq(c1 -> false, c2 -> true)), O.Limit(i % 50 + 1)))
        case 2 =>
          val (k, c) = (col(), col())
          (s"Group by $k and show average $c where average_$c > 10.",
           List(O.GroupAgg(Seq(k), Seq(AggSpec(AggFunc.Avg, c, s"average_$c"))),
                O.Having(P.Cmp(P.Gt, s"average_$c", Lit.Num(10)))))
        case 3 =>
          val (c1, c2) = (col(), col())
          (s"Filter rows where $ps and select columns $c1 and $c2.",
           List(O.Filter(pp), O.Select(Seq(c1, c2))))
      }
      val got = NLParser.parse(desc).ops
      assert(got == expected, s"[$i] $desc\n  got $got\n  expected $expected")
    }
  }

  test("200 random filter prefixes compose with every corpus clause") {
    val rnd = new scala.util.Random(777L)
    val corpusClauses = Vector(
      "tokenize"                 -> List(O.Tokenize),
      "score quality"            -> List(O.ScoreQuality),
      "detect language"          -> List(O.DetectLanguage),
      "fingerprint"              -> List(O.Fingerprint),
      "scrub pii"                -> List(O.ScrubPii),
      "dedup exactly"            -> List(O.DedupExact),
      "sample 0.5 of rows"       -> List(O.SampleHash(0.5, 42L)),
      "find repeated spans of 5 tokens" -> List(O.RepeatedSpans(5, 2)),
      "find top 3 tokens"        -> List(O.TopTokens(3, "source")),
      "compute corpus stats"     -> List(O.CorpusStats("source")),
      "dedup by wide simhash hamming 2" -> List(O.DedupSimHashWide(2)),
      "dedup by cosine 0.5 using lsh"   -> List(O.DedupEmbeddingLsh(0.5)),
      "pack into sequences of 128 tokens" -> List(O.PackSequences(128, 32)),
      "quantize embeddings to int8"       -> List(O.QuantizeEmbeddings),
      "chunk into 64 token windows with 8 token overlap" -> List(O.ChunkDocuments(64, 8)),
      "find top 5 keywords per document" -> List(O.TfIdfKeywords(5)),
      "split into 80 percent train, 10 percent validation and 10 percent test" ->
        List(O.AssignSplits(List(("train", 80), ("validation", 10), ("test", 10)), 42L)),
      "repeat 2.5 times" -> List(O.Upsample(2.5, 42L)),
      "curate the best documents up to 5000 tokens" -> List(O.BudgetSelect(5000L)),
      "sample exactly 50 documents" -> List(O.SampleExactK(50, 42L)),
      "score by unigram log probability" -> List(O.ScoreUnigramLogProb),
      "apply gopher quality rules" -> List(O.GopherRules),
      "keep the latest event per user_id" -> List(O.LatestPerKey("user_id")),
      "dedup by semantic cosine 0.5 with 8 clusters" -> List(O.DedupSemantic(0.5, 8)),
      "sample sources at temperature 2" -> List(O.SampleTemperature("source", 42L)),
      "histogram score by cluster from 0 to 100 in 10 bins" ->
        List(O.Histogram("score", "cluster", 0.0, 100.0, 10)),
      "clip outliers above the 95th percentile of n" ->
        List(O.ClipPercentile("n", 0.95)),
      "calibrate lsh for recall 0.7" -> List(O.CalibrateLsh(0.7)),
      "calibrate ivf for recall 0.7" -> List(O.CalibrateIvf(0.7)),
      "dedup by embedding cosine above 0.5 blocked by label" ->
        List(O.DedupEmbedding(0.5, Some("label"))))
    (1 to 200).foreach { i =>
      val c = cols(rnd.nextInt(cols.size))
      val v = rnd.nextInt(100)
      val (tail, tailOps) = corpusClauses(rnd.nextInt(corpusClauses.size))
      val sep = if (rnd.nextBoolean()) "and" else "and then"
      val desc = s"Filter rows where $c > $v $sep $tail."
      val expected = O.Filter(P.Cmp(P.Gt, c, Lit.Num(v))) :: tailOps
      val got = NLParser.parse(desc).ops
      assert(got == expected, s"[$i] $desc\n  got $got\n  expected $expected")
    }
  }

  test("400 generated arithmetic aggregates round-trip: parens, unary minus, mixed operands") {
    import graft.plans.NumExpr
    val rnd = new scala.util.Random(20260813L)
    def col() = cols(rnd.nextInt(cols.size))

    // Generator mirrors the parser's fold structure exactly (left-assoc
    // chains, times over plus/minus, unary minus = 0 - atom), so the
    // expected IR is the hand-built plan, not a re-parse.
    def atom(depth: Int): (String, NumExpr) =
      rnd.nextInt(if (depth > 0) 4 else 3) match {
        case 0 => val c = col(); (c, NumExpr.ColRef(c))
        case 1 => val n = rnd.nextInt(200) + 1; (s"$n", NumExpr.Const(n))
        case 2 => // unary minus binds at atom level: parsed as 0 - atom
          val (s, e) = atom(0); (s"- $s", NumExpr.Sub(NumExpr.Const(0), e))
        case 3 =>
          val (s, e) = addsub(depth - 1); (s"($s)", e)
      }
    def mul(depth: Int): (String, NumExpr) = {
      var (s, e) = atom(depth)
      (0 until rnd.nextInt(3)).foreach { _ =>
        val op = if (rnd.nextBoolean()) "*" else "times"
        val (s2, e2) = atom(depth)
        s = s"$s $op $s2"; e = NumExpr.Mul(e, e2)
      }
      (s, e)
    }
    def addsub(depth: Int): (String, NumExpr) = {
      var (s, e) = mul(depth)
      (0 until rnd.nextInt(3)).foreach { _ =>
        val (s2, e2) = mul(depth)
        rnd.nextInt(4) match {
          case 0 => s = s"$s + $s2"; e = NumExpr.Add(e, e2)
          case 1 => s = s"$s plus $s2"; e = NumExpr.Add(e, e2)
          case 2 => s = s"$s - $s2"; e = NumExpr.Sub(e, e2)
          case 3 => s = s"$s minus $s2"; e = NumExpr.Sub(e, e2)
        }
      }
      (s, e)
    }

    val funcs = Vector(("sum", AggFunc.Sum), ("average", AggFunc.Avg),
                       ("min", AggFunc.Min), ("max", AggFunc.Max))
    (1 to 400).foreach { i =>
      val k = col()
      val (fw, ff) = funcs(rnd.nextInt(funcs.size))
      val (es, ee) = addsub(2)
      val roundTo = if (rnd.nextBoolean()) Some(rnd.nextInt(6)) else None
      val roundStr = roundTo.fold("")(s => s" rounded to $s decimals")
      val desc = s"Group by $k and show $fw of $es$roundStr as v$i."
      val expected = ee match {
        // a bare column reference is a plain column aggregate, not an
        // expression aggregate — the parser's own normalization
        case NumExpr.ColRef(n) =>
          List(O.GroupAgg(Seq(k), Seq(AggSpec(ff, n, s"v$i", roundTo, None))))
        case e =>
          List(O.GroupAgg(Seq(k), Seq(AggSpec(ff, "__expr__", s"v$i", roundTo, Some(e)))))
      }
      val got = NLParser.parse(desc).ops
      assert(got == expected, s"[$i] $desc\n  got $got\n  expected $expected")
    }
  }

  test("arithmetic ambiguity fails loudly, never silently mis-binds") {
    import graft.plans.NumExpr
    // `a -5` lexes a negative LITERAL, not a subtraction: the expression
    // ends at `a`, the stray -5 must fail the clause
    assertThrows[NLParser.ParseException] {
      NLParser.parse("Group by k and show sum of age -5 as v.")
    }
    // spelled out, it IS subtraction
    assert(NLParser.parse("Group by k and show sum of age - 5 as v.").ops ==
      List(O.GroupAgg(Seq("k"), Seq(AggSpec(AggFunc.Sum, "__expr__", "v", None,
        Some(NumExpr.Sub(NumExpr.ColRef("age"), NumExpr.Const(5))))))))
    // dangling operator / unbalanced paren
    assertThrows[NLParser.ParseException] {
      NLParser.parse("Group by k and show sum of age + as v.")
    }
    assertThrows[NLParser.ParseException] {
      NLParser.parse("Group by k and show sum of (age + 1 as v.")
    }
    // expression aggregates demand an explicit alias
    assertThrows[NLParser.ParseException] {
      NLParser.parse("Group by k and show sum of age + 1.")
    }
  }

  test("random garbage fails only with ParseException, never anything else") {
    val rnd = new scala.util.Random(42L)
    val alphabet = "abcdefghij <>=!()'%,.0123456789-"
    var parsed = 0
    (1 to 500).foreach { i =>
      val s = (1 to (1 + rnd.nextInt(40)))
        .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
      try { NLParser.parse(s); parsed += 1 }
      catch {
        case _: NLParser.ParseException => () // the contract
        case e: Throwable =>
          fail(s"[$i] non-ParseException ${e.getClass.getName} on: $s")
      }
    }
    info(s"$parsed/500 garbage strings accidentally parsed (expected: few)")
  }
}
