package graft.functions

import graft.SparkSpec
import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._

/** Bit-identity of the fused [[TextQualityStats]] quality path against
  * the HOF formulation it replaced (`split(lower())`/`filter`/
  * `regexp_replace` — the DuckDB oracle's formulation): same doubles on
  * the whole fixture corpus AND on adversarial strings exercising every
  * divergence the kernel's exactness contract rules out. */
class QualityKernelSpec extends SparkSpec {

  import spark.implicits._

  private def mismatches(df: org.apache.spark.sql.DataFrame): Long =
    df.select(TextAnalysis.qualityColumn(col("text")).as("k"),
              TextAnalysis.qualityColumnHof(col("text")).as("h"))
      .filter(!(col("k") <=> col("h"))).count()

  test("kernel quality equals HOF quality on the fixture corpus") {
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    assert(mismatches(docs) == 0L)
  }

  test("kernel quality equals HOF quality on adversarial strings") {
    val cases = Seq(
      "",                            // empty: zero tokens, zero chars
      " \t\n\u000B\f\r ",            // all six regex-\s chars, no tokens
      "the THE The tHe",             // stopwords under every ASCII case
      "a",                           // single-char stopword, no whitespace
      "was.",                        // punctuation glued to a stopword
      "...!!!,,,",                   // all punctuation
      "the\u00A0a",                  // NBSP is NOT regex-\s: one token
      "caf\u00e9 na\u00efve",        // non-ASCII letters count as punct
      "\u212A is kelvin",            // Kelvin sign lowercases to k
      "\u0130stanbul the",           // dotted-capital-I two-char mapping
      "emoji \uD83D\uDE00 tail",     // astral codepoint (surrogate pair)
      "\uD83D\uDE00",                // lone astral token
      "x" * 500,                     // one long token
      ("word " * 150).trim,          // saturates the length score
      "of and to in is that it was the a", // all ten stopwords
      "tab\tsep\nlines\rmixedws\fforms",
      "trailing space ",
      " leading",
      "double  space",
      "123 456 mixed2alpha a1b2")
    assert(mismatches(cases.toDF("text")) == 0L)
  }

  test("kernel stats match the HOF integer inputs component-wise") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val st = TextAnalysis.qualityStats(col("text"))
    val toks = graft.operators.Dedup.tokens(col("text"))
    val bad = docs.select(
        st.getField("n_tokens").as("kn"),
        st.getField("stop_hits").as("ks"),
        st.getField("punct_chars").as("kp"),
        st.getField("n_chars").as("kc"),
        size(toks).cast("long").as("hn"),
        size(filter(toks, t => array_contains(
          lit(TextAnalysis.EnglishStopwords.toArray), t))).cast("long").as("hs"),
        (length(col("text")) -
          length(regexp_replace(col("text"), "[^A-Za-z0-9\\s]", "")))
          .cast("long").as("hp"),
        length(col("text")).cast("long").as("hc"))
      .filter(col("kn") =!= col("hn") || col("ks") =!= col("hs") ||
              col("kp") =!= col("hp") || col("kc") =!= col("hc"))
      .count()
    assert(bad == 0L)
  }
}
