package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.graftbridge.{columnOf, expressionOf}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused single-pass text-quality statistics:
  * `struct(n_tokens, stop_hits, punct_chars, n_chars)` in ONE scan of
  * the string — the integer inputs of the quality heuristic
  * ([[graft.operators.TextAnalysis.qualityColumn]]).
  *
  * The HOF formulation evaluates `split(lower(text), "\\s+")` once per
  * referencing sub-expression — five times per row in the quality
  * formula — because Spark's codegen subexpression elimination skips
  * lambda-bearing higher-order functions. This expression carries no
  * lambdas, so repeated `getField` references DO collapse to one kernel
  * call per row under codegen CSE, and the kernel itself never
  * materializes a token array.
  *
  * Exactness contract (spec-pinned against the HOF formulation):
  *  - tokens: maximal runs of non-`\s` chars — the same ASCII class
  *    `[ \t\n\x0B\f\r]` Java's `\s` matches in `split(lower(s), "\\s+")`
  *    with empties dropped (NOT `Character.isWhitespace`, which differs
  *    on U+001C..001F/U+2028...).
  *  - stop_hits: tokens case-insensitively equal (ASCII fold) to a
  *    stopword. The word lists in use are pure ASCII, and no non-ASCII
  *    codepoint lowercases onto a plain ASCII letter sequence equal to
  *    one of them under `lower()`'s unicode mapping (Kelvin K→k, İ→i̇
  *    and friends never spell an English stopword), so the ASCII fold
  *    decides equality identically to `array_contains(words, token)`
  *    over `split(lower(text))`.
  *  - punct_chars: codepoints matching `[^A-Za-z0-9\s]` — the count
  *    `length(s) - length(regexp_replace(s, "[^A-Za-z0-9\\s]", ""))`
  *    produces (non-ASCII letters count as punctuation there, and so
  *    here; a surrogate pair is one codepoint, as `length` counts).
  *  - n_chars: codepoints, = `length(s)`.
  */
object TextQualityStatsKernel {

  @inline private def isAsciiRegexWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  @inline private def isAsciiAlnum(c: Char): Boolean =
    (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')

  /** ASCII-case-insensitive equality of s[from, until) with an
    * all-lowercase ASCII word. */
  private def tokenEquals(s: String, from: Int, until: Int, w: String): Boolean = {
    if (until - from != w.length) return false
    var i = 0
    while (i < w.length) {
      val c = s.charAt(from + i)
      val lc = if (c >= 'A' && c <= 'Z') (c + 32).toChar else c
      if (lc != w.charAt(i)) return false
      i += 1
    }
    true
  }

  def compute(text: UTF8String, words: Array[String]): InternalRow = {
    val s = text.toString
    var nTokens = 0L
    var stopHits = 0L
    var punct = 0L
    var nChars = 0L
    var tokStart = -1
    var tokAscii = true
    var i = 0

    def closeToken(end: Int): Unit = {
      nTokens += 1
      if (tokAscii) {
        var w = 0
        while (w < words.length) {
          if (tokenEquals(s, tokStart, end, words(w))) { stopHits += 1; w = words.length }
          else w += 1
        }
      }
      tokStart = -1
      tokAscii = true
    }

    while (i < s.length) {
      val c = s.charAt(i)
      if (isAsciiRegexWs(c)) {
        if (tokStart >= 0) closeToken(i)
        nChars += 1
        i += 1
      } else {
        if (tokStart < 0) tokStart = i
        if (Character.isHighSurrogate(c) && i + 1 < s.length &&
            Character.isLowSurrogate(s.charAt(i + 1))) {
          // one astral codepoint: never alnum-ASCII, never regex-\s
          punct += 1; nChars += 1; tokAscii = false; i += 2
        } else {
          if (!isAsciiAlnum(c)) punct += 1
          if (c > 0x7f) tokAscii = false
          nChars += 1
          i += 1
        }
      }
    }
    if (tokStart >= 0) closeToken(s.length)
    new GenericInternalRow(Array[Any](nTokens, stopHits, punct, nChars))
  }
}

/** `text_quality_stats(text)` — see [[TextQualityStatsKernel]]. */
case class TextQualityStats(child: Expression, words: Seq[String])
    extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("stop_hits", LongType, nullable = false),
    StructField("punct_chars", LongType, nullable = false),
    StructField("n_chars", LongType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"text_quality_stats requires string, got ${t.sql}")
  }

  private lazy val wordsArray: Array[String] = words.toArray

  override def nullSafeEval(v: Any): Any =
    TextQualityStatsKernel.compute(v.asInstanceOf[UTF8String], wordsArray)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val wordsRef = ctx.addReferenceObj("stopwords", wordsArray, "java.lang.String[]")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextQualityStatsKernel.compute($c, $wordsRef)")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
  override def prettyName: String = "text_quality_stats"
}

object TextQualityStatsFunctions {
  def qualityStats(text: Column, words: Seq[String]): Column =
    columnOf(TextQualityStats(expressionOf(text), words))
}
