package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.{columnOf, expressionOf}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** 64-bin character histogram — the counting-filter companion to
  * edit-distance verification (Gravano et al.'s q-gram/count filtering,
  * at q=1): one edit changes at most one character's count on each of
  * two bins, so
  *
  *   levenshtein(a, b) ≥ L1(hist(a), hist(b)) / 2
  *
  * and binning by `byte & 63` only *lowers* L1 (collisions merge bins),
  * so the bound — and any pruning built on it — stays LOSSLESS under
  * binning. The histogram is one map-side pass per document (64 longs);
  * the per-pair bound is a 64-element loop instead of an O(len·d) DP. */
object CharHistKernel {

  def compute(s: UTF8String): GenericArrayData = {
    // bin CODE POINTS, not bytes: levenshtein counts character edits, so
    // a byte histogram would overcount multi-byte UTF-8 substitutions
    // (3 byte deltas for 'é'→'e') and break the L1/2 ≤ lev bound the
    // counting filter's losslessness rests on
    val counts = new Array[Long](64)
    val str = s.toString
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      counts(cp & 63) += 1L
      i += Character.charCount(cp)
    }
    new GenericArrayData(counts)
  }

  /** L1 distance over two equal-length long ArrayData — no allocation. */
  def l1(a: org.apache.spark.sql.catalyst.util.ArrayData,
         b: org.apache.spark.sql.catalyst.util.ArrayData): Long = {
    val n = a.numElements()
    if (b.numElements() != n)
      throw new IllegalArgumentException(
        s"hist_l1: histogram lengths differ ($n vs ${b.numElements()})")
    var acc = 0L
    var i = 0
    while (i < n) {
      acc += math.abs(a.getLong(i) - b.getLong(i))
      i += 1
    }
    acc
  }
}

/** `char_hist(text)` — array<long> of 64 binned byte counts. */
case class CharHist(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"char_hist requires string, got ${t.sql}")
  }

  override def nullSafeEval(v: Any): Any =
    CharHistKernel.compute(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CharHistKernel.compute($c)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "char_hist"
}

/** `hist_l1(a, b)` — L1 distance between two equal-length long arrays,
  * as one fused codegen'd loop. Exists because the `aggregate(zip_with)`
  * HOF formulation runs interpreted with per-row array allocation —
  * measured as the dominant cost on a 50M-candidate join at sf1. */
case class HistL1(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"hist_l1 requires two array<long>, got ${l.sql}, ${r.sql}")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    CharHistKernel.l1(
      a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.CharHistKernel.l1($a, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
  override def prettyName: String = "hist_l1"
}

object CharHistFunctions {
  def charHist(text: Column): Column = columnOf(CharHist(expressionOf(text)))
  def histL1(a: Column, b: Column): Column =
    columnOf(HistL1(expressionOf(a), expressionOf(b)))
}
