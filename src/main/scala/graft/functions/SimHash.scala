package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.{columnOf, expressionOf}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit SimHash over a token array (Charikar's similarity-preserving
  * fingerprint): per token, a 64-bit FNV-1a hash votes +1/-1 on each bit
  * position; the fingerprint takes each bit's vote sign. Near-identical
  * token multisets differ in few bits, so near-dup detection reduces to
  * Hamming distance over longs (`bit_count(a ^ b)` — codegen'd built-in).
  *
  * The kernel is a static Java-callable method so generated code invokes
  * it directly — the expression participates in whole-stage codegen with
  * one static call per row, no boxing.
  */
object SimHash64 {
  private final val FnvOffset = 0xcbf29ce484222325L
  private final val FnvPrime  = 0x100000001b3L

  /** FNV-1a over the UTF-8 bytes — deterministic, dependency-free. */
  def fnv1a64(s: UTF8String): Long = {
    val bytes = s.getBytes
    var h = FnvOffset
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= FnvPrime
      i += 1
    }
    h
  }

  /** SimHash of a token array; empty/null-free input expected. */
  def compute(tokens: ArrayData): Long = {
    val counts = new Array[Int](64)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      vote(counts, fnv1a64(tokens.getUTF8String(i)))
      i += 1
    }
    collapse(counts)
  }

  /** SimHash of raw text: lowercase + whitespace-tokenize + vote in one
    * kernel pass (same token rule as the array path over `Dedup.tokens`),
    * skipping the interpreted split/filter column pipeline. */
  def computeText(text: UTF8String): Long = {
    val counts = new Array[Int](64)
    val toks = text.toLowerCase.toString.split("\\s+")
    var i = 0
    while (i < toks.length) {
      if (toks(i).nonEmpty)
        vote(counts, fnv1a64(UTF8String.fromString(toks(i))))
      i += 1
    }
    collapse(counts)
  }

  @inline private def vote(counts: Array[Int], h: Long): Unit = {
    var j = 0
    while (j < 64) {
      if (((h >>> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
      j += 1
    }
  }

  @inline private def collapse(counts: Array[Int]): Long = {
    var res = 0L
    var j = 0
    while (j < 64) {
      if (counts(j) > 0) res |= (1L << j)
      j += 1
    }
    res
  }
}

/** 128-bit SimHash: per token, lane 0 votes with FNV-1a of the token and
  * lane 1 with the splitmix64 finalizer of that hash
  * ([[SketchKernels.mix64]]) — one tokenization pass, two decorrelated
  * 64-bit fingerprints. The wide fingerprint exists for *banding*: with
  * four 32-bit chunks (instead of the 64-bit fp's four 16-bit chunks)
  * the chunk-collision birthday term drops by 2^16 while Hamming ≤ 3
  * banding stays pigeonhole-lossless — the fix for the sf1-measured
  * quadratic candidate growth of the 16-bit layout. */
object SimHash128 {
  def computeText(text: UTF8String): ArrayData = {
    val counts = new Array[Int](128)
    val toks = text.toLowerCase.toString.split("\\s+")
    var i = 0
    while (i < toks.length) {
      if (toks(i).nonEmpty) {
        val h0 = SimHash64.fnv1a64(UTF8String.fromString(toks(i)))
        vote64(counts, 0, h0)
        vote64(counts, 64, SketchKernels.mix64(h0))
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      Array(collapse64(counts, 0), collapse64(counts, 64)))
  }

  @inline private def vote64(counts: Array[Int], off: Int, h: Long): Unit = {
    var j = 0
    while (j < 64) {
      if (((h >>> j) & 1L) == 1L) counts(off + j) += 1 else counts(off + j) -= 1
      j += 1
    }
  }

  @inline private def collapse64(counts: Array[Int], off: Int): Long = {
    var res = 0L
    var j = 0
    while (j < 64) {
      if (counts(off + j) > 0) res |= (1L << j)
      j += 1
    }
    res
  }
}

case class SimHashWide(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"simhash128 requires string, got ${t.sql}")
  }

  override def nullSafeEval(v: Any): Any =
    SimHash128.computeText(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHash128.computeText($c)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "simhash128"
}

case class SimHash(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) | StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"simhash64 requires array<string> or string, got ${t.sql}")
  }

  private def overRawText: Boolean = child.dataType == StringType

  override def nullSafeEval(v: Any): Any =
    if (overRawText) SimHash64.computeText(v.asInstanceOf[UTF8String])
    else SimHash64.compute(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    if (overRawText)
      defineCodeGen(ctx, ev, c => s"graft.functions.SimHash64.computeText($c)")
    else
      defineCodeGen(ctx, ev, c => s"graft.functions.SimHash64.compute($c)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "simhash64"
}

object SimHashFunctions {
  def simhash64(tokens: Column): Column = columnOf(SimHash(expressionOf(tokens)))
  def simhash128(text: Column): Column = columnOf(SimHashWide(expressionOf(text)))
}
