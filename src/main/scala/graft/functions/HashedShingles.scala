package graft.functions

import java.util.Arrays

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.{columnOf, expressionOf}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Sorted distinct FNV-1a hashes of word n-gram shingles, computed in one
  * kernel call: tokenize → hash each n-token window (with `' '`
  * separators, matching `concat_ws(" ", ...)` semantics) → sort → dedup.
  * No shingle strings are ever materialized.
  *
  * The equivalent built-in pipeline
  * (`array_sort(transform(array_distinct(transform(sequence(...),
  * i => concat_ws(" ", slice(tokens, i, n)))), xxhash64))`) allocates a
  * sliced array + concatenated string per shingle and runs interpreted
  * lambda machinery per element — measured as the dominant cost of the
  * dedup queries at sf0.1. This kernel is a linear pass over the bytes. */
object HashedShinglesKernel {
  private final val FnvOffset = 0xcbf29ce484222325L
  private final val FnvPrime  = 0x100000001b3L

  @inline private def step(h: Long, b: Byte): Long = (h ^ (b & 0xffL)) * FnvPrime

  def compute(text: UTF8String, n: Int): ArrayData = {
    // lowercase + whitespace tokenize (same rule as Dedup.tokens)
    val toks = text.toLowerCase.toString.split("\\s+").filter(_.nonEmpty)
    val m = toks.length - n + 1
    if (m <= 0) return new GenericArrayData(Array.emptyLongArray)
    val hs = new Array[Long](m)
    var i = 0
    while (i < m) {
      var h = FnvOffset
      var j = i
      while (j < i + n) {
        if (j > i) h = step(h, ' '.toByte)
        val bytes = toks(j).getBytes("UTF-8")
        var b = 0
        while (b < bytes.length) { h = step(h, bytes(b)); b += 1 }
        j += 1
      }
      hs(i) = h
      i += 1
    }
    Arrays.sort(hs)
    // in-place dedup of the sorted array
    var w = 1
    var r = 1
    while (r < m) {
      if (hs(r) != hs(r - 1)) { hs(w) = hs(r); w += 1 }
      r += 1
    }
    new GenericArrayData(if (w == m) hs else Arrays.copyOf(hs, w))
  }
}

/** Count of non-empty whitespace tokens — same tokenization rule as
  * [[HashedShinglesKernel]]/`Dedup.tokens` (so counts are interchangeable
  * with the HOF formulation the DuckDB oracle uses), without building a
  * token array per row. */
object TokenCountKernel {
  def compute(text: UTF8String): Long = {
    val s = text.toString
    var count = 0L
    var inTok = false
    var i = 0
    while (i < s.length) {
      val ws = Character.isWhitespace(s.charAt(i))
      if (!ws && !inTok) { count += 1; inTok = true }
      else if (ws) inTok = false
      i += 1
    }
    count
  }
}

case class TokenCount(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"token_count requires string, got ${t.sql}")
  }

  override def nullSafeEval(v: Any): Any =
    TokenCountKernel.compute(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TokenCountKernel.compute($c)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "token_count"
}

/** Distinct n-gram shingle *strings* in first-occurrence order — the
  * string-valued sibling of [[HashedShinglesKernel]] for operators whose
  * output must carry the span text itself (repeated-span detection). Same
  * tokenization and `' '` joining, so `string_shingles` ≡ the HOF
  * formulation `Dedup.shingles` element-for-element (spec-asserted). */
object StringShinglesKernel {
  def compute(text: UTF8String, n: Int): ArrayData = {
    val toks = text.toLowerCase.toString.split("\\s+").filter(_.nonEmpty)
    val m = toks.length - n + 1
    if (m <= 0) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[String](m * 2)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < m) {
      sb.setLength(0)
      var j = i
      while (j < i + n) {
        if (j > i) sb.append(' ')
        sb.append(toks(j))
        j += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator
    var k = 0
    while (it.hasNext) { out(k) = UTF8String.fromString(it.next()); k += 1 }
    new GenericArrayData(out)
  }
}

case class StringShingles(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"string_shingles requires string, got ${t.sql}")
  }

  override def nullSafeEval(v: Any): Any =
    StringShinglesKernel.compute(v.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.StringShinglesKernel.compute($c, $n)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "string_shingles"
}

case class HashedShingles(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"hashed_shingles requires string, got ${t.sql}")
  }

  override def nullSafeEval(v: Any): Any =
    HashedShinglesKernel.compute(v.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashedShinglesKernel.compute($c, $n)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "hashed_shingles"
}

object HashedShinglesFunctions {
  def hashedShingles(text: Column, n: Int): Column =
    columnOf(HashedShingles(expressionOf(text), n))

  def stringShingles(text: Column, n: Int): Column =
    columnOf(StringShingles(expressionOf(text), n))

  def tokenCount(text: Column): Column =
    columnOf(TokenCount(expressionOf(text)))
}
