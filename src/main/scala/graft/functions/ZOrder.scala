package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.graftbridge.{columnOf, expressionOf}
import org.apache.spark.sql.types._

/** Morton (Z-order) interleave of two 31-bit keys — the multi-dimensional
  * layout key behind [[graft.operators.Layout.zOrdered]].
  *
  * Bit i of `a` lands at z-bit 2i, bit i of `b` at 2i+1; with both keys
  * < 2^31 the result uses at most 62 bits, so it is always a positive
  * long and signed ordering == unsigned ordering (keys outside that
  * range fail loudly rather than silently folding). The interleave is
  * the classic magic-number bit spread — O(1), branch-free, codegen'd to
  * one static call. */
object ZOrderKernel {

  /** Spread the low 31 bits of `v` to even bit positions. */
  @inline private def spread(v: Long): Long = {
    var x = v & 0x7fffffffL
    x = (x | (x << 16)) & 0x0000ffff0000ffffL
    x = (x | (x << 8))  & 0x00ff00ff00ff00ffL
    x = (x | (x << 4))  & 0x0f0f0f0f0f0f0f0fL
    x = (x | (x << 2))  & 0x3333333333333333L
    x = (x | (x << 1))  & 0x5555555555555555L
    x
  }

  def interleave(a: Long, b: Long): Long = {
    if (a < 0 || a > 0x7fffffffL || b < 0 || b > 0x7fffffffL)
      throw new IllegalArgumentException(
        s"z-order keys must be in [0, 2^31): ($a, $b)")
    spread(a) | (spread(b) << 1)
  }
}

/** `zvalue(a, b)` — 62-bit Morton code of two integral columns. */
case class ZValue(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType | IntegerType, LongType | IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"zvalue requires integral inputs, got ${l.sql}, ${r.sql}")
    }

  private def asLong(v: Any): Long = v match {
    case l: java.lang.Long    => l.longValue()
    case i: java.lang.Integer => i.longValue()
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    ZOrderKernel.interleave(asLong(a), asLong(b))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.ZOrderKernel.interleave((long)$a, (long)$b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
  override def prettyName: String = "zvalue"
}

object ZOrderFunctions {
  def zvalue(a: Column, b: Column): Column =
    columnOf(ZValue(expressionOf(a), expressionOf(b)))
}
