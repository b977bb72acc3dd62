package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.{columnOf, expressionOf}
import org.apache.spark.sql.types._

/** Jaccard similarity of two SORTED-ASCENDING, DISTINCT `array<long>`
  * columns via a single merge pass — |A∩B| / (|A|+|B|−|A∩B|).
  *
  * This is the verification kernel for hashed-shingle dedup: instead of
  * per-pair `array_intersect`/`array_union` over string arrays (a hash-set
  * build + string hashing per candidate pair — the measured bottleneck at
  * 625k pairs/sf0.1), shingles are xxhash64'd and sorted once per
  * document, and each candidate pair costs one linear merge of longs.
  * Collision risk (two distinct shingles hashing equal within one
  * document pair) is ~|A|·|B|·2⁻⁶⁴ ≈ 10⁻¹⁵ — immaterial.
  *
  * Inputs MUST be sorted+distinct (produced by
  * `array_sort(array_distinct(transform(sh, xxhash64)))`); the merge
  * silently undercounts otherwise. Static kernel keeps whole-stage
  * codegen to one call per row. */
object SortedJaccard {
  def compute(a: ArrayData, b: ArrayData): Double = {
    val na = a.numElements()
    val nb = b.numElements()
    if (na == 0 && nb == 0) return 0.0
    var i = 0; var j = 0; var inter = 0
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { inter += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    inter.toDouble / (na + nb - inter).toDouble
  }
}

case class SortedLongJaccard(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"sorted_jaccard requires two array<bigint> arguments, got ${l.sql} and ${r.sql}")
    }

  override def nullSafeEval(l: Any, r: Any): Any =
    SortedJaccard.compute(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.SortedJaccard.compute($a, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
  override def prettyName: String = "sorted_jaccard"
}

object ArrayJaccardFunctions {
  def sortedJaccard(a: Column, b: Column): Column =
    columnOf(SortedLongJaccard(expressionOf(a), expressionOf(b)))
}
