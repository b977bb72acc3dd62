package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.{columnOf, expressionOf}
import org.apache.spark.sql.types._

/** HyperLogLog register kernel (Flajolet et al.): 2^p byte registers,
  * register j = max rank of the hashed keys routed to j, estimate =
  * bias-corrected harmonic mean with linear counting in the small range.
  *
  * Why a hand-rolled sketch when `approx_count_distinct` exists (and is
  * oracle-checked in q12): Spark's HLL state lives inside one aggregation
  * — it cannot be *materialized* as a column, stored per shard/day, and
  * re-merged later. This kernel's sketch is a plain `binary` value, so a
  * 100 TB pipeline can pre-aggregate a 4 KiB sketch per (source, day)
  * partition at ingest and answer any later cross-partition distinct
  * query by register-max merge — no rescan of the raw data. Register max
  * is associative/commutative, so a merge of per-shard sketches is
  * BIT-IDENTICAL to the sketch of the union (asserted by spec and by the
  * x49 oracle's merged_equals_direct flag).
  *
  * Hashing: splitmix64 finalizer lane of the key ([[SketchKernels.mix64]])
  * — deterministic, seed-fixed; top p bits route, remaining 64−p bits
  * rank. Standard error ≈ 1.04/√(2^p) ⇒ 1.6 % at the default p=12.
  */
object HllKernel {

  /** Max register rank for sketch precision p: 64−p leading-zero bits
    * plus one. */
  @inline private def maxRank(p: Int): Int = 64 - p + 1

  def emptyRegs(p: Int): Array[Byte] = {
    require(p >= 4 && p <= 16, s"p must be in [4,16], got $p")
    new Array[Byte](1 << p)
  }

  /** Route `key` and raise its register if the new rank is higher. */
  def add(regs: Array[Byte], key: Long): Unit = {
    val p = Integer.numberOfTrailingZeros(regs.length)
    val h = SketchKernels.mix64(key ^ 0x8e2f0a1cab32e7a5L)
    val idx = (h >>> (64 - p)).toInt
    val w = h << p
    val rank = math.min(java.lang.Long.numberOfLeadingZeros(w) + 1, maxRank(p))
    if (rank > regs(idx)) regs(idx) = rank.toByte
  }

  /** In-place register-max merge of `b` into `a` (same length). */
  def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    require(a.length == b.length, "sketch precision mismatch")
    var i = 0
    while (i < a.length) { if (b(i) > a(i)) a(i) = b(i); i += 1 }
    a
  }

  /** Cardinality estimate (Java-callable for codegen). */
  def estimate(regs: Array[Byte]): Double = {
    val m = regs.length
    var sum = 0.0
    var zeros = 0
    var i = 0
    while (i < m) {
      sum += java.lang.Math.pow(2.0, -regs(i))
      if (regs(i) == 0) zeros += 1
      i += 1
    }
    val alpha = m match {
      case 16 => 0.673
      case 32 => 0.697
      case 64 => 0.709
      case _  => 0.7213 / (1.0 + 1.079 / m)
    }
    val e = alpha * m * m / sum
    if (e <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros) else e
  }
}

/** `hll_estimate(sketch)` — cardinality estimate of a binary HLL sketch. */
case class HllEstimate(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"hll_estimate requires binary, got ${t.sql}")
  }

  override def nullSafeEval(v: Any): Any =
    HllKernel.estimate(v.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HllKernel.estimate($c)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "hll_estimate"
}

object HllFunctions {
  def hllEstimate(sketch: Column): Column = columnOf(HllEstimate(expressionOf(sketch)))
}
