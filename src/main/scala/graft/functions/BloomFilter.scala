package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.{columnOf, expressionOf}
import org.apache.spark.sql.types._

/** Blocked-probe Bloom filter over 64-bit keys — the build/probe kernel
  * behind [[graft.operators.BloomJoin]]'s pre-shuffle semi-join pruning.
  *
  * Double hashing (Kirsch–Mitzenmacher): probe bit i is
  * `h1 + i·h2 (mod numBits)` with h1/h2 two decorrelated splitmix64
  * finalizer lanes of the key ([[SketchKernels.mix64]] — same public
  * mixer the sampling/MinHash kernels use), h2 forced odd so the probe
  * stride is a unit modulo the power-of-two bit count. k probes into a
  * shared long[] word array; no per-row allocation on either path.
  *
  * False positives only — a key that was inserted ALWAYS probes true, so
  * pruning with it before an exact join never drops a matching row (the
  * property BloomJoinSpec checks exhaustively).
  */
object BloomKernel {

  /** Word count for a power-of-two bit size. */
  def words(numBits: Int): Int = {
    require(numBits >= 64 && (numBits & (numBits - 1)) == 0,
      s"numBits must be a power of two >= 64, got $numBits")
    numBits >>> 6
  }

  @inline private def h1(key: Long): Long =
    SketchKernels.mix64(key ^ 0x9e3779b97f4a7c15L)

  @inline private def h2(key: Long): Long =
    SketchKernels.mix64(key ^ 0xbf58476d1ce4e5b9L) | 1L

  /** Set the k probe bits of `key` in `bits` (length = numBits/64). */
  def insert(bits: Array[Long], key: Long, numHashes: Int): Unit = {
    val mask = (bits.length.toLong << 6) - 1L
    val a = h1(key); val b = h2(key)
    var i = 0
    while (i < numHashes) {
      val bit = (a + i * b) & mask
      bits((bit >>> 6).toInt) |= 1L << (bit & 63L)
      i += 1
    }
  }

  /** True iff every probe bit of `key` is set (Java-callable from
    * generated code — one static call per row, no boxing). */
  def mightContain(bits: Array[Long], key: Long, numHashes: Int): Boolean = {
    val mask = (bits.length.toLong << 6) - 1L
    val a = h1(key); val b = h2(key)
    var i = 0
    while (i < numHashes) {
      val bit = (a + i * b) & mask
      if ((bits((bit >>> 6).toInt) & (1L << (bit & 63L))) == 0L) return false
      i += 1
    }
    true
  }
}

/** `bloom_might_contain(key)` against an immutable driver-built bit set.
  * The bit array rides along as a referenced object (not a Literal), so
  * the generated code probes it directly inside whole-stage codegen —
  * the filter this backs runs at scan speed, before any exchange. */
case class BloomMightContain(child: Expression, bits: Array[Long],
                             numHashes: Int) extends UnaryExpression {
  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | IntegerType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"bloom_might_contain requires an integral key, got ${t.sql}")
  }

  override def nullSafeEval(v: Any): Any = {
    val key = v match {
      case l: java.lang.Long    => l.longValue()
      case i: java.lang.Integer => i.longValue()
    }
    BloomKernel.mightContain(bits, key, numHashes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bitsRef = ctx.addReferenceObj("bloomBits", bits, "long[]")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.BloomKernel.mightContain($bitsRef, (long)$c, $numHashes)")
  }

  // Deep value equality over the bit set: case-class equality on an
  // Array field is reference equality, which breaks plan canonicalization
  // and Catalyst's reuse of identical filters (see LshBuckets).
  override def equals(other: Any): Boolean = other match {
    case o: BloomMightContain => child == o.child &&
      numHashes == o.numHashes && java.util.Arrays.equals(bits, o.bits)
    case _ => false
  }
  override def hashCode(): Int = java.util.Objects.hash(
    child, Int.box(numHashes), Int.box(java.util.Arrays.hashCode(bits)))

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "bloom_might_contain"
}

object BloomFunctions {
  def bloomMightContain(key: Column, bits: Array[Long], numHashes: Int): Column =
    columnOf(BloomMightContain(expressionOf(key), bits, numHashes))
}
