package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.{columnOf, expressionOf}
import org.apache.spark.sql.types._

/** Product-quantization kernels (Jégou et al., "Product Quantization for
  * Nearest Neighbor Search", TPAMI 2011): a `dim`-float vector splits
  * into `m` contiguous subspaces of `dim/m` floats; each subspace is
  * vector-quantized against its own `ksub`-entry codebook, so a vector
  * compresses to `m` bytes. Search never reconstructs vectors: a query
  * precomputes one `m × ksub` lookup table of subspace dot products and
  * every candidate scores with `m` table lookups (asymmetric distance
  * computation, ADC) — the 100 TB argument is that candidate scoring
  * reads `m` bytes per vector instead of `4·dim`, a 64× scan-volume cut
  * at the (m=4, dim=64) operating point and 32× at the classical
  * (m=8, ksub=256, dim=64) one.
  *
  * Every kernel accumulates sequentially in double precision, so results
  * are bit-comparable with a DuckDB replay (`list_distance` /
  * `list_dot_product` over `DOUBLE[]` slices — verified empirically):
  *  - encoding picks argmin Euclidean DISTANCE (`Math.sqrt` of the
  *    sequential squared sum — the sqrt is taken so tie behavior matches
  *    SQL's `ORDER BY list_distance`, which compares after the rounding
  *    sqrt applies), ties to the smaller code;
  *  - the ADC sum starts FROM the first table entry (`d0+d1+…`, not
  *    `0.0+d0+…`) so even a `-0.0` total is bit-identical to SQL's
  *    left-associative `+` chain.
  *
  * The codebook matrix rides into codegen as a reference object and into
  * plan equality by DEEP value (the [[LshBuckets]] lesson: reference
  * equality on array fields hides identical scans from Catalyst reuse
  * and breaks `sameResult`).
  */
object PqKernels {

  /** codes(s) = argmin_j dist(vec[s·subDim ..], flat(s·ksub+j)), tie →
    * smaller j. `flat` is the m·ksub codebook entries, subspace-major. */
  def encode(vec: ArrayData, flat: Array[Array[Float]], m: Int,
             ksub: Int): Array[Byte] = {
    val subDim = flat(0).length
    VectorKernels.checkDims(vec.numElements(), m * subDim, "pq_encode")
    val out = new Array[Byte](m)
    var s = 0
    while (s < m) {
      var best = 0
      var bestDist = Double.MaxValue
      var j = 0
      while (j < ksub) {
        val cb = flat(s * ksub + j)
        var acc = 0.0
        var i = 0
        while (i < subDim) {
          val d = vec.getFloat(s * subDim + i).toDouble - cb(i).toDouble
          acc += d * d
          i += 1
        }
        val dist = java.lang.Math.sqrt(acc)
        if (dist < bestDist) { bestDist = dist; best = j }
        j += 1
      }
      out(s) = best.toByte
      s += 1
    }
    out
  }

  /** lut(s·ksub+j) = dot(vec[s·subDim ..], flat(s·ksub+j)) — the per-query
    * ADC table, one kernel call per query vector. */
  def lut(vec: ArrayData, flat: Array[Array[Float]], m: Int,
          ksub: Int): ArrayData = {
    val subDim = flat(0).length
    VectorKernels.checkDims(vec.numElements(), m * subDim, "pq_lut")
    val out = new Array[Double](m * ksub)
    var s = 0
    while (s < m) {
      var j = 0
      while (j < ksub) {
        val cb = flat(s * ksub + j)
        var acc = 0.0
        var i = 0
        while (i < subDim) {
          acc += vec.getFloat(s * subDim + i).toDouble * cb(i).toDouble
          i += 1
        }
        out(s * ksub + j) = acc
        j += 1
      }
      s += 1
    }
    new GenericArrayData(out)
  }

  /** ADC score = Σ_s lut(s·ksub + codes(s)), summed left-to-right starting
    * from the s=0 term. */
  def adc(lut: ArrayData, codes: Array[Byte], m: Int, ksub: Int): Double = {
    VectorKernels.checkDims(lut.numElements(), m * ksub, "pq_adc")
    VectorKernels.checkDims(codes.length, m, "pq_adc codes")
    var acc = lut.getDouble(codes(0) & 0xff)
    var s = 1
    while (s < m) {
      acc += lut.getDouble(s * ksub + (codes(s) & 0xff))
      s += 1
    }
    acc
  }

  def deepEq(a: Array[Array[Float]], b: Array[Array[Float]]): Boolean =
    a.length == b.length &&
      a.indices.forall(i => java.util.Arrays.equals(a(i), b(i)))

  def deepHash(a: Array[Array[Float]]): Int =
    java.util.Arrays.deepHashCode(a.asInstanceOf[Array[AnyRef]])
}

/** pq_encode(vec) → the m-byte code word. */
case class PqEncode(child: Expression, flat: Array[Array[Float]],
                    m: Int, ksub: Int) extends UnaryExpression {
  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"pq_encode requires array<float>, got ${t.sql}")
  }

  override def nullSafeEval(v: Any): Any =
    PqKernels.encode(v.asInstanceOf[ArrayData], flat, m, ksub)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqcb", flat, "float[][]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.PqKernels.encode($c, $ref, $m, $ksub)")
  }

  override def equals(other: Any): Boolean = other match {
    case o: PqEncode => child == o.child && m == o.m && ksub == o.ksub &&
      PqKernels.deepEq(flat, o.flat)
    case _ => false
  }
  override def hashCode(): Int = java.util.Objects.hash(
    child, Int.box(m), Int.box(ksub), Int.box(PqKernels.deepHash(flat)))

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "pq_encode"
}

/** pq_lut(qvec) → the m·ksub-double ADC lookup table for one query. */
case class PqLut(child: Expression, flat: Array[Array[Float]],
                 m: Int, ksub: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"pq_lut requires array<float>, got ${t.sql}")
  }

  override def nullSafeEval(v: Any): Any =
    PqKernels.lut(v.asInstanceOf[ArrayData], flat, m, ksub)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqcb", flat, "float[][]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.PqKernels.lut($c, $ref, $m, $ksub)")
  }

  override def equals(other: Any): Boolean = other match {
    case o: PqLut => child == o.child && m == o.m && ksub == o.ksub &&
      PqKernels.deepEq(flat, o.flat)
    case _ => false
  }
  override def hashCode(): Int = java.util.Objects.hash(
    child, Int.box(m), Int.box(ksub), Int.box(PqKernels.deepHash(flat)))

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "pq_lut"
}

/** pq_adc(lut, codes) → the ADC inner-product score; the hot-path kernel
  * (m array lookups per candidate, no codebook access). */
case class PqAdc(left: Expression, right: Expression, m: Int, ksub: Int)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), BinaryType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"pq_adc requires (array<double>, binary), got ${l.sql} and ${r.sql}")
    }

  override def nullSafeEval(l: Any, r: Any): Any =
    PqKernels.adc(l.asInstanceOf[ArrayData], r.asInstanceOf[Array[Byte]],
      m, ksub)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (l, r) =>
      s"graft.functions.PqKernels.adc($l, $r, $m, $ksub)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
  override def prettyName: String = "pq_adc"
}

/** binary → array<tinyint>: exposes a code word's bytes to relational
  * ops (training's per-subspace regrouping, specs). */
case class BinaryBytes(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(ByteType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"binary_bytes requires binary, got ${t.sql}")
  }

  override def nullSafeEval(v: Any): Any =
    new GenericArrayData(v.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData($c)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "binary_bytes"
}

object PqFunctions {
  def pqEncode(vec: Column, flat: Array[Array[Float]], m: Int, ksub: Int): Column =
    columnOf(PqEncode(expressionOf(vec), flat, m, ksub))

  def pqLut(vec: Column, flat: Array[Array[Float]], m: Int, ksub: Int): Column =
    columnOf(PqLut(expressionOf(vec), flat, m, ksub))

  def pqAdc(lut: Column, codes: Column, m: Int, ksub: Int): Column =
    columnOf(PqAdc(expressionOf(lut), expressionOf(codes), m, ksub))

  def binaryBytes(codes: Column): Column =
    columnOf(BinaryBytes(expressionOf(codes)))
}
