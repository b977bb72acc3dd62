package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.{columnOf, expressionOf}
import org.apache.spark.sql.types._

/** Single-pass sketch kernels. The HOF formulations
  * (`transform(sh, s => xxhash64(i, s))` × numHashes, or one `DotProduct`
  * column per hyperplane) evaluate interpreted lambdas or explode codegen
  * with thousands of literal constants — measured at 18s/5s per query at
  * sf0.1. These expressions compute the whole sketch in one fused loop via
  * a static kernel, with parameters passed as codegen reference objects. */
object SketchKernels {

  /** splitmix64 finalizer — a full-avalanche 64-bit mixer. */
  @inline def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  def minHashSeeds(numHashes: Int): Array[Long] =
    Array.tabulate(numHashes)(i => mix64(0x5eed0000L + i))

  /** MinHash sketch: mins(i) = min over elements of mix64(elem ^ seed(i)).
    * One pass over the element array, all hash lanes updated per element. */
  def minHash(arr: ArrayData, seeds: Array[Long]): ArrayData = {
    val num = seeds.length
    val mins = Array.fill(num)(Long.MaxValue)
    val n = arr.numElements()
    var e = 0
    while (e < n) {
      val v = arr.getLong(e)
      var i = 0
      while (i < num) {
        val h = mix64(v ^ seeds(i))
        if (h < mins(i)) mins(i) = h
        i += 1
      }
      e += 1
    }
    new GenericArrayData(mins)
  }

  /** Indices of the `n` nearest centroids by cosine, ascending by
    * (-cosine, index) — one pass over the centroid matrix per row.
    * Backs the IVF index: corpus rows take n=1 (their cell), queries
    * take n=nprobe (cells to search). */
  def nearestCentroids(vec: ArrayData, centroids: Array[Array[Float]],
                       n: Int): ArrayData = {
    val k = centroids.length
    val sims = new Array[Double](k)
    var c = 0
    while (c < k) {
      val cent = centroids(c)
      VectorKernels.checkDims(vec.numElements(), cent.length, "nearest_centroids")
      val dim = cent.length
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var d = 0
      while (d < dim) {
        val x = vec.getFloat(d).toDouble
        val y = cent(d).toDouble
        dot += x * y; na += x * x; nb += y * y
        d += 1
      }
      val denom = math.sqrt(na) * math.sqrt(nb)
      sims(c) = if (denom == 0.0) -2.0 else dot / denom
      c += 1
    }
    val order = Array.range(0, k).sortBy(i => (-sims(i), i)).take(math.min(n, k))
    new GenericArrayData(order.map(_.toLong))
  }

  /** Sign-bit LSH band buckets: planes is a row-major
    * `(bands*bitsPerBand) × dim` float matrix; output = one long bucket
    * per band, bit i of band b = sign(vec · planes(b*bits+i)). All dots
    * computed in one pass over the plane matrix. */
  def lshBuckets(vec: ArrayData, planes: Array[Array[Float]],
                 bands: Int, bitsPerBand: Int): ArrayData = {
    val dim = if (planes.isEmpty) 0 else planes(0).length
    if (planes.nonEmpty)
      VectorKernels.checkDims(vec.numElements(), dim, "lsh_buckets")
    val out = new Array[Long](bands)
    var p = 0
    while (p < bands * bitsPerBand) {
      val plane = planes(p)
      var dot = 0.0
      var d = 0
      while (d < dim) {
        dot += vec.getFloat(d).toDouble * plane(d).toDouble
        d += 1
      }
      if (dot > 0.0) out(p / bitsPerBand) |= 1L << (p % bitsPerBand)
      p += 1
    }
    new GenericArrayData(out)
  }

  /** Symmetric int8 quantization codes as floats (every value in
    * [-127, 127] is float-exact): floor(x·127/max|x| + 0.5) with the
    * arithmetic in double — the exact sequence of the column-expression
    * formulation (`x.cast(double) * 127.0 / array_max(abs(...))`), so
    * codes agree bit-for-bit with the x37 storage quantizer. A zero
    * vector encodes to all zeros. */
  def sq8Encode(vec: ArrayData): ArrayData = {
    val n = vec.numElements()
    var mx = 0.0
    var i = 0
    while (i < n) {
      val a = math.abs(vec.getFloat(i).toDouble)
      if (a > mx) mx = a
      i += 1
    }
    val out = new Array[Float](n)
    if (mx != 0.0) {
      i = 0
      while (i < n) {
        out(i) = math.floor(vec.getFloat(i).toDouble * 127.0 / mx + 0.5).toFloat
        i += 1
      }
    }
    new GenericArrayData(out)
  }

  /** [[sq8Encode]] packed as SIGNED BYTES — the at-rest form (1 byte
    * per dimension, the 4x compression the SQ8 index layer stores).
    * Same arithmetic, so a byte here always equals the float code. */
  def sq8EncodeBytes(vec: ArrayData): Array[Byte] = {
    val n = vec.numElements()
    var mx = 0.0
    var i = 0
    while (i < n) {
      val a = math.abs(vec.getFloat(i).toDouble)
      if (a > mx) mx = a
      i += 1
    }
    val out = new Array[Byte](n)
    if (mx != 0.0) {
      i = 0
      while (i < n) {
        out(i) = math.floor(vec.getFloat(i).toDouble * 127.0 / mx + 0.5).toByte
        i += 1
      }
    }
    out
  }

  /** Quantized cosine over two byte-code words: integer dot and
    * self-dots accumulated in LONG (exact — |code| ≤ 127), then the
    * exact combine sequence of [[CosineSimilarity]]: denom =
    * sqrt(na)·sqrt(nb), zero denominator → 0.0. long→double widenings
    * are exact below 2^53, so this equals the float-codes path through
    * the cosine kernel bit for bit. */
  def sq8Cos(a: Array[Byte], b: Array[Byte]): Double = {
    VectorKernels.checkDims(a.length, b.length, "sq8_cos")
    var dot = 0L
    var na = 0L
    var nb = 0L
    var i = 0
    while (i < a.length) {
      val x = a(i).toLong
      val y = b(i).toLong
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    val denom = math.sqrt(na.toDouble) * math.sqrt(nb.toDouble)
    if (denom == 0.0) 0.0 else dot.toDouble / denom
  }

  /** Johnson–Lindenstrauss projection: out(p) = (vec · planes(p)) / div,
    * dots accumulated in double over index order (the exact association
    * DuckDB's `list_dot_product` uses, so the oracle replays bit-for-bit).
    * With iid N(0,1) planes and div = sqrt(outDim) this is the classical
    * JL map: pairwise distances distort by 1±ε w.h.p. for
    * outDim = O(log n / ε²). */
  def planeProject(vec: ArrayData, planes: Array[Array[Float]],
                   div: Double): ArrayData = {
    val dim = if (planes.isEmpty) 0 else planes(0).length
    if (planes.nonEmpty)
      VectorKernels.checkDims(vec.numElements(), dim, "plane_project")
    val out = new Array[Double](planes.length)
    var p = 0
    while (p < planes.length) {
      val plane = planes(p)
      var dot = 0.0
      var d = 0
      while (d < dim) {
        dot += vec.getFloat(d).toDouble * plane(d).toDouble
        d += 1
      }
      out(p) = dot / div
      p += 1
    }
    new GenericArrayData(out)
  }
}

/** hash = sample_hash(id): splitmix64 of (id ^ salt) — the deterministic
  * inclusion hash behind [[graft.operators.Sampling]]. A pure function of
  * (id, seed): the same row is kept or dropped identically on every
  * executor, every run, every engine (the DuckDB oracle reproduces it
  * bit-for-bit), unlike `rand(seed)`, which is only stable for a fixed
  * partitioning. */
case class SampleHash(child: Expression, salt: Long) extends UnaryExpression {
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"sample_hash requires bigint, got ${t.sql}")
  }

  override def nullSafeEval(v: Any): Any =
    SketchKernels.mix64(v.asInstanceOf[Long] ^ salt)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.SketchKernels.mix64($c ^ ${salt}L)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "sample_hash"
}

/** sketch = minhash_sketch(hashedShingles, numHashes): array<long>. */
case class MinHashSketch(child: Expression, numHashes: Int)
    extends UnaryExpression {
  private lazy val seeds = SketchKernels.minHashSeeds(numHashes)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"minhash_sketch requires array<bigint>, got ${t.sql}")
  }

  override def nullSafeEval(v: Any): Any =
    SketchKernels.minHash(v.asInstanceOf[ArrayData], seeds)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val seedsRef = ctx.addReferenceObj("seeds", seeds, "long[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.SketchKernels.minHash($c, $seedsRef)")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "minhash_sketch"
}

/** buckets = lsh_buckets(embedding): array<long>, one bucket per band. */
case class LshBuckets(child: Expression, planes: Array[Array[Float]],
                      bands: Int, bitsPerBand: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"lsh_buckets requires array<float>, got ${t.sql}")
  }

  override def nullSafeEval(v: Any): Any =
    SketchKernels.lshBuckets(v.asInstanceOf[ArrayData], planes, bands, bitsPerBand)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("planes", planes, "float[][]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.SketchKernels.lshBuckets($c, $planesRef, $bands, $bitsPerBand)")
  }

  // Case-class equality on an Array field is REFERENCE equality, so two
  // independently built but numerically identical plane matrices (the
  // generator is deterministic) compared unequal — making twin plans
  // report "different" under canonicalization and hiding identical scans
  // from Catalyst's exchange/subquery reuse. Deep value equality restores
  // both.
  override def equals(other: Any): Boolean = other match {
    case o: LshBuckets => child == o.child && bands == o.bands &&
      bitsPerBand == o.bitsPerBand && planes.length == o.planes.length &&
      planes.indices.forall(i => java.util.Arrays.equals(planes(i), o.planes(i)))
    case _ => false
  }
  override def hashCode(): Int = java.util.Objects.hash(
    child, Int.box(bands), Int.box(bitsPerBand),
    Int.box(java.util.Arrays.deepHashCode(planes.asInstanceOf[Array[AnyRef]])))

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "lsh_buckets"
}

/** cells = nearest_centroids(embedding): array<long> of centroid indices,
  * best-first (n=1 for corpus assignment, n=nprobe for query probing). */
case class NearestCentroids(child: Expression, centroids: Array[Array[Float]],
                            n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"nearest_centroids requires array<float>, got ${t.sql}")
  }

  override def nullSafeEval(v: Any): Any =
    SketchKernels.nearestCentroids(v.asInstanceOf[ArrayData], centroids, n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("centroids", centroids, "float[][]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.SketchKernels.nearestCentroids($c, $ref, $n)")
  }

  // Deep value equality over the centroid matrix — see [[LshBuckets]].
  override def equals(other: Any): Boolean = other match {
    case o: NearestCentroids => child == o.child && n == o.n &&
      centroids.length == o.centroids.length &&
      centroids.indices.forall(i =>
        java.util.Arrays.equals(centroids(i), o.centroids(i)))
    case _ => false
  }
  override def hashCode(): Int = java.util.Objects.hash(
    child, Int.box(n),
    Int.box(java.util.Arrays.deepHashCode(centroids.asInstanceOf[Array[AnyRef]])))

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "nearest_centroids"
}

/** projected = plane_project(embedding): array<double> of plane dots
  * scaled by 1/div — the JL random-projection map. Like [[LshBuckets]],
  * the plane matrix ships as a codegen reference object and compares by
  * deep value so twin plans canonicalize equal. */
case class PlaneProject(child: Expression, planes: Array[Array[Float]],
                        div: Double) extends UnaryExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"plane_project requires array<float>, got ${t.sql}")
  }

  override def nullSafeEval(v: Any): Any =
    SketchKernels.planeProject(v.asInstanceOf[ArrayData], planes, div)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("planes", planes, "float[][]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.SketchKernels.planeProject($c, $planesRef, ${div}D)")
  }

  // Deep value equality over the plane matrix — see [[LshBuckets]].
  override def equals(other: Any): Boolean = other match {
    case o: PlaneProject => child == o.child && div == o.div &&
      planes.length == o.planes.length &&
      planes.indices.forall(i => java.util.Arrays.equals(planes(i), o.planes(i)))
    case _ => false
  }
  override def hashCode(): Int = java.util.Objects.hash(
    child, Double.box(div),
    Int.box(java.util.Arrays.deepHashCode(planes.asInstanceOf[Array[AnyRef]])))

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "plane_project"
}

/** codes = sq8_encode(embedding): array<float> of int8 quantization
  * codes — the fused single-pass form of the max-abs/floor column
  * expressions ([[SketchKernels.sq8Encode]]). */
case class Sq8Encode(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"sq8_encode requires array<float>, got ${t.sql}")
  }

  override def nullSafeEval(v: Any): Any =
    SketchKernels.sq8Encode(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SketchKernels.sq8Encode($c)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "sq8_encode"
}

/** codes8 = sq8_encode_bytes(embedding): BINARY of one signed byte per
  * dimension — the at-rest SQ8 code word ([[SketchKernels.sq8EncodeBytes]]). */
case class Sq8EncodeBytes(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"sq8_encode_bytes requires array<float>, got ${t.sql}")
  }

  override def nullSafeEval(v: Any): Any =
    SketchKernels.sq8EncodeBytes(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SketchKernels.sq8EncodeBytes($c)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "sq8_encode_bytes"
}

/** score = sq8_cos(codes8_a, codes8_b): the quantized cosine over two
  * byte code words ([[SketchKernels.sq8Cos]]) — integer-exact sums,
  * the cosine kernel's combine, zero vectors score 0. */
case class Sq8Cosine(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, BinaryType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"sq8_cos requires (binary, binary), got (${l.sql}, ${r.sql})")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    SketchKernels.sq8Cos(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.SketchKernels.sq8Cos($a, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
  override def prettyName: String = "sq8_cos"
}

object SketchFunctions {
  def minHashSketch(hashedShingles: Column, numHashes: Int): Column =
    columnOf(MinHashSketch(expressionOf(hashedShingles), numHashes))

  /** splitmix64(id ^ splitmix64(seed)) — the salt is pre-mixed so nearby
    * seeds give statistically independent sample sets. */
  def sampleHash(id: Column, seed: Long): Column =
    columnOf(SampleHash(expressionOf(id), SketchKernels.mix64(seed)))

  def lshBuckets(vec: Column, planes: Array[Array[Float]],
                 bands: Int, bitsPerBand: Int): Column =
    columnOf(LshBuckets(expressionOf(vec), planes, bands, bitsPerBand))

  def nearestCentroids(vec: Column, centroids: Array[Array[Float]], n: Int): Column =
    columnOf(NearestCentroids(expressionOf(vec), centroids, n))

  def planeProject(vec: Column, planes: Array[Array[Float]], div: Double): Column =
    columnOf(PlaneProject(expressionOf(vec), planes, div))

  def sq8Encode(vec: Column): Column =
    columnOf(Sq8Encode(expressionOf(vec)))

  def sq8EncodeBytes(vec: Column): Column =
    columnOf(Sq8EncodeBytes(expressionOf(vec)))

  def sq8Cos(a: Column, b: Column): Column =
    columnOf(Sq8Cosine(expressionOf(a), expressionOf(b)))
}
