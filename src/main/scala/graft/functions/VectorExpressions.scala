package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.{columnOf, expressionOf}
import org.apache.spark.sql.types._
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}

/** Codegen'd vector kernels over `array<float>` embedding columns.
  *
  * The built-in higher-order-function formulation
  * (`aggregate(zip_with(a, b, (x, y) => x * y), 0D, (acc, v) => acc + v)`)
  * allocates an intermediate array per row and evaluates the lambda
  * interpreted per element — per-row overhead that dominates at
  * 100 TB × 10⁹ similarity pairs. These expressions instead emit a tight
  * Java loop into whole-stage codegen (no allocation, no virtual calls),
  * with an interpreted `nullSafeEval` fallback kept semantically identical.
  * This is the single custom-Expression case SURVEY.md §4.2/§7.3 budgets
  * for; accumulation is in double precision, sequential element order, so
  * results are bit-comparable with the DuckDB oracle's list functions —
  * including on errors: mismatched vector dimensions raise (as DuckDB's
  * `list_cosine_similarity` does) rather than silently truncating, so a
  * data-dimension bug can never be masked.
  */
/** Static helpers callable from both interpreted eval and generated code. */
object VectorKernels {
  /** Strict dimension gate — mirrors DuckDB's list-function behavior so
    * the oracle gate and the engine fail identically on bad data. */
  def checkDims(a: Int, b: Int, op: String): Unit =
    if (a != b) throw new IllegalArgumentException(
      s"$op: vector dimension mismatch ($a vs $b)")
}

abstract class VectorBinaryExpression extends BinaryExpression {
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<float> arguments, got ${l.sql} and ${r.sql}")
    }

  /** (dot, normA, normB) → result. */
  protected def combine(dot: Double, na: Double, nb: Double): Double
  /** Java expression over the generated accumulator variable names. */
  protected def combineCode(dot: String, na: String, nb: String): String

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    VectorKernels.checkDims(a.numElements(), b.numElements(), prettyName)
    val n = a.numElements()
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    combine(dot, na, nb)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val dot = ctx.freshName("dot"); val na = ctx.freshName("na")
      val nb = ctx.freshName("nb"); val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val body = combineCode(dot, na, nb)
      s"""
         |graft.functions.VectorKernels.checkDims(
         |  $a.numElements(), $b.numElements(), "$prettyName");
         |final int $n = $a.numElements();
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  final double $x = (double) $a.getFloat($i);
         |  final double $y = (double) $b.getFloat($i);
         |  $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |}
         |${ev.value} = $body;
       """.stripMargin
    })
}

/** cosine(a, b) = a·b / (|a|·|b|); 0.0 for a zero vector. */
case class CosineSimilarity(left: Expression, right: Expression)
    extends VectorBinaryExpression {
  override protected def combine(dot: Double, na: Double, nb: Double): Double = {
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom == 0.0) 0.0 else dot / denom
  }
  override protected def combineCode(dot: String, na: String, nb: String): String =
    s"((java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb)) == 0.0) ? 0.0 : " +
      s"($dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb)))"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
  override def prettyName: String = "cosine_sim"
}

/** Plain dot product a·b in double precision. */
case class DotProduct(left: Expression, right: Expression)
    extends VectorBinaryExpression {
  override protected def combine(dot: Double, na: Double, nb: Double): Double = dot
  override protected def combineCode(dot: String, na: String, nb: String): String = dot
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
  override def prettyName: String = "dot_product"
}

/** Column-level API + SQL registration for the vector kernels. */
object VectorFunctions {

  def cosineSim(a: Column, b: Column): Column =
    columnOf(CosineSimilarity(expressionOf(a), expressionOf(b)))

  def dotProduct(a: Column, b: Column): Column =
    columnOf(DotProduct(expressionOf(a), expressionOf(b)))

  /** Register `cosine_sim` / `dot_product` for SQL use in an existing
    * session (the extension-free path). */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_sim", exprs => CosineSimilarity(exprs.head, exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "dot_product", exprs => DotProduct(exprs.head, exprs(1)), "built-in")
  }
}

/** `SparkSessionExtensions` installer: makes the vector kernels available
  * in every session built with
  * `.withExtensions(new GraftExtensions)` or via
  * `spark.sql.extensions=graft.functions.GraftExtensions`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      (exprs: Seq[Expression]) => CosineSimilarity(exprs.head, exprs(1))))
    e.injectFunction((
      FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      (exprs: Seq[Expression]) => DotProduct(exprs.head, exprs(1))))
  }
}
