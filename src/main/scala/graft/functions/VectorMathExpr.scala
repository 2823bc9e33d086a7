package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native vector kernels for the pairwise hot path (ANN scoring, embedding
  * near-dup verify). The Column formulation
  * `aggregate(zip_with(a,b,_*_), 0.0, _+_)` allocates a zipped intermediate
  * array and interprets the lambda per element — fine for per-ROW stats, but
  * the ANN/near-dup operators evaluate cosine per candidate PAIR, where the
  * interpreted HOF pipeline dominates the query (same pathology as the
  * MinHash kernel, [[MinHashSig]]).
  *
  * Arithmetic matches the HOF/DuckDB formulation bit-for-bit: every element
  * cast to double, strict left-to-right accumulation, so swapping kernels
  * never changes a rounded gate output.
  */
abstract class PairwiseVectorExpr extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(FloatType | DoubleType, _), ArrayType(FloatType | DoubleType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"expects (array<float|double>, array<float|double>), got (${l.simpleString}, ${r.simpleString})")
  }
  override def dataType: DataType = DoubleType

  @transient protected lazy val leftIsFloat = left.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  @transient protected lazy val rightIsFloat = right.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
}

/** `cosine(a, b)` = dot(a,b) / (||a||·||b||) in one pass over the two arrays.
  * Null out (like Spark's `Divide`) when either norm is zero; null when the
  * arrays differ in length or contain a null element (what the `zip_with`
  * formulation yields in those cases).
  */
case class CosineSim(left: Expression, right: Expression) extends PairwiseVectorExpr {

  override def nullSafeEval(a: Any, b: Any): Any =
    VectorMath.cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      leftIsFloat, rightIsFloat)

  // result can be null even for non-null inputs (zero norm / length mismatch)
  override def nullable: Boolean = true

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val resultTerm = ctx.freshName("cosResult")
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      Double $resultTerm = graft.functions.VectorMath.cosine($a, $b, $leftIsFloat, $rightIsFloat);
      if ($resultTerm == null) { ${ev.isNull} = true; } else { ${ev.value} = $resultTerm.doubleValue(); }
    """)
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineSim =
    copy(left = l, right = r)
}

/** `dot(a, b)` with the same cast/order/null semantics as [[CosineSim]]. */
case class DotProduct(left: Expression, right: Expression) extends PairwiseVectorExpr {

  override def nullSafeEval(a: Any, b: Any): Any =
    VectorMath.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      leftIsFloat, rightIsFloat)

  override def nullable: Boolean = true

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val resultTerm = ctx.freshName("dotResult")
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      Double $resultTerm = graft.functions.VectorMath.dot($a, $b, $leftIsFloat, $rightIsFloat);
      if ($resultTerm == null) { ${ev.isNull} = true; } else { ${ev.value} = $resultTerm.doubleValue(); }
    """)
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotProduct =
    copy(left = l, right = r)
}

object VectorMath {
  import org.apache.spark.sql.graft.Bridge

  def cosineSim(a: Column, b: Column): Column =
    Bridge.column(CosineSim(Bridge.expression(a), Bridge.expression(b)))

  def dotProduct(a: Column, b: Column): Column =
    Bridge.column(DotProduct(Bridge.expression(a), Bridge.expression(b)))

  @inline private def elem(v: ArrayData, i: Int, isFloat: Boolean): Double =
    if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)

  private def hasNullElement(v: ArrayData, n: Int): Boolean = {
    var i = 0
    while (i < n) { if (v.isNullAt(i)) return true; i += 1 }
    false
  }

  /** Boxed so codegen/interpreted share one null convention. */
  def dot(a: ArrayData, b: ArrayData, aFloat: Boolean, bFloat: Boolean): java.lang.Double = {
    val n = a.numElements()
    if (b.numElements() != n) return null // zip_with pads with null → null sum
    if (hasNullElement(a, n) || hasNullElement(b, n)) return null
    var acc = 0.0
    var i = 0
    while (i < n) { acc += elem(a, i, aFloat) * elem(b, i, bFloat); i += 1 }
    java.lang.Double.valueOf(acc)
  }

  def cosine(a: ArrayData, b: ArrayData, aFloat: Boolean, bFloat: Boolean): java.lang.Double = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    if (hasNullElement(a, n) || hasNullElement(b, n)) return null
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val x = elem(a, i, aFloat)
      val y = elem(b, i, bFloat)
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom == 0.0) null else java.lang.Double.valueOf(dot / denom) // Divide-by-zero → null, like Spark SQL
  }
}
