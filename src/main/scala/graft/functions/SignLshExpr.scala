package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Native sign-LSH bucketing: project the input vector onto `bands × bits`
  * random hyperplanes (deterministic seed) and pack each band's sign bits
  * into one long bucket key. Output: array<long> of length `bands`.
  *
  * One expression evaluation replaces `bands × bits` interpreted
  * `aggregate(zip_with(...))` pipelines per row (the formulation this
  * engine used first — same pathology as the MinHash kernel: per-element
  * lambda interpretation with boxing).
  */
case class SignLshBuckets(child: Expression, dim: Int, bands: Int, bits: Int, seed: Long)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"sign_lsh expects array<float|double>, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable

  // lazy: consulted only after analysis (child is unresolved at construction)
  @transient private lazy val isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  // planes[band*bits + bit][d] flattened row-major; built once per plan
  @transient private lazy val planes: Array[Double] =
    SignLshBuckets.planes(dim, bands, bits, seed)

  override def nullSafeEval(input: Any): Any =
    SignLshBuckets.compute(input.asInstanceOf[ArrayData], planes, dim, bands, bits, isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("planes", planes, "double[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SignLshBuckets.compute($c, $planesRef, $dim, $bands, $bits, $isFloat);")
  }

  override protected def withNewChildInternal(newChild: Expression): SignLshBuckets =
    copy(child = newChild)
}

object SignLshBuckets {

  def planes(dim: Int, bands: Int, bits: Int, seed: Long): Array[Double] = {
    val out = new Array[Double]((bands * bits) * dim)
    // per-band seeding matches VectorOps.hyperplanes(seed + band) so the
    // expression and the Column formulation bucket identically
    var b = 0
    while (b < bands) {
      val rnd = new scala.util.Random(seed + b)
      var i = 0
      while (i < bits) {
        var d = 0
        while (d < dim) { out((b * bits + i) * dim + d) = rnd.nextGaussian(); d += 1 }
        i += 1
      }
      b += 1
    }
    out
  }

  def compute(vec: ArrayData, planes: Array[Double], dim: Int, bands: Int, bits: Int,
              isFloat: Boolean): ArrayData = {
    val n = math.min(vec.numElements(), dim)
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var key = 0L
      var i = 0
      while (i < bits) {
        val base = (b * bits + i) * dim
        var proj = 0.0
        var d = 0
        while (d < n) {
          val v = if (isFloat) vec.getFloat(d).toDouble else vec.getDouble(d)
          proj += planes(base + d) * v
          d += 1
        }
        if (proj >= 0) key |= (1L << i)
        i += 1
      }
      out(b) = key
      b += 1
    }
    new GenericArrayData(out)
  }

  def signLsh(vec: Column, dim: Int, bands: Int, bits: Int, seed: Long = 42L): Column = {
    import org.apache.spark.sql.graft.Bridge
    Bridge.column(SignLshBuckets(Bridge.expression(vec), dim, bands, bits, seed))
  }
}
