package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expression computing a MinHash signature from an array of
  * (already murmur-hashed) shingle values: for each of `numHashes`
  * permutations hᵢ(x) = (aᵢ·x + bᵢ) mod p, the minimum over the input array.
  *
  * Why an Expression and not higher-order functions: `array(128 ×
  * array_min(transform(...)))` evaluates 128 interpreted lambda pipelines
  * with per-element boxing — measured minutes on 5k docs. This kernel is a
  * primitive long loop (numHashes × |shingles| multiply-mod), stays inside
  * whole-stage codegen via a static call, and allocates one output array.
  * Preference order per the engine's design rules: built-ins first, native
  * Expression second (this), UDF last.
  */
case class MinHashSig(child: Expression, numHashes: Int, seed: Long)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig expects array<bigint>, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable

  @transient private lazy val coefs: Array[Long] = MinHashSig.coefficients(numHashes, seed)

  override def nullSafeEval(input: Any): Any =
    MinHashSig.compute(input.asInstanceOf[ArrayData], coefs)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val coefRef = ctx.addReferenceObj("coefs", coefs, "long[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.MinHashSig.compute($c, $coefRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {
  /** Mersenne prime 2^31−1: (a·x + b) mod p is a universal hash family for
    * 31-bit values; murmur32 outputs are folded into [0, p).
    */
  val P: Long = 2147483647L

  def coefficients(numHashes: Int, seed: Long): Array[Long] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(numHashes * 2) {
      // a ∈ [1, p); b ∈ [0, p)
      val v = rnd.nextInt(Int.MaxValue).toLong
      v
    }.zipWithIndex.map { case (v, i) => if (i % 2 == 0 && v == 0) 1L else v }
  }

  /** The hot loop: for each permutation i, min over shingle hashes of
    * (a_i·x + b_i) mod p. Called from generated code — keep it static,
    * primitive, allocation-free except the result.
    */
  def compute(hashes: ArrayData, coefs: Array[Long]): ArrayData = {
    val n = hashes.numElements()
    val k = coefs.length / 2
    val out = new Array[Long](k)
    var i = 0
    while (i < k) {
      val a = coefs(2 * i); val b = coefs(2 * i + 1)
      var min = Long.MaxValue
      var j = 0
      while (j < n) {
        val x = hashes.getLong(j) & 0x7fffffffL // fold murmur32 into [0, p)
        val v = (a * x + b) % P
        if (v < min) min = v
        j += 1
      }
      out(i) = min
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Column API. `hashedShingles` must be array<long> (e.g.
    * `transform(shingles, s -> cast(hash(s) as long))`).
    */
  def minhashSig(hashedShingles: Column, numHashes: Int, seed: Long = 42L): Column = {
    import org.apache.spark.sql.graft.Bridge
    Bridge.column(MinHashSig(Bridge.expression(hashedShingles), numHashes, seed))
  }
}
