package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit SimHash of a document, one pass per row: tokenize on whitespace
  * (lowercased), hash each distinct token to 64 bits, accumulate ±1 votes
  * per bit, keep the sign. Equivalent to the explode → 64-bit-sum → regroup
  * DataFrame formulation but with no shuffle and no per-token rows.
  *
  * Token hashing is a 64-bit polynomial hash finalized with a splitmix64
  * mix — self-consistent within the engine (near-dup detection only needs
  * a fixed hash family, not cross-engine parity).
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash64 expects string, got ${other.simpleString}")
  }
  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(input: Any): Any =
    SimHash64.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SimHash64.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {

  private def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  def compute(input: UTF8String): Long = {
    val s = input.toString.toLowerCase
    val votes = new Array[Int](64)
    val seen = new java.util.HashSet[Long]()
    var i = 0
    val len = s.length
    while (i < len) {
      while (i < len && Character.isWhitespace(s.charAt(i))) i += 1
      var h = 1125899906842597L // polynomial accumulator over the token
      val start = i
      while (i < len && !Character.isWhitespace(s.charAt(i))) {
        h = h * 31 + s.charAt(i)
        i += 1
      }
      if (i > start && seen.add(h)) {     // distinct tokens vote once
        val th = mix64(h)
        var b = 0
        while (b < 64) {
          if (((th >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
    }
    var sig = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) sig |= (1L << b); b += 1 }
    sig
  }

  def simhash64(text: Column): Column = {
    import org.apache.spark.sql.graft.Bridge
    Bridge.column(SimHash64(Bridge.expression(text)))
  }
}
