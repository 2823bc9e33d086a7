package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Rolling (Karp–Rabin) shingle hashing: lowercases + collapses whitespace,
  * then emits the polynomial hash of every `n`-char window in one O(len)
  * pass — the allocation-free replacement for materializing each window as
  * a string and hashing it separately (O(len × n) and two UTF8String
  * allocations per window). Output: array<long> of DISTINCT window hashes,
  * folded to 31 bits so they compose with the MinHash permutation family.
  *
  * This is also the reference-engine's "document fingerprint via rolling
  * hash" primitive: `array_min` of the output is a cheap order-sensitive
  * fingerprint.
  */
case class ShingleHashes(child: Expression, n: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"shingle_hashes expects string, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(input: Any): Any =
    ShingleHashes.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ShingleHashes.compute($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

object ShingleHashes {
  private val B = 1000003L        // polynomial base
  private val M = 0x7fffffffL     // fold to [0, 2^31) for the minhash family

  def compute(input: UTF8String, n: Int): ArrayData = {
    // normalize: lowercase, collapse whitespace runs to single spaces
    val raw = input.toString.toLowerCase
    val sb = new java.lang.StringBuilder(raw.length)
    var i = 0
    var lastSpace = false
    while (i < raw.length) {
      val c = raw.charAt(i)
      val isSpace = Character.isWhitespace(c)
      if (!isSpace) { sb.append(c); lastSpace = false }
      else if (!lastSpace) { sb.append(' '); lastSpace = true }
      i += 1
    }
    val s = sb
    val len = s.length
    if (len == 0) return new GenericArrayData(Array(0L))
    if (len < n) {
      // whole string as the single shingle (mirrors charShingles' edge case)
      var h = 0L
      var j = 0
      while (j < len) { h = (h * B + s.charAt(j)) & M; j += 1 }
      return new GenericArrayData(Array(h))
    }
    // rolling: h_{i+1} = (h_i - s[i]·B^(n-1))·B + s[i+n]
    var pow = 1L
    var k = 0
    while (k < n - 1) { pow = (pow * B) & M; k += 1 }
    val seen = new java.util.HashSet[Long](len * 2)
    val out = new Array[Long](len - n + 1)
    var cnt = 0
    var h = 0L
    var j = 0
    while (j < n) { h = (h * B + s.charAt(j)) & M; j += 1 }
    if (seen.add(h)) { out(cnt) = h; cnt += 1 }
    var start = 1
    while (start <= len - n) {
      h = ((h - ((s.charAt(start - 1) * pow) & M) + (M + 1)) * B + s.charAt(start + n - 1)) & M
      if (seen.add(h)) { out(cnt) = h; cnt += 1 }
      start += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, cnt))
  }

  def shingleHashes(text: Column, n: Int): Column = {
    import org.apache.spark.sql.graft.Bridge
    Bridge.column(ShingleHashes(Bridge.expression(text), n))
  }
}
