package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.util.{GenericArrayData, SQLOrderingUtil, TypeUtils}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Bounded top-k as a NATIVE aggregate — the scale-correct form of the
  * `row_number() OVER (PARTITION BY g ORDER BY score DESC, id)` + `rank <= k`
  * idiom every ANN tier used. The window form shuffles EVERY scored
  * candidate row to its group's partition before ranking: at 1M queries ×
  * nprobe cells × ~1k vectors/cell that exchange carries billions of rows
  * of which all but k per query are discarded on arrival. As a
  * [[TypedImperativeAggregate]] the ranking runs inside hash aggregation,
  * so the PARTIAL aggregate keeps at most k entries per group per map
  * partition and the exchange carries one ≤k-entry binary buffer per
  * (group, partition) — candidate-count-independent shuffle, the
  * map-side-combine shape a 100 TB ANN join needs.
  *
  * Ordering is EXACTLY the window idiom's: score descending with nulls
  * LAST (Spark's `desc` default), [[SQLOrderingUtil.compareDoubles]]
  * double semantics (±0.0 equal, NaN greatest), ties by id ascending with
  * nulls FIRST (Spark's `asc` default). With a (score, id)-unique input —
  * every ANN caller: one scored row per (query, neighbor) — the kept SET
  * is bit-identical to the window's, which keeps the DuckDB
  * `row_number()` replay oracles green across the swap.
  *
  * Returns `array<struct<id, score>>` in rank order (best first);
  * `posexplode` + `pos + 1` reconstructs the rank column. Ids may be
  * int/long/string (the gate surfaces); scores are the double the caller
  * already rounded.
  */
case class TopKPairs(score: Expression, id: Expression, k: Int,
                     mutableAggBufferOffset: Int = 0,
                     inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKBuffer] {
  require(k >= 1, s"TopKPairs: k must be >= 1, got $k")

  override def children: Seq[Expression] = Seq(score, id)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): TopKPairs =
    copy(score = c(0), id = c(1))

  override def checkInputDataTypes(): TypeCheckResult = (score.dataType, id.dataType) match {
    case (DoubleType, IntegerType | LongType | StringType) => TypeCheckResult.TypeCheckSuccess
    case (s, i) => TypeCheckResult.TypeCheckFailure(
      s"expects (double, int|bigint|string), got (${s.simpleString}, ${i.simpleString})")
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("id", id.dataType, nullable = id.nullable),
    StructField("score", DoubleType, nullable = true))), containsNull = false)
  override def nullable: Boolean = false

  @transient private lazy val idOrdering = TypeUtils.getInterpretedOrdering(id.dataType)

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k, idOrdering)

  override def update(buf: TopKBuffer, input: InternalRow): TopKBuffer = {
    val s = score.eval(input)
    // UnsafeRow-backed UTF8Strings are views over a reused buffer — copy
    // anything that outlives this eval (the collect_list discipline)
    val i = id.eval(input) match {
      case u: UTF8String => u.clone()
      case other => other
    }
    buf.insert(s.asInstanceOf[java.lang.Double], i)
    buf
  }

  override def merge(buf: TopKBuffer, other: TopKBuffer): TopKBuffer = {
    var j = 0
    while (j < other.n) { buf.insert(other.scores(j), other.ids(j)); j += 1 }
    buf
  }

  override def eval(buf: TopKBuffer): Any = {
    val out = new Array[Any](buf.n)
    var j = 0
    while (j < buf.n) {
      out(j) = new GenericInternalRow(Array[Any](buf.ids(j), buf.scores(j)))
      j += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: TopKBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.n)
    var j = 0
    while (j < buf.n) {
      val s = buf.scores(j)
      out.writeBoolean(s != null)
      if (s != null) out.writeDouble(s.doubleValue())
      buf.ids(j) match {
        case null => out.writeByte(0)
        case i: java.lang.Integer => out.writeByte(1); out.writeInt(i)
        case l: java.lang.Long => out.writeByte(2); out.writeLong(l)
        case u: UTF8String =>
          val b = u.getBytes
          out.writeByte(3); out.writeInt(b.length); out.write(b)
        case other => throw new IllegalStateException(
          s"TopKPairs: unserializable id ${other.getClass}")
      }
      j += 1
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = createAggregationBuffer()
    val n = in.readInt()
    var j = 0
    while (j < n) {
      val s: java.lang.Double =
        if (in.readBoolean()) java.lang.Double.valueOf(in.readDouble()) else null
      val i: Any = in.readByte() match {
        case 0 => null
        case 1 => java.lang.Integer.valueOf(in.readInt())
        case 2 => java.lang.Long.valueOf(in.readLong())
        case 3 =>
          val b = new Array[Byte](in.readInt())
          in.readFully(b)
          UTF8String.fromBytes(b)
      }
      buf.insert(s, i)
      j += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): TopKPairs =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKPairs =
    copy(inputAggBufferOffset = o)

  override def prettyName: String = "top_k_pairs"
  override def toString: String = s"top_k_pairs($score, $id, k=$k)"
}

/** ≤k entries insertion-sorted by (score desc nulls-last, id asc
  * nulls-first) — the window idiom's ordering. Linear insertion: k is the
  * ANN `top-k`, double digits at most, and a candidate that loses to the
  * current k-th is rejected with ONE comparison.
  */
final class TopKBuffer(val k: Int, idOrdering: Ordering[Any]) {
  var n = 0
  val scores = new Array[java.lang.Double](k)
  val ids = new Array[Any](k)

  /** negative = (s1, i1) ranks strictly before (s2, i2). */
  private def cmp(s1: java.lang.Double, i1: Any, s2: java.lang.Double, i2: Any): Int = {
    val byScore =
      if (s1 == null && s2 == null) 0
      else if (s1 == null) 1 // nulls last under desc
      else if (s2 == null) -1
      else -SQLOrderingUtil.compareDoubles(s1.doubleValue(), s2.doubleValue())
    if (byScore != 0) byScore
    else if (i1 == null && i2 == null) 0
    else if (i1 == null) -1 // nulls first under asc
    else if (i2 == null) 1
    else idOrdering.compare(i1, i2)
  }

  def insert(s: java.lang.Double, i: Any): Unit = {
    if (n == k && cmp(s, i, scores(n - 1), ids(n - 1)) >= 0) return
    var p = if (n < k) n else n - 1
    while (p > 0 && cmp(s, i, scores(p - 1), ids(p - 1)) < 0) {
      scores(p) = scores(p - 1); ids(p) = ids(p - 1); p -= 1
    }
    scores(p) = s; ids(p) = i
    if (n < k) n += 1
  }
}
