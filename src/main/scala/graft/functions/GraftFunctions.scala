package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.graft.Bridge

/** SQL registration of the engine's scalar function surface, so
  * `spark.sql("SELECT lang_id(text) ...")` works alongside the Column API —
  * the engine's equivalent of a built-in function library (the reference has
  * none; every row computation is user JS, SURVEY §2.6).
  *
  * Implementation note: each SQL function is assembled by applying the
  * existing Column-level builder to the call-site argument expressions via
  * the Column↔Expression bridge — one definition serves both APIs.
  */
object GraftFunctions {

  private def fn1(name: String, f: Column => Column): (String, Seq[Expression] => Expression) =
    name -> { exprs => Bridge.expression(f(Bridge.column(exprs.head))) }
  private def fn2(name: String, f: (Column, Column) => Column): (String, Seq[Expression] => Expression) =
    name -> { exprs => Bridge.expression(f(Bridge.column(exprs(0)), Bridge.column(exprs(1)))) }

  val all: Seq[(String, Seq[Expression] => Expression)] = Seq(
    fn1("token_count", TextOps.tokenCount),
    fn1("subword_count", TextOps.subwordCount),
    fn1("lang_id", TextOps.langId),
    fn1("quality_score", TextOps.qualityScore),
    fn1("doc_fingerprint", TextOps.fingerprint),
    fn2("cosine_sim", VectorOps.cosine),
    fn2("dot_product", VectorOps.dot),
    fn1("l2_norm", VectorOps.l2Norm),
    fn1("quantize_int8", VectorOps.quantizeInt8),
    fn2("cosine_int8", VectorOps.cosineInt8),
    fn1("simhash64", SimHash64.simhash64),
    "char_shingles" -> { exprs =>
      Bridge.expression(TextOps.charShingles(Bridge.column(exprs.head), intLit(exprs, 1, "char_shingles")))
    },
    "minhash_sig" -> { exprs =>
      MinHashSig(exprs.head, intLit(exprs, 1, "minhash_sig"), 42L)
    },
    fn2("dot_int8", VectorOps.dotInt8),
    // bounded per-group top-k AS AN AGGREGATE: `top_k_pairs(score, id, k)`
    // inside any GROUP BY (incl. a spec `agg` node) returns the k best
    // (id, score) structs in rank order — the scale-correct form of the
    // row_number window idiom (the analyzer wraps the bare
    // AggregateFunction in an AggregateExpression, like built-in sum)
    "top_k_pairs" -> { exprs =>
      TopKPairs(exprs(0), exprs(1), intLit(exprs, 2, "top_k_pairs"))
    })

  /** Size-style arguments must be literal integers (they shape the plan). */
  private def intLit(exprs: Seq[Expression], pos: Int, fn: String): Int = {
    val e = exprs(pos)
    require(e.foldable,
      s"$fn: argument ${pos + 1} must be a literal integer, got ${e.sql}")
    e.eval(null).asInstanceOf[Number].intValue
  }

  /** Install all functions into the session's registry. */
  def register(spark: SparkSession): Unit =
    all.foreach { case (name, builder) => Bridge.registerFunction(spark, name, builder) }
}
