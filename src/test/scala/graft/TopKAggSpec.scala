package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorOps

/** [[graft.functions.TopKPairs]] must be indistinguishable from the window
  * idiom it replaced — `row_number() OVER (ORDER BY cos_sim DESC,
  * neighbor_id) <= k` — on every input shape the ANN tiers produce,
  * including the edges (null scores from zero-norm vectors, ties, groups
  * smaller than k, string ids). The cross-check is exhaustive set
  * equality against the window formulation on seeded random data.
  */
class TopKAggSpec extends SparkSpec {

  private def windowTopK(scored: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy("query_id").orderBy(col("cos_sim").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "cos_sim", "rank")
  }

  private def asSet(df: DataFrame): Set[(Any, Any, Any, Any)] =
    df.collect().map(r => (r.get(0), r.get(1), r.get(2), r.get(3))).toSet

  test("matches the window idiom on random data with nulls and ties") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    // 40 queries × ~60 candidates; scores rounded to 2 decimals to force
    // ties, ~5% null (the zero-norm cos_sim convention)
    val rows = for {
      q <- 0 until 40
      n <- 0 until (20 + rnd.nextInt(60))
    } yield (q.toLong, (q * 1000 + n).toLong,
      if (rnd.nextInt(20) == 0) null
      else java.lang.Double.valueOf(math.floor(rnd.nextDouble() * 100) / 100.0))
    val scored = rows.toDF("query_id", "neighbor_id", "cos_sim")
      .repartition(4) // candidates for one query spread over partitions
    for (k <- Seq(1, 5, 100)) {
      assert(asSet(VectorOps.rankTopK(scored, k)) == asSet(windowTopK(scored, k)),
        s"k=$k diverged from the window formulation")
    }
  }

  test("string ids rank by Spark's string ordering; small groups keep all rows") {
    import spark.implicits._
    val scored = Seq(
      ("q1", "b", 0.9), ("q1", "a", 0.9), ("q1", "B", 0.9), ("q1", "c", 0.5),
      ("q2", "only", 0.1))
      .toDF("query_id", "neighbor_id", "cos_sim")
    val got = VectorOps.rankTopK(scored, 3).orderBy("query_id", "rank").collect()
    // ties at 0.9 break by id ascending (binary order: B < a < b)
    assert(got.map(r => (r.getString(0), r.getString(1), r.getInt(3))).toSeq ==
      Seq(("q1", "B", 1), ("q1", "a", 2), ("q1", "b", 3), ("q2", "only", 1)))
  }

  test("null scores sort last (desc nulls-last), like the window") {
    import spark.implicits._
    val scored = Seq[(Long, Long, java.lang.Double)](
      (1L, 10L, null), (1L, 11L, 0.2), (1L, 12L, null), (1L, 13L, 0.8))
      .toDF("query_id", "neighbor_id", "cos_sim")
    for (k <- Seq(2, 4))
      assert(asSet(VectorOps.rankTopK(scored, k)) == asSet(windowTopK(scored, k)))
    val top3 = VectorOps.rankTopK(scored, 3).orderBy("rank")
      .select("neighbor_id").as[Long].collect().toSeq
    assert(top3 == Seq(13L, 11L, 10L)) // null-score 10 enters only at rank 3
  }

  test("empty input yields an empty result") {
    import spark.implicits._
    val scored = Seq.empty[(Long, Long, Double)]
      .toDF("query_id", "neighbor_id", "cos_sim")
    assert(VectorOps.rankTopK(scored, 5).count() == 0L)
  }

  test("plan aggregates (partial top-k), it does not window") {
    import spark.implicits._
    val scored = (0 until 100).map(i => (i.toLong % 5, i.toLong, i / 100.0))
      .toDF("query_id", "neighbor_id", "cos_sim")
    val plan = VectorOps.rankTopK(scored, 3).queryExecution.executedPlan.toString
    assert(plan.contains("top_k_pairs"), "top-k aggregate missing from plan")
    assert(!plan.contains("Window"), "window survived the aggregate rewrite")
  }

  test("serialize/deserialize round-trips partial buffers exactly") {
    // force the serialized partial-aggregation path: single-row partitions
    // mean every group's buffer crosses the exchange as bytes
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows = (0 until 200).map(i =>
      (i.toLong % 3, i.toLong, math.floor(rnd.nextDouble() * 10) / 10.0))
    val scored = rows.toDF("query_id", "neighbor_id", "cos_sim").repartition(32)
    assert(asSet(VectorOps.rankTopK(scored, 7)) == asSet(windowTopK(scored, 7)))
  }
}
