package graft

import org.apache.spark.sql.functions._
import graft.functions.FoldAggregator

class AggregatorSpec extends SparkSpec {
  import spark.implicits._

  test("last-write-wins fold merges fields by declared order (bor-dwc Reducer idiom)") {
    // per (month,subordinate)-style key: later seq overwrites plan, keeps fact
    val rows = Seq(
      ("k1", 1L, Map("plan" -> "10", "fact" -> "9")),
      ("k1", 2L, Map("plan" -> "12")),
      ("k2", 1L, Map("fact" -> "5"))).toDF("k", "seq", "fields")
      .as[(String, Long, Map[String, String])]
    val merged = rows.groupByKey(_._1)
      .mapValues(t => (t._2, t._3))
      .agg(FoldAggregator.lastWriteWins.toColumn.name("merged"))
      .collect().toMap
    assert(merged("k1") == Map("plan" -> "12", "fact" -> "9"))
    assert(merged("k2") == Map("fact" -> "5"))
  }

  test("approx_count_distinct stays within 5% of exact at sf0.001") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val (exact, approx) = li.agg(
      countDistinct(col("l_partkey")).as("e"),
      approx_count_distinct(col("l_partkey"), 0.02).as("a"))
      .as[(Long, Long)].head()
    assert(math.abs(approx - exact).toDouble / exact < 0.05, s"approx=$approx exact=$exact")
  }

  test("streaming dedup emits first occurrence per key only") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sctx = spark.sqlContext
    val mem = MemoryStream[(String, Int)]
    val deduped = graft.streaming.Streams.streamingDedup[(String, Int)](
      mem.toDS(), _._1)
    val q = deduped.writeStream.outputMode("append")
      .format("memory").queryName("dedup_out").start()
    try {
      mem.addData(("a", 1), ("b", 2), ("a", 3))
      q.processAllAvailable()
      mem.addData(("a", 4), ("c", 5))
      q.processAllAvailable()
    } finally q.stop()
    val out = spark.table("dedup_out").as[(String, Int)].collect().sortBy(_._1)
    assert(out.map(_._1).toSeq == Seq("a", "b", "c"))
    assert(out.toMap == Map("a" -> 1, "b" -> 2, "c" -> 5))
  }
}
