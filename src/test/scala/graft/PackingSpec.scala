package graft

import org.apache.spark.sql.functions._
import graft.operators.{Packing, Sampling}

class PackingSpec extends SparkSpec {
  import spark.implicits._

  test("packBins matches a driver-side greedy first-fit reconstruction") {
    val docs = spark.range(500).select(col("id"),
      (col("id") % 97 + 10).as("tokens")) // 10..106 tokens per doc
    val out = Packing.packBins(docs, "id", "tokens", budgetTokens = 300, shards = 16)
      .select("id", "shard", "tokens", "bin")
      .as[(Long, String, Long, Long)].collect()
    // reconstruct: per shard, walk docs in (md5 bucket, id) order, greedy
    val bucketOf = docs.select(col("id"), Sampling.hashBucket(col("id")).as("b"))
      .as[(Long, String)].collect().toMap
    val expected = out.groupBy(_._2).toSeq.flatMap { case (_, rows) =>
      var cum = 0L
      rows.sortBy(r => (bucketOf(r._1), r._1)).toSeq.map { r =>
        val bin = (cum / 300.0).toLong // == floor((cum_incl - tokens)/budget)
        cum += r._3
        r._1 -> bin
      }
    }.toMap
    assert(out.map(r => r._1 -> r._4).toMap == expected)
  }

  test("bins are contiguous from 0 within each shard and fill past the budget") {
    val docs = spark.range(2000).select(col("id"), lit(50L).as("tokens"))
    val agg = Packing.packBins(docs, "id", "tokens", budgetTokens = 400, shards = 16)
      .groupBy("shard", "bin").agg(sum("tokens").as("tok"))
      .as[(String, Long, Long)].collect()
    agg.groupBy(_._1).foreach { case (shard, rows) =>
      val bins = rows.map(_._2).sorted
      assert(bins.head == 0 && bins.last == bins.length - 1, s"gaps in $shard: ${bins.toSeq}")
      // every bin but the shard's last must have crossed the budget
      rows.sortBy(_._2).init.foreach { case (_, b, tok) =>
        assert(tok >= 400, s"underfull non-final bin $b in $shard: $tok")
      }
    }
  }
}
