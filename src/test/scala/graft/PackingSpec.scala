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

  test("chunkDocs covers every token and respects stride/overlap") {
    val docs = Seq(
      (1L, (1 to 150).map(i => s"w$i").mkString(" ")), // 3 strided chunks
      (2L, "a b c"),                                   // single short chunk
      (3L, "   ")                                      // empty → no chunks
    ).toDF("doc_id", "text")
    val out = Packing.chunkDocs(docs, "doc_id", "text", chunkTokens = 64, stride = 32)
      .select("doc_id", "chunk_id", "chunk_toks")
      .as[(Long, Int, Seq[String])].collect()
    assert(!out.exists(_._1 == 3L), "empty doc must produce no chunks")
    assert(out.count(_._1 == 2L) == 1 && out.find(_._1 == 2L).get._3 == Seq("a", "b", "c"))
    val d1 = out.filter(_._1 == 1L).sortBy(_._2)
    assert(d1.map(_._2).toSeq == Seq(0, 1, 2, 3, 4), s"chunk ids: ${d1.map(_._2).toSeq}")
    d1.foreach { case (_, cid, toks) =>
      assert(toks.head == s"w${cid * 32 + 1}", "chunk must start at its stride offset")
      assert(toks.size <= 64)
    }
    // 50% overlap: every token appears in >=1 chunk, interior ones in 2
    val coverage = d1.flatMap(_._3).groupBy(identity).view.mapValues(_.size)
    (1 to 150).foreach(i => assert(coverage.getOrElse(s"w$i", 0) >= 1, s"w$i uncovered"))
    assert(coverage("w40") == 2, "overlapped token must appear in two chunks")
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
