package graft.tools

import org.apache.spark.sql.functions._
import graft.GraftSession
import graft.operators.Dedup
import graft.functions.VectorOps

/** Dev probe: dump the approximate operators' outputs so the gate
  * thresholds (bounded-slice SQL oracles) can be chosen empirically
  * against DuckDB. Not part of the library.
  */
object GateProbe {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val spark = GraftSession.builder(master = "local[8]", shufflePartitions = 8).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    def dump(name: String)(df: org.apache.spark.sql.DataFrame): Unit =
      df.coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")

    dump("minhash") {
      Dedup.minhashDedupPairs(docs, "doc_id", "text",
        threshold = 0.7, shingleLen = 5, numHashes = 128, bands = 16)
    }
    dump("simhash") {
      Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 3)
    }
    dump("embdups") {
      Dedup.embeddingDupPairs(emb, "vec_id", "embedding",
        dim = 64, threshold = 0.2, bands = 8, bits = 8)
    }
    val queries = emb.filter(col("vec_id") < 20)
    dump("annlsh") {
      VectorOps.lshTopK(queries, emb, k = 5, dim = 64, bands = 8, bits = 8)
    }
    dump("annivf") {
      VectorOps.ivfTopK(queries, emb, k = 5, nlist = 16, nprobe = 8)
    }
    dump("exact20") {
      VectorOps.bruteForceTopK(queries, emb, k = 20)
    }
    spark.stop()
  }
}
