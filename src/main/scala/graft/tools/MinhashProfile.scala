package graft.tools

import org.apache.spark.sql.functions._

/** Dev probe: stage-by-stage timing of the minhash dedup pipeline at sf0.1
  * (kernel vs banding vs verify) to target optimization where the time is.
  */
object MinhashProfile {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.builder(master = "local[32]", shufflePartitions = 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      .repartition(32).persist()
    docs.count()
    def time(n: String)(f: => Long) = {
      val t0 = System.nanoTime(); val r = f
      println(f"MHPROF $n ${(System.nanoTime() - t0) / 1e9}%.2f s rows=$r")
    }
    time("shingle_hash_only")(docs.select(
      graft.functions.ShingleHashes.shingleHashes(col("text"), 5).as("sh"))
      .select(sum(size(col("sh")))).head().getLong(0))
    time("signature_kernel")(docs.select(
      graft.functions.MinHashSig.minhashSig(
        graft.functions.ShingleHashes.shingleHashes(col("text"), 5), 128).as("sig"))
      .select(count(lit(1))).head().getLong(0))
    time("candidates")(graft.operators.Dedup.minhashCandidates(
      docs, "doc_id", "text").count())
    time("full_dedup_pairs")(graft.operators.Dedup.minhashDedupPairs(
      docs, "doc_id", "text", threshold = 0.7).count())
    graft.operators.Dedup.unpersistCaches()
    spark.stop()
  }
}
