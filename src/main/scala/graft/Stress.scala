package graft
import org.apache.spark.sql.functions._
import graft.operators.Dedup
object Stress {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder(master = "local[32]", shufflePartitions = 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    // N copies with distinct ids (default 10 → 50k docs): every doc has N-1
    // exact replicas → every bucket holds >= N ids; near-dup pairs explode
    // to N(N-1)/2 per original. SPARK_GRAFT_STRESS_COPIES scales the probe.
    val copies = sys.env.getOrElse("SPARK_GRAFT_STRESS_COPIES", "10").toInt
    val big = (0 until copies).map(i =>
      docs.select((col("doc_id") + lit(i * 10000)).as("doc_id"), col("text"))).reduce(_ union _)
      .repartition(32).persist()
    println(s"STRESS corpus=${big.count()}")
    def time(n: String)(f: => Long) = { val t0 = System.nanoTime(); val r = f
      println(f"STRESS $n ${(System.nanoTime()-t0)/1e9}%.2f s rows=$r") }
    time("minhash_pairs")(Dedup.minhashDedupPairs(big, "doc_id", "text", 0.7).count())
    time("simhash_pairs")(Dedup.simhashPairs(big, "doc_id", "text", 3).count())
    time("exact_dedup")(Dedup.exact(big, "text", "doc_id").count())
    // end-to-end: pairs → connected components → keep one per cluster.
    // 50k docs in 5k clusters of >=10 — dense worst case for the star rounds
    time("drop_near_dups")(Dedup.dropNearDups(big, "doc_id", "text", 0.7).count())
    // incremental ingest: 10% of the corpus arrives as a delta and dedups
    // against the signature STORE of the other 90% — the index-only path
    val store = Dedup.minhashSignatures(
      big.filter(col("doc_id") % 10 =!= 0), "doc_id", "text").persist()
    println(s"STRESS store=${store.count()}")
    time("incremental_dedup")(Dedup.incrementalDedup(
      big.filter(col("doc_id") % 10 === 0), store, "doc_id", "text", 0.7).count())
    spark.stop()
  }
}
