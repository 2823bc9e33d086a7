package graft.tools

import org.apache.spark.sql.functions._
import graft.operators.Dedup
import graft.functions.VectorOps

/** Dev probe: measures LSH/IVF recall against brute force on the sf0.001
  * fixtures, to set honest CI floors (not shipped behavior; a main so it can
  * run standalone).
  */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.builder(master = "local[8]", shufflePartitions = 8).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"

    // --- minhash vs exact hashed-shingle jaccard -------------------------
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val sh = docs.select(col("doc_id").as("id"),
      graft.functions.ShingleHashes.shingleHashes(col("text"), 5).as("sh"))
    val exactJ = sh.select(col("id").as("id_a"), col("sh").as("sh_a"))
      .join(sh.select(col("id").as("id_b"), col("sh").as("sh_b")), col("id_a") < col("id_b"))
      .withColumn("j", Dedup.ngramJaccard(col("sh_a"), col("sh_b")))
      .filter(col("j") >= 0.5)
      .select("id_a", "id_b", "j").as[(Long, Long, Double)].collect()
    val lshPairs = Dedup.minhashDedupPairs(docs, "doc_id", "text", threshold = 0.7)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    def recallAt(lo: Double): (Int, Double) = {
      val ex = exactJ.filter(_._3 >= lo).map(p => (p._1, p._2)).toSet
      (ex.size, if (ex.isEmpty) -1 else (ex intersect lshPairs).size.toDouble / ex.size)
    }
    println(s"PROBE minhash: lsh=${lshPairs.size} exact>=0.7=${recallAt(0.7)} exact>=0.8=${recallAt(0.8)} exact>=0.9=${recallAt(0.9)}")
    val exact07 = exactJ.filter(_._3 >= 0.7).map(p => (p._1, p._2)).toSet
    println(s"PROBE minhash containment: ${lshPairs.subsetOf(exact07)}")

    // --- simhash pigeonhole completeness ---------------------------------
    val sig = Dedup.simhash64(docs, "doc_id", "text")
    val brute = sig.select(col("id").as("id_a"), col("simhash").as("ha"))
      .join(sig.select(col("id").as("id_b"), col("simhash").as("hb")), col("id_a") < col("id_b"))
      .withColumn("h", bit_count(col("ha").bitwiseXOR(col("hb"))))
      .filter(col("h") <= 3).select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val simP = Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    println(s"PROBE simhash: brute=${brute.size} lsh=${simP.size} equal=${brute == simP}")

    // --- embedding sign-LSH dedup ----------------------------------------
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val ec = emb.select(col("vec_id").as("id_a"), col("embedding").as("va"))
      .join(emb.select(col("vec_id").as("id_b"), col("embedding").as("vb")), col("id_a") < col("id_b"))
      .withColumn("c", round(VectorOps.cosine(col("va"), col("vb")), 4))
      .filter(col("c") >= 0.2).select("id_a", "id_b", "c").as[(Long, Long, Double)].collect()
    val embLsh = Dedup.embeddingDupPairs(emb, "vec_id", "embedding", dim = 64,
      threshold = 0.2, bands = 8, bits = 8)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    def embRecall(lo: Double): (Int, Double) = {
      val ex = ec.filter(_._3 >= lo).map(p => (p._1, p._2)).toSet
      (ex.size, if (ex.isEmpty) -1 else (ex intersect embLsh).size.toDouble / ex.size)
    }
    println(s"PROBE embdup: lsh=${embLsh.size} ex>=0.2=${embRecall(0.2)} ex>=0.5=${embRecall(0.5)} ex>=0.8=${embRecall(0.8)} ex>=0.9=${embRecall(0.9)} ex>=0.95=${embRecall(0.95)}")
    println(s"PROBE embdup containment: ${embLsh.subsetOf(ec.map(p => (p._1, p._2)).toSet)}")

    // --- ANN: LSH + IVF recall@k vs brute force --------------------------
    val queries = emb.filter(col("vec_id") < 20)
    def pairSet(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val bf = pairSet(VectorOps.bruteForceTopK(queries, emb, k = 5))
    for ((bands, bits) <- Seq((8, 8), (8, 6), (12, 8), (16, 8))) {
      val l = pairSet(VectorOps.lshTopK(queries, emb, k = 5, dim = 64, bands = bands, bits = bits))
      println(s"PROBE annlsh bands=$bands bits=$bits: recall=${(bf intersect l).size.toDouble / bf.size}")
    }
    for ((nlist, nprobe) <- Seq((8, 3), (8, 4), (16, 4), (16, 8))) {
      val iv = pairSet(VectorOps.ivfTopK(queries, emb, k = 5, nlist = nlist, nprobe = nprobe))
      println(s"PROBE annivf nlist=$nlist nprobe=$nprobe: recall=${(bf intersect iv).size.toDouble / bf.size}")
    }
    for ((nlist, nprobe) <- Seq((8, 4), (16, 8))) {
      val iv8 = pairSet(VectorOps.ivfTopKInt8(queries, emb, k = 5, nlist = nlist, nprobe = nprobe))
      println(s"PROBE annivf8 nlist=$nlist nprobe=$nprobe: recall=${(bf intersect iv8).size.toDouble / bf.size}")
    }
    spark.stop()
  }
}
