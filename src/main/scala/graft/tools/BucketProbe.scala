package graft.tools

import org.apache.spark.sql.functions._

/** Dev probe: bucket-size distribution and candidate-pair counts for the
  * simhash and minhash LSH tiers at sf0.1 — is the cost pair-volume or
  * kernel time?
  */
object BucketProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.builder(master = "local[32]", shufflePartitions = 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val docs = spark.read.parquet(s"$sf/documents.parquet")

    val sig = graft.operators.Dedup.simhash64(docs, "doc_id", "text").persist()
    println(s"BPROBE simhash distinct sigs = ${sig.select("simhash").distinct().count()} of ${sig.count()}")
    val blocks = 4; val width = 16
    val banded = sig.select(col("id"),
      explode(array((0 until blocks).map { b =>
        struct(lit(b).as("blk"),
          col("simhash").bitwiseAND(lit(((1L << width) - 1) << (b * width))).as("key"))
      }: _*)).as("bb"))
      .select(col("id"), col("bb.blk"), col("bb.key"))
    val sizes = banded.groupBy("blk", "key").count()
    val agg = sizes.agg(count(lit(1)).as("buckets"), max("count").as("max_sz"),
        sum(col("count") * (col("count") - 1) / 2).as("pairs_upper")).head()
    println(s"BPROBE simhash buckets=${agg.get(0)} max_sz=${agg.get(1)} pairs_upper=${agg.get(2)}")
    sizes.orderBy(desc("count")).limit(10).collect()
      .foreach(r => println(s"BPROBE   blk=${r.get(0)} key=${r.get(1)} n=${r.get(2)}"))
    val capped = sizes.filter(col("count").between(2, 1000))
      .agg(coalesce(sum(col("count") * (col("count") - 1) / 2), lit(0)).as("pairs")).head()
    println(s"BPROBE simhash capped(<=1000) pair volume = ${capped.get(0)}")

    // minhash banding pair volume
    val mh = graft.operators.Dedup.minhashCandidates(docs, "doc_id", "text")
    println(s"BPROBE minhash candidates = ${mh.count()}")
    graft.operators.Dedup.unpersistCaches()
    spark.stop()
  }
}
