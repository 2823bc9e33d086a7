package graft.tools

import org.apache.spark.sql.functions._
import graft.GraftSession
import graft.operators.Dedup

/** Dev probe: planted-structure recall of the semantic-dedup stress corpus
  * (same construction as `graft.Stress` stage `semantic_dedup`), split by
  * pair class — exact twins (identical vectors, recall must be 1) vs the
  * 7°-perturbed near dups (cell-boundary splits are the SemDeDup trade).
  * Usage: SemDedupProbe [corpusSize]
  */
object SemDedupProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(1000000L)
    val spark = GraftSession.builder(master = "local[32]", shufflePartitions = 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val ebase = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
      .select("vec_id", "embedding")
    val eN = ebase.count()
    val dupGroup = 10
    val copies = math.max(dupGroup, (n / eN).toInt)
    val partner = ebase.select(col("vec_id").as("pid"), col("embedding").as("pv"))
    val idx = spark.range(0L, copies.toLong).toDF("i")
    val emb = ebase.crossJoin(idx)
      .withColumn("pid", (col("vec_id") + col("i") * 131L) % eN)
      .join(broadcast(partner), "pid")
      .select((col("vec_id") + col("i") * 1000000L).as("vec_id"),
        when(col("i") < dupGroup / 2,
          transform(col("embedding"), x => x * lit(2.0f)))
        .when(col("i") < dupGroup,
          zip_with(col("embedding"), col("pv"), (x, y) => x * lit(8.0f) + y))
        .otherwise(
          zip_with(col("embedding"), col("pv"), (x, y) => (x + y) * lit(0.5f)))
        .as("embedding"))
      .repartition(32).persist()
    emb.count()
    val k = math.max(8, (n / 1500).toInt)
    val cents = Dedup.trainSemanticCentroids(emb, "vec_id", "embedding", k,
      trainSampleCap = 100000L)
    val pairs = Dedup.semanticDedupPairs(emb, "vec_id", "embedding", cents, 0.95)
      .withColumn("base_a", col("id_a") % 1000000L)
      .withColumn("base_b", col("id_b") % 1000000L)
      .withColumn("i_a", col("id_a") / 1000000L)
      .withColumn("i_b", col("id_b") / 1000000L)
      .withColumn("cls",
        when(col("base_a") =!= col("base_b"), "cross_base")
        .when(col("i_a") < dupGroup / 2 && col("i_b") < dupGroup / 2, "exact_exact")
        .when(col("i_a") < dupGroup && col("i_b") < dupGroup, "with_near")
        .otherwise("filler"))
    pairs.groupBy("cls").agg(count(lit(1)).as("pairs")).orderBy("cls").show()
    val g = dupGroup / 2
    println(s"planted per base: exact_exact=${g * (g - 1) / 2} " +
      s"with_near=${g * g + g * (g - 1) / 2} (x $eN bases)")
    spark.stop(); sys.exit(0)
  }
}
