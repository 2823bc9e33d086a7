package graft.tools

import org.apache.spark.sql.functions._
import graft.GraftSession
import graft.operators.Dedup

/** Dev probe: planted-structure recall of the semantic-dedup stress corpus
  * ([[SemanticStressCorpus]] — the same builder `graft.Stress` stage
  * `semantic_dedup` runs), split by pair class — exact twins (identical
  * vectors, recall must be 1) vs the 7°-perturbed near dups (cell-boundary
  * splits are the SemDeDup trade). The midpoint-mixture filler plants no
  * pairs (see the builder's scaladoc), so a non-zero `filler` row counts
  * FALSE POSITIVES, not recall. Usage: SemDedupProbe [corpusSize]
  */
object SemDedupProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(1000000L)
    val spark = GraftSession.builder(master = "local[32]", shufflePartitions = 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dupGroup = SemanticStressCorpus.DupGroup
    val (embRaw, eN) = SemanticStressCorpus.build(spark, n)
    val emb = embRaw.persist()
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
