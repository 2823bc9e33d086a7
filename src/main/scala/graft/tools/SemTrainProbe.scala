package graft.tools

import org.apache.spark.sql.functions._

/** Train-once probe for the SemDeDup k-means centroid model asset
  * (VERDICT r12 next-round #3): fits
  * [[graft.operators.Dedup.trainSemanticCentroids]] on the sf0.01
  * embeddings and prints the pinned-Scala-literal centroid set plus the
  * resulting cluster-size histogram (the within-cluster quadratic needs
  * every cell in [2, maxClusterSize] to exercise pairs). The printed
  * literal is what `SparkEntry.semanticCentroidsKmeans` pins — the same
  * train-once/pin/score-everywhere discipline as `qualityGateWeights` and
  * `bpeGateMerges`.
  */
object SemTrainProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.builder(master = "local[32]", shufflePartitions = 32)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val k = args.drop(1).headOption.map(_.toInt).getOrElse(8)
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val cents = graft.operators.Dedup.trainSemanticCentroids(emb, "vec_id", "embedding", k)
    println("  private[graft] val semanticCentroidsKmeans: Seq[(Int, Seq[Float])] = Seq(")
    cents.foreach { case (cid, v) =>
      val body = v.map(x => s"${x}f").grouped(6).map(_.mkString(", "))
        .mkString(",\n      ")
      println(s"    ($cid, Seq[Float](\n      $body)),")
    }
    println("  )")
    // cluster-size histogram under the trained model
    val assigned = graft.operators.Dedup.assignSemanticClusters(emb, "vec_id", "embedding", cents)
    assigned.groupBy("cluster").count().orderBy("cluster").collect()
      .foreach(r => println(s"SIZE cluster=${r.get(0)} n=${r.get(1)}"))
    spark.stop(); sys.exit(0)
  }
}
