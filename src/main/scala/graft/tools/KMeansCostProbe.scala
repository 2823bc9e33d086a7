package graft.tools

import org.apache.spark.sql.functions._

/** Auto-nlist training-cost boundary (VERDICT r15 next #3):
  * [[graft.operators.VectorIndex.buildIvfIndex]] trains k-means on a
  * ≤1M-row sample with k = ⌈√N⌉ by default, so k grows with the corpus —
  * measured fine through the 10M rung (k=3163, 378 s end-to-end build,
  * SCALING.md), but the fit is O(sample × k × dim × iters) and at the
  * 100M+ rung (k ≥ 10⁴) the TRAINING dominates the build. This probe
  * measures the fit wall ALONE (SemanticStressCorpus vectors, dim 64,
  * capped sample, maxIter 10, seed 42 — exactly the build's trainer) for a
  * k ladder; its rows become SCALING.md's training-cost curve and justify
  * the code-enforced auto-nlist cap.
  *
  * {{{ runMain graft.tools.KMeansCostProbe [sampleN] [k1,k2,...] }}}
  */
object KMeansCostProbe {
  def main(args: Array[String]): Unit = {
    val sampleN = args.lift(0).map(_.toLong).getOrElse(1000000L)
    val ks = args.lift(1).map(_.split(",").map(_.trim.toInt).toSeq)
      .getOrElse(Seq(1000, 3163, 10000))
    val spark = graft.GraftSession.builder(master = "local[32]",
      shufflePartitions = 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val (emb, _) = SemanticStressCorpus.build(spark, sampleN)
    val train = emb.select(array_to_vector(
        transform(col("embedding"), x => x.cast("double"))).as("features"))
      .localCheckpoint(true) // the ladder times the FIT, not the generator
    val n = train.count()
    println(s"KMCOST sample n=$n dim=64 maxIter=10 seed=42 (the buildIvfIndex trainer)")
    for (k <- ks) {
      val t0 = System.nanoTime()
      val model = new KMeans().setK(k).setSeed(42L).setMaxIter(10).fit(train)
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"KMCOST k=$k%6d fit_wall=$wall%8.1f s " +
        f"(centroids=${model.clusterCenters.length})")
    }
    spark.stop(); sys.exit(0)
  }
}
