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
  * A third arg `hier` measures
  * [[graft.operators.VectorIndex.trainIvfCentroidsHierarchical]] on the
  * same corpus/k ladder instead — the two-level trainer whose √k-bounded
  * wall justifies lifting the cap for `trainer = "hier"` builds.
  *
  * {{{ runMain graft.tools.KMeansCostProbe [sampleN] [k1,k2,...] [hier] }}}
  */
object KMeansCostProbe {
  def main(args: Array[String]): Unit = {
    val sampleN = args.lift(0).map(_.toLong).getOrElse(1000000L)
    val ks = args.lift(1).map(_.split(",").map(_.trim.toInt).toSeq)
      .getOrElse(Seq(1000, 3163, 10000))
    val hier = args.lift(2).contains("hier")
    val spark = graft.GraftSession.builder(master = "local[32]",
      shufflePartitions = 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val (emb0, _) = SemanticStressCorpus.build(spark, sampleN)
    val emb = emb0.localCheckpoint(true) // the ladder times the FIT, not the generator
    val train = emb.select(array_to_vector(
        transform(col("embedding"), x => x.cast("double"))).as("features"))
      .localCheckpoint(true)
    val n = train.count()
    println(s"KMCOST sample n=$n dim=64 maxIter=10 seed=42 " +
      s"(the buildIvfIndex${if (hier) " HIERARCHICAL" else ""} trainer)")
    for (k <- ks) {
      val t0 = System.nanoTime()
      val got =
        if (hier) graft.operators.VectorIndex.trainIvfCentroidsHierarchical(
          emb, nlist = k, idCol = "vec_id", vecCol = "embedding",
          trainSampleCap = sampleN, normalize = true).length
        else new KMeans().setK(k).setSeed(42L).setMaxIter(10).fit(train)
          .clusterCenters.length
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"KMCOST k=$k%6d fit_wall=$wall%8.1f s (centroids=$got)")
    }
    spark.stop(); sys.exit(0)
  }
}
