package graft.tools

import org.apache.spark.sql.functions._

/** Ad-hoc vs persisted IVF: the ad-hoc tier pays k-means training + full
  * corpus assignment on EVERY query batch; the index pays it once at build.
  * Prints build cost and per-query-batch medians for both paths (and the
  * int8-codec index) — the numbers behind SCALING.md's persisted-index row.
  */
object IvfIndexProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.GraftSession.builder(master = "local[32]", shufflePartitions = 32)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val queries = emb.filter(col("vec_id") < 20)
    def time[A](f: => A): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def med(reps: Int)(f: => Unit): Double =
      Seq.fill(reps)(time(f)).sorted.apply(reps / 2)
    def run(df: => org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // warm-up (JIT + file listing)
    run(graft.functions.VectorOps.bruteForceTopK(queries, emb, 5))

    val adhoc = med(3)(run(
      graft.functions.VectorOps.ivfTopK(queries, emb, k = 5, nlist = 16, nprobe = 8)))
    println(f"IVFPROBE adhoc_per_batch     $adhoc%6.2f s (k-means retrain + full assign, every batch)")

    val root = java.nio.file.Files.createTempDirectory("ivfprobe").toString
    val build = time(graft.operators.VectorIndex.buildIvfIndex(emb, s"$root/f", nlist = 16))
    println(f"IVFPROBE build_float         $build%6.2f s (once)")
    val idxq = med(3)(run(
      graft.operators.VectorIndex.ivfTopKIndexed(queries, s"$root/f", k = 5, nprobe = 8)))
    println(f"IVFPROBE indexed_per_batch   $idxq%6.2f s")

    val build8 = time(graft.operators.VectorIndex.buildIvfIndex(emb, s"$root/i", nlist = 16,
      codec = "int8"))
    val idxq8 = med(3)(run(
      graft.operators.VectorIndex.ivfTopKIndexed(queries, s"$root/i", k = 5, nprobe = 8)))
    println(f"IVFPROBE build_int8          $build8%6.2f s; indexed_int8_per_batch $idxq8%6.2f s")

    def duOf(p: String): Long = {
      val f = new java.io.File(p)
      if (f.isFile) f.length else Option(f.listFiles).map(_.map(x => duOf(x.getPath)).sum).getOrElse(0L)
    }
    println(s"IVFPROBE bytes float=${duOf(s"$root/f/cells")} int8=${duOf(s"$root/i/cells")}")
    spark.stop(); sys.exit(0)
  }
}
