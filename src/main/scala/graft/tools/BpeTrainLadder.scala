package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}

/** Driver-round-trip ladder for the batched BPE trainer
  * (graft.functions.Bpe.trainMergesBatched): wall time and Spark job count
  * for a 32k-merge vocabulary as a function of `batchSize`. The sf
  * fixtures' template text holds only 31 distinct words (nothing to
  * merge), so the ladder trains on a SYNTHETIC Zipf vocabulary shaped
  * like a real corpus's word-count relation — 50k distinct words, lengths
  * 3–12, counts ∝ 1/rank — which is what the trainer actually consumes at
  * any corpus scale (word counts are an aggregate, never the text).
  * Feeds the BPE-training row in SCALING.md. batchSize=1 (the exact
  * textbook sequence) is measured on a 512-merge prefix only: 32k
  * sequential rounds would be hours by construction — that IS the result.
  */
object BpeTrainLadder {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.builder(master = "local[32]", shufflePartitions = 32)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val jobs = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = jobs.incrementAndGet()
    })
    // deterministic Zipf vocabulary: base-26 rank id + seeded suffix
    val rnd = new java.util.Random(42)
    def alpha(n: Int, len: Int): String = {
      val sb = new StringBuilder
      var x = n
      while (sb.length < len) { sb.append(('a' + x % 26).toChar); x = x / 26 + 1 }
      sb.toString
    }
    val words = (0 until 50000).map { i =>
      (alpha(i, 3 + rnd.nextInt(10)), math.max((1000000.0 / (i + 1)).toLong, 1L))
    }
    val vocab = words.toDF("word", "cnt").repartition(32).localCheckpoint(true)
    def run(label: String, merges: Int, bs: Int): Unit = {
      val j0 = jobs.get(); val t0 = System.nanoTime()
      val got = graft.functions.Bpe.trainMergesBatched(vocab, merges, batchSize = bs)
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"LADDER bpe_train $label%-14s merges=${got.size}%6d batch=$bs%5d " +
        f"$secs%8.1f s jobs=${jobs.get() - j0}%6d")
    }
    run("warmup", 64, 64) // JIT the agg/rewrite kernels before timing
    run("seq512", 512, 1)
    run("b64_512", 512, 64) // same prefix, batched — the apples-to-apples row
    for (bs <- Seq(256, 1024)) run(s"b${bs}_32k", 32768, bs)
    spark.stop(); sys.exit(0)
  }
}
