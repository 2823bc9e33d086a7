package graft.tools

import org.apache.spark.sql.functions._

/** Store-growth ladder for the streaming vector-index maintenance
  * ([[graft.streaming.Streams.ingestVectorIndex]]): per-batch wall as the
  * cells store accumulates. The scale question is different from the
  * other ingests': the delta routes through PINNED centroids (pure
  * per-row math, store-independent) and appends — but the id-idempotence
  * anti-join scans the store's `id` column every batch, a term that GROWS
  * with the store. This ladder measures that slope: a 1M-vector base
  * index, then `nBatches` of `batchRows` vectors each (10% replayed ids —
  * the at-least-once regime the anti-join exists for), `compactEvery=4`.
  * Prints `VIXLADDER` rows (per-batch wall, store rows, cells files) for
  * SCALING.md's streaming section.
  *
  * Usage: `runMain graft.tools.VectorIndexLadder [nBatches] [batchRows] [baseN]`
  * — defaults 10 × 50k onto a 1M base.
  */
object VectorIndexLadder {
  def main(args: Array[String]): Unit = {
    val nBatches = args.lift(0).map(_.toInt).getOrElse(10)
    val batchRows = args.lift(1).map(_.toInt).getOrElse(50000)
    val baseN = args.lift(2).map(_.toLong).getOrElse(1000000L)
    val spark = graft.GraftSession.builder(master = "local[32]", shufflePartitions = 32)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val work = java.nio.file.Files.createTempDirectory("vix_ladder").toString
    val (embRaw, _) = SemanticStressCorpus.build(spark, baseN)
    embRaw.write.mode("overwrite").parquet(s"$work/corpus")
    val emb = spark.read.parquet(s"$work/corpus")
    val nlist = math.max(16, math.sqrt(baseN.toDouble).toInt)
    val t0b = System.nanoTime()
    graft.operators.VectorIndex.buildIvfIndex(
      emb, s"$work/idx", nlist = nlist, trainSampleCap = 100000L, normalize = true)
    println(f"VIXLADDER base=$baseN nlist=$nlist build=${(System.nanoTime() - t0b) / 1e9}%6.1f s")

    val dim = 64
    val rnd = new java.util.Random(42)
    def mkVec(): Seq[Float] = Seq.fill(dim)((rnd.nextGaussian() * 0.5).toFloat)
    def mkBatch(b: Int): Seq[(Long, Seq[Float])] = (0 until batchRows).map { i =>
      // 10% re-delivered ids from the PREVIOUS batch's novel positions —
      // the at-least-once regime the store anti-join exists for (the
      // payload is irrelevant: the id is already indexed and must drop)
      if (i % 10 == 9 && b > 0)
        (baseN * 10 + (b - 1).toLong * batchRows + (i - 1), mkVec())
      else (baseN * 10 + b.toLong * batchRows + i, mkVec())
    }
    val in = MemoryStream[(Long, Seq[Float])]
    val q = graft.streaming.Streams.ingestVectorIndex(
      in.toDF().toDF("vec_id", "embedding"), s"$work/idx", s"$work/ckpt",
      compactEvery = 4)
    def files(dir: String): Int = {
      def rec(f: java.io.File): Int =
        if (f.isFile) { if (f.getName.endsWith(".parquet")) 1 else 0 }
        else Option(f.listFiles()).map(_.map(rec).sum).getOrElse(0)
      rec(new java.io.File(dir))
    }
    try {
      for (b <- 0 until nBatches) {
        val rows = mkBatch(b)
        val t0 = System.nanoTime()
        in.addData(rows: _*)
        q.processAllAvailable()
        val secs = (System.nanoTime() - t0) / 1e9
        val stored = graft.operators.VectorIndex.readIvfCells(spark, s"$work/idx").count()
        println(f"VIXLADDER batch=$b%2d rows=$batchRows $secs%6.2f s " +
          f"storeRows=$stored%9d cellsFiles=${files(s"$work/idx/cells")}%5d " +
          f"deltaFiles=${files(s"$work/idx/delta")}%4d")
      }
    } finally q.stop()
    // post-ladder sanity: replayed ids indexed once; queries still pruned
    val dup = graft.operators.VectorIndex.readIvfCells(spark, s"$work/idx")
      .groupBy("id").count().filter(col("count") > 1).count()
    println(s"VIXLADDER duplicate_ids=$dup (expect 0)")
    spark.stop(); sys.exit(0)
  }
}
