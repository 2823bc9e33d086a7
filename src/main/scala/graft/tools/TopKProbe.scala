package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window vs bounded-aggregate top-k at the scale where the difference is
  * structural: a LARGE query batch (too big to broadcast) against the 1M
  * persisted IVF index. The window form ships every scored candidate row
  * (query, neighbor, cos_sim — plus the row it rides on) through one
  * exchange before discarding all but k per query; the [[graft.functions.TopKPairs]]
  * aggregate's partial pass caps the exchange at one ≤k-entry buffer per
  * (query, map partition). Prints `TOPKPROBE` rows (wall + shuffle bytes +
  * result parity) for SCALING.md's rankTopK section.
  *
  * Usage: `runMain graft.tools.TopKProbe [nVec] [queryEvery]` — defaults
  * 1M vectors, every 10th vector as a query (100k queries, 10% of the
  * corpus: a production reprocessing batch, not an interactive lookup).
  */
object TopKProbe {

  private final class Meter extends SparkListener {
    val bytes = new java.util.concurrent.atomic.AtomicLong
    override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
      bytes.addAndGet(sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
      ()
    }
  }

  def main(args: Array[String]): Unit = {
    val nVec = args.lift(0).map(_.toLong).getOrElse(1000000L)
    val every = args.lift(1).map(_.toLong).getOrElse(10L)
    val spark = graft.GraftSession.builder(master = "local[32]", shufflePartitions = 32)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val meter = new Meter
    spark.sparkContext.addSparkListener(meter)

    val root = java.nio.file.Files.createTempDirectory("topkprobe").toString
    val (embRaw, _) = SemanticStressCorpus.build(spark, nVec)
    embRaw.write.mode("overwrite").parquet(s"$root/corpus")
    val emb = spark.read.parquet(s"$root/corpus")
    val nlist = math.max(16, math.sqrt(emb.count().toDouble).toInt)
    graft.operators.VectorIndex.buildIvfIndex(
      emb, s"$root/ix", nlist = nlist, trainSampleCap = 100000L, normalize = true)
    val queries = emb.filter(pmod(col("vec_id"), lit(every)) === 0)
      .localCheckpoint(true)
    println(s"TOPKPROBE corpus=$nVec queries=${queries.count()} nlist=$nlist nprobe=8 k=20")

    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }
    def run(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // the aggregate path IS ivfTopKIndexed since r14
    def aggPath(): DataFrame =
      graft.operators.VectorIndex.ivfTopKIndexed(queries, s"$root/ix", k = 20, nprobe = 8)

    // the r13 window form, reconstructed over the SAME scored relation:
    // rank the aggregate path's pre-top-k candidates with row_number
    def windowPath(): DataFrame = {
      val centroids = graft.operators.VectorIndex.readCentroids(spark, s"$root/ix")
      val nrm = graft.functions.VectorOps.normalized(col("embedding"))
      val q = queries
        .select(col("vec_id").as("query_id"), nrm.as("q_vec"))
        .filter(col("q_vec").isNotNull)
        .withColumn("cell", explode(
          graft.functions.VectorMath.nearestCellsCol(col("q_vec"), centroids, 8)))
      val store = spark.read.parquet(s"$root/ix/cells")
      val scored = store
        .select(col("id").as("neighbor_id"), col("vec").as("c_vec"), col("cell"))
        .join(graft.operators.Joins.maybeBroadcast(q), Seq("cell"))
        .filter(col("query_id") =!= col("neighbor_id"))
        .withColumn("cos_sim",
          round(graft.functions.VectorOps.cosine(col("q_vec"), col("c_vec")), 4))
      val w = Window.partitionBy("query_id").orderBy(col("cos_sim").desc, col("neighbor_id"))
      scored.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 20)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    }

    // warm both paths once (JIT, file listing), then measure
    run(aggPath().limit(1)); run(windowPath().limit(1))
    for ((name, mk) <- Seq("window" -> (windowPath _), "agg" -> (aggPath _))) {
      val b0 = meter.bytes.get()
      val (_, wall) = time(run(mk()))
      println(f"TOPKPROBE $name%-6s wall=$wall%7.1f s shuffleMB=${(meter.bytes.get() - b0) / 1e6}%9.1f")
    }
    // parity: identical result sets (the swap's correctness claim at scale)
    val diff = aggPath().exceptAll(windowPath()).count() +
      windowPath().exceptAll(aggPath()).count()
    println(s"TOPKPROBE parity exceptAll_diff=$diff (expect 0)")
    spark.stop(); sys.exit(0)
  }
}
