package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

/** Scaling ladder for the 8-stage BPE-budget flagship
  * (SparkEntry.qNLlmPipelineV2): wall seconds, output rows and SHUFFLE
  * BYTES at each sf fixture (100× docs across the ladder). Results feed
  * the flagship row in SCALING.md. Each scale runs twice; the second
  * (warm) run is reported — the ladder compares plan cost, not JIT.
  */
object FlagshipLadder {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.builder(master = "local[32]", shufflePartitions = 32)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val bytes = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
        bytes.addAndGet(sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
    })
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val dir = s"/root/testdata/$sf"
      def once(): (Double, Long, Long) = {
        Thread.sleep(500) // drain stragglers from the PREVIOUS run first
        val b0 = bytes.get(); val t0 = System.nanoTime()
        val df = graft.SparkEntry.queries("q_n_llm_pipeline_v2")(spark, dir)
        df.write.format("noop").mode("overwrite").save()
        val secs = (System.nanoTime() - t0) / 1e9
        // stage-completed events arrive on the async listener bus; without a
        // drain the final stages' bytes are nondeterministically missed
        Thread.sleep(500)
        val mb = bytes.get() - b0 // wall + shuffle cover the ONE timed action
        (secs, df.count(), mb)
      }
      once() // warm (JIT + page cache)
      graft.operators.Dedup.unpersistCaches()
      val (secs, rows, mb) = once()
      graft.operators.Dedup.unpersistCaches()
      println(f"LADDER llm_v2 $sf%-8s $secs%7.2f s rows=$rows%6d shuffleMB=${mb / 1e6}%9.1f")
    }
    spark.stop(); sys.exit(0)
  }
}
