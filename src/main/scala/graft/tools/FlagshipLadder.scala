package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

/** Scaling ladder for the flagship pipelines — the 8-stage BPE-budget
  * composition (SparkEntry.qNLlmPipelineV2) and the 10-stage v3 composite
  * (quality model → semantic dedup → DSIR → BPE pack): wall seconds,
  * output rows and SHUFFLE BYTES at each sf fixture (100× docs across the
  * ladder). Results feed the flagship rows in SCALING.md. Each scale runs
  * twice; the second (warm) run is reported — the ladder compares plan
  * cost, not JIT. All caches (operator-scoped AND the v3 spec's CacheSpec
  * persists) are dropped between runs so every timed run pays its full
  * upstream, not a cache hit from the warm-up.
  */
object FlagshipLadder {
  def main(args: Array[String]): Unit = {
    val gates = if (args.isEmpty) Seq("q_n_llm_pipeline_v2", "q_n_llm_pipeline_v3")
                else args.toSeq
    val spark = graft.GraftSession.builder(master = "local[32]", shufflePartitions = 32)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val bytes = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
        bytes.addAndGet(sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
    })
    def dropCaches(): Unit = {
      graft.operators.Dedup.unpersistCaches()
      graft.plans.PipelineCompiler.unpersistCompiledCaches()
      spark.sharedState.cacheManager.clearCache()
    }
    for (gate <- gates; sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val dir = s"/root/testdata/$sf"
      def once(): (Double, Long, Long) = {
        Thread.sleep(500) // drain stragglers from the PREVIOUS run first
        val b0 = bytes.get(); val t0 = System.nanoTime()
        val df = graft.SparkEntry.queries(gate)(spark, dir)
        df.write.format("noop").mode("overwrite").save()
        val secs = (System.nanoTime() - t0) / 1e9
        // stage-completed events arrive on the async listener bus; without a
        // drain the final stages' bytes are nondeterministically missed
        Thread.sleep(500)
        val mb = bytes.get() - b0 // wall + shuffle cover the ONE timed action
        (secs, df.count(), mb)
      }
      once() // warm (JIT + page cache)
      dropCaches()
      val (secs, rows, mb) = once()
      dropCaches()
      val tag = gate.stripPrefix("q_n_llm_pipeline_")
      println(f"LADDER llm_$tag%-3s $sf%-8s $secs%7.2f s rows=$rows%6d shuffleMB=${mb / 1e6}%9.1f")
    }
    spark.stop(); sys.exit(0)
  }
}
