package graft.tools

/** Attribution probe for the driver-side plan-rendering cost: runs the
  * flagship-v3 composite once (plus one repeat) and prints, for every SQL
  * execution the session starts, the callsite description in stream order.
  * The log4j `StringUtils` truncation WARNs interleave in the same stderr
  * stream, so lining the two up names the mini-jobs whose plan strings are
  * rendered at multi-MB sizes (the r16 follow-up to V3Profile's finding
  * that listener-event `explainString`/`SparkPlanInfo` rendering rides the
  * main thread between jobs).
  */
object RenderProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.GraftSession.builder(master = "local[8]", shufflePartitions = 8)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onOtherEvent(e: org.apache.spark.scheduler.SparkListenerEvent): Unit =
        e match {
          case s: org.apache.spark.sql.execution.ui.SparkListenerSQLExecutionStart =>
            System.err.println(f"RENDER ${(System.nanoTime() - t0) / 1e9}%8.2f exec=${s.executionId}%-4d descLen=${s.physicalPlanDescription.length}%-6d ${s.description.linesIterator.nextOption.getOrElse("")}")
          case u: org.apache.spark.sql.execution.ui.SparkListenerSQLAdaptiveExecutionUpdate =>
            System.err.println(f"RENDER ${(System.nanoTime() - t0) / 1e9}%8.2f aqe =${u.executionId}%-4d descLen=${u.physicalPlanDescription.length}%-6d")
          case _ =>
        }
    })
    def once(tag: String): Unit = {
      val s0 = System.nanoTime()
      graft.SparkEntry.benchQueries.getOrElse("q_n_llm_pipeline_v3",
        graft.SparkEntry.queries("q_n_llm_pipeline_v3"))(spark, dir)
        .write.format("noop").mode("overwrite").save()
      System.err.println(f"RENDER-REP $tag ${(System.nanoTime() - s0) / 1e9}%.2f s")
      graft.operators.Dedup.unpersistCaches()
      graft.plans.PipelineCompiler.unpersistCompiledCaches()
      spark.sharedState.cacheManager.clearCache()
    }
    once("rep0")
    once("rep1")
    spark.stop()
    sys.exit(0)
  }
}
