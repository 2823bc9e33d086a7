package graft.tools

/** Driver-cost profiler for the flagship-v3 composite: splits the gate into
  * its compile phase (eager model builds: quality+vector cache fills, firstK
  * centroid collect, semanticDrop's CC loop, the DSIR conditional-agg model
  * scan) and its action phase, and stack-samples the driver to attribute
  * between-job gaps. This probe is what surfaced the unbounded
  * `explainString` rendering cost (SQL-listener plan stringification per AQE
  * stage update — `Expression.toString` dominated the action's driver gaps)
  * that `spark.sql.maxPlanStringLength=64K` in GraftSession now bounds, and
  * the per-scan re-execution of the DSIR selection cascade that the spec's
  * `CacheSpec(train)` node now absorbs.
  */
object V3Profile {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.builder(master = "local[32]", shufflePartitions = 32)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROF $label%-16s ${(System.nanoTime() - t0) / 1e9}%7.2f s"); r
    }
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    // JIT warm-up on the sibling flagship so the numbers are plan cost
    graft.SparkEntry.queries("q_n_llm_pipeline_v2")(spark, dir)
      .write.format("noop").mode("overwrite").save()
    graft.operators.Dedup.unpersistCaches(); graft.plans.PipelineCompiler.unpersistCompiledCaches()
      spark.sharedState.cacheManager.clearCache()
    val counts = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
    val sampler = new Thread(() => {
      while (!Thread.currentThread().isInterrupted) {
        try {
          Thread.getAllStackTraces.forEach { (th, st) =>
            if (th.getState == Thread.State.RUNNABLE && st.nonEmpty) {
              val frame = st.take(30).map(_.toString)
                .find(f => f.startsWith("org.apache.spark") || f.startsWith("graft") ||
                  f.startsWith("org.codehaus"))
                .getOrElse(st.head.toString)
              counts.merge(frame.split("\\(").head, 1, (a, b) => a + b)
            }
          }
          Thread.sleep(50)
        } catch { case _: InterruptedException => return }
      }
    })
    sampler.setDaemon(true); sampler.start()
    val df = t("compile") { graft.SparkEntry.queries("q_n_llm_pipeline_v3")(spark, dir) }
    t("action") { df.write.format("noop").mode("overwrite").save() }
    sampler.interrupt()
    import scala.jdk.CollectionConverters._
    counts.asScala.toSeq.sortBy(-_._2).take(20).foreach { case (k, v) =>
      println(f"SAMPLE $v%5d  $k")
    }
    spark.stop(); sys.exit(0)
  }
}
