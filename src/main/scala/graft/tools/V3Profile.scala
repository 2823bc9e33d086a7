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
    // timestamped MAIN-thread samples — attributes the driver-only windows
    // (no jobs in flight) to the exact code path burning them
    val mainThread = Thread.currentThread()
    val mainSamples = new java.util.concurrent.ConcurrentLinkedQueue[(Long, String)]()
    val sampler = new Thread(() => {
      while (!Thread.currentThread().isInterrupted) {
        try {
          val mst = mainThread.getStackTrace
          if (mst.nonEmpty) {
            val mf = mst.take(40).map(_.toString)
              .find(f => f.startsWith("org.apache.spark") || f.startsWith("graft") ||
                f.startsWith("org.codehaus"))
              .getOrElse(mst.head.toString)
            mainSamples.add((System.nanoTime(), mf))
          }
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
    // job timeline: start offset / duration / gap since the previous job's
    // end — the serialized-mini-job structure the compile phase is made of
    val jobLog = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long, Long, String)]()
    val jobStarts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        val site = js.stageInfos.lastOption.map(_.name).getOrElse("?")
        jobStarts.put(js.jobId, (System.nanoTime(), site))
      }
      override def onJobEnd(je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        val (s, site) = Option(jobStarts.get(je.jobId))
          .getOrElse((System.nanoTime(), "?"))
        jobLog.add((je.jobId, s, System.nanoTime(), site))
      }
    })
    val t0 = System.nanoTime()
    val df = t("compile") { graft.SparkEntry.queries("q_n_llm_pipeline_v3")(spark, dir) }
    val tCompile = System.nanoTime()
    t("action") { df.write.format("noop").mode("overwrite").save() }
    sampler.interrupt()
    Thread.sleep(200)
    import scala.jdk.CollectionConverters._
    val jobs = jobLog.asScala.toSeq.sortBy(_._2)
    var prevEnd = t0
    var (nCompile, nAction) = (0, 0)
    for ((id, s, e, site) <- jobs) {
      val phase = if (s < tCompile) { nCompile += 1; "C" } else { nAction += 1; "A" }
      println(f"JOB $phase job=$id%3d start=${(s - t0) / 1e9}%7.2f dur=${(e - s) / 1e9}%6.3f gap=${(s - prevEnd) / 1e9}%6.3f  $site")
      prevEnd = math.max(prevEnd, e)
    }
    println(s"JOBS compile=$nCompile action=$nAction")
    // main-thread frames aggregated per second of wall — where the driver
    // itself was, including the no-jobs-in-flight windows
    mainSamples.asScala.toSeq.groupBy(s => ((s._1 - t0) / 1e9).toInt)
      .toSeq.sortBy(_._1)
      .foreach { case (sec, ss) =>
        val top = ss.groupBy(_._2).toSeq.sortBy(-_._2.size).take(2)
          .map { case (f, fs) => s"${fs.size}x ${f.split("\\(").head}" }.mkString(" | ")
        println(f"MAIN t=$sec%3d  $top")
      }
    counts.asScala.toSeq.sortBy(-_._2).take(20).foreach { case (k, v) =>
      println(f"SAMPLE $v%5d  $k")
    }
    spark.stop(); sys.exit(0)
  }
}
