package graft.tools

import org.apache.spark.scheduler._
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

/** Dev probe: jobs / stages / summed task time vs wall time per bench query
  * — separates real compute from scheduling/stage-boundary overhead (the
  * thing a loaded host multiplies). Per-stage detail (task count, summed
  * task time, first line of the stage's call site) pinpoints WHICH stage
  * holds the time.
  */
object StageProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.builder(master = "local[32]", shufflePartitions = 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new AtomicInteger; val stages = new AtomicInteger
    val tasks = new AtomicInteger; val taskMs = new AtomicLong
    val perStage = new java.util.concurrent.ConcurrentHashMap[Int, (String, AtomicInteger, AtomicLong)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs.incrementAndGet()
      override def onStageSubmitted(s: SparkListenerStageSubmitted): Unit =
        perStage.put(s.stageInfo.stageId,
          (s.stageInfo.name.linesIterator.next().take(90), new AtomicInteger, new AtomicLong))
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        stages.incrementAndGet()
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet(); taskMs.addAndGet(t.taskInfo.duration)
        val e = perStage.computeIfAbsent(t.stageId,
          _ => ("?", new AtomicInteger, new AtomicLong))
        e._2.incrementAndGet(); e._3.addAndGet(t.taskInfo.duration)
      }
    })
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val qs = if (args.nonEmpty) args.toSeq
      else Seq("q_c4_reducer", "q_n_dedup_minhash", "q_n_dedup_simhash")
    for (q <- qs) {
      jobs.set(0); stages.set(0); tasks.set(0); taskMs.set(0); perStage.clear()
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(q)(spark, sf).write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300) // drain listener bus
      println(f"SPROBE $q wall=$wall%.2fs jobs=${jobs.get} stages=${stages.get} " +
        f"tasks=${tasks.get} taskTime=${taskMs.get / 1000.0}%.2fs")
      import scala.jdk.CollectionConverters._
      perStage.asScala.toSeq.sortBy(-_._2._3.get).take(12).foreach { case (id, (name, n, ms)) =>
        println(f"SPROBE   stage $id%4d tasks=${n.get}%3d time=${ms.get / 1000.0}%6.2fs  $name")
      }
    }
    spark.stop()
  }
}
