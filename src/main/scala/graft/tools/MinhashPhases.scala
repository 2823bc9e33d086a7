package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import graft.GraftSession

/** Dev probe: per-job wall times of one warm minhashDedupPairs run. */
object MinhashPhases {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.builder(master = "local[32]", shufflePartitions = 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def once(): Unit = {
      graft.SparkEntry.queries("q_n_dedup_minhash")(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      graft.operators.Dedup.unpersistCaches()
    }
    once(); once() // warm
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        starts.put(j.jobId, (System.nanoTime(),
          j.stageInfos.map(s => s.name.takeWhile(_ != '\n').take(60)).mkString(" >> ")))
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        val (t0, desc) = starts.getOrDefault(j.jobId, (0L, "?"))
        println(f"JOB ${j.jobId}%3d ${(System.nanoTime() - t0) / 1e9}%6.3f s  $desc")
      }
    })
    val t0 = System.nanoTime()
    once()
    Thread.sleep(500)
    println(f"TOTAL ${(System.nanoTime() - t0) / 1e9}%.3f s")
    spark.stop(); sys.exit(0)
  }
}
