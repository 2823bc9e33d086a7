package graft.tools

/** Dev probe: time q_h2_join_detail repeatedly and print the adaptive plan
  * (chasing the bimodal 1.6s/10s bench behavior).
  */
object H2Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.GraftSession.builder(master = "local[32]", shufflePartitions = 32)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = graft.SparkEntry.queries("q_h2_join_detail")
    for (i <- 1 to 7) {
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      println(f"h2 rep $i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    // execute THROUGH this QueryExecution so the printed adaptive plan is
    // the final one (a df.write would run a separate QueryExecution and
    // leave this plan isFinalPlan=false, hiding AQE's runtime decisions)
    val qe = fn(spark, sfDir).queryExecution
    qe.executedPlan.executeCollect()
    println(qe.executedPlan.toString)
    spark.stop()
  }
}
