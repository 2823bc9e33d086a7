package graft.tools

/** Dev probe: does AQE exchange-reuse absorb the duplicated dedup subtree
  * in the flagship spec pipeline? Prints the post-execution adaptive plan.
  */
object LlmPlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.builder(master = "local[8]", shufflePartitions = 8).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.queries("q_n_llm_pipeline")(spark, "/root/testdata/sf0.01")
    df.write.format("noop").mode("overwrite").save()
    val plan = df.queryExecution.executedPlan.toString
    println("ReusedExchange occurrences: " + "ReusedExchange".r.findAllIn(plan).size)
    println("Exchange occurrences: " + "Exchange".r.findAllIn(plan).size)
    println("Scan parquet occurrences: " + "Scan parquet".r.findAllIn(plan).size)
    spark.stop()
  }
}
