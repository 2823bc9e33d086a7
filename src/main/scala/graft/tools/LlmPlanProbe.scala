package graft.tools

/** Dev probe: does AQE exchange-reuse absorb the duplicated dedup subtree
  * in the flagship spec pipeline? Executes THROUGH the probed
  * QueryExecution (a `df.write` would spawn a separate one, leaving this
  * plan un-executed and ReusedExchange invisible — isFinalPlan=false), then
  * prints the final adaptive plan's node counts.
  */
object LlmPlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.builder(master = "local[8]", shufflePartitions = 8).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.queries("q_n_llm_pipeline")(spark, "/root/testdata/sf0.01")
    val qe = df.queryExecution
    qe.executedPlan.executeCollect() // drives THIS adaptive plan to its final form
    val plan = qe.executedPlan.toString
    println("isFinalPlan=true present: " + plan.contains("isFinalPlan=true"))
    println("ReusedExchange occurrences: " + "ReusedExchange".r.findAllIn(plan).size)
    // "ReusedExchange" itself contains the substring "Exchange" once
    println("Exchange occurrences (excl. reused): " +
      ("Exchange".r.findAllIn(plan).size - "ReusedExchange".r.findAllIn(plan).size))
    println("Scan parquet occurrences: " + "Scan parquet".r.findAllIn(plan).size)
    spark.stop()
  }
}
