package graft.tools

import org.apache.spark.sql.functions._

/** Measures the fixed cost structure of spec-driven ingest rounds
  * (`graft.plans.IngestCompiler.runAvailable` — the `RunSpec` CLI path):
  * a loaded round (N docs), an EMPTY round (checkpoint resume, no new
  * files — the cron-loop steady state when the producer is idle), and a
  * second loaded round (store-backed incremental work). Produces the
  * SCALING.md "spec-driven ingest rounds" row.
  *
  * usage: runMain graft.tools.IngestSpecProbe [sfDir]
  */
object IngestSpecProbe {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = graft.GraftSession.builder(master = "local[8]",
      shufflePartitions = 8).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val root = java.nio.file.Files.createTempDirectory("ingest_probe").toString
    val docs = spark.read.parquet(s"$sf/documents.parquet").select("doc_id", "text")
    val emb = spark.read.parquet(s"$sf/embeddings.parquet").select("vec_id", "embedding")
    val joined = docs.join(emb, docs("doc_id") === emb("vec_id"))
      .select("doc_id", "text", "embedding")
    val spec = graft.plans.SpecJson.ingestFromJson(graft.SparkEntry.pretrainIngestJson)
    def round(tag: String)(stage: => Unit): Unit = {
      stage
      val t0 = System.nanoTime()
      graft.plans.IngestCompiler.runAvailable(spark, spec, Map("root" -> root))
      println(f"IngestSpecProbe $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    round("round1_even_half") {
      joined.filter(col("doc_id") % 2 === 0)
        .write.mode("overwrite").parquet(s"$root/drop") }
    round("round2_empty") {}
    round("round3_odd_half") {
      joined.filter(col("doc_id") % 2 === 1)
        .write.mode("append").parquet(s"$root/drop") }
    println("corpus rows: " + spark.read.parquet(s"$root/corpus").count())
    sys.exit(0)
  }
}
