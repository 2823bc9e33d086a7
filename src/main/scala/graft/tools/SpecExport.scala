package graft.tools

/** Regenerates the checked-in spec assets from their inline definitions:
  * `runMain graft.tools.SpecExport` rewrites
  * `src/main/resources/specs/llm_pipeline_v3.json` (batch flagship,
  * `SpecJson.toJson(SparkEntry.llmPipelineV3Spec)`) and
  * `src/main/resources/specs/pretrain_ingest.json` (composed streaming
  * ingest, `SpecJson.ingestToJson(SparkEntry.pretrainIngestSpec)`).
  * SpecJsonSpec / StreamSpecSpec pin byte equality between file and
  * inline form, so editing either side without re-running this export
  * fails CI — the assets cannot silently drift from the code.
  */
object SpecExport {
  def main(args: Array[String]): Unit = {
    // back-compat: the pre-r13 form took the v3 asset FILE path; a .json
    // arg still means that, otherwise the arg is the output directory
    args.headOption.filter(_.endsWith(".json")).foreach { legacy =>
      val json = graft.plans.SpecJson.toJson(graft.SparkEntry.llmPipelineV3Spec)
      java.nio.file.Files.write(java.nio.file.Paths.get(legacy), json.getBytes("UTF-8"))
      println(s"wrote $legacy (${json.length} bytes)")
      return
    }
    val dir = args.headOption.getOrElse("src/main/resources/specs")
    def write(name: String, json: String): Unit = {
      val p = java.nio.file.Paths.get(s"$dir/$name")
      java.nio.file.Files.write(p, json.getBytes("UTF-8"))
      println(s"wrote $p (${json.length} bytes)")
    }
    write("llm_pipeline_v3.json",
      graft.plans.SpecJson.toJson(graft.SparkEntry.llmPipelineV3Spec))
    write("pretrain_ingest.json",
      graft.plans.SpecJson.ingestToJson(graft.SparkEntry.pretrainIngestSpec))
    write("window_topn.json",
      graft.plans.SpecJson.toJson(graft.SparkEntry.windowTopNSpec))
    write("ann_lifecycle.json",
      graft.plans.SpecJson.toJson(graft.SparkEntry.annLifecycleSpec))
  }
}
