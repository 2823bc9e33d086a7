package graft.tools

/** Regenerates the checked-in flagship-v3 spec asset from the inline
  * definition: `runMain graft.tools.SpecExport` rewrites
  * `src/main/resources/specs/llm_pipeline_v3.json` with
  * `SpecJson.toJson(SparkEntry.llmPipelineV3Spec)`. SpecJsonSpec pins
  * byte equality between the two, so editing the inline spec without
  * re-running this export fails CI (and vice versa) — the asset cannot
  * silently drift from the code.
  */
object SpecExport {
  def main(args: Array[String]): Unit = {
    val out = args.headOption
      .getOrElse("src/main/resources/specs/llm_pipeline_v3.json")
    val json = graft.plans.SpecJson.toJson(graft.SparkEntry.llmPipelineV3Spec)
    java.nio.file.Files.write(java.nio.file.Paths.get(out),
      json.getBytes("UTF-8"))
    println(s"wrote $out (${json.length} bytes)")
  }
}
