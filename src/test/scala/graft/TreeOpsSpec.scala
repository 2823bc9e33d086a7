package graft

import org.apache.spark.sql.functions._
import graft.operators.TreeOps

/** P5/W3 tree flatten + rebuild (reference roundtrip test
  * `/root/reference/tests/jobs.js:572-605`).
  */
class TreeOpsSpec extends SparkSpec {

  val doc =
    """{"id":"root","name":"All","children":[
         {"id":"a","name":"A","children":[{"id":"a1","name":"A1"},{"id":"a2","name":"A2"}]},
         {"id":"b","name":"B"}]}"""

  test("flattenJson emits parent/level/mpath like job-tree-parser") {
    val flat = TreeOps.flattenJson(spark, doc)
    val rows = flat.select("id", "parent", "level", "mpath")
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2), r.getString(3))).toSet
    assert(rows == Set(
      ("root", "", 0, "root"),
      ("a", "root", 1, "root#a"),
      ("a1", "a", 2, "root#a#a1"),
      ("a2", "a", 2, "root#a#a2"),
      ("b", "root", 1, "root#b")))
  }

  test("flattenColumn flattens a corpus of trees distributed (per-row)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val docs = Seq(
      """{"id":"r1","name":"One","children":[{"id":"r1a","name":"A","children":[{"id":"r1a1","name":"A1"}]}]}""",
      """{"id":"r2","name":"Two","children":[{"id":"r2b","name":"B"}]}""").toDF("doc")
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      """id STRING, name STRING,
         children ARRAY<STRUCT<id: STRING, name: STRING,
           children: ARRAY<STRUCT<id: STRING, name: STRING>>>>""")
    val trees = docs.select(from_json(col("doc"), schema).as("tree"))
    val flat = TreeOps.flattenColumn(trees, "tree", maxDepth = 2)
    val got = flat.select("id", "parent", "level", "mpath").collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2), r.getString(3))).toSet
    assert(got == Set(
      ("r1", "", 0, "r1"), ("r1a", "r1", 1, "r1#r1a"), ("r1a1", "r1a", 2, "r1#r1a#r1a1"),
      ("r2", "", 0, "r2"), ("r2b", "r2", 1, "r2#r2b")))
  }

  test("rebuildJson ∘ flattenJson preserves the id/parent structure") {
    val flat = TreeOps.flattenJson(spark, doc)
    val rebuilt = TreeOps.rebuildJson(flat)
    val rootJson = rebuilt.filter(col("id") === "root").head().getString(1)
    // reparse and reflatten: same node set
    val reflat = TreeOps.flattenJson(spark, rootJson)
    val a = flat.select("id", "parent", "level").collect().map(_.toSeq).toSet
    val b = reflat.select("id", "parent", "level").collect().map(_.toSeq).toSet
    assert(a == b)
  }

  test("rebuildJson: parentless nodes become roots (forward-ref tolerance)") {
    import spark.implicits._
    val flat = Seq(
      ("x", "", 0, "x", """{"id":"x"}"""),
      ("orphan", "missing", 0, "orphan", """{"id":"orphan"}"""))
      .toDF("id", "parent", "level", "mpath", "payload")
    val out = TreeOps.rebuildJson(flat)
    assert(out.count() == 2) // both surface as roots at level 0
  }

  test("rebuildJson: orphan subtree at level > 0 surfaces as a root, not dropped") {
    import spark.implicits._
    val flat = Seq(
      ("x", "", 0, "x", """{"id":"x"}"""),
      ("orphan", "missing", 1, "orphan", """{"id":"orphan"}"""),
      ("okid", "orphan", 2, "orphan#okid", """{"id":"okid"}"""))
      .toDF("id", "parent", "level", "mpath", "payload")
    val out = TreeOps.rebuildJson(flat).collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out.keySet == Set("x", "orphan"))
    assert(out("orphan").contains(""""okid"""")) // keeps its own subtree
  }

  test("rebuildJson: empty-object payload still yields valid JSON") {
    import spark.implicits._
    val flat = Seq(
      ("r", "", 0, "r", "{}"),
      ("c", "r", 1, "r#c", """{"id":"c"}"""))
      .toDF("id", "parent", "level", "mpath", "payload")
    val json = TreeOps.rebuildJson(flat).head().getString(1)
    // parses cleanly and contains the child
    val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(json)
    assert(node.get("children").get(0).get("id").asText == "c")
  }
}
