package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Hierarchical-JSON ↔ flat-records duality:
  * P5 `ParserJSONTree` (`/root/reference/jobs/parsers/job-tree-parser.js:22-86`)
  * flattens `{id, children:[...]}` documents into parent-keyed rows;
  * W3 `WriterJSONTree` (`/root/reference/jobs/writers/job-tree-writer.js:23-128`)
  * rebuilds the nesting.
  *
  * The reference buffers whole documents in heap and recurses. Here:
  *  - flatten = iterative `explode` of the children column, one level per
  *    step, accumulating level/parent/materialized-path — each step is a
  *    narrow map over the frontier (no shuffle), so depth-D flatten of any
  *    corpus is D scans of ever-smaller frontiers;
  *  - rebuild = depth-iterated `collect_list(struct)` self-joins from the
  *    leaves up, which keeps assembly distributed until the final root
  *    serialization.
  */
object TreeOps {

  case class FlatNode(id: String, parent: String, level: Int, mpath: String, payload: String)

  /** Flatten a nested JSON document (string) into FlatNode rows.
    * `payload` carries the node minus its children, as JSON (the reference's
    * records are schemaless; a typed schema can be projected afterwards with
    * `from_json`).
    *
    * Config mirrors `job-tree-parser.js:12-19`: childrenKey, idKey, separator.
    */
  def flattenJson(spark: SparkSession, json: String,
                  childrenKey: String = "children", idKey: String = "id",
                  mpathSep: String = "#"): DataFrame = {
    import spark.implicits._
    // Driver-side recursive descent over ONE document (the reference parses
    // one buffered doc too, `job-tree-parser.js:68-71`); for a corpus of
    // documents use [[flattenColumn]] which runs per-row on executors.
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val out = scala.collection.mutable.ArrayBuffer.empty[FlatNode]
    def walk(node: com.fasterxml.jackson.databind.JsonNode, parent: String,
             level: Int, path: String): Unit = {
      val id = Option(node.get(idKey)).map(_.asText).getOrElse("")
      val mpath = if (path.isEmpty) id else path + mpathSep + id
      val copy = node.deepCopy[com.fasterxml.jackson.databind.node.ObjectNode]()
      copy.remove(childrenKey)
      out += FlatNode(id, parent, level, mpath, copy.toString)
      val kids = node.get(childrenKey)
      if (kids != null && kids.isArray) {
        val it = kids.elements()
        while (it.hasNext) walk(it.next(), id, level + 1, mpath)
      }
    }
    walk(mapper.readTree(json), "", 0, "")
    out.toSeq.toDF()
  }

  /** Flatten a *column* of nested documents (bounded depth), fully
    * distributed: at each level the current frontier's children arrays are
    * exploded; nodes at that depth are emitted with parent/level/mpath.
    * The node schema must be the recursive `{id, ..., children:array<...>}`
    * shape up to `maxDepth` (Spark schemas are finite — unbounded recursion
    * would need a custom Generator; SURVEY §7.4.4).
    */
  def flattenColumn(df: DataFrame, treeCol: String, maxDepth: Int,
                    childrenKey: String = "children", idKey: String = "id",
                    mpathSep: String = "#"): DataFrame = {
    def hasChildren(t: DataType): Boolean = t match {
      case s: StructType => s.fieldNames.contains(childrenKey)
      case _ => false
    }
    var frontier = df.select(
      col(treeCol).as("node"),
      lit("").as("parent"), lit(0).as("level"),
      col(s"$treeCol.$idKey").cast("string").as("mpath"))
    var out: Option[DataFrame] = None
    var depth = 0
    var done = false
    while (depth <= maxDepth && !done) {
      val nodeType = frontier.schema("node").dataType.asInstanceOf[StructType]
      val payloadFields = nodeType.fieldNames.filterNot(_ == childrenKey)
      val emitted = frontier.select(
        col(s"node.$idKey").cast("string").as("id"),
        col("parent"), col("level"), col("mpath"),
        to_json(struct(payloadFields.map(f => col(s"node.$f")): _*)).as("payload"))
      out = Some(out.map(_.unionByName(emitted)).getOrElse(emitted))
      if (nodeType.fieldNames.contains(childrenKey) &&
          hasChildren(nodeType(childrenKey).dataType match {
            case ArrayType(e, _) => e; case other => other })) {
        frontier = frontier
          .select(col(s"node.$idKey").cast("string").as("parent"),
                  col("level"), col("mpath"),
                  explode(col(s"node.$childrenKey")).as("node"))
          .select(col("node"), col("parent"), (col("level") + 1).as("level"),
                  concat(col("mpath"), lit(mpathSep), col(s"node.$idKey").cast("string")).as("mpath"))
        depth += 1
      } else if (nodeType.fieldNames.contains(childrenKey)) {
        // last real level: children are leaf structs
        frontier = frontier
          .select(col(s"node.$idKey").cast("string").as("parent"),
                  col("level"), col("mpath"),
                  explode(col(s"node.$childrenKey")).as("node"))
          .select(col("node"), col("parent"), (col("level") + 1).as("level"),
                  concat(col("mpath"), lit(mpathSep), col(s"node.$idKey").cast("string")).as("mpath"))
        val leafType = frontier.schema("node").dataType.asInstanceOf[StructType]
        val leafPayload = leafType.fieldNames.filterNot(_ == childrenKey)
        val leaves = frontier.select(
          col(s"node.$idKey").cast("string").as("id"),
          col("parent"), col("level"), col("mpath"),
          to_json(struct(leafPayload.map(f => col(s"node.$f")): _*)).as("payload"))
        out = Some(out.get.unionByName(leaves))
        done = true
      } else done = true
    }
    out.get
  }

  /** W3 rebuild: flat `{id, parent, payload-json, level}` rows → one nested
    * JSON string per root. Distributed bottom-up assembly: iterate from the
    * deepest level, each step grouping children JSON under their parent via
    * `collect_list` + an injected `children` key — D shuffles for depth D,
    * every step executor-side. Forward references / missing parents behave
    * like the reference: a subtree whose parent id does not exist at the
    * level above surfaces as an extra root (`job-tree-writer.js:88-94`).
    * Children are serialized in sorted-JSON order (a deterministic canonical
    * order; the reference's arrival order is meaningless once distributed).
    */
  def rebuildJson(flat: DataFrame, childrenKey: String = "children",
                  idCol: String = "id", parentCol: String = "parent",
                  payloadCol: String = "payload"): DataFrame = {
    val levels = flat.select(col(idCol).cast("string").as("id"),
                             col(parentCol).cast("string").as("parent"),
                             col(payloadCol).as("payload"),
                             col("level").cast("int").as("level"))
    val maxLevel = levels.agg(max("level")).head().getInt(0)
    // assembled: id -> full nested json for the subtree rooted at id
    var assembled = levels.filter(col("level") === maxLevel)
      .select(col("id"), col("parent"), col("payload").as("json"))
    var orphanRoots: Option[DataFrame] = None
    var lvl = maxLevel - 1
    while (lvl >= 0) {
      val current = levels.filter(col("level") === lvl)
      // subtrees with no parent at the level above become roots (orphans)
      val orphans = assembled.join(current.select(col("id").as("pid0")),
          assembled("parent") === col("pid0"), "left_anti")
        .select(col("id"), col("json"))
      orphanRoots = Some(orphanRoots.map(_.unionByName(orphans)).getOrElse(orphans))
      val kids = assembled
        .groupBy(col("parent").as("pid"))
        .agg(concat(lit(s""""$childrenKey":["""),
                    concat_ws(",", sort_array(collect_list(col("json")))),
                    lit("]")).as("kids_json"))
      assembled = current.join(kids, current("id") === kids("pid"), "left")
        .select(current("id"), current("parent"),
          when(col("kids_json").isNull, col("payload"))
            .when(length(col("payload")) === 2, // empty-object payload "{}"
              concat(lit("{"), col("kids_json"), lit("}")))
            .otherwise(concat(expr("substring(payload, 1, length(payload)-1)"),
                              lit(","), col("kids_json"), lit("}"))).as("json"))
      lvl -= 1
    }
    val roots = assembled.select(col("id"), col("json"))
    orphanRoots.map(o => roots.unionByName(o)).getOrElse(roots)
  }
}
