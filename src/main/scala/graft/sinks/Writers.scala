package graft.sinks

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Sink connectors (SURVEY §2.5). The reference writes to `file:`/`http:`/
  * `mongodb:` URLs (`/root/reference/utils.js:15-59`); here file-system
  * sinks are Spark-native writers (distributed, atomic via job commit) and
  * push-style sinks (HTTP/Mongo-like) are `foreachPartition` with an
  * injected transport — one connection per partition, the scale-safe shape.
  */
object Writers {

  /** W2 `WriterJSONS` (`job-writer-jsons.js:17-38`): NDJSON out. The
    * reference strips embedded newlines per record (`:33`); Spark's JSON
    * writer never emits raw newlines inside a record (they are escaped),
    * so semantics hold by construction.
    */
  def ndjson(df: DataFrame, path: String, overwrite: Boolean = true): Unit =
    df.write.mode(if (overwrite) "overwrite" else "error").json(path)

  /** W1 `WriterJSON` (`job-writer-json.js:19-45`): the whole result as ONE
    * JSON array in ONE file. Single-file output is inherently a 1-writer
    * operation — acceptable for vocab-sized results (the reference's use);
    * large results should use [[ndjson]]/parquet. Records are concatenated
    * in the order of `orderBy` if the caller sorted, else partition order.
    */
  def jsonArray(df: DataFrame, file: String): Unit = {
    val json = df.toJSON.coalesce(1)
    val it = json.toLocalIterator()
    val w = new java.io.PrintWriter(new java.io.BufferedWriter(new java.io.OutputStreamWriter(
      new java.io.FileOutputStream(file), java.nio.charset.StandardCharsets.UTF_8)))
    try {
      w.print("[")
      var first = true
      while (it.hasNext) {
        if (!first) w.print(", ")
        w.print(it.next()); first = false
      }
      w.print("]")
    } finally w.close()
  }

  /** Parquet sink — the engine's preferred at-scale format (columnar,
    * predicate-pushdown-able, splittable); optional partition columns for
    * downstream partition pruning.
    */
  def parquet(df: DataFrame, path: String, partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(path)
  }

  /** Push sink (HTTP POST / Mongo insert / ...): batches of serialized
    * records handed to an injected `post` transport, per partition. Batches
    * bound memory; the transport owns retry/auth. Offline tests inject an
    * accumulator-backed poster.
    */
  def push(df: DataFrame, batchSize: Int, post: Seq[String] => Unit): Unit =
    df.toJSON.foreachPartition { (it: Iterator[String]) =>
      it.grouped(batchSize).foreach(post)
    }

  /** Noop sink (C9 `Nothing`, `job-nothing.js:10-12`) — executes the full
    * plan, materializes nothing; used by benchmarks.
    */
  def noop(df: DataFrame): Unit = df.write.format("noop").mode("overwrite").save()

  /** Range-sorted data layout: rows are range-partitioned on `cols` and
    * sorted within each partition before the parquet write, so (a) each
    * output file covers a DISJOINT key range and (b) parquet row-group
    * min/max stats are tight. A later scan filtering on the layout key
    * prunes most files/row-groups at the footer — the clustered-layout
    * (Z-order-lite, single-dimension) play that turns a 100 TB full scan
    * into a targeted read. Complementary to [[bucketedTable]]: buckets
    * kill the JOIN shuffle, sorted layout kills the FILTER scan.
    */
  def sortedLayout(df: DataFrame, path: String, cols: Seq[String],
                   partitions: Int = 0): Unit = {
    val keys = cols.map(col)
    val ranged =
      if (partitions > 0) df.repartitionByRange(partitions, keys: _*)
      else df.repartitionByRange(keys: _*)
    ranged.sortWithinPartitions(keys: _*).write.mode("overwrite").parquet(path)
  }

  /** Bucketed managed table: data is hash-partitioned into `buckets` files
    * per partition on `bucketCol` AND sorted within buckets at WRITE time, so
    * every later join/aggregation on that column reads pre-shuffled,
    * pre-sorted data — zero Exchange, zero Sort in the plan (asserted in
    * `PlanQualitySpec`). This is the co-located-join layout for fact tables
    * that are joined on the same key query after query; at 100 TB it converts
    * the dominant recurring shuffle into a one-time write cost.
    */
  def bucketedTable(df: DataFrame, table: String, bucketCol: String, buckets: Int): Unit =
    // repartition on the bucket column first: one writer task per bucket ⇒
    // ONE file per bucket. Spark only elides the read-side Sort when a bucket
    // is a single file (multi-file buckets are only individually sorted), and
    // one-file buckets are also the small-files-safe layout at scale.
    df.repartition(buckets, col(bucketCol))
      .write.mode("overwrite").format("parquet")
      .bucketBy(buckets, bucketCol).sortBy(bucketCol).saveAsTable(table)
}
