package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference's hi-order join operators (SURVEY §2.4) as Catalyst joins.
  */
object Joins {

  /** H1 `Joiner` (`/root/reference/jobs/hi-order/job-joiner.js:35-102`):
    * enrich each record from one or more small "vocab" datasets.
    *
    * The reference drains every vocab into an in-heap JS map and does a
    * per-record lookup; the Spark-native equivalent is a broadcast hash
    * left-outer join — same left-outer pass-through semantics (a miss keeps
    * the record, `job-joiner.js:93-97`), but the build side is shipped once
    * per executor instead of living on one thread, and Catalyst may also
    * choose shuffled-hash if a "vocab" turns out huge.
    */
  def enrich(df: DataFrame, vocab: DataFrame, leftKey: Column, vocabKey: Column,
             select: Seq[Column] = Nil): DataFrame = {
    val joined = df.join(broadcast(vocab), leftKey === vocabKey, "left")
    if (select.isEmpty) joined else joined.select(select: _*)
  }

  /** H1 with several vocabs: chained broadcast joins (the reference exposes
    * N vocab maps in one context, `job-joiner.js:49-68`).
    */
  def enrichAll(df: DataFrame, vocabs: Seq[(DataFrame, Column)]): DataFrame =
    vocabs.foldLeft(df) { case (acc, (v, cond)) => acc.join(broadcast(v), cond, "left") }

  /** H2 `JoinDetail` (`/root/reference/jobs/hi-order/job-join-detail.js:55-117`)
    * for relational detail sources: attach to each master row the full set of
    * matching detail rows.
    *
    * The reference re-executes the detail source once per master row,
    * sequentially. Here the detail side is aggregated once
    * (`collect_list(struct(*))`) and joined — one shuffle on the key instead
    * of N correlated scans; a master with no details gets an empty array
    * (mirrors the reference's pass-through on detail error,
    * `job-join-detail.js:92-96`).
    */
  def joinDetail(master: DataFrame, detail: DataFrame,
                 masterKey: String, detailKey: String,
                 as: String = "details"): DataFrame = {
    val packed = detail
      .groupBy(col(detailKey))
      .agg(collect_list(struct(detail.columns.map(col): _*)).as(as))
    master
      .join(packed, master(masterKey) === packed(detailKey), "left")
      .drop(packed(detailKey))
      .withColumn(as, coalesce(col(as), array()))
  }

  /** As-of join (beyond the reference surface, SURVEY §2.8): for each left
    * row, the single latest right row with `rightTs <= leftTs` on the same
    * key — the canonical event-enrichment join.
    *
    * Implementation is the scale-lean formulation: tag both sides, union,
    * ONE sort per key partition, and carry the last-seen right payload
    * forward with a window. A naive key-equi join with a range predicate
    * fans out every left row to ALL earlier right rows before aggregating —
    * quadratic per key; this stays O(n log n) with a single shuffle.
    */
  def asofJoin(left: DataFrame, right: DataFrame,
               keyCol: String, leftTs: String, rightTs: String,
               payload: Seq[String]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val clash = payload.filter(left.columns.contains)
    require(clash.isEmpty,
      s"as-of payload columns ${clash.mkString(", ")} already exist on the left side — alias them on the right first")
    val l = left
      .withColumn("__side", lit(1))
      .withColumn("__ts", col(leftTs))
      .withColumns(payload.map(p => p -> lit(null).cast(right.schema(p).dataType)).toMap)
    val r = right.select(
      (col(keyCol) +: col(rightTs).as("__ts") +: lit(0).as("__side") +:
        payload.map(col)): _*)
    val unioned = l.unionByName(r, allowMissingColumns = true)
    // at equal ts the right row sorts first, so "ts >= rightTs" includes ties
    val w = Window.partitionBy(keyCol).orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = payload.foldLeft(unioned) { (df, p) =>
      df.withColumn(p, last(when(col("__side") === 0, col(p)), ignoreNulls = true).over(w))
    }
    carried.filter(col("__side") === 1).drop("__side", "__ts")
  }

  /** H2 for *external* (per-row API) detail sources: a distributed correlated
    * fetch. `fetchDetails` runs once per master row inside `mapPartitions`,
    * so connections/rate-limiters are amortized per partition (the
    * scale-safe shape for the reference's per-row HTTP fetches,
    * `examples/trud.js:55`). The transport is injected — tests use a local
    * function; production would use an HTTP client pool.
    */
  def joinDetailExternal[K, M, D](
      master: org.apache.spark.sql.Dataset[M],
      keyOf: M => K,
      fetchDetails: K => Seq[D])(
      implicit enc: org.apache.spark.sql.Encoder[(M, Seq[D])])
      : org.apache.spark.sql.Dataset[(M, Seq[D])] =
    master.mapPartitions { rows =>
      // one client / rate-limit domain per partition
      rows.map(m => (m, fetchDetails(keyOf(m))))
    }
}
