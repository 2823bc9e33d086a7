package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference's hi-order join operators (SURVEY §2.4) as Catalyst joins.
  */
object Joins {

  /** Broadcast-hint the build side only when its optimizer-estimated size is
    * under the session's `spark.sql.autoBroadcastJoinThreshold`; otherwise
    * leave the strategy to Catalyst/AQE. An unconditional `broadcast()` hint
    * FORCES broadcast regardless of actual size — at 100× a mis-sized vocab
    * OOMs every executor, and AQE can never rescue a hinted plan.
    */
  private[graft] def maybeBroadcast(vocab: DataFrame): DataFrame = {
    val raw = vocab.sparkSession.conf
      .get("spark.sql.autoBroadcastJoinThreshold", "10485760").trim
    val threshold =
      if (raw.startsWith("-")) -1L
      else try org.apache.spark.network.util.JavaUtils.byteStringAsBytes(raw)
      catch { case _: Exception => -1L }
    val estimate = vocab.queryExecution.optimizedPlan.stats.sizeInBytes
    if (threshold > 0 && estimate <= BigInt(threshold)) broadcast(vocab) else vocab
  }

  /** H1 `Joiner` (`/root/reference/jobs/hi-order/job-joiner.js:35-102`):
    * enrich each record from one or more small "vocab" datasets.
    *
    * The reference drains every vocab into an in-heap JS map and does a
    * per-record lookup; the Spark-native equivalent is a broadcast hash
    * left-outer join — same left-outer pass-through semantics (a miss keeps
    * the record, `job-joiner.js:93-97`). The broadcast hint is size-gated by
    * [[maybeBroadcast]], so a vocab that turns out huge falls back to
    * Catalyst's own strategy choice (shuffled-hash / sort-merge, AQE-tunable).
    */
  def enrich(df: DataFrame, vocab: DataFrame, leftKey: Column, vocabKey: Column,
             select: Seq[Column] = Nil): DataFrame = {
    val joined = df.join(maybeBroadcast(vocab), leftKey === vocabKey, "left")
    if (select.isEmpty) joined else joined.select(select: _*)
  }

  /** H1 with several vocabs: chained size-gated broadcast joins (the
    * reference exposes N vocab maps in one context, `job-joiner.js:49-68`).
    */
  def enrichAll(df: DataFrame, vocabs: Seq[(DataFrame, Column)]): DataFrame =
    vocabs.foldLeft(df) { case (acc, (v, cond)) => acc.join(maybeBroadcast(v), cond, "left") }

  /** H2 `JoinDetail` (`/root/reference/jobs/hi-order/job-join-detail.js:55-117`)
    * for relational detail sources: attach to each master row the full set of
    * matching detail rows.
    *
    * The reference re-executes the detail source once per master row,
    * sequentially. Here the detail side is aggregated once
    * (`collect_list(struct(...))`) and joined — one shuffle on the key instead
    * of N correlated scans; a master with no details gets an empty array
    * (mirrors the reference's pass-through on detail error,
    * `job-join-detail.js:92-96`).
    *
    * @param detailCols columns to carry in each detail struct; default all
    *                   (the reference's full-row semantics). At scale pass
    *                   only the columns the consumer reads — the struct rides
    *                   the shuffle, so an unprojected 16-column detail row is
    *                   16× the needed shuffle volume.
    */
  def joinDetail(master: DataFrame, detail: DataFrame,
                 masterKey: String, detailKey: String,
                 as: String = "details",
                 detailCols: Seq[String] = Nil): DataFrame = {
    val carried = if (detailCols.isEmpty) detail.columns.toSeq else detailCols
    val packed = detail
      .groupBy(col(detailKey))
      .agg(collect_list(struct(carried.map(col): _*)).as(as))
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
    import org.apache.spark.sql.types.StructType
    val clash = payload.filter(left.columns.contains)
    require(clash.isEmpty,
      s"as-of payload columns ${clash.mkString(", ")} already exist on the left side — alias them on the right first")
    // The payload rides as ONE packed struct per right row: carrying columns
    // independently through last(..., ignoreNulls) would resurrect an older
    // row's value wherever the matched row has a null field — and could mix
    // fields from different right rows. The struct is non-null exactly when
    // the row is a right row, so last(ignoreNulls) picks the matched row
    // wholesale and its null fields stay null (DuckDB ASOF semantics).
    val payloadType = StructType(payload.map(p => right.schema(p)))
    val l = left
      .withColumn("__side", lit(1))
      .withColumn("__ts", col(leftTs))
      .withColumn("__payload", lit(null).cast(payloadType))
    val r = right.select(col(keyCol), col(rightTs).as("__ts"), lit(0).as("__side"),
      struct(payload.map(col): _*).as("__payload"))
    val unioned = l.unionByName(r, allowMissingColumns = true)
    // at equal ts the right row sorts first, so "ts >= rightTs" includes ties
    val w = Window.partitionBy(keyCol).orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = unioned.withColumn("__payload",
      last(col("__payload"), ignoreNulls = true).over(w))
    payload.foldLeft(carried.filter(col("__side") === 1)) { (df, p) =>
      df.withColumn(p, col(s"__payload.$p"))
    }.drop("__side", "__ts", "__payload")
  }

  /** Skew-salted equi-join: every left row gets a salt in `[0, salts)`, the
    * right side is replicated once per salt value, and the join key becomes
    * `(key, salt)` — a single hot key fans out over `salts` reducers instead
    * of stalling one. For the supported join types the result is IDENTICAL
    * to the plain join for any salt assignment (the right side covers every
    * salt), so the salt source only needs uniformity, not stability.
    *
    * Right/full outer joins are rejected: the replicated right side would
    * emit each UNMATCHED right row once per salt (matched rows are fine —
    * they pair with exactly one left salt), so the identity above breaks.
    *
    * Use when one side has a pathologically hot key and the other side is
    * small enough to replicate `salts`× but too big to broadcast; AQE's
    * skew-join split (on in [[graft.GraftSession]]) already handles moderate
    * skew without help.
    */
  private val saltableJoinTypes = Set(
    "inner", "left", "left_outer", "leftouter",
    "left_semi", "leftsemi", "semi", "left_anti", "leftanti", "anti")

  def saltedJoin(left: DataFrame, right: DataFrame,
                 leftKey: String, rightKey: String, salts: Int,
                 joinType: String = "inner"): DataFrame = {
    require(salts > 0, "salts must be positive")
    require(saltableJoinTypes(joinType.toLowerCase.replace(" ", "_")),
      s"saltedJoin supports inner/left/left_semi/left_anti, not '$joinType': " +
        "right/full outer would replicate unmatched right rows once per salt")
    val l = left.withColumn("__salt",
      pmod(hash(monotonically_increasing_id()), lit(salts)))
    val r = right.withColumn("__salt",
      explode(array((0 until salts).map(lit(_)): _*)))
    l.join(r, l(leftKey) === r(rightKey) && l("__salt") === r("__salt"), joinType)
      .drop("__salt")
  }

  /** Binned point-in-interval range join: pair every `points` row whose
    * `pointCol` falls in `[loCol, hiCol]` of an `intervals` row (both bounds
    * inclusive).
    *
    * Spark plans a raw `p BETWEEN lo AND hi` join as a broadcast/cartesian
    * nested loop — O(points × intervals), a scale-killer past toy sizes. The
    * binned formulation turns it into an EQUI-join: intervals replicate onto
    * every `binWidth`-sized bin they cover (`sequence(floor(lo/w),
    * floor(hi/w))`), a point lands in exactly one bin, and the exact
    * predicate re-filters within the bin. Each (point, interval) pair meets
    * in precisely one bin — the point's — so no post-join dedup is needed.
    * Cost: shuffle O(points + intervals × avgSpan/binWidth); pick `binWidth`
    * near the typical interval span so replication stays a small constant.
    * AQE handles hot bins (skew-join split).
    *
    * Columns are numeric (cast timestamps/dates to epoch first); all interval
    * columns are carried, so downstream projects what it needs.
    */
  def rangeJoin(points: DataFrame, intervals: DataFrame,
                pointCol: String, loCol: String, hiCol: String,
                binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val p = points.withColumn("__bin", floor(col(pointCol) / binWidth))
    val i = intervals.withColumn("__bin",
      explode(sequence(floor(col(loCol) / binWidth), floor(col(hiCol) / binWidth))))
    p.join(i, Seq("__bin"))
      .filter(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("__bin")
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
