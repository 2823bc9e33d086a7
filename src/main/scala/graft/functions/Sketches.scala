package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Approximate, *mergeable* aggregates — the 100 TB counting toolkit. The
  * pattern that matters at scale: sketch each shard/day/partition once
  * (narrow, single pass), persist the tiny binary sketch, and answer
  * global questions later by merging sketches — never re-scanning data.
  * All functions here are codegen'd Catalyst aggregates (Spark's built-in
  * HLL++ and Apache DataSketches HLL), no UDFs.
  */
object Sketches {

  /** Approximate distinct count (HyperLogLog++), single pass, map-side
    * partial aggregation. `rsd` = target relative standard deviation.
    */
  def approxDistinct(c: Column, rsd: Double = 0.05): Column =
    approx_count_distinct(c, rsd)

  /** Apache DataSketches HLL sketch of a column — a binary column you can
    * store per partition/day and merge later with [[hllMerge]].
    * lgK = log2 of the number of registers (12 → ±1.6% at 4 KiB).
    */
  def hllSketch(c: Column, lgK: Int = 12): Column =
    hll_sketch_agg(c, lit(lgK))

  /** Merge previously computed HLL sketches (the re-aggregation step:
    * daily sketches → monthly estimate without rescanning the days).
    */
  def hllMerge(sketch: Column): Column = hll_union_agg(sketch)

  /** Distinct-count estimate from a (possibly merged) HLL sketch. */
  def hllEstimate(sketch: Column): Column = hll_sketch_estimate(sketch)

  /** Approximate percentiles with bounded memory (GK/KLL-style), vs. the
    * exact `percentile` which buffers per group. `accuracy` trades memory
    * for error: 10000 → ±0.01% rank error.
    */
  def approxQuantiles(c: Column, probs: Seq[Double], accuracy: Int = 10000): Column =
    percentile_approx(c, array(probs.map(lit): _*), lit(accuracy))

  /** Misra–Gries heavy hitters: a MERGEABLE bounded-memory frequent-items
    * summary over a string column — the top-k path when the distinct-term
    * set is too large for an exact `(term, count)` shuffle (a zipfian web
    * vocabulary at 100 TB). The summary holds ≤ `capacity` counters.
    * Guarantees (Agarwal et al., "Mergeable Summaries", PODS'12): any item
    * with true frequency > N/(capacity+1) is present in the result, and
    * each reported count undercounts its true frequency by at most
    * N/(capacity+1). Merge = pointwise sum then subtract the
    * (capacity+1)-th largest counter — associative, so Spark's map-side
    * partial aggregation applies and per-shard summaries can be persisted
    * and merged later like the HLL sketches above.
    *
    * Usage: `ds.select(Sketches.frequentItems(64).toColumn)` or via
    * `groupByKey(...).agg(...)` for per-group heavy hitters.
    */
  class FrequentItems(capacity: Int)
      extends org.apache.spark.sql.expressions.Aggregator[
        String, Map[String, Long], Seq[(String, Long)]] {
    require(capacity > 0, "capacity must be positive")
    override def zero: Map[String, Long] = Map.empty
    private def shrink(m: Map[String, Long]): Map[String, Long] =
      if (m.size <= capacity) m
      else {
        // subtract the (capacity+1)-th largest count from everything
        val cut = m.values.toIndexedSeq.sorted(Ordering[Long].reverse)(capacity)
        m.collect { case (k, v) if v > cut => k -> (v - cut) }
      }
    override def reduce(b: Map[String, Long], a: String): Map[String, Long] =
      shrink(b + (a -> (b.getOrElse(a, 0L) + 1L)))
    override def merge(x: Map[String, Long], y: Map[String, Long]): Map[String, Long] =
      shrink(y.foldLeft(x) { case (acc, (k, v)) => acc + (k -> (acc.getOrElse(k, 0L) + v)) })
    override def finish(b: Map[String, Long]): Seq[(String, Long)] =
      b.toSeq.sortBy { case (k, v) => (-v, k) }
    override def bufferEncoder: org.apache.spark.sql.Encoder[Map[String, Long]] =
      org.apache.spark.sql.Encoders.kryo[Map[String, Long]]
    override def outputEncoder: org.apache.spark.sql.Encoder[Seq[(String, Long)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }

  def frequentItems(capacity: Int): FrequentItems = new FrequentItems(capacity)
}
