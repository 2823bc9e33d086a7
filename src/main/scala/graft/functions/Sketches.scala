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
}
