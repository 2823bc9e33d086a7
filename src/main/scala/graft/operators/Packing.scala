package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Sequence packing for pretraining batches: assign every document a
  * `(shard, bin)` so that, within a shard, consecutive documents in a
  * deterministic hash order fill bins of ≈ `budgetTokens` tokens (greedy
  * first-fit in order; a document straddling the boundary stays in the bin
  * it started — bins overflow by at most one document, never underfill).
  *
  * Scale shape: documents are first split into `shards` deterministic
  * md5-prefix groups, and the running token sum is a window per shard —
  * each shard sorts in one task, so pick `shards` ≈ corpus/10M docs at
  * scale (256 default suits up to low-billions). Assignment is pure
  * expressions + one window shuffle, reproducible across engines and runs
  * — the property a random packing can't give a resumable pipeline.
  */
object Packing {

  def packBins(df: DataFrame, idCol: String, tokenCol: String,
               budgetTokens: Long, shards: Int = 256): DataFrame = {
    val hexChars = Seq(16, 256, 4096, 65536).indexOf(shards) + 1
    require(hexChars > 0, "shards must be a power of 16 (16/256/4096/65536)")
    val shard = substring(md5(col(idCol).cast("string")), 1, hexChars)
    val w = Window.partitionBy(shard)
      .orderBy(Sampling.hashBucket(col(idCol)), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = sum(col(tokenCol)).over(w)
    // floor of a double division, not a long cast: engines disagree on
    // double→int conversion (truncate vs round); floor() they agree on
    df.withColumn("shard", shard)
      .withColumn("bin", floor((cum - col(tokenCol)) / budgetTokens).cast("long"))
  }
}
