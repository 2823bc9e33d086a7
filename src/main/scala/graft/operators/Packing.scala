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

  /** Sliding-window chunking: split each document into token windows of
    * `chunkTokens`, starting every `stride` tokens (stride < chunkTokens ⇒
    * overlapping chunks, the context-window prep for long-document
    * pretraining). Output: one row per (doc, chunk) with `chunk_id`
    * (0-based), the chunk's token array, and its token count. Trailing
    * windows may be short; empty documents produce no chunks.
    *
    * Scale shape: a pure per-row `posexplode` projection — narrow, no
    * shuffle, stays in whole-stage codegen. Fan-out is bounded by
    * ⌈tokens/stride⌉ rows per document.
    */
  def chunkDocs(df: DataFrame, idCol: String, textCol: String,
                chunkTokens: Int, stride: Int): DataFrame = {
    require(chunkTokens > 0 && stride > 0, "chunkTokens and stride must be positive")
    df.select(col(idCol), graft.functions.TextOps.tokens(col(textCol)).as("__toks"))
      .filter(size(col("__toks")) > 0)
      .select(col(idCol),
        posexplode(transform(
          sequence(lit(0), size(col("__toks")) - 1, lit(stride)),
          st => slice(col("__toks"), st + 1, lit(chunkTokens))))
          .as(Seq("chunk_id", "chunk_toks")))
      .withColumn("n_toks", size(col("chunk_toks")).cast("long"))
  }

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
