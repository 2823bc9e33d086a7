package graft

import org.apache.spark.sql.functions._
import graft.functions.TextOps
import graft.operators.{Dedup, Packing, Sampling}

/** End-to-end composition check: the full pretraining data-prep flow —
  * scrub → quality gate → near-dedup → decontaminate → split → mix →
  * pack — run as ONE chained pipeline over the sf0.001 corpus, asserting
  * the conservation/containment invariants each stage must preserve. This
  * is the "a user could run their whole prep on this library" proof, not a
  * per-operator unit test.
  */
class PretrainPipelineSpec extends SparkSpec {
  import spark.implicits._

  test("full prep pipeline composes: clean → gate → dedup → decontam → split → mix → pack") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val total = docs.count()
    assert(total > 0)

    // 1. scrub PII in place
    val cleaned = docs.withColumn("text", TextOps.redactPii(col("text")))
    assert(cleaned.count() == total, "scrub is 1:1")

    // 2. quality gate (Gopher-ish): token count + stopword evidence
    val gated = cleaned
      .withColumn("__n_toks", TextOps.tokenCount(col("text")))
      .filter(col("__n_toks") >= 5)
      .drop("__n_toks")
    val nGated = gated.count()
    assert(nGated <= total && nGated > 0)

    // 3. near-dedup (minhash → clusters → keep-first)
    val deduped = Dedup.dropNearDups(gated, "doc_id", "text", threshold = 0.7)
    val nDeduped = deduped.count()
    assert(nDeduped <= nGated && nDeduped > 0)
    // idempotence: a second pass removes nothing
    assert(Dedup.dropNearDups(deduped, "doc_id", "text", threshold = 0.7).count() == nDeduped)

    // 4. decontaminate against a held-out "benchmark" slice
    val bench = docs.filter(col("doc_id") % 17 === 0).select("doc_id", "text")
    val decon = Dedup.decontaminate(deduped, bench, "doc_id", "text", n = 8, minHits = 1)
    val nDecon = decon.count()
    assert(nDecon <= nDeduped)
    // the invariant that defines the stage: zero remaining 8-gram overlap
    assert(Dedup.contaminationHits(decon, bench, "doc_id", "text", n = 8)
      .filter(col("n_hits") >= 1).count() == 0)

    // 5. deterministic split
    val split = Sampling.hashSplit(decon, "doc_id", Seq("train" -> 0.9, "val" -> 0.1))
    assert(split.count() == nDecon, "split is a partition, not a sample")
    val train = split.filter(col("split") === "train")

    // 6. training mix: upsample fr 2×
    val mixed = Sampling.weightedMix(train, "doc_id", "lang", Map("fr" -> 2.0))
    val frTrain = train.filter(col("lang") === "fr").count()
    assert(mixed.count() == train.count() + frTrain, "integer weight adds exact copies")

    // 7. pack into sequences; mix copies get a unique id so fill order and
    // shard assignment see them as distinct documents
    val packable = mixed.withColumn("copy_id",
      concat_ws("#", col("doc_id"), col("rep")))
    val packed = Packing.packSequences(packable, "copy_id", "text",
      budgetTokens = 512, shards = 16)
    // conservation: packed tokens == mixed corpus tokens + one EOS per doc
    val mixedToks = packable.agg(sum(TextOps.tokenCount(col("text")))).head().getLong(0)
    val packedStats = packed.agg(sum("n_toks"), sum("n_docs")).head()
    assert(packedStats.getLong(1) == mixed.count())
    assert(packedStats.getLong(0) == mixedToks + packedStats.getLong(1))
  }
}
