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

  test("flagship-v3 spec with TRAINED centroids: the production semantic path composes end to end") {
    // the driver gate pins oracle-portable firstK centroids; this is the
    // same 10-stage DAG on the path a real corpus runs —
    // trainSemanticCentroids via SemanticDedupNodeSpec's default kmeans
    // mode — asserting the model-independent invariants: planted
    // exact-direction twins NEVER survive (identical cosines to every
    // centroid put a twin in its original's cell under ANY centroid set;
    // the exact-dedup stage double-guards the identical text), and the
    // selection is a nonempty subset of the organic corpus
    import graft.plans._
    val spec = PipelineSpec(nodes = Seq(
      "docs"   -> SourceSpec("parquet", "{%dir%}/documents.parquet"),
      "emb"    -> SourceSpec("parquet", "{%dir%}/embeddings.parquet"),
      "base"   -> MapSpec(RefSpec("docs"), Seq(
                    "doc_id" -> "doc_id", "text" -> "text", "lang" -> "lang")),
      "twins"  -> MapSpec(FilterSpec(RefSpec("base"), "doc_id < 16 AND doc_id % 50 != 0"),
                    Seq("doc_id" -> "doc_id + 100000", "text" -> "text", "lang" -> "lang")),
      "all"    -> UnionSpec(Seq(RefSpec("base"), RefSpec("twins"))),
      "bench"  -> FilterSpec(RefSpec("base"), "doc_id % 50 = 0"),
      "scored" -> QualityScoreNodeSpec(FilterSpec(RefSpec("all"), "doc_id % 50 != 0"),
                    "text", SparkEntry.qualityGateWeights),
      "passed" -> CacheSpec(FilterSpec(RefSpec("scored"), "quality_accept = 1")),
      "vbase"  -> MapSpec(RefSpec("emb"), Seq(
                    "vec_id" -> "vec_id", "embedding" -> "embedding")),
      "vtwins" -> MapSpec(FilterSpec(RefSpec("vbase"), "vec_id < 16 AND vec_id % 50 != 0"),
                    Seq("vec_id" -> "vec_id + 100000",
                        "embedding" -> "transform(embedding, x -> cast(x * cast(2 as float) as float))")),
      "vecs"   -> UnionSpec(Seq(RefSpec("vbase"), RefSpec("vtwins"))),
      "qvecs"  -> CacheSpec(JoinSpec(RefSpec("vecs"), RefSpec("passed"),
                    "vec_id", "doc_id", "left_semi", broadcastVocab = false)),
      "sem"    -> SemanticDedupNodeSpec(RefSpec("qvecs"), "vec_id", "embedding",
                    k = 4, threshold = 0.9), // default centroids = "kmeans"
      "semids" -> MapSpec(RefSpec("sem"), Seq("kid" -> "vec_id")),
      "qvids"  -> MapSpec(RefSpec("qvecs"), Seq("qid" -> "vec_id")),
      "keptA"  -> JoinSpec(RefSpec("passed"), RefSpec("semids"),
                    "doc_id", "kid", "left_semi", broadcastVocab = false),
      "keptB"  -> JoinSpec(RefSpec("passed"), RefSpec("qvids"),
                    "doc_id", "qid", "left_anti", broadcastVocab = false),
      "kept"   -> UnionSpec(Seq(RefSpec("keptA"), RefSpec("keptB"))),
      "spans"  -> SpanDedupNodeSpec(RefSpec("kept"), "doc_id", "text", k = 16),
      "nonempty" -> FilterSpec(RefSpec("spans"), "text != ''"),
      "deduped"  -> DedupNodeSpec(RefSpec("nonempty"), "doc_id", "text", mode = "exact"),
      "cleaned"  -> CacheSpec(DecontamNodeSpec(RefSpec("deduped"), RefSpec("bench"),
                      "doc_id", "text", n = 3, minHits = 1)),
      "sel"    -> DsirNodeSpec(RefSpec("cleaned"), FilterSpec(RefSpec("cleaned"), "lang = 'en'"),
                    "doc_id", "text", k = 16),
      "split"  -> SplitNodeSpec(RefSpec("sel"), "doc_id",
                    Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)),
      "train"  -> CacheSpec(FilterSpec(RefSpec("split"), "split = 'train'"))),
      out = "train")
    val out = PipelineCompiler.compile(
      SpecJson.fromJson(SpecJson.toJson(spec)), spark, Map("dir" -> sf))
    val ids = out.select("doc_id").as[Long].collect().toSet
    assert(ids.nonEmpty, "trained-centroid composite selected nothing")
    assert(ids.forall(_ < 100000L),
      s"planted twins leaked past the trained-centroid semantic tier: ${ids.filter(_ >= 100000L)}")
    assert(ids.size <= 16, "DSIR top-k bound violated")
  }
}
