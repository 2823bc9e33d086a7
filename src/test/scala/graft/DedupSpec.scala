package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup
import graft.functions.{TextOps, VectorOps}

class DedupSpec extends SparkSpec {
  import spark.implicits._

  val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy dog"),      // exact dup of 1
    (3L, "the quick brown fox leaps over the lazy dog"),      // near dup of 1
    (4L, "completely different content about spark engines"),
    (5L, "about spark engines completely different content") // permutation of 4 (same bag-of-words)
  ).toDF("doc_id", "text")

  test("exact dedup keeps first by order col and counts dups") {
    val out = Dedup.exact(docs, "text", "doc_id")
    val kept = out.select("doc_id", "dup_count").as[(Long, Long)].collect().toMap
    assert(kept(1L) == 2L)      // doc 2 folded into doc 1
    assert(!kept.contains(2L))
    assert(kept.contains(3L))   // near-dup is NOT an exact dup
    // 4 and 5 share the same bag of words → same fingerprint
    assert(kept(4L) == 2L && !kept.contains(5L))
  }

  test("minhash LSH finds the near-duplicate pair and estimates jaccard") {
    val pairs = Dedup.minhashDedupPairs(docs, "doc_id", "text", threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(pairs.exists { case (a, b, _) => a == 1L && b == 2L }) // exact pair
    assert(pairs.exists { case (a, b, j) => a == 1L && b == 3L && j > 0.5 })
    // unrelated docs don't pair with the fox docs
    assert(!pairs.exists { case (a, b, _) => a <= 3L && b >= 4L })
  }

  test("minhash estimate tracks exact jaccard") {
    val cands = Dedup.minhashCandidates(docs, "doc_id", "text")
      .filter(col("id_a") === 1 && col("id_b") === 3).head()
    val est = cands.getDouble(2)
    val exact = docs.filter(col("doc_id").isin(1, 3))
      .agg(collect_list(TextOps.charShingles(col("text"), 5)).as("s"))
      .select(Dedup.ngramJaccard(element_at(col("s"), 1), element_at(col("s"), 2)))
      .head().getDouble(0)
    assert(math.abs(est - exact) < 0.2, s"est=$est exact=$exact")
  }

  test("simhash: identical docs have identical signatures, near dups are close") {
    val sig = Dedup.simhash64(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sig(1L) == sig(2L))
    assert(java.lang.Long.bitCount(sig(1L) ^ sig(3L)) <= 16)
    assert(java.lang.Long.bitCount(sig(1L) ^ sig(4L)) > 16)
  }

  test("simhashPairs returns hamming-bounded pairs") {
    val pairs = Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.contains((1L, 2L)))
    // bag-of-words equal docs 4/5 also have identical token sets → distance 0
    assert(pairs.contains((4L, 5L)))
  }

  test("embedding cosine dedup finds planted near-identical vectors") {
    val rnd = new scala.util.Random(7)
    val base = Array.fill(16)(rnd.nextGaussian().toFloat)
    val nearDup = base.zipWithIndex.map { case (v, i) => if (i == 0) v + 0.01f else v }
    val other = Array.fill(16)(rnd.nextGaussian().toFloat)
    val df = Seq((1L, base), (2L, nearDup), (3L, other)).toDF("vec_id", "embedding")
    val pairs = Dedup.embeddingDupPairs(df, "vec_id", "embedding", dim = 16,
      threshold = 0.99, bands = 4, bits = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._2 == 3L || p._1 == 3L))
  }

  test("IVF ANN recalls most of the brute-force top-k") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val queries = emb.filter(col("vec_id") < 10)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val exact = pairs(VectorOps.bruteForceTopK(queries, emb, k = 5))
    val ivf = pairs(VectorOps.ivfTopK(queries, emb, k = 5, nlist = 8, nprobe = 3))
    val recall = (exact intersect ivf).size.toDouble / exact.size
    assert(recall >= 0.5, s"IVF recall too low: $recall")
  }

  test("brute-force ANN ranks the planted neighbor first") {
    val rnd = new scala.util.Random(11)
    val base = Array.fill(16)(rnd.nextGaussian().toFloat)
    val near = base.map(v => v * 1.001f)
    val vecs = Seq((0L, base), (1L, near)) ++
      (2L to 20L).map(i => i -> Array.fill(16)(rnd.nextGaussian().toFloat))
    val df = vecs.toDF("vec_id", "embedding")
    val top = VectorOps.bruteForceTopK(df.filter(col("vec_id") === 0), df, k = 3)
      .filter(col("rank") === 1).head()
    assert(top.getLong(1) == 1L) // nearest neighbor of 0 is 1
    assert(top.getDouble(2) > 0.999)
  }
}
