package graft.tools

import org.apache.spark.sql.functions._

/** Ad-hoc vs persisted IVF: the ad-hoc tier pays k-means training + full
  * corpus assignment on EVERY query batch; the index pays it once at build.
  * Prints build cost and per-query-batch medians for both paths (and the
  * int8-codec index) — the numbers behind SCALING.md's persisted-index row.
  *
  * `--big [nVec]` runs the LARGE-SCALE characterization instead
  * (SCALING.md's 1M-vector index table): a [[SemanticStressCorpus]] of
  * `nVec` (default 10⁶) vectors, nlist ≈ √N (the classic IVF operating
  * point), ~100 spread queries, and for nprobe ∈ {1, 2, 4, 8}: per-batch
  * latency + recall@20 against the exact top-20 (neighbor-id set
  * intersection). Also prints build wall + store bytes for both codecs
  * (int8 built from the float index's pinned centroids, so the codec rows
  * differ only in codec).
  */
object IvfIndexProbe {

  /** Mean per-query |approx ∩ exact| / |exact| over the top-k id sets. */
  private def recallAt(approx: org.apache.spark.sql.DataFrame,
                       exact: org.apache.spark.sql.DataFrame): Double = {
    val hits = approx.select("query_id", "neighbor_id")
      .join(exact.select("query_id", "neighbor_id"),
        Seq("query_id", "neighbor_id"), "left_semi").count()
    hits.toDouble / exact.count()
  }

  /** Tie-aware recall: a retrieved neighbor counts when its cosine is at
    * least the exact k-th neighbor's — the standard correction when the
    * ground-truth boundary is a dense tie band (id-set recall punishes
    * returning a DIFFERENT member of the same-cosine band, which no
    * consumer can distinguish).
    */
  private def tieRecallAt(approx: org.apache.spark.sql.DataFrame,
                          exact: org.apache.spark.sql.DataFrame): Double = {
    val kth = exact.groupBy("query_id").agg(min(col("cos_sim")).as("__kth"))
    val hits = approx.join(kth, Seq("query_id"))
      .filter(col("cos_sim") >= col("__kth")).count()
    math.min(1.0, hits.toDouble / exact.count())
  }

  private def big(nVec: Long): Unit = {
    val spark = graft.GraftSession.builder(master = "local[32]", shufflePartitions = 32)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val root = java.nio.file.Files.createTempDirectory("ivfbig").toString
    val (embRaw, _) = SemanticStressCorpus.build(spark, nVec)
    embRaw.write.mode("overwrite").parquet(s"$root/corpus")
    val emb = spark.read.parquet(s"$root/corpus")
    val n = emb.count()
    val nlist = math.max(16, math.sqrt(n.toDouble).toInt)
    println(s"IVFBIG corpus n=$n nlist=$nlist (sqrt-N) root=$root")
    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }
    def run(df: => org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // RAW tier (normalize = false EXPLICIT since r15's default flip): the
    // misaligned-routing contrast the normalized rows are measured against
    val (_, buildF) = time(graft.operators.VectorIndex.buildIvfIndex(
      emb, s"$root/f", nlist = nlist, trainSampleCap = 100000L, normalize = false))
    // int8 from the SAME pinned centroids: the codec rows differ only in codec
    val cents = graft.operators.VectorIndex.readCentroids(spark, s"$root/f")
    val (_, buildI) = time(graft.operators.VectorIndex.buildIvfIndexPinned(
      emb, s"$root/i", cents, codec = "int8"))
    def duOf(p: String): Long = {
      val f = new java.io.File(p)
      if (f.isFile) f.length
      else Option(f.listFiles).map(_.map(x => duOf(x.getPath)).sum).getOrElse(0L)
    }
    println(f"IVFBIG build float=$buildF%7.1f s (${duOf(s"$root/f/cells") / 1e6}%8.1f MB) " +
      f"int8=$buildI%7.1f s (${duOf(s"$root/i/cells") / 1e6}%8.1f MB, pinned centroids)")

    // ~100 queries spread across the copy generations (exact twins,
    // near dups, mixtures — mixed retrieval difficulty); the modulus
    // scales with n so the brute-force baseline stays ~100 × n pairs
    val qmod = if (n > 2000000) 100003L else 10007L
    val queries = emb.filter(pmod(col("vec_id"), lit(qmod)) === 0)
      .localCheckpoint(true)
    val nq = queries.count()
    val (exact, exactWall) = time {
      val e = graft.functions.VectorOps.bruteForceTopK(queries, emb, 20)
        .localCheckpoint(true)
      e.count(); e
    }
    println(f"IVFBIG exact_top20 queries=$nq wall=$exactWall%7.1f s (the brute-force baseline)")

    for (nprobe <- Seq(1, 2, 4, 8)) {
      val (ap, w1) = time {
        val a = graft.operators.VectorIndex.ivfTopKIndexed(
          queries, s"$root/f", k = 20, nprobe = nprobe).localCheckpoint(true)
        a.count(); a
      }
      val (_, w2) = time(run(graft.operators.VectorIndex.ivfTopKIndexed(
        queries, s"$root/f", k = 20, nprobe = nprobe)))
      val r = recallAt(ap, exact)
      val tr = tieRecallAt(ap, exact)
      println(f"IVFBIG nprobe=$nprobe%2d recall@20=$r%6.4f tie_recall@20=$tr%6.4f " +
        f"batch_wall=${math.min(w1, w2)}%6.2f s " +
        f"(scan ~${100.0 * math.min(nprobe, nlist) / nlist}%4.1f%% of cells)")
    }
    // the int8 codec at the recommended default, for the quantization cost
    val (ap8, w8) = time {
      val a = graft.operators.VectorIndex.ivfTopKIndexed(
        queries, s"$root/i", k = 20, nprobe = 8).localCheckpoint(true)
      a.count(); a
    }
    println(f"IVFBIG int8 nprobe= 8 recall@20=${recallAt(ap8, exact)}%6.4f batch_wall=$w8%6.2f s")

    // DEFAULT path (r15: nlist omitted → auto ⌈√N⌉, normalize = true):
    // cosine retrieval over unnormalized vectors routes L2 cells that
    // don't align with the cosine metric (a 2x-scaled twin lands far from
    // its direction's cell) — the FAISS recipe is normalize-then-L2,
    // which the index now applies INTERNALLY by default (corpus at build,
    // queries via the self-describing marker). Cosine is scale-invariant,
    // so the RAW exact baseline is the correct ground truth here too —
    // this measures exactly what a user gets calling buildIvfIndex with
    // no tuning on a raw corpus.
    val (_, buildN) = time(graft.operators.VectorIndex.buildIvfIndex(
      emb, s"$root/n", trainSampleCap = 100000L))
    val dNlist = graft.operators.VectorIndex.readCentroids(spark, s"$root/n").size
    println(f"IVFBIG default-path build=$buildN%7.1f s (auto nlist=$dNlist, normalized layout)")
    for (nprobe <- Seq(1, 2, 4, 8)) {
      val (apN, wN) = time {
        val a = graft.operators.VectorIndex.ivfTopKIndexed(
          queries, s"$root/n", k = 20, nprobe = nprobe).localCheckpoint(true)
        a.count(); a
      }
      println(f"IVFBIG default-path nprobe=$nprobe%2d recall@20=${recallAt(apN, exact)}%6.4f " +
        f"tie_recall@20=${tieRecallAt(apN, exact)}%6.4f batch_wall=$wN%6.2f s")
    }
    // takedown at scale: delete ~0.1% of ids from the default-path index.
    // r16: the delete is a TOMBSTONE append (O(delete-set + one ids scan),
    // vs the r15 O(store) rewrite measured at 120.5 s here at 10M);
    // serving hides the victims immediately; the bytes leave at the next
    // fold's purge (touched-cells rewrite), measured separately below.
    val victims = emb.filter(pmod(col("vec_id"), lit(997L)) === 0).select("vec_id")
    val ((delB, delA), delWall) = time(
      graft.operators.VectorIndex.deleteFromIvfIndex(spark, s"$root/n", victims))
    val (_, postWall) = time(run(graft.operators.VectorIndex.ivfTopKIndexed(
      queries, s"$root/n", k = 20, nprobe = 8)))
    println(f"IVFBIG delete ids=${delB - delA}%8d wall=$delWall%7.1f s " +
      f"(tombstone append) post_delete_batch=$postWall%6.2f s (victims hidden)")
    val (purged, purgeWall) = time(
      graft.operators.VectorIndex.purgeTombstones(spark, s"$root/n"))
    val (_, postPurgeWall) = time(run(graft.operators.VectorIndex.ivfTopKIndexed(
      queries, s"$root/n", k = 20, nprobe = 8)))
    println(f"IVFBIG purge rows=$purged%8d wall=$purgeWall%7.1f s " +
      f"(touched-cells rewrite, rides fold) post_purge_batch=$postPurgeWall%6.2f s")
    spark.stop(); sys.exit(0)
  }

  def main(args: Array[String]): Unit = {
    if (args.headOption.contains("--big")) {
      big(args.lift(1).map(_.toLong).getOrElse(1000000L))
      return
    }
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.GraftSession.builder(master = "local[32]", shufflePartitions = 32)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val queries = emb.filter(col("vec_id") < 20)
    def time[A](f: => A): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def med(reps: Int)(f: => Unit): Double =
      Seq.fill(reps)(time(f)).sorted.apply(reps / 2)
    def run(df: => org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // warm-up (JIT + file listing)
    run(graft.functions.VectorOps.bruteForceTopK(queries, emb, 5))

    val adhoc = med(3)(run(
      graft.functions.VectorOps.ivfTopK(queries, emb, k = 5, nlist = 16, nprobe = 8)))
    println(f"IVFPROBE adhoc_per_batch     $adhoc%6.2f s (k-means retrain + full assign, every batch)")

    val root = java.nio.file.Files.createTempDirectory("ivfprobe").toString
    val build = time(graft.operators.VectorIndex.buildIvfIndex(emb, s"$root/f", nlist = 16))
    println(f"IVFPROBE build_float         $build%6.2f s (once)")
    val idxq = med(3)(run(
      graft.operators.VectorIndex.ivfTopKIndexed(queries, s"$root/f", k = 5, nprobe = 8)))
    println(f"IVFPROBE indexed_per_batch   $idxq%6.2f s")

    val build8 = time(graft.operators.VectorIndex.buildIvfIndex(emb, s"$root/i", nlist = 16,
      codec = "int8"))
    val idxq8 = med(3)(run(
      graft.operators.VectorIndex.ivfTopKIndexed(queries, s"$root/i", k = 5, nprobe = 8)))
    println(f"IVFPROBE build_int8          $build8%6.2f s; indexed_int8_per_batch $idxq8%6.2f s")

    def duOf(p: String): Long = {
      val f = new java.io.File(p)
      if (f.isFile) f.length else Option(f.listFiles).map(_.map(x => duOf(x.getPath)).sum).getOrElse(0L)
    }
    println(s"IVFPROBE bytes float=${duOf(s"$root/f/cells")} int8=${duOf(s"$root/i/cells")}")
    spark.stop(); sys.exit(0)
  }
}
