package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Pathological-SHAPE sweep — the skew class EdgeProbe's null class doesn't
  * cover: docs that are syntactically fine but dimensionally hostile (one
  * multi-megabyte token, megabyte prose docs, docs with 100k+ lines). At
  * 100 TB a handful of these exist in every shard, and a per-doc kernel
  * that is quadratic (or linear with a huge constant) in doc length turns
  * one row into a straggler task that stalls its whole stage.
  *
  * Prints per-op wall seconds on a corpus of 64 normal docs + 4 hostile
  * docs, normal-only vs with-hostiles vs with-hostiles-clamped — the
  * numbers behind SCALING.md's pathological-shape section.
  */
object PathologyProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.builder(master = "local[4]", shufflePartitions = 4)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val rnd = new scala.util.Random(11)
    val words = Vector("alpha", "beta", "gamma", "delta", "epsilon", "scan", "join",
      "filter", "merge", "sort", "window", "batch", "stream", "the", "a", "of")
    def prose(nTok: Int): String =
      (0 until nTok).map(_ => words(rnd.nextInt(words.size))).mkString(" ")

    val normal = (1L to 64L).map(i => (i, prose(120)))
    val megaword = (100L, "x" * 2000000)                  // one 2M-char token
    val megadoc = (101L, prose(300000))                   // ~2M chars of prose
    val megalines = (102L, (1 to 120000).map(i => s"line nr ${i % 40000} text").mkString("\n"))
    val zipf = (103L, (1 to 80000).map(i => s"tok$i").mkString(" "))

    def corpus(extra: Seq[(Long, String)]): DataFrame =
      (normal ++ extra).toDF("id", "text").repartition(4)

    val plain = corpus(Seq.empty)
    val hostile = corpus(Seq(megaword, megadoc, megalines, zipf))

    def t(label: String, df: DataFrame)(f: DataFrame => DataFrame): Unit = {
      val t0 = System.nanoTime()
      try {
        f(df).write.format("noop").mode("overwrite").save()
        println(f"PATH $label%-34s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      } catch {
        case e: Throwable =>
          println(f"PATH $label%-34s FAILED ${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(120)}")
      }
    }

    import graft.functions.TextOps
    import graft.operators.{CorpusStats, Dedup, Packing}
    val merges = Seq("t" -> "h", "a" -> "l", "s" -> "c", "b" -> "a", "al" -> "pha")

    for ((tag, df) <- Seq("normal" -> plain, "hostile" -> hostile,
                          "clamped" -> hostile.withColumn("text",
                            TextOps.clampChars(col("text"), 50000)))) {
      t(s"$tag/text_stats", df) { d => d.select(col("id"),
        TextOps.tokenCount(col("text")), TextOps.qualityScore(col("text")),
        TextOps.langId(col("text")),
        TextOps.topNgramFrac(TextOps.tokens(col("text")), 2)) }
      t(s"$tag/line_dedup", df) { d => d.select(col("id"),
        TextOps.dropRepeatedLines(col("text"))) }
      t(s"$tag/char_shingle_minhash", df) { d =>
        Dedup.minhashSignatures(d, "id", "text", shingleLen = 5, numHashes = 32) }
      t(s"$tag/span_fps", df) { d => Dedup.spanFingerprints(d, "id", "text") }
      // maxWordChars=1000 is the recommended wild-corpus config (opt-in;
      // the uncapped default stalled >8 min on the 2M-char token — measured
      // once, see SCALING.md's pathological-shape table)
      t(s"$tag/bpe_encode", df) { d =>
        graft.functions.Bpe.encode(d, "id", "text",
          graft.functions.Bpe.vocabSegmentation(
            graft.functions.Bpe.wordCounts(d, "text"), merges,
            maxWordChars = 1000), maxWordChars = 1000) }
      t(s"$tag/lm_score", df) { d => CorpusStats.lmScore(d, "id", "text") }
      t(s"$tag/pack_seq", df) { d => Packing.packSequences(d, "id", "text", 4096) }
    }
    println("PATH DONE")
    spark.stop()
    sys.exit(0)
  }
}
