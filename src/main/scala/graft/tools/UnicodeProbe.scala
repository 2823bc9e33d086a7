package graft.tools

import org.apache.spark.sql.functions._

/** Unicode sweep: astral-plane characters (emoji, rare CJK — UTF-16
  * surrogate PAIRS) through every char-level kernel. Plain-Java
  * `String.split("")` cuts a surrogate pair into two lone halves that
  * UTF-8-encode as replacement bytes — if Spark's split shares that
  * behavior, BPE character segmentation / char shingles silently corrupt
  * multilingual text. This probe answers it empirically against the real
  * expressions.
  */
object UnicodeProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.builder(master = "local[2]", shufflePartitions = 2)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    import graft.functions.{Bpe, TextOps}

    val texts = Seq(
      (1L, "hello 👍😀 world"),          // emoji (astral)
      (2L, "漢字テスト कुछ हिंदी"), // CJK + Devanagari (BMP)
      (3L, "café naïve Über straße"),    // Latin-1 accents
      (4L, "🍕🍕🍕"),          // pure astral word
      (5L, "mixed😀tail and ascii"))
      .toDF("id", "text")

    // 1. split-by-char round trip: does concat(split(text, "")) == text?
    // (split("") keeps every char including spaces; empties are artifacts)
    val chars = texts.select(col("id"), col("text"),
      concat_ws("", filter(split(col("text"), ""), c => length(c) > 0)).as("rejoined"))
    val broken = chars.filter(col("rejoined") =!= col("text"))
    println("SPLIT-REJOIN mismatches:")
    broken.show(10, truncate = false)

    // 2. BPE initialSymbols losslessness per word
    val vocab = Bpe.wordCounts(texts, "text")
    val seg = Bpe.vocabSegmentation(vocab, Seq("h" -> "e"))
    val bad = seg.filter(
      concat_ws("", col("subwords")) =!= concat(col("word"), lit(Bpe.EndOfWord)))
    println("BPE SEGMENTATION lossy words: " + bad.count())
    bad.show(10, truncate = false)

    // 3. do lone surrogates survive a parquet round trip?
    val dir = java.nio.file.Files.createTempDirectory("uniprobe").toString + "/p"
    seg.write.parquet(dir)
    val reread = spark.read.parquet(dir)
    val diverged = seg.as("a").join(reread.as("b"), col("a.word") === col("b.word"))
      .filter(concat_ws("", col("a.subwords")) =!= concat_ws("", col("b.subwords")))
    println("PARQUET ROUNDTRIP diverged: " + diverged.count())

    // 4. char shingles + fingerprint stability
    val sh = texts.select(col("id"), TextOps.charShingles(col("text"), 3).as("sh"),
      TextOps.fingerprint(col("text")).as("fp"))
    sh.show(5, truncate = false)

    spark.stop(); sys.exit(0)
  }
}
