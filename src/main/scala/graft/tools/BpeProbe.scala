package graft.tools

import graft.GraftSession
import graft.functions.Bpe

/** Dev probe: train a merge list on a given sf dir and print it as Scala
  * literal source — the pinned-model input for the `q_n_bpe_encode` gate.
  * Run: `sbt "runMain graft.tools.BpeProbe /root/testdata/sf0.01 24"`.
  */
object BpeProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val k = if (args.length > 1) args(1).toInt else 24
    val spark = GraftSession.builder(master = "local[8]", shufflePartitions = 8)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val vocab = Bpe.wordCounts(docs, "text")
    println(s"[bpe-probe] distinct words: ${vocab.count()}")
    val merges = Bpe.trainMerges(vocab, k)
    merges.zipWithIndex.foreach { case ((a, b), i) =>
      val selfChain = a == b
      println(f"""    ("$a%s", "$b%s"),${if (selfChain) " // WARNING a==b" else ""}""")
    }
    spark.stop()
  }
}
