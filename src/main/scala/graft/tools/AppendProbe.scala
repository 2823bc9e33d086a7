package graft.tools

import org.apache.spark.sql.functions._

/** Attribution for the VectorIndexLadder per-batch floor: the ladder
  * feeds 50k-vector deltas through a MemoryStream (ONE partition — every
  * pre-shuffle expression runs single-threaded) and pays the streaming
  * commit protocol. This probe times `appendToIvfIndex` directly on a
  * parquet-backed delta (parallel scan — the production file-drop shape)
  * against an existing index dir, separating the operator's own cost from
  * the harness's. Prints `APPENDPROBE` rows.
  *
  * Usage: `runMain graft.tools.AppendProbe <indexDir> [rows]`
  */
object AppendProbe {
  def main(args: Array[String]): Unit = {
    val indexDir = args.headOption.getOrElse(
      sys.error("usage: AppendProbe <indexDir> [rows]"))
    val rows = args.lift(1).map(_.toInt).getOrElse(50000)
    val spark = graft.GraftSession.builder(master = "local[32]", shufflePartitions = 32)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val work = java.nio.file.Files.createTempDirectory("append_probe").toString
    val rnd = new java.util.Random(7)
    val base = 900000000L
    (0 until rows).map { i =>
      (base + i, Seq.fill(64)((rnd.nextGaussian() * 0.5).toFloat))
    }.toDF("vec_id", "embedding")
      .repartition(32).write.mode("overwrite").parquet(s"$work/delta")
    val delta = spark.read.parquet(s"$work/delta")
    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }
    val (n1, w1) = time(graft.operators.VectorIndex.appendToIvfIndex(delta, indexDir))
    println(f"APPENDPROBE parquet-delta rows=$rows indexed=$n1 wall=$w1%6.1f s")
    // idempotent re-append: pure anti-join + routing cost, zero writes
    val (n2, w2) = time(graft.operators.VectorIndex.appendToIvfIndex(delta, indexDir))
    println(f"APPENDPROBE re-append     rows=$rows indexed=$n2 wall=$w2%6.1f s (anti-join + routing only)")
    spark.stop(); sys.exit(0)
  }
}
