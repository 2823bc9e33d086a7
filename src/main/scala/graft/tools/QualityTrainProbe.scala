package graft.tools

import org.apache.spark.sql.functions._
import graft.GraftSession

/** Dev probe: self-supervised quality-classifier training on a testdata
  * dir (positives = the organic documents, negatives =
  * `QualityModel.syntheticNegatives` degradations) — prints the learned
  * weights, train accuracy, and per-class accept rates. The printed
  * weights are what `SparkEntry.qualityGateWeights` pins for the
  * `q_n_quality_model` gate; re-run this probe to justify a weight
  * refresh.
  *
  *   sbt 'runMain graft.tools.QualityTrainProbe /root/testdata/sf0.01 [lr] [iters]'
  */
object QualityTrainProbe {
  def main(args: Array[String]): Unit = {
    import graft.operators.QualityModel
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val lr = args.lift(1).map(_.toDouble).getOrElse(2.0)
    val iters = args.lift(2).map(_.toInt).getOrElse(400)
    val spark = GraftSession.getOrCreate()
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val w = QualityModel.trainVsCorrupted(docs, "doc_id", "text", lr = lr, iters = iters)
    println("weights = Seq(" + w.map(x => f"$x%.10f").mkString(", ") + ")")
    def acceptRate(df: org.apache.spark.sql.DataFrame): Double =
      QualityModel.score(df, "text", w)
        .agg(avg("quality_accept")).head().getDouble(0)
    val posRate = acceptRate(docs)
    val negRate = acceptRate(QualityModel.syntheticNegatives(docs, "doc_id", "text"))
    println(f"organic accept=$posRate%.4f corrupted accept=$negRate%.4f " +
      f"accuracy=${(posRate + (1 - negRate)) / 2}%.4f")
    spark.stop()
  }
}
