package graft

import org.apache.spark.sql.functions._
import graft.operators.{CorpusStats, Sampling}

/** DSIR importance resampling (Xie et al. 2023): the float log-ratio /
  * Gumbel-top-k pipeline the q_n_dsir integer gate cannot hash — locked
  * here against an exact Scala brute-force replay (same md5 buckets, same
  * smoothing, same derandomized Gumbel keys), plus the statistical
  * property the method exists for (target-distribution enrichment).
  */
/** Pure-Scala brute-force replay of the DSIR pipeline (md5 buckets,
  * add-α smoothing, derandomized Gumbel keys) — shared by DsirSpec's
  * fixed fixtures and InvariantPropertySpec's randomized corpora.
  */
object DsirBrute {
  def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
  def toks(text: String): Seq[String] =
    text.toLowerCase.split("\\s+").toSeq.filter(_.nonEmpty)
  def gramBuckets(text: String, hexLen: Int): Seq[String] = {
    val t = toks(text)
    val bigrams = t.sliding(2).filter(_.size == 2).map(p => p(0) + "" + p(1))
    (t ++ bigrams).map(g => md5hex(g).take(hexLen))
  }
  def counts(corpus: Seq[String], hexLen: Int): Map[String, Long] =
    corpus.flatMap(gramBuckets(_, hexLen)).groupBy(identity).view.mapValues(_.size.toLong).toMap
  def logw(ct: Map[String, Long], cr: Map[String, Long],
           hexLen: Int, alpha: Double): String => Double = {
    val nBuckets = 1L << (4 * hexLen)
    val (tt, tr) = (ct.values.sum.toDouble, cr.values.sum.toDouble)
    b => math.log((ct.getOrElse(b, 0L) + alpha) / (tt + alpha * nBuckets)) -
         math.log((cr.getOrElse(b, 0L) + alpha) / (tr + alpha * nBuckets))
  }
  def gumbelKey(id: Long, docLogw: Double, salt: String): Double = {
    val u = (java.lang.Long.parseLong(md5hex(salt + id.toString).take(8), 16) + 0.5) / 4294967296.0
    docLogw - math.log(-math.log(u))
  }
  /** Expected top-k ids for a raw corpus under the given models. */
  def select(raw: Seq[(Long, String)], ct: Map[String, Long], cr: Map[String, Long],
             k: Int, hexLen: Int, alpha: Double, salt: String = "dsir"): Seq[Long] = {
    val f = logw(ct, cr, hexLen, alpha)
    raw.filter(d => gramBuckets(d._2, hexLen).nonEmpty)
      .map { case (id, text) => (id, gramBuckets(text, hexLen).map(f).sum) }
      .map { case (id, lw) => (id, gumbelKey(id, lw, salt)) }
      .sortBy { case (id, key) => (-key, id) }.take(k).map(_._1)
  }
}

class DsirSpec extends SparkSpec {
  import spark.implicits._
  import DsirBrute.{gramBuckets => gb}

  private val HexLen = 4
  private val Alpha = 0.5

  private def gramBuckets(text: String): Seq[String] = gb(text, HexLen)
  private def counts(corpus: Seq[String]): Map[String, Long] =
    DsirBrute.counts(corpus, HexLen)
  private def logw(ct: Map[String, Long], cr: Map[String, Long]): String => Double =
    DsirBrute.logw(ct, cr, HexLen, Alpha)
  private def gumbelKey(id: Long, docLogw: Double, salt: String): Double =
    DsirBrute.gumbelKey(id, docLogw, salt)

  // --- fixtures -------------------------------------------------------------
  // target-flavored docs draw from one vocabulary, noise docs from another;
  // varying lengths keep the importance weights well separated (no
  // float-boundary ties between ranks k and k+1)
  private val targetVocab = Seq("spark", "catalyst", "shuffle", "broadcast", "partition")
  private val noiseVocab = Seq("lorem", "ipsum", "dolor", "amet", "consectetur")
  private def doc(vocab: Seq[String], seed: Int, len: Int): String =
    (0 until len).map(i => vocab((seed + i * 7) % vocab.size)).mkString(" ")

  private lazy val targetCorpus = (0 until 10).map(i => doc(targetVocab, i, 8 + i))
  private lazy val rawDocs: Seq[(Long, String)] =
    (0 until 20).map(i => (i.toLong, doc(targetVocab, i + 3, 6 + i % 5))) ++
    (20 until 40).map(i => (i.toLong, doc(noiseVocab, i, 6 + i % 5)))
  private lazy val backgroundCorpus = rawDocs.map(_._2)

  private lazy val weightsDf = CorpusStats.importanceWeights(
    CorpusStats.hashedGramCounts(targetCorpus.toDF("text"), "text", HexLen),
    CorpusStats.hashedGramCounts(backgroundCorpus.toDF("text"), "text", HexLen),
    HexLen, Alpha)

  test("importanceWeights matches the brute-force model on every touched bucket") {
    val expected = logw(counts(targetCorpus), counts(backgroundCorpus))
    val touched = backgroundCorpus.flatMap(gramBuckets).distinct
    val got = weightsDf.filter(col("bucket").isin(touched: _*))
      .as[(String, Double)].collect().toMap
    assert(got.keySet == touched.toSet)
    touched.foreach { b =>
      assert(math.abs(got(b) - expected(b)) < 1e-12, s"bucket $b: ${got(b)} vs ${expected(b)}")
    }
    // untouched buckets carry the pure-smoothing constant, not null/zero
    val untouched = weightsDf.filter(!col("bucket").isin(touched: _*)).limit(1)
      .as[(String, Double)].collect()
    assert(untouched.nonEmpty && !untouched.head._2.isNaN)
  }

  test("importanceResample reproduces the brute-force Gumbel-top-k selection exactly") {
    val k = 12
    val expectedLogw = {
      val f = logw(counts(targetCorpus), counts(backgroundCorpus))
      rawDocs.filter(d => gramBuckets(d._2).nonEmpty)
        .map { case (id, text) => id -> gramBuckets(text).map(f).sum }.toMap
    }
    val expectedIds = expectedLogw.toSeq
      .map { case (id, lw) => (id, gumbelKey(id, lw, "dsir")) }
      .sortBy { case (id, key) => (-key, id) }.take(k).map(_._1).toSet
    val got = Sampling.importanceResample(rawDocs.toDF("doc_id", "text"),
        "doc_id", "text", weightsDf, k, HexLen)
      .select("doc_id", "dsir_logw").as[(Long, Double)].collect()
    assert(got.length == k)
    assert(got.map(_._1).toSet == expectedIds, s"selection diverged: ${got.map(_._1).sorted}")
    got.foreach { case (id, lw) =>
      assert(math.abs(lw - expectedLogw(id)) < 1e-9, s"doc $id logw $lw vs ${expectedLogw(id)}")
    }
  }

  test("importanceScores covers every gram-bearing doc with the brute-force weight") {
    val f = logw(counts(targetCorpus), counts(backgroundCorpus))
    val expected = rawDocs.filter(d => gramBuckets(d._2).nonEmpty)
      .map { case (id, text) => id -> gramBuckets(text).map(f).sum }.toMap
    val got = Sampling.importanceScores(rawDocs.toDF("doc_id", "text"),
        "doc_id", "text", weightsDf, HexLen)
      .as[(Long, Double)].collect().toMap
    assert(got.keySet == expected.keySet)
    got.foreach { case (id, lw) =>
      assert(math.abs(lw - expected(id)) < 1e-9, s"doc $id: $lw vs ${expected(id)}")
    }
  }

  test("pickMinLogw lands a threshold that keeps ~keepRate of gram-bearing docs") {
    val df = rawDocs.toDF("doc_id", "text")
    val scores = Sampling.importanceScores(df, "doc_id", "text", weightsDf, HexLen)
      .as[(Long, Double)].collect().map(_._2).sorted
    val n = scores.length
    for (rate <- Seq(0.25, 0.5, 0.9)) {
      val t = Sampling.pickMinLogw(df, "doc_id", "text", weightsDf, rate, HexLen)
      val kept = scores.count(_ >= t)
      // approx_percentile at accuracy 10000 over 40 rows is exact up to
      // ties: the kept count must bracket the requested rate within one
      // tied score group
      val ideal = math.round(n * rate).toInt
      assert(math.abs(kept - ideal) <= scores.count(_ == t),
        s"rate $rate: kept $kept of $n at threshold $t")
    }
    // rate 1.0 keeps every gram-bearing doc; empty corpus -> -Infinity
    val tAll = Sampling.pickMinLogw(df, "doc_id", "text", weightsDf, 1.0, HexLen)
    assert(scores.count(_ >= tAll) == n)
    assert(Sampling.pickMinLogw(df.limit(0), "doc_id", "text", weightsDf, 0.5, HexLen)
      .isNegInfinity)
  }

  test("selection is enriched in target-flavored docs and deterministic across runs") {
    val df = rawDocs.toDF("doc_id", "text")
    def run() = Sampling.importanceResample(df, "doc_id", "text", weightsDf, 15, HexLen)
      .select("doc_id").as[Long].collect().toSet
    val sel = run()
    // ids < 20 are target-vocabulary docs; DSIR should overwhelmingly prefer
    // them over the 20 noise docs (a uniform draw would pick ~7.5 of each)
    assert(sel.count(_ < 20) >= 13, s"weak enrichment: $sel")
    assert(run() == sel, "resample must be deterministic")
  }

  test("gram-less docs are never selected; k beyond candidates returns all") {
    val df = (rawDocs.take(5) :+ (99L, "   ")).toDF("doc_id", "text")
    val sel = Sampling.importanceResample(df, "doc_id", "text", weightsDf, 50, HexLen)
      .select("doc_id").as[Long].collect().toSet
    assert(sel == rawDocs.take(5).map(_._1).toSet, s"got $sel")
  }

  test("dsir node modelDir: an EMPTY weights asset reads as absent (retrain), not a head() crash") {
    // ADVICE r15: the hexLen guard called head() on the persisted weights
    // relation — a zero-row asset (degenerate/empty corpus persisted no
    // buckets) threw NoSuchElementException instead of retraining
    import graft.plans._
    val dir = java.nio.file.Files.createTempDirectory("dsir_model").toString
    rawDocs.toDF("doc_id", "text").write.mode("overwrite").parquet(s"$dir/docs.parquet")
    val spec = PipelineSpec(Seq(
      "docs" -> SourceSpec("parquet", s"$dir/docs.parquet"),
      "sel"  -> DsirNodeSpec(RefSpec("docs"), FilterSpec(RefSpec("docs"), "doc_id < 20"),
        "doc_id", "text", k = 10, hexLen = HexLen, modelDir = s"$dir/model")),
      out = "sel")
    // plant the empty asset where the load path looks
    spark.emptyDataFrame.select(lit("ab").as("bucket"), lit(0.0).as("logw")).limit(0)
      .write.mode("overwrite").parquet(s"$dir/model/dsir_weights")
    val sel = PipelineCompiler.compile(spec, spark).select("doc_id").as[Long].collect().toSet
    assert(sel.size == 10, s"empty asset must retrain and select, got $sel")
    assert(spark.read.parquet(s"$dir/model/dsir_weights").count() > 0,
      "the retrain must overwrite the empty asset")
    // the rewritten asset loads on the next compile and selects identically
    val again = PipelineCompiler.compile(spec, spark).select("doc_id").as[Long].collect().toSet
    assert(again == sel, "loaded-model run must select identically after the retrain")
  }
}
