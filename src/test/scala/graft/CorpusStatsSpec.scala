package graft

import org.apache.spark.sql.functions._
import graft.operators.CorpusStats

class CorpusStatsSpec extends SparkSpec {
  import spark.implicits._

  test("topTerms ranks by doc frequency, breaks ties on term, shares are exact") {
    val docs = Seq(
      (1L, "a b a c"),
      (2L, "a b b"),
      (3L, "c c c c")
    ).toDF("doc_id", "text")
    // a: df 2, total 3; b: df 2, total 3; c: df 2, total 5; grand total 11
    val out = CorpusStats.topTerms(docs, "doc_id", "text", k = 2)
      .as[(String, Long, Long, Double)].collect().toSeq
    assert(out == Seq(
      ("a", 2L, 3L, math.floor(3.0 / 11.0 * 1e6 + 0.5) / 1e6),
      ("b", 2L, 3L, math.floor(3.0 / 11.0 * 1e6 + 0.5) / 1e6)))
  }

  test("topTerms n=2 counts NON-distinct bigrams (repetition counts)") {
    val docs = Seq((1L, "x y x y"), (2L, "x y z")).toDF("doc_id", "text")
    // bigrams doc1: x·y y·x x·y; doc2: x·y y·z (wordNgrams joins on )
    // → x·y: df 2, total 3
    val top = CorpusStats.topTerms(docs, "doc_id", "text", k = 1, n = 2)
      .as[(String, Long, Long, Double)].head()
    assert(top._1 == "xy" && top._2 == 2L && top._3 == 3L)
  }

  test("commonnessScore averages corpus doc-frequency over each doc's tokens") {
    val docs = Seq(
      (1L, "a a b"),   // a: df 2, b: df 1 → mean (2+2+1)/3 = 1.6667
      (2L, "a z")      // z: df 1 → mean (2+1)/2 = 1.5
    ).toDF("doc_id", "text")
    val out = CorpusStats.commonnessScore(docs, "doc_id", "text")
      .as[(Long, Long, Double)].collect()
      .map { case (k, n, m) => k -> (n, m) }.toMap
    assert(out == Map(1L -> (3L, 1.6667), 2L -> (2L, 1.5)))
    // hashKeys variant scores identically (8-byte shuffle keys at scale)
    val hashed = CorpusStats.commonnessScore(docs, "doc_id", "text", hashKeys = true)
      .as[(Long, Long, Double)].collect()
      .map { case (k, n, m) => k -> (n, m) }.toMap
    assert(hashed == out)
  }

  test("topTermsApprox surfaces the true heavy hitters within the MG bound") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val approx = CorpusStats.topTermsApprox(docs, "text", capacity = 64)
      .as[(String, Long)].collect().toMap
    assert(approx.nonEmpty && approx.size <= 64)
    // exact total counts for comparison (small fixture)
    val exact = docs.select(explode(graft.functions.TextOps.tokens(col("text"))).as("t"))
      .groupBy("t").count().as[(String, Long)].collect().toMap
    val n = exact.values.sum
    val bound = n / 65
    exact.filter(_._2 > bound).keys.foreach(k =>
      assert(approx.contains(k), s"heavy hitter $k missing"))
    approx.foreach { case (k, c) =>
      assert(c <= exact(k) && exact(k) - c <= bound, s"$k count $c vs exact ${exact(k)}")
    }
  }

  test("topTerms plans the cut as TakeOrderedAndProject (no global sort)") {
    val docs = Seq((1L, "a b c")).toDF("doc_id", "text")
    val plan = CorpusStats.topTerms(docs, "doc_id", "text", k = 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("lmScore: hand-computed bigram LM on a 3-doc corpus (counts AND log)") {
    // corpus: "a b a b", "a b c", "c c"
    // bigram occurrences: d1: ab, ba, ab ; d2: ab, bc ; d3: cc
    // C2: ab=3, ba=1, bc=1, cc=1 ; C1(left occurrences): a=3, b=2, c=1
    // V = 3 distinct tokens; k = 0.5 -> P = (c2+0.5)/(c1+1.5)
    val docs = Seq((1L, "a b a b"), (2L, "a b c"), (3L, "c c"))
      .toDF("doc_id", "text")
    val out = CorpusStats.lmScore(docs, "doc_id", "text", k = 0.5)
      .orderBy("id")
      .as[(Long, Long, Long, Long, Double)].collect().toSeq
    def p(c2: Int, c1: Int) = (c2 + 0.5) / (c1 + 1.5)
    def r4(x: Double) = BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val d1 = r4((math.log(p(3, 3)) + math.log(p(1, 2)) + math.log(p(3, 3))) / 3)
    val d2 = r4((math.log(p(3, 3)) + math.log(p(1, 2))) / 2)
    val d3 = r4(math.log(p(1, 1)))
    assert(out == Seq(
      (1L, 3L, 7L, 8L, d1),   // sum_c2 = 3+1+3, sum_c1 = 3+2+3
      (2L, 2L, 4L, 5L, d2),   // sum_c2 = 3+1,   sum_c1 = 3+2
      (3L, 1L, 1L, 1L, d3)))
    // single-token/empty docs contribute no row
    val sparse = Seq((1L, "a b"), (2L, "x"), (3L, "")).toDF("doc_id", "text")
    assert(CorpusStats.lmScore(sparse, "doc_id", "text").count() == 1)
  }

  test("corpusReport: hand-computed data card, exact and approx distinct agree here") {
    // en: "a b" twice (exact dups: fp counts once) + "c"; fr: "d e f"
    val docs = Seq(
      (1L, "a b", "en"), (2L, "A  b", "en"), (3L, "c", "en"), (4L, "d e f", "fr"))
      .toDF("doc_id", "text", "lang")
    val out = CorpusStats.corpusReport(docs, "text", "lang").orderBy("group")
      .as[(String, Long, Long, Long, Long, Long, Long, Long)].collect().toSeq
    // en ntoks = (2, 2, 1): p25 = 1.5, p50 = 2, p75 = 2 (x100)
    assert(out == Seq(
      ("en", 3L, 2L, 5L, (3 + 4 + 1).toLong, 150L, 200L, 200L),
      ("fr", 1L, 1L, 3L, 5L, 300L, 300L, 300L)))
    // the HLL monitoring variant keeps the schema and, at this cardinality,
    // the values
    val approx = CorpusStats.corpusReport(docs, "text", "lang", exactDistinct = false)
      .orderBy("group")
      .as[(String, Long, Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(approx == out)
  }

  test("corpusReport HLL variant: invariants vs exact on the gate corpus") {
    // the monitoring contract (exactDistinct = false has no SQL oracle —
    // HLL isn't replayable — so its bounds are pinned here): every
    // non-estimated column identical to the exact card, the estimate
    // within 3× the default rel-sd (0.05) of the exact distinct count,
    // and never exceeding the group's doc count. HLL++ is deterministic
    // for a fixed input set, so these are pins, not flaky stat asserts.
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val exact = CorpusStats.corpusReport(docs, "text", "lang")
      .orderBy("group").collect()
    val approx = CorpusStats.corpusReport(docs, "text", "lang", exactDistinct = false)
      .orderBy("group").collect()
    assert(exact.length == approx.length && exact.nonEmpty)
    exact.zip(approx).foreach { case (e, a) =>
      assert(e.getString(0) == a.getString(0))
      Seq(1, 3, 4, 5, 6, 7).foreach(i =>
        assert(e.getLong(i) == a.getLong(i),
          s"non-estimated column $i must not change under HLL"))
      val ex = e.getLong(2).toDouble
      val ap = a.getLong(2).toDouble
      assert(ap <= e.getLong(1),
        s"group ${e.getString(0)}: estimate $ap exceeds n_docs ${e.getLong(1)}")
      assert(math.abs(ap - ex) / ex <= 0.15,
        s"group ${e.getString(0)}: HLL $ap vs exact $ex outside 3×rel-sd")
    }
  }

  test("corpusReport HLL variant: planted-dup corpus at 20k docs tracks the dup surplus") {
    // 4 groups × 5000 docs, exactly 1000 distinct texts per group — the
    // dup-surplus regime the monitoring heartbeat exists to watch
    val docs = spark.range(20000).select(
      (col("id") % 4).cast("string").as("grp"),
      concat(lit("text body number "), (col("id") % 4000).cast("string")).as("text"))
    val rep = CorpusStats.corpusReport(docs, "text", "grp", exactDistinct = false)
      .orderBy("group").collect()
    assert(rep.length == 4)
    rep.foreach { r =>
      assert(r.getLong(1) == 5000L)
      val est = r.getLong(2).toDouble
      assert(est <= 5000L, s"group ${r.getString(0)}: estimate $est exceeds n_docs")
      assert(math.abs(est - 1000.0) / 1000.0 <= 0.15,
        s"group ${r.getString(0)}: HLL $est vs exact 1000 outside 3×rel-sd")
    }
  }
}
