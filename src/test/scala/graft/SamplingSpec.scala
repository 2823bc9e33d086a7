package graft

import org.apache.spark.sql.functions._
import graft.operators.Sampling

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  lazy val ids = spark.range(10000).toDF("id")

  test("hashSplit partitions every row exactly once, near the target weights") {
    val out = Sampling.hashSplit(ids, "id", Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    val counts = out.groupBy("split").count().as[(String, Long)].collect().toMap
    assert(counts.values.sum == 10000L)
    // 3σ for n=10000, p=0.8 is ~120; ±300 is a generous determinism-safe band
    assert(math.abs(counts("train") - 8000L) < 300, s"train=${counts("train")}")
    assert(math.abs(counts("val") - 1000L) < 300, s"val=${counts("val")}")
    assert(math.abs(counts("test") - 1000L) < 300, s"test=${counts("test")}")
  }

  test("hashSplit is deterministic and salt changes the assignment") {
    def assign(salt: String) =
      Sampling.hashSplit(ids, "id", Seq("a" -> 0.5, "b" -> 0.5), salt = salt)
        .as[(Long, String)].collect().toMap
    assert(assign("") == assign(""))          // rerun-stable
    assert(assign("") != assign("exp2"))      // independent draw per salt
  }

  test("hashSample rates are nested: the 10% sample is inside the 30% sample") {
    val s10 = Sampling.hashSample(ids, "id", 0.1).as[Long].collect().toSet
    val s30 = Sampling.hashSample(ids, "id", 0.3).as[Long].collect().toSet
    assert(s10.nonEmpty && s10.subsetOf(s30))
    assert(math.abs(s10.size - 1000) < 300 && math.abs(s30.size - 3000) < 400)
  }

  test("stratifiedSample applies per-stratum keep rates") {
    val strata = ids.withColumn("lang", (col("id") % 3).cast("string"))
    val out = Sampling.stratifiedSample(strata, "id", "lang",
      Map("0" -> 1.0, "1" -> 0.5), defaultRate = 0.0)
    val counts = out.groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(counts("0") == strata.filter(col("lang") === "0").count()) // rate 1.0 keeps all
    assert(math.abs(counts("1") - 1667L) < 300, s"half-rate stratum: ${counts("1")}")
    assert(!counts.contains("2")) // default rate 0 drops the unlisted stratum
  }

  test("exactSample returns exactly k rows, deterministically, via top-k (no full sort)") {
    val s1 = Sampling.exactSample(ids, "id", 50).as[Long].collect()
    val s2 = Sampling.exactSample(ids, "id", 50).as[Long].collect()
    assert(s1.length == 50 && s1.sameElements(s2))
    val p = Sampling.exactSample(ids, "id", 50).queryExecution.executedPlan.toString
    assert(p.contains("TakeOrderedAndProject"), p.take(500))
  }

  test("stratifiedExactSample keeps exactly k per stratum (or all, if fewer)") {
    val strata = ids.withColumn("g", (col("id") % 4).cast("string"))
    val out = Sampling.stratifiedExactSample(strata, "id", "g", k = 7)
    val counts = out.groupBy("g").count().as[(String, Long)].collect().toMap
    assert(counts == Map("0" -> 7L, "1" -> 7L, "2" -> 7L, "3" -> 7L))
    val tiny = strata.filter(col("id") < 2) // stratum sizes 1
    assert(Sampling.stratifiedExactSample(tiny, "id", "g", k = 7).count() == 2)
  }

  test("hexThreshold edges: 0 keeps nothing, 1 keeps everything") {
    assert(Sampling.hashSample(ids, "id", 0.0).count() == 0L)
    assert(Sampling.hashSample(ids, "id", 1.0).count() == 10000L)
  }

  test("weightedMix emits floor(w) copies plus a deterministic fractional copy") {
    val docs = spark.range(4000).select(col("id"),
      (when(col("id") % 3 === 0, "a").when(col("id") % 3 === 1, "b")
        .otherwise("c")).as("dom"))
    val out = Sampling.weightedMix(docs, "id", "dom",
      Map("a" -> 2.5, "b" -> 0.25), defaultWeight = 1.0)
    val byDom = out.groupBy("dom").count().as[(String, Long)].collect().toMap
    val n = 4000 / 3 + 1 // 1334 'a' ids (0,3,..,3999)
    // a: 2 copies each + ~50% get a third; b: ~25% get their single copy
    assert(byDom("a") >= 2 * n && byDom("a") <= 3 * n)
    assert(math.abs(byDom("a") - 2.5 * n) < 0.1 * n, s"a=${byDom("a")}")
    assert(math.abs(byDom("b") - 0.25 * 1333) < 0.1 * 1333, s"b=${byDom("b")}")
    assert(byDom("c") == 1333L) // weight 1.0 → exactly one copy each
    // rep indices are 0..n-1 per doc
    val reps = out.filter(col("dom") === "a").groupBy("id")
      .agg(count(lit(1)).as("n"), max(col("rep")).as("mx"), min(col("rep")).as("mn"))
      .as[(Long, Long, Long, Long)].collect()
    assert(reps.forall(r => r._4 == 0L && r._3 == r._2 - 1))
    // deterministic across evaluations
    val again = Sampling.weightedMix(docs, "id", "dom",
      Map("a" -> 2.5, "b" -> 0.25), defaultWeight = 1.0)
      .groupBy("dom").count().as[(String, Long)].collect().toMap
    assert(again == byDom)
  }

  test("weightedMix plans narrow: no shuffle, stays in one codegen stage") {
    val docs = spark.range(100).select(col("id"), lit("d").as("dom"))
    val plan = Sampling.weightedMix(docs, "id", "dom", Map("d" -> 1.5))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("weightedMix is monotone: raising a weight only ADDS copies") {
    val docs = spark.range(2000).select(col("id"), lit("d").as("dom"))
    def keyset(w: Double) = Sampling.weightedMix(docs, "id", "dom", Map("d" -> w))
      .select(col("id"), col("rep")).as[(Long, Long)].collect().toSet
    val lo = keyset(1.2)
    val hi = keyset(1.45)
    assert(lo.subsetOf(hi), s"lost ${lo.diff(hi).size} copies raising 1.2→1.45")
    assert(hi.size > lo.size)
  }
}
