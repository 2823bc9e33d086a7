package graft

import org.apache.spark.sql.functions._
import graft.functions.Sketches

class SketchesSpec extends SparkSpec {
  import spark.implicits._

  lazy val orders = spark.read.parquet(s"$sf/orders.parquet")

  test("HLL++ approx distinct is within the configured error of exact") {
    val exact = orders.select(countDistinct(col("o_custkey"))).head().getLong(0)
    val approx = orders.select(Sketches.approxDistinct(col("o_custkey"), rsd = 0.02))
      .head().getLong(0)
    assert(math.abs(approx - exact).toDouble / exact < 0.1,
      s"approx=$approx exact=$exact")
  }

  test("DataSketches HLL: merged per-month sketches match the global estimate") {
    // THE scale pattern: sketch each shard once, merge sketches later —
    // the merged answer must track a direct whole-table sketch
    val monthly = orders
      .groupBy(month(col("o_orderdate")).as("m"))
      .agg(Sketches.hllSketch(col("o_custkey")).as("sk"))
    val merged = monthly
      .agg(Sketches.hllEstimate(Sketches.hllMerge(col("sk"))).as("est"))
      .head().getLong(0)
    val direct = orders
      .agg(Sketches.hllEstimate(Sketches.hllSketch(col("o_custkey"))).as("est"))
      .head().getLong(0)
    val exact = orders.select(countDistinct(col("o_custkey"))).head().getLong(0)
    assert(math.abs(merged - direct).toDouble / direct < 0.02,
      s"merged=$merged direct=$direct")
    assert(math.abs(merged - exact).toDouble / exact < 0.1,
      s"merged=$merged exact=$exact")
  }

  test("approx quantiles track exact percentiles") {
    val exact = orders
      .select(percentile(col("o_totalprice"), lit(0.5)).as("p")).head().getDouble(0)
    val approx = orders
      .select(element_at(Sketches.approxQuantiles(col("o_totalprice"), Seq(0.5)), 1))
      .head().getDouble(0)
    assert(math.abs(approx - exact) / exact < 0.02, s"approx=$approx exact=$exact")
  }

  test("Misra-Gries finds every heavy hitter within the guaranteed undercount") {
    // zipfian-ish stream: term t_i appears 2000/i times, i in 1..100
    val rows = (1 to 100).flatMap(i => Seq.fill(2000 / i)(s"t_$i"))
    val n = rows.size.toLong
    val capacity = 32
    val ds = spark.createDataset(scala.util.Random.shuffle(rows).toSeq)(
      org.apache.spark.sql.Encoders.STRING).repartition(8)
    val out = ds.select(Sketches.frequentItems(capacity).toColumn)
      .head().toMap
    val errBound = n / (capacity + 1)
    val exact = rows.groupBy(identity).view.mapValues(_.size.toLong).toMap
    // guarantee 1: every item with true count > N/(cap+1) is present
    exact.filter(_._2 > errBound).keys.foreach(k =>
      assert(out.contains(k), s"heavy hitter $k missing (count=${exact(k)}, bound=$errBound)"))
    // guarantee 2: reported counts never overcount and undercount ≤ bound
    out.foreach { case (k, c) =>
      assert(c <= exact(k), s"$k overcounted: $c > ${exact(k)}")
      assert(exact(k) - c <= errBound, s"$k undercounted past the bound")
    }
    // bounded memory: at most `capacity` counters survive
    assert(out.size <= capacity)
  }
}
