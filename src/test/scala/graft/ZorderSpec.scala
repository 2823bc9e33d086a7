package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sinks.Writers

/** Z-order layout: the measurable contract is FILE PRUNABILITY — for point
  * or range predicates on EVERY clustered column, only a minority of output
  * files' [min, max] ranges overlap the predicate. Lexicographic sorted
  * layout only delivers that for its leading column; z-order must deliver
  * it for both, at moderate cost to the leading column's perfection.
  */
class ZorderSpec extends SparkSpec {
  import spark.implicits._

  // two independent dimensions, both uniform: the layout cannot lean on
  // correlation; 4000 rows over 16 files
  private lazy val data = {
    val rnd = new scala.util.Random(7)
    (1 to 4000).map(i => (rnd.nextInt(1000).toLong, rnd.nextDouble() * 100.0, i.toLong))
      .toDF("a", "b", "row_id")
  }

  /** Fraction of files whose [min,max] of `c` overlaps a width-`w` window
    * anchored at `k` evenly-spaced probe points — the footer-stats pruning
    * model (a file is read iff its range overlaps the predicate).
    */
  private def overlapFrac(dir: String, c: String, lo: Double, hi: Double,
                          w: Double, k: Int = 20): Double = {
    val stats = spark.read.parquet(dir)
      .groupBy(input_file_name().as("f"))
      .agg(min(col(c).cast("double")).as("lo"), max(col(c).cast("double")).as("hi"))
      .select("lo", "hi").as[(Double, Double)].collect()
    val probes = (0 until k).map(i => lo + (hi - lo - w) * i / (k - 1))
    probes.map { p =>
      stats.count { case (flo, fhi) => fhi >= p && flo <= p + w } .toDouble / stats.length
    }.sum / k
  }

  test("z-order prunes on BOTH dimensions; lexicographic only on the leading one") {
    val zdir = java.nio.file.Files.createTempDirectory("zorder").toString + "/t"
    val sdir = java.nio.file.Files.createTempDirectory("sorted").toString + "/t"
    Writers.zorderLayout(data, zdir, Seq("a", "b"), files = 16, bits = 8)
    Writers.sortedLayout(data, sdir, Seq("a", "b"), partitions = 16)

    // same rows survive the rewrite
    assert(spark.read.parquet(zdir).count() == 4000)
    assert(spark.read.parquet(zdir).select(sum("row_id")).head.getLong(0)
      == data.select(sum("row_id")).head.getLong(0))

    // 5%-wide windows on each dimension
    val zA = overlapFrac(zdir, "a", 0, 1000, 50)
    val zB = overlapFrac(zdir, "b", 0, 100, 5)
    val sA = overlapFrac(sdir, "a", 0, 1000, 50)
    val sB = overlapFrac(sdir, "b", 0, 100, 5)
    info(f"overlap fractions: zorder a=$zA%.2f b=$zB%.2f | sorted a=$sA%.2f b=$sB%.2f")

    // lexicographic: near-perfect on the leading column, useless on b
    assert(sA <= 0.25, f"sorted layout should prune hard on its leading col, got $sA%.2f")
    assert(sB >= 0.9, f"expected sorted layout NOT to prune on b, got $sB%.2f")
    // z-order: real pruning on BOTH dimensions (16 files; 2-D interleave
    // bounds per-dimension selectivity near sqrt(files) touched)
    assert(zA <= 0.5, f"zorder failed to prune on a: $zA%.2f")
    assert(zB <= 0.5, f"zorder failed to prune on b: $zB%.2f")
    // and z must beat lexicographic decisively on the trailing dimension
    assert(zB < sB - 0.3, f"zorder b=$zB%.2f not better than sorted b=$sB%.2f")
  }

  test("2-D box scan over z-ordered files DECODES fewer rows (measured scan metric)") {
    // the overlap-fraction test above models pruning from footer stats; this
    // one measures it: parquet row-group pruning (filterPushdown) means the
    // scan's numOutputRows is the rows DECODED from surviving row groups —
    // the cost a 100 TB point query actually pays
    val base = java.nio.file.Files.createTempDirectory("zmetrics").toString
    Writers.zorderLayout(data, s"$base/z", Seq("a", "b"), files = 16, bits = 8)
    data.repartition(16).write.parquet(s"$base/u") // unsorted: random layout
    def decodedRows(dir: String): Long = {
      val df = spark.read.parquet(dir)
        .filter(col("a").between(100L, 150L) && col("b").between(10.0, 15.0))
      df.collect()
      // no exchange in scan+filter+collect, so the plan is non-adaptive and
      // the scan node is directly collectible
      val scan = df.queryExecution.executedPlan.collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec => s
      }.head
      scan.metrics("numOutputRows").value
    }
    val z = decodedRows(s"$base/z")
    val u = decodedRows(s"$base/u")
    info(s"decoded rows for the 5%x5% box: zorder=$z unsorted=$u (total 4000)")
    // random layout: every row group's [min,max] spans the box -> decodes all
    assert(u >= 3500, s"expected the unsorted copy to decode ~everything, got $u")
    // z-order: footer stats skip most row groups
    assert(z <= u / 2, s"zorder decoded $z rows vs unsorted $u - no real pruning")
  }

  test("date/timestamp clustering columns bucketize via the epoch projection") {
    // approxQuantile accepts only numeric columns; dates must flow through
    // the epoch-double projection rather than throw
    val dated = data.withColumn("d", expr("date_add(date '2020-01-01', cast(a % 365 as int))"))
    val dir = java.nio.file.Files.createTempDirectory("zdate").toString + "/t"
    Writers.zorderLayout(dated, dir, Seq("d", "b"), files = 8, bits = 6)
    val back = spark.read.parquet(dir)
    assert(back.count() == 4000)
    // the date dimension must actually cluster: files cover narrow date spans
    val spans = back.groupBy(input_file_name())
      .agg((max(col("d").cast("timestamp").cast("double")) -
            min(col("d").cast("timestamp").cast("double"))).as("span"))
      .agg(avg("span")).head.getDouble(0)
    val full = 364.0 * 86400
    assert(spans < full * 0.8, s"files span ${spans / 86400}%.0f days each - no date clustering")
  }
}
