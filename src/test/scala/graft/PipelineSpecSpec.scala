package graft

import org.apache.spark.sql.functions._
import graft.plans._
import graft.sources.PagedSource

class PipelineSpecSpec extends SparkSpec {

  test("spec compiles to one optimized plan with param substitution") {
    val spec = PipelineSpec(nodes = Seq(
      "li"  -> SourceSpec("parquet", "{%dir%}/lineitem.parquet"),
      "f"   -> FilterSpec(RefSpec("li"), "l_quantity > {%minq%}"),
      "agg" -> AggSpec(RefSpec("f"), Seq("l_returnflag"), Seq("n" -> "count(1)"))),
      out = "agg")
    val df = PipelineCompiler.compile(spec, spark, Map("dir" -> sf, "minq" -> "40"))
    assert(df.columns.toSeq == Seq("l_returnflag", "n"))
    assert(df.count() > 0)
    // the filter must be pushed into the parquet scan by Catalyst
    val physical = df.queryExecution.executedPlan.toString
    assert(physical.contains("PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,40.0)]"),
      s"filter not pushed down:\n$physical")
  }

  test("spy node: pass-through stream, observed metrics per action, sampled tap") {
    // the reference attaches spies to PERSISTED jobs (jobs/job.js:99-116);
    // the spy node brings that to JSON specs: rows + named metrics ride
    // the plan as observed metrics, the stream is unchanged
    val spec = PipelineSpec(nodes = Seq(
      "li"  -> SourceSpec("parquet", "{%dir%}/lineitem.parquet"),
      "f"   -> SpyNodeSpec(FilterSpec(RefSpec("li"), "l_quantity > 40"),
        "after_filter", Seq("big" -> "count_if(l_quantity > 45)",
          "max_q" -> "max(l_quantity)")),
      "agg" -> AggSpec(RefSpec("f"), Seq("l_returnflag"), Seq("n" -> "count(1)"))),
      out = "agg")
    val rt = SpecJson.fromJson(SpecJson.toJson(spec)) // JSON round-trip
    assert(rt == spec)
    val df = PipelineCompiler.compile(rt, spark, Map("dir" -> sf))
    // pass-through: identical result to the spy-less spec
    val bare = PipelineCompiler.compile(PipelineSpec(Seq(
      "li"  -> SourceSpec("parquet", s"$sf/lineitem.parquet"),
      "f"   -> FilterSpec(RefSpec("li"), "l_quantity > 40"),
      "agg" -> AggSpec(RefSpec("f"), Seq("l_returnflag"), Seq("n" -> "count(1)"))),
      out = "agg"), spark)
    assert(df.collect().toSet == bare.collect().toSet)
    // metric delivery: a QueryExecutionListener sees rows + named metrics
    val observed =
      new java.util.concurrent.ConcurrentHashMap[String, org.apache.spark.sql.Row]()
    val l = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(f: String,
          qe: org.apache.spark.sql.execution.QueryExecution, d: Long): Unit =
        qe.observedMetrics.foreach { case (k, v) => observed.put(k, v) }
      override def onFailure(f: String,
          qe: org.apache.spark.sql.execution.QueryExecution, e: Exception): Unit = ()
    }
    spark.listenerManager.register(l)
    try {
      df.write.format("noop").mode("overwrite").save()
      org.apache.spark.sql.graft.Bridge.flushListenerBus(spark)
      val m = observed.get("after_filter")
      assert(m != null, s"spy metrics not observed (saw ${observed.keySet()})")
      val expected = spark.read.parquet(s"$sf/lineitem.parquet")
        .filter(col("l_quantity") > 40)
      assert(m.getAs[Long]("rows") == expected.count())
      assert(m.getAs[Long]("big") ==
        expected.filter(col("l_quantity") > 45).count())
      assert(m.getAs[Double]("max_q") ==
        expected.agg(max("l_quantity")).head().getDouble(0))
    } finally spark.listenerManager.unregister(l)
    // sampleRate > 0 wires the executor-log tap without touching the stream
    val tapped = PipelineCompiler.compile(PipelineSpec(Seq(
      "li" -> SourceSpec("parquet", s"$sf/lineitem.parquet"),
      "s"  -> SpyNodeSpec(RefSpec("li"), "tap", sampleRate = 0.01)), "s"), spark)
    assert(tapped.count() == spark.read.parquet(s"$sf/lineitem.parquet").count())
  }

  test("decontam warnBelow: survivor-rate guardrail warns, selection identical to lazy path") {
    // the corpus-calibration guardrail (SCALING.md r14: n=3/minHits=1
    // floored a dense corpus to 876 of 5000 — as specified, surprising):
    // warnBelow makes the node report its survivor rate and warn below
    // the floor, while selecting EXACTLY what the lazy path selects
    def spec(warnBelow: Double) = PipelineSpec(Seq(
      "docs"  -> SourceSpec("parquet", s"$sf/documents.parquet"),
      "bench" -> FilterSpec(RefSpec("docs"), "doc_id % 7 = 0"),
      "clean" -> DecontamNodeSpec(RefSpec("docs"), RefSpec("bench"),
        "doc_id", "text", n = 3, minHits = 1, warnBelow = warnBelow)),
      out = "clean")
    val err = new java.io.ByteArrayOutputStream()
    val lazyIds = PipelineCompiler.compile(spec(0.0), spark)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val checkedIds = Console.withErr(err) {
      // stderr routing differs between Console and System.err — capture
      // via a swapped System.err, the channel the compiler writes to
      val old = System.err
      System.setErr(new java.io.PrintStream(err, true, "UTF-8"))
      try PipelineCompiler.compile(spec(0.99), spark)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      finally System.setErr(old)
    }
    assert(checkedIds == lazyIds,
      "warnBelow must not change WHAT the node selects")
    val log = err.toString("UTF-8")
    assert(log.contains("survivor rate"), s"rate report missing:\n$log")
    // n=3/minHits=1 against a bench drawn FROM the corpus is aggressive by
    // construction — the 0.99 floor must trip
    assert(log.contains("WARNING"), s"floor warning missing:\n$log")
  }

  test("broken chain (undefined ref) fails like job-pipeline.js:159") {
    val spec = PipelineSpec(Seq("f" -> FilterSpec(RefSpec("nope"), "1=1")), "f")
    val e = intercept[IllegalArgumentException] {
      PipelineCompiler.compile(spec, spark)
    }
    assert(e.getMessage.contains("broken chain"))
  }

  test("join + keep-first distinct specs compose") {
    val spec = PipelineSpec(nodes = Seq(
      "o"    -> SourceSpec("parquet", s"$sf/orders.parquet"),
      "c"    -> SourceSpec("parquet", s"$sf/customer.parquet"),
      "j"    -> JoinSpec(RefSpec("o"), RefSpec("c"), "o_custkey", "c_custkey"),
      "d"    -> DistinctSpec(RefSpec("j"), keys = Seq("o_custkey"), order = Seq("o_orderkey")),
      "out"  -> MapSpec(RefSpec("d"), Seq("k" -> "o_custkey", "first" -> "o_orderkey"))),
      out = "out")
    val df = PipelineCompiler.compile(spec, spark)
    assert(df.groupBy("k").count().filter(col("count") > 1).count() == 0)
  }

  test("paged source: empty-page-twice terminates, single empty resets") {
    def page(p: Int, n: Int): String =
      (0 until n).map(j => s"""{"id":${p * 10 + j}}""").mkString("\n")
    var fetched = List.empty[Int]
    val fetch: PagedSource.PageState => Option[String] = st => {
      fetched = st.page :: fetched
      st.page match {
        case 0 | 1 => Some(page(st.page, 3))
        case 2     => Some("")        // single empty: streak resets
        case 3     => Some(page(3, 2))
        case 4 | 5 => Some("")        // two in a row: terminate
        case _     => Some(page(99, 5)) // must never be reached
      }
    }
    val df = PagedSource.read(spark, fetch, PagedSource.parseNdjson _)
    assert(df.count() == 8) // 3 + 3 + 2
    assert(!fetched.contains(6), s"did not stop: $fetched")
  }

  test("paged source: fetch=None terminates immediately") {
    val df = PagedSource.read(spark, _ => None, PagedSource.parseNdjson _)
    assert(df.count() == 0)
  }

  test("paged source: transient fetch failures are retried (settle-retry rule)") {
    var failures = 0
    val fetch: PagedSource.PageState => Option[String] = st =>
      if (st.page == 1 && failures < 2) { failures += 1; throw new RuntimeException("flaky") }
      else if (st.page < 3) Some(s"""{"id":${st.page}}""")
      else None
    val df = PagedSource.read(spark, fetch, PagedSource.parseNdjson _, maxRetries = 2)
    assert(df.count() == 3)
    assert(failures == 2)
  }

  test("paged source: failures beyond maxRetries propagate") {
    val e = intercept[RuntimeException] {
      PagedSource.read(spark, _ => throw new RuntimeException("down"),
        PagedSource.parseNdjson _, maxRetries = 1)
    }
    assert(e.getMessage == "down")
  }

  test("folder reader prunes files at listing time, not per-row") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("folder").toString
    Seq("a", "b").foreach { n =>
      java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/$n.jsons"),
        s"""{"src":"$n"}""")
    }
    val df = graft.sources.Readers.folder(spark, dir, "*.jsons", "json",
      fileNamePredicate = Some(f => !f.contains("b.jsons")))
    assert(df.select("src").as[String].collect().toSeq == Seq("a"))
    // listing-time pruning: the excluded file must not appear in the scan
    val scanned = df.queryExecution.executedPlan.toString
    assert(!scanned.contains("b.jsons"))
  }
}
