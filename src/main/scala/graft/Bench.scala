package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: headline queries on SPARK_GRAFT_SF_DIR, one JSON line out.
  * Each query's full plan is forced with a noop write (no driver collect).
  *
  * Load guard (VERDICT r15 wrong #1): a capture taken on a co-tenant-loaded
  * host overstates medians 25–40% and, archived as the round's number,
  * poisons cross-round comparisons. The bench therefore (a) PRE-FLIGHTS the
  * 1-minute loadavg — above `SPARK_GRAFT_BENCH_MAX_LOAD` (default 1.5) it
  * spin-waits 30 s up to `SPARK_GRAFT_BENCH_LOAD_RETRIES` (default 6) times
  * for the host to settle — and (b) stamps `"degraded": true` in the final
  * JSON line when the pre-flight never cleared OR the measured co-tenant
  * pressure over the run (`other_cores`) exceeded
  * `SPARK_GRAFT_BENCH_MAX_OTHER_CORES` (default 0.25 — the r15 bad capture
  * measured 0.36 while a clean board reads ~0.0). CONSUMER CONTRACT: a
  * `degraded: true` line is diagnostic output, not a result — re-run on an
  * idle host instead of recording it; cross-round deltas must only compare
  * non-degraded captures (per-rep arrays on the detail line adjudicate the
  * rest). The run-wide `other_cores` average can dilute a co-tenant burst
  * confined to one query's reps below the gate; the detail line's
  * `queries_other_reps` array carries the rep-local co-tenant sample so a
  * poisoned median stays attributable even in a `degraded: false` capture.
  */
object Bench {
  // Representative of each cost class: scan+agg, broadcast join, shuffle
  // join+rollup, window, set-reshape, text analysis, minhash dedup, simhash,
  // ANN, sessionization, model-based selection (DSIR end-to-end, quality
  // scoring), and the spec-compiled flagship LLM pipelines (seven-stage
  // word-budget and eight-stage BPE-budget forms, each one
  // Catalyst-optimized plan). q_n_dsir and q_n_quality_model joined in
  // round 11, the ten-stage v3 composite (quality model → semantic dedup →
  // DSIR → BPE pack) in round 12 — absent from earlier BENCH_r*.json by
  // construction.
  val headline: Seq[String] = Seq(
    "q_c4_reducer", "q_h1_joiner", "q_h2_join_detail", "q_x_rollup",
    "q_x_window_topn", "q_c7c8_map_roundtrip", "q_e_sessionize",
    "q_n_text_stats", "q_n_dedup_minhash", "q_n_dedup_simhash",
    "q_n_dedup_spans", "q_n_ann_cosine", "q_n_ann_ivf_indexed",
    "q_n_emb_dups", "q_n_dsir",
    "q_n_quality_model", "q_n_corpus_report", "q_n_llm_pipeline",
    "q_n_llm_pipeline_v2", "q_n_llm_pipeline_v3")

  /** 1-minute loadavg — co-tenant pressure snapshot (includes this JVM
    * once it starts working, hence the start/end pair in the output).
    */
  private def load1m(): Double =
    try java.nio.file.Files.readString(java.nio.file.Paths.get("/proc/loadavg"))
      .split("\\s+")(0).toDouble
    catch { case _: Throwable => -1.0 }

  /** Total busy jiffies across all cpus from /proc/stat (USER_HZ = 10 ms). */
  private def busyJiffies(): Long =
    try {
      val f = java.nio.file.Files.readAllLines(java.nio.file.Paths.get("/proc/stat"))
        .get(0).trim.split("\\s+").drop(1).map(_.toLong)
      // fields 0-7 only (user..steal): guest/guest_nice (8-9) are already
      // folded into user/nice by the kernel — summing them double-counts
      // VM time and overstates co-tenant load
      f.take(8).sum - f(3) - f(4) // minus idle, iowait
    } catch { case _: Throwable => -1L }

  private def processCpuNs(): Long =
    java.lang.management.ManagementFactory.getOperatingSystemMXBean match {
      case os: com.sun.management.OperatingSystemMXBean => os.getProcessCpuTime
      case _ => -1L
    }

  /** Cumulative stop-the-world GC milliseconds across all collectors. */
  private def gcMillis(): Long = {
    import scala.jdk.CollectionConverters._
    java.lang.management.ManagementFactory.getGarbageCollectorMXBeans.asScala
      .map(b => math.max(0L, b.getCollectionTime)).sum
  }

  /** Cumulative JIT compilation milliseconds (−1 if unsupported). */
  private def jitMillis(): Long = {
    val c = java.lang.management.ManagementFactory.getCompilationMXBean
    if (c != null && c.isCompilationTimeMonitoringSupported) c.getTotalCompilationTime
    else -1L
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // pre-flight load gate (see the class doc): wait for a settling host
    // rather than record a loaded board; a host that never settles flags
    // the capture as degraded instead of letting it read as the number
    val maxLoad = sys.env.getOrElse("SPARK_GRAFT_BENCH_MAX_LOAD", "1.5").toDouble
    val maxOtherCores =
      sys.env.getOrElse("SPARK_GRAFT_BENCH_MAX_OTHER_CORES", "0.25").toDouble
    val loadRetries =
      sys.env.getOrElse("SPARK_GRAFT_BENCH_LOAD_RETRIES", "6").toInt
    var waits = 0
    while (load1m() > maxLoad && waits < loadRetries) {
      System.err.println(f"[bench] pre-flight: load1m=${load1m()}%.2f > " +
        f"$maxLoad%.2f — waiting 30 s (${waits + 1}/$loadRetries)")
      Thread.sleep(30000L)
      waits += 1
    }
    val degradedStart = load1m() > maxLoad
    if (degradedStart)
      System.err.println(f"[bench] pre-flight NEVER cleared (load1m=${load1m()}%.2f) " +
        "— this capture will carry degraded: true")
    // host-load accounting (VERDICT r12 §next #6): loaded-vs-idle
    // adjudication of round-over-round drift should be automatic, not a
    // SCALING.md narrative. other_cores = co-tenant busy-core average over
    // the bench (total busy CPU minus THIS process's, per wall second).
    val loadStart = load1m()
    val busy0 = busyJiffies()
    val selfCpu0 = processCpuNs()
    val wall0 = System.nanoTime()
    val spark = GraftSession.builder(master = s"local[$cpus]", shufflePartitions = cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm the JVM/codegen at sf0.01 so we time the queries, not
    // classloading/JIT: each headline query runs once first. The dedup/ANN
    // kernels (ShingleHashes, MinHashSig, SimHash64, SignLsh) only
    // JIT-compile on their first executions — measured 55 s of summed task
    // time in the first minhash stage cold vs 1.5 s warm; sf0.001's 50 docs
    // leave C2 half-done, sf0.01's 500 reach steady state.
    val warmSf = sys.env.getOrElse("SPARK_GRAFT_WARM_SF_DIR", "/root/testdata/sf0.01")
    // approximate tiers: time the unbounded organic run, not the bounded
    // correctness-gate slice (SparkEntry.benchQueries shadows those names)
    def queryFn(name: String) =
      SparkEntry.benchQueries.getOrElse(name, SparkEntry.queries(name))
    for (name <- headline)
      try queryFn(name)(spark, warmSf)
        .write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] warmup $name failed: ${e.getMessage}") }
    graft.operators.Dedup.unpersistCaches() // warm-up caches must not linger
    graft.plans.PipelineCompiler.unpersistCompiledCaches()
      spark.sharedState.cacheManager.clearCache() // v3's CacheSpec persists too
    // Host-load noise control (VERDICT r6 §next #5): every query runs
    // `reps` times and the MEDIAN is the reported number; min/max ride
    // along so round-over-round regressions are attributable to the code,
    // not to a co-tenant burning the machine during one rep.
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
    // iteration/diagnosis knobs (default = the driver's full contract):
    // BENCH_QUERIES narrows the headline set; BENCH_GC=0 skips the
    // between-rep System.gc() (the r13 one-slow-rep variance suspect)
    val toRun = sys.env.get("SPARK_GRAFT_BENCH_QUERIES")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(headline)
    val gcBetweenReps = sys.env.getOrElse("SPARK_GRAFT_BENCH_GC", "1") != "0"
    // (wall sec, GC sec inside the rep, JIT-compile sec inside the rep,
    // co-tenant busy cores averaged over the rep). The per-REP other_cores
    // closes the run-wide average's blind spot: a co-tenant burst confined
    // to one query's reps (observed: flagship-v3 walls 8.5/24.0/20.1 s with
    // flat gc/jit while the ~11-minute run averaged other_cores 0.16, under
    // the 0.25 gate) dilutes below the degraded threshold yet poisons that
    // query's median — the rep-local sample makes such a capture
    // self-attributing exactly as the gc/jit arrays already do for heap and
    // compiler effects.
    def timeOnce(name: String): (Double, Double, Double, Double) = {
      val gc0 = gcMillis(); val jit0 = jitMillis()
      val busy0 = busyJiffies(); val self0 = processCpuNs()
      val t0 = System.nanoTime()
      try { queryFn(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
        val wall = (System.nanoTime() - t0) / 1e9
        val busy1 = busyJiffies(); val self1 = processCpuNs()
        val other =
          if (busy1 < 0 || busy0 < 0 || self1 < 0 || self0 < 0 || wall <= 0) -1.0
          else math.max(0.0, ((busy1 - busy0) * 0.010 - (self1 - self0) / 1e9) / wall)
        (wall,
          (gcMillis() - gc0) / 1e3,
          if (jit0 < 0) -1.0 else (jitMillis() - jit0) / 1e3,
          other) }
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name FAILED: ${e.getMessage}"); (-1.0, -1.0, -1.0, -1.0) }
    }
    val results = toRun.map { name =>
      // rep 0 runs at the BENCH sf and is DISCARDED: the sf0.01 warm-up
      // reaches JIT steady state but not the sfDir-sized working set (OS
      // page cache, AQE runtime stats, shuffle-file reuse) — the r8 LSH
      // spread (66% of the minhash median) was first-rep dominated
      val repStats = (0 to reps).map { rep =>
        val (t, gcSec, jitSec, other) = timeOnce(name)
        // per-rep attribution to stderr: a 2× outlier rep with matching GC,
        // JIT or co-tenant seconds names its own cause (VERDICT r13 wrong #1)
        System.err.println(
          f"[bench] $name rep $rep: $t%.3f s (gc $gcSec%.3f s, jit $jitSec%.3f s, other $other%.2f cores)")
        graft.operators.Dedup.unpersistCaches()
        // the v3 flagship's CacheSpec persists register with the session
        // cache manager, not the operator registry — drop them too, or
        // reps 2..n measure cache hits instead of the pipeline
        graft.plans.PipelineCompiler.unpersistCompiledCaches()
        spark.sharedState.cacheManager.clearCache()
        // settle the heap between reps: dropping DataFrame references lets
        // the ContextCleaner reclaim their broadcast variables, but only
        // after a GC notices them — without this, queries that build a
        // broadcast per rep (q_h2's packed detail side) were measured at
        // 4-10 s inside the full bench vs 1.4 s in isolation, purely from
        // prior queries' garbage (observed r8; medians can't fix a bias
        // that hits every rep)
        if (gcBetweenReps) System.gc()
        (t, gcSec, jitSec, other)
      }.tail
      name -> repStats
    }
    val timesByName = results.map { case (k, rs) => k -> rs.map(_._1) }
    def median(ts: Seq[Double]): Double = {
      // failures are reported as -1, never as a plausible elapsed time
      val ok = ts.filter(_ >= 0).sorted
      if (ok.isEmpty) -1.0
      else if (ok.size % 2 == 1) ok(ok.size / 2)
      else (ok(ok.size / 2 - 1) + ok(ok.size / 2)) / 2
    }
    def obj(f: Seq[Double] => Double) = timesByName
      .map { case (k, ts) => "\"" + k + "\":" + f"${f(ts)}%.3f" }
      .mkString("{", ",", "}")
    val qs = obj(median)
    val total = timesByName.map { case (_, ts) => median(ts) }.filter(_ >= 0).sum
    val spread = obj(ts => ts.filter(_ >= 0).maxOption.getOrElse(-1.0)
      - ts.filter(_ >= 0).minOption.getOrElse(0.0))
    // per-rep arrays in the tail: an outlier rep is visible (and GC/JIT
    // attributable) in the artifact itself, not only in the stderr log
    def repArr(pick: ((Double, Double, Double, Double)) => Double) = results
      .map { case (k, rs) =>
        "\"" + k + "\":" + rs.map(r => f"${pick(r)}%.3f").mkString("[", ",", "]") }
      .mkString("{", ",", "}")
    // jit seconds are the r14 variance verdict: the model-heavy queries'
    // one-slow-rep spread tracks JIT compilation of the per-rep-fresh
    // codegen classes (gc stays ≤ 0.3 s while jit runs 6-10 s inside a v3
    // rep and does NOT decline rep-over-rep — every rep's cache clear
    // yields new generated classes), so the arrays make a slow rep
    // self-attributing in the artifact
    val repsObj =
      s""""queries_reps":${repArr(_._1)},"queries_gc_reps":${repArr(_._2)},""" +
        s""""queries_jit_reps":${repArr(_._3)},"queries_other_reps":${repArr(_._4)}"""
    val loadEnd = load1m()
    val wallSec = (System.nanoTime() - wall0) / 1e9
    val otherCores = {
      val busy = busyJiffies(); val selfCpu = processCpuNs()
      if (busy < 0 || busy0 < 0 || selfCpu < 0 || selfCpu0 < 0 || wallSec <= 0) -1.0
      else math.max(0.0,
        ((busy - busy0) * 0.010 - (selfCpu - selfCpu0) / 1e9) / wallSec)
    }
    // degraded = pre-flight never cleared, or measured co-tenant pressure
    // over the run exceeded the gate (a negative other_cores means the
    // /proc accounting was unavailable — not evidence of co-tenancy)
    val degraded = degradedStart || otherCores > maxOtherCores
    val loadObj = f""""load":{"start_1m":$loadStart%.2f,"end_1m":$loadEnd%.2f,"other_cores":$otherCores%.2f},"degraded":$degraded"""
    // Two lines, compact LAST (VERDICT r14 wrong #1): the r14 single-line
    // packaging folded the per-rep arrays into the summary and outgrew the
    // driver's tail capture, which then started mid-line — parsed=null, no
    // round-14 medians. The consumer tails stdout for the last {...} line,
    // so the machine contract is a SHORT final line holding only the
    // medians/spread/load summary; the per-rep wall/gc/jit arrays (the r13
    // variance-attribution ask) ride a separate PRECEDING detail line and
    // the file sink, where length is harmless.
    val line = f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"reps":$reps,"queries_spread":$spread,$loadObj,"sf":"$sfDir"}"""
    val detailLine = s"""{"metric":"total_reps",$repsObj,"sf":"$sfDir"}"""
    // sbt runMain wraps System.out/err with "[info] "/"[error] " prefixes,
    // defeating a ^{-anchored parse (VERDICT r1 §wrong #2). Write the lines
    // to the RAW process file descriptors (sbt substitutes the JVM stream
    // objects, not fd 1/2) and to a well-known file as well.
    println(detailLine)
    println(line)
    for (fd <- Seq(java.io.FileDescriptor.out, java.io.FileDescriptor.err)) {
      val raw = new java.io.PrintStream(new java.io.FileOutputStream(fd), true, "UTF-8")
      raw.println(detailLine) // deliberately not closed: fd 1/2 belong to the process
      raw.println(line) // summary stays the final line on both fds
    }
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "/tmp/bench.json")
    try java.nio.file.Files.writeString(java.nio.file.Paths.get(out), detailLine + "\n" + line + "\n")
    catch { case e: Throwable => System.err.println(s"[bench] write $out failed: ${e.getMessage}") }
    spark.stop()
    // hard exit, same rationale as Verify: a gate query's per-JVM service
    // threads must not keep the bench process alive after the line is out
    sys.exit(0)
  }
}
