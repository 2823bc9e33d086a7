package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.{ColumnNodeToExpressionConverter, ExpressionUtils}

/** Spark 4 removed the public `new Column(expr)` constructor; the classic
  * bridge lives in `org.apache.spark.sql.classic.ExpressionUtils`
  * (private[sql], hence this shim package).
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  /** Eager node→expression conversion. `ExpressionUtils.expression` returns a
    * lazy `ColumnNodeExpression` wrapper, which the analyzer treats as a leaf
    * when the column tree is embedded inside another expression (SQL function
    * registration) — the eager converter yields a plain catalyst tree that
    * resolves like parsed SQL.
    */
  def expression(c: Column): Expression = ColumnNodeToExpressionConverter.apply(c.node)

  /** Register a temp SQL function from an expression builder (the
    * FunctionRegistry is likewise private[sql]).
    */
  def registerFunction(spark: org.apache.spark.sql.SparkSession, name: String,
                       builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "scala_udf")

  /** A DataFrame rooted AT a persisted relation's `InMemoryRelation` leaf
    * (`Dataset.ofRows` is private[sql]). Plain `persist()` truncates
    * EXECUTION at the cache but not ANALYSIS: every downstream Dataset op
    * re-analyzes the full upstream tree, and a plan DAG whose shared nodes
    * are referenced from several branches is traversed once PER PATH — on a
    * deep composed pipeline that analysis is seconds of driver time per op.
    * Rooting downstream plans at the cache leaf makes each re-analysis
    * O(downstream), while the cached subtree stays reachable (and
    * plan-auditable) through `InMemoryTableScanExec.relation.cachedPlan`.
    * Returns None when `df` is not in the cache manager.
    */
  /** Drain the async listener bus — `QueryExecutionListener` events
    * (observed-metric delivery among them) ride it, so a caller that wants
    * metrics RIGHT AFTER an action must flush first;
    * `LiveListenerBus.waitUntilEmpty` is private[spark], hence the shim.
    */
  def flushListenerBus(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sparkContext.listenerBus.waitUntilEmpty()

  def cachedRelation(df: org.apache.spark.sql.DataFrame)
      : Option[org.apache.spark.sql.DataFrame] = {
    val cs = df.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    cs.sharedState.cacheManager
      .lookupCachedData(df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]])
      .map(cd => org.apache.spark.sql.classic.Dataset.ofRows(cs, cd.cachedRepresentation))
  }

  // Physical plans of lineage-stubbed segments, keyed by the compiled RDD.
  // WeakHashMap: the RDDScanExec consuming the stub holds the RDD strongly,
  // so an entry lives exactly as long as some plan can still reach it and
  // is collectable once the compiled pipeline is dropped (no growth in a
  // long-lived service compiling many specs).
  private val segmentPlans =
    new java.util.WeakHashMap[org.apache.spark.rdd.RDD[_],
      org.apache.spark.sql.execution.SparkPlan]()

  /** A lineage-stubbed copy of `df`: identical rows, and identical stats,
    * output partitioning, ordering and constraints (carried over by
    * `LogicalRDD.fromDataset`, exactly as `Dataset.checkpoint` builds its
    * truncated plan) — but the logical plan is a LEAF over the segment's
    * compiled RDD. Unlike `checkpoint`/`localCheckpoint` the RDD's own
    * lineage is NOT cut, so partitions lost after materialization still
    * recompute from source; and nothing is copied or persisted here — the
    * caller decides (the spec compiler persists the stub, so the one
    * consumer of the raw RDD is the cache build, which copies rows into
    * column batches itself).
    *
    * Why: `InMemoryRelation` renders its cached plan through
    * `innerChildren` on EVERY listener-event stringification
    * (`explainString` + `SparkPlanInfo` per SQL execution start and per
    * AQE stage update, on the driver main thread, even with the UI off),
    * and that expansion NESTS through referenced caches. A composed
    * pipeline whose stages each reference their input ≥ 2× (dedup
    * anti-joins, decontam, DSIR) therefore renders a string EXPONENTIAL in
    * stage count — measured 13.5M chars × 7 events on the flagship-v3
    * final action alone (~112M chars, 2.5–3.5 s of main-thread time per
    * run; `tools.RenderProbe`, r16). Stubbing the cached segment at a
    * LogicalRDD leaf makes rendering (and every downstream re-analysis)
    * linear in spec size. The segment's physical plan stays auditable
    * through [[stubbedPlan]].
    */
  def lineageStub(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val ds = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
    val qe = ds.queryExecution
    val rdd = qe.toRdd
    segmentPlans.synchronized { segmentPlans.put(rdd, qe.executedPlan) }
    val raw = org.apache.spark.sql.execution.LogicalRDD.fromDataset(rdd, ds, isStreaming = false)
    org.apache.spark.sql.classic.Dataset.ofRows(ds.sparkSession, sanitized(raw))
  }

  /** `LogicalRDD.fromDataset` carries the EXECUTED plan's output ordering
    * and partitioning over with a best-effort exprId rewrite. Two hazards
    * when the result is then PERSISTED as a cache:
    *
    *  1. A sort/hash key the final projection dropped survives as a
    *     reference to a non-output attribute, and
    *     `InMemoryRelation.withOutput` (run by plan canonicalization)
    *     remaps through a STRICT output map → `NoSuchElementException`.
    *  2. `InMemoryRelation.newInstance` — how the analyzer deduplicates a
    *     relation referenced from BOTH sides of a self-join, which is
    *     exactly the composite pipelines' diamond shape — re-mints the
    *     output exprIds but keeps `outputOrdering` unchanged, so ANY
    *     non-empty ordering goes stale and crashes canonicalization later.
    *     Pre-stub caches never hit this because a logical subtree ending in
    *     a join/aggregate has no outputOrdering, while the executed plan
    *     almost always has one (sort-merge joins, TakeOrderedAndProject).
    *
    * So the stub DROPS the ordering outright (the cost is a potential
    * re-sort downstream of a sorted cached segment — none of the declared
    * pipelines sorts the same key twice) and keeps the partitioning, which
    * lives inside the cached plan where `newInstance` cannot detach it,
    * guarded against stray references. Constraints are filtered to output
    * references for the same reason as (1).
    */
  private def sanitized(l: org.apache.spark.sql.execution.LogicalRDD)
      : org.apache.spark.sql.execution.LogicalRDD = {
    import org.apache.spark.sql.catalyst.expressions.{AttributeSet, Expression, ExpressionSet}
    import org.apache.spark.sql.catalyst.plans.physical.{Partitioning, PartitioningCollection, UnknownPartitioning}
    val outSet = AttributeSet(l.output)
    def partOk(p: Partitioning): Boolean = p match {
      case pc: PartitioningCollection => pc.partitionings.forall(partOk)
      case e: Expression => e.references.subsetOf(outSet)
      case _ => true
    }
    if (l.outputOrdering.isEmpty && partOk(l.outputPartitioning)) l
    else {
      val part = l.outputPartitioning match {
        case pc: PartitioningCollection =>
          val kept = pc.partitionings.filter(partOk)
          if (kept.nonEmpty) PartitioningCollection(kept)
          else UnknownPartitioning(pc.numPartitions)
        case p if !partOk(p) => UnknownPartitioning(p.numPartitions)
        case p => p
      }
      val cls = l.getClass
      def fld(n: String): AnyRef = {
        val f = cls.getDeclaredField(n); f.setAccessible(true); f.get(l)
      }
      val constraints = fld("originConstraints").asInstanceOf[Option[ExpressionSet]]
        .map(es => ExpressionSet(es.filter(_.references.subsetOf(outSet))))
      val copyM = cls.getMethods.find(m => m.getName == "copy" && m.getParameterCount == 9)
        .getOrElse(sys.error("LogicalRDD.copy(9) not found — Spark internals changed"))
      copyM.invoke(l, l.output, l.rdd, part, Nil, java.lang.Boolean.valueOf(l.isStreaming),
          fld("stream"), fld("session"), fld("originStats"), constraints)
        .asInstanceOf[org.apache.spark.sql.execution.LogicalRDD]
    }
  }

  /** The physical plan a [[lineageStub]] RDD was compiled from — plan-audit
    * hook for walkers that previously followed
    * `InMemoryTableScanExec.relation.cachedPlan` through composite caches
    * (PlanQualitySpec's fixpoint, PlanDump's segment appendix).
    */
  def stubbedPlan(rdd: org.apache.spark.rdd.RDD[_])
      : Option[org.apache.spark.sql.execution.SparkPlan] =
    segmentPlans.synchronized { Option(segmentPlans.get(rdd)) }

  /** Every physical plan reachable from `df` for an AUDIT walk: the outer
    * executed plan first, then — to a fixpoint, identity-deduped — every
    * plan reached through an `InMemoryTableScanExec`'s cached plan or a
    * [[lineageStub]] `RDDScanExec`'s compiled segment. Descends through
    * `AdaptiveSparkPlanExec` wrappers (collect-opaque leaves) transparently,
    * which plain `plan.collect` cannot.
    */
  def auditPlans(df: org.apache.spark.sql.DataFrame)
      : Seq[org.apache.spark.sql.execution.SparkPlan] = {
    import org.apache.spark.sql.execution.{RDDScanExec, SparkPlan}
    def hops(root: SparkPlan): Seq[SparkPlan] = {
      val out = scala.collection.mutable.ArrayBuffer[SparkPlan]()
      def walk(p: SparkPlan): Unit = {
        p match {
          case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
            walk(a.executedPlan)
          // AQE stage wrappers (ShuffleQueryStage, TableCacheQueryStage,
          // ResultQueryStage, …) are leaves too — their subtree hangs off
          // `.plan`, not `.children`
          case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
            walk(q.plan)
          case re: org.apache.spark.sql.execution.exchange.ReusedExchangeExec =>
            walk(re.child)
          case s: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec =>
            out += s.relation.cachedPlan
          case r: RDDScanExec => stubbedPlan(r.rdd).foreach(out += _)
          case _ =>
        }
        p.children.foreach(walk)
      }
      walk(root); out.toSeq
    }
    val seen = java.util.Collections.newSetFromMap(
      new java.util.IdentityHashMap[SparkPlan, java.lang.Boolean]())
    val first = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
      .queryExecution.executedPlan
    seen.add(first)
    val order = scala.collection.mutable.ArrayBuffer[SparkPlan]()
    var frontier: Seq[SparkPlan] = Seq(first)
    while (frontier.nonEmpty) {
      val next = frontier.flatMap(hops).filter(seen.add)
      order ++= next
      frontier = next
    }
    first +: order.toSeq
  }
}
