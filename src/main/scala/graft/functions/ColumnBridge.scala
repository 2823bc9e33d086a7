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
}
