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
}
