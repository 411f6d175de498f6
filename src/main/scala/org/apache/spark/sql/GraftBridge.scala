package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column <-> Expression bridge for graft's native Catalyst expressions.
  *
  * Spark 4 routes the public Column API through ColumnNodes and keeps the
  * classic converters (`ExpressionUtils.column/expression`) `private[sql]`,
  * so an extension library that ships its own `Expression` needs one file
  * in this package to cross the boundary — the same pattern other
  * open-source Spark extension libraries use. Nothing else in the repo
  * lives outside the `graft` namespace.
  */
object GraftBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Live-session function registration (the registry is `private[sql]`;
    * extension libraries reach it from this package — config-time wiring
    * goes through `spark.sql.extensions` instead, see
    * [[graft.functions.GraftExtensions]]). */
  def registerFunction(spark: SparkSession,
                       id: org.apache.spark.sql.catalyst.FunctionIdentifier,
                       info: org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
                       builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry.registerFunction(id, info, builder)
}
