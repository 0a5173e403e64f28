package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into `private[sql]` surface: build `Column`s from custom Catalyst
  * `Expression`s (the documented pattern for extension libraries — the
  * Column/ColumnNode split in Spark 4 hid the constructor).
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}

/** Bridge into the `private[sql]` session function registry: runtime
  * registration of the graft SQL functions on a live session (the
  * config-time path is public — `SparkSessionExtensions.injectFunction`
  * via [[graft.GraftExtensions]]).
  */
object FunctionBridge {
  def register(spark: org.apache.spark.sql.SparkSession, name: String,
      usage: String, builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "scala_udf")

  /** Names an extensions instance would inject, observed by letting it
    * populate a throwaway registry (`registerFunctions` is private[sql]). */
  def injectedFunctionNames(
      ext: org.apache.spark.sql.SparkSessionExtensions): Seq[String] = {
    val reg = new org.apache.spark.sql.catalyst.analysis.SimpleFunctionRegistry
    ext.registerFunctions(reg)
    reg.listFunction().map(_.funcName)
  }
}

/** Bridge into the `private[sql]` optimizer handle: re-run a session's
  * optimizer over an already-optimized plan — how JoinReorderSpec pins
  * that [[graft.plans.CatalogJoinReorder]] reaches a fixpoint (a second
  * optimization pass must leave its own output untouched).
  */
object OptimizerBridge {
  def reoptimize(spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.optimizer.execute(plan)
}
