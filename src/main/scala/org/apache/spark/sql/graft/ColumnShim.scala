package org.apache.spark.sql.graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 made Expression↔Column conversion `private[sql]`
  * (ExpressionUtils in the classic module); libraries shipping native
  * Catalyst expressions expose it through an in-package shim — the
  * established pattern for Spark extension libraries. */
object ColumnShim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** DataFrame ↔ LogicalPlan for libraries shipping custom logical
    * operators (Dataset.ofRows is `private[sql]` too). */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
  def logicalPlan(df: DataFrame): LogicalPlan =
    df.queryExecution.analyzed

  /** Stable per-session identity (`sessionUUID` is `private[sql]`) —
    * used as a cache key where holding the session object itself would
    * pin it (see graft.functions.Dedup's pipeline cache). */
  def sessionUuid(s: SparkSession): String =
    s.asInstanceOf[org.apache.spark.sql.classic.SparkSession].sessionUUID
}
