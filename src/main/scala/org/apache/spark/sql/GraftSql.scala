package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.SparkStrategy

/** Bridge into Spark's `private[sql]` extension seams — the standard
  * extension-library technique for building custom Catalyst pieces
  * against the Spark 4 public API (which no longer exposes an
  * Expression constructor on Column, nor a public DataFrame-from-plan).
  * Kept to exactly these four delegations; everything else in this
  * repo lives under `graft.*`:
  *   - Column ↔ Expression (native expressions/aggregates),
  *   - a DataFrame from a custom LogicalPlan (native operators),
  *   - idempotent per-session Strategy registration (the public
  *     `experimental.extraStrategies` seam, for API callers whose
  *     session was not built with GraftExtensions).
  */
object GraftSql {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  def ensureStrategy(spark: SparkSession, s: SparkStrategy): Unit = {
    val exp = spark.asInstanceOf[classic.SparkSession].experimental
    if (!exp.extraStrategies.contains(s))
      exp.extraStrategies = exp.extraStrategies :+ s
  }
}
