package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into Spark's `private[sql]` Column ↔ Expression converters —
  * the standard extension-library technique for registering custom
  * Catalyst expressions against the Spark 4 Column API (which no longer
  * exposes a public Expression constructor). Kept to exactly these two
  * delegations; everything else in this repo lives under `graft.*`.
  */
object GraftSql {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
