package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal bridge into Spark's `private[sql]` classic API: converts a public
  * `Column` to its Catalyst `Expression` (needed by graft's driver-side
  * stats pruning, which pattern-matches predicate trees).
  */
object GraftShim {
  def expression(c: Column): Expression =
    org.apache.spark.sql.classic.ExpressionUtils.expression(c)
}
