package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal bridge into Spark's `private[sql]` classic API: converts a public
  * `Column` to its Catalyst `Expression` (needed by graft's driver-side
  * stats pruning, which pattern-matches predicate trees).
  */
object GraftShim {
  def expression(c: Column): Expression =
    org.apache.spark.sql.classic.ExpressionUtils.expression(c)

  /** Wraps a (possibly unresolved) Catalyst expression as a public Column —
    * lets graft rebuild parsed SQL plans node-by-node as DataFrame ops, with
    * the analyzer resolving names against the rebuilt children.
    */
  def column(e: Expression): Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(e)
}
