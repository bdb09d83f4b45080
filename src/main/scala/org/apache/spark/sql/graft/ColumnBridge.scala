package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge. `ExpressionUtils` is `private[sql]`, so the
  * one-liner conversions live in this shim package — the standard
  * extension-library technique for constructing `Column`s from custom
  * Catalyst expressions without routing everything through the
  * FunctionRegistry (which only admits `Seq[Expression]` builders, not
  * Scala-typed constructor parameters like lexicon word lists).
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Bounded-buffer top-k aggregate over `child`'s ordering (smallest k
    * when `reverse`, largest otherwise), returning the k extreme values as
    * a sorted array. Wraps Spark's `CollectTopK` (private[sql] at the
    * Scala level): each partial buffer holds at most k elements, so
    * map-side partials shuffle k rows per group per partition instead of
    * the whole corpus — the two-phase top-k shape a global
    * `row_number() OVER (PARTITION BY …)` cannot deliver when the
    * partition count is small.
    */
  def collectTopK(child: Column, num: Int, reverse: Boolean): Column =
    column(new org.apache.spark.sql.catalyst.expressions.aggregate.CollectTopK(
      expression(child), num, reverse).toAggregateExpression())
}
