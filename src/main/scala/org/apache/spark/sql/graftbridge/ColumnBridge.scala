package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Ascending, Expression, SortOrder, UnspecifiedFrame, WindowExpression, WindowSpecDefinition}
import org.apache.spark.sql.classic.ExpressionUtils

/** Expression <-> Column conversion for custom Catalyst expressions.
  *
  * Spark 4 `Column` wraps a `ColumnNode`, not an `Expression`, and the
  * converter (`org.apache.spark.sql.classic.ExpressionUtils`) is
  * `private[sql]` — so this one-file bridge lives inside the
  * `org.apache.spark.sql` package tree. Nothing else in graft reaches into
  * Spark internals through anything but this object.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Apply a custom window-function Expression over (partition, order).
    *
    * `Column.over(WindowSpec)` only recognizes built-in window functions in
    * Spark 4 (it fails analysis with WINDOW_FUNCTION_WITHOUT_OVER_CLAUSE for
    * a custom [[org.apache.spark.sql.catalyst.expressions.WindowFunction]]),
    * so we assemble the `WindowExpression` directly; the analyzer's
    * ResolveWindowFrame picks up the function's own required frame via
    * `UnspecifiedFrame`.
    */
  def windowColumn(f: Expression, partition: Seq[Column], order: Seq[Column]): Column = {
    val sorts = order.map(expression).map {
      case s: SortOrder => s
      case e => SortOrder(e, Ascending)
    }
    column(WindowExpression(f,
      WindowSpecDefinition(partition.map(expression), sorts, UnspecifiedFrame)))
  }
}
