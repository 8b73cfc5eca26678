package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.execution.datasources.DataSourceStrategy
import org.apache.spark.sql.sources.Filter

/** Catalyst `Expression` → `sources.Filter` translation, for scan
  * builders that receive catalyst predicates
  * (`SupportsPushDownCatalystFilters`) but prune files through the
  * manifest's `sources.Filter`-shaped helpers. Spark's own translator
  * (`DataSourceStrategy.translateFilter`) is `protected[sql]`, so the
  * one-line accessor lives in this package tree — same contract as
  * [[ColumnBridge]]: nothing else in graft reaches into Spark internals
  * outside `graftbridge`.
  */
object FilterBridge {
  def translate(e: Expression): Option[Filter] =
    DataSourceStrategy.translateFilter(e, supportNestedPredicatePushdown = true)
}
