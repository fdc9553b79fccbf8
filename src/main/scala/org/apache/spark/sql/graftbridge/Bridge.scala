package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The one `private[sql]` seam graft's SQL surface needs: turning an
  * already-analyzed [[LogicalPlan]] (the MERGE statement's source
  * subtree) back into a [[DataFrame]] so
  * [[graft.sql.GraftMergeCommand]] can hand it to the existing
  * `Scale.mergeInto` API. Placing this object under
  * `org.apache.spark.sql` is the standard connector idiom (Delta,
  * Sedona, spark-excel all ship such a shim) — no Spark internals are
  * copied, only the accessibility boundary is crossed. */
object Bridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession],
      plan)

  /** Can this predicate reach a `SupportsDelete` connector as v1
    * Filters? Drives [[graft.sql.GraftMergeRule]]'s DELETE arm to
    * step aside for the catalog hook (which pre-prunes by
    * partition/stats) whenever core Spark can serve the statement. */
  def translatable(
      e: org.apache.spark.sql.catalyst.expressions.Expression): Boolean =
    org.apache.spark.sql.execution.datasources.DataSourceStrategy
      .translateFilter(e, supportNestedPredicatePushdown = true)
      .isDefined

  /** Wrap a catalyst expression as a user-facing [[Column]] (the
    * UPDATE/DELETE commands re-resolve statement expressions against
    * the COW rewrite's own frame — attributes are unresolved-by-name
    * before they get here). */
  def column(e: org.apache.spark.sql.catalyst.expressions.Expression)
      : org.apache.spark.sql.Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(e)
}
