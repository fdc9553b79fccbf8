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

  /** This predicate as the v1 [[org.apache.spark.sql.sources.Filter]]
    * core Spark would hand a `SupportsDelete` connector, if it
    * translates at all. [[graft.sql.GraftMergeRule]]'s DELETE arm
    * composes this with the catalog's OWN spellability test
    * (`GraftFilters.filterSql`) so the arm steps aside exactly when
    * the hook can serve the statement — translate-only gating skipped
    * predicates (LIKE, EqualNullSafe, nested fields) that the hook
    * then refused (r11 advice). */
  def translate(
      e: org.apache.spark.sql.catalyst.expressions.Expression)
      : Option[org.apache.spark.sql.sources.Filter] =
    org.apache.spark.sql.execution.datasources.DataSourceStrategy
      .translateFilter(e, supportNestedPredicatePushdown = true)

  /** Re-tag a computed batch frame as STREAMING for a v1 streaming
    * `Source.getBatch` return value (MicroBatchExecution asserts
    * `isStreaming`; the file source marks its relation the same way).
    * The plan stays fully distributed — `toRdd` is the lazily-
    * executed physical plan, pinned into a streaming-tagged
    * [[org.apache.spark.sql.execution.LogicalRDD]]. */
  def asStreamingBatch(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
      .asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val plan = org.apache.spark.sql.execution.LogicalRDD.apply(
      df.queryExecution.analyzed.output.asInstanceOf[
        scala.collection.immutable.Seq[
          org.apache.spark.sql.catalyst.expressions.Attribute]],
      df.queryExecution.toRdd,
      isStreaming = true)(spark)
    org.apache.spark.sql.classic.Dataset.ofRows(spark, plan)
  }

  /** `StructType.merge` is `private[sql]`; chain reads merge per-file
    * footer schemas with it — the same reduction Spark's own
    * `mergeSchema` path performs — so an explicit-schema read can
    * replace the distributed footer-merge job (guide §1.2). */
  def mergeSchemas(ss: Seq[org.apache.spark.sql.types.StructType])
      : org.apache.spark.sql.types.StructType =
    ss.reduceLeft(_ merge _)

  /** Wrap a catalyst expression as a user-facing [[Column]] (the
    * UPDATE/DELETE commands re-resolve statement expressions against
    * the COW rewrite's own frame — attributes are unresolved-by-name
    * before they get here). */
  def column(e: org.apache.spark.sql.catalyst.expressions.Expression)
      : org.apache.spark.sql.Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(e)
}
