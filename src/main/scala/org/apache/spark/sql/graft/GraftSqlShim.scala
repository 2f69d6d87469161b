package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** The one place the library touches Spark's `private[sql]` surface: a
  * custom whole-operator [[LogicalPlan]] node needs `Dataset.ofRows` to
  * become a user-facing DataFrame, and Spark offers no public
  * constructor for that (expressions and strategies inject via
  * `SparkSessionExtensions`, logical nodes do not). Isolating the
  * access here — in the `org.apache.spark.sql` namespace, the standard
  * extension-library pattern — keeps every `graft.*` source on public
  * API only.
  */
object GraftSqlShim {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  def logicalPlan(df: DataFrame): LogicalPlan =
    df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]].logicalPlan

  /** Release the storage blocks behind a `localCheckpoint`ed frame:
    * frees every materialized-RDD leaf in the frame's plan (no-op if
    * there are none). Checkpoint blocks are otherwise freed only when
    * the ContextCleaner notices the RDD is unreachable — in a
    * long-lived daemon that lag accumulates executor storage, so
    * iterative operators free their buffers deterministically.
    * Blocking so a release visible to the caller (and to specs
    * asserting storage hygiene) has actually happened.
    */
  def unpersistCheckpoint(df: DataFrame): Unit =
    logicalPlan(df).collect {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd
    }.foreach(_.unpersist(blocking = true))

  /** EAGER Column → catalyst Expression conversion.
    * `ExpressionUtils.expression` would wrap the column node lazily
    * (`ColumnNodeExpression`), which (a) hides a `sort` node from
    * callers that pattern-match on catalyst `SortOrder` and (b) drags
    * the non-serializable internal node into task closures.
    */
  def expression(c: org.apache.spark.sql.Column):
      org.apache.spark.sql.catalyst.expressions.Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter(c.node)
}
