package graft.operators

import graft.plans.TopKPerGroup
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{Ascending, SortOrder}
import org.apache.spark.sql.graft.GraftSqlShim

/** User-facing face of the custom grouped top-k operator
  * ([[graft.plans.TopKPerGroup]]): keep the first `k` rows per key
  * group under `order`. Requires the TopK planner strategy, registered
  * in [[graft.Engine.extensions]].
  *
  * `order` must be a TOTAL order (add a unique tiebreaker) for results
  * to be deterministic — the same contract as the window formulation it
  * replaces, but executed with bounded heaps instead of a full sort
  * (see the plan scaladoc for the shuffle/sort math).
  */
object TopK {

  def perGroup(df: DataFrame, keys: Seq[String], order: Seq[Column],
      k: Int): DataFrame = {
    val keyExprs = keys.map(n => UnresolvedAttribute.quoted(n):
      org.apache.spark.sql.catalyst.expressions.Expression)
    val sortOrders = order.map(c => GraftSqlShim.expression(c) match {
      case so: SortOrder => so
      case e             => SortOrder(e, Ascending)
    })
    GraftSqlShim.ofRows(df.sparkSession,
      TopKPerGroup(keyExprs, sortOrders, k, GraftSqlShim.logicalPlan(df)))
  }
}
