package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, BindReferences, Expression, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Whole-operator grouped top-k (SURVEY.md §7.3 tier c — the one
  * semantics Spark's built-ins only express as sort-heavy plans): keep
  * the first `k` rows per key group under `order`.
  *
  * Why a custom plan instead of `row_number().over(window) <= k`:
  * the window formulation hash-exchanges EVERY row, then fully sorts
  * each partition — at 100 TB the sort dominates and the shuffle
  * carries the whole table. This operator replaces both: a map-side
  * bounded heap prunes each input partition to ≤ k rows per key BEFORE
  * the exchange (top-k of a union is contained in the union of per-
  * partition top-ks), so the shuffle moves at most
  * k × keys × partitions rows, and the reduce side needs no sort at
  * all — another bounded heap per key merges the partials in O(n log k)
  * with O(keys × k) memory.
  *
  * Memory contract: state is O(distinct keys × k) rows per task, with
  * NO spill path — correct for the grouped-top-k shape (groups ≪ rows:
  * best docs per source, top customers per region). Do NOT use it as a
  * latest-wins dedup over near-unique keys, where distinct keys ≈ rows
  * and the hash map would pin the whole partition in memory; the
  * sort-based window plan spills and is the right tool there
  * ([[graft.functions.ColumnLib.latestWins]] documents the same line
  * from the other side).
  *
  * Pieces: [[TopKPerGroup]] (logical marker node) → [[TopKStrategy]]
  * (planner rule registered via `SparkSessionExtensions
  * .injectPlannerStrategy`, see [[graft.Engine.extensions]]) →
  * [[TopKPerGroupExec]] (physical operator, planned twice: a partial
  * instance with no required distribution, then a final instance whose
  * `ClusteredDistribution` makes `EnsureRequirements` insert the
  * exchange between them).
  */
final case class TopKPerGroup(
    keys: Seq[Expression], order: Seq[SortOrder], k: Int,
    child: LogicalPlan) extends UnaryNode {
  require(k >= 1, "top-k needs k >= 1")
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerGroup =
    copy(child = newChild)
}

object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroup(keys, order, k, child) =>
      val partialExec = TopKPerGroupExec(keys, order, k, partial = true,
        planLater(child))
      TopKPerGroupExec(keys, order, k, partial = false, partialExec) :: Nil
    case _ => Nil
  }
}

/** Physical bounded-heap top-k per key. `partial = true` instances
  * prune within whatever partitioning the child already has (no
  * exchange); the `partial = false` instance on top demands
  * `ClusteredDistribution(keys)` so all partials of a key meet on one
  * reducer for the exact final cut.
  */
final case class TopKPerGroupExec(
    keys: Seq[Expression], order: Seq[SortOrder], k: Int, partial: Boolean,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override def nodeName: String =
    if (partial) "TopKPerGroupPartial" else "TopKPerGroupFinal"

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(keys) :: Nil

  // Deliberately no required ordering: heaps replace the sort.

  override protected def doExecute(): RDD[InternalRow] = {
    val keyExprs = keys
    val sortOrder = order
    val limit = k
    val childOutput = child.output
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      val ord: Ordering[InternalRow] = RowOrdering.create(
        sortOrder.map(BindReferences.bindReference(_, childOutput)), Nil)
      // Per key: a max-heap (w.r.t. the sort order) of the k best rows —
      // the head is the worst kept row, evicted when a better one lands.
      val heaps = new java.util.HashMap[UnsafeRow,
        scala.collection.mutable.PriorityQueue[InternalRow]]()
      while (iter.hasNext) {
        val row = iter.next()
        val key = keyProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          heap = scala.collection.mutable.PriorityQueue.empty(ord)
          heaps.put(key.copy(), heap)
        }
        if (heap.size < limit) heap.enqueue(row.copy())
        else if (ord.compare(row, heap.head) < 0) {
          heap.dequeue()
          heap.enqueue(row.copy())
        }
      }
      import scala.jdk.CollectionConverters._
      heaps.values().iterator().asScala.flatMap(_.iterator)
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerGroupExec =
    copy(child = newChild)
}
