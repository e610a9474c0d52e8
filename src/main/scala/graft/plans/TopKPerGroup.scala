package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}

/** Native top-k-per-group — the custom whole-operator Catalyst path
  * (LogicalPlan + SparkStrategy + physical operator) for the group-limit
  * shape (`ROW_NUMBER() OVER (PARTITION BY g ORDER BY s) <= k`).
  *
  * Why a custom operator: the window formulation SORTS every group's full
  * row set inside the exchange before discarding all but k rows. This
  * operator keeps a bounded heap of k rows per group instead — O(n log k)
  * comparisons, O(groups × k) memory, no sort buffer/spill — and runs in
  * TWO phases like a partial aggregation: a map-side pass caps each input
  * partition's contribution at k rows per group BEFORE the exchange (the
  * shuffle then carries at most partitions × groups × k rows, instead of
  * every row), and a reduce-side pass merges. At 100 TB with k ≪ group
  * size, the map-side cap is the difference between shuffling the table
  * and shuffling a bounded candidate set — same reason TakeOrdered exists
  * for the global-limit case; this is its grouped generalization.
  *
  * The sort order must be TOTAL (include a tie-break column) for a
  * deterministic result set — the same requirement the window form has.
  *
  * Memory note: each task holds one k-row heap per DISTINCT group in its
  * partition (no spill path, unlike HashAggregate). With the usual
  * k ≪ rows-per-group this is far below the input size; for extreme group
  * cardinality with tiny groups, size partitions accordingly (or fall back
  * to the window form, which sorts but spills).
  */
final case class TopKPerGroup(
    groupExprs: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: LogicalPlan) extends UnaryNode {
  require(k > 0, "k must be positive")
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerGroup =
    copy(child = newChild)
}

/** Planner strategy: logical TopKPerGroup → partial exec (map-side cap) →
  * [EnsureRequirements inserts the hash exchange on the group key] →
  * final exec. Injected via [[graft.GraftExtensions]].
  */
object TopKPerGroupStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroup(groupExprs, order, k, child) =>
      val partial = TopKPerGroupExec(groupExprs, order, k, partial = true,
        planLater(child))
      TopKPerGroupExec(groupExprs, order, k, partial = false, partial) :: Nil
    case _ => Nil
  }
}

/** Physical top-k-per-group: per input partition, one bounded max-heap of
  * k rows per group key (heap root = the WORST kept row; a new row replaces
  * it only if it sorts strictly before it). `partial = true` runs before
  * the exchange with no distribution requirement; the final phase requires
  * the group-key clustering.
  */
final case class TopKPerGroupExec(
    groupExprs: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    partial: Boolean,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) Seq(UnspecifiedDistribution)
    else Seq(ClusteredDistribution(groupExprs))

  override def outputPartitioning: Partitioning = child.outputPartitioning

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerGroupExec =
    copy(child = newChild)

  override protected def doExecute(): RDD[InternalRow] = {
    val inputSchema = child.output
    val groupE = groupExprs
    val orderE = order
    val kk = k
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(groupE, inputSchema)
      val ordering = GenerateOrdering.generate(orderE, inputSchema)
      // rows are UnsafeRow from every standard operator; convert defensively
      // if a child ever emits another InternalRow flavor
      val toUnsafe = UnsafeProjection.create(inputSchema.map(_.dataType).toArray)
      // heap root = worst kept row → comparator REVERSES the sort order
      val worstFirst = new java.util.Comparator[UnsafeRow] {
        override def compare(a: UnsafeRow, b: UnsafeRow): Int =
          ordering.compare(b, a)
      }
      val heaps = new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[UnsafeRow]]()
      iter.foreach { row =>
        val u = row match {
          case ur: UnsafeRow => ur
          case other => toUnsafe(other)
        }
        val key = keyProj(u)
        var heap = heaps.get(key)
        if (heap == null) {
          heap = new java.util.PriorityQueue[UnsafeRow](kk, worstFirst)
          heaps.put(key.copy(), heap)
        }
        if (heap.size < kk) heap.offer(u.copy())
        else if (ordering.compare(u, heap.peek()) < 0) {
          heap.poll(); heap.offer(u.copy())
        }
      }
      val out = new scala.collection.mutable.ArrayBuffer[InternalRow](heaps.size * kk)
      heaps.values.forEach(h => h.forEach(r => out += r))
      out.iterator
    }, preservesPartitioning = true)
  }
}
