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
  * Memory safety: the per-group heap store participates in Spark's
  * execution-memory arbitration — retained bytes are acquired from the
  * task's TaskMemoryManager (so spillable consumers are asked to free
  * memory before this store grows, and exhaustion surfaces as an accounted
  * error, not a silent executor OOM). The map-side (partial) phase
  * additionally bounds itself: past `spark.graft.topk.maxPartialGroups`
  * distinct groups it FLUSHES the accumulated heaps downstream and resets —
  * correct because the final phase merges per-group candidates anyway; a
  * flush merely weakens the pre-exchange cap for pathological
  * many-tiny-groups inputs. The final phase sees only the capped candidate
  * set, clustered by group, so its footprint is (groups-in-task × k) rows.
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
    // map-side flush threshold (partial phase only): bounds the heap store
    // for pathological many-tiny-groups inputs. Read on the driver at
    // execution time, captured into the closure.
    val maxPartialGroups = conf
      .getConfString("spark.graft.topk.maxPartialGroups", "")
      .toIntOption.getOrElse(1048576) // junk values fall back to the default
    val flushLimit = if (partial) math.max(1, maxPartialGroups) else Int.MaxValue
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
      // Execution-memory accounting: retained bytes are acquired from the
      // task's memory manager, so the store is inside Spark's arbitration
      // (spillable consumers shrink first) rather than invisible on-heap
      // growth. The heaps themselves are k-bounded and non-evictable, so
      // spill() has nothing to release.
      val taskCtx = org.apache.spark.TaskContext.get()
      val tmm =
        if (taskCtx == null) null
        else org.apache.spark.sql.GraftSqlBridge.taskMemoryManager(taskCtx)
      val consumer =
        if (tmm == null) null
        else new org.apache.spark.memory.MemoryConsumer(
            tmm, tmm.pageSizeBytes(),
            org.apache.spark.memory.MemoryMode.ON_HEAP) {
          override def spill(size: Long, trigger: org.apache.spark.memory.MemoryConsumer): Long = 0L
        }
      var acquired = 0L
      def retain(bytes: Long): Unit = if (consumer != null) {
        val got = consumer.acquireMemory(bytes)
        acquired += got
        if (got < bytes) throw new IllegalStateException(
          s"top-k-per-group heap store exhausted execution memory " +
            s"($acquired bytes held); increase partitions, lower " +
            s"spark.graft.topk.maxPartialGroups, or use the window form")
      }
      def releaseAll(): Unit = if (consumer != null && acquired > 0) {
        consumer.freeMemory(acquired); acquired = 0L
      }
      def release(bytes: Long): Unit = if (consumer != null) {
        val b = math.min(bytes, acquired)
        if (b > 0) { consumer.freeMemory(b); acquired -= b }
      }
      if (taskCtx != null)
        taskCtx.addTaskCompletionListener[Unit](_ => releaseAll())

      // chunked processing: consume input until exhaustion or (partial
      // phase) the group-count flush limit, emit that chunk's heaps, reset
      new Iterator[InternalRow] {
        private var pending: java.util.Iterator[UnsafeRow] =
          java.util.Collections.emptyIterator()
        private var carry: UnsafeRow = null

        private def fill(): Unit = {
          // the PREVIOUS chunk has been fully drained by the consumer at
          // this point — release its retained bytes now, not at emit time:
          // releasing when the chunk is built would leave the emitted rows
          // (the whole partition output in the final phase) unaccounted at
          // the moment of peak retention
          releaseAll()
          val heaps =
            new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[UnsafeRow]]()
          var full = false
          while (!full && (carry != null || iter.hasNext)) {
            val u = if (carry != null) carry
              else iter.next() match {
                case ur: UnsafeRow => ur
                case other => toUnsafe(other)
              }
            carry = null
            val key = keyProj(u)
            var heap = heaps.get(key)
            if (heap == null) {
              if (heaps.size >= flushLimit) {
                // new group past the limit: keep the row for the next chunk
                carry = u.copy(); full = true
              } else {
                heap = new java.util.PriorityQueue[UnsafeRow](kk, worstFirst)
                val keyCopy = key.copy()
                heaps.put(keyCopy, heap)
                retain(keyCopy.getSizeInBytes + 64L)
              }
            }
            if (heap != null) {
              if (heap.size < kk) {
                val c = u.copy(); heap.offer(c); retain(c.getSizeInBytes + 48L)
              } else if (ordering.compare(u, heap.peek()) < 0) {
                // account the swap: variable-length rows mean the new copy
                // and the evicted row can differ in size (retain first —
                // conservative during the instant both are referenced)
                val evicted = heap.poll()
                val c = u.copy(); heap.offer(c)
                retain(c.getSizeInBytes + 48L)
                release(evicted.getSizeInBytes + 48L)
              }
            }
          }
          val out = new java.util.ArrayList[UnsafeRow](heaps.size * kk)
          heaps.values.forEach(h => h.forEach(r => out.add(r)))
          // retained bytes stay accounted until the chunk is drained (the
          // next fill() or task completion releases them)
          pending = out.iterator()
        }

        override def hasNext: Boolean = {
          while (!pending.hasNext && (carry != null || iter.hasNext)) fill()
          pending.hasNext
        }
        override def next(): InternalRow = {
          if (!hasNext) throw new NoSuchElementException
          pending.next()
        }
      }
    }, preservesPartitioning = true)
  }
}
