package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeSet, IntegerLiteral, SortOrder}
import org.apache.spark.sql.catalyst.expressions.codegen.LazilyGeneratedOrdering
import org.apache.spark.sql.catalyst.plans.logical.{Limit, LogicalPlan, Project, ReturnAnswer, Sort}
import org.apache.spark.sql.catalyst.plans.physical.{AllTuples, Distribution, Partitioning, SinglePartition, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

import graft.functions.FloatDotProduct

/** Tier-(d) planner extension: `ORDER BY <vec_dot score> ... LIMIT k` is
  * planned as a two-phase bounded-heap top-k instead of a sort.
  *
  * Why a whole physical strategy and not just the built-in
  * `TakeOrderedAndProject`: the built-in only fires when
  * `k < spark.sql.execution.topKSortFallbackThreshold` — above it Spark
  * falls back to a FULL global sort of the scored scan, which at 100 TB is
  * a cluster-wide sort of every row just to keep k of them. For the ANN
  * scoring pattern (the scan IS the query; k is the result size) that
  * fallback is never the right plan, so the strategy pins the bounded-heap
  * shape for any k: per-partition heaps of size k, one single-partition
  * exchange of ≤ k·partitions pre-selected rows, one final heap. The
  * exchange is requested via `requiredChildDistribution` and inserted by
  * `EnsureRequirements` — the idiomatic way a physical operator asks for a
  * distribution rather than hand-building its own shuffle.
  *
  * Matches only when the sort key's lineage contains the `vec_dot` kernel
  * ([[FloatDotProduct]]) — every other ORDER BY/LIMIT keeps Spark's own
  * planning.
  */
object ScoreTopKStrategy extends SparkStrategy {

  /** Memory bound: each task holds an UNSPILLABLE O(k)-row heap (and the
    * merge task up to k·partitions survivors). Up to this k that is a few
    * hundred MB worst case — the right trade; beyond it the strategy
    * DECLINES so Spark's spillable global sort handles pathological limits
    * instead of OOMing an executor.
    */
  private val MaxHeapK = 1 << 22

  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case ReturnAnswer(root) => apply(root)
    case Limit(IntegerLiteral(k), Sort(order, true, child, _))
        if k <= MaxHeapK && scoredBy(order, child) =>
      ScoreTopKGlobalExec(k, order,
        ScoreTopKLocalExec(k, order, planLater(child))) :: Nil
    case _ => Nil
  }

  /** The sort key is, or is an alias of, an expression containing vec_dot. */
  private def scoredBy(order: Seq[SortOrder], child: LogicalPlan): Boolean = {
    val direct = order.exists(_.child.exists(_.isInstanceOf[FloatDotProduct]))
    direct || producedByVecDot(child, AttributeSet(order.flatMap(_.references)))
  }

  private def producedByVecDot(plan: LogicalPlan, refs: AttributeSet): Boolean =
    plan match {
      case Project(projList, child) =>
        projList.exists {
          case a: Alias =>
            refs.contains(a.toAttribute) && a.child.exists(_.isInstanceOf[FloatDotProduct])
          case _ => false
        } || producedByVecDot(child, refs)
      case other => other.children.exists(producedByVecDot(_, refs))
    }
}

private[plans] object ScoreTopK {
  /** Bounded-heap top-k of an InternalRow iterator: O(n log k) time,
    * O(k) memory — never materializes or sorts the partition.
    */
  def topK(it: Iterator[InternalRow], k: Int,
           ord: Ordering[InternalRow]): Iterator[InternalRow] = {
    // LIMIT 0 normally dies in OptimizeLimitZero before planning, but the
    // operator must not NPE (pq.peek() == null) if it ever arrives here
    if (k <= 0) return Iterator.empty
    // max-heap on "worst of the kept": poll evicts the loser. Initial
    // capacity is clamped — k can legally exceed the data size (or be
    // Int.MaxValue-ish); the queue grows to at most min(k, n).
    val pq = new java.util.PriorityQueue[InternalRow](
      math.min(math.max(k, 1), 1 << 10), ord.reverse)
    while (it.hasNext) {
      val r = it.next()
      if (pq.size < k) pq.add(r.copy())
      else if (ord.lt(r, pq.peek())) { pq.poll(); pq.add(r.copy()) }
    }
    val out = new Array[InternalRow](pq.size)
    var i = out.length - 1
    while (i >= 0) { out(i) = pq.poll(); i -= 1 } // heap drains worst-first
    out.iterator
  }
}

/** Phase 1: per-partition top-k (parallel, partitioning-preserving). */
case class ScoreTopKLocalExec(k: Int, sortOrder: Seq[SortOrder], child: SparkPlan)
    extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = sortOrder // heap drains in order
  override protected def doExecute(): RDD[InternalRow] = {
    val ord = new LazilyGeneratedOrdering(sortOrder, child.output)
    child.execute().mapPartitions(ScoreTopK.topK(_, k, ord))
  }
  override protected def withNewChildInternal(c: SparkPlan): ScoreTopKLocalExec =
    copy(child = c)
}

/** Phase 2: merge the ≤ k·partitions survivors — asks the planner for an
  * all-tuples distribution (one single-partition exchange of tiny input).
  */
case class ScoreTopKGlobalExec(k: Int, sortOrder: Seq[SortOrder], child: SparkPlan)
    extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = SinglePartition
  override def outputOrdering: Seq[SortOrder] = sortOrder
  override def requiredChildDistribution: Seq[Distribution] =
    if (child.outputPartitioning == SinglePartition) UnspecifiedDistribution :: Nil
    else AllTuples :: Nil
  override protected def doExecute(): RDD[InternalRow] = {
    val ord = new LazilyGeneratedOrdering(sortOrder, child.output)
    child.execute().mapPartitions(ScoreTopK.topK(_, k, ord))
  }
  override protected def withNewChildInternal(c: SparkPlan): ScoreTopKGlobalExec =
    copy(child = c)
}
