package graft.plans

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Alias, Attribute, AttributeReference, AttributeSet, EqualTo, Expression,
  GenericInternalRow, IntegerLiteral, JoinedRow, LessThan, LessThanOrEqual,
  PredicateHelper, RowNumber, SortOrder, UnsafeProjection, UnsafeRow,
  WindowExpression
}
import org.apache.spark.sql.catalyst.expressions.codegen.LazilyGeneratedOrdering
import org.apache.spark.sql.catalyst.plans.logical.{
  Filter, LogicalPlan, UnaryNode, Window => LogicalWindow,
  WindowGroupLimit
}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.plans.physical.{
  ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution
}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Bounded-heap top-k-per-key — graft's custom physical operator.
  *
  * The idiomatic Spark formulation (`row_number().over(partitionBy(key)
  * .orderBy(o)) <= k`) plans as Sort → WindowGroupLimit(Partial) →
  * Exchange → Sort → WindowGroupLimit(Final) → Window: two FULL sorts
  * of every partition (O(n log n)) even though only k rows per key
  * survive, with the first sort materializing the entire input.
  *
  * This operator keeps a size-k heap per key instead:
  *   PartialTopKExec  — per input partition, O(n log k), no sort;
  *                      emits ≤ k rows per (key, partition)
  *   Exchange(key)    — shuffles only those survivors
  *   FinalTopKExec    — re-heaps per key, emits rows in rank order
  *                      with the row_number column attached
  *
  * No Sort nodes anywhere; shuffle volume drops from n rows to
  * ≤ k · keys · partitions. Memory per task is k rows per distinct
  * key in that task — the same order as the rows the window plan
  * would RETURN, but held in a heap instead of sorting the whole
  * input (the window plan's sort buffer holds all n and spills).
  *
  * Wired in by [[RewriteWindowTopK]], which pattern-matches the
  * `Filter(rnk <= k, Window(row_number, …))` shape, so user code keeps
  * the idiomatic window formulation and simply plans better — the same
  * contract as Spark's own InferWindowGroupLimit, one step further.
  * Row_number semantics (ties broken by heap order) match the window
  * operator whenever the ordering is total; with a non-total ordering
  * both operators are free to pick any of the tied rows.
  */
case class TopKPerKey(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    rankAttr: Attribute,
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def producedAttributes: AttributeSet = AttributeSet(rankAttr)
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKey =
    copy(child = newChild)
}

/** Shared heap logic: keep the k earliest rows per key under `order`. */
private[plans] object TopKHeap {
  /** Returns key -> max-heap of the k best rows (head = worst kept). */
  def collect(
      iter: Iterator[InternalRow],
      keys: Seq[Expression],
      order: Seq[SortOrder],
      k: Int,
      inputAttrs: Seq[Attribute]): mutable.HashMap[UnsafeRow, mutable.PriorityQueue[InternalRow]] = {
    val keyProj = UnsafeProjection.create(keys, inputAttrs)
    // converts whatever InternalRow the child emits into UnsafeRow so
    // the partial output is exchange-ready
    val rowProj = UnsafeProjection.create(inputAttrs, inputAttrs)
    // compare(a,b) < 0  ⇔  a ranks before b
    val ord: Ordering[InternalRow] = new LazilyGeneratedOrdering(order, inputAttrs)
    val heaps = mutable.HashMap.empty[UnsafeRow, mutable.PriorityQueue[InternalRow]]
    while (iter.hasNext) {
      val projected = rowProj(iter.next()) // reused buffer; copy before storing
      heaps.get(keyProj(projected)) match {
        case Some(pq) =>
          if (pq.size < k) pq.enqueue(projected.copy())
          else if (ord.compare(projected, pq.head) < 0) {
            pq.dequeue()
            pq.enqueue(projected.copy())
          }
        case None =>
          val pq = mutable.PriorityQueue.empty[InternalRow](ord)
          pq.enqueue(projected.copy())
          heaps.put(keyProj(projected).copy(), pq)
      }
    }
    heaps
  }
}

/** Map-side pruning: ≤ k rows per key per input partition, no sort,
  * no shuffle. Output order within a key is unspecified (the Final
  * stage re-orders). */
case class PartialTopKExec(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val (ks, os, attrs, kk) = (keys, order, child.output, k)
    child.execute().mapPartitions({ iter =>
      TopKHeap.collect(iter, ks, os, kk, attrs).valuesIterator.flatMap(_.iterator)
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): PartialTopKExec =
    copy(child = newChild)
}

/** Reduce side: requires clustering on the keys (EnsureRequirements
  * inserts the hash exchange over the partial survivors), re-heaps,
  * and emits each key's rows in rank order with the row_number
  * attached. */
case class FinalTopKExec(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    rankAttr: Attribute,
    child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override def producedAttributes: AttributeSet = AttributeSet(rankAttr)

  override def requiredChildDistribution: Seq[Distribution] =
    if (keys.isEmpty) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(keys) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val (ks, os, attrs, kk, out) = (keys, order, child.output, k, output)
    child.execute().mapPartitions({ iter =>
      val outProj = UnsafeProjection.create(out, out)
      val joined = new JoinedRow
      val rankRow = new GenericInternalRow(1)
      TopKHeap.collect(iter, ks, os, kk, attrs).valuesIterator.flatMap { pq =>
        // dequeueAll pops the heap max first → reverse = rank order
        val ranked = pq.dequeueAll.reverseIterator
        ranked.zipWithIndex.map { case (row, i) =>
          rankRow.update(0, i + 1)
          outProj(joined(row, rankRow))
        }
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): FinalTopKExec =
    copy(child = newChild)
}

/** Rewrites `Filter(… ∧ rnk ≤ k ∧ …, Window([row_number() AS rnk],
  * partitionBy keys orderBy o))` to [[TopKPerKey]]. The full original
  * filter is kept above the new node (the rank column is in its
  * output), so any extra conjuncts — or an exact `rnk = n` match —
  * stay correct; the re-evaluation of the rank bound over ≤ k rows
  * per key is free. Fires only when the window computes exactly one
  * expression (a plain ROW_NUMBER) and all key/order expressions are
  * evaluable against the window's input. */
object RewriteWindowTopK extends Rule[LogicalPlan] with PredicateHelper {

  private def rankBound(conjuncts: Seq[Expression], rnk: Attribute): Option[Int] =
    conjuncts.collectFirst {
      case LessThanOrEqual(a: AttributeReference, IntegerLiteral(v))
        if a.exprId == rnk.exprId => v
      case LessThan(a: AttributeReference, IntegerLiteral(v))
        if a.exprId == rnk.exprId => v - 1
      case EqualTo(a: AttributeReference, IntegerLiteral(v))
        if a.exprId == rnk.exprId => v
      case EqualTo(IntegerLiteral(v), a: AttributeReference)
        if a.exprId == rnk.exprId => v
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond,
        LogicalWindow(
          Seq(alias @ Alias(WindowExpression(_: RowNumber, _), _)),
          partitionSpec, orderSpec, windowChild, _)) =>
      // Spark's own InferWindowGroupLimit may already have inserted a
      // logical WindowGroupLimit below the Window — subsumed here.
      val child = windowChild match {
        case WindowGroupLimit(_, _, _, _, grandChild) => grandChild
        case other => other
      }
      val rnk = alias.toAttribute
      rankBound(splitConjunctivePredicates(cond), rnk) match {
        case Some(k) if k >= 1 && partitionSpec.nonEmpty && orderSpec.nonEmpty &&
            (partitionSpec ++ orderSpec).forall(_.references.subsetOf(child.outputSet)) =>
          Filter(cond, TopKPerKey(partitionSpec, orderSpec, k, rnk, child))
        case _ => f
      }
  }
}

/** Plans [[TopKPerKey]] as Partial → (exchange) → Final. */
object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKey(keys, order, k, rankAttr, child) =>
      FinalTopKExec(keys, order, k, rankAttr,
        PartialTopKExec(keys, order, k, planLater(child))) :: Nil
    case _ => Nil
  }
}

/** Programmatic injection into an existing session (the driver hands
  * us its own SparkSession; `spark.experimental` is the public hook
  * that doesn't require builder-time configuration). Idempotent. */
object GraftPlanner {
  def ensureInjected(spark: SparkSession): Unit = synchronized {
    val exp = spark.experimental
    if (!exp.extraOptimizations.contains(RewriteWindowTopK))
      exp.extraOptimizations = exp.extraOptimizations :+ RewriteWindowTopK
    if (!exp.extraStrategies.contains(TopKStrategy))
      exp.extraStrategies = exp.extraStrategies :+ TopKStrategy
  }
}
