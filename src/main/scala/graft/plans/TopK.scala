package graft.plans

import java.util.{PriorityQueue => JPriorityQueue}

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.LazilyGeneratedOrdering
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, EqualTo, Expression, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual, Literal, RowNumber, SortOrder, UnsafeProjection, UnsafeRow, WindowExpression}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, UnaryNode, Window}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.catalyst.expressions.JoinedRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow

/** Whole-operator extension: top-k rows per key, planned as a custom
  * physical operator instead of a Window sort.
  *
  * Spark executes `row_number().over(partitionBy(k).orderBy(o)) <= k` by
  * shuffling EVERY row of the input and fully sorting each partition —
  * at 100 TB the shuffle is the whole table and the sort is the whole
  * partition, even though only k rows per key survive. This operator
  * plans the same semantics as two phases, mirroring partial
  * aggregation:
  *
  *   TopKPerKeyPartialExec  — per input partition, a bounded heap per
  *                            key keeps at most k candidate rows; runs
  *                            map-side, no distribution requirement.
  *   TopKPerKeyFinalExec    — requires ClusteredDistribution(keys)
  *                            (EnsureRequirements inserts the hash
  *                            exchange); re-selects top-k per key from
  *                            the <= k*numPartitions survivors and emits
  *                            rows with their row number.
  *
  * The shuffle therefore carries at most k rows per (input partition,
  * key) instead of everything — the reduction that matters when k <<
  * rows-per-key. Ties under the ordering may be resolved differently
  * than a full sort; like Spark's own row_number, results are only
  * deterministic when the ordering is total per key (true for every
  * query in the oracle suite).
  *
  * Wiring (all through SparkSessionExtensions, see
  * `graft.functions.GraftExtensions`):
  *   - [[TopKRewrite]]  (optimizer Rule)  Filter(rn <= k, Window(row_number))
  *                                        -> TopKPerKey logical node
  *   - [[TopKStrategy]] (SparkStrategy)   TopKPerKey -> Final(Partial(child))
  */
case class TopKPerKey(
    partitionExprs: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    rnAttr: Attribute,
    child: LogicalPlan) extends UnaryNode {
  // rnAttr keeps the ORIGINAL window alias's exprId so parent operators'
  // references to the row-number column stay resolved after the rewrite.
  override def output: Seq[Attribute] = child.output :+ rnAttr
  // rnAttr is PRODUCED here, not consumed from the child — without this
  // the plan printer flags the node as missing input.
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(rnAttr)
  override protected def withNewChildInternal(newChild: LogicalPlan): LogicalPlan =
    copy(child = newChild)
}

/** Shared per-partition top-k selection: key -> bounded max-heap (worst
  * candidate on top, evicted when a better row arrives).
  */
private[plans] object TopKHeaps {
  def select(
      iter: Iterator[InternalRow],
      keyProj: UnsafeProjection,
      ord: Ordering[InternalRow],
      k: Int): Iterator[(UnsafeRow, JPriorityQueue[UnsafeRow])] = {
    val heaps = mutable.LinkedHashMap.empty[UnsafeRow, JPriorityQueue[UnsafeRow]]
    val revCmp: java.util.Comparator[UnsafeRow] =
      (a: UnsafeRow, b: UnsafeRow) => ord.compare(b, a) // max-heap
    while (iter.hasNext) {
      val row = iter.next().asInstanceOf[UnsafeRow]
      val key = keyProj(row)
      heaps.get(key) match {
        case Some(heap) =>
          if (heap.size < k) heap.add(row.copy())
          else if (ord.compare(row, heap.peek()) < 0) {
            heap.poll(); heap.add(row.copy())
          }
        case None =>
          val heap = new JPriorityQueue[UnsafeRow](math.min(k, 16), revCmp)
          heap.add(row.copy())
          heaps.put(key.copy(), heap)
      }
    }
    heaps.iterator
  }
}

/** Map-side phase: at most k candidates per key per input partition. */
case class TopKPerKeyPartialExec(
    partitionExprs: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output
  override def requiredChildDistribution: Seq[Distribution] =
    Seq(UnspecifiedDistribution)

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val pExprs = partitionExprs
    val ordExprs = order
    val limit = k
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(pExprs, childOutput)
      val ord = new LazilyGeneratedOrdering(ordExprs, childOutput)
      TopKHeaps.select(iter, keyProj, ord, limit)
        .flatMap { case (_, heap) =>
          val it = heap.iterator(); new Iterator[InternalRow] {
            def hasNext: Boolean = it.hasNext
            def next(): InternalRow = it.next()
          }
        }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): SparkPlan =
    copy(child = newChild)
}

/** Reduce-side phase: final top-k per key + row-number assignment. The
  * declared ClusteredDistribution makes EnsureRequirements insert the
  * hash exchange over the (already partially reduced) candidate rows.
  */
case class TopKPerKeyFinalExec(
    partitionExprs: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    rnAttr: Attribute,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output :+ rnAttr
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(rnAttr)
  override def requiredChildDistribution: Seq[Distribution] =
    Seq(ClusteredDistribution(partitionExprs))

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val outAttrs = output
    val pExprs = partitionExprs
    val ordExprs = order
    val limit = k
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(pExprs, childOutput)
      val ord = new LazilyGeneratedOrdering(ordExprs, childOutput)
      val outProj = UnsafeProjection.create(outAttrs, childOutput :+ rnAttr)
      val joined = new JoinedRow
      val rnRow = new GenericInternalRow(1)
      TopKHeaps.select(iter, keyProj, ord, limit).flatMap { case (_, heap) =>
        val sorted = new Array[UnsafeRow](heap.size)
        var i = sorted.length - 1
        while (i >= 0) { sorted(i) = heap.poll(); i -= 1 } // heap pops worst-first
        sorted.iterator.zipWithIndex.map { case (row, idx) =>
          rnRow.setInt(0, idx + 1)
          outProj(joined(row, rnRow)).copy()
        }
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): SparkPlan =
    copy(child = newChild)
}

/** Optimizer rule: rewrite the canonical filtered-row_number pattern
  *
  *   Filter(rn <= K | rn < K | rn = 1 | K >= rn | K > rn,
  *     Window(Seq(rn := row_number() over (partition by p order by o)), p, o, child))
  *
  * into the TopKPerKey logical operator. Deliberately narrow: exactly
  * one window expression, a plain RowNumber, a single comparison against
  * an integer literal, and a non-empty ordering. Disabled like any rule
  * via spark.sql.optimizer.excludedRules=graft.plans.TopKRewrite.
  */
object TopKRewrite extends Rule[LogicalPlan]
    with org.apache.spark.sql.catalyst.expressions.PredicateHelper {
  val MaxK = 10000 // beyond this a full sort is no worse; keep heaps small

  private def boundFor(cond: Expression, rn: Attribute): Option[Int] = cond match {
    case LessThanOrEqual(a: Attribute, Literal(v: Int, _)) if a.semanticEquals(rn) => Some(v)
    case LessThan(a: Attribute, Literal(v: Int, _)) if a.semanticEquals(rn) => Some(v - 1)
    case EqualTo(a: Attribute, Literal(1, _)) if a.semanticEquals(rn) => Some(1)
    case EqualTo(Literal(1, _), a: Attribute) if a.semanticEquals(rn) => Some(1)
    case GreaterThanOrEqual(Literal(v: Int, _), a: Attribute) if a.semanticEquals(rn) => Some(v)
    case GreaterThan(Literal(v: Int, _), a: Attribute) if a.semanticEquals(rn) => Some(v - 1)
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond,
        Window(Seq(alias @ Alias(WindowExpression(RowNumber(), _), _)),
          partitionSpec, orderSpec, child, _)) if orderSpec.nonEmpty =>
      // Any conjunct bounding the row number selects top-k; the rest of
      // the conjunction (if any) stays as a residual Filter on top.
      val rn = alias.toAttribute
      val conjuncts = splitConjunctivePredicates(cond)
      val bounds = conjuncts.flatMap(c => boundFor(c, rn))
      if (bounds.nonEmpty && bounds.min >= 1 && bounds.min <= MaxK) {
        val k = bounds.min
        val topk = TopKPerKey(partitionSpec, orderSpec, k, rn, child)
        val residual = conjuncts.filter(c => boundFor(c, rn).isEmpty)
        if (residual.isEmpty) topk
        else Filter(residual.reduce(org.apache.spark.sql.catalyst.expressions.And), topk)
      } else f
  }
}

/** Planner strategy: TopKPerKey -> Final(Partial(child)). */
object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKey(p, o, k, rn, child) =>
      TopKPerKeyFinalExec(p, o, k, rn,
        TopKPerKeyPartialExec(p, o, k, planLater(child))) :: Nil
    case _ => Nil
  }
}
