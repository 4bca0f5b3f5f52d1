package graft.plans

import java.util.{PriorityQueue => JPriorityQueue}

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.LazilyGeneratedOrdering
import org.apache.spark.sql.catalyst.expressions.{Alias, Ascending, Attribute, EqualTo, Expression, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual, Literal, Rank, RowNumber, SortOrder, UnsafeProjection, UnsafeRow, WindowExpression}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, UnaryNode, Window}
import org.apache.spark.sql.catalyst.plans.physical.{AllTuples, ClusteredDistribution, Distribution, UnspecifiedDistribution}
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
  *                            The per-key state map is itself bounded:
  *                            past `spark.graft.topk.maxKeysInFlight`
  *                            distinct keys it flushes all current
  *                            candidates downstream unreduced and starts
  *                            over, so arbitrary key cardinality cannot
  *                            OOM an executor (the final phase re-selects
  *                            anyway).
  *   TopKPerKeyFinalExec    — requires ClusteredDistribution(keys)
  *                            (AllTuples when the window has no PARTITION
  *                            BY) plus a (keys, order) sort, so
  *                            EnsureRequirements inserts a hash exchange
  *                            and a SortExec over the <= k*numPartitions
  *                            survivors per key. The sort spills to disk
  *                            like any SortExec; the final selection is
  *                            then a streaming group scan with O(1) state
  *                            that emits each row's row number / rank.
  *
  * The shuffle therefore carries at most k rows per (input partition,
  * key) instead of everything — the reduction that matters when k <<
  * rows-per-key. Ties under the ordering may be resolved differently
  * than a full sort in row_number mode; like Spark's own row_number,
  * results are only deterministic when the ordering is total per key
  * (true for every query in the oracle suite). Rank mode keeps ties and
  * is deterministic regardless.
  *
  * Wiring (all through SparkSessionExtensions, see
  * `graft.functions.GraftExtensions`):
  *   - [[TopKRewrite]]  (optimizer Rule)  Filter(rn <= k, Window(row_number|rank))
  *                                        -> TopKPerKey logical node
  *   - [[TopKStrategy]] (SparkStrategy)   TopKPerKey -> Final(Partial(child))
  */
case class TopKPerKey(
    partitionExprs: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    rnAttr: Attribute,
    rankMode: Boolean,
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

/** Map-side per-partition top-k selection with bounded state.
  *
  * Both selectors return lazy iterators: when the per-key map exceeds
  * `maxKeys`, every buffered candidate is streamed downstream and the map
  * restarts empty. Emitting extra rows is always safe — the final phase
  * re-selects — so the bound trades shuffle volume for a hard memory cap.
  */
private[plans] object LocalTopK {
  val DefaultMaxKeysInFlight: Int = 1 << 16

  /** row_number mode: at most k rows per key survive locally (bounded
    * max-heap per key, worst candidate on top, evicted when beaten).
    */
  def rowNumber(
      iter: Iterator[InternalRow],
      keyProj: UnsafeProjection,
      ord: Ordering[InternalRow],
      k: Int,
      maxKeys: Int): Iterator[UnsafeRow] = new Iterator[UnsafeRow] {
    private val revCmp: java.util.Comparator[UnsafeRow] =
      (a: UnsafeRow, b: UnsafeRow) => ord.compare(b, a) // max-heap
    private var heaps = mutable.LinkedHashMap.empty[UnsafeRow, JPriorityQueue[UnsafeRow]]
    private var out: Iterator[UnsafeRow] = Iterator.empty
    private var exhausted = false

    private def drain(
        m: mutable.LinkedHashMap[UnsafeRow, JPriorityQueue[UnsafeRow]]): Iterator[UnsafeRow] =
      m.valuesIterator.flatMap { h =>
        val it = h.iterator()
        new Iterator[UnsafeRow] {
          def hasNext: Boolean = it.hasNext
          def next(): UnsafeRow = it.next()
        }
      }

    private def advance(): Unit = {
      while (!out.hasNext && !exhausted) {
        if (!iter.hasNext) { exhausted = true; out = drain(heaps) }
        else {
          val row = iter.next().asInstanceOf[UnsafeRow]
          val key = keyProj(row)
          heaps.get(key) match {
            case Some(heap) =>
              if (heap.size < k) heap.add(row.copy())
              else if (ord.compare(row, heap.peek()) < 0) {
                heap.poll(); heap.add(row.copy())
              }
            case None =>
              if (heaps.size >= maxKeys) {
                val old = heaps
                heaps = mutable.LinkedHashMap.empty
                out = drain(old) // stream the old generation out lazily
              }
              val heap = new JPriorityQueue[UnsafeRow](math.min(k, 16), revCmp)
              heap.add(row.copy())
              heaps.put(key.copy(), heap)
          }
        }
      }
    }

    def hasNext: Boolean = { advance(); out.hasNext }
    def next(): UnsafeRow = { advance(); out.next() }
  }

  /** rank mode: rows whose LOCAL rank <= k survive (ties kept — a row is
    * discardable iff >= k strictly-better rows exist locally, which
    * implies its global rank also exceeds k). Per-key buffer compacted by
    * sort+cut whenever it doubles past 2k; boundary ties can legitimately
    * exceed k, that's the semantics.
    */
  def rank(
      iter: Iterator[InternalRow],
      keyProj: UnsafeProjection,
      ord: Ordering[InternalRow],
      k: Int,
      maxKeys: Int): Iterator[UnsafeRow] = new Iterator[UnsafeRow] {
    private val rowOrd = ord.asInstanceOf[Ordering[UnsafeRow]]
    private var bufs = mutable.LinkedHashMap.empty[UnsafeRow, mutable.ArrayBuffer[UnsafeRow]]
    private var out: Iterator[UnsafeRow] = Iterator.empty
    private var exhausted = false

    /** Keep rows whose rank within buf is <= k: sort, then cut at the
      * first tie-group whose start index (= count strictly better) >= k.
      */
    private def compact(buf: mutable.ArrayBuffer[UnsafeRow]): Unit = {
      buf.sortInPlace()(rowOrd)
      var groupStart = 0
      var cut = buf.length
      var i = 1
      while (i < cut) {
        if (ord.compare(buf(i), buf(i - 1)) != 0) {
          groupStart = i
          if (groupStart >= k) cut = i
        }
        i += 1
      }
      buf.takeInPlace(cut)
    }

    private def drain(
        m: mutable.LinkedHashMap[UnsafeRow, mutable.ArrayBuffer[UnsafeRow]]): Iterator[UnsafeRow] =
      m.valuesIterator.flatMap { b => compact(b); b.iterator }

    private def advance(): Unit = {
      while (!out.hasNext && !exhausted) {
        if (!iter.hasNext) { exhausted = true; out = drain(bufs) }
        else {
          val row = iter.next().asInstanceOf[UnsafeRow]
          val key = keyProj(row)
          bufs.get(key) match {
            case Some(buf) =>
              buf += row.copy()
              if (buf.length >= 2 * k + 16) compact(buf)
            case None =>
              if (bufs.size >= maxKeys) {
                val old = bufs
                bufs = mutable.LinkedHashMap.empty
                out = drain(old)
              }
              val buf = mutable.ArrayBuffer(row.copy())
              bufs.put(key.copy(), buf)
          }
        }
      }
    }

    def hasNext: Boolean = { advance(); out.hasNext }
    def next(): UnsafeRow = { advance(); out.next() }
  }
}

/** Map-side phase: at most k candidates per key per input partition
  * (plus ties in rank mode), bounded key-map with flush-on-overflow.
  */
case class TopKPerKeyPartialExec(
    partitionExprs: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    rankMode: Boolean,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output
  override def requiredChildDistribution: Seq[Distribution] =
    Seq(UnspecifiedDistribution)

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val pExprs = partitionExprs
    val ordExprs = order
    val limit = k
    val isRank = rankMode
    val maxKeys = conf.getConfString(
      "spark.graft.topk.maxKeysInFlight",
      LocalTopK.DefaultMaxKeysInFlight.toString).toInt
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(pExprs, childOutput)
      val ord = new LazilyGeneratedOrdering(ordExprs, childOutput)
      if (isRank) LocalTopK.rank(iter, keyProj, ord, limit, maxKeys)
      else LocalTopK.rowNumber(iter, keyProj, ord, limit, maxKeys)
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): SparkPlan =
    copy(child = newChild)
}

/** Reduce-side phase: final top-k per key + row-number/rank assignment.
  *
  * Declares ClusteredDistribution(keys) + a (keys, order) child ordering,
  * so EnsureRequirements inserts the hash exchange and a spillable
  * SortExec over the candidate rows. Selection is then a streaming scan:
  * keys arrive contiguous and in order, so per-key state is a counter
  * (and the previous row for tie detection in rank mode) — O(1) memory
  * regardless of key cardinality, unlike a per-key heap map.
  */
case class TopKPerKeyFinalExec(
    partitionExprs: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    rnAttr: Attribute,
    rankMode: Boolean,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output :+ rnAttr
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(rnAttr)
  override def requiredChildDistribution: Seq[Distribution] =
    if (partitionExprs.isEmpty) Seq(AllTuples)
    else Seq(ClusteredDistribution(partitionExprs))
  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(partitionExprs.map(SortOrder(_, Ascending)) ++ order)
  override def outputOrdering: Seq[SortOrder] = child.outputOrdering

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val outAttrs = output
    val pExprs = partitionExprs
    val ordExprs = order
    val limit = k
    val isRank = rankMode
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(pExprs, childOutput)
      val ord = new LazilyGeneratedOrdering(ordExprs, childOutput)
      val outProj = UnsafeProjection.create(outAttrs, childOutput :+ rnAttr)
      val joined = new JoinedRow
      val rnRow = new GenericInternalRow(1)
      var curKey: UnsafeRow = null
      var pos = 0          // rows seen in the current key group
      var curRank = 0      // rank of the current row (== pos unless ties)
      var prevRow: UnsafeRow = null
      iter.flatMap { r =>
        val row = r.asInstanceOf[UnsafeRow]
        val key = keyProj(row)
        if (curKey == null || key != curKey) {
          curKey = key.copy(); pos = 1; curRank = 1
        } else {
          pos += 1
          if (isRank) { if (ord.compare(row, prevRow) != 0) curRank = pos }
          else curRank = pos
        }
        if (isRank) prevRow = row.copy()
        if (curRank <= limit) {
          rnRow.setInt(0, curRank)
          Iterator.single(outProj(joined(row, rnRow)): InternalRow)
        } else Iterator.empty
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): SparkPlan =
    copy(child = newChild)
}

/** Optimizer rule: rewrite the canonical filtered-row_number pattern
  *
  *   Filter(rn <= K | rn < K | rn = 1 | K >= rn | K > rn,
  *     Window(Seq(rn := row_number()|rank() over (partition by p order by o)),
  *            p, o, child))
  *
  * into the TopKPerKey logical operator. rank() keeps boundary ties
  * (rank mode); dense_rank is NOT rewritten (its k-th "rank" can cover
  * unboundedly many rows per tie-group chain, so a bounded partial phase
  * buys nothing safe). Deliberately narrow otherwise: exactly one window
  * expression, a single comparison against an integer literal, and a
  * non-empty ordering (an empty PARTITION BY is fine — the final phase
  * degrades to a single AllTuples reducer over map-side-reduced
  * candidates). Disabled like any rule via
  * spark.sql.optimizer.excludedRules=graft.plans.TopKRewrite.
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
        Window(Seq(alias @ Alias(WindowExpression(fn, _), _)),
          partitionSpec, orderSpec, child, _))
        if orderSpec.nonEmpty && (fn.isInstanceOf[RowNumber] || fn.isInstanceOf[Rank]) =>
      // Any conjunct bounding the row number selects top-k; the rest of
      // the conjunction (if any) stays as a residual Filter on top.
      val rn = alias.toAttribute
      val conjuncts = splitConjunctivePredicates(cond)
      val bounds = conjuncts.flatMap(c => boundFor(c, rn))
      if (bounds.nonEmpty && bounds.min >= 1 && bounds.min <= MaxK) {
        val k = bounds.min
        val topk = TopKPerKey(partitionSpec, orderSpec, k, rn, fn.isInstanceOf[Rank], child)
        val residual = conjuncts.filter(c => boundFor(c, rn).isEmpty)
        if (residual.isEmpty) topk
        else Filter(residual.reduce(org.apache.spark.sql.catalyst.expressions.And), topk)
      } else f
  }
}

/** Planner strategy: TopKPerKey -> Final(Partial(child)). */
object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKey(p, o, k, rn, rankMode, child) =>
      TopKPerKeyFinalExec(p, o, k, rn, rankMode,
        TopKPerKeyPartialExec(p, o, k, rankMode, planLater(child))) :: Nil
    case _ => Nil
  }
}
