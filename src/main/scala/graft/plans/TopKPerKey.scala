package graft.plans

import scala.collection.mutable
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}
import org.apache.spark.sql.execution.metric.{SQLMetric, SQLMetrics}

/** Logical node: keep the top `k` rows per key group, ordered by
  * `order`. Planned as a two-phase physical operator (partial per
  * input partition, final after clustering) so at most k rows per key
  * per partition cross the shuffle — the window `row_number() <= k`
  * formulation shuffles and fully sorts EVERY row, which is exactly
  * the cost this operator removes at 100 TB.
  */
case class TopKPerKey(keys: Seq[Expression], order: Seq[SortOrder],
    k: Int, child: LogicalPlan) extends UnaryNode {
  require(k > 0, s"k must be positive, got $k")
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKey =
    copy(child = newChild)
}

/** Physical per-key bounded top-k, memory-bounded in both phases:
  *
  *  - `partial = true` runs on the child's partitioning (map-side
  *    pre-trim). Its per-key buffer map is capped at `flushKeys`
  *    distinct keys: on overflow the current per-key top-k rows are
  *    emitted downstream and the map resets. Each flushed segment's
  *    top-k is a superset of that segment's contribution to the true
  *    per-partition top-k, so flushing never loses a qualifying row —
  *    it only forwards a few extra rows for the final phase to trim.
  *    Peak memory: flushKeys × 2k rows, regardless of key cardinality.
  *  - `partial = false` (exact answer) requires clustering AND
  *    key-sorted input — Spark plans a spillable external sort under
  *    it — and streams one key group at a time with O(k) state. No
  *    per-partition key map at all, so a partition with millions of
  *    distinct keys runs in constant memory.
  */
case class TopKPerKeyExec(keys: Seq[Expression], order: Seq[SortOrder],
    k: Int, partial: Boolean, child: SparkPlan,
    flushKeys: Int = 1 << 16) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  /** Observability at scale: the Spark UI / executedPlan shows how
    * hard the pre-shuffle trim works — input vs output rows IS the
    * trim ratio, and the flush count shows whether flushKeys is sized
    * to the key cardinality per partition.
    */
  override lazy val metrics: Map[String, SQLMetric] = Map(
    "numInputRows" -> SQLMetrics.createMetric(sparkContext, "input rows"),
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "output rows"),
    "numFlushes" -> SQLMetrics.createMetric(sparkContext,
      "partial buffer flushes (cap overflow)"))

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(keys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    if (partial) Seq(Nil)
    else Seq(keys.map(SortOrder(_, Ascending)))

  override def outputPartitioning: Partitioning = child.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val keyExprs = keys
    val sortOrder = order
    val limit = k
    val cap = flushKeys
    val isPartial = partial
    val mIn = longMetric("numInputRows")
    val mOut = longMetric("numOutputRows")
    val mFlush = longMetric("numFlushes")
    child.execute().mapPartitions { iter =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      val rowOrdering = GenerateOrdering.generate(sortOrder, childOutput)
        .asInstanceOf[Ordering[InternalRow]]
      val counted = iter.map { r => mIn += 1; r }
      val out =
        if (isPartial) partialIterator(counted, keyProj, rowOrdering, limit,
          cap, mFlush)
        else finalIterator(counted, keyProj, rowOrdering, limit)
      out.map { r => mOut += 1; r }
    }
  }

  /** Hash-buffer pre-trim with flush-on-cap. */
  private def partialIterator(iter: Iterator[InternalRow],
      keyProj: UnsafeProjection, rowOrdering: Ordering[InternalRow],
      limit: Int, cap: Int, flushMetric: SQLMetric): Iterator[InternalRow] =
    new Iterator[InternalRow] {
      private val buffers =
        mutable.HashMap.empty[UnsafeRow, mutable.ArrayBuffer[InternalRow]]
      private var pending: Iterator[InternalRow] = Iterator.empty

      private def drain(): Iterator[InternalRow] = {
        val out = buffers.valuesIterator
          .flatMap(b => b.sorted(rowOrdering).take(limit)).toArray
        buffers.clear()
        out.iterator
      }

      private def fill(): Unit = {
        while (!pending.hasNext && iter.hasNext) {
          val row = iter.next()
          val key = keyProj(row)
          val buf = buffers.get(key) match {
            case Some(b) => b
            case None =>
              val b = mutable.ArrayBuffer.empty[InternalRow]
              buffers.put(key.copy(), b)
              b
          }
          buf += row.copy()
          // sorted-on-demand trim at 2k amortizes the sort cost
          if (buf.length >= 2 * limit) {
            val kept = buf.sorted(rowOrdering).take(limit)
            buf.clear()
            buf ++= kept
          }
          if (buffers.size >= cap) { flushMetric += 1; pending = drain() }
        }
        if (!pending.hasNext && !iter.hasNext && buffers.nonEmpty)
          pending = drain()
      }

      override def hasNext: Boolean = { fill(); pending.hasNext }
      override def next(): InternalRow = { fill(); pending.next() }
    }

  /** Streaming group-at-a-time top-k over key-sorted input. */
  private def finalIterator(iter: Iterator[InternalRow],
      keyProj: UnsafeProjection, rowOrdering: Ordering[InternalRow],
      limit: Int): Iterator[InternalRow] =
    new Iterator[InternalRow] {
      private var curKey: UnsafeRow = _
      private val buf = mutable.ArrayBuffer.empty[InternalRow]
      private var pending: Iterator[InternalRow] = Iterator.empty

      private def emit(): Iterator[InternalRow] = {
        val out = buf.sorted(rowOrdering).take(limit).toArray
        buf.clear()
        out.iterator
      }

      private def fill(): Unit = {
        while (!pending.hasNext && iter.hasNext) {
          val row = iter.next()
          val key = keyProj(row)
          if (curKey != null && key != curKey) pending = emit()
          if (curKey == null || key != curKey) curKey = key.copy()
          buf += row.copy()
          if (buf.length >= 2 * limit) {
            val kept = buf.sorted(rowOrdering).take(limit)
            buf.clear()
            buf ++= kept
          }
        }
        if (!pending.hasNext && !iter.hasNext && buf.nonEmpty) pending = emit()
      }

      override def hasNext: Boolean = { fill(); pending.hasNext }
      override def next(): InternalRow = { fill(); pending.next() }
    }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}

/** Post-execution plan introspection shared by Bench and the scale
  * harness: find TopKPerKeyExec nodes (descending through AQE
  * wrappers — the adaptive root re-plans, metrics live on the final
  * physical nodes) and read their partial-phase trim metrics.
  */
object PlanMetrics {
  import org.apache.spark.sql.DataFrame
  import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}

  def collectTopK(p: SparkPlan): Seq[TopKPerKeyExec] = p match {
    case a: AdaptiveSparkPlanExec => collectTopK(a.executedPlan)
    case q: QueryStageExec => collectTopK(q.plan)
    case t: TopKPerKeyExec => t +: t.children.flatMap(collectTopK)
    case other => other.children.flatMap(collectTopK)
  }

  /** (partial_in, partial_out, flushes) summed over the partial-phase
    * TopK execs of an ALREADY EXECUTED DataFrame (its own
    * QueryExecution — execute via `df.collect()`, not `df.count()`,
    * whose agg wrapper plans separate exec instances). The final-phase
    * exec is deliberately excluded: under a result orderBy the range
    * partitioner's sampling pass re-executes its RDD and its counters
    * read 2×.
    */
  def topKPartialStats(df: DataFrame): Option[(Long, Long, Long)] = {
    val partials = collectTopK(df.queryExecution.executedPlan).filter(_.partial)
    if (partials.isEmpty) None
    else Some((
      partials.map(_.metrics("numInputRows").value).sum,
      partials.map(_.metrics("numOutputRows").value).sum,
      partials.map(_.metrics("numFlushes").value).sum))
  }
}

/** Planner strategy: TopKPerKey → final(partial(child)). */
object TopKStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKey(keys, order, k, child) =>
      TopKPerKeyExec(keys, order, k, partial = false,
        TopKPerKeyExec(keys, order, k, partial = true, planLater(child))) :: Nil
    case _ => Nil
  }
}
