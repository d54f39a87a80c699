package graft.plans

import scala.collection.mutable
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}

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

/** Physical per-key bounded top-k. `partial = true` runs on whatever
  * partitioning the child has (map-side pre-trim); `partial = false`
  * requires clustering on the keys, which gives the exact answer.
  */
case class TopKPerKeyExec(keys: Seq[Expression], order: Seq[SortOrder],
    k: Int, partial: Boolean, child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(keys) :: Nil

  override def outputPartitioning: Partitioning = child.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val keyExprs = keys
    val sortOrder = order
    val limit = k
    child.execute().mapPartitions { iter =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      val rowOrdering = GenerateOrdering.generate(sortOrder, childOutput)
      // per key: sorted-on-demand buffer, trimmed at 2k to amortize
      val buffers = mutable.HashMap.empty[UnsafeRow, mutable.ArrayBuffer[InternalRow]]
      iter.foreach { row =>
        val key = keyProj(row)
        val buf = buffers.get(key) match {
          case Some(b) => b
          case None =>
            val b = mutable.ArrayBuffer.empty[InternalRow]
            buffers.put(key.copy(), b)
            b
        }
        buf += row.copy()
        if (buf.length >= 2 * limit) {
          val kept = buf.sorted(rowOrdering.asInstanceOf[Ordering[InternalRow]])
            .take(limit)
          buf.clear()
          buf ++= kept
        }
      }
      buffers.valuesIterator.flatMap { buf =>
        buf.sorted(rowOrdering.asInstanceOf[Ordering[InternalRow]]).take(limit)
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
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
