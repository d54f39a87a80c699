package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.Alias
import org.apache.spark.sql.catalyst.plans.logical.{Project, Sort}
import org.apache.spark.sql.graftbridge.DatasetBridge

/** Public API for the bounded top-k-per-key operator. Requires
  * TopKStrategy in the session (GraftExtensions / install()).
  *
  * `TopK.perKey(df, Seq(col("k")), Seq(col("v").desc), 5)` keeps, for
  * every distinct key, the 5 rows ranking first by the given order —
  * with at most 5 rows per key per input partition ever reaching the
  * shuffle (vs. the full-data sort a row_number window pays).
  *
  * Implementation note: raw `Column`s carry lazy ColumnNode wrappers
  * that neither resolve inside a custom node nor serialize into task
  * closures — so the keys/order are resolved by probing with ordinary
  * Sort/Project plans and harvesting the analyzer's output.
  */
object TopK {

  def perKey(df: DataFrame, keys: Seq[Column], order: Seq[Column],
      k: Int): DataFrame = {
    val (sortExprs, child) =
      df.sortWithinPartitions(order: _*).queryExecution.analyzed match {
        case s: Sort => (s.order, s.child)
        case other => throw new IllegalStateException(
          s"probe plan was not a Sort: $other")
      }
    val keyExprs = df.select(keys: _*).queryExecution.analyzed match {
      case p: Project => p.projectList.map {
        case a: Alias => a.child
        case e => e
      }
      case other => throw new IllegalStateException(
        s"probe plan was not a Project: $other")
    }
    DatasetBridge.ofRows(df.sparkSession,
      TopKPerKey(keyExprs, sortExprs, k, child))
  }
}
