package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Threshold-banded Levenshtein kernel: computes edit distance only
  * within a diagonal band of width 2k+1 and abandons a row pair the
  * moment every band cell exceeds k.
  *
  * Spark's built-in `levenshtein` fills the full O(n·m) DP matrix per
  * pair; an entity-resolution filter like d06 only ever asks
  * "distance ≤ k?" with small k, for which the banded DP does
  * O(min(n,m)·k) work and usually exits after a few rows. Same
  * static-helper-call shape inside whole-stage codegen that Spark's
  * own string expressions use — no interpreter fallback.
  */
object Lev {
  /** Exact distance if ≤ k, else -1. Operates on Unicode CODE POINTS
    * (not UTF-16 chars), the same unit Spark's built-in `levenshtein`
    * and DuckDB's measure in — supplementary (non-BMP) characters
    * count as one edit, not two.
    */
  def atMost(a: UTF8String, b: UTF8String, k: Int): Int = {
    val s = a.toString.codePoints().toArray
    val t = b.toString.codePoints().toArray
    val n = s.length
    val m = t.length
    if (math.abs(n - m) > k) return -1
    if (n == 0) return if (m <= k) m else -1
    if (m == 0) return if (n <= k) n else -1
    // one DP row, banded to [j-k, j+k]
    val width = m + 1
    val INF = k + 1
    val prev = new Array[Int](width)
    val cur = new Array[Int](width)
    var j = 0
    while (j < width) { prev(j) = if (j <= k) j else INF; j += 1 }
    var i = 1
    while (i <= n) {
      val lo = math.max(1, i - k)
      val hi = math.min(m, i + k)
      cur(lo - 1) = INF
      if (lo == 1) cur(0) = if (i <= k) i else INF
      var best = if (lo == 1) cur(0) else INF
      j = lo
      val ci = s(i - 1)
      while (j <= hi) {
        val cost = if (ci == t(j - 1)) 0 else 1
        var v = prev(j - 1) + cost
        val del = prev(j) + 1
        if (del < v) v = del
        val ins = cur(j - 1) + 1
        if (ins < v) v = ins
        cur(j) = if (v > INF) INF else v
        if (v < best) best = v
        j += 1
      }
      if (hi < m) cur(hi + 1) = INF
      if (best > k) return -1 // whole band exceeded k: early exit
      System.arraycopy(cur, 0, prev, 0, width)
      i += 1
    }
    if (prev(m) <= k) prev(m) else -1
  }
}

/** `LevenshteinAtMost(a, b, k)`: edit distance when ≤ k, else -1. */
case class LevenshteinAtMost(left: Expression, right: Expression, k: Int)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) if k >= 0 => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"LevenshteinAtMost needs two string inputs and k >= 0")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    Lev.atMost(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.Lev.atMost($a, $b, $k);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LevenshteinAtMost =
    copy(left = newLeft, right = newRight)
}
