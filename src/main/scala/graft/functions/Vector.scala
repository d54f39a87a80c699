package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Dense-vector math over Array[Float] columns — the dot product is a
  * native Catalyst expression (FloatVecDot, with doGenCode) so the
  * hot loop runs inside whole-stage codegen; no UDF, no driver-side
  * loops, no per-pair array allocation.
  */
object Vector {

  /** Dot product of two float-array columns (computed in double,
    * sequential fold — bit-identical to the HOF formulation).
    */
  def dot(a: Column, b: Column): Column =
    ColumnBridge.column(FloatVecDot(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** HOF formulation kept as the portability/readability reference —
    * used by tests to cross-check FloatVecDot bit-for-bit.
    */
  def dotHof(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  /** L2 norm. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Merge-intersection count of two SORTED long-array columns
    * (SortedLongIntersectCount — codegen two-pointer merge; the
    * PPJoin verification kernel).
    */
  def sortedIntersectCount(a: Column, b: Column): Column =
    ColumnBridge.column(SortedLongIntersectCount(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Cosine similarity (null-safe via NaN on zero vectors). */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  /** Sign-of-coordinate LSH bucket from `dims` (1-based indices):
    * bit i set iff element_at(v, dims(i)) >= 0. Cheap deterministic
    * hyperplane-free bucketing used by the scale-path ANN — exactly
    * replicable in SQL oracles.
    */
  def signBucket(v: Column, dims: Seq[Int]): Column =
    dims.zipWithIndex.map { case (d, i) =>
      when(element_at(v, d) >= 0, lit(1 << i)).otherwise(lit(0))
    }.reduce(_ + _)
}
