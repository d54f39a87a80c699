package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst dot product over two Array[Long] columns — the
  * BIGINT twin of [[FloatVecDot]].
  *
  * s15/s16 rank candidates in the milli-quantized integer score space
  * (per-component floor(x·1000) BIGINT): the dot and squared norm are
  * exact integer sums, so ranks can never straddle a float ulp. Until
  * round 11 those sums ran through the higher-order
  * `aggregate(zip_with(...), 0L, ...)` route, which is
  * CodegenFallback — per candidate pair it allocates an intermediate
  * array and interprets both lambdas (the same ~80× overhead round 1
  * measured for the float path). This expression generates the tight
  * primitive loop inside whole-stage codegen instead.
  *
  * Long overflow wraps in Java arithmetic exactly as Spark's
  * non-ANSI Multiply/Add over BIGINT does, and summation is the same
  * sequential left fold, so the rewrite is result-identical bit for
  * bit (milli-quantized 64-dim unit vectors peak at |x|≈10³ per
  * component — ~2×10⁶ per term, 54 magnitude bits of headroom).
  *
  * Self-application LongVecDot(a, a) is the squared norm.
  */
case class LongVecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"LongVecDot needs two array<bigint> inputs, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  /** NULL semantics match the HOF formulation EXACTLY (r11 advice):
    * `aggregate(zip_with(a, b, (x,y) -> x*y), 0L, ...)` null-pads
    * ragged arrays and propagates null elements, so one null product
    * nulls the whole fold — this kernel therefore returns NULL on a
    * length mismatch or any null element, making the session-wide
    * optimizer rewrite result-preserving on EVERY input, not just the
    * fixed-width non-null vectors in-repo callers pass. The result
    * can thus be null even for non-null inputs ⇒ nullable is
    * unconditionally true.
    */
  override def nullable: Boolean = true

  /** Element null-checks are emitted only when a child's type admits
    * null elements — the fixed-vector hot path pays one extra int
    * compare per row, nothing per element.
    */
  @transient private lazy val mayHaveNullElems: Boolean =
    Seq(left, right).exists(_.dataType match {
      case ArrayType(_, n) => n
      case _ => true
    })

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var s = 0L
    var i = 0
    while (i < n) {
      if (mayHaveNullElems && (x.isNullAt(i) || y.isNullAt(i))) return null
      s += x.getLong(i) * y.getLong(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val elemCheck =
        if (mayHaveNullElems)
          s"if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }"
        else ""
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $s = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $elemCheck
         |    $s += $a.getLong($i) * $b.getLong($i);
         |  }
         |  ${ev.value} = $s;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LongVecDot =
    copy(left = newLeft, right = newRight)
}
