package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst dot product over two Array[Float] columns.
  *
  * Spark's higher-order route (`aggregate(zip_with(...))`) is
  * CodegenFallback: per row-pair it allocates an intermediate array
  * and interprets the lambda — measured 78 s for the 2M-pair
  * embedding-dedup at sf0.1. This expression generates a tight
  * primitive loop inside whole-stage codegen (no allocation, no
  * interpretation): the same shape a native engine's SIMD kernel has,
  * expressed the Spark-first way.
  *
  * Summation is a sequential left fold in both eval and codegen, so
  * results are bit-identical to the HOF formulation and the DuckDB
  * oracle's list functions.
  */
case class FloatVecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"FloatVecDot needs two array<float> inputs, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  /** NULL semantics match the HOF formulation EXACTLY (r11 advice;
    * see LongVecDot): NULL on length mismatch or any null element, so
    * the session-wide rewrite is result-preserving on every input.
    */
  override def nullable: Boolean = true

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
    var s = 0.0
    var i = 0
    while (i < n) {
      if (mayHaveNullElems && (x.isNullAt(i) || y.isNullAt(i))) return null
      s += x.getFloat(i).toDouble * y.getFloat(i).toDouble
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
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $elemCheck
         |    $s += ((double) $a.getFloat($i)) * ((double) $b.getFloat($i));
         |  }
         |  ${ev.value} = $s;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatVecDot =
    copy(left = newLeft, right = newRight)
}
