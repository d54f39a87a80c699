package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst merge-intersection COUNT over two SORTED
  * Array[Long] columns — the verification kernel of the PPJoin prefix
  * filter (d04/d14, r12): each candidate pair's capped-shingle
  * intersection size is |A ∩ B| over the docs' sorted shingle-hash
  * arrays. `array_intersect` computes the same set but builds a hash
  * set PER PAIR (allocation + string/long hashing per element — the
  * r12 bench showed it dominating d04/d14 after the prefix filter cut
  * the join); this expression is the classic two-pointer merge, ~|A|+
  * |B| primitive comparisons inside whole-stage codegen, no
  * allocation — the FloatVecDot story applied to set intersection.
  *
  * CONTRACT: both inputs ascending-sorted (the producer uses
  * sort_array). Duplicate values are counted at min multiplicity
  * (sorted-multiset semantics); the shingle producers are DISTINCT
  * per doc, so inputs are strictly increasing in practice. Null
  * inputs → null (BinaryExpression); null ELEMENTS are not expected
  * from the producers (sort_array over non-null collect_list) and are
  * rejected at type-check when the child type admits them — keeping
  * the kernel loop branch-free.
  */
case class SortedLongIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, false), ArrayType(LongType, false)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"SortedLongIntersectCount needs two array<bigint not null> " +
          s"inputs, got ${left.dataType.catalogString} and " +
          s"${right.dataType.catalogString}")
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val (nx, ny) = (x.numElements(), y.numElements())
    var (i, j) = (0, 0)
    var c = 0L
    while (i < nx && j < ny) {
      val (u, v) = (x.getLong(i), y.getLong(j))
      if (u == v) { c += 1; i += 1; j += 1 }
      else if (u < v) i += 1
      else j += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val u = ctx.freshName("u")
      val v = ctx.freshName("v")
      s"""
         |int $nx = $a.numElements();
         |int $ny = $b.numElements();
         |int $i = 0; int $j = 0; long $c = 0L;
         |while ($i < $nx && $j < $ny) {
         |  long $u = $a.getLong($i);
         |  long $v = $b.getLong($j);
         |  if ($u == $v) { $c++; $i++; $j++; }
         |  else if ($u < $v) { $i++; } else { $j++; }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedLongIntersectCount =
    copy(left = newLeft, right = newRight)
}
