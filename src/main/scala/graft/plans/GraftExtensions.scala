package graft.plans

import graft.functions.FloatVecDot
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

/** Catalyst optimizer rule: rewrite the declarative higher-order
  * dot-product pattern
  *
  *   aggregate(zip_with(a, b, (x, y) -> x * y), 0.0, (acc, v) -> acc + v)
  *
  * into the native codegen'd FloatVecDot. Users write the portable
  * HOF formulation (or call it through SQL); the optimizer injects
  * the ~80× faster kernel. Summation order is identical (sequential
  * fold), so the rewrite is result-preserving bit-for-bit.
  */
object RewriteHofDotProduct extends Rule[LogicalPlan] {

  private def isFloatArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  /** Strip an optional to-double cast and return the lambda var. */
  private def asVar(e: Expression): Option[NamedLambdaVariable] = e match {
    case v: NamedLambdaVariable => Some(v)
    case Cast(v: NamedLambdaVariable, DoubleType, _, _) => Some(v)
    case _ => None
  }

  /** body is `x * y` (optionally cast) over exactly the lambda args. */
  private def isPairwiseMul(f: LambdaFunction): Boolean = f match {
    case LambdaFunction(Multiply(l, r, _), Seq(x: NamedLambdaVariable,
        y: NamedLambdaVariable), _) =>
      (asVar(l), asVar(r)) match {
        case (Some(a), Some(b)) =>
          Set(a.exprId, b.exprId) == Set(x.exprId, y.exprId)
        case _ => false
      }
    case _ => false
  }

  /** body is `acc + v` over exactly the lambda args. */
  private def isSum(f: LambdaFunction): Boolean = f match {
    case LambdaFunction(Add(l: NamedLambdaVariable, r: NamedLambdaVariable, _),
        Seq(acc: NamedLambdaVariable, v: NamedLambdaVariable), _) =>
      Set(l.exprId, r.exprId) == Set(acc.exprId, v.exprId)
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(
          ZipWith(a, b, mul: LambdaFunction),
          Literal(0.0, DoubleType),
          add: LambdaFunction,
          LambdaFunction(_: NamedLambdaVariable, _, _))
          if isPairwiseMul(mul) && isSum(add) &&
            isFloatArray(a) && isFloatArray(b) =>
        FloatVecDot(a, b)
    }
}

/** SparkSessionExtensions entry point: registers the optimizer rule
  * and a `graft_dot(a, b)` SQL function. Activate with
  * `.withExtensions(GraftExtensions)` or
  * `spark.sql.extensions=graft.plans.GraftSqlExtensions`.
  */
object GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => RewriteHofDotProduct)
    ext.injectPlannerStrategy(_ => TopKStrategy)
    ext.injectFunction((
      new FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[FloatVecDot].getName, "graft_dot"),
      (children: Seq[Expression]) => FloatVecDot(children(0), children(1))))
  }

  /** Install into an already-running session (no restart needed):
    * the rule joins the user-provided optimizer batch and graft_dot
    * lands in the session's function registry.
    */
  def install(spark: org.apache.spark.sql.SparkSession): Unit = {
    if (!spark.experimental.extraOptimizations.contains(RewriteHofDotProduct))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ RewriteHofDotProduct
    if (!spark.experimental.extraStrategies.contains(TopKStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKStrategy
    spark.sessionState.functionRegistry.registerFunction(
      new FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[FloatVecDot].getName, "graft_dot"),
      (children: Seq[Expression]) => FloatVecDot(children(0), children(1)))
  }
}

/** Zero-arg class form for the spark.sql.extensions config. */
class GraftSqlExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = GraftExtensions(ext)
}
