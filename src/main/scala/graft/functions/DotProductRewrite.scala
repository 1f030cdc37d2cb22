package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/** Optimizer rule: rewrite the idiomatic higher-order-function dot product
  *
  *   aggregate(zip_with(a, b, (x, y) -> x * y), 0.0d, (acc, x) -> acc + x)
  *
  * into the native codegen'd [[DotProduct]] (same fold order and null
  * semantics, ~3× faster — see bench notes in the DotProduct scaladoc).
  * Users writing the portable HOF form get the fast kernel transparently;
  * injected by [[graft.GraftExtensions]] via `injectOptimizerRule`.
  */
object DotProductRewrite extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case agg @ ArrayAggregate(
            zip @ ZipWith(left, right, LambdaFunction(mul: Multiply, _, _)),
            zero: Literal, LambdaFunction(add: Add, _, _), _)
          if isDoubleArray(left) && isDoubleArray(right) &&
            zero.value == 0.0 && zero.dataType == DoubleType &&
            isElementwise(mul, zip) && isElementwise(add, agg) =>
        DotProduct(left, right)
    }

  private def isDoubleArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  /** The lambda body must be exactly `arg0 op arg1` over the lambda's own
    * variables (no captures, no extra math). */
  private def isElementwise(op: BinaryOperator, owner: HigherOrderFunction): Boolean =
    (op.left, op.right) match {
      case (l: NamedLambdaVariable, r: NamedLambdaVariable) => l.name != r.name
      case _ => false
    }
}
