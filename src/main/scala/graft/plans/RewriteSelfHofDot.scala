package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType}
import graft.functions.VectorDot

/** Optimizer rule (custom-operator ladder tier (c): `Rule[LogicalPlan]`
  * injected via `SparkSessionExtensions.injectOptimizerRule`): rewrite the
  * higher-order-function dot product a SQL user naturally writes,
  *
  * {{{ aggregate(zip_with(v, v, (x, y) -> x * y), 0.0d, (acc, x) -> acc + x) }}}
  *
  * into the codegen'd [[VectorDot]]. Catalyst HOFs evaluate INTERPRETED
  * per element (measured ~30× slower on 64-dim × 2M-row workloads —
  * README perf-cliff notes); the rewrite moves the loop into whole-stage
  * codegen with identical left-to-right summation, so results are
  * bit-identical.
  *
  * Soundness bound: ONLY fires when both zip_with sides are semantically
  * the SAME expression (the ubiquitous self-dot / norm shape). For two
  * different arrays zip_with pads the shorter side with NULL — making the
  * whole aggregate NULL — while vector_dot dots the common prefix; the
  * self-dot never pads, so the rewrite is exact there and is not applied
  * anywhere else. Null ELEMENTS are also exact: the HOF fold nulls the
  * whole sum on any null element, and [[VectorDot]] returns NULL on a
  * null element in the scanned region (for the self-dot, the whole
  * array), so `containsNull=true` arrays need no extra guard.
  */
object RewriteSelfHofDot extends Rule[LogicalPlan] {

  private def isIdentityLambda(e: Expression): Boolean = e match {
    case LambdaFunction(v: NamedLambdaVariable, Seq(a: NamedLambdaVariable), _) =>
      v.exprId == a.exprId
    case _ => false
  }

  private def isArgProduct(e: Expression): Boolean = e match {
    case LambdaFunction(Multiply(x: NamedLambdaVariable, y: NamedLambdaVariable, _),
        Seq(a: NamedLambdaVariable, b: NamedLambdaVariable), _) =>
      Set(x.exprId, y.exprId) == Set(a.exprId, b.exprId)
    case _ => false
  }

  private def isArgSum(e: Expression): Boolean = e match {
    case LambdaFunction(Add(x: NamedLambdaVariable, y: NamedLambdaVariable, _),
        Seq(a: NamedLambdaVariable, b: NamedLambdaVariable), _) =>
      Set(x.exprId, y.exprId) == Set(a.exprId, b.exprId)
    case _ => false
  }

  private def isDoubleArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case ArrayAggregate(ZipWith(l, r, mul), Literal(0.0, DoubleType), merge, finish)
        if l.semanticEquals(r) && isDoubleArray(l) &&
          isArgProduct(mul) && isArgSum(merge) && isIdentityLambda(finish) =>
      VectorDot(l, r)
  }
}
