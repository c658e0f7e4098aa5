package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

import graft.functions.DotProduct

/** Optimizer rule (SURVEY §2 custom-operator path (c), the
  * `Rule[LogicalPlan]` leg): rewrites the portable higher-order-function
  * dot-product pattern
  *
  * {{{ aggregate(zip_with(a, b, (x, y) -> double(x) * double(y)),
  *               0.0, (acc, v) -> acc + v) }}}
  *
  * into the codegen'd [[graft.functions.DotProduct]] kernel whenever both
  * arrays are `array<float>`. `ArrayAggregate` and `ZipWith` are
  * `CodegenFallback` (interpreted, with a per-element materialized
  * intermediate array), so every float dot product written in the
  * portable HOF form — the library's own fallback paths
  * ([[graft.llm.Similarity.dot]]/`cosine`/`norm` compose it) and any
  * user-written copy of the pattern — silently becomes the native kernel
  * in extended sessions, without callers probing for `graft_dot`.
  *
  * Equivalence: [[DotProduct]] accumulates float→double products
  * left-to-right — the identical IEEE sequence to the HOF chain
  * (ExtensionsSpec asserts bit-equality), so plans, oracles, and hashes
  * are unchanged. Like the library's explicit `graft_dot` call sites,
  * the rewrite assumes the embedding contract "no null ELEMENTS inside a
  * vector" (a null vector still yields null); the HOF form would
  * null-propagate a null element where the kernel reads it as 0 — no
  * shipped table or operator produces such a vector.
  */
object DotProductRewrite extends Rule[LogicalPlan] {

  private def isFloatArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  /** The lambda body reads exactly this variable, cast to double. */
  private def isDoubleOf(e: Expression, v: NamedExpression): Boolean = e match {
    case Cast(nlv: NamedLambdaVariable, DoubleType, _, _) =>
      nlv.exprId == v.exprId
    case _ => false
  }

  private def isVar(e: Expression, v: NamedExpression): Boolean = e match {
    case nlv: NamedLambdaVariable => nlv.exprId == v.exprId
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(
            ZipWith(a, b, LambdaFunction(Multiply(mx, my, _), Seq(x, y), _)),
            zero,
            LambdaFunction(Add(al, ar, _), Seq(acc, v), _),
            LambdaFunction(fin, Seq(fa), _))
          if isFloatArray(a) && isFloatArray(b) &&
            zero == Literal(0.0) &&
            isDoubleOf(mx, x) && isDoubleOf(my, y) &&
            isVar(al, acc) && isVar(ar, v) && isVar(fin, fa) =>
        DotProduct(a, b)
    }
}
