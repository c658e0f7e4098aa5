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
  * are unchanged. Two guards keep the substitution exact: (1) operands
  * must be plain attributes, so wrapping them in the length check below
  * duplicates only a column read, never a computation; (2) the rewrite
  * emits `if (size(a) = size(b)) graft_dot(a, b) else null` — zip_with
  * null-pads the shorter array and the multiply null-propagates, so the
  * HOF yields null on a length mismatch where the raw kernel would
  * return a truncated dot (and a null array makes the size comparison
  * null, taking the null branch like both forms). The one remaining
  * divergence — a null ELEMENT inside equal-length vectors
  * null-propagates in the HOF but reads as 0 in the kernel — matches
  * the library's explicit `graft_dot` call sites and the embedding
  * data contract; no shipped table or operator produces such a vector.
  */
object DotProductRewrite extends Rule[LogicalPlan] {

  private def isFloatArrayAttr(e: Expression): Boolean = e match {
    case a: Attribute => a.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
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
          if isFloatArrayAttr(a) && isFloatArrayAttr(b) &&
            zero == Literal(0.0) &&
            isDoubleOf(mx, x) && isDoubleOf(my, y) &&
            isVar(al, acc) && isVar(ar, v) && isVar(fin, fa) =>
        If(EqualTo(Size(a, legacySizeOfNull = false),
            Size(b, legacySizeOfNull = false)),
          DotProduct(a, b),
          Literal(null, DoubleType))
    }
}
