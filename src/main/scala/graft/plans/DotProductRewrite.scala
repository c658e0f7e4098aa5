package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

import graft.functions.{DotProduct, EuclideanDistance}

/** Optimizer rule (SURVEY §2 custom-operator path (c), the
  * `Rule[LogicalPlan]` leg): rewrites the portable higher-order-function
  * distance patterns into the codegen'd kernels whenever both arrays are
  * `array<float>` attributes.
  *
  * Dot product:
  * {{{ aggregate(zip_with(a, b, (x, y) -> double(x) * double(y)),
  *               0.0, (acc, v) -> acc + v) }}}
  * becomes [[graft.functions.DotProduct]]; euclidean distance:
  * {{{ sqrt(aggregate(zip_with(a, b,
  *       (x, y) -> (double(x) - double(y)) * (double(x) - double(y))),
  *       0.0, (acc, v) -> acc + v)) }}}
  * becomes [[graft.functions.EuclideanDistance]]. `ArrayAggregate` and
  * `ZipWith` are `CodegenFallback` (interpreted, with a per-element
  * materialized intermediate array), so every float distance written in
  * the portable HOF form — the library's own fallback paths
  * ([[graft.llm.Similarity.dot]]/`cosine`/`norm` and the IVF/PQ euclid
  * fallbacks compose them) and any user-written copy of the pattern —
  * silently becomes the native kernel in extended sessions, without
  * callers probing for `graft_dot`/`graft_euclid`.
  *
  * Equivalence: both kernels accumulate float→double terms
  * left-to-right — the identical IEEE sequence to the HOF chain
  * (ExtensionsSpec asserts bit-equality), so plans, oracles, and hashes
  * are unchanged. Two guards keep the substitution exact: (1) operands
  * must be plain attributes, so wrapping them in the length check below
  * duplicates only a column read, never a computation; (2) the rewrite
  * emits `if (size(a) = size(b)) kernel(a, b) else null` — zip_with
  * null-pads the shorter array and the multiply/subtract
  * null-propagates, so the HOF yields null on a length mismatch where
  * the raw kernel would compute over the truncated prefix (and a null
  * array makes the size comparison null, taking the null branch like
  * both forms). A null ELEMENT inside equal-length vectors
  * null-propagates in the kernels too (the per-element check is only
  * generated when the array type's `containsNull` admits it), so the
  * substitution holds for arbitrary user data, not just the library's
  * no-null embedding contract.
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

  /** `(double(x) - double(y)) * (double(x) - double(y))` — the squared
    * difference the Column DSL builds (the subtraction appears twice;
    * there is no CSE at this level, so both factors are structural
    * copies referencing the same lambda variables). */
  private def isSquaredDiff(e: Expression, x: NamedExpression,
      y: NamedExpression): Boolean = e match {
    case Multiply(Subtract(ax, ay, _), Subtract(bx, by, _), _) =>
      isDoubleOf(ax, x) && isDoubleOf(ay, y) &&
        isDoubleOf(bx, x) && isDoubleOf(by, y)
    case _ => false
  }

  private def sizesMatch(a: Expression, b: Expression,
      kernel: Expression): Expression =
    If(EqualTo(Size(a, legacySizeOfNull = false),
        Size(b, legacySizeOfNull = false)),
      kernel,
      Literal(null, DoubleType))

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
        sizesMatch(a, b, DotProduct(a, b))
      case Sqrt(ArrayAggregate(
            ZipWith(a, b, LambdaFunction(body, Seq(x, y), _)),
            zero,
            LambdaFunction(Add(al, ar, _), Seq(acc, v), _),
            LambdaFunction(fin, Seq(fa), _)))
          if isFloatArrayAttr(a) && isFloatArrayAttr(b) &&
            zero == Literal(0.0) && isSquaredDiff(body, x, y) &&
            isVar(al, acc) && isVar(ar, v) && isVar(fin, fa) =>
        sizesMatch(a, b, EuclideanDistance(a, b))
    }
}
