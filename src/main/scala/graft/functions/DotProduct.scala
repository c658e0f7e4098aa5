package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Codegen'd dot product between two float-array columns — the
  * similarity-search hot path (SURVEY §4 native-`Expression` track,
  * sibling of [[EuclideanDistance]]). The interpreted HOF formulation
  * (`zip_with` + `aggregate`) allocates an intermediate array per row;
  * the generated loop reads the unsafe array data directly.
  *
  * Semantics match the HOF path and DuckDB's `list_inner_product` on
  * double lists exactly: products accumulated left-to-right in double —
  * same IEEE op sequence, so oracle hashes are unchanged whichever
  * implementation a session resolves. A null ELEMENT null-propagates
  * like the HOF chain (zip_with multiply → aggregate add), so the
  * [[graft.plans.DotProductRewrite]] substitution is exact for vectors
  * whose type admits null elements too — the per-element null check is
  * only generated when `containsNull` says it can occur, so the
  * non-null embedding hot path keeps the branch-free loop.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  // lazy val, not def: this is read per ROW on the interpreted path
  // (and per element if referenced in a loop) — a dataType pattern
  // match there costs more than the dot product itself
  private lazy val elementsNullable: Boolean =
    Seq(left, right).exists(_.dataType match {
      case ArrayType(_, n) => n
      case _ => false
    })

  override def nullable: Boolean =
    left.nullable || right.nullable || elementsNullable

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<float> arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "graft_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    val checkNulls = elementsNullable
    var s = 0.0
    var i = 0
    while (i < n) {
      if (checkNulls && (x.isNullAt(i) || y.isNullAt(i))) return null
      s += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      // `${ev.isNull} = true` is only legal when nullable is true, which
      // elementsNullable guarantees whenever this check is generated
      val nullCheck =
        if (elementsNullable)
          s"""if ($a.isNullAt($i) || $b.isNullAt($i)) {
             |  ${ev.isNull} = true; break;
             |}""".stripMargin
        else ""
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $nullCheck
         |  $s += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}
