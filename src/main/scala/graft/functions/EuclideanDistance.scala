package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Codegen'd euclidean distance between two numeric-array columns
  * (array<float> or array<double> per side, independently —
  * array<double> sides are the TRAINED-quantizer centroids, whose
  * iteration means are doubles)
  * (SURVEY §4: the optional native `Expression` upgrade over the Scala
  * UDF — no row-to-Scala conversion, no boxing; the generated code loops
  * directly over the unsafe array data).
  *
  * Semantics match the UDF and DuckDB's `list_distance` exactly:
  * difference-based squared terms accumulated left-to-right in double,
  * then sqrt — the same IEEE op sequence, so oracle hashes are unchanged
  * whichever implementation a session resolves. A null ELEMENT
  * null-propagates like the portable HOF chain (zip_with subtract →
  * aggregate add), keeping the [[graft.plans.DotProductRewrite]]
  * euclid substitution exact; the per-element check is only generated
  * when the array type's `containsNull` says it can occur.
  */
case class EuclideanDistance(left: Expression, right: Expression)
    extends BinaryExpression {

  // lazy val, not def: read per ROW on the interpreted path — a
  // dataType pattern match there costs more than the distance itself
  private lazy val elementsNullable: Boolean =
    Seq(left, right).exists(_.dataType match {
      case ArrayType(_, n) => n
      case _ => false
    })

  override def nullable: Boolean =
    left.nullable || right.nullable || elementsNullable

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<float|double> arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  // element accessors resolved once per side: a double side reads
  // getDouble directly (the HOF's cast("double") is a no-op there), a
  // float side reads getFloat then widens - the identical IEEE sequence
  // to the portable zip_with/aggregate chain either way
  private lazy val leftIsDouble: Boolean = left.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }
  private lazy val rightIsDouble: Boolean = right.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "graft_euclid"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    val checkNulls = elementsNullable
    var s = 0.0
    var i = 0
    while (i < n) {
      if (checkNulls && (x.isNullAt(i) || y.isNullAt(i))) return null
      val xv = if (leftIsDouble) x.getDouble(i) else x.getFloat(i).toDouble
      val yv = if (rightIsDouble) y.getDouble(i) else y.getFloat(i).toDouble
      val d = xv - yv
      s += d * d
      i += 1
    }
    math.sqrt(s)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val d = ctx.freshName("d")
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
         |  double $d = ${if (leftIsDouble) s"$a.getDouble($i)" else s"(double) $a.getFloat($i)"}
         |      - ${if (rightIsDouble) s"$b.getDouble($i)" else s"(double) $b.getFloat($i)"};
         |  $s += $d * $d;
         |}
         |${ev.value} = java.lang.Math.sqrt($s);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): EuclideanDistance =
    copy(left = newLeft, right = newRight)
}
