package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native distinct-shingle kernel: `graft_shingles(text, n) ->
  * array<string>` — the per-document tokenize → n-gram → distinct step
  * that feeds the whole dedup family (MinHash signatures, Jaccard
  * verification, contamination probes).
  *
  * Bit-identical to the declarative form in `Dedup.shingles`
  * (`array_distinct(transform(sequence(...), concat_ws(...)))` over
  * `split(text, " ")`): same Pattern.split with limit -1 (empty string →
  * one empty token, runs of spaces preserved as empty tokens), same
  * single-space joining, same first-occurrence distinct order, same
  * shorter-than-n fallback to the distinct tokens. The declarative form
  * evaluates through interpreted higher-order lambdas (CodegenFallback
  * per ELEMENT); this expression is one compiled JVM method per row —
  * the shingling pass over the sf0.1 corpus drops from ~6.9 s to
  * sub-second, and it is the dominant cost of every MinHash-family
  * query. Eval-only (CodegenFallback at the ROW level): the per-row
  * boxing is negligible next to the per-element lambda dispatch it
  * replaces.
  */
case class ShingleSet(text: Expression, n: Expression)
    extends BinaryExpression with CodegenFallback {

  override def left: Expression = text
  override def right: Expression = n

  override def checkInputDataTypes(): TypeCheckResult =
    if (text.dataType == StringType && n.dataType == IntegerType && n.foldable)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (string, foldable int), got " +
        s"${text.dataType.simpleString} and ${n.dataType.simpleString}")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "graft_shingles"

  override protected def nullSafeEval(t: Any, nv: Any): Any = {
    val s = t.asInstanceOf[UTF8String].toString
    val k = nv.asInstanceOf[Int]
    // identical to Spark's split(text, " "): regex split, limit -1
    val toks = s.split(" ", -1)
    val out = new java.util.LinkedHashSet[String]
    if (toks.length < k) {
      var i = 0
      while (i < toks.length) { out.add(toks(i)); i += 1 }
    } else {
      val sb = new java.lang.StringBuilder
      var i = 0
      while (i <= toks.length - k) {
        sb.setLength(0)
        var j = 0
        while (j < k) {
          if (j > 0) sb.append(' ')
          sb.append(toks(i + j))
          j += 1
        }
        out.add(sb.toString)
        i += 1
      }
    }
    val arr = new Array[Any](out.size)
    val it = out.iterator()
    var i = 0
    while (it.hasNext) { arr(i) = UTF8String.fromString(it.next()); i += 1 }
    new GenericArrayData(arr)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ShingleSet =
    copy(text = newLeft, n = newRight)
}
