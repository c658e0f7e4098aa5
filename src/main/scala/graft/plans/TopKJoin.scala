package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, AttributeSet, GenericInternalRow, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}

/** Whole-operator Catalyst path (SURVEY §4 track (c)): a broadcast top-k
  * similarity join as a first-class plan node.
  *
  * The declarative brute-force top-k ([[graft.llm.Similarity.bruteForceTopK]],
  * mirroring the reference's exact KNN baseline `ml/KNNRunner.scala:282-342`)
  * scores |Q|x|C| rows and ranks them with a window — correct, but the
  * ranking exchange carries one row per (query, corpus) pair. This node
  * keeps the quadratic part out of the plan entirely: the physical
  * operator scans the corpus once per partition, maintains a bounded
  * per-query top-k selection (k best by rounded dot, id tiebreak), and
  * emits at most numPartitions * |Q| * k candidate rows. The only
  * exchange in the whole query is the final rank over that candidate
  * set — at 100 TB the shuffle is O(partitions * |Q| * k), independent
  * of corpus row count.
  *
  * Children contract (enforced by [[NativeTopK]], the public API): both
  * children produce exactly (id: bigint, embedding: array<float>) at
  * ordinals 0/1; the queries side must be collectable (it is bounded by
  * construction — same contract as the broadcast in bruteForceTopK).
  * Dot products accumulate left-to-right in double — the same IEEE
  * sequence as the codegen'd [[graft.functions.DotProduct]] kernel and
  * DuckDB's `LIST_INNER_PRODUCT`, so output is oracle-checkable and
  * bit-equal to the declarative path.
  */
case class TopKJoin(queries: LogicalPlan, corpus: LogicalPlan, k: Int,
    // constructor parameter (not a derived val): plan transforms copy()
    // the node, and regenerating AttributeReferences there would mint
    // fresh expression ids that break parent references
    output: Seq[Attribute] = TopKJoin.newOutput())
    extends BinaryNode {

  require(k > 0, s"top-k join needs k > 0, got $k")

  override def left: LogicalPlan = queries
  override def right: LogicalPlan = corpus

  override def producedAttributes: AttributeSet = outputSet

  // the operator consumes every child column (id + embedding); without
  // this, ColumnPruning sees no references and strips the children to
  // zero-column scans
  override def references: AttributeSet =
    AttributeSet(queries.output ++ corpus.output)

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): TopKJoin =
    copy(queries = newLeft, corpus = newRight)
}

object TopKJoin {
  def newOutput(): Seq[Attribute] = Seq(
    AttributeReference("query_id", LongType, nullable = false)(),
    AttributeReference("neighbor_id", LongType, nullable = false)(),
    AttributeReference("raw_dot", DoubleType, nullable = false)())
}

/** Physical operator for [[TopKJoin]]: collect + broadcast the (small)
  * query side, one narrow pass over corpus partitions with a bounded
  * per-query selection. No shuffle; no |Q|x|C| materialization. */
case class TopKJoinExec(queries: SparkPlan, corpus: SparkPlan, k: Int,
    output: Seq[Attribute]) extends BinaryExecNode {

  override def left: SparkPlan = queries
  override def right: SparkPlan = corpus

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): TopKJoinExec =
    copy(queries = newLeft, corpus = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    require(queries.output.length == 2 && corpus.output.length == 2,
      "TopKJoin children must emit exactly (id, embedding); got " +
        s"${queries.output.map(_.name)} / ${corpus.output.map(_.name)}")
    // query side: driver-collected like any broadcast build side
    val qRows: Array[(Long, Array[Float])] =
      queries.executeCollect().flatMap { r =>
        if (r.isNullAt(0) || r.isNullAt(1)) None
        else Some((r.getLong(0), r.getArray(1).toFloatArray))
      }
    val bq = sparkContext.broadcast(qRows)
    val kLoc = k
    corpus.execute().mapPartitions { iter =>
      val qs = bq.value
      val nq = qs.length
      // per-query k best, slots kept sorted best-first; comparator =
      // (1e-6-rounded dot desc, neighbor id asc) — exactly the final
      // ranking order, so per-partition pruning can never drop a row
      // that the global rank would keep
      val d6s = Array.fill(nq)(new Array[Double](kLoc))
      val raws = Array.fill(nq)(new Array[Double](kLoc))
      val ids = Array.fill(nq)(new Array[Long](kLoc))
      val sizes = new Array[Int](nq)
      while (iter.hasNext) {
        val row = iter.next()
        if (!row.isNullAt(0) && !row.isNullAt(1)) {
          val nid = row.getLong(0)
          val ce = row.getArray(1)
          val cn = ce.numElements()
          var q = 0
          while (q < nq) {
            val qe = qs(q)._2
            // fail loudly on mismatched dimensions: silently truncating
            // the dot product would mask corrupt embeddings at scale
            // (the declarative path nulls such rows out — neither is a
            // result a caller should ever build on)
            if (qe.length != cn) throw new IllegalArgumentException(
              s"graft TopKJoin: embedding dimension mismatch — query " +
                s"${qs(q)._1} has ${qe.length}, corpus ${nid} has $cn")
            val n = cn
            var s = 0.0
            var i = 0
            while (i < n) {
              s += qe(i).toDouble * ce.getFloat(i).toDouble
              i += 1
            }
            val d6 = math.floor(s * 1e6 + 0.5) / 1e6
            val sz = sizes(q)
            val dq = d6s(q); val rq = raws(q); val iq = ids(q)
            // admit if not full, or better than the current worst
            if (sz < kLoc || d6 > dq(sz - 1) ||
                (d6 == dq(sz - 1) && nid < iq(sz - 1))) {
              var p = if (sz < kLoc) sz else kLoc - 1
              while (p > 0 &&
                  (d6 > dq(p - 1) || (d6 == dq(p - 1) && nid < iq(p - 1)))) {
                dq(p) = dq(p - 1); rq(p) = rq(p - 1); iq(p) = iq(p - 1)
                p -= 1
              }
              dq(p) = d6; rq(p) = s; iq(p) = nid
              if (sz < kLoc) sizes(q) = sz + 1
            }
            q += 1
          }
        }
      }
      val proj = UnsafeProjection.create(
        Array[DataType](LongType, LongType, DoubleType))
      val buf = new GenericInternalRow(3)
      (0 until nq).iterator.flatMap { q =>
        (0 until sizes(q)).iterator.map { slot =>
          buf.update(0, qs(q)._1)
          buf.update(1, ids(q)(slot))
          buf.update(2, raws(q)(slot))
          proj(buf)
        }
      }
    }
  }
}

/** Planner strategy mapping the logical [[TopKJoin]] onto
  * [[TopKJoinExec]]. Injected via `SparkSessionExtensions
  * .injectPlannerStrategy` in [[graft.GraftExtensions]]. */
object TopKJoinStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case tk: TopKJoin =>
      TopKJoinExec(planLater(tk.queries), planLater(tk.corpus), tk.k,
        tk.output) :: Nil
    case _ => Nil
  }
}
