package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.GraftSqlBridge
import org.scalatest.funsuite.AnyFunSuite

import graft.llm.Similarity
import graft.plans.{NativeTopK, TopKJoin}
import graft.sources.Tables

/** The whole-operator Catalyst path (logical TopKJoin -> planner
  * strategy -> TopKJoinExec): row-identical to the declarative
  * brute-force top-k, planned through the custom physical operator, and
  * shuffle-free below it. */
class TopKJoinSpec extends AnyFunSuite {
  import TestSpark._

  private lazy val e = Tables(spark, sf0001, "embeddings")
  private lazy val q = e.filter(col("vec_id") < 10)

  test("native top-k is row-identical to the declarative brute force") {
    val native = NativeTopK.topK(q, e, k = 5).collect().toSeq
    val brute = Similarity.bruteForceTopK(q, e, k = 5).collect().toSeq
    assert(native == brute)
  }

  test("the plan contains TopKJoinExec with no exchange below it") {
    val df = NativeTopK.topK(q, e, k = 5)
    df.collect()
    // AQE's toString appends an "== Initial Plan ==" section (pre-AQE,
    // with its planned exchanges) after the final plan — scope to final
    val lines = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head.linesIterator.toSeq
    val at = lines.indexWhere(_.contains("TopKJoin"))
    assert(at >= 0, lines.mkString("\n").take(3000))
    // children of the exec print below it: corpus/query scans only,
    // never an Exchange — the quadratic scoring stays narrow
    assert(!lines.drop(at + 1).exists(_.contains("Exchange")),
      lines.mkString("\n").take(3000))
  }

  test("candidate volume is bounded by partitions * |Q| * k") {
    val qp = GraftSqlBridge.analyzed(q.select(
      col("vec_id").cast("long"), col("embedding").cast("array<float>")))
    val cp = GraftSqlBridge.analyzed(e.select(
      col("vec_id").cast("long"), col("embedding").cast("array<float>")))
    val cand = GraftSqlBridge.ofRows(spark, TopKJoin(qp, cp, 5))
    val parts = cand.rdd.getNumPartitions
    val nq = q.count()
    assert(cand.count() <= parts.toLong * nq * 5)
  }

  test("empty query side yields an empty result, not a failure") {
    val none = NativeTopK.topK(
      e.filter(col("vec_id") < 0), e, k = 5).count()
    assert(none == 0)
  }

  test("mismatched embedding dimensions fail loudly, not truncate") {
    import spark.implicits._
    val qBad = Seq((1L, Array(1.0f, 2.0f, 3.0f))).toDF("vec_id", "embedding")
    val cBad = Seq((10L, Array(1.0f, 2.0f))).toDF("vec_id", "embedding")
    val ex = intercept[org.apache.spark.SparkException] {
      NativeTopK.topK(qBad, cBad, k = 1).collect()
    }
    val msgs = Iterator.iterate[Throwable](ex)(_.getCause)
      .takeWhile(_ != null).map(_.getMessage).mkString("; ")
    assert(msgs.contains("dimension mismatch"), msgs)
  }

  test("rounded-dot ties resolve to the smaller neighbor id") {
    import spark.implicits._
    // corpus of identical vectors: every dot ties, so top-3 must be the
    // three smallest ids — the brute-force tiebreak contract
    val vec = Array.fill(4)(1.0f)
    val corpus = (0L until 8L).map(i => (i, vec)).toDF("vec_id", "embedding")
    val queries = Seq((100L, vec)).toDF("vec_id", "embedding")
    val got = NativeTopK.topK(queries, corpus, k = 3)
      .select("neighbor_id").as[Long].collect().toSeq
    assert(got == Seq(0L, 1L, 2L))
  }
}
