package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.llm.Similarity
import graft.ml.TextModels
import graft.ml.knn.Knn
import graft.sources.Readers

/** Last round-1 coverage gaps: KNN regression, cosine similarity, and the
  * IBM-sequence reader feeding PrefixSpan end-to-end. */
class FinalGapSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("knn regression predicts the local mean of a planted gradient") {
    // label = x coordinate; neighbors of a point share nearby x values
    val pts = (1 to 60).map(i =>
      (i.toLong, Array(i.toFloat, 0.0f), i.toDouble)).toDF("vec_id", "embedding", "label")
    val model = Knn.fit(spark, pts)
    val preds = model.regress(pts.filter($"vec_id" === 30), k = 2, tau = 1e9,
      labels = pts).collect()
    assert(preds.length == 1)
    // nearest two neighbors of x=30 (excluding self) are 29 and 31 → mean 30
    assert(preds(0).getDouble(1) == 30.0)
  }

  test("cosine similarity: orthogonal is 0, identical is 1") {
    val df = Seq(
      (Array(1.0f, 0.0f), Array(0.0f, 1.0f)),
      (Array(1.0f, 0.0f), Array(2.0f, 0.0f))
    ).toDF("a", "b")
    val r = df.select(Similarity.cosine($"a", $"b").as("c")).collect()
      .map(_.getDouble(0))
    assert(math.abs(r(0)) < 1e-12 && math.abs(r(1) - 1.0) < 1e-12)
  }

  test("auto-tau: extrapolated k-th distance gives high recall below brute-force cost") {
    val e = graft.sources.Tables(spark, sf0001, "embeddings")
    val tau = Knn.estimateTau(spark, e, k = 5)
    assert(tau > 0 && tau < 10, s"implausible tau $tau")
    val model = Knn.fit(spark, e)
    val qs = e.filter($"vec_id" < 20)
    val exact = model.search(qs, 5, tau = 1e9).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val auto = model.search(qs, 5, tau = tau).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (exact intersect auto).size.toDouble / exact.size
    assert(recall >= 0.6, s"recall $recall at tau=$tau")
  }

  test("auto-tau shrinks as the corpus grows (power-law extrapolation)") {
    val e = graft.sources.Tables(spark, TestSpark.sf001, "embeddings")
    val tauSmall = Knn.estimateTau(spark, e.limit(200), k = 5)
    val tauLarge = Knn.estimateTau(spark, e, k = 5)
    assert(tauLarge < tauSmall,
      s"tau should shrink with corpus size: $tauLarge !< $tauSmall")
  }

  test("IBM sequence reader feeds PrefixSpan end-to-end") {
    val res = getClass.getClassLoader.getResource("sequences.txt").getPath
    val seqs = Readers.sequences(spark, res)
      .select(transform(col("sequence"),
        is => transform(is, i => concat(lit("item_"), i))).as("sequence"))
    val pats = new org.apache.spark.ml.fpm.PrefixSpan()
      .setMinSupport(0.5).setMaxPatternLength(3)
      .findFrequentSequentialPatterns(seqs)
      .collect()
    // both fixture sequences are distinct; any pattern with freq >= 1
    // (support 0.5 of 2 sequences) must come from a real subsequence
    assert(pats.nonEmpty)
    assert(pats.forall(_.getLong(1) >= 1))
  }
}
