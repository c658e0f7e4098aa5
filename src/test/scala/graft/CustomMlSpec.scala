package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ml.{SimRank, Spca, Unsupervised}
import graft.ml.clustering.Dbscan
import graft.ml.knn.Knn
import graft.sources.Tables

class CustomMlSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private lazy val embeddings = Tables(spark, sf0001, "embeddings")

  test("knn exact (tau=inf) matches a brute-force computation") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val model = Knn.fit(spark, embeddings)
    val got = model.search(embeddings.filter($"vec_id" < 5), k = 3, tau = 1e9)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    // brute force via DataFrame ops
    val q = embeddings.filter($"vec_id" < 5)
      .select($"vec_id".as("query_id"), $"embedding".as("qv"))
    val c = embeddings.select($"vec_id".as("neighbor_id"), $"embedding".as("cv"))
    val dist = sqrt(aggregate(
      zip_with(col("qv"), col("cv"),
        (x, y) => (x.cast("double") - y.cast("double")) *
          (x.cast("double") - y.cast("double"))),
      lit(0.0), (a, v) => a + v))
    val w = Window.partitionBy("query_id")
      .orderBy((floor(dist * 1e6 + 0.5) / 1e6).asc, col("neighbor_id"))
    val want = q.crossJoin(c)
      .select(col("query_id"), col("neighbor_id"), row_number().over(w).as("rank"))
      .filter(col("rank") <= 3)
      .collect().map(r => (r.getLong(0), r.getInt(2), r.getLong(1)))
    assert(got.sortBy(x => (x._1, x._2)).toSeq == want.sortBy(x => (x._1, x._2)).toSeq)
  }

  test("knn approximate search has decent recall and is cheaper") {
    val model = Knn.fit(spark, embeddings)
    val qs = embeddings.filter($"vec_id" < 20)
    val exact = model.search(qs, 5, tau = 1e9).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val approx = model.search(qs, 5, tau = 0.5).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall >= 0.5, s"recall $recall")
  }

  test("knn fit on a SORTED corpus keeps leaves balanced (seeded sample, " +
      "not first-rows limit) and pruned exact search matches brute force") {
    import org.apache.spark.sql.functions._
    // clustered/sorted input: ids ascending, x = id — a limit()-based
    // pivot sample would only ever see the low end and funnel the upper
    // 90% of the corpus into one giant leaf
    val pts = (1 to 2000).map(i => (i.toLong, Array((i * 0.01).toFloat, 0.0f)))
      .toDF("vec_id", "embedding")
    val model = Knn.fit(spark, pts, sampleSize = 256, leafSize = 32)
    val sizes = model.leafSizes.collect().map(_.getLong(1))
    assert(sizes.length > 8, s"only ${sizes.length} leaves")
    // limit()-sampling put ~90% of this corpus in one leaf; the seeded
    // uniform sample keeps every leaf under a third
    assert(sizes.max <= 2000 / 3, s"skewed leaf of ${sizes.max}/2000 rows")
    // exact two-pass pruning ≡ brute force, at bounded candidate cost
    val qs = pts.filter($"vec_id" % 97 === 0)
    val exact = model.searchExact(qs, k = 5).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).sorted.toSeq
    val brute = model.search(qs, k = 5, tau = 1e9).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).sorted.toSeq
    assert(exact == brute)
  }

  test("knn classifier separates well-separated synthetic clusters") {
    val pts = ((1 to 30).map(i => (i.toLong, Array(0.0f + i * 0.001f, 0.0f), 0)) ++
      (31 to 60).map(i => (i.toLong, Array(5.0f + i * 0.001f, 5.0f), 1)))
      .toDF("vec_id", "embedding", "label")
    val model = Knn.fit(spark, pts)
    val preds = model.classify(pts, k = 3, tau = 1e9, labels = pts)
      .join(pts.select($"vec_id".as("query_id"), $"label"), Seq("query_id"))
    val correct = preds.filter($"prediction" === $"label").count()
    assert(correct == 60)
  }

  test("knn classifier probability columns: fractions of k, sum to 1, argmax wins") {
    // mixed neighborhood: point 40 sits between the two clusters, so its
    // 3-NN vote splits — fractions must reflect the split exactly
    val pts = ((1 to 30).map(i => (i.toLong, Array(0.0f + i * 0.001f, 0.0f), 0)) ++
      (31 to 60).map(i => (i.toLong, Array(5.0f + i * 0.001f, 5.0f), 1)))
      .toDF("vec_id", "embedding", "label")
    val model = Knn.fit(spark, pts)
    val rows = model.classify(pts, k = 3, tau = 1e9, labels = pts).collect()
    assert(rows.length == 60)
    for (r <- rows) {
      val p0 = r.getAs[Double]("p_0"); val p1 = r.getAs[Double]("p_1")
      // integer votes / 3, rounded to 4 dp on write
      assert(Set(0.0, 0.3333, 0.6667, 1.0).contains(p0), s"p_0=$p0")
      assert(math.abs(p0 + p1 - 1.0) < 2e-4)
      val pred = r.getAs[Int]("prediction")
      assert(if (pred == 0) p0 >= p1 else p1 >= p0)
    }
    // deep-cluster points vote unanimously
    val byId = rows.map(r => r.getLong(0) -> r.getAs[Double]("p_0")).toMap
    assert(byId(15L) == 1.0 && byId(45L) == 0.0)
  }

  test("knn classifier: corpus with gap classes emits only observed p_ columns") {
    import org.apache.spark.sql.functions.col
    // labels {0, 2, 5} — classes 1, 3, 4 absent. voteResult must emit
    // exactly p_0/p_2/p_5, and a consumer deriving the class list from
    // the output (ml_knn_prob) must not reference a missing p_<c>
    val pts = ((1 to 20).map(i => (i.toLong, Array(0.0f + i * 0.001f, 0.0f), 0)) ++
      (21 to 40).map(i => (i.toLong, Array(5.0f + i * 0.001f, 5.0f), 2)) ++
      (41 to 60).map(i => (i.toLong, Array(0.0f, 9.0f + i * 0.001f), 5)))
      .toDF("vec_id", "embedding", "label")
    val out = Knn.fit(spark, pts).classifyExact(pts, k = 3, labels = pts)
    val probCols = out.columns.filter(_.startsWith("p_")).toSeq
    assert(probCols.sorted == Seq("p_0", "p_2", "p_5"))
    // the ml_knn_prob selection pattern over the derived columns works
    val sel = out.select(col("query_id") +:
      col("prediction").cast("long").as("prediction") +:
      probCols.sortBy(_.stripPrefix("p_").toLong).map(col): _*).collect()
    assert(sel.length == 60)
    assert(sel.forall(r => Set(0L, 2L, 5L).contains(r.getLong(1))))
  }

  test("simrank: users sharing items are more similar than disjoint users") {
    // users 0,1 rate item 0; user 2 rates item 1 only
    val ratings = Seq((0L, 0L, 1.0), (1L, 0L, 1.0), (2L, 1L, 1.0))
      .toDF("user", "item", "weight")
    val sim = SimRank.userSimilarity(spark, ratings, iterations = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(sim.contains((0L, 1L)) && sim((0L, 1L)) > 0.5)
    assert(!sim.contains((0L, 2L)) && !sim.contains((1L, 2L)))
  }

  test("dbscan: two blobs plus a far outlier") {
    val blob1 = (1 to 10).map(i => (i.toLong, 0.0 + i * 0.001, 0.0))
    val blob2 = (11 to 20).map(i => (i.toLong, 5.0 + i * 0.001, 5.0))
    val noise = Seq((99L, 50.0, 50.0))
    val pts = (blob1 ++ blob2 ++ noise).toDF("id", "x", "y")
    val r = Dbscan.fitPredict(spark, pts, eps = 0.1, minPoints = 3).collect()
      .map(x => x.getLong(0) -> (x.getInt(1), x.getLong(2))).toMap
    assert(r(99L) == (-1, -1L)) // noise
    val c1 = (1L to 10L).map(r(_)._2).distinct
    val c2 = (11L to 20L).map(r(_)._2).distinct
    assert(c1.length == 1 && c2.length == 1 && c1 != c2)
    assert((1L to 20L).forall(r(_)._1 == 0)) // all dense points are core
  }

  test("spca on exploded dense data matches dense pca explained variance") {
    import org.apache.spark.sql.functions._
    val coo = embeddings.select($"vec_id".as("row"),
      posexplode($"embedding").as(Seq("col", "value")))
    val sparse = Spca.fit(spark, coo, numCols = 64, k = 4).collect()
      .map(r => r.getInt(0) -> r.getDouble(1)).toMap
    val dense = Unsupervised.pca(spark, embeddings, k = 4).collect()
      .map(r => r.getInt(0) -> r.getDouble(1)).toMap
    (0 until 4).foreach(i =>
      assert(math.abs(sparse(i) - dense(i)) < 1e-4, s"component $i"))
  }
}
