package graft.ml

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.feature.PCA
import org.apache.spark.mllib.linalg.{Vectors => OldVectors}
import org.apache.spark.mllib.linalg.distributed.RowMatrix
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Unsupervised surface (SURVEY §2.B B1, B9, B11): KMeans, PCA, SVD.
  * Reference: `ml/KMeansRunner.scala:134-161`, `ml/PCARunner.scala:124-190`,
  * `ml/SVDRunner.scala:147-155`.
  *
  * KMeans cost comes from `summary.trainingCost` (Spark-4 replacement for
  * the removed `computeCost`, SURVEY §7 risk 7). PCA/SVD spectra are
  * rounded; eigenvector signs are indeterminate so only magnitudes
  * (variances / singular values) are emitted (SURVEY §7 risk 6).
  */
object Unsupervised {

  private def r4(x: Double): Double = math.floor(x * 1e4 + 0.5) / 1e4

  /** Lloyd clustering over embeddings; output = per-cluster sizes plus the
    * WSSSE metric row. */
  def kmeans(spark: SparkSession, embeddings: DataFrame, k: Int = 8): DataFrame = {
    val data = Supervised.embeddingFeatures(embeddings)
    val m = new KMeans().setK(k).setMaxIter(20).setSeed(2020L).fit(data)
    val sizes = m.summary.predictions
      .groupBy(col("prediction").cast("long").as("cluster"))
      .agg(count(lit(1)).cast("double").as("value"))
      .select(concat(lit("cluster_size_"), col("cluster")).as("term"), col("value"))
    import spark.implicits._
    sizes.union(Seq(("wssse", r4(m.summary.trainingCost))).toDF("term", "value"))
      .orderBy("term")
  }

  /** Lloyd iterations with DETERMINISTIC initialization (centers = the k
    * lowest vec_ids) — the oracle-checkable complement to [[kmeans]]
    * (stock KMeans|| init is seeded RNG state no external engine can
    * replay). The plan is the scale-correct Lloyd shape: centers live on
    * the driver (k×dim doubles) and enter the plan as literals, so
    * assignment is a map-side projection — argmin over k codegen'd
    * distance expressions, no shuffle — and only the center update
    * shuffles k×dim partial sums. Centers are rounded to 1e-6 each
    * iteration so cross-engine float summation order cannot drift.
    * Output: (cluster, dim, value) flattened centers + (cluster, -1, n)
    * size rows. */
  /** The deterministic Lloyd centers themselves (rounded 1e-6 per
    * iteration) — reused by [[lloydFixed]] and as the trained coarse
    * quantizer of the IVF ANN path (`Similarity.ivfTopKTrained`). The
    * driver only ever holds k×dim doubles. Returns (centers, final
    * assignment frame). */
  private[graft] def lloydCenters(spark: SparkSession, embeddings: DataFrame,
      k: Int = 4, iters: Int = 5, memoKey: Option[String] = None)
      : (Array[Array[Double]], DataFrame) = {
    def r6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6
    val xd = transform(col("embedding"), v => v.cast("double"))
    def distTo(c: Array[Double]): org.apache.spark.sql.Column =
      sqrt(aggregate(
        zip_with(xd, typedLit(c.toSeq), (x, cc) => (x - cc) * (x - cc)),
        lit(0.0), (acc, v) => acc + v))
    def assignTo(cs: Array[Array[Double]]): DataFrame = {
      // array_min over (d, c) structs: the same lexicographic argmin the
      // historic when(a <= b, a).otherwise(b) fold computed (compare d,
      // tie-break on the center index), but with a LINEAR-size
      // expression tree — the fold copied the accumulated tree into
      // both branches, i.e. 2^k nodes, which exhausted a 24 GiB driver
      // at k = 20 (round-10 probe). Bit-identical assignment: same raw
      // distances, same comparison order.
      val best = array_min(array(cs.zipWithIndex
        .map { case (c, i) => struct(distTo(c).as("d"), lit(i).as("c")) }: _*))
      embeddings
        .select(col("vec_id"), xd.as("x"), best.getField("c").as("cluster"))
    }
    // the loop's product is (c_{iters-1}, c_iters): the returned frame is
    // the LAST-iteration assignment (to the pre-update centers) and the
    // returned centers are the post-update means of that assignment —
    // exactly the a$iters/c$iters pair the DuckDB oracle unrolls. Both
    // center arrays (k×dim doubles) are memoizable driver state; the
    // assignment frame is rebuilt lazily from c_{iters-1}, so a memo hit
    // (ml_kmeans ↔ ml_lloyd_fixed share the same twin) skips all
    // iters×2 corpus passes.
    def run(): (Array[Array[Double]], Array[Array[Double]]) = {
      var centers: Array[Array[Double]] = embeddings.orderBy("vec_id")
        .limit(k).select("embedding").collect()
        .map(_.getSeq[Float](0).map(_.toDouble).toArray)
        .map(_.map(r6))
      var prev = centers
      for (_ <- 1 to iters) {
        prev = centers
        val sums = assignTo(centers)
          .select(col("cluster"), posexplode(col("x")).as(Seq("dim", "v")))
          .groupBy("cluster", "dim").agg(avg("v").as("m"))
          .collect()
        val next = centers.map(_.clone())
        sums.foreach(r =>
          next(r.getInt(0))(r.getInt(1)) = r6(r.getDouble(2)))
        centers = next // clusters that lost every point keep their center
      }
      (prev, centers)
    }
    val (cPrev, cFinal) = memoKey match {
      case Some(key) =>
        graft.core.QueryCache.value(s"lloyd:$key:$k:$iters")(run())
      case None => run()
    }
    (cFinal, assignTo(cPrev))
  }

  def lloydFixed(spark: SparkSession, embeddings: DataFrame, k: Int = 4,
      iters: Int = 5, dim: Int = 64,
      memoKey: Option[String] = None): DataFrame = {
    import spark.implicits._
    val (centers, assigned) = lloydCenters(spark, embeddings, k, iters, memoKey)
    val sizes = assigned.groupBy("cluster")
      .agg(count(lit(1)).cast("double").as("value"))
      .select(col("cluster").cast("long"), lit(-1).as("dim"), col("value"))
    val flat = centers.zipWithIndex.flatMap { case (c, i) =>
      c.zipWithIndex.map { case (v, j) => (i.toLong, j, v) } }
      .toSeq.toDF("cluster", "dim", "value")
    flat.unionByName(sizes).orderBy("cluster", "dim")
  }

  /** PCA top-k principal components; output = per-component explained
    * variance (sign-free). */
  def pca(spark: SparkSession, embeddings: DataFrame, k: Int = 8): DataFrame = {
    import spark.implicits._
    val data = Supervised.embeddingFeatures(embeddings)
    val m = new PCA().setK(k).setInputCol("features").setOutputCol("pc").fit(data)
    m.explainedVariance.toArray.zipWithIndex
      .map { case (v, i) => (i, math.floor(v * 1e6 + 0.5) / 1e6) }
      .toSeq.toDF("component", "explained_variance").orderBy("component")
  }

  /** 2-feature PCA companion: with d=2 the covariance eigensystem has a
    * closed form (quadratic roots of the characteristic polynomial), so
    * the whole covariance→eigendecomposition path is oracle-checkable in
    * SQL — the same fit-the-real-estimator / re-derive-in-closed-form
    * trick as the Cramer OLS oracle. Signs are killed with abs(). */
  def pca2(spark: SparkSession, embeddings: DataFrame,
      off: Int = 1): DataFrame = {
    // slice() is 1-based; off < 1 errors inside Spark with an opaque
    // message, and off+1 past the embedding dim would diverge silently
    // from the DuckDB oracle (out-of-bounds index is NULL there) — the
    // dim bound is enforced by the PCA fit failing loudly on a short
    // slice, the lower bound here (r13 advice).
    require(off >= 1, s"off is a 1-based dim index, got $off")
    import spark.implicits._
    def r6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6
    val data = embeddings.select(
      org.apache.spark.ml.functions.array_to_vector(
        slice(col("embedding"), off, 2)).as("features"))
    val m = new PCA().setK(2).setInputCol("features").setOutputCol("pc")
      .fit(data)
    val ev = m.explainedVariance.toArray
    (0 until 2).map(j => (j, r6(ev(j)),
        r6(math.abs(m.pc(0, j))), r6(math.abs(m.pc(1, j)))))
      .toDF("component", "explained_variance", "abs_load_1", "abs_load_2")
      .orderBy("component")
  }

  /** 2-column SVD companion: singular values / right vectors of the n×2
    * matrix come from the 2×2 Gram eigensystem — closed-form oracle. */
  def svd2(spark: SparkSession, embeddings: DataFrame,
      off: Int = 1): DataFrame = {
    require(off >= 1, s"off is a 1-based dim index, got $off")
    import spark.implicits._
    def r6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6
    val rows = embeddings.select(slice(col("embedding"), off, 2).as("xy"))
      .rdd.map(r => OldVectors.dense(
        r.getSeq[Float](0).map(_.toDouble).toArray))
    val svd = new RowMatrix(rows).computeSVD(2, computeU = false)
    val v = svd.V
    svd.s.toArray.zipWithIndex
      .map { case (s, j) => (j, r6(s),
        r6(math.abs(v(0, j))), r6(math.abs(v(1, j)))) }
      .toSeq.toDF("index", "singular_value", "abs_load_1", "abs_load_2")
      .orderBy("index")
  }

  /** Top-k singular values via mllib RowMatrix (distributed Gram matrix +
    * local eigendecomposition — the scalable tall-skinny path). */
  def svd(spark: SparkSession, embeddings: DataFrame, k: Int = 8): DataFrame = {
    import spark.implicits._
    val rows = Supervised.embeddingFeatures(embeddings)
      .select("features").rdd
      .map(r => OldVectors.fromML(r.getAs[org.apache.spark.ml.linalg.Vector](0)))
    val svd = new RowMatrix(rows).computeSVD(k, computeU = false)
    svd.s.toArray.zipWithIndex
      .map { case (v, i) => (i, r4(v)) }
      .toSeq.toDF("index", "singular_value").orderBy("index")
  }
}
