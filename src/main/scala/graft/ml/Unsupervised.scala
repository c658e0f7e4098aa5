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
