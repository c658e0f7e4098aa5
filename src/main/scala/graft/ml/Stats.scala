package graft.ml

import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.ml.linalg.Matrix
import org.apache.spark.ml.stat.Correlation
import org.apache.spark.mllib.linalg.{Vectors => OldVectors}
import org.apache.spark.mllib.linalg.distributed.RowMatrix
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Statistics operators (SURVEY §2.B B12–B14, A28–A29): covariance,
  * Pearson/Spearman correlation, summary stats.
  *
  * Two API layers, mirroring the reference's dual paths
  * (`ml/PearsonRunner.scala:127-194` DataFrame vs RDD):
  *  - pairwise SQL aggregates (`covar_samp`, `corr`) — fully distributed,
  *    partial+final agg, DuckDB-oracle-checkable;
  *  - whole-matrix paths over a vector column (`Correlation.corr`,
  *    `RowMatrix.computeCovariance`) — result is a d×d local matrix
  *    (small by construction: d = embedding dim), flattened back to a
  *    DataFrame for uniform output.
  */
object Stats {

  private def r(c: Column, d: Int): Column = {
    val f = math.pow(10, d)
    floor(c * f + 0.5) / f
  }

  /** Pairwise sample covariance over lineitem numeric columns. */
  def covPairs(lineitem: DataFrame): DataFrame =
    lineitem.agg(
      r(covar_samp(col("l_quantity"), col("l_extendedprice")), 4).as("cov_qty_price"),
      r(covar_samp(col("l_discount"), col("l_tax")), 8).as("cov_disc_tax"))

  /** Pairwise Pearson correlation (SQL `corr` aggregate). */
  def corrPairs(lineitem: DataFrame): DataFrame =
    lineitem.agg(
      r(corr(col("l_quantity"), col("l_extendedprice")), 6).as("corr_qty_price"),
      r(corr(col("l_discount"), col("l_tax")), 6).as("corr_disc_tax"))

  /** Summary statistics (count/mean/stddev/min/max) for one column. */
  def summary(lineitem: DataFrame): DataFrame =
    lineitem.agg(
      count(col("l_quantity")).as("cnt"),
      r(avg(col("l_quantity")), 4).as("mean"),
      r(stddev_samp(col("l_quantity")), 4).as("std"),
      min(col("l_quantity")).as("mn"),
      max(col("l_quantity")).as("mx"))

  /** d×d correlation matrix over the embedding vector column, flattened
    * to upper-triangle (i, j, corr) rows. method: "pearson"|"spearman". */
  def corrMatrix(spark: SparkSession, embeddings: DataFrame,
      method: String): DataFrame = {
    val vecs = embeddings.select(array_to_vector(col("embedding")).as("features"))
    val m = Correlation.corr(vecs, "features", method)
      .head().getAs[Matrix](0)
    flattenUpper(spark, m)
  }

  /** d×d covariance matrix via mllib RowMatrix (the reference's
    * `CovRunner.scala:101-102` path), flattened like corrMatrix. */
  def covMatrix(spark: SparkSession, embeddings: DataFrame): DataFrame = {
    val rows = embeddings.select(array_to_vector(col("embedding")).as("f"))
      .rdd.map(r => OldVectors.fromML(
        r.getAs[org.apache.spark.ml.linalg.Vector](0)))
    val cov = new RowMatrix(rows).computeCovariance()
    val local = org.apache.spark.ml.linalg.Matrices
      .dense(cov.numRows, cov.numCols, cov.toArray)
    flattenUpper(spark, local)
  }

  private def flattenUpper(spark: SparkSession, m: Matrix): DataFrame = {
    import spark.implicits._
    val flat = for { i <- 0 until m.numRows; j <- i until m.numCols }
      yield (i, j, math.floor(m(i, j) * 1e6 + 0.5) / 1e6)
    flat.toDF("i", "j", "v").orderBy("i", "j")
  }
}
