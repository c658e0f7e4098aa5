package graft.ml

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.sources.Tables

/** queries()/oracleSql() wiring for the ML layer. SQL-expressible stats
  * (pairwise covariance/correlation, summary) carry DuckDB oracles; model
  * fits are rows-only (iterative, seeded) and unit-tested in MlSpec. */
object MlQueries {

  private def li(s: SparkSession, d: String) = Tables(s, d, "lineitem")
  private def emb(s: SparkSession, d: String) = Tables(s, d, "embeddings")
  private def docs(s: SparkSession, d: String) = Tables(s, d, "documents")
  private def ev(s: SparkSession, d: String) = Tables(s, d, "events")

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ml_cov_pairs" -> ((s, d) => Stats.covPairs(li(s, d))),
    "ml_corr_pairs" -> ((s, d) => Stats.corrPairs(li(s, d))),
    "ml_summary" -> ((s, d) => Stats.summary(li(s, d))),
    "ml_corr_matrix" -> ((s, d) => Stats.corrMatrix(s, emb(s, d), "pearson")),
    "ml_spearman_matrix" -> ((s, d) => Stats.corrMatrix(s, emb(s, d), "spearman")),
    "ml_cov_matrix" -> ((s, d) => Stats.covMatrix(s, emb(s, d))),
    "ml_linreg" -> ((s, d) => Supervised.linearRegression(s, li(s, d))),
    "ml_logreg" -> ((s, d) => Supervised.logisticRegression(s, li(s, d))),
    "ml_svc" -> ((s, d) => Supervised.linearSvc(s, li(s, d))),
    "ml_dtree" -> ((s, d) => Supervised.decisionTree(s, emb(s, d))),
    "ml_rf" -> ((s, d) => Supervised.randomForest(s, emb(s, d))),
    "ml_gbt" -> ((s, d) => Supervised.gbt(s, li(s, d))),
    "ml_kmeans" -> ((s, d) => Unsupervised.kmeans(s, emb(s, d))),
    "ml_pca" -> ((s, d) => Unsupervised.pca(s, emb(s, d))),
    "ml_svd" -> ((s, d) => Unsupervised.svd(s, emb(s, d))),
    "ml_idf" -> ((s, d) => TextModels.idf(s, docs(s, d))),
    "ml_als" -> ((s, d) => TextModels.als(s, ev(s, d))),
    "ml_lda" -> ((s, d) => TextModels.lda(s, docs(s, d))),
    "ml_prefixspan" -> ((s, d) => TextModels.prefixSpan(s, ev(s, d))))

  val oracle: Map[String, String] = Map(
    "ml_cov_pairs" ->
      ("SELECT FLOOR(COVAR_SAMP(l_quantity, l_extendedprice) * 10000 + 0.5) / 10000 AS cov_qty_price, " +
        "FLOOR(COVAR_SAMP(l_discount, l_tax) * 100000000 + 0.5) / 100000000 AS cov_disc_tax " +
        "FROM lineitem"),
    "ml_corr_pairs" ->
      ("SELECT FLOOR(CORR(l_quantity, l_extendedprice) * 1000000 + 0.5) / 1000000 AS corr_qty_price, " +
        "FLOOR(CORR(l_discount, l_tax) * 1000000 + 0.5) / 1000000 AS corr_disc_tax " +
        "FROM lineitem"),
    "ml_summary" ->
      ("SELECT COUNT(l_quantity) AS cnt, " +
        "FLOOR(AVG(l_quantity) * 10000 + 0.5) / 10000 AS mean, " +
        "FLOOR(STDDEV_SAMP(l_quantity) * 10000 + 0.5) / 10000 AS std, " +
        "MIN(l_quantity) AS mn, MAX(l_quantity) AS mx FROM lineitem"))
}
