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
    "ml_prefixspan" -> ((s, d) => TextModels.prefixSpan(s, ev(s, d))),
    "ml_knn" -> ((s, d) => {
      val e = emb(s, d)
      // pruned exact search (two-pass backtracking bound) — same result
      // as brute force without the |Q|×|C| fan-out
      knn.Knn.fit(s, e).searchExact(
        e.filter(org.apache.spark.sql.functions.col("vec_id") < 10), k = 5)
    }),
    "ml_knn_class" -> ((s, d) => {
      import org.apache.spark.sql.functions.{col, count, lit}
      val e = emb(s, d)
      knn.Knn.fit(s, e)
        .classify(e.filter(col("vec_id") < 500), k = 5, tau = 0.2, labels = e)
        .join(e.select(col("vec_id").as("query_id"), col("label")), Seq("query_id"))
        .groupBy(col("label").cast("long").as("label"),
          col("prediction").cast("long").as("prediction"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy("label", "prediction")
    }),
    "ml_simrank" -> ((s, d) => {
      import org.apache.spark.sql.functions._
      val indexed = new org.apache.spark.ml.feature.StringIndexer()
        .setInputCol("event_type").setOutputCol("item")
        .fit(ev(s, d)).transform(ev(s, d))
      val ratings = indexed.groupBy(
          (col("user_id") % 100).cast("long").as("user"),
          col("item").cast("long").as("item"))
        .agg(count(lit(1)).cast("double").as("weight"))
      SimRank.userSimilarity(s, ratings).limit(50)
    }),
    "ml_dbscan" -> ((s, d) => {
      import org.apache.spark.sql.functions._
      val pts = emb(s, d).select(col("vec_id").as("id"),
        element_at(col("embedding"), 1).cast("double").as("x"),
        element_at(col("embedding"), 2).cast("double").as("y"))
      clustering.Dbscan.fitPredict(s, pts, eps = 0.05, minPoints = 5)
    }),
    "ml_spca" -> ((s, d) => {
      import org.apache.spark.sql.functions._
      val coo = emb(s, d).select(col("vec_id").as("row"),
          posexplode(col("embedding")).as(Seq("col", "value")))
        .filter(col("value") =!= 0.0f)
      Spca.fit(s, coo, numCols = 64, k = 8)
    }))

  /** (vec_id, i, v) unpivot of the 64-dim embedding column — shared CTE
    * of the matrix oracles. i is 1-based here; emitted 0-based to match
    * the Spark flattenUpper output. */
  private val unpivotCte =
    "WITH x AS (SELECT vec_id, i, CAST(embedding[i] AS DOUBLE) AS v " +
      "FROM embeddings, generate_series(1, 64) t(i)) "

  private def upperMatrix(valueExpr: String, src: String): String =
    s"SELECT CAST(a.i - 1 AS INTEGER) AS i, CAST(b.i - 1 AS INTEGER) AS j, " +
      s"FLOOR($valueExpr * 1000000 + 0.5) / 1000000 AS v " +
      s"FROM $src a JOIN $src b ON a.vec_id = b.vec_id AND a.i <= b.i " +
      "GROUP BY a.i, b.i ORDER BY i, j"

  val oracle: Map[String, String] = Map(
    "ml_corr_matrix" ->
      (unpivotCte + upperMatrix("CORR(a.v, b.v)", "x")),
    "ml_cov_matrix" ->
      (unpivotCte + upperMatrix("COVAR_SAMP(a.v, b.v)", "x")),
    // Spearman = Pearson over average ranks (ties averaged, as in the
    // mllib SpearmanCorrelation rank assignment)
    "ml_spearman_matrix" ->
      (unpivotCte +
        ", rk AS (SELECT vec_id, i, AVG(rn) OVER (PARTITION BY i, v) AS v FROM " +
        "(SELECT vec_id, i, v, ROW_NUMBER() OVER (PARTITION BY i ORDER BY v) AS rn FROM x) q) " +
        upperMatrix("CORR(a.v, b.v)", "rk")),
    // vocabulary = all distinct whitespace tokens (fixture vocab < 64 =
    // the CountVectorizer cap), idf = ln((m+1)/(df+1))
    "ml_idf" ->
      ("WITH tok AS (SELECT doc_id, UNNEST(string_split(text, ' ')) AS term FROM documents), " +
        "cnt AS (SELECT term, COUNT(*) AS c FROM tok GROUP BY term), " +
        "top AS (SELECT term FROM cnt ORDER BY c DESC, term LIMIT 64), " +
        "df AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM tok GROUP BY term), " +
        "m AS (SELECT COUNT(*) AS m FROM documents) " +
        "SELECT t.term, FLOOR(LN((m.m + 1.0) / (df.df + 1.0)) * 10000 + 0.5) / 10000 " +
        "AS idf FROM top t JOIN df USING (term), m ORDER BY term"),
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
        "MIN(l_quantity) AS mn, MAX(l_quantity) AS mx FROM lineitem"),
    "ml_knn" ->
      ("WITH q AS (SELECT vec_id AS query_id, LIST_TRANSFORM(embedding, x -> CAST(x AS DOUBLE)) AS qe " +
        "FROM embeddings WHERE vec_id < 10), " +
        "c AS (SELECT vec_id AS neighbor_id, LIST_TRANSFORM(embedding, x -> CAST(x AS DOUBLE)) AS ce " +
        "FROM embeddings), " +
        "s AS (SELECT query_id, neighbor_id, LIST_DISTANCE(qe, ce) AS dist FROM q CROSS JOIN c), " +
        "rk AS (SELECT query_id, neighbor_id, " +
        "CAST(ROW_NUMBER() OVER (PARTITION BY query_id " +
        "ORDER BY FLOOR(dist * 1000000 + 0.5) / 1000000, neighbor_id) AS INTEGER) AS rank, " +
        "FLOOR(dist * 10000 + 0.5) / 10000 AS dist FROM s) " +
        "SELECT query_id, rank, neighbor_id, dist FROM rk WHERE rank <= 5 " +
        "ORDER BY query_id, rank"))
}
