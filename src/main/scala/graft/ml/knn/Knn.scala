package graft.ml.knn

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed exact/approximate k-nearest-neighbor search.
  *
  * Re-expression of the reference's hybrid-spill-tree KNN
  * (`org/apache/spark/ml/knn/KNN.scala:380-415` fit,
  * `:92-122` search, `MetricTree.scala` tree family) as a Spark-first
  * design: the driver-side structure is a small generalized-hyperplane
  * metric tree over a pivot sample whose LEAVES ARE PARTITION KEYS, and
  * the search becomes an ordinary equi-join on leaf id — Catalyst plans
  * the shuffle, AQE handles leaf skew, and the per-query merge is a
  * window top-k. The "spill" is the query-side multi-leaf assignment:
  * when a query lies within `tau` of a split boundary it fans out to
  * both subtrees (the reference's buffer semantics, `KNN.scala:551-569`);
  * `tau = ∞` degenerates to exact brute force, matching the reference's
  * exactness escape hatch (`KNNRunner.scala:260-263`).
  *
  * Scale: corpus rows are assigned to exactly one leaf (one narrow
  * shuffle at fit); queries fan out to ≥1 leaves; candidate generation
  * is |Q| × leaf-size, not |Q| × |C|. Distances use the precomputed-norm
  * identity d² = |a|² + |b|² − 2a·b so the join computes one dot product
  * per candidate.
  */
object Knn {

  /** Generalized-hyperplane tree over a driver-side sample. Each node
    * holds two pivots; points route to the nearer pivot's subtree. */
  sealed trait Tree extends Serializable
  final case class Leaf(id: Int) extends Tree
  final case class Split(p1: Array[Double], p2: Array[Double],
      left: Tree, right: Tree) extends Tree

  private def sqdist(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
    s
  }

  /** Build the pivot tree: pick an approximate farthest pair as pivots,
    * partition by nearer pivot, recurse. Returns (tree, numLeaves). */
  def buildTree(points: Array[Array[Double]], leafSize: Int): (Tree, Int) = {
    var nextLeaf = 0
    def build(ps: Array[Array[Double]]): Tree =
      if (ps.length <= leafSize) { val l = Leaf(nextLeaf); nextLeaf += 1; l }
      else {
        val p1 = ps.maxBy(p => sqdist(p, ps(0)))
        val p2 = ps.maxBy(p => sqdist(p, p1))
        val (l, r) = ps.partition(p => sqdist(p, p1) <= sqdist(p, p2))
        if (l.isEmpty || r.isEmpty) { val lf = Leaf(nextLeaf); nextLeaf += 1; lf }
        else Split(p1, p2, build(l), build(r))
      }
    val t = build(points)
    (t, nextLeaf)
  }

  /** Leaf ids for a point: single leaf with tau = 0 (corpus assignment);
    * spills to both subtrees where |d1 − d2| ≤ 2·tau (query search). */
  def assign(t: Tree, x: Array[Double], tau: Double): List[Int] = t match {
    case Leaf(id) => List(id)
    case Split(p1, p2, l, r) =>
      val d1 = math.sqrt(sqdist(x, p1)); val d2 = math.sqrt(sqdist(x, p2))
      if (math.abs(d1 - d2) <= 2 * tau) assign(l, x, tau) ::: assign(r, x, tau)
      else if (d1 <= d2) assign(l, x, tau) else assign(r, x, tau)
  }

  /** Fitted model: broadcast tree + leaf-keyed corpus. */
  final class Model private[knn] (spark: SparkSession, tree: Tree,
      corpusWithLeaf: DataFrame, idCol: String, vecCol: String) {

    /** Top-k euclidean neighbors per query row. Output:
      * (query_id, rank, neighbor_id, dist). Ranking uses the 1e-6-rounded
      * distance + id tiebreak for cross-run stability. */
    def search(queries: DataFrame, k: Int, tau: Double): DataFrame = {
      val sc = spark.sparkContext
      val bc = sc.broadcast(tree)
      val leavesOf = udf((v: Seq[Float]) =>
        assign(bc.value, v.map(_.toDouble).toArray, tau))
      val q = queries.select(col(idCol).as("query_id"),
          col(vecCol).as("qv"))
        .withColumn("leaf", explode(leavesOf(col("qv"))))
      val c = corpusWithLeaf.select(col("leaf"),
        col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
      // difference-based distance, sequential double accumulation — the
      // exact op sequence DuckDB's list_distance uses, so the oracle
      // hash-matches. Preference order (SURVEY §4): the codegen'd native
      // Expression (graft_euclid, via GraftExtensions) when the session
      // has it; else a compiled UDF (the interpreted HOF lambda was ~6×
      // slower on the candidate hot path). All three produce identical
      // IEEE results.
      val dist: Column =
        if (spark.catalog.functionExists("graft_euclid"))
          expr("graft_euclid(qv, cv)")
        else {
          val euclid = udf((a: Seq[Float], b: Seq[Float]) => {
            var s = 0.0; var i = 0
            while (i < a.length) {
              val d = a(i).toDouble - b(i).toDouble; s += d * d; i += 1
            }
            math.sqrt(s)
          })
          euclid(col("qv"), col("cv"))
        }
      val cand = q.join(c, Seq("leaf"))
        .select(col("query_id"), col("neighbor_id"), dist.as("dist"))
        // a query may reach the same neighbor through several leaves
        .groupBy("query_id", "neighbor_id").agg(min("dist").as("dist"))
      val w = Window.partitionBy("query_id")
        .orderBy((floor(col("dist") * 1e6 + 0.5) / 1e6).asc, col("neighbor_id"))
      cand.select(col("query_id"), col("neighbor_id"), col("dist"),
          row_number().over(w).as("rank"))
        .filter(col("rank") <= k)
        .select(col("query_id"), col("rank"), col("neighbor_id"),
          (floor(col("dist") * 1e4 + 0.5) / 1e4).as("dist"))
        .orderBy("query_id", "rank")
    }

    /** Majority-vote classification over neighbors (self excluded).
      * Corpus must carry a `label` column. */
    def classify(queries: DataFrame, k: Int, tau: Double,
        labels: DataFrame): DataFrame = {
      val nn = search(queries, k + 1, tau)
        .filter(col("neighbor_id") =!= col("query_id"))
      val voted = nn
        .join(labels.select(col(idCol).as("neighbor_id"),
          col("label").as("n_label")), Seq("neighbor_id"))
        .groupBy("query_id", "n_label").agg(count(lit(1)).as("votes"))
      val w = Window.partitionBy("query_id")
        .orderBy(col("votes").desc, col("n_label"))
      voted.select(col("query_id"), col("n_label"),
          row_number().over(w).as("rn"))
        .filter(col("rn") === 1)
        .select(col("query_id"), col("n_label").as("prediction"))
        .orderBy("query_id")
    }

    /** Mean-of-neighbor-labels regression (self excluded). */
    def regress(queries: DataFrame, k: Int, tau: Double,
        labels: DataFrame): DataFrame = {
      search(queries, k + 1, tau)
        .filter(col("neighbor_id") =!= col("query_id"))
        .join(labels.select(col(idCol).as("neighbor_id"),
          col("label").as("n_label")), Seq("neighbor_id"))
        .groupBy("query_id")
        .agg((floor(avg("n_label") * 1e4 + 0.5) / 1e4).as("prediction"))
        .orderBy("query_id")
    }
  }

  /** Auto-estimate the spill buffer tau: the k-th-neighbor distance
    * shrinks as a power law in corpus size, so measure its median on a
    * few nested driver-side samples, fit ln(d_k) = a + b·ln(n) by least
    * squares, and extrapolate to the full corpus size. Same idea as the
    * reference's multi-size-sample regression (`knn/KNN.scala:468-516`),
    * independently derived. All work is on O(sample²) local data. */
  def estimateTau(spark: SparkSession, corpus: DataFrame, k: Int,
      vecCol: String = "embedding", maxSample: Int = 512,
      numQueries: Int = 24): Double = {
    val n = corpus.count()
    val rows = corpus.select(vecCol).limit(maxSample + numQueries).collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    if (rows.length <= k + numQueries) return Double.MaxValue // tiny: exact
    val queries = rows.take(numQueries)
    val pool = rows.drop(numQueries)
    val sizes = Seq(pool.length / 4, pool.length / 2, pool.length)
      .filter(_ > k).distinct
    if (sizes.length < 2) return Double.MaxValue
    val pts = sizes.map { s =>
      val sub = pool.take(s)
      val kth = queries.map { q =>
        sub.map(p => math.sqrt(sqdist(q, p))).sorted.apply(math.min(k, s - 1))
      }.sorted.apply(numQueries / 2) // median over queries
      (math.log(s.toDouble), math.log(math.max(kth, 1e-12)))
    }
    val m = pts.length.toDouble
    val sx = pts.map(_._1).sum; val sy = pts.map(_._2).sum
    val sxx = pts.map(p => p._1 * p._1).sum
    val sxy = pts.map(p => p._1 * p._2).sum
    val b = (m * sxy - sx * sy) / (m * sxx - sx * sx)
    val a = (sy - b * sx) / m
    math.exp(a + b * math.log(n.toDouble))
  }

  /** Fit: sample `sampleSize` corpus vectors, build the pivot tree on the
    * driver, assign every corpus row to exactly one leaf. The corpus is
    * repartitioned by (leaf, id): a small parquet reads as one split, and
    * without the spread the whole candidate/distance pipeline after a
    * broadcast join would execute single-threaded (observed 16 s → 4 s). */
  def fit(spark: SparkSession, corpus: DataFrame, idCol: String = "vec_id",
      vecCol: String = "embedding", sampleSize: Int = 1024,
      leafSize: Int = 32): Model = {
    val sample = corpus.select(vecCol).limit(sampleSize).collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    val (tree, _) = buildTree(sample, leafSize)
    val bc = spark.sparkContext.broadcast(tree)
    val leafOf = udf((v: Seq[Float]) =>
      assign(bc.value, v.map(_.toDouble).toArray, 0.0).head)
    val parallelism = spark.sparkContext.defaultParallelism
    val withLeaf = corpus.withColumn("leaf", leafOf(col(vecCol)))
      .repartition(parallelism, col("leaf"), col(idCol))
    new Model(spark, tree, withLeaf, idCol, vecCol)
  }
}
