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

    // difference-based distance, sequential double accumulation — the
    // exact op sequence DuckDB's list_distance uses, so the oracle
    // hash-matches. Preference order (SURVEY §4): the codegen'd native
    // Expression (graft_euclid, via GraftExtensions) when the session
    // has it; else a compiled UDF (the interpreted HOF lambda was ~6×
    // slower on the candidate hot path). All three produce identical
    // IEEE results.
    private def distExpr: Column =
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

    /** Raw candidate distances for leaf-exploded queries
      * (query_id, qv, leaf) → (query_id, neighbor_id, dist). */
    private def candidates(q: DataFrame, excludeSelf: Boolean): DataFrame = {
      val c = corpusWithLeaf.select(col("leaf"),
        col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
      val joined = q.join(c, Seq("leaf"))
      val kept =
        if (excludeSelf) joined.filter(col("neighbor_id") =!= col("query_id"))
        else joined
      kept.select(col("query_id"), col("neighbor_id"), distExpr.as("dist"))
        // a query may reach the same neighbor through several leaves
        .groupBy("query_id", "neighbor_id").agg(min("dist").as("dist"))
    }

    /** Rounded, ranked top-k output shape:
      * (query_id, rank, neighbor_id, dist). Ranking uses the 1e-6-rounded
      * distance + id tiebreak for cross-run stability. */
    private def topK(cand: DataFrame, k: Int): DataFrame = {
      val w = Window.partitionBy("query_id")
        .orderBy((floor(col("dist") * 1e6 + 0.5) / 1e6).asc, col("neighbor_id"))
      cand.select(col("query_id"), col("neighbor_id"), col("dist"),
          row_number().over(w).as("rank"))
        .filter(col("rank") <= k)
        .select(col("query_id"), col("rank"), col("neighbor_id"),
          (floor(col("dist") * 1e4 + 0.5) / 1e4).as("dist"))
        .orderBy("query_id", "rank")
    }

    private def explodedQueries(queries: DataFrame, tau: Double): DataFrame = {
      val bc = spark.sparkContext.broadcast(tree)
      val leavesOf = udf((v: Seq[Float]) =>
        assign(bc.value, v.map(_.toDouble).toArray, tau))
      queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
        .withColumn("leaf", explode(leavesOf(col("qv"))))
    }

    /** Top-k euclidean neighbors per query row with a fixed spill buffer
      * tau (approximate; tau = ∞ degenerates to brute force — test-only,
      * use [[searchExact]] for a pruned exact search). */
    def search(queries: DataFrame, k: Int, tau: Double,
        excludeSelf: Boolean = false): DataFrame =
      topK(candidates(explodedQueries(queries, tau), excludeSelf), k)

    /** Exact top-k via two-pass metric-tree pruning (the Spark-shaped
      * analogue of the reference's per-node backtracking search,
      * `knn/MetricTree.scala:130-153`): pass 1 searches each query's home
      * leaf only (tau = 0) and takes the k-th candidate distance r as an
      * upper bound; pass 2 re-fans the query with per-query tau = r —
      * a hyperplane whose margin exceeds r cannot hide a closer point, so
      * only leaves within the bound are visited. Queries whose home leaf
      * held fewer than k candidates fan to all leaves (rare: leafSize ≥ k).
      * Cost: |Q| × (home leaf + bounded spill), never |Q| × |C|. */
    def searchExact(queries: DataFrame, k: Int,
        excludeSelf: Boolean = false): DataFrame = {
      val pass1 = candidates(explodedQueries(queries, 0.0), excludeSelf)
      val w = Window.partitionBy("query_id").orderBy(col("dist"))
      val bound = pass1
        .select(col("query_id"), col("dist"), row_number().over(w).as("rn"))
        .filter(col("rn") <= k)
        .groupBy("query_id")
        .agg(max("dist").as("r"), count(lit(1)).as("cnt"))
        .select(col("query_id"),
          when(col("cnt") < k, Double.MaxValue)
            // small inflation absorbs the 1e-6 rank rounding at the bound
            .otherwise(col("r") + 1e-4).as("qtau"))
      val bc = spark.sparkContext.broadcast(tree)
      val leavesOf = udf((v: Seq[Float], t: Double) =>
        assign(bc.value, v.map(_.toDouble).toArray, t))
      val q2 = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
        .join(broadcast(bound), Seq("query_id"), "left")
        .withColumn("leaf",
          explode(leavesOf(col("qv"),
            coalesce(col("qtau"), lit(Double.MaxValue)))))
        .select(col("query_id"), col("qv"), col("leaf"))
      topK(candidates(q2, excludeSelf), k)
    }

    /** Shared vote pipeline: the k-NN id set joined to labels, counted
      * per (query, class), then (a) argmax winner (min-label tiebreak)
      * and (b) per-class vote FRACTIONS — the reference classifier's
      * rawPrediction/probability surface (`KNNClassifier.scala:144-190`:
      * vote counts and counts/k). Integer votes / k is exact arithmetic,
      * so the whole probability row is oracle-checkable; fractions are
      * emitted as one flat `p_<class>` column per observed corpus class
      * (flat columns, not a vector: joins and the driver compare both
      * want scalar cells). Class collection is a driver-side distinct on
      * the label column — class cardinality is tiny by construction. */
    private def voteResult(nn: DataFrame, k: Int, labels: DataFrame): DataFrame = {
      val voted = nn
        .join(labels.select(col(idCol).as("neighbor_id"),
          col("label").as("n_label")), Seq("neighbor_id"))
        .groupBy("query_id", "n_label").agg(count(lit(1)).as("votes"))
      val classes = labels.select(col("label").cast("long").as("c"))
        .distinct().collect().map(_.getLong(0)).sorted
      val probCols = classes.map(c =>
        (floor(coalesce(sum(when(col("n_label").cast("long") === c,
          col("votes"))), lit(0L)) / k.toDouble * 1e4 + 0.5) / 1e4)
          .as(s"p_$c"))
      val probs = voted.groupBy("query_id").agg(probCols.head, probCols.tail: _*)
      val w = Window.partitionBy("query_id")
        .orderBy(col("votes").desc, col("n_label"))
      val winner = voted.select(col("query_id"), col("n_label"),
          row_number().over(w).as("rn"))
        .filter(col("rn") === 1)
        .select(col("query_id"), col("n_label").as("prediction"))
      winner.join(probs, Seq("query_id")).orderBy("query_id")
    }

    /** Majority-vote classification over the k nearest non-self
      * neighbors; output = (query_id, prediction, p_<class>...). Corpus
      * must carry a `label` column. */
    def classify(queries: DataFrame, k: Int, tau: Double,
        labels: DataFrame): DataFrame =
      // self filtered from the candidate set BEFORE the top-k window, so
      // exactly k neighbors vote even when the query is absent from the
      // corpus (k+1-then-filter over-voted in that case)
      voteResult(search(queries, k, tau, excludeSelf = true), k, labels)

    /** Reference-shaped nested output (`knn/KNN.scala:202-212` emits
      * `neighbors: Array[Struct]` + distances): one row per query,
      * neighbor ids and distances as rank-ordered array columns. The
      * flat (query, rank, neighbor, dist) form stays the primary shape —
      * friendlier to joins — but the typed nested shape is part of the
      * surface. */
    def searchNested(queries: DataFrame, k: Int, tau: Double): DataFrame =
      search(queries, k, tau)
        .groupBy("query_id")
        .agg(array_sort(collect_list(struct(col("rank"), col("neighbor_id"),
          col("dist")))).as("arr"))
        .select(col("query_id"),
          transform(col("arr"), x => x.getField("neighbor_id")).as("neighbors"),
          transform(col("arr"), x => x.getField("dist")).as("distances"))
        .orderBy("query_id")

    /** search with tau auto-estimated from the fitted corpus via the
      * power-law extrapolation ([[Knn.estimateTau]]) — the no-hand-tuning
      * entry point: neither exact-everything nor a blind guess. */
    def searchAuto(queries: DataFrame, k: Int,
        excludeSelf: Boolean = false): DataFrame =
      search(queries, k,
        Knn.estimateTau(spark, corpusWithLeaf, k, vecCol), excludeSelf)

    /** Per-leaf corpus row counts — introspection for balance checks. */
    def leafSizes: DataFrame =
      corpusWithLeaf.groupBy("leaf").agg(count(lit(1)).as("n"))

    /** classify over the pruned exact search — deterministic, so the
      * whole vote (winner AND probability columns) is
      * DuckDB-oracle-checkable. */
    def classifyExact(queries: DataFrame, k: Int,
        labels: DataFrame): DataFrame =
      voteResult(searchExact(queries, k, excludeSelf = true), k, labels)

    /** Mean-of-neighbor-labels regression (self excluded). */
    def regress(queries: DataFrame, k: Int, tau: Double,
        labels: DataFrame): DataFrame = {
      search(queries, k, tau, excludeSelf = true)
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
      numQueries: Int = 24, seed: Long = 2020L): Double = {
    val n = corpus.count()
    val rows = uniformSample(corpus, vecCol, maxSample + numQueries, n, seed)
    if (rows.length <= k + numQueries) return Double.MaxValue // tiny: exact
    val queries = rows.take(numQueries)
    val pool = rows.drop(numQueries)
    val sizes = Seq(pool.length / 4, pool.length / 2, pool.length)
      .filter(_ > k).distinct
    if (sizes.length < 2) return Double.MaxValue
    var fallback = 0.0 // largest measured k-th-neighbor distance
    val pts = sizes.map { s =>
      val sub = pool.take(s)
      val kth = queries.map { q =>
        sub.map(p => math.sqrt(sqdist(q, p))).sorted.apply(math.min(k, s - 1))
      }.sorted.apply(numQueries / 2) // median over queries
      fallback = math.max(fallback, kth)
      (math.log(s.toDouble), math.log(math.max(kth, 1e-12)))
    }
    val m = pts.length.toDouble
    val sx = pts.map(_._1).sum; val sy = pts.map(_._2).sum
    val sxx = pts.map(p => p._1 * p._1).sum
    val sxy = pts.map(p => p._1 * p._2).sum
    val b = (m * sxy - sx * sy) / (m * sxx - sx * sx)
    val a = (sy - b * sx) / m
    val est = math.exp(a + b * math.log(n.toDouble))
    // degenerate-fit guard (reference falls back to the max measured
    // distance when the regression slope is non-negative or NaN,
    // `knn/KNN.scala:468-516`): a noisy/tiny sample must not silently
    // extrapolate tau to ∞ and degrade every search to brute force
    if (b.isNaN || b >= 0 || est.isNaN || est.isInfinite) fallback else est
  }

  /** Seeded uniform sample of `want` vectors collected to the driver.
    * `limit()` would take the FIRST parquet rows — on sorted/clustered
    * data that degenerates the pivot tree into skewed leaves and biases
    * the tau extrapolation (the reference samples its top-tree too,
    * `knn/KNN.scala:387`). The 1.3× oversample makes an undershoot of the
    * binomial draw below `want` vanishingly unlikely. */
  private def uniformSample(corpus: DataFrame, vecCol: String, want: Int,
      n: Long, seed: Long): Array[Array[Double]] = {
    val base = corpus.select(vecCol)
    val sampled =
      if (n <= want) base
      else base.sample(withReplacement = false,
        math.min(1.0, want * 1.3 / n), seed)
    sampled.limit(want).collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
  }

  /** Fit: sample `sampleSize` corpus vectors, build the pivot tree on the
    * driver, assign every corpus row to exactly one leaf. The corpus is
    * repartitioned by (leaf, id): a small parquet reads as one split, and
    * without the spread the whole candidate/distance pipeline after a
    * broadcast join would execute single-threaded (observed 16 s → 4 s). */
  def fit(spark: SparkSession, corpus: DataFrame, idCol: String = "vec_id",
      vecCol: String = "embedding", sampleSize: Int = 1024,
      leafSize: Int = 32, seed: Long = 2020L): Model = {
    val sample = uniformSample(corpus, vecCol, sampleSize, corpus.count(), seed)
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
