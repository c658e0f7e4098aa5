package graft.llm

import org.apache.spark.ml.feature.BucketedRandomProjectionLSH
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Two paths, mirroring the reference's exact-vs-approximate KNN split
  * (`ml/KNNRunner.scala:282-342` brute force vs the spill-tree estimator):
  *
  *  - [[bruteForceTopK]]: exact top-k by dot product/cosine. The query set
  *    is broadcast (it is small by construction), the corpus is never
  *    shuffled, and the per-query top-k is a window rank — so the cost is
  *    one scan of the corpus regardless of cluster size.
  *  - [[lshNeighbors]]: `BucketedRandomProjectionLSH` bucketed join — the
  *    scale path when the query set is itself huge; candidates meet only
  *    within hash buckets.
  *
  * Dot products run in double precision, accumulated left-to-right
  * (`aggregate` HOF), which matches DuckDB's `list_inner_product` on
  * double lists — making the brute-force path oracle-checkable.
  */
object Similarity {

  /** Sequential-order double dot product of two float arrays. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Exact top-k neighbors of each query by (rounded) dot product.
    * Ranking uses the 1e-6-rounded score with id tiebreak so results are
    * stable across engines/partitionings despite float ulp wobble. */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val q = broadcast(queries.select(col("vec_id").as("query_id"),
      col("embedding").as("qe")))
    val c = corpus.select(col("vec_id").as("neighbor_id"),
      col("embedding").as("ce"))
    // native codegen'd kernel when the session carries GraftExtensions
    // (no per-row intermediate array); identical IEEE sequence either way
    val rawDot: Column =
      if (queries.sparkSession.catalog.functionExists("graft_dot"))
        expr("graft_dot(qe, ce)")
      else dot(col("qe"), col("ce"))
    val scored = c.join(q)
      .select(col("query_id"), col("neighbor_id"), rawDot.as("raw_dot"))
      .select(col("query_id"), col("neighbor_id"), col("raw_dot"),
        (floor(col("raw_dot") * 1e6 + 0.5) / 1e6).as("dot6"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("dot6").desc, col("neighbor_id"))
    scored
      .select(col("query_id"), col("neighbor_id"),
        row_number().over(w).as("rank"),
        (floor(col("raw_dot") * 10000 + 0.5) / 10000).as("sim"))
      .filter(col("rank") <= k)
      .orderBy("query_id", "rank")
  }

  /** Deterministic sign-projection LSH: like [[lshNeighbors]] but the
    * projection vectors are ±1 patterns derived from a closed-form
    * parity (not an RNG stream), so any engine can rebuild the exact
    * buckets and the output is oracle-checkable. Candidates share a
    * (table, bucket) key — bucket = ⌊x·p_t / bucketLength⌋ — and are
    * verified against the true distance. The same shape scales the same
    * way: candidate cost is bucket co-occupancy, never |Q|×|C|. */
  def lshNeighborsDeterministic(queries: DataFrame, corpus: DataFrame,
      maxDist: Double, bucketLength: Double = 2.0, numTables: Int = 3,
      dim: Int = 64): DataFrame = {
    def signs(t: Int): Seq[Double] =
      (0 until dim).map(j =>
        if (((2 * t + 3) * j + 104729 * t + 12345) % 2 == 0) -1.0 else 1.0)
    val xd = transform(col("embedding"), v => v.cast("double"))
    def bucketed(df: DataFrame, idName: String): DataFrame = {
      val perTable = (0 until numTables).map { t =>
        val dot = aggregate(
          zip_with(xd, typedLit(signs(t)), (x, s) => x * s),
          lit(0.0), (a, v) => a + v)
        struct(lit(t).as("t"), floor(dot / bucketLength).as("b"))
      }
      df.select(col("vec_id").as(idName), col("embedding"),
          explode(array(perTable: _*)).as("tb"))
        .select(col(idName), col("embedding"),
          col("tb.t").as("t"), col("tb.b").as("b"))
    }
    val q = bucketed(queries, "query_id")
      .select(col("query_id"), col("embedding").as("qe"), col("t"), col("b"))
    val c = bucketed(corpus, "neighbor_id")
      .select(col("neighbor_id"), col("embedding").as("ce"), col("t"), col("b"))
    val dist = sqrt(aggregate(
      zip_with(col("qe"), col("ce"),
        (x, y) => (x.cast("double") - y.cast("double")) *
          (x.cast("double") - y.cast("double"))),
      lit(0.0), (a, v) => a + v))
    q.join(c, Seq("t", "b"))
      .select(col("query_id"), col("neighbor_id"), dist.as("d"))
      .groupBy("query_id", "neighbor_id").agg(min("d").as("d"))
      .filter(col("d") <= maxDist)
      .select(col("query_id"), col("neighbor_id"),
        (floor(col("d") * 10000 + 0.5) / 10000).as("dist"))
      .orderBy("query_id", "neighbor_id")
  }

  /** IVF (inverted-file) approximate top-k: the corpus is partitioned
    * into cells by nearest coarse centroid; each query probes only its
    * `nProbe` nearest cells. Mirrors the coarse-quantize-then-scan
    * structure of FAISS-style IVF indexes, re-expressed as two joins:
    *
    *  - assignment: corpus ⋈ broadcast(centroids) + map-side
    *    `min(struct(dist, cid))` — a per-row argmin whose exchange
    *    carries one (vec_id, cell, embedding) row per corpus vector
    *    (the index must store the vector), never the |corpus|×|cents|
    *    scored expansion — partial aggregation collapses that
    *    map-side;
    *  - probe: query cells ⋈ corpus cells on the cell id — candidate
    *    cost is |Q| · nProbe/nlist · |C| instead of |Q|×|C|.
    *
    * Centroids here are the deterministic `vec_id % centroidStride = 0`
    * subset, so the whole index is engine-replicable (oracle-checkable);
    * a k-means-trained centroid set drops in without changing the plan.
    * Distances/scores are rounded (1e-6) with id tiebreaks, so ranking
    * is stable across engines and partitionings.
    *
    * Scale note: a FIXED stride makes nlist = |C|/stride, so the
    * build-side assignment join (|C|·nlist distances) is quadratic in
    * the corpus — measured 15.4× runtime at 10× data with stride 31.
    * `centroidStride = 0` (the default) picks the stride from the
    * corpus via [[adaptiveStride]] — stride doubles per 4× corpus
    * growth, i.e. stride ∝ √|C| and nlist ∝ √|C| (the FAISS sizing
    * rule), balancing build (|C|^1.5) against probe
    * (|Q| · nProbe · √|C|) and keeping the centroid broadcast bounded
    * (~72k × dim at 1e9 vectors). */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      centroidStride: Int = 0, nProbe: Int = 4): DataFrame = {
    val (cents, assign) = ivfIndex(corpus, centroidStride)
    ivfTopKIndexed(queries, cents, assign, k, nProbe)
  }

  /** Coarse-centroid stride ladder: 31 up to 5,000 vectors (the pinned
    * sf0.01/sf0.1 sizes keep their historic stride), then doubling per
    * 4× corpus growth — stride ∝ √|C|, so cell count AND cell size
    * both grow as √|C|. Pure integer thresholds, replayed by the
    * oracle as a CASE over COUNT(*). */
  def adaptiveStride(n: Long): Int = {
    var s = 31
    var threshold = 5000L
    while (n >= threshold && s < 7936) { s *= 2; threshold *= 4 }
    s
  }

  /** Deployment-mode sizing switch (round-10 directive #1). The integer
    * CASE ladders above/below stay the DEFAULT — every pinned oracle
    * query replays them engine-exactly in DuckDB — but their step
    * geometry is locally quadratic between rungs (SCALE_r9 §×30:
    * ann_ivf 4.64×, ivfpq 4.33×, embed_dedup 4.18× runtime for 3× data
    * when the growth lands between rungs). A session that sets
    * `spark.conf.set("graft.sizing.mode", "smooth")` gets continuous
    * sizing on the auto-sized paths instead ([[ivfIndex]] /
    * [[ivfPqTopK]] coarse stride, [[cosineNearDupPairs]] /
    * [[incrementalCosineNearDups]] sign-LSH blocking) — the production
    * switch for index builds whose outputs no pinned oracle replays. */
  private[llm] def smoothSizing(
      spark: org.apache.spark.sql.SparkSession): Boolean =
    spark.conf.getOption("graft.sizing.mode")
      .exists(_.trim.equalsIgnoreCase("smooth"))

  /** Continuous √N companion of [[adaptiveStride]], anchored at the
    * ladder's mid-rung points (31·√(n/2500)): stride — and with it both
    * cell count and cell size — grows as exactly √|C| instead of in 2×
    * steps per 4× rung, so build cost follows the FAISS N^1.5 envelope
    * at EVERY size, not only at rung boundaries. */
  def smoothStride(n: Long): Int =
    math.max(31, math.ceil(math.sqrt(0.3844 * n)).toInt)

  /** Continuous companion of [[adaptiveProjections]]: the real-valued
    * ladder position λ = 2 + log₂(n/1200) is realized FRACTIONALLY as
    * per-TABLE projection counts summing to round(numTables·λ) — e.g.
    * λ = 6.64 over 3 tables becomes (7, 7, 6). Candidate volume per
    * table is N²/2.2^h_t, so the total steps numTables times per corpus
    * doubling instead of once: the between-rung growth the integer
    * ladder pays (up to 2.2× locally — SCALE_r9 measured 4.18× runtime
    * for 3× data) shrinks to ≤ 2.2^(1/numTables) ≈ 1.3× ripple around
    * the N^(2−log₂2.2) ≈ N^0.86 envelope, in EXACT integer arithmetic —
    * no bucket-width modeling (a width-rescaling variant was measured
    * this round and under-delivered: Gaussian bucket co-occupancy is
    * not linear in width). Counts are clamped to [1, 32] (the
    * hash-group sanity bound of the uncapped ladder — past 10 the fold
    * hashes, see [[signBucketsExprPerTable]]); below the first rung
    * every table gets the ladder's 1, so pinned corpora are
    * unchanged. */
  def smoothProjections(n: Long, numTables: Int = 3): Seq[Int] = {
    // the ladder is h = 2 + floor(log2(n/1200)) past the first rung;
    // its continuous position is lambda = 2 + log2(n/1200)
    val lam =
      if (n < 1200) 1.0
      else 2.0 + math.log(n.toDouble / 1200.0) / math.log(2.0)
    val total = math.min(32 * numTables,
      math.max(numTables, math.round(numTables * lam).toInt))
    val base = total / numTables
    val rem = total % numTables
    (0 until numTables).map(t => if (t < rem) base + 1 else base)
  }

  /** Shared distance kernels for the split build/probe IVF pair: the
    * BUILD-side cell assignment and the PROBE-side query routing must
    * stay bit-identical (rounding, native fallback and all) or a
    * persisted index silently disagrees with its probes — one
    * definition serves both sides. */
  private def euclidExpr(spark: org.apache.spark.sql.SparkSession,
      a: String, b: String): Column =
    if (spark.catalog.functionExists("graft_euclid"))
      expr(s"graft_euclid($a, $b)")
    else sqrt(aggregate(
      zip_with(col(a), col(b),
        (x, y) => (x.cast("double") - y.cast("double")) *
          (x.cast("double") - y.cast("double"))),
      lit(0.0), (acc, v) => acc + v))

  private def dotExpr(spark: org.apache.spark.sql.SparkSession,
      a: String, b: String): Column =
    if (spark.catalog.functionExists("graft_dot"))
      expr(s"graft_dot($a, $b)")
    else dot(col(a), col(b))

  /** IVF index build as a PERSISTABLE artifact — the ANN counterpart of
    * the minhash index tables ([[Dedup.indexDelta]]): `centroids`
    * `(cid, cv)` and `assign` `(neighbor_id, ce, cell)`, both plain
    * parquet-able frames. At 100 TB the index is built ONCE (the
    * corpus-side argmin scan is the only corpus-sized job) and every
    * later query batch probes the stored tables via
    * [[ivfTopKIndexed]] — the corpus is never re-assigned. Write the
    * assignment PARTITIONED BY CELL
    * (`assign.write.partitionBy("cell")`) — then a probe's cell
    * equi-join partition-prunes to the nProbe probed cells' files, and
    * probe I/O is nProbe/nlist of the index instead of a full
    * corpus-sized read. [[ivfTopK]] is exactly build + probe fused, so
    * the fused oracle transfers to the round-tripped path
    * (WritersAndPipelineSpec asserts partitioned round-trip
    * equality). */
  def ivfIndex(corpus: DataFrame,
      centroidStride: Int = 0): (DataFrame, DataFrame) = {
    val spark = corpus.sparkSession
    val n = corpus.count()
    val stride =
      if (centroidStride > 0) centroidStride
      else if (smoothSizing(spark)) smoothStride(n)
      else adaptiveStride(n)
    val cents = broadcast(
      corpus.filter(pmod(col("vec_id"), lit(stride)) === 0)
        .select(col("vec_id").as("cid"), col("embedding").as("cv")))
    // corpus→cell argmin as a map-side partial agg (struct min orders by
    // rounded distance then centroid id — deterministic tiebreak).
    // The argmin is COMPUTE-bound (n · nlist = n²/stride distance
    // evals): a small parquet corpus arriving as one scan partition
    // would run the whole build on one core (measured: full build+probe
    // at the ×30 stress corpus, 29M evals, 8.5–21 s → 3.5 s once
    // spread). Fan out only when the eval count can repay the
    // exchange's fixed cost — n²/stride > 4M evals (the sf0.1 build is
    // 129k evals and measured FASTER unspread: 0.78 vs 1.0 s).
    val d6i = floor(euclidExpr(spark, "ce", "cv") * 1e6 + 0.5).cast("long")
    val spread =
      if (n * (n / stride) > 4_000_000L) Dedup.fanOut(corpus) else corpus
    val assign = spread
      .select(col("vec_id").as("neighbor_id"), col("embedding").as("ce"))
      .join(cents)
      .groupBy("neighbor_id")
      .agg(min(packedArgmin(d6i, col("cid"))).as("mp"))
      // the embedding payload REJOINS by id after the argmin: carrying
      // it through the aggregate (the historic first(ce)) forced a
      // non-fixed-width buffer — see [[packedArgmin]]
      .join(corpus.select(col("vec_id").as("neighbor_id"),
        col("embedding").as("ce")), Seq("neighbor_id"))
      .select(col("neighbor_id"), col("ce"), unpackId(col("mp")).as("cell"))
    (cents, assign)
  }

  /** Packed argmin key: the build-side cell assignment aggregates
    * n×nlist joined rows, and `min` over a STRUCT buffer cannot
    * hash-aggregate (ObjectHashAggregate falls back to sort-based past
    * its key threshold) — at 4.3M vectors × 4,096 centroids the
    * resulting sort tried to spill the whole cross-product and filled
    * the disk (round-10 wide-corpus probe; invisible at the pinned
    * sizes, where the spill fit). Packing the (rounded-distance,
    * id) order into ONE BIGINT makes the argmin a plain fixed-width
    * `min`: HashAggregate with map-side partial collapse — nothing
    * corpus×nlist-sized is ever sorted or spilled. Ordering is
    * identical to the struct form (lexicographic (d6i, id), both
    * non-negative). Bounds: id < 2^33 (8.6B — strided-cid vec_ids
    * beyond that should use the trained path, whose ids are dense) and
    * d6i clamped at 2^30−1 ≈ distance 1073.0 (far beyond any embedding
    * distance this engine targets; ties at the clamp break by id).
    * Both bounds are ENFORCED per row: an out-of-range id (only
    * reachable through the strided paths, which pack raw vec_ids as
    * cids) raises instead of silently corrupting the packed order, and
    * a NULL distance (null embedding element / dimension mismatch)
    * stays NULL — `min` then skips the row, so a degenerate centroid
    * never wins an argmin by masquerading as the clamp value. */
  private def packedArgmin(d6i: Column, id: Column): Column = {
    val guardedId = when(id < 0 || id >= lit(1L << 33),
      raise_error(concat(lit("packedArgmin id out of [0, 2^33): "),
        id.cast("string")))).otherwise(id)
    when(d6i.isNull, lit(null).cast("long"))
      .otherwise(least(d6i, lit((1L << 30) - 1)) * lit(1L << 33) + guardedId)
  }

  private def unpackId(packed: Column): Column = pmod(packed, lit(1L << 33))

  /** The distance-kernel identity of a session — which implementation
    * [[euclidExpr]] resolves to. Persisted with every written index
    * ([[ivfIndexWrite]]) and checked on load ([[ivfIndexRead]]): cell
    * assignment and probe routing must use the SAME kernel, and a
    * probe session whose kernel differs from the builder's must fail
    * loudly instead of silently degrading recall if the two ever
    * diverge by an ulp at a rounding boundary. */
  private def kernelId(spark: org.apache.spark.sql.SparkSession): String =
    if (spark.catalog.functionExists("graft_euclid")) "graft_euclid/1"
    else "builtin_hof_euclid/1"

  /** Persist an [[ivfIndex]] as its deployment layout: `centroids`,
    * `assign` PARTITIONED BY CELL (so probes partition-prune to the
    * nProbe probed cells' files), and a one-row `meta` frame recording
    * the building session's distance kernel + format version. */
  def ivfIndexWrite(centroids: DataFrame, assign: DataFrame,
      dir: String): Unit = {
    val spark = centroids.sparkSession
    import spark.implicits._
    centroids.write.mode("overwrite").parquet(s"$dir/centroids")
    assign.write.mode("overwrite").partitionBy("cell")
      .parquet(s"$dir/assign")
    Seq(kernelId(spark)).toDF("kernel")
      .write.mode("overwrite").parquet(s"$dir/meta")
  }

  /** Load a persisted IVF index, FAILING LOUDLY if the probing
    * session's distance kernel differs from the one that built the
    * index (see [[kernelId]] — a silent mismatch could route queries
    * to cells the stored assignment never used). Returns
    * (centroids, assign) ready for [[ivfTopKIndexed]]. */
  def ivfIndexRead(spark: org.apache.spark.sql.SparkSession,
      dir: String): (DataFrame, DataFrame) = {
    val stored = spark.read.parquet(s"$dir/meta")
      .select("kernel").head().getString(0)
    val here = kernelId(spark)
    require(stored == here,
      s"IVF index at $dir was built with distance kernel '$stored' but " +
        s"this session resolves '$here'; probing with a different kernel " +
        "can silently disagree with the stored cell assignment. Register " +
        "GraftExtensions (or rebuild the index) so build and probe share " +
        "one kernel.")
    (spark.read.parquet(s"$dir/centroids"),
      spark.read.parquet(s"$dir/assign"))
  }

  /** Probe a stored [[ivfIndex]]: identical plan and output to
    * [[ivfTopK]] given the same index frames (read them back with
    * `spark.read.parquet`). Queries assign to their nProbe nearest
    * centroids and meet the assignment table on the cell key — an
    * ids+vectors equi-join bounded by the probed cells, never a corpus
    * scan.
    *
    * `staticPrune = true` is the persisted-index deployment path: the
    * probed cell set (bounded by |Q|·nProbe, and by nlist overall) is
    * collected and applied as a LITERAL partition filter on the
    * assignment scan, so a `partitionBy("cell")` index provably reads
    * only the probed cells' files (PlanSpec asserts the scan's
    * partition count) — no reliance on runtime DPP heuristics. The
    * collect is bounded driver state (cell ids only), the
    * Lloyd-centers discipline. */
  def ivfTopKIndexed(queries: DataFrame, centroids: DataFrame,
      assign: DataFrame, k: Int, nProbe: Int = 4,
      staticPrune: Boolean = false): DataFrame = {
    val spark = queries.sparkSession
    val cents = broadcast(centroids.select(col("cid"), col("cv")))
    val qd6 = floor(euclidExpr(spark, "qe", "cv") * 1e6 + 0.5) / 1e6
    val qCells0 = queries
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"))
      .join(cents)
      .select(col("query_id"), col("qe"), col("cid"), qd6.as("d"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("query_id").orderBy(col("d"), col("cid"))))
      .filter(col("rn") <= nProbe)
      .select(col("query_id"), col("qe"), col("cid").as("cell"))
    val qCells = if (staticPrune) qCells0.localCheckpoint() else qCells0
    val probeTarget = if (staticPrune) {
      val cells = qCells.select("cell").distinct()
        .collect().map(_.get(0)) // bounded: <= |Q| * nProbe cell ids
      assign.filter(col("cell").isin(cells.toIndexedSeq: _*))
    } else assign
    val scored = qCells.join(probeTarget, Seq("cell"))
      .select(col("query_id"), col("neighbor_id"),
        dotExpr(spark, "qe", "ce").as("raw_dot"))
      .select(col("query_id"), col("neighbor_id"), col("raw_dot"),
        (floor(col("raw_dot") * 1e6 + 0.5) / 1e6).as("dot6"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("dot6").desc, col("neighbor_id"))
    scored
      .select(col("query_id"), col("neighbor_id"),
        row_number().over(w).as("rank"),
        (floor(col("raw_dot") * 10000 + 0.5) / 10000).as("sim"))
      .filter(col("rank") <= k)
      .orderBy("query_id", "rank")
  }

  /** IVF with a TRAINED coarse quantizer: identical probe plan to
    * [[ivfTopK]], but the cells are the deterministic Lloyd k-means
    * centers (`Unsupervised.lloydCenters`, rounded 1e-6 per iteration)
    * instead of a strided corpus subset — the FAISS-style production
    * shape, where nlist bounds the broadcast and trained cells cut the
    * per-cell candidate skew of arbitrary striding. Because the trainer
    * is engine-replicable, the WHOLE index — training, assignment,
    * probe, rank — is oracle-checkable as one composed SQL query. */
  def ivfTopKTrained(queries: DataFrame, corpus: DataFrame, k: Int,
      nlist: Int = 4, iters: Int = 5, nProbe: Int = 2): DataFrame = {
    import corpus.sparkSession.implicits._
    val (centers, _) =
      graft.ml.Unsupervised.lloydCenters(corpus.sparkSession, corpus,
        nlist, iters)
    val cents = broadcast(centers.zipWithIndex.toSeq
      .map { case (c, i) => (i.toLong, c.toSeq) }.toDF("cid", "cv"))
    val spark = corpus.sparkSession
    // centroid vectors are doubles (iteration means); the kernel (and
    // its HOF fallback) computes the same left-to-right IEEE sequence
    // as LIST_DISTANCE — graft_euclid accepts float|double sides (r10)
    def euclidToCent(e: String): Column = euclidExpr(spark, e, "cv")
    def dotOf(a: String, b: String): Column =
      if (spark.catalog.functionExists("graft_dot")) expr(s"graft_dot($a, $b)")
      else dot(col(a), col(b))
    val d6i = floor(euclidToCent("ce") * 1e6 + 0.5).cast("long")
    val assign = corpus
      .select(col("vec_id").as("neighbor_id"), col("embedding").as("ce"))
      .join(cents)
      .groupBy("neighbor_id")
      .agg(min(packedArgmin(d6i, col("cid"))).as("mp"))
      // payload rejoins by id after the fixed-width argmin (packedArgmin)
      .join(corpus.select(col("vec_id").as("neighbor_id"),
        col("embedding").as("ce")), Seq("neighbor_id"))
      .select(col("neighbor_id"), col("ce"), unpackId(col("mp")).as("cell"))
    val qd6 = floor(euclidToCent("qe") * 1e6 + 0.5) / 1e6
    val qCells = queries
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"))
      .join(cents)
      .select(col("query_id"), col("qe"), col("cid"), qd6.as("d"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("query_id").orderBy(col("d"), col("cid"))))
      .filter(col("rn") <= nProbe)
      .select(col("query_id"), col("qe"), col("cid").as("cell"))
    val scored = qCells.join(assign, Seq("cell"))
      .select(col("query_id"), col("neighbor_id"),
        dotOf("qe", "ce").as("raw_dot"))
      .select(col("query_id"), col("neighbor_id"), col("raw_dot"),
        (floor(col("raw_dot") * 1e6 + 0.5) / 1e6).as("dot6"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("dot6").desc, col("neighbor_id"))
    scored
      .select(col("query_id"), col("neighbor_id"),
        row_number().over(w).as("rank"),
        (floor(col("raw_dot") * 10000 + 0.5) / 10000).as("sim"))
      .filter(col("rank") <= k)
      .orderBy("query_id", "rank")
  }

  /** Product-quantization (PQ) asymmetric-distance top-k — the
    * code-table member of the ANN family (brute / LSH / IVF / THIS),
    * mirroring the FAISS PQ-ADC shape: the embedding splits into `m`
    * subspaces, each corpus vector compresses to `m` small codes
    * (argmin against a per-subspace codebook), and a query scores a
    * candidate with `m` TABLE LOOKUPS + adds instead of a full
    * d-element dot product.
    *
    * Scale shape: the codebook is `m · ksub` subvectors (bounded,
    * broadcast as literals); encoding is one map-side pass over the
    * corpus (the exchange carries (id, m bytes), never embeddings);
    * scoring joins the broadcast query tables against the code columns
    * — per-pair cost is m lookups, so the exhaustive code scan stays
    * cheap as d grows. Everything is deterministic (strided codebook,
    * 1e-6-rounded argmin with index tiebreak, explicit left-to-right
    * subspace sum), so training + encoding + search oracle-check as one
    * SQL statement.
    *
    * Approximation note: ADC score = Σ_s dot(q_s, codebook[code_s]) —
    * exact dot against the QUANTIZED corpus vector. Recall vs exact
    * search is evaluated with [[recallAtK]] like the other ANN paths;
    * `rerank = R > 0` adds the FAISS-style refine stage — the ADC
    * shortlist of R candidates per query is re-scored with the exact
    * dot product (|Q|·R pairs, corpus payloads rejoin once by id), the
    * standard shape when the quantizer is coarse relative to the data. */
  def pqTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      m: Int = 4, ksub: Int = 16, stride: Int = 31,
      rerank: Int = 0): DataFrame = {
    val (cents, sub) = pqCodebook(corpus, m, ksub, stride)
    val codes = pqCodes(corpus, cents, m, sub, ksub)
    val q = broadcast(queries
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"))
      .select(col("query_id") +: pqTableCols(cents, m, sub, ksub): _*))
    val scored = q.join(codes)
      .select(col("query_id"), col("neighbor_id"),
        pqAdcScore(m).as("raw_dot"))
    pqFinish(scored, queries, corpus, k, rerank)
  }

  /** Codebook: the first ksub strided corpus vectors (driver-side is
    * ksub × dim doubles — bounded like the IVF centroid set), inlined
    * as literals downstream. Returns (codewords, subspace width). */
  private def pqCodebook(corpus: DataFrame, m: Int, ksub: Int,
      stride: Int): (Array[Array[Double]], Int) = {
    val cents: Array[Array[Double]] = corpus
      .filter(pmod(col("vec_id"), lit(stride)) === 0)
      .orderBy("vec_id").limit(ksub)
      .select("embedding").collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    require(cents.length == ksub, s"corpus too small: ${cents.length} < $ksub codewords")
    val dim = cents(0).length
    require(dim % m == 0, s"m=$m must tile dim=$dim")
    (cents, dim / m)
  }

  private def subSlice(c: Column, s: Int, sub: Int): Column =
    transform(slice(c, s * sub + 1, sub), v => v.cast("double"))
  private def centSlice(cents: Array[Array[Double]], j: Int, s: Int,
      sub: Int): Array[Double] = cents(j).slice(s * sub, (s + 1) * sub)
  private def euclidToLit(x: Column, cw: Array[Double]): Column =
    sqrt(aggregate(zip_with(x, typedlit(cw.toSeq), (a, b) => (a - b) * (a - b)),
      lit(0.0), (acc, v) => acc + v))
  private def dotToLit(x: Column, cw: Array[Double]): Column =
    aggregate(zip_with(x, typedlit(cw.toSeq), (a, b) => a * b),
      lit(0.0), (acc, v) => acc + v)

  /** Encode the corpus: per subspace, 1-based position of the (rounded)
    * minimum distance — ties resolve to the smallest codeword index,
    * the same order a ROW_NUMBER argmin with (dist, cid) keys replays.
    * Output (neighbor_id, code0..code{m−1}) — ids + m small ints, never
    * embeddings. */
  private def pqCodes(corpus: DataFrame, cents: Array[Array[Double]],
      m: Int, sub: Int, ksub: Int): DataFrame = {
    val codeCols = (0 until m).map { s =>
      val x = subSlice(col("ce"), s, sub)
      val ds = array((0 until ksub).map(j =>
        floor(euclidToLit(x, centSlice(cents, j, s, sub)) * 1e6 + 0.5) / 1e6): _*)
      (array_position(ds, array_min(ds)) - 1).cast("int").as(s"code$s")
    }
    corpus
      .select(col("vec_id").as("neighbor_id"), col("embedding").as("ce"))
      .select(col("neighbor_id") +: codeCols: _*)
  }

  /** Query tables: per subspace an array of raw dots against all ksub
    * codewords (codeword order = array order, so code+1 indexes it). */
  private def pqTableCols(cents: Array[Array[Double]], m: Int, sub: Int,
      ksub: Int): Seq[Column] =
    (0 until m).map { s =>
      val x = subSlice(col("qe"), s, sub)
      array((0 until ksub).map(j =>
        dotToLit(x, centSlice(cents, j, s, sub))): _*).as(s"t$s")
    }

  /** ADC score: m table lookups, summed in explicit subspace order so
    * every engine reproduces the same IEEE sequence. */
  private def pqAdcScore(m: Int): Column =
    (0 until m).map(s =>
      element_at(col(s"t$s"), col(s"code$s") + 1)).reduce(_ + _)

  /** Shared tail: rank the ADC scores (optionally after the FAISS-style
    * exact-dot refine over the top-`rerank` shortlist). */
  private def pqFinish(scored: DataFrame, queries: DataFrame,
      corpus: DataFrame, k: Int, rerank: Int): DataFrame = {
    val w = Window.partitionBy("query_id")
      .orderBy((floor(col("raw_dot") * 1e6 + 0.5) / 1e6).desc,
        col("neighbor_id"))
    if (rerank <= 0)
      scored
        .select(col("query_id"), col("neighbor_id"),
          row_number().over(w).as("rank"),
          (floor(col("raw_dot") * 10000 + 0.5) / 10000).as("sim"))
        .filter(col("rank") <= k)
        .orderBy("query_id", "rank")
    else {
      val short = scored
        .select(col("query_id"), col("neighbor_id"),
          row_number().over(w).as("rn"))
        .filter(col("rn") <= math.max(rerank, k))
        .select("query_id", "neighbor_id")
      val qe = broadcast(queries
        .select(col("vec_id").as("query_id"), col("embedding").as("qe")))
      val exact = short
        .join(corpus.select(col("vec_id").as("neighbor_id"),
          col("embedding").as("ce")), Seq("neighbor_id"))
        .join(qe, Seq("query_id"))
        .select(col("query_id"), col("neighbor_id"),
          (if (queries.sparkSession.catalog.functionExists("graft_dot"))
            expr("graft_dot(qe, ce)")
          else dot(col("qe"), col("ce"))).as("raw_dot"))
      val w2 = Window.partitionBy("query_id")
        .orderBy((floor(col("raw_dot") * 1e6 + 0.5) / 1e6).desc,
          col("neighbor_id"))
      exact
        .select(col("query_id"), col("neighbor_id"),
          row_number().over(w2).as("rank"),
          (floor(col("raw_dot") * 10000 + 0.5) / 10000).as("sim"))
        .filter(col("rank") <= k)
        .orderBy("query_id", "rank")
    }
  }

  /** IVF+PQ — the composed index every large-scale ANN deployment runs:
    * the IVF coarse quantizer bounds WHICH candidates a query touches
    * (nProbe/nlist of the corpus) and PQ bounds WHAT each candidate
    * costs (m table lookups on m-byte codes). Both stages are the
    * verified deterministic building blocks ([[ivfTopK]] cells,
    * [[pqTopK]] codebook/encoding), so the whole composed index —
    * coarse assignment, encoding, probe, ADC scan, optional exact
    * refine — replays in one oracle SQL statement.
    *
    * Scale shape: the per-query candidate set is nProbe/nlist · |C|
    * ids+codes (no embeddings move for the ADC scan); only the refine
    * stage rejoins |Q|·R payload rows by id. */
  def ivfPqTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      centroidStride: Int = 0, nProbe: Int = 4,
      m: Int = 4, ksub: Int = 16, stride: Int = 31,
      rerank: Int = 0): DataFrame = {
    val spark = corpus.sparkSession
    // coarse stride scales with the corpus ([[adaptiveStride]]); the PQ
    // codebook `stride` stays fixed — it only seeds ksub rows (LIMIT-16
    // semantics), so it has no scale exposure
    val nCorpus = corpus.count()
    val cStride =
      if (centroidStride > 0) centroidStride
      else if (smoothSizing(spark)) smoothStride(nCorpus)
      else adaptiveStride(nCorpus)
    val hasNative = spark.catalog.functionExists("graft_euclid")
    def euclid(a: String, b: String): Column =
      if (hasNative) expr(s"graft_euclid($a, $b)")
      else sqrt(aggregate(
        zip_with(col(a), col(b),
          (x, y) => (x.cast("double") - y.cast("double")) *
            (x.cast("double") - y.cast("double"))),
        lit(0.0), (acc, v) => acc + v))
    val coarse = broadcast(
      corpus.filter(pmod(col("vec_id"), lit(cStride)) === 0)
        .select(col("vec_id").as("cid"), col("embedding").as("cv")))
    // coarse assignment: map-side argmin, exchange carries (id, cell)
    val d6i = floor(euclid("ce", "cv") * 1e6 + 0.5).cast("long")
    // same compute-guarded fan-out as ivfIndex: the coarse argmin is the
    // corpus-sized job, and a narrow parquet scan would single-core it
    val spreadPq =
      if (nCorpus * (nCorpus / cStride) > 4000000L) Dedup.fanOut(corpus)
      else corpus
    val cells = spreadPq
      .select(col("vec_id").as("neighbor_id"), col("embedding").as("ce"))
      .join(coarse)
      .groupBy("neighbor_id")
      .agg(min(packedArgmin(d6i, col("cid"))).as("mp"))
      .select(col("neighbor_id"), unpackId(col("mp")).as("cell"))
    val (cents, sub) = pqCodebook(corpus, m, ksub, stride)
    val codes = pqCodes(corpus, cents, m, sub, ksub).join(cells, Seq("neighbor_id"))
    val qd6 = floor(euclid("qe", "cv") * 1e6 + 0.5) / 1e6
    val qCells = queries
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"))
      .join(coarse)
      .select(col("query_id"), col("qe"), col("cid"), qd6.as("d"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("query_id").orderBy(col("d"), col("cid"))))
      .filter(col("rn") <= nProbe)
      .select(col("query_id") +: col("cid").as("cell") +:
        pqTableCols(cents, m, sub, ksub): _*)
    val scored = broadcast(qCells).join(codes, Seq("cell"))
      .select(col("query_id"), col("neighbor_id"),
        pqAdcScore(m).as("raw_dot"))
      // a query may reach a neighbor through one cell only (cells
      // partition the corpus), so no dedup is needed before ranking
    pqFinish(scored, queries, corpus, k, rerank)
  }

  /** Embedding-cosine near-duplicate pairs — the embedding-space member
    * of the dedup family (exact / MinHash / SimHash / n-gram Jaccard /
    * THIS). Blocking reuses the deterministic parity-sign LSH tables
    * (candidates share a (table, bucket) key, so cost is bucket
    * co-occupancy, never |C|²); survivors are verified with the exact
    * cosine and kept at `tau`. Output (doc_a < doc_b, cos4).
    *
    * `nproj` is the number of sign projections CONCATENATED into each
    * table's bucket key. 0 (the default) picks it from the corpus size
    * via [[adaptiveProjections]] — one projection on a unit-norm corpus
    * is ~N(0,1), so a single `floor(p/2)` key yields only ~4 occupied
    * buckets and the candidate join degenerates to ~|C|²/4 per table
    * (measured: 268M candidates for 53k verified pairs at 20k vectors).
    * Concatenating floors multiplies the effective bucket count ~2.2×
    * per projection, so growing nproj by one per corpus doubling keeps
    * E[bucket co-occupancy] — and with it candidate volume — ~linear in
    * |C|. The price is the standard LSH recall trade: each projection
    * multiplies per-table collision odds (~0.87 per axis for cos 0.95
    * pairs, ~0.56 at cos 0.4), recovered by more tables — which the
    * default `numTables = 0` does automatically: [[adaptiveTables]]
    * holds 3 tables through the exact-fold range and adds one per two
    * projection steps past 10 (where the key fold switches to hashed
    * groups — see [[signBucketsExprPerTable]]), so the ladder climbs
    * to ~40B vectors with no manual escape hatch; past the 12-table
    * cap prefer the cell-blocked [[semDedup]] family. */
  def cosineNearDupPairs(emb: DataFrame, tau: Double,
      bucketLength: Double = 2.0, numTables: Int = 0,
      dim: Int = 64, nproj: Int = 0): DataFrame = {
    // numTables = 0 (the default) scales tables with the projection
    // ladder past its exact-fold range — 3 (the historic constant, and
    // every pinned oracle's value) anywhere below 614k vectors. With an
    // EXPLICIT nproj the ladder is overridden anyway, so auto table
    // count falls back to the constant 3 rather than forcing a corpus
    // count action the caller was avoiding (r11 advice).
    lazy val n = emb.count()
    val nT =
      if (numTables > 0) numTables
      else if (nproj > 0) 3
      else adaptiveTables(n)
    val perTable =
      if (nproj > 0) Seq.fill(nT)(nproj)
      else if (smoothSizing(emb.sparkSession)) smoothProjections(n, nT)
      else Seq.fill(nT)(adaptiveProjections(n))
    // candidate join carries ids only; embeddings rejoin once per
    // surviving pair, so each cosine is evaluated exactly once
    val ids = signBuckets(emb, bucketLength, nT, dim, perTable)
    val cand = ids.select(col("t"), col("b"), col("vec_id").as("doc_a"))
      .join(ids.select(col("t"), col("b"), col("vec_id").as("doc_b")),
        Seq("t", "b"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b")
      .dropDuplicates("doc_a", "doc_b")
    // verify stage: the pair dot runs through the codegen'd graft_dot
    // kernel when the session carries GraftExtensions (the HOF fallback
    // is CodegenFallback — interpreted lambdas dominated this query),
    // and each vector's norm is computed ONCE before the pair join
    // instead of per surviving pair. Same IEEE sequence either way:
    // sqrt(dot(x,x)) per side, then d / (na * nb).
    val native = emb.sparkSession.catalog.functionExists("graft_dot")
    def dotOf(a: String, b: String): Column =
      if (native) expr(s"graft_dot($a, $b)") else dot(col(a), col(b))
    val e = emb.select(col("vec_id"), col("embedding").as("ev"))
      .withColumn("nv", sqrt(dotOf("ev", "ev")))
    cand
      .join(e.select(col("vec_id").as("doc_a"), col("ev").as("ea"),
        col("nv").as("na")), Seq("doc_a"))
      .join(e.select(col("vec_id").as("doc_b"), col("ev").as("eb"),
        col("nv").as("nb")), Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        (dotOf("ea", "eb") / (col("na") * col("nb"))).as("c"))
      .filter(col("c") >= tau)
      .select(col("doc_a"), col("doc_b"),
        (floor(col("c") * 10000 + 0.5) / 10000).as("cos_sim"))
      .orderBy("doc_a", "doc_b")
  }

  /** Projections-per-table ladder for the sign-LSH blocking: starts at
    * 1 (the richest-recall key — at sf0.01's 600 vectors every genuine
    * neighbor collides) and adds one projection per 2× corpus growth
    * past 1,200 rows, capping at 10 (the base-64 key fold's int64
    * capacity). On a unit-norm corpus each projection is ~N(0,1), so a
    * bucketLength-2 floor axis has effective bucket count 1/Σp² ≈ 2.2
    * (it is nearly a sign bit); one extra projection per corpus
    * doubling therefore keeps E[bucket co-occupancy] — the candidate
    * volume driver — ~flat (measured: 57M → 5.9M candidates at 20k
    * vectors moving h 3 → 6). Pure integer thresholds, so the DuckDB
    * oracle ladder (a CASE over COUNT(*)) is exactly replayable
    * cross-engine BELOW 614,400 rows — every oracle-checked corpus by
    * orders of magnitude. PAST that the ladder keeps climbing (round-11
    * rung — the last manual escape hatch): the base-64 key fold only
    * holds 10 floors in an int64, so [[signBucketsExprPerTable]]
    * switches to a hashed fold of ≤10-floor groups above 10
    * projections, and [[adaptiveTables]] adds tables to pay the
    * per-projection recall price. Capped at 32 projections (h = 32 is
    * reached at n ≈ 1200·2³⁰ ≈ 1.3T vectors — unreachable; the cap
    * only bounds the hash-group count). */
  def adaptiveProjections(n: Long): Int = {
    var h = 1
    var threshold = 1200L
    while (n >= threshold && h < 32) { h += 1; threshold *= 2 }
    h
  }

  /** Table-count ladder companion of the uncapped projection ladder:
    * 3 tables (the historic fixed value) through the exact-fold range,
    * then one extra table per TWO projection steps past 10. Each
    * projection multiplies a true pair's per-table collision odds by
    * ~0.87 (cos 0.95 on a unit-norm corpus), so two steps cost ×0.76
    * per table while one extra table at q ≈ 0.2–0.25 restores roughly
    * that factor of overall recall (1−(1−q)^T arithmetic) — candidate
    * volume then grows by the TABLE factor only (logarithmic in n),
    * not the N²/2.2¹⁰ cliff of the capped ladder. Cap 12 tables
    * (reached at h = 27, i.e. n ≈ 1200·2²⁵ ≈ 40B vectors): past that, route to the cell-blocked
    * [[semDedup]] family, whose candidate volume is corpus-linear by
    * construction. Integer thresholds (the projection ladder's own),
    * so the below-cap value is the constant 3 every pinned oracle
    * assumes. */
  def adaptiveTables(n: Long): Int =
    math.min(12, 3 + math.max(0, (adaptiveProjections(n) - 10 + 1) / 2))

  /** Parity-sign LSH bucket keys `(vec_id, t, b)` for a vector frame —
    * the blocking shared by [[cosineNearDupPairs]] and the incremental/
    * streaming probes. Pure per-row expressions (projection + dot with
    * a literal sign pattern), so the same Column tree composes into
    * append-mode streams unchanged. */
  /** The per-row `(t, b)` struct array behind [[signBuckets]] — exposed
    * within graft so the streaming probe can explode it while keeping
    * its event-time column. Each table's key `b` folds `nproj`
    * projection floors base-64 (floor + 32, clamped to [0,63] so
    * non-unit-norm inputs can never overflow the int64 fold; unit-norm
    * projections live in [-8,8] and never clamp): nproj=1 partitions
    * identically to the historic single-floor key, so the pinned
    * sf0.01 oracle output is unchanged there. Sign pattern u = t +
    * numTables·i extends the historic per-table pattern family (i=0
    * reduces to it) without re-keying existing tables. */
  private[graft] def signBucketsExpr(bucketLength: Double,
      numTables: Int, dim: Int, nproj: Int = 1): Column =
    signBucketsExprPerTable(bucketLength, numTables, dim,
      Seq.fill(numTables)(nproj))

  /** [[signBucketsExpr]] with a PER-TABLE projection count — the
    * fractional-ladder form [[smoothProjections]] produces. Table t
    * folds perTable(t) projection floors; the sign-pattern indexing
    * u = t + numTables·i is unchanged, so uniform counts reduce exactly
    * to the historic keys. */
  private[graft] def signBucketsExprPerTable(bucketLength: Double,
      numTables: Int, dim: Int, perTable: Seq[Int]): Column = {
    // Quadratic-parity sign patterns. The historic affine parity
    // ((2u+3)·j + 104729·u + 12345) % 2 is DEGENERATE: every
    // coefficient is odd, so it collapses to (j + u + 1) % 2 — all
    // patterns in the family are ± one vector, every table/projection
    // is ± one projection, and the bucket count can never grow
    // (measured: 12 occupied buckets at every corpus size and every
    // nproj). Any single affine map stays degenerate (offsets of one
    // quasi-periodic bit sequence — measured pairwise pattern
    // correlation 0.48 avg); the PRODUCT of two independent LCGs mod a
    // Mersenne prime is nonlinear in the seed and measures
    // random-equivalent (0.094 avg pairwise correlation vs 0.099 for
    // true random). Exact int64 arithmetic (max intermediate
    // ~(2^31)² < 2^63), so the DuckDB oracle replays it verbatim.
    def signs(u: Int): Seq[Double] =
      (0 until dim).map { j =>
        val s = u.toLong * 1024 + j
        val h1 = (48271L * s + 11L) % 2147483647L
        val h2 = (69621L * s + 101L) % 2147483647L
        if ((h1 * h2 % 2147483647L) % 2 == 0) -1.0 else 1.0
      }
    val xd = transform(col("embedding"), v => v.cast("double"))
    def floorOf(t: Int, i: Int): Column = {
      val d = aggregate(
        zip_with(xd, typedLit(signs(t + numTables * i)), (x, s) => x * s),
        lit(0.0), (a, v) => a + v)
      val f = floor(d / bucketLength).cast("long") + 32
      greatest(least(f, lit(63L)), lit(0L))
    }
    def fold(fs: Seq[Column]): Column =
      fs.foldLeft(lit(0L): Column)((acc, f) => acc * 64 + f)
    array((0 until numTables).map { t =>
      val floors = (0 until perTable(t)).map(i => floorOf(t, i))
      // ≤10 floors: the historic exact base-64 int64 fold — every
      // pinned oracle key is in this range and replays verbatim in
      // DuckDB. Past 10 the fold overflows, so the key becomes
      // xxhash64 over ≤10-floor group folds (round-11 rung): equal
      // floors still meet (the partitioning semantics LSH needs), a
      // hash collision can only ADD a candidate the exact-cosine
      // verify discards, and the ladder keeps one-projection-per-
      // doubling growing past 614k vectors instead of going quadratic.
      val b =
        if (floors.size <= 10) fold(floors)
        else xxhash64(floors.grouped(10).map(fold).toSeq: _*)
      struct(lit(t).as("t"), b.as("b"))
    }: _*)
  }

  private def signBuckets(emb: DataFrame, bucketLength: Double,
      numTables: Int, dim: Int, perTable: Seq[Int]): DataFrame =
    emb.select(col("vec_id"),
        explode(signBucketsExprPerTable(bucketLength, numTables, dim,
          perTable))
          .as("tb"))
      .select(col("vec_id"), col("tb.t").as("t"), col("tb.b").as("b"))

  /** Ingest-time SEMANTIC near-dup probe — the embedding-space twin of
    * [[graft.llm.Dedup.incrementalNearDups]]: an incoming batch of
    * vectors is checked against an EXISTING corpus with the same
    * sign-LSH blocking + exact-cosine verify as [[cosineNearDupPairs]].
    * Output `(new_id, corpus_id, cos_sim)` for every corpus vector the
    * batch near-duplicates at `tau`.
    *
    * Scale shape: asymmetric bucket equi-join (ids only, the tiny batch
    * side probes the corpus bucket table — at 100 TB the corpus side is
    * persisted once, like the MinHash index), candidates dedup before
    * the verify join, norms computed once per side, codegen'd
    * `graft_dot` verify. */
  def incrementalCosineNearDups(newEmb: DataFrame, corpusEmb: DataFrame,
      tau: Double, bucketLength: Double = 2.0, numTables: Int = 0,
      dim: Int = 64, nproj: Int = 0): DataFrame = {
    // both sides must key with the SAME table and per-table projection
    // counts for bucket keys to meet; the corpus side (the size that
    // drives candidate volume) picks them in auto mode — numTables = 0
    // scales tables past the exact-fold range like [[cosineNearDupPairs]]
    // (and, like there, an explicit nproj keeps the constant 3 tables
    // instead of forcing a corpus count — r11 advice)
    lazy val n = corpusEmb.count()
    val nT =
      if (numTables > 0) numTables
      else if (nproj > 0) 3
      else adaptiveTables(n)
    val perTable =
      if (nproj > 0) Seq.fill(nT)(nproj)
      else if (smoothSizing(corpusEmb.sparkSession))
        smoothProjections(n, nT)
      else Seq.fill(nT)(adaptiveProjections(n))
    val bNew = signBuckets(newEmb, bucketLength, nT, dim, perTable)
      .select(col("t"), col("b"), col("vec_id").as("new_id"))
    val bCor = signBuckets(corpusEmb, bucketLength, nT, dim, perTable)
      .select(col("t"), col("b"), col("vec_id").as("corpus_id"))
    val cand = bNew.join(bCor, Seq("t", "b"))
      .select("new_id", "corpus_id").dropDuplicates("new_id", "corpus_id")
    val native = corpusEmb.sparkSession.catalog.functionExists("graft_dot")
    def dotOf(a: String, b: String): Column =
      if (native) expr(s"graft_dot($a, $b)") else dot(col(a), col(b))
    def withNorm(df: DataFrame) =
      df.select(col("vec_id"), col("embedding").as("ev"))
        .withColumn("nv", sqrt(dotOf("ev", "ev")))
    cand
      .join(withNorm(newEmb).select(col("vec_id").as("new_id"),
        col("ev").as("ea"), col("nv").as("na")), Seq("new_id"))
      .join(withNorm(corpusEmb).select(col("vec_id").as("corpus_id"),
        col("ev").as("eb"), col("nv").as("nb")), Seq("corpus_id"))
      .select(col("new_id"), col("corpus_id"),
        (dotOf("ea", "eb") / (col("na") * col("nb"))).as("c"))
      .filter(col("c") >= tau)
      .select(col("new_id"), col("corpus_id"),
        (floor(col("c") * 10000 + 0.5) / 10000).as("cos_sim"))
      .orderBy("new_id", "corpus_id")
  }

  /** Cell-count ladder for the cluster-blocked family: targets ~1,000
    * vectors per Lloyd cell (the SemDeDup-paper operating point), so
    * within-cell candidate volume stays ~1,000·|C| instead of
    * |C|²/nlist. Floor 4 keeps tiny corpora meaningful; cap 4,096
    * bounds the broadcast centroid table at 4,096×dim doubles (~2 MB
    * at dim 64). The semDedup family only rides this FLAT ladder to
    * [[semFlatCellCap]] cells (~128k vectors) — past that its auto
    * path switches to [[semBalancedCells]] two-level blocking, whose
    * per-vector cost is ~2√cells instead of cells (see there). */
  def adaptiveNlist(n: Long): Int =
    math.max(4, math.min(4096, ((n + 999) / 1000).toInt))

  /** Balanced two-level cell sizing for the cluster-blocked dedup
    * family's scale path: k1 ≈ k2 ≈ √t so the composite (cell, sub)
    * key still covers the ~1,000-vectors-per-cell target t = ⌈n/1000⌉
    * cells, while per-vector assignment costs k1+k2 ≈ 2√t distance
    * evaluations instead of the flat ladder's t, and Lloyd training
    * runs at two √t-sized codebooks instead of one t-sized one. This
    * is the fix for the term the ×300 rung named (SCALE_r14 §5): with
    * flat cells ∝ n/1000, assignment+training is n²·c/1000 — quadratic
    * in the corpus — where the balanced split is ~n^1.5/√1000. Each
    * level caps at 4,096 (the [[adaptiveNlist]] broadcast bound),
    * carrying the operating point to 4,096² ≈ 16.8M effective cells
    * ≈ 16.8B vectors; past that, [[ivfResidual3Index]]'s third shared
    * codebook is the blocking to reach for. */
  def semBalancedCells(n: Long): (Int, Int) = {
    val t = math.max(1L, (n + 999) / 1000)
    val k1 = math.min(4096, math.ceil(math.sqrt(t.toDouble)).toInt)
    val k2 = math.min(4096, ((t + k1 - 1) / k1).toInt)
    (k1, k2)
  }

  /** Flat Lloyd cells up to this many target cells (~128k vectors at
    * the ~1,000/cell operating point); balanced residual-split cells
    * past it. At the cap the flat path's corpus×cells argmin is ~16M
    * joined rows — comfortably inside one stage — while the two-level
    * path is already ~5× cheaper one octave later. */
  private[graft] val semFlatCellCap = 128L

  /** Deterministic Lloyd cell assignment: (vec_id, cell) for every
    * corpus vector — the trained coarse quantizer of [[ivfTopKTrained]]
    * exposed as its own frame. Centroids are nlist-bounded and
    * broadcast; the argmin is a map-side partial agg over rounded
    * distances (cid tiebreak), so the exchange carries (id, cell) only.
    * Shared by [[semDedup]] and cluster-balanced sampling.
    *
    * `nlist = 0` (the default) sizes the cell count from the corpus via
    * [[adaptiveNlist]]. An explicit nlist ≤ 64 trains through the
    * oracle-replayable exact trainer (`Unsupervised.lloydCenters` — a
    * per-center expression chain, the path every pinned query uses);
    * larger or auto-chosen cell counts train through the join-based
    * trainer, which also caps the TRAINING frame at ~256 vectors per
    * centroid (deterministic hash-systematic subsample — standard IVF
    * practice; assignment still covers the full corpus). */
  def lloydAssign(emb: DataFrame, nlist: Int = 0,
      iters: Int = 5): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val k = if (nlist > 0) nlist else adaptiveNlist(emb.count())
    // auto mode that lands in exact-trainer range uses the same trainer
    // as an explicit nlist, so the two agree wherever they overlap
    val centers =
      if (k <= 64) graft.ml.Unsupervised.lloydCenters(spark, emb, k, iters)._1
      else lloydCentersJoin(emb, k, iters)
    val cents = broadcast(centers.zipWithIndex.toSeq
      .map { case (c, i) => (i.toLong, c.toSeq) }.toDF("cid", "cv"))
    // same rounded-distance argmin as the trained-IVF assignment — the
    // equivalence to the oracle's LIST_DISTANCE is already proven by
    // llm_ann_ivf_trained; codegen'd kernel when registered (r10)
    val d6i = floor(euclidExpr(spark, "ce", "cv") * 1e6 + 0.5).cast("long")
    emb
      .select(col("vec_id"), col("embedding").as("ce"))
      .join(cents)
      .groupBy("vec_id")
      .agg(min(packedArgmin(d6i, col("cid"))).as("mp"))
      .select(col("vec_id"), unpackId(col("mp")).as("cell"))
      .localCheckpoint()
  }

  /** Join-based Lloyd trainer for cell counts past the exact trainer's
    * expression-chain range (`lloydCenters` builds an O(k) `when`
    * chain — fine at the pinned k≤8, codegen-hostile at k=4096).
    * Everything is joins + aggregations: assignment is a broadcast
    * centroid join with a rounded-distance argmin agg, the update a
    * (cluster, dim)-keyed mean. Deterministic end to end: id-ordered
    * init, 1e-6-rounded means (the exact trainer's discipline), and a
    * hash-systematic training subsample (`xxhash64(vec_id) % m = 0`,
    * never `DataFrame.sample`, whose output depends on partition
    * layout) capped at ~256 vectors per centroid. Driver state is the
    * k×dim center table (~2 MB at the 4,096 cap) — never corpus-sized. */
  private[graft] def lloydCentersJoin(emb: DataFrame, k: Int,
      iters: Int, nKnown: Long = -1L): Array[Array[Double]] = {
    val spark = emb.sparkSession
    import spark.implicits._
    def r6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6
    // nKnown must be emb's EXACT row count when passed (it sizes the
    // hash-systematic training subsample — an approximate count could
    // change the sample and therefore the trained centers); callers in
    // the residual-index family know it because every residual frame is
    // one row per corpus vector (r15 opt round: each skipped count was
    // a full scan job of a checkpointed array frame)
    val n = if (nKnown >= 0) nKnown else emb.count()
    val m = math.max(1L, n / (256L * k))
    val train =
      (if (m > 1) emb.filter(xxhash64(col("vec_id")) % m === 0) else emb)
        .select(col("vec_id"),
          transform(col("embedding"), v => v.cast("double")).as("x"))
        .localCheckpoint()
    // Number, not Float: the residual second level ([[ivfResidualIndex]])
    // trains on array<double> residual frames through this same trainer
    var centers: Array[Array[Double]] = emb.orderBy("vec_id").limit(k)
      .select("embedding").collect()
      .map(_.getSeq[Number](0).map(f => r6(f.doubleValue)).toArray)
    for (_ <- 1 to iters) {
      val cents = broadcast(centers.zipWithIndex.toSeq
        .map { case (c, i) => (i.toLong, c.toSeq) }.toDF("cid", "cv"))
      val d6i =
        floor(euclidExpr(spark, "x", "cv") * 1e6 + 0.5).cast("long")
      val assigned = train.join(cents)
        .groupBy("vec_id")
        .agg(min(packedArgmin(d6i, col("cid"))).as("mp"))
        // payload rejoins by id after the fixed-width argmin
        .join(train, Seq("vec_id"))
        .select(unpackId(col("mp")).as("cid"), col("x"))
      val means = assigned
        .select(col("cid"), posexplode(col("x")).as(Seq("p", "v")))
        .groupBy("cid", "p").agg(avg("v").as("v"))
        .collect()
      val next = centers.map(_.clone())
      means.foreach { r =>
        next(r.getLong(0).toInt)(r.getInt(1)) = r6(r.getDouble(2))
      }
      centers = next // clusters with no training member keep their center
    }
    centers
  }

  /** Residual-split ladder past the [[adaptiveNlist]] 4,096-cell cap
    * (round-10 directive #4 — the rung SCALE_r9 §Remaining bounds named
    * but did not build): the number of SHARED residual subcells so that
    * nlist × nsplit keeps ~1,000 vectors per EFFECTIVE cell once the
    * coarse level saturates. 1 (no split) below ~4.1M vectors; capped at
    * 256, which bounds the second broadcast at 256×dim doubles and
    * carries the ~1,000/cell operating point to ~1B vectors. */
  def adaptiveNsplit(n: Long): Int = {
    val targetCells = (n + 999) / 1000
    math.max(1, math.min(256, ((targetCells + 4095) / 4096).toInt))
  }

  /** Third-level companion of [[adaptiveNsplit]] (round 11 — the last
    * named engine ceiling, SCALE_r10 §Remaining bounds): once the
    * two-level key saturates at nlist×nsplit = 4096×256 ≈ 1M effective
    * cells (~1B vectors at the ~1,000/cell operating point), a THIRD
    * shared residual codebook keeps refining. 1 (no third level) below
    * ~1B vectors; capped at 256, carrying the operating point to
    * ~268B vectors — past any corpus this engine targets. */
  def adaptiveNsplit3(n: Long): Int = {
    val targetCells = (n + 999) / 1000
    math.max(1, math.min(256,
      ((targetCells + 4096L * 256 - 1) / (4096L * 256)).toInt))
  }

  /** Two-level IVF residual index — the FAISS residual-quantizer second
    * blocking level: level 1 is the trained coarse quantizer (the
    * [[lloydAssign]] kernels), level 2 is ONE SHARED residual codebook —
    * nsplit centroids trained on (x − c1[cell]) residuals — so the
    * effective cell key `(cell, sub)` partitions the corpus into up to
    * nlist×nsplit cells while broadcast/driver state stays two bounded
    * center tables (nlist×dim + nsplit×dim doubles), never
    * nlist×nsplit×dim. Sharing the residual codebook across cells is
    * what makes the second level trainable as one distributed Lloyd run
    * instead of nlist driver-side fits.
    *
    * Returns (coarse `(cid, cv)`, residual `(sid, sv)`, assign
    * `(neighbor_id, ce, cell, sub)`) — the same persistable-frames
    * contract as [[ivfIndex]]; write `assign` partitioned by
    * `(cell, sub)` and probes partition-prune exactly as there.
    *
    * Scale shape: both argmins are map-side partial aggs against
    * broadcast centers (the exchange carries ids+cells only); the
    * corpus-sized coarse argmin fans out when compute-bound, the same
    * guard as [[ivfIndex]]. Everything is rounded-distance/id-tiebreak
    * deterministic, so the whole two-level build is engine-replicable. */
  def ivfResidualIndex(corpus: DataFrame, nlist: Int = 0, nsplit: Int = 0,
      iters: Int = 5, nKnown: Long = -1L): (DataFrame, DataFrame, DataFrame) = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val n = if (nKnown >= 0) nKnown else corpus.count()
    val k1 = if (nlist > 0) nlist else adaptiveNlist(n)
    val k2 = if (nsplit > 0) nsplit else adaptiveNsplit(n)
    val c1 =
      if (k1 <= 64)
        graft.ml.Unsupervised.lloydCenters(spark, corpus, k1, iters)._1
      else lloydCentersJoin(corpus, k1, iters, n)
    val cents1 = broadcast(c1.zipWithIndex.toSeq
      .map { case (c, i) => (i.toLong, c.toSeq) }.toDF("cid", "cv"))
    val d6i = floor(euclidExpr(spark, "ce", "cv") * 1e6 + 0.5).cast("long")
    // compute-guarded fan-out, same threshold as ivfIndex: the coarse
    // argmin is the corpus-sized job and a narrow parquet scan would
    // otherwise run it on a few cores
    val spread =
      if (n * k1.toLong > 4000000L) Dedup.fanOut(corpus) else corpus
    // ONE checkpoint carries the assignment AND the residual against the
    // assigned coarse center (doubles end to end) — the residual used to
    // be a second materialization pass re-reading the coarse checkpoint
    // (r15 opt round; identical zip_with arithmetic, same inputs)
    val coarseR = spread
      .select(col("vec_id").as("neighbor_id"), col("embedding").as("ce"))
      .join(cents1)
      .groupBy("neighbor_id")
      .agg(min(packedArgmin(d6i, col("cid"))).as("mp"))
      // payload rejoins by id after the fixed-width argmin (packedArgmin)
      .join(corpus.select(col("vec_id").as("neighbor_id"),
        col("embedding").as("ce")), Seq("neighbor_id"))
      .select(col("neighbor_id"), col("ce"), unpackId(col("mp")).as("cell"))
      .join(cents1, col("cell") === col("cid"))
      .select(col("neighbor_id"), col("ce"), col("cell"),
        zip_with(transform(col("ce"), v => v.cast("double")), col("cv"),
          (x, c) => x - c).as("resid"))
      .localCheckpoint()
    val coarse = coarseR.select(col("neighbor_id"), col("ce"), col("cell"))
    val resid = coarseR.select(col("neighbor_id").as("vec_id"),
      col("resid").as("embedding"))
    // resid is one row per corpus vector, so its count is n — pass it
    // through instead of re-scanning the checkpoint
    val c2 = lloydCentersJoin(resid, k2, iters, n)
    val cents2 = broadcast(c2.zipWithIndex.toSeq
      .map { case (c, i) => (i.toLong, c.toSeq) }.toDF("sid", "sv"))
    val rd6i =
      floor(euclidExpr(spark, "embedding", "sv") * 1e6 + 0.5).cast("long")
    val sub = resid.join(cents2)
      .groupBy("vec_id")
      .agg(min(packedArgmin(rd6i, col("sid"))).as("ms"))
      .select(col("vec_id").as("neighbor_id"), unpackId(col("ms")).as("sub"))
    val assign = coarse.join(sub, Seq("neighbor_id"))
      .select(col("neighbor_id"), col("ce"), col("cell"), col("sub"))
    (cents1, cents2, assign)
  }

  /** Probe a two-level [[ivfResidualIndex]]: queries route to their
    * nProbe nearest coarse cells, then — per probed cell, against the
    * residual q − c1[cell] — to the nProbeSub nearest residual subcells,
    * and candidates meet on the composite `(cell, sub)` key: expected
    * candidate volume |Q|·nProbe·nProbeSub·|C|/(nlist·nsplit). The rank
    * stage is identical to [[ivfTopKIndexed]] (rounded-dot window,
    * neighbor-id tiebreak).
    *
    * Default operating point (8, 3): measured recall@5 on the ×30
    * past-cap geometry model (n = 60k, nlist = 20, nsplit = 3 —
    * graft.tools.ResidualRecall, round 11) is 0.87 at (8, 3) vs 0.62
    * at the former (4, 2) default, which sat under the 0.8 deployment
    * bar. The sweep shows coarse routing dominates the loss —
    * exhaustive subs at nProbe = 4 still only reach 0.72 — so widening
    * spends its candidate budget on nProbe first; at matched budget,
    * narrow-coarse/exhaustive-sub (4,3) edges out wide-coarse/partial
    * (6,2), 0.722 vs 0.692. */
  /** The two-stage probe routing alone — the `(query_id, qe, cell,
    * sub)` keys [[ivfResidualTopKIndexed]] scores against: nProbe
    * nearest coarse cells per query, then per probed cell the
    * nProbeSub nearest residual subcells of q − c1[cell]. Exposed so
    * measurement tooling can count the deterministic candidate volume
    * (probed-subcell populations) without re-deriving the routing. */
  private[graft] def residualProbeKeys(queries: DataFrame,
      cents1: DataFrame, cents2: DataFrame,
      nProbe: Int, nProbeSub: Int): DataFrame = {
    val spark = queries.sparkSession
    val c1 = broadcast(cents1.select(col("cid"), col("cv")))
    val c2 = broadcast(cents2.select(col("sid"), col("sv")))
    val qd6 = floor(euclidExpr(spark, "qe", "cv") * 1e6 + 0.5) / 1e6
    val qCells = queries
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"))
      .join(c1)
      .select(col("query_id"), col("qe"), col("cid"), col("cv"),
        qd6.as("d"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("query_id").orderBy(col("d"), col("cid"))))
      .filter(col("rn") <= nProbe)
      .select(col("query_id"), col("qe"), col("cid").as("cell"),
        zip_with(transform(col("qe"), v => v.cast("double")), col("cv"),
          (x, c) => x - c).as("qr"))
    val sd6 = floor(euclidExpr(spark, "qr", "sv") * 1e6 + 0.5) / 1e6
    qCells.join(c2)
      .select(col("query_id"), col("qe"), col("cell"), col("sid"),
        sd6.as("d"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("query_id", "cell")
          .orderBy(col("d"), col("sid"))))
      .filter(col("rn") <= nProbeSub)
      .select(col("query_id"), col("qe"), col("cell"),
        col("sid").as("sub"))
  }

  def ivfResidualTopKIndexed(queries: DataFrame, cents1: DataFrame,
      cents2: DataFrame, assign: DataFrame, k: Int,
      nProbe: Int = 8, nProbeSub: Int = 3,
      staticPrune: Boolean = false): DataFrame = {
    val spark = queries.sparkSession
    val qSubs = residualProbeKeys(queries, cents1, cents2,
      nProbe, nProbeSub)
    // stored-index deployment path, identical contract to
    // [[ivfTopKIndexed]]'s staticPrune: the probed composite keys
    // (bounded by |Q|·nProbe·nProbeSub, and by nlist·nsplit overall)
    // collect and apply as LITERAL partition filters, so a
    // partitionBy("cell", "sub") index provably reads only the probed
    // subcells' files
    val qSubsP = if (staticPrune) qSubs.localCheckpoint() else qSubs
    val probeTarget = if (staticPrune) {
      // ONE set-membership filter on a packed composite key, not an OR
      // chain: keys.map(===).reduce(_ || _) built a left-deep tree with
      // one conjunction per probed (cell, sub) key — bounded by
      // |Q|·nProbe·nProbeSub (and nlist·nsplit ≈ 1M overall), deep
      // enough to stall or stack-overflow Catalyst on exactly the
      // large-index path this flag exists for — and threw on an empty
      // query batch. Cells and subs are dense center indexes
      // (< nlist ≤ 4096, < nsplit ≤ 256), so cell·2^33 + sub packs
      // collision-free in a Long; the expression references only the
      // two partition columns, so file-source partition pruning still
      // applies, and the (cell, sub) equi-join below stays the exact
      // filter either way.
      val keys = qSubsP.select("cell", "sub").distinct()
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      // pack-budget guard (r11 advice): the packed filter is only
      // collision-free for cell < 2^30 (the shift would overflow past
      // that) and sub < 2^33. The exact equi-join below would still
      // return correct rows on a collision, but the partition pruning
      // this flag exists for would silently read extra files — fail
      // loudly instead, like packedArgmin's id guard. The keys are
      // already on the driver, so the check is free.
      keys.foreach { case (c, s) =>
        require(c >= 0 && c < (1L << 30) && s >= 0 && s < (1L << 33),
          s"staticPrune packed key out of budget: cell=$c (< 2^30), " +
            s"sub=$s (< 2^33) — rebuild the index with nlist/nsplit " +
            "inside the pack's bit budget")
      }
      if (keys.isEmpty) assign.limit(0)
      else assign.filter((col("cell") * lit(1L << 33) + col("sub"))
        .isInCollection(keys.map { case (c, s) => c * (1L << 33) + s }))
    } else assign
    val scored = qSubsP.join(probeTarget, Seq("cell", "sub"))
      .select(col("query_id"), col("neighbor_id"),
        dotExpr(spark, "qe", "ce").as("raw_dot"))
      .select(col("query_id"), col("neighbor_id"), col("raw_dot"),
        (floor(col("raw_dot") * 1e6 + 0.5) / 1e6).as("dot6"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("dot6").desc, col("neighbor_id"))
    scored
      .select(col("query_id"), col("neighbor_id"),
        row_number().over(w).as("rank"),
        (floor(col("raw_dot") * 10000 + 0.5) / 10000).as("sim"))
      .filter(col("rank") <= k)
      .orderBy("query_id", "rank")
  }

  /** Persist an [[ivfResidualIndex]] as its deployment layout: both
    * center tables, `assign` PARTITIONED BY (cell, sub) — so a
    * staticPrune probe reads only the probed subcells' files — and the
    * same one-row kernel `meta` contract as [[ivfIndexWrite]]. */
  def ivfResidualIndexWrite(cents1: DataFrame, cents2: DataFrame,
      assign: DataFrame, dir: String): Unit = {
    val spark = cents1.sparkSession
    import spark.implicits._
    cents1.write.mode("overwrite").parquet(s"$dir/centroids")
    cents2.write.mode("overwrite").parquet(s"$dir/subcentroids")
    assign.write.mode("overwrite").partitionBy("cell", "sub")
      .parquet(s"$dir/assign")
    Seq(kernelId(spark)).toDF("kernel")
      .write.mode("overwrite").parquet(s"$dir/meta")
  }

  /** Load a persisted two-level index, FAILING LOUDLY on a kernel
    * mismatch — same contract and reason as [[ivfIndexRead]]. */
  def ivfResidualIndexRead(spark: org.apache.spark.sql.SparkSession,
      dir: String): (DataFrame, DataFrame, DataFrame) = {
    val stored = spark.read.parquet(s"$dir/meta")
      .select("kernel").head().getString(0)
    val here = kernelId(spark)
    require(stored == here,
      s"residual IVF index at $dir was built with distance kernel " +
        s"'$stored' but this session resolves '$here'; probing with a " +
        "different kernel can silently disagree with the stored cell " +
        "assignment. Register GraftExtensions (or rebuild the index) so " +
        "build and probe share one kernel.")
    (spark.read.parquet(s"$dir/centroids"),
      spark.read.parquet(s"$dir/subcentroids"),
      spark.read.parquet(s"$dir/assign"))
  }

  /** Build + probe fused, the [[ivfTopK]] shape at two levels. */
  def ivfResidualTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      nlist: Int = 0, nsplit: Int = 0, nProbe: Int = 8,
      nProbeSub: Int = 3, iters: Int = 5): DataFrame = {
    val (c1, c2, assign) = ivfResidualIndex(corpus, nlist, nsplit, iters)
    ivfResidualTopKIndexed(queries, c1, c2, assign, k, nProbe, nProbeSub)
  }

  /** THREE-level residual index (round 11 — the rung past the two-level
    * key's ~1M-effective-cell saturation at ~1B vectors, the last named
    * engine ceiling): the [[ivfResidualIndex]] construction applied
    * once more — a third SHARED codebook (nsplit3 centroids, trained on
    * the level-2 residuals (x − c1[cell]) − c2[sub]) refines the
    * composite key to `(cell, sub, sub2)`, up to nlist×nsplit×nsplit3
    * effective cells with THREE bounded center tables; `adaptiveNsplit3`
    * engages past ~1B vectors and carries the ~1,000/cell operating
    * point to ~268B. Build scale shape is unchanged: each level is one
    * broadcast-centroid argmin over a corpus-sized frame (the packed
    * fixed-width aggregate), plus one bounded Lloyd training on a
    * hash-systematic subsample. Deterministic end to end — the same
    * rounded-distance/id-tiebreak discipline at every level. */
  def ivfResidual3Index(corpus: DataFrame, nlist: Int = 0,
      nsplit: Int = 0, nsplit3: Int = 0, iters: Int = 5)
      : (DataFrame, DataFrame, DataFrame, DataFrame) = {
    // count once; both the two-level prefix and the third-level trainer
    // need it (one row per corpus vector at every level)
    val n = corpus.count()
    val (c1, c2, a2) = ivfResidualIndex(corpus, nlist, nsplit, iters, n)
    ivfResidual3IndexFrom(corpus, c1, c2, a2, nsplit3, iters, n)
  }

  /** [[ivfResidual3Index]] continued from an ALREADY-BUILT two-level
    * index (cents1, cents2, level-2 assignment): the third-level
    * training/assignment is exactly the tail of the composed build, so
    * a caller that needs BOTH the two-level and three-level indexes of
    * one corpus (llm_ann_recall_all sweeps every variant) builds the
    * shared prefix once instead of twice (r14 opt round). `corpus` is
    * only consulted for its count when `nsplit3 = 0` (adaptive). */
  def ivfResidual3IndexFrom(corpus: DataFrame, c1: DataFrame,
      c2: DataFrame, a2: DataFrame, nsplit3: Int = 0, iters: Int = 5,
      nKnown: Long = -1L): (DataFrame, DataFrame, DataFrame, DataFrame) = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val n = if (nKnown >= 0) nKnown
      else if (nsplit3 > 0) -1L else corpus.count()
    val k3 = if (nsplit3 > 0) nsplit3 else adaptiveNsplit3(n)
    // level-2 residuals against BOTH assigned centers (doubles end to
    // end), rebuilt from the level-2 assignment — never materialized
    // per (cell, sub) pair
    val r2 = a2
      .join(broadcast(c1.select(col("cid"), col("cv"))),
        col("cell") === col("cid"))
      .join(broadcast(c2.select(col("sid"), col("sv"))),
        col("sub") === col("sid"))
      .select(col("neighbor_id").as("vec_id"),
        zip_with(
          zip_with(transform(col("ce"), v => v.cast("double")),
            col("cv"), (x, c) => x - c),
          col("sv"), (r, s) => r - s).as("embedding"))
      .localCheckpoint()
    // r2 is one row per corpus vector: pass n when known so the trainer
    // skips its own full-scan count of the checkpointed array frame
    val cents3 = broadcast(lloydCentersJoin(r2, k3, iters, n)
      .zipWithIndex.toSeq
      .map { case (c, i) => (i.toLong, c.toSeq) }.toDF("tid", "tv"))
    val td6i =
      floor(euclidExpr(spark, "embedding", "tv") * 1e6 + 0.5).cast("long")
    val sub2 = r2.join(cents3)
      .groupBy("vec_id")
      .agg(min(packedArgmin(td6i, col("tid"))).as("mt"))
      .select(col("vec_id").as("neighbor_id"), unpackId(col("mt")).as("sub2"))
    val assign = a2.join(sub2, Seq("neighbor_id"))
      .select(col("neighbor_id"), col("ce"), col("cell"), col("sub"),
        col("sub2"))
    (c1, c2, cents3, assign)
  }

  /** Probe a three-level [[ivfResidual3Index]]: the two-level routing
    * ([[residualProbeKeys]]) extends one stage — per probed
    * (cell, sub), the query's level-2 residual routes to its nProbeSub3
    * nearest third-level subcells — and candidates meet on the
    * composite `(cell, sub, sub2)` key. Expected candidate volume
    * |Q|·nProbe·nProbeSub·nProbeSub3·|C|/(nlist·nsplit·nsplit3); rank
    * stage identical to the whole family. */
  def ivfResidual3TopKIndexed(queries: DataFrame, cents1: DataFrame,
      cents2: DataFrame, cents3: DataFrame, assign: DataFrame, k: Int,
      nProbe: Int = 8, nProbeSub: Int = 3,
      nProbeSub3: Int = 2, staticPrune: Boolean = false): DataFrame = {
    val spark = queries.sparkSession
    val qSubs = residualProbeKeys(queries, cents1, cents2,
      nProbe, nProbeSub)
    val qr2 = qSubs
      .join(broadcast(cents1.select(col("cid"), col("cv"))),
        col("cell") === col("cid"))
      .join(broadcast(cents2.select(col("sid"), col("sv"))),
        col("sub") === col("sid"))
      .select(col("query_id"), col("qe"), col("cell"), col("sub"),
        zip_with(
          zip_with(transform(col("qe"), v => v.cast("double")),
            col("cv"), (x, c) => x - c),
          col("sv"), (r, s) => r - s).as("qr2"))
    val c3 = broadcast(cents3.select(col("tid"), col("tv")))
    val td6 = floor(euclidExpr(spark, "qr2", "tv") * 1e6 + 0.5) / 1e6
    val qSub2 = qr2.join(c3)
      .select(col("query_id"), col("qe"), col("cell"), col("sub"),
        col("tid"), td6.as("d"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("query_id", "cell", "sub")
          .orderBy(col("d"), col("tid"))))
      .filter(col("rn") <= nProbeSub3)
      .select(col("query_id"), col("qe"), col("cell"), col("sub"),
        col("tid").as("sub2"))
    // stored-index deployment path, the family's staticPrune contract
    // (same empty-batch short-circuit + single packed-key set filter as
    // [[ivfResidualTopKIndexed]] — the OR-chain form it replaced stalls
    // Catalyst at exactly the large-index sizes the flag exists for).
    // All three key components are dense center indexes (cell < nlist
    // ≤ 4096, sub/sub2 < 256 ≤ 2^13), so the 26/13-bit pack is
    // collision-free; the expression references only the three
    // partition columns, so file-source partition pruning applies, and
    // the composite equi-join below stays the exact filter either way.
    val qSub2P = if (staticPrune) qSub2.localCheckpoint() else qSub2
    val probeTarget = if (staticPrune) {
      val keys = qSub2P.select("cell", "sub", "sub2").distinct()
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      // pack-budget guard (r11 advice): the 26/13-bit pack is only
      // collision-free for sub/sub2 < 2^13 = 8192 and cell < 2^37; an
      // explicit nsplit/nsplit3 above the adaptive 256 cap could
      // otherwise collide — harmless for results (the composite
      // equi-join below is the exact filter) but it silently defeats
      // the partition pruning this flag exists for. Keys are already
      // on the driver, so the check is free.
      keys.foreach { case (c, s, t) =>
        require(c >= 0 && c < (1L << 37) &&
            s >= 0 && s < (1L << 13) && t >= 0 && t < (1L << 13),
          s"staticPrune packed key out of budget: cell=$c (< 2^37), " +
            s"sub=$s, sub2=$t (each < 2^13) — rebuild the index with " +
            "nsplit/nsplit3 inside the pack's bit budget")
      }
      if (keys.isEmpty) assign.limit(0)
      else assign.filter(
        (col("cell") * lit(1L << 26) + col("sub") * lit(1L << 13) +
          col("sub2")).isInCollection(keys.map { case (c, s, t) =>
          c * (1L << 26) + s * (1L << 13) + t }))
    } else assign
    val scored = qSub2P.join(probeTarget, Seq("cell", "sub", "sub2"))
      .select(col("query_id"), col("neighbor_id"),
        dotExpr(spark, "qe", "ce").as("raw_dot"))
      .select(col("query_id"), col("neighbor_id"), col("raw_dot"),
        (floor(col("raw_dot") * 1e6 + 0.5) / 1e6).as("dot6"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("dot6").desc, col("neighbor_id"))
    scored
      .select(col("query_id"), col("neighbor_id"),
        row_number().over(w).as("rank"),
        (floor(col("raw_dot") * 10000 + 0.5) / 10000).as("sim"))
      .filter(col("rank") <= k)
      .orderBy("query_id", "rank")
  }

  /** Build + probe fused at three levels. */
  def ivfResidual3TopK(queries: DataFrame, corpus: DataFrame, k: Int,
      nlist: Int = 0, nsplit: Int = 0, nsplit3: Int = 0,
      nProbe: Int = 8, nProbeSub: Int = 3, nProbeSub3: Int = 2,
      iters: Int = 5): DataFrame = {
    val (c1, c2, c3, assign) =
      ivfResidual3Index(corpus, nlist, nsplit, nsplit3, iters)
    ivfResidual3TopKIndexed(queries, c1, c2, c3, assign, k,
      nProbe, nProbeSub, nProbeSub3)
  }

  /** Persist an [[ivfResidual3Index]]: three center tables, `assign`
    * PARTITIONED BY (cell, sub, sub2), the same one-row kernel `meta`
    * contract as the rest of the family. */
  def ivfResidual3IndexWrite(cents1: DataFrame, cents2: DataFrame,
      cents3: DataFrame, assign: DataFrame, dir: String): Unit = {
    val spark = cents1.sparkSession
    import spark.implicits._
    cents1.write.mode("overwrite").parquet(s"$dir/centroids")
    cents2.write.mode("overwrite").parquet(s"$dir/subcentroids")
    cents3.write.mode("overwrite").parquet(s"$dir/subcentroids3")
    assign.write.mode("overwrite").partitionBy("cell", "sub", "sub2")
      .parquet(s"$dir/assign")
    Seq(kernelId(spark)).toDF("kernel")
      .write.mode("overwrite").parquet(s"$dir/meta")
  }

  /** Load a persisted three-level index, failing loudly on a kernel
    * mismatch — the family's contract ([[ivfIndexRead]]). */
  def ivfResidual3IndexRead(spark: org.apache.spark.sql.SparkSession,
      dir: String): (DataFrame, DataFrame, DataFrame, DataFrame) = {
    val stored = spark.read.parquet(s"$dir/meta")
      .select("kernel").head().getString(0)
    val here = kernelId(spark)
    require(stored == here,
      s"residual-3 IVF index at $dir was built with distance kernel " +
        s"'$stored' but this session resolves '$here'; probing with a " +
        "different kernel can silently disagree with the stored cell " +
        "assignment. Register GraftExtensions (or rebuild the index) so " +
        "build and probe share one kernel.")
    (spark.read.parquet(s"$dir/centroids"),
      spark.read.parquet(s"$dir/subcentroids"),
      spark.read.parquet(s"$dir/subcentroids3"),
      spark.read.parquet(s"$dir/assign"))
  }

  /** Cell assignment for the semDedup family — the routing layer over
    * the blocking ladder. An EXPLICIT `nlist` is the pinned-oracle
    * shape and always takes the flat [[lloydAssign]] path; auto
    * (`nlist = 0`) rides flat cells to [[semFlatCellCap]] target cells
    * and switches to [[semBalancedCells]] two-level blocking past it,
    * so the assignment+training term stays ~n^1.5/√1000 instead of the
    * flat ladder's n²/1000 (SCALE_r14 §5's named next ceiling). Both
    * paths return one (vec_id, cell) row per corpus vector with a
    * single equi-joinable cell key, so the pair kernel and the
    * diagnostics are blocking-agnostic. */
  private[graft] def semAssign(emb: DataFrame, nlist: Int,
      iters: Int): DataFrame =
    if (nlist > 0) lloydAssign(emb, nlist, iters)
    else {
      val n = emb.count()
      if ((n + 999) / 1000 <= semFlatCellCap)
        lloydAssign(emb, adaptiveNlist(n), iters)
      else {
        val (k1, k2) = semBalancedCells(n)
        twoLevelCells(emb, k1, k2, iters, n)
      }
    }

  /** The composite (cell, sub) two-level blocking key packed into the
    * single `cell` column the within-cell pair kernel blocks on —
    * sub < 2^16, so cell·2^16 + sub is injective. Deterministic end to
    * end (both levels are the rounded-distance / id-tiebreak Lloyd
    * kernels).
    *
    * LEAN build, deliberately NOT [[ivfResidualIndex]] (the persistable
    * ANN index): a first cut reused that build and measured 138.9 s at
    * 600k vectors vs 35.1 s for the FLAT 600-cell assignment it was
    * supposed to beat (quiet canaries both sides) — the index build's
    * constants are an oracle contract, not a blocking necessity: at
    * k1 ≤ 64 it trains through the exact oracle-replayable trainer
    * (full-corpus HOF expression chains, no native kernel, no
    * subsample), and it checkpoints two corpus-sized payload frames
    * (assignment with embeddings + materialized residuals). Blocking
    * needs none of that:
    *   - both codebooks train through the subsampled join trainer
    *     ([[lloydCentersJoin]] — native distance kernel, ≤256 training
    *     vectors per centroid); the residual codebook trains on the
    *     SAMPLE's residuals only, never a corpus-sized residual frame;
    *   - checkpoints carry (vec_id, cell) only, never the payload;
    *   - the second-level argmin runs against the k1·k2 COMBINED
    *     centers (wv = cv + sv: ||x−c−s|| ≡ ||x−(c+s)||), so residual
    *     vectors are never materialized per corpus row. The combined
    *     broadcast is k1·k2×dim doubles — ≤33 MB at dim 64 through
    *     256×256 cells (~65M vectors); past that the build switches to
    *     a materialized-residual second pass (ids + residual only) so
    *     broadcast state returns to two bounded center tables.
    * Measured A/B (quiet canaries, SCALE_r14 §7): 200k vectors 12.0 s
    * lean vs 12.6 flat (the crossover — the [[semFlatCellCap]] sits
    * just under it); 600k: 16.0 vs 39.1; 2M: 58.8 vs 323.1, the flat
    * path reading its n² signature (8.3× wall for 3.33× data) while
    * this build reads ~n^1.5 (3.7×). Occupancy and candidate volume
    * stay within 10% of flat at every point. */
  private[graft] def twoLevelCells(emb: DataFrame, k1: Int, k2: Int,
      iters: Int = 5, nKnown: Long = -1L): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val n = if (nKnown >= 0) nKnown else emb.count()
    val c1 = lloydCentersJoin(emb, k1, iters, n)
    val cents1 = broadcast(c1.zipWithIndex.toSeq
      .map { case (c, i) => (i.toLong, c.toSeq) }.toDF("cid", "cv"))
    val d6i = floor(euclidExpr(spark, "ce", "cv") * 1e6 + 0.5).cast("long")
    val spread1 =
      if (n * k1.toLong > 4000000L) Dedup.fanOut(emb) else emb
    val a1 = spread1
      .select(col("vec_id"), col("embedding").as("ce"))
      .join(cents1)
      .groupBy("vec_id")
      .agg(min(packedArgmin(d6i, col("cid"))).as("mp"))
      .select(col("vec_id"), unpackId(col("mp")).as("cell"))
      .localCheckpoint()
    // residual codebook: trained on the hash-systematic SAMPLE's
    // residuals (the join trainer's own cap, applied before the
    // residual projection, so the HOF zip_with touches ~256·k2 rows)
    val m2 = math.max(1L, n / (256L * k2))
    val sampResid = emb
      .filter(xxhash64(col("vec_id")) % m2 === 0)
      .join(a1, Seq("vec_id"))
      .join(cents1, col("cell") === col("cid"))
      .select(col("vec_id"),
        zip_with(transform(col("embedding"), v => v.cast("double")),
          col("cv"), (x, c) => x - c).as("embedding"))
    val c2 = lloydCentersJoin(sampResid, k2, iters)
    val spread2 =
      if (n * k2.toLong > 4000000L) Dedup.fanOut(emb) else emb
    val packed =
      if (k1.toLong * k2 <= 65536L) {
        // combined-centers argmin: one native-kernel pass, no residuals
        val comb = broadcast(
          (for { (cc, i) <- c1.zipWithIndex.toSeq
                 (sc, j) <- c2.zipWithIndex.toSeq }
            yield (i.toLong, j.toLong,
              cc.zip(sc).map { case (a, b) => a + b }.toSeq))
            .toDF("cell", "sid", "wv"))
        val sd6i =
          floor(euclidExpr(spark, "ce", "wv") * 1e6 + 0.5).cast("long")
        spread2
          .select(col("vec_id"), col("embedding").as("ce"))
          .join(a1, Seq("vec_id"))
          .join(comb, Seq("cell"))
          .groupBy("vec_id", "cell")
          .agg(min(packedArgmin(sd6i, col("sid"))).as("ms"))
      } else {
        // past the combined broadcast's 2^16-cell bound: materialize
        // (vec_id, cell, residual) once, argmin against the bounded
        // k2-row residual codebook
        val cents2 = broadcast(c2.zipWithIndex.toSeq
          .map { case (c, j) => (j.toLong, c.toSeq) }.toDF("sid", "sv"))
        val resid = spread2
          .join(a1, Seq("vec_id"))
          .join(cents1, col("cell") === col("cid"))
          .select(col("vec_id"), col("cell"),
            zip_with(transform(col("embedding"), v => v.cast("double")),
              col("cv"), (x, c) => x - c).as("re"))
          .localCheckpoint()
        val rd6i =
          floor(euclidExpr(spark, "re", "sv") * 1e6 + 0.5).cast("long")
        resid.join(cents2)
          .groupBy("vec_id", "cell")
          .agg(min(packedArgmin(rd6i, col("sid"))).as("ms"))
      }
    packed
      .select(col("vec_id"),
        (col("cell") * 65536 + unpackId(col("ms"))).as("cell"))
      .localCheckpoint()
  }

  /** Verified within-cell cosine pairs (doc_a < doc_b, cosine ≥ tau) —
    * the candidate kernel shared by [[semDedup]] and [[semDedupGroups]].
    * Candidates meet on the cell equi-key carrying ids only; embeddings
    * and once-computed norms rejoin per surviving candidate. */
  private def semDupPairs(assign: DataFrame, emb: DataFrame,
      tau: Double): DataFrame = {
    val native = emb.sparkSession.catalog.functionExists("graft_dot")
    def dotOf(a: String, b: String): Column =
      if (native) expr(s"graft_dot($a, $b)") else dot(col(a), col(b))
    val e = emb.select(col("vec_id"), col("embedding").as("ev"))
      .withColumn("nv", sqrt(dotOf("ev", "ev")))
    val ids = assign.select(col("cell"), col("vec_id"))
    val cand = ids.select(col("cell"), col("vec_id").as("doc_a"))
      .join(ids.select(col("cell"), col("vec_id").as("doc_b")), Seq("cell"))
      .filter(col("doc_a") < col("doc_b"))
    cand
      .join(e.select(col("vec_id").as("doc_a"), col("ev").as("ea"),
        col("nv").as("na")), Seq("doc_a"))
      .join(e.select(col("vec_id").as("doc_b"), col("ev").as("eb"),
        col("nv").as("nb")), Seq("doc_b"))
      // zero-norm vectors have no defined cosine — never duplicates
      // (also keeps ANSI mode from raising on the 0·0 divide)
      .filter(col("na") > 0 && col("nb") > 0)
      .select(col("doc_a"), col("doc_b"),
        (dotOf("ea", "eb") / (col("na") * col("nb"))).as("c"))
      .filter(col("c") >= tau)
      .select(col("doc_a"), col("doc_b"))
  }

  /** SemDeDup — semantic deduplication by cluster-blocked cosine pruning
    * (Abbas et al. 2023, "SemDeDup: Data-efficient learning at web-scale
    * through semantic deduplication"): k-means the embedding space, then
    * compare ONLY within each cluster and drop every vector that has a
    * lower-id cluster-mate above `tau` (low-id-wins keep rule — a total
    * order, so the keep set is deterministic and engine-replicable; for
    * the paper's one-representative-per-GROUP rule see
    * [[semDedupGroups]]). The cluster-blocked member of the dedup family
    * (exact / MinHash / SimHash / LSH-cosine / THIS). Returns one row
    * per corpus vector: (vec_id, cell, keep).
    *
    * Training reuses the deterministic Lloyd trainer that backs
    * [[ivfTopKTrained]] (1e-6-rounded iteration means, id-ordered init),
    * so clustering + assignment + pruning replay as ONE composed oracle
    * SQL statement.
    *
    * Scale shape: centroids are nlist-bounded and broadcast; assignment
    * is a map-side argmin (the exchange carries (id, cell) only); the
    * pair join is equi-keyed on `cell` — never all-pairs — and carries
    * ids only, embeddings rejoining once per candidate pair with norms
    * precomputed per vector. Within-cell candidates are the quadratic
    * term SemDeDup accepts by design; `nlist = 0` (the default) sizes
    * the cell count from the corpus via [[adaptiveNlist]] (~1,000
    * vectors per cell), so candidate volume stays ~1,000·|C| as the
    * corpus grows instead of |C|²/nlist at a pinned nlist — and past
    * [[semFlatCellCap]] cells the blocking switches to the balanced
    * two-level key ([[semAssign]]) so the assignment itself stays
    * subquadratic too. */
  def semDedup(emb: DataFrame, tau: Double, nlist: Int = 0,
      iters: Int = 5): DataFrame =
    semDedupFromAssign(semAssign(emb, nlist, iters), emb, tau)

  /** The low-id-wins keep rule over any (vec_id, cell) blocking — the
    * blocking-agnostic half of [[semDedup]], split out so the flat and
    * two-level cell paths share one verified kernel (and so specs can
    * drive the rule with a forced blocking). */
  private[graft] def semDedupFromAssign(assign: DataFrame, emb: DataFrame,
      tau: Double): DataFrame = {
    val dups = semDupPairs(assign, emb, tau)
      .select(col("doc_b").as("vec_id")).distinct()
    assign
      .join(dups.withColumn("dup", lit(true)), Seq("vec_id"), "left")
      .select(col("vec_id"), col("cell"), col("dup").isNull.as("keep"))
      .orderBy("vec_id")
  }

  /** Blocking-quality diagnostics for [[semDedup]]'s cell structure —
    * the three numbers that decompose its runtime (round-13 directive
    * #5: the ×100 ladder read the semdedup stage ~linear-in-vectors
    * with a within-cell verify term; THESE are the terms): `n_cells`
    * and `max_occupancy` of the Lloyd assignment, `candidate_pairs`
    * = Σ_cell n·(n−1)/2 (the quadratic-risk term the adaptive nlist
    * bounds — healthy growth is ~linear in |C| at ~1,000 vectors/cell),
    * and `verified_pairs` = candidates that pass the exact cosine ≥
    * `tau` check (the output term — data reality, not engine cost).
    * One row; every aggregate is cell- or pair-bounded. A production
    * pipeline runs this beside the dedup to catch occupancy skew (one
    * hot cell going quadratic) before it becomes a wall-clock incident. */
  def semDedupStats(emb: DataFrame, tau: Double, nlist: Int = 0,
      iters: Int = 5): DataFrame = {
    val assign = semAssign(emb, nlist, iters)
    val occ = assign.groupBy("cell").agg(count(lit(1)).as("n"))
    val cellStats = occ.agg(count(lit(1)).as("n_cells"),
      max("n").as("max_occupancy"),
      sum(col("n") * (col("n") - 1) / 2).cast("long")
        .as("candidate_pairs"))
    val verified = semDupPairs(assign, emb, tau)
      .agg(count(lit(1)).as("verified_pairs"))
    // 1-row × 1-row: the only cross join is between two scalar frames
    cellStats.crossJoin(verified)
  }

  /** [[semDedup]] with the paper-faithful keep rule: ONE representative
    * per connected duplicate GROUP (transitive closure of the verified
    * pair graph, minimum id as the canonical representative), not
    * per-pair low-id. The two differ on star-shaped groups — in
    * {1~5, 3~5}, the pairwise rule keeps 3 (its only mate is higher),
    * the group rule collapses all three to representative 1. Returns
    * one row per corpus vector: (vec_id, cell, keep_id); keep_id = own
    * id for vectors with no duplicate.
    *
    * The closure runs on `Dedup.minLabelComponents` — min-label
    * propagation to quiescence over the pair graph, which is orders of
    * magnitude smaller than the corpus. */
  def semDedupGroups(emb: DataFrame, tau: Double, nlist: Int = 0,
      iters: Int = 5): DataFrame = {
    val assign = semAssign(emb, nlist, iters)
    val comp = Dedup.minLabelComponents(semDupPairs(assign, emb, tau))
    assign
      .join(comp.withColumnRenamed("node", "vec_id"), Seq("vec_id"), "left")
      .select(col("vec_id"), col("cell"),
        coalesce(col("keep"), col("vec_id")).as("keep_id"))
      .orderBy("vec_id")
  }

  /** In-engine ANN quality evaluation: recall@k of an approximate top-k
    * result against the exact brute-force ranking — the measurement a
    * production ANN deployment runs continuously (the reference's KNN
    * verify is the same set-containment idea, `KNNRunner.scala:181-218`).
    * Both inputs carry (query_id, neighbor_id, rank≤k); output is one
    * row: mean per-query |approx ∩ exact| / k. Distributed as one
    * id-equi-join + two aggregations. */
  def recallAtK(approx: DataFrame, exact: DataFrame, k: Int): DataFrame = {
    val hits = approx.select(col("query_id"), col("neighbor_id"))
      .join(exact.select(col("query_id"), col("neighbor_id")),
        Seq("query_id", "neighbor_id"))
      .groupBy("query_id").agg(count(lit(1)).as("hit"))
    // integer hit sum + ONE final division: an averaged-doubles form
    // would expose cross-engine float summation order at the rounding
    // boundary; Σhit / (k·n) is exact until the single divide
    exact.select(col("query_id")).distinct()
      .join(hits, Seq("query_id"), "left")
      .agg(sum(coalesce(col("hit"), lit(0L))).as("hits"),
        count(lit(1)).as("n_queries"))
      .select(
        (floor(col("hits").cast("double") / (col("n_queries") * k) * 1e4
          + 0.5) / 1e4).as("recall_at_k"),
        col("n_queries"))
      // an empty exact side must fail visibly (0 rows), not emit a
      // plausible-looking row with a null recall — a misconfigured
      // evaluation otherwise reads as a metric
      .filter(col("n_queries") > 0)
  }

  /** Approximate neighbors via random-projection LSH buckets: join cost is
    * bounded by bucket co-occupancy instead of |Q|×|C|. Seeded, so output
    * is deterministic. Returns pairs within `maxDist` (euclidean). */
  def lshNeighbors(queries: DataFrame, corpus: DataFrame,
      maxDist: Double, bucketLength: Double = 2.0,
      numHashTables: Int = 3): DataFrame = {
    val toVec = (df: DataFrame) => df.select(col("vec_id"),
      array_to_vector(col("embedding")).as("features"))
    val lsh = new BucketedRandomProjectionLSH()
      .setInputCol("features").setOutputCol("buckets")
      .setBucketLength(bucketLength).setNumHashTables(numHashTables)
      .setSeed(42L)
    val model = lsh.fit(toVec(corpus))
    model.approxSimilarityJoin(toVec(queries), toVec(corpus), maxDist, "dist")
      .select(
        col("datasetA.vec_id").as("query_id"),
        col("datasetB.vec_id").as("neighbor_id"),
        (floor(col("dist") * 10000 + 0.5) / 10000).as("dist"))
      .orderBy("query_id", "neighbor_id")
  }
}
