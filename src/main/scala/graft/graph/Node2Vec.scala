package graft.graph

import org.apache.spark.ml.feature.Word2Vec
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Hints

/** Node2Vec graph embeddings (SURVEY §2.C C22) — closed-source in the
  * reference (`Node2VecRunner.scala:86-91`, whose signature carries the
  * p/q bias knobs, `:72-73`); re-derived from Grover & Leskovec 2016.
  *
  * Walks are generated fully declaratively: `numWalks` walkers start at
  * every vertex. Each step is relational — the walker frontier joins a
  * broadcast position-ranked edge list (one candidate row per neighbor),
  * candidates score the Grover–Leskovec second-order weights (1/p back
  * to prev, 1 if adjacent to prev via an equi-join flag, 1/q otherwise),
  * and a hash aggregate picks the winner per walker. Every operator is
  * whole-stage-codegen'd; the previous formulation folded nested
  * higher-order lambdas over neighbor arrays, which Catalyst evaluates
  * interpreted (CodegenFallback) — O(d_cur·d_prev) boxed evaluations per
  * walker-step made the sampler the slowest part of the suite.
  * Draws are deterministic per-(walker, step) hashes — no RNG state,
  * reruns are identical.
  */
object Node2Vec {

  /** Position-ranked capped out-neighbor table: (src, dst, pos, deg).
    * pos ranks neighbors ascending (the order the former sorted-array
    * formulation folded in); the `maxDegree` cap keeps the
    * lexicographically-smallest neighbors — the second-order candidate
    * set is O(d) rows per visit, so an uncapped 1e6-degree hub would
    * dominate every step at full scale. Deterministic, documented,
    * bounded. */
  private def rankedEdges(edges: DataFrame, maxDegree: Int): DataFrame = {
    // one WindowExec: rank and full degree share the (src, dst) sort —
    // the count needs an explicit whole-partition frame or it would
    // default to a running count over the rank's order
    val bySrc = Window.partitionBy("src").orderBy("dst")
    val whole = bySrc.rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    edges.select(col("src"), col("dst")).distinct()
      .withColumn("pos", row_number().over(bySrc))
      .withColumn("deg", least(count(lit(1)).over(whole), lit(maxDegree)))
      .filter(col("pos") <= maxDegree)
      .localCheckpoint()
  }

  /** Walker state hash-partitioned by walk_id ONCE — every subsequent
    * step is a broadcast join (preserves the partitioning) into a hash
    * aggregate whose walk_id distribution requirement is already
    * satisfied, so the whole walk loop runs without a single exchange.
    * The state is NARROW — (walk_id, cur, prev), all fixed-width — so
    * the per-step aggregate stays a codegen'd HashAggregate; paths are
    * assembled once at the end from the per-step snapshots (an array
    * column in the loop forced first(array) into a SortAggregate over
    * the full candidate explosion — the dominant walk cost). */
  private def startWalkers(spark: SparkSession, ce: DataFrame,
      numWalks: Int): DataFrame =
    ce.select(col("src").as("cur")).distinct()
      .crossJoin(spark.range(numWalks).select(col("id").as("walk")))
      .select(concat_ws("_", col("cur"), col("walk")).as("walk_id"),
        col("cur"), lit(null).cast("long").as("prev"))
      .repartition(col("walk_id"))

  /** Candidate frame for one step: one row per (walker, neighbor of
    * cur) with the neighbor's pos/deg and a prev-adjacency flag.
    * Dead-end walkers keep one row with null candidate columns (left
    * join), so the per-walker aggregate never loses them. Only the
    * NARROW state (walk_id, cur, prev) enters the explosion — the
    * growing path array must never be copied onto every candidate row
    * (deg× duplication through the join and agg was the dominant walk
    * cost: 16 s → 3 s at sf0.1 when the path moved to a post-agg
    * rejoin). The capped adjacency is O(V·maxDegree) rows — broadcast
    * only while `ceRows` is in range (the zero-exchange walk loop's fast
    * path); past the gate AQE shuffle-joins it and each step pays the
    * exchange a billion-vertex graph requires anyway. */
  private def candidates(walkers: DataFrame, ce: DataFrame,
      ceRows: Long): DataFrame =
    walkers.select("walk_id", "cur", "prev")
      .join(Hints.broadcastIfSmall(ce.withColumnRenamed("src", "cur"), ceRows),
        Seq("cur"), "left")
      .withColumnRenamed("dst", "x")
      .join(Hints.broadcastIfSmall(ce.select(col("src").as("prev"),
        col("dst").as("x"), lit(1).as("adjf")), ceRows), Seq("prev", "x"), "left")

  /** Fold the per-walker pick into ONE aggregate over the candidate
    * frame: the winner arrives via `pickAgg` and dead ends (null pick)
    * stay put. All agg inputs and buffers are fixed-width longs, so
    * this is a pure codegen'd HashAggregate that inherits the walker
    * partitioning — zero exchanges per step. */
  private def advance(cand: DataFrame, pickAgg: Column): DataFrame =
    cand.groupBy("walk_id")
      .agg(pickAgg.as("next"), first(col("cur")).as("cur0"))
      .select(col("walk_id"),
        coalesce(col("next"), col("cur0")).as("cur"), // dead end: stay
        col("cur0").as("prev"))

  /** Assemble (walk_id, path) from the per-step position snapshots: one
    * union (step count × |walkers| narrow rows) into ONE collect_list
    * aggregate — a single exchange for the whole walk, independent of
    * walk length. Steps are made contiguous by array_sort on (step,
    * node) structs. */
  private def assemblePaths(snapshots: Seq[DataFrame]): DataFrame =
    snapshots.reduce(_ unionByName _)
      .groupBy("walk_id")
      .agg(array_sort(collect_list(struct(col("step"), col("cur")))).as("sp"))
      .select(col("walk_id"),
        transform(col("sp"), s => s.getField("cur")).as("path"))

  def walks(spark: SparkSession, edges: DataFrame, numWalks: Int = 4,
      walkLength: Int = 6, p: Double = 1.0, q: Double = 1.0,
      maxDegree: Int = 10000): DataFrame = {
    val ce = rankedEdges(edges, maxDegree)
    val ceRows = ce.count() // cheap: ce is localCheckpoint'd
    var walkers = startWalkers(spark, ce, numWalks)
    val snapshots = Seq.newBuilder[DataFrame]
    snapshots += walkers.select(col("walk_id"), lit(0).as("step"), col("cur"))
    val secondOrder = p != 1.0 || q != 1.0
    var step = 0
    while (step < walkLength) {
      val cand = candidates(walkers, ce, ceRows)
      // uniform pick: the candidate whose pos the walker hash selects
      val uTarget = pmod(xxhash64(col("walk_id"), lit(step)), col("deg")) + 1
      val uniformPick = min(when(col("pos") === uTarget, col("x")))
      val pickCol =
        if (!secondOrder) uniformPick
        else {
          // Grover–Leskovec weights + the Efraimidis–Spirakis race:
          // P(argmin_x −ln(u_x)/w_x) = w_x/Σw — a single min-struct agg,
          // ties broken by ascending x (the former fold's array order)
          val w = when(col("x") === col("prev"), lit(1.0 / p))
            .when(col("adjf").isNotNull, lit(1.0))
            .otherwise(lit(1.0 / q))
          val u = (pmod(xxhash64(col("walk_id"), lit(step + 7919), col("x")),
            lit(1000003L)).cast("double") + 1.0) / 1000004.0
          val key = -log(u) / w
          // first hop has no prev (uniform)
          when(max(col("prev")).isNull, uniformPick)
            .otherwise(min(struct(key.as("key"), col("x"))).getField("x"))
        }
      // this state is referenced twice — by the next step's candidates
      // and by its path snapshot in the final union: persist makes the
      // second reference a cache read instead of re-deriving the chain
      // per branch. (Letting branches recompute hangs the DRIVER: each
      // branch fuses its whole depth-k chain into one giant codegen
      // method and janino compilation explodes — measured. Persisted
      // states are narrow 3-column rows, a few MB per step; the harness
      // clears caches between queries.)
      walkers = advance(cand, pickCol).persist()
      snapshots += walkers
        .select(col("walk_id"), lit(step + 1).as("step"), col("cur"))
      // lineage: six steps compile into ONE query whose repeated
      // broadcast builds dedupe via exchange reuse (a per-step
      // checkpoint forced 2 fresh 450k-row broadcast builds per hop —
      // 12.5 s of the former 20 s walk cost); checkpoint only often
      // enough to bound plan depth on long walks
      if (step % 6 == 5 && step != walkLength - 1)
        walkers = walkers.localCheckpoint()
      step += 1
    }
    assemblePaths(snapshots.result())
  }

  /** Engine-replicable biased-walk companion — the oracle-checkable side
    * of C22 (the [[walks]] sampler is already deterministic, but its
    * xxhash64 draw and −ln(u)/w race keys are not replayable outside the
    * JVM: xxhash64 isn't in DuckDB and log() rounding is libm-specific).
    * Here the per-(walker, step) draw is a SHA-256 hash and the
    * second-order pick is inverse-CDF over the Grover–Leskovec weights
    * with p, q POWERS OF TWO, so 1/p, 1, 1/q and every cumulative sum
    * are exactly representable and the crossing comparison is
    * bit-identical in any IEEE-754 engine — no transcendentals anywhere
    * in the pick. The cumulative sum is a window scan in pos order (the
    * same left-to-right sequence the former fold used; with exact sums
    * the order is immaterial anyway). Output: (walk_id, path
    * serialized). */
  def walksReplicable(spark: SparkSession, edges: DataFrame,
      numWalks: Int = 2, walkLength: Int = 6, p: Double = 2.0,
      q: Double = 0.5, maxDegree: Int = 10000): DataFrame = {
    require(math.getExponent(p) >= -30 && p == math.pow(2, math.getExponent(p)),
      "p must be a power of two for exact weight sums")
    require(q == math.pow(2, math.getExponent(q)),
      "q must be a power of two for exact weight sums")
    def shaH(c: Column): Column =
      conv(substring(sha2(c, 256), 1, 15), 16, 10).cast("long")
    val ce = rankedEdges(edges, maxDegree)
    val ceRows = ce.count() // cheap: ce is localCheckpoint'd
    var walkers = startWalkers(spark, ce, numWalks)
    val snapshots = Seq.newBuilder[DataFrame]
    snapshots += walkers.select(col("walk_id"), lit(0).as("step"), col("cur"))
    var step = 0
    while (step < walkLength) {
      val w = when(col("x") === col("prev"), lit(1.0 / p))
        .when(col("adjf").isNotNull, lit(1.0))
        .otherwise(lit(1.0 / q))
      val byWalk = Window.partitionBy("walk_id")
      val u = (pmod(shaH(concat_ws("|", col("walk_id"), lit(step))),
        lit(1000003L)).cast("double") + 1.0) / 1000004.0
      val cand = candidates(walkers, ce, ceRows)
        .withColumn("wv", w)
        .withColumn("cum", sum(col("wv")).over(byWalk.orderBy("pos")))
        .withColumn("t_draw", u * sum(col("wv")).over(byWalk))
      val uTarget = pmod(shaH(concat_ws("|", col("walk_id"), lit(step))),
        col("deg")) + 1
      val pickCol =
        when(max(col("prev")).isNull,
          min(when(col("pos") === uTarget, col("x"))))
          .otherwise(min(when(col("cum") >= col("t_draw"),
            struct(col("pos"), col("x")))).getField("x"))
      walkers = advance(cand, pickCol).persist()
      snapshots += walkers
        .select(col("walk_id"), lit(step + 1).as("step"), col("cur"))
      if (step % 6 == 5 && step != walkLength - 1)
        walkers = walkers.localCheckpoint()
      step += 1
    }
    assemblePaths(snapshots.result())
      .select(col("walk_id"), concat_ws(",", col("path")).as("path"))
      .orderBy("walk_id")
  }

  /** Train embeddings over the walk corpus; output (node, dims 0..3
    * rounded) — a stable small projection of the vectors. Word2Vec
    * trains with cluster-wide partitions (a single partition serializes
    * the whole corpus through one task — a scale-killer); run-to-run
    * stability comes from the fixed seed + deterministic walks + the
    * 1e-4 output rounding. */
  def embeddings(spark: SparkSession, edges: DataFrame, dim: Int = 16,
      numWalks: Int = 4, walkLength: Int = 6,
      p: Double = 1.0, q: Double = 1.0): DataFrame = {
    // materialize the walk corpus once: Word2Vec scans it several times
    // (vocab pass + training), and the walk query should not re-execute
    // per pass
    val corpus = walks(spark, edges, numWalks, walkLength, p, q)
      .select(transform(col("path"), v => v.cast("string")).as("sentence"))
      .localCheckpoint()
    // training partitions follow the corpus (~10k sentences each, capped
    // at the cluster width): each partition syncs a full parameter copy
    // per iteration, so 32 near-empty partitions cost 3x the training
    // time of 8 loaded ones at this scale — and one partition would
    // serialize the whole corpus through a single task at any scale
    val nParts = math.max(1, math.min(
      spark.sparkContext.defaultParallelism, (corpus.count() / 10000L).toInt))
    val w2v = new Word2Vec().setInputCol("sentence").setOutputCol("vec")
      .setVectorSize(dim).setMinCount(1).setSeed(2020L)
      .setNumPartitions(nParts)
      .fit(corpus)
    w2v.getVectors
      .select(col("word").cast("long").as("node"),
        org.apache.spark.ml.functions.vector_to_array(col("vector"))
          .as("v"))
      .select(col("node"),
        (floor(element_at(col("v"), 1) * 1e4 + 0.5) / 1e4).as("d0"),
        (floor(element_at(col("v"), 2) * 1e4 + 0.5) / 1e4).as("d1"),
        (floor(element_at(col("v"), 3) * 1e4 + 0.5) / 1e4).as("d2"),
        (floor(element_at(col("v"), 4) * 1e4 + 0.5) / 1e4).as("d3"))
      .orderBy("node")
  }
}
