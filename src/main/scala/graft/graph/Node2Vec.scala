package graft.graph

import org.apache.spark.ml.feature.Word2Vec
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Node2Vec graph embeddings (SURVEY §2.C C22) — closed-source in the
  * reference (`Node2VecRunner.scala:86-91`, whose signature carries the
  * p/q bias knobs, `:72-73`); re-derived from Grover & Leskovec 2016.
  *
  * Walks are generated fully declaratively: `numWalks` walkers start at
  * every vertex; each step joins the walker frontier with a broadcast
  * per-vertex sorted neighbor array. With p = q = 1 the next hop is a
  * uniform pick at index xxhash64(walk_id, step) mod degree. Otherwise
  * the full second-order transition runs: the walker also joins its
  * PREVIOUS vertex's neighbor array, scores every candidate x with the
  * Grover–Leskovec weights (1/p if x = prev, 1 if x adjacent to prev,
  * 1/q otherwise) and samples by inverse-CDF over a deterministic
  * per-(walker, step) hash draw — no RNG state, reruns are identical.
  * Everything is per-row expression work on broadcast-joined rows: no
  * shuffle per hop, no driver loop over vertices.
  */
object Node2Vec {

  def walks(spark: SparkSession, edges: DataFrame, numWalks: Int = 4,
      walkLength: Int = 6, p: Double = 1.0, q: Double = 1.0,
      maxDegree: Int = 10000): DataFrame = {
    // hub cap: the second-order step scores O(d_cur · d_prev) per walker
    // (candidate × prev-adjacency membership); an uncapped 1e6-degree hub
    // would cost 1e12 ops per visit at full scale. Keeping the `maxDegree`
    // lexicographically-smallest neighbors biases hub walks toward a
    // fixed subset — deterministic, documented, and bounded.
    val nbrs = edges.select(col("src"), col("dst")).distinct()
      .groupBy("src").agg(array_sort(collect_set(col("dst"))).as("nbrs"))
      .select(col("src"), slice(col("nbrs"), 1, maxDegree).as("nbrs"))
      .localCheckpoint()
    var walkers = nbrs.select(col("src").as("cur"))
      .distinct()
      .crossJoin(spark.range(numWalks).select(col("id").as("walk")))
      .select(concat_ws("_", col("cur"), col("walk")).as("walk_id"),
        col("cur"), lit(null).cast("long").as("prev"),
        array(col("cur")).as("path"))
    val secondOrder = p != 1.0 || q != 1.0
    var step = 0
    while (step < walkLength) {
      // broadcast the adjacency: each step becomes a map-side join (no
      // shuffle per hop). At a scale where adjacency exceeds broadcast
      // range, drop the hint and Catalyst falls back to a shuffle join.
      var joined = walkers.join(
        broadcast(nbrs.withColumnRenamed("src", "cur")), Seq("cur"), "left")
      val uniformPick = element_at(col("nbrs"),
        (pmod(xxhash64(col("walk_id"), lit(step)), size(col("nbrs"))) + 1)
          .cast("int"))
      val pick: Column =
        if (!secondOrder) uniformPick
        else {
          joined = joined.join(
            broadcast(nbrs.select(col("src").as("prev"),
              col("nbrs").as("pnbrs"))), Seq("prev"), "left")
          // Grover–Leskovec second-order weights, sampled in ONE pass by
          // the Efraimidis–Spirakis race: P(argmin_x −ln(u_x)/w_x = x)
          // = w_x/Σw, so no weight array, no total, no cumulative scan —
          // a nested-lambda inverse-CDF evaluated the weights three
          // times per row and tripled the step cost. u_x is a
          // deterministic per-(walker, step, candidate) hash in (0, 1].
          val sel = aggregate(
            col("nbrs"),
            struct(lit(Double.MaxValue).as("key"), lit(-1L).as("sel")),
            (acc, x) => {
              val w = when(x === col("prev"), lit(1.0 / p))
                .when(array_contains(
                  coalesce(col("pnbrs"), array().cast("array<bigint>")), x),
                  lit(1.0))
                .otherwise(lit(1.0 / q))
              val u = (pmod(xxhash64(col("walk_id"), lit(step + 7919), x),
                lit(1000003L)).cast("double") + 1.0) / 1000004.0
              val key = -log(u) / w
              when(key < acc.getField("key"),
                struct(key.as("key"), x.as("sel"))).otherwise(acc)
            },
            acc => acc.getField("sel"))
          // first hop has no prev (uniform)
          when(col("prev").isNull, uniformPick).otherwise(sel)
        }
      walkers = joined
        .select(col("walk_id"),
          when(col("nbrs").isNotNull, pick).otherwise(col("cur")).as("next"),
          col("cur"), col("path"))
        .select(col("walk_id"), col("next").as("cur"),
          col("cur").as("prev"),
          concat(col("path"), array(col("next"))).as("path"))
      // truncate plan lineage periodically, not per hop
      if (step % 3 == 2) walkers = walkers.localCheckpoint()
      step += 1
    }
    walkers.select(col("walk_id"), col("path"))
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
    * in the pick. Output: (walk_id, path serialized). */
  def walksReplicable(spark: SparkSession, edges: DataFrame,
      numWalks: Int = 2, walkLength: Int = 6, p: Double = 2.0,
      q: Double = 0.5, maxDegree: Int = 10000): DataFrame = {
    require(math.getExponent(p) >= -30 && p == math.pow(2, math.getExponent(p)),
      "p must be a power of two for exact weight sums")
    require(q == math.pow(2, math.getExponent(q)),
      "q must be a power of two for exact weight sums")
    def shaH(c: Column): Column =
      conv(substring(sha2(c, 256), 1, 15), 16, 10).cast("long")
    val nbrs = edges.select(col("src"), col("dst")).distinct()
      .groupBy("src").agg(array_sort(collect_set(col("dst"))).as("nbrs"))
      .select(col("src"), slice(col("nbrs"), 1, maxDegree).as("nbrs"))
      .localCheckpoint()
    var walkers = nbrs.select(col("src").as("cur")).distinct()
      .crossJoin(spark.range(numWalks).select(col("id").as("walk")))
      .select(concat_ws("_", col("cur"), col("walk")).as("walk_id"),
        col("cur"), lit(null).cast("long").as("prev"),
        array(col("cur")).as("path"))
    var step = 0
    while (step < walkLength) {
      val wOf = (x: Column) =>
        when(x === col("prev"), lit(1.0 / p))
          .when(array_contains(
            coalesce(col("pnbrs"), array().cast("array<bigint>")), x), lit(1.0))
          .otherwise(lit(1.0 / q))
      val u = (pmod(shaH(concat_ws("|", col("walk_id"), lit(step))),
        lit(1000003L)).cast("double") + 1.0) / 1000004.0
      val joined = walkers
        .join(broadcast(nbrs.withColumnRenamed("src", "cur")), Seq("cur"), "left")
        .join(broadcast(nbrs.select(col("src").as("prev"),
          col("nbrs").as("pnbrs"))), Seq("prev"), "left")
        // threshold once per row — a nested reference inside the fold
        // would re-evaluate the total per element (O(d²) per step)
        .withColumn("t_draw",
          u * aggregate(col("nbrs"), lit(0.0), (acc, x) => acc + wOf(x)))
      val sel = aggregate(
        col("nbrs"),
        struct(lit(0.0).as("cum"), lit(-1L).as("sel")),
        (acc, x) => {
          val cum2 = acc.getField("cum") + wOf(x)
          struct(cum2.as("cum"),
            when(acc.getField("sel") === -1L && cum2 >= col("t_draw"), x)
              .otherwise(acc.getField("sel")).as("sel"))
        },
        acc => acc.getField("sel"))
      val uniformPick = element_at(col("nbrs"),
        (pmod(shaH(concat_ws("|", col("walk_id"), lit(step))),
          size(col("nbrs"))) + 1).cast("int"))
      val pick = when(col("prev").isNull, uniformPick).otherwise(sel)
      walkers = joined
        .select(col("walk_id"),
          when(col("nbrs").isNotNull, pick).otherwise(col("cur")).as("next"),
          col("cur"), col("path"))
        .select(col("walk_id"), col("next").as("cur"),
          col("cur").as("prev"),
          concat(col("path"), array(col("next"))).as("path"))
      if (step % 3 == 2) walkers = walkers.localCheckpoint()
      step += 1
    }
    walkers.select(col("walk_id"), concat_ws(",", col("path")).as("path"))
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
    val corpus = walks(spark, edges, numWalks, walkLength, p, q)
      .select(transform(col("path"), v => v.cast("string")).as("sentence"))
    val w2v = new Word2Vec().setInputCol("sentence").setOutputCol("vec")
      .setVectorSize(dim).setMinCount(1).setSeed(2020L)
      .setNumPartitions(spark.sparkContext.defaultParallelism)
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
