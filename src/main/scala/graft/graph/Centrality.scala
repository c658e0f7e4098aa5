package graft.graph

import org.apache.spark.graphx.Graph
import org.apache.spark.graphx.lib.ShortestPaths
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Centrality (SURVEY §2.C C17 betweenness, C18 closeness) — closed-source
  * kernels in the reference (`BetweennessRunner.scala:84-99`,
  * `ClosenessRunner.scala:102-110`); re-derived: sampled Brandes (2001)
  * for betweenness, sampled-landmark harmonic closeness.
  *
  * Both are sampling-based like the reference's knobs (`k`/`p` for
  * betweenness, `ratio` for closeness): exact all-pairs is O(V·E) and not
  * a 100 TB option; cost scales linearly with the source sample.
  */
object Centrality {

  private def r6(c: org.apache.spark.sql.Column) = floor(c * 1e6 + 0.5) / 1e6

  /** Harmonic closeness over a landmark sample: for each vertex, the mean
    * of 1/dist to the landmarks it reaches. `weighted = false` uses hop
    * distances (GraphX ShortestPaths); `weighted = true` runs a
    * multi-landmark weighted-SSSP Pregel where an edge's weight is its
    * traversal cost — the reference's `weighted` flag
    * (`ClosenessRunner.scala:25,44`). */
  def closeness(spark: SparkSession, g: Graph[Double, Double],
      landmarks: Seq[Long], weighted: Boolean = false): DataFrame = {
    import spark.implicits._
    val dists: org.apache.spark.rdd.RDD[(Long, Seq[(Long, Double)])] =
      if (!weighted)
        ShortestPaths.run(g, landmarks).vertices
          .map { case (v, m) =>
            (v, m.toSeq.map { case (l, d) => (l, d.toDouble) }) }
      else {
        val lm = landmarks.toSet
        // landmark→distance maps flow AGAINST edge direction (like
        // ShortestPaths), so each vertex learns its distance TO every
        // landmark it can reach along out-edges
        val init = g.mapVertices((v, _) =>
          if (lm(v)) Map(v -> 0.0) else Map.empty[Long, Double])
        def merge(a: Map[Long, Double], b: Map[Long, Double]) =
          (a.keySet ++ b.keySet).map(k =>
            k -> math.min(a.getOrElse(k, Double.MaxValue),
              b.getOrElse(k, Double.MaxValue))).toMap
        init.pregel(Map.empty[Long, Double])(
          (_, attr, msg) => merge(attr, msg),
          t => {
            val viaDst = t.dstAttr.map { case (l, d) => l -> (d + t.attr) }
            val improved = viaDst.filter { case (l, d) =>
              d < t.srcAttr.getOrElse(l, Double.MaxValue) }
            if (improved.nonEmpty) Iterator((t.srcId, improved))
            else Iterator.empty
          },
          merge).vertices.map { case (v, m) => (v, m.toSeq) }
      }
    dists
      .flatMap { case (v, m) =>
        // .toSeq first: mapping a Map to (v, _) pairs would collapse all
        // landmark entries onto the single key v
        m.filter { case (l, d) => l != v && d > 0 }
          .map { case (_, d) => (v, 1.0 / d) } }
      .toDF("node", "inv")
      .groupBy("node")
      .agg(r6(sum("inv") / landmarks.size).as("closeness"))
      .orderBy("node")
  }

  /** Sampled Brandes betweenness, all sources batched: one level-
    * synchronous forward pass computes (dist, σ = #shortest paths) keyed
    * by source, then dependencies δ accumulate backwards level by level:
    * δ(v) = Σ_{w ∈ succ(v)} σ_v/σ_w · (1 + δ_w).
    * Scores are sums over the sample (ordered-pair convention — on a
    * symmetric graph this is 2× the unordered value).
    * Batching makes the job count O(diameter), not O(|sources|·diameter);
    * each level is one join; lineage truncated per level. */
  def betweenness(spark: SparkSession, edges: DataFrame,
      sources: Seq[Long]): DataFrame = {
    import spark.implicits._
    // cached hash(src), not localCheckpoint'd: a cached plan KEEPS its
    // outputPartitioning while a checkpointed one comes back as a bare
    // LogicalRDD (probed on this Spark build, r14 opt round) — and e is
    // the join build side of EVERY forward level and every backward
    // level, so the preserved partitioning removes the e-side exchange
    // (the largest frame here) from ~2·diameter joins; only the small
    // per-level frontier/delta frames still shuffle.
    val e = edges.select(col("src"), col("dst")).distinct()
      .repartition(col("src")).cache()
    e.count()
    // per-level (dist, sigma) frames for the backward pass, plus ONE
    // accumulated checkpointed `seen` frame for the forward anti-join —
    // re-deriving seen as a union of every prior level frame made each
    // level's plan scan all previous levels again (O(diameter²) frame
    // scans on a high-diameter graph; flagged in round 3)
    var frames = Vector(sources.map(s => (s, s, 0, 1.0))
      .toDF("s", "node", "dist", "sigma").localCheckpoint())
    var frontier = frames.head
    var seen = frontier.select(col("s"), col("node").as("dst"))
      .localCheckpoint()
    var level = 0
    var more = frontier.limit(1).count() > 0
    while (more) {
      level += 1
      val next = frontier
        .join(e, frontier("node") === e("src"))
        .select(col("s"), col("dst"), col("sigma"))
        .join(seen, Seq("s", "dst"), "left_anti")
        .groupBy("s", "dst")
        .agg(sum("sigma").as("sigma"))
        .select(col("s"), col("dst").as("node"), lit(level).as("dist"),
          col("sigma"))
        .localCheckpoint()
      if (next.limit(1).count() > 0) {
        frames :+= next
        frontier = next
        seen = seen
          .unionByName(next.select(col("s"), col("node").as("dst")))
          .localCheckpoint()
      } else more = false
    }
    val maxLevel = frames.length - 1
    // backward pass: dependencies accumulate level-by-level, each level's
    // delta frame checkpointed once (the round-1 version re-materialized
    // the full (s, node) delta set every level)
    var deltas = Vector.fill[DataFrame](maxLevel + 1)(null)
    deltas = deltas.updated(maxLevel,
      frames(maxLevel).withColumn("delta", lit(0.0)).localCheckpoint())
    var d = maxLevel - 1
    while (d >= 0) {
      val wNodes = deltas(d + 1)
        .select(col("s").as("ws"), col("node").as("w"),
          col("sigma").as("sigma_w"), col("delta").as("delta_w"))
      val cur = frames(d)
      val contrib = cur
        .join(e, cur("node") === e("src"))
        .join(wNodes, e("dst") === wNodes("w") && cur("s") === wNodes("ws"))
        .groupBy(cur("s"), cur("node"))
        .agg(sum(col("sigma") / col("sigma_w") * (lit(1.0) + col("delta_w")))
          .as("dnew"))
      deltas = deltas.updated(d,
        cur.join(contrib, Seq("s", "node"), "left")
          .select(col("s"), col("node"), col("dist"), col("sigma"),
            coalesce(col("dnew"), lit(0.0)).as("delta"))
          .localCheckpoint())
      d -= 1
    }
    // every frame below is checkpointed, so nothing downstream reads e
    e.unpersist(blocking = false)
    deltas.map(_.select(col("s"), col("node"), col("delta")))
      .reduce(_ unionByName _)
      .filter(col("node") =!= col("s"))
      .groupBy("node").agg(r6(sum("delta")).as("betweenness"))
      .orderBy("node")
  }
}
