package graft.graph

import org.apache.spark.ml.feature.Word2Vec
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Node2Vec-style graph embeddings (SURVEY §2.C C22) — closed-source in
  * the reference (`Node2VecRunner.scala:86-91`); re-derived from Grover &
  * Leskovec 2016, simplified to first-order (p = q = 1) uniform walks.
  *
  * Walks are generated fully declaratively: `numWalks` walkers start at
  * every vertex; each step joins the walker frontier with a per-vertex
  * sorted neighbor array and picks index xxhash64(walk_id, step) mod
  * degree — deterministic, seedable, no driver loop over vertices. The
  * walk corpus then trains `ml.feature.Word2Vec` (skip-gram).
  */
object Node2Vec {

  def walks(spark: SparkSession, edges: DataFrame, numWalks: Int = 4,
      walkLength: Int = 6): DataFrame = {
    val nbrs = edges.select(col("src"), col("dst")).distinct()
      .groupBy("src").agg(array_sort(collect_set(col("dst"))).as("nbrs"))
      .localCheckpoint()
    var walkers = nbrs.select(col("src").as("cur"))
      .distinct()
      .crossJoin(spark.range(numWalks).select(col("id").as("walk")))
      .select(concat_ws("_", col("cur"), col("walk")).as("walk_id"),
        col("cur"), array(col("cur")).as("path"))
    var step = 0
    while (step < walkLength) {
      // broadcast the adjacency: each step becomes a map-side join (no
      // shuffle per hop). At a scale where adjacency exceeds broadcast
      // range, drop the hint and Catalyst falls back to a shuffle join.
      walkers = walkers.join(
          broadcast(nbrs.withColumnRenamed("src", "cur")), Seq("cur"), "left")
        .select(col("walk_id"),
          when(col("nbrs").isNotNull,
            element_at(col("nbrs"),
              (pmod(xxhash64(col("walk_id"), lit(step)), size(col("nbrs")))
                + 1).cast("int")))
            .otherwise(col("cur")).as("next"),
          col("path"))
        .select(col("walk_id"), col("next").as("cur"),
          concat(col("path"), array(col("next"))).as("path"))
      // truncate plan lineage periodically, not per hop
      if (step % 3 == 2) walkers = walkers.localCheckpoint()
      step += 1
    }
    walkers.select(col("walk_id"), col("path"))
  }

  /** Train embeddings over the walk corpus; output (node, dims 0..3
    * rounded) — a stable small projection of the vectors. */
  def embeddings(spark: SparkSession, edges: DataFrame, dim: Int = 16,
      numWalks: Int = 4, walkLength: Int = 6): DataFrame = {
    val corpus = walks(spark, edges, numWalks, walkLength)
      .select(transform(col("path"), v => v.cast("string")).as("sentence"))
    val w2v = new Word2Vec().setInputCol("sentence").setOutputCol("vec")
      .setVectorSize(dim).setMinCount(1).setSeed(2020L).setNumPartitions(1)
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
