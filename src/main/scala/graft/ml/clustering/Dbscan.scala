package graft.ml.clustering

import org.apache.spark.graphx.{Edge, Graph}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Grid-partitioned distributed DBSCAN (SURVEY §2.B B21) — the reference
  * only exposes the kernel's parameter surface
  * (`ml/clustering/DBSCANRunner.scala:52-73`: epsilon, minPoints; output
  * point type {0 core, 1 border, −1 noise} + cluster label); this is an
  * independent grid implementation for 2-D spatial data:
  *
  *  1. bin points into eps-sized grid cells;
  *  2. candidate pairs = points in the same or one of the 8 adjacent
  *     cells (a self-join on the 9-cell neighborhood key — every true
  *     eps-pair falls in adjacent cells, so the join is exact);
  *  3. core points = neighbor count ≥ minPoints (self included, as in
  *     classic DBSCAN);
  *  4. clusters = connected components (GraphX) over core–core eps-edges;
  *  5. border points attach to the cluster of their nearest core
  *     neighbor; everything else is noise (−1).
  *
  * Scale: the only quadratic work is within 9-cell neighborhoods, so
  * skew follows data density, which AQE's skew-join handling splits.
  */
object Dbscan {

  /** points: (id, x, y). Returns (id, point_type, label):
    * point_type 0 = core, 1 = border, −1 = noise; label = cluster id
    * (min core id in the cluster) or −1. */
  def fitPredict(spark: SparkSession, points: DataFrame, eps: Double,
      minPoints: Int): DataFrame = {
    import spark.implicits._
    val cell = points
      .select(col("id"), col("x").cast("double"), col("y").cast("double"))
      .withColumn("cx", floor(col("x") / eps).cast("long"))
      .withColumn("cy", floor(col("y") / eps).cast("long"))
      .persist(StorageLevel.MEMORY_AND_DISK)

    // each point appears under its own cell and the 8 neighbors: joining
    // probe(cell) ⋈ home(cell) yields every pair within one cell ring
    val offsets = for { dx <- -1 to 1; dy <- -1 to 1 } yield (dx, dy)
    val probe = cell.withColumn("off", explode(typedLit(offsets)))
      .select(col("id").as("a"), col("x").as("ax"), col("y").as("ay"),
        (col("cx") + col("off._1")).as("kx"),
        (col("cy") + col("off._2")).as("ky"))
    val home = cell.select(col("id").as("b"), col("x").as("bx"),
      col("y").as("by"), col("cx").as("kx"), col("cy").as("ky"))
    val pairs = probe.join(home, Seq("kx", "ky"))
      .filter(pow(col("ax") - col("bx"), 2) + pow(col("ay") - col("by"), 2)
        <= eps * eps)
      .select(col("a"), col("b"))
      .persist(StorageLevel.MEMORY_AND_DISK)

    val counts = pairs.groupBy("a").agg(count(lit(1)).as("n")) // self included
    val core = counts.filter(col("n") >= minPoints).select(col("a").as("id"))
      .persist(StorageLevel.MEMORY_AND_DISK)

    // connected components over core-core eps-edges. Partition count
    // follows the edge volume: each Pregel superstep schedules a task
    // per partition across several stages, so a tiny core graph on 32
    // partitions pays ~1000 empty-task launches (~10 s fixed cost
    // regardless of data); size to ~100k edges/partition instead.
    val coreEdges = pairs
      .join(core.withColumnRenamed("id", "a"), Seq("a"))
      .join(core.withColumnRenamed("id", "b"), Seq("b"))
      .filter(col("a") =!= col("b"))
      .select("a", "b")
    val nParts = math.max(2, math.min(
      spark.sparkContext.defaultParallelism,
      (coreEdges.count() / 100000L).toInt + 1))
    val coreGraph = Graph.fromEdges(
      coreEdges.rdd.coalesce(nParts)
        .map(r => Edge(r.getLong(0), r.getLong(1), 1.0)), 1.0)
    val compRaw = org.apache.spark.graphx.lib.ConnectedComponents
      .run(coreGraph).vertices.toDF("id", "comp")
    // isolated cores (no core neighbor) form singleton clusters
    val comp = core.join(compRaw, Seq("id"), "left")
      .select(col("id"), coalesce(col("comp"), col("id")).as("label"))

    // border: non-core with ≥1 core neighbor — inherits min core label
    val borderLabel = pairs
      .join(core.withColumnRenamed("id", "b"), Seq("b"))
      .join(comp.withColumnRenamed("id", "b").withColumnRenamed("label", "bl"),
        Seq("b"))
      .join(core.withColumnRenamed("id", "a"), Seq("a"), "left_anti")
      .groupBy(col("a").as("id")).agg(min("bl").as("label"))

    val out = cell.select(col("id"))
      .join(comp.withColumn("point_type", lit(0)), Seq("id"), "left")
      .join(borderLabel.withColumnRenamed("label", "blabel"), Seq("id"), "left")
      .select(col("id"),
        when(col("point_type").isNotNull, 0)
          .when(col("blabel").isNotNull, 1).otherwise(-1).as("point_type"),
        coalesce(col("label"), col("blabel"), lit(-1L)).as("label"))
      .orderBy("id")
    // materialize, then release the working set — callers get a frame
    // with no pinned upstream blocks
    val result = out.localCheckpoint()
    cell.unpersist(false); pairs.unpersist(false); core.unpersist(false)
    coreGraph.unpersist(false)
    result
  }
}
