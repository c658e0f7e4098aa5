package graft.tools

import org.apache.spark.sql.SparkSession

/** Docs+embeddings replica writer for the big composition-ladder rungs
  * (×300 / ×1000): a thin runner over the ONE replication discipline in
  * `graft.sources.StressReplicas.writeDocsEmb` (batched append groups —
  * Catalyst analysis of a 1000-way union is superlinear in branch
  * count, so big rungs write in 100-replica groups).
  *
  * Usage: ReplicaGen <copies> <outDir> [baseDir=/root/testdata/sf0.1]
  */
object ReplicaGen {

  def main(args: Array[String]): Unit = {
    val copies = args(0).toInt
    val outDir = args(1)
    val baseDir = if (args.length > 2) args(2) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    graft.sources.StressReplicas.writeDocsEmb(
      spark, baseDir, outDir, copies)
    println(f"wrote x$copies docs+embeddings under $outDir " +
      f"(${(System.nanoTime() - t0) / 1e9}%.1f s)")
    spark.stop()
  }
}
