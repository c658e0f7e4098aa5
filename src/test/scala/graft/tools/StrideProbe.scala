package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.llm.Similarity

/** Stage-level A/B of two explicit IVF strides at one corpus: build
  * (index argmin) and probe timed separately, interleaved A/B/A/B so
  * host drift cannot masquerade as a stride effect.
  * Run: sbt "Test/runMain graft.tools.StrideProbe <dir> <strideA> <strideB> [reps]" */
object StrideProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/stress/x30")
    val sA = args.drop(1).headOption.map(_.toInt).getOrElse(124)
    val sB = args.drop(2).headOption.map(_.toInt).getOrElse(152)
    val reps = args.drop(3).headOption.map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder()
      .withExtensions(new graft.GraftExtensions)
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val e = graft.sources.Tables(spark, dir, "embeddings")
    e.count() // footer warm
    for (rep <- 1 to reps; s <- Seq(sA, sB)) {
      var t0 = System.nanoTime()
      val (cents, assign) = Similarity.ivfIndex(e, s)
      val nc = cents.count()
      val planBuild = (System.nanoTime() - t0) / 1e9
      t0 = System.nanoTime()
      val na = assign.count()
      val tAssign = (System.nanoTime() - t0) / 1e9
      t0 = System.nanoTime()
      val nr = Similarity.ivfTopKIndexed(e.filter(col("vec_id") < 10),
        cents, assign, k = 5, nProbe = 4).count()
      val tProbe = (System.nanoTime() - t0) / 1e9
      println(f"STRIDEPROBE rep$rep stride=$s%-5d cents=$nc%-6d " +
        f"assign=$na%-7d rows=$nr%-4d build=$planBuild%6.3f s " +
        f"assignCount=$tAssign%7.3f s probe=$tProbe%7.3f s")
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
    spark.stop()
  }
}
