package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.llm.Similarity

/** Stage-level timing probe for the IVF build/probe pair at a stress
  * corpus — separates scan / centroid broadcast / assignment argmin /
  * probe+rank so a regression pins to one stage instead of the whole
  * query. Run: sbt "Test/runMain graft.tools.IvfProbe <sfDir> [reps]" */
object IvfProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/stress/x30")
    val reps = args.drop(1).headOption.map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder()
      .withExtensions(new graft.GraftExtensions)
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"IVFPROBE $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }
    for (rep <- 1 to reps) {
      println(s"--- rep $rep")
      val e = graft.sources.Tables(spark, dir, "embeddings")
      t("scan.count")(e.count())
      val (cents, assign) = t("ivfIndex.plan")(Similarity.ivfIndex(e))
      t("cents.count")(cents.count())
      t("assign.count")(assign.count())
      t("full ivfTopK")(
        Similarity.ivfTopK(e.filter(col("vec_id") < 10), e, k = 5,
          nProbe = 4).count())
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
    spark.stop()
  }
}
