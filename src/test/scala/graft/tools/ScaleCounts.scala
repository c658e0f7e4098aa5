package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.llm.{Dedup, Similarity}

/** Diagnostic companion to the round-9 scaling sweep (SCALE_r9.md):
  * prints, per corpus, the row counts that explain the runtime curve —
  * corpus size, LSH band-candidate volume, verified near-dup pairs,
  * and the embedding-blocking candidate volume. Distinguishes "runtime
  * grew because the OUTPUT grew" (data property) from "runtime grew
  * because the CANDIDATE stage is superlinear" (engine bug).
  *
  * Run: sbt "Test/runMain graft.tools.ScaleCounts <dir> [<dir> ...]"
  */
object ScaleCounts {

  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.1", "/tmp/stress/x3", "/tmp/stress/x10",
        "/tmp/stress/skew3")
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    dirs.foreach { d =>
      val docs = spark.read.parquet(s"$d/documents.parquet")
      val emb = spark.read.parquet(s"$d/embeddings.parquet")
      val nDocs = docs.count()
      val nEmb = emb.count()

      // replicate nearDupPairs' candidate stage (band-bucket self-join)
      val exploded = Dedup.minHash(docs, replicable = false)
        .select(col("doc_id"), explode(col("bands")).as("bucket"))
        .localCheckpoint()
      val bucketSizes = exploded.groupBy("bucket").agg(count(lit(1)).as("n"))
      val candVolume = bucketSizes
        .agg(sum((col("n") * (col("n") - 1) / 2).cast("long")).as("cand"))
        .head().getLong(0)
      val topBucket = bucketSizes.agg(max("n")).head().getLong(0)
      val pairs = Dedup.nearDupPairs(docs, shingleSize = 3, threshold = 0.5)
        .count()

      // embedding blocking candidate volume: the historic single-
      // projection key (h=1) vs the adaptive composite key the library
      // now picks for this corpus size
      def embStats(np: Int): (Long, Long) = {
        val eb = emb.select(col("vec_id"),
            explode(Similarity.signBucketsExpr(2.0, 3, 64, np)).as("tb"))
          .select(col("tb.t").as("t"), col("tb.b").as("b"))
          .groupBy("t", "b").agg(count(lit(1)).as("n"))
        (eb.agg(sum((col("n") * (col("n") - 1) / 2).cast("long")).as("c"))
          .head().getLong(0), eb.count())
      }
      val h = Similarity.adaptiveProjections(nEmb)
      val (cand1, bk1) = embStats(1)
      val (candH, bkH) = embStats(h)
      val embPairs = Similarity.cosineNearDupPairs(emb, tau = 0.4).count()

      println(s"DIAG dir=$d nDocs=$nDocs nEmb=$nEmb " +
        s"bandCand=$candVolume topBucket=$topBucket nearDupPairs=$pairs " +
        s"h=$h embCand_h1=$cand1/$bk1 embCand_adapt=$candH/$bkH " +
        s"embPairs=$embPairs")
    }
    spark.stop()
  }
}
