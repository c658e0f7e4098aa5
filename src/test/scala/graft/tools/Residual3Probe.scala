package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.llm.Similarity

/** Geometry-model measurement for the THIRD residual level (round 11):
  * a corpus of N vectors with nlist pinned to N/9000 puts 9,000 vectors
  * per coarse cell — the per-cell geometry of a corpus 9× past the
  * 4,096-cell cap, where even the two-level split (nsplit = 3) leaves
  * ~3,000 per composite cell. The third shared codebook (nsplit3 = 3)
  * must restore the ~1,000/cell operating point: evidence is the
  * deterministic within-cell pair volume Σ c·(c−1)/2 (the verify-join
  * driver) at one, two and three levels, plus the max effective cell.
  * Run: sbt "Test/runMain graft.tools.Residual3Probe <dir> [reps]" */
object Residual3Probe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/stress/x30")
    val reps = args.drop(1).headOption.map(_.toInt).getOrElse(2)
    val spark = SparkSession.builder()
      .withExtensions(new graft.GraftExtensions)
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // `clustered` runs the same deterministic 64-blob geometry as
    // ResidualRecall's clustered mode (round-11 directive #5: bracket
    // the three-level recall between the IVF-hostile uniform stress
    // corpus and realistic clustered geometry, like level 2's
    // [0.87, 1.00] bracket)
    val e =
      if (dir == "clustered") Corpora.clustered(spark).localCheckpoint()
      else graft.sources.Tables(spark, dir, "embeddings")
    val n = e.count()
    val nlist = math.max(4, (n / 9000L).toInt) // 9x-past-cap model
    println(s"RESIDUAL3 n=$n nlist=$nlist (9000/cell model) nsplit=3 nsplit3=3")

    def vol(df: org.apache.spark.sql.DataFrame, keys: Seq[String])
        : (Long, Long) = {
      val c = df.groupBy(keys.map(col): _*).count().localCheckpoint()
      (c.agg(sum(col("count") * (col("count") - 1))).head().getLong(0) / 2,
        c.agg(max("count")).head().getLong(0))
    }

    for (rep <- 1 to reps) {
      var t0 = System.nanoTime()
      val a1 = Similarity.lloydAssign(e, nlist)
      a1.count()
      val t1 = (System.nanoTime() - t0) / 1e9
      val (v1, m1) = vol(a1, Seq("cell"))
      t0 = System.nanoTime()
      val (_, _, a2) = Similarity.ivfResidualIndex(e, nlist, 3)
      a2.count()
      val t2 = (System.nanoTime() - t0) / 1e9
      val (v2, m2) = vol(a2, Seq("cell", "sub"))
      t0 = System.nanoTime()
      val (_, _, _, a3) = Similarity.ivfResidual3Index(e, nlist, 3, 3)
      a3.count()
      val t3 = (System.nanoTime() - t0) / 1e9
      val (v3, m3) = vol(a3, Seq("cell", "sub", "sub2"))
      println(f"RESIDUAL3 rep$rep one:   build=$t1%7.2f s pairVol=$v1%-12d maxCell=$m1%-6d")
      println(f"RESIDUAL3 rep$rep two:   build=$t2%7.2f s pairVol=$v2%-12d maxCell=$m2%-6d div=${v1.toDouble / v2}%5.2f")
      println(f"RESIDUAL3 rep$rep three: build=$t3%7.2f s pairVol=$v3%-12d maxCell=$m3%-6d div=${v1.toDouble / v3}%5.2f")
      if (rep == 1) {
        // recall@5 of the three-level probe at the deployment widths
        // against brute-force truth, on this geometry
        val (c1b, c2b, c3b, a3b) =
          Similarity.ivfResidual3Index(e, nlist, 3, 3)
        val q = e.filter(col("vec_id") < 100).localCheckpoint()
        val truth = Similarity.bruteForceTopK(q, e, 5).localCheckpoint()
        for ((p1, p2, p3) <- Seq((4, 2, 2), (8, 3, 2), (8, 3, 3))) {
          val rec = Similarity.recallAtK(
            Similarity.ivfResidual3TopKIndexed(q, c1b, c2b, c3b, a3b,
              k = 5, nProbe = p1, nProbeSub = p2, nProbeSub3 = p3),
            truth, 5).head().getDouble(0)
          println(f"RESIDUAL3 recall probe=($p1,$p2,$p3) recall@5=$rec%6.4f")
        }
      }
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
    spark.stop()
  }
}
