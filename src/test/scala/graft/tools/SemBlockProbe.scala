package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.llm.Similarity

/** Direct A/B probe for the semDedup blocking ladder (SCALE_r14 §5's
  * named next ceiling): on one embeddings table, time the FLAT Lloyd
  * assignment (cells ∝ n/1000 — the pre-r14 auto path, per-vector cost
  * ∝ cells) against the balanced TWO-LEVEL key (`semAssign` auto past
  * `semFlatCellCap`, per-vector cost ∝ 2√cells), then the full
  * `semDedup` ride on the auto path. The chain rungs only cross the
  * 128k-vector cap at ×1000 (survivor sets are ~10–20% of the corpus),
  * so THIS probe is where the two paths meet the same full-size input.
  *
  * Each timed section prints wall seconds plus bracketing cpu_spin
  * canaries; structural counters (rows, distinct cells, keep count)
  * prove both paths cover the corpus. Usage:
  *
  *   SemBlockProbe <embDir> [flat] [ride]
  *
  * `flat` also times the flat path (skippable — at 2M vectors the flat
  * assignment is the quadratic term this probe exists to show, minutes
  * long). `ride` also times the full semDedup — opt-in because at a
  * RAW corpus the ~500·n candidate-verify join shuffles ~100 GB at
  * 600k vectors on one local disk (measured: filled 46 GB before this
  * probe was stopped). That volume is the SemDeDup design point
  * (distributed it's ~160 MB/executor at 1000 executors); the chain
  * rungs exercise the ride at realistic survivor fractions instead.
  */
object SemBlockProbe {

  private def timed[T](label: String)(body: => T): T = {
    val c0 = graft.Bench.cpuSpin()
    val t0 = System.nanoTime()
    val out = body
    val dt = (System.nanoTime() - t0) / 1e9
    println(f"[semblock] $label%-28s ${dt}%8.2f s  " +
      f"canary $c0%.3f/${graft.Bench.cpuSpin()}%.3f s")
    out
  }

  def main(args: Array[String]): Unit = {
    val embDir = args(0)
    val runFlat = args.contains("flat")
    val runRide = args.contains("ride")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .withExtensions(new graft.GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val emb = spark.read.parquet(s"$embDir/embeddings.parquet")
      .select("vec_id", "embedding").localCheckpoint()
    val n = emb.count()
    val flatK = Similarity.adaptiveNlist(n)
    val (k1, k2) = Similarity.semBalancedCells(n)
    println(s"[semblock] $embDir: $n vectors; flat nlist=$flatK, " +
      s"balanced ($k1, $k2)")

    val auto = timed("semAssign auto") {
      val a = Similarity.semAssign(emb, nlist = 0, iters = 5)
        .localCheckpoint()
      a.count(); a
    }
    val occ = auto.groupBy("cell").agg(count(lit(1)).as("o"))
      .agg(count(lit(1)), max("o"),
        sum(col("o") * (col("o") - 1) / 2).cast("long"))
      .head()
    println(s"[semblock] auto blocking: n_cells=${occ.getLong(0)} " +
      s"max_occupancy=${occ.getLong(1)} candidate_pairs=${occ.getLong(2)}")

    if (runFlat) {
      val flat = timed(s"lloydAssign flat k=$flatK") {
        val a = Similarity.lloydAssign(emb, flatK, iters = 5)
          .localCheckpoint()
        a.count(); a
      }
      val focc = flat.groupBy("cell").agg(count(lit(1)).as("o"))
        .agg(count(lit(1)), max("o"),
          sum(col("o") * (col("o") - 1) / 2).cast("long"))
        .head()
      println(s"[semblock] flat blocking: n_cells=${focc.getLong(0)} " +
        s"max_occupancy=${focc.getLong(1)} " +
        s"candidate_pairs=${focc.getLong(2)}")
      flat.unpersist()
    }

    if (runRide) {
      val kept = timed("semDedup auto (full ride)") {
        Similarity.semDedup(emb, tau = 0.4)
          .filter(col("keep")).count()
      }
      println(s"[semblock] semDedup keep=$kept of $n")
    }
    spark.stop()
  }
}
