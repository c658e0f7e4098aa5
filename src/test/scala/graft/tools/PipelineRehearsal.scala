package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** End-to-end curation-pipeline rehearsal (round-12 directive #4): one
  * job chaining the real pre-training data flow the per-operator
  * ladders only ever measured in isolation —
  *
  *   1. strict gate stack (quality ∧ language ∧ dup3 ∧ minhash-dedup
  *      keep; `TextOps.curate` with the dup3 gate ACTIVE),
  *   2. Bloom decontamination of the survivors against an external
  *      eval corpus (`CorpusOps.bloomDecontaminateAgainst`),
  *   3. semantic dedup of the survivors' embeddings
  *      (`Similarity.semDedup`, adaptive nlist),
  *   4. split + shard assignment and partitioned JSONL export (the
  *      `CorpusOps.exportTrainingSet` tail, fed the chained kept set).
  *
  * Per stage: wall seconds, surviving row count, and JVM heap in use
  * after the stage (the driver-state proxy — the only driver payloads
  * in the chain are the Bloom bitmap, Lloyd centroids, and the
  * dedup-threshold literals, all bounded). Run at sf0.1 and ×10 and
  * compare walls: the per-family ladders are each sublinear; THIS
  * measures whether they compose (cache pressure, AQE interplay,
  * checkpoint cadence) in one job.
  *
  * Usage: PipelineRehearsal <corpusDir> <outDir> [label] [langs]
  *
  * `langs` (comma list, default "en") runs the gate stack once per
  * language and unions the survivor sets. The StressGen replicas tag
  * every token (`~k`), which the language-ID heuristic classifies
  * 'und' — so a strict en-only funnel at ×k narrows back to the base
  * survivors by the GENERATOR's design (stage 1 still does the full
  * ×k work). Passing "en,und" keeps the surviving replicas too, so
  * the downstream stages (bloom probe, semantic dedup, export) see
  * genuinely scaled input volumes.
  */
object PipelineRehearsal {

  private def heapMb(): Long = {
    val r = Runtime.getRuntime
    (r.totalMemory() - r.freeMemory()) / (1024 * 1024)
  }

  def main(args: Array[String]): Unit = {
    val corpusDir = args(0)
    val outDir = args(1)
    val label = if (args.length > 2) args(2) else corpusDir
    val langs = (if (args.length > 3) args(3) else "en")
      .split(",").map(_.trim).filter(_.nonEmpty).toSeq
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

    import graft.llm.{CorpusOps, Similarity, TextOps}

    val docs = graft.sources.Tables(spark, corpusDir, "documents")
    val emb = graft.sources.Tables(spark, corpusDir, "embeddings")
    val nDocs = docs.count()
    val nVecs = emb.count()
    println(s"[rehearsal] $label: $nDocs docs, $nVecs vectors, " +
      f"canary cpu_spin=${graft.Bench.cpuSpin()}%.3f s " +
      f"cpu_spin8=${graft.Bench.cpuSpin8()}%.3f s")

    def stage[T](name: String)(body: => (Long, T)): T = {
      val t0 = System.nanoTime()
      val (survivors, out) = body
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[rehearsal] $name%-16s ${dt}%8.2f s  " +
        f"survivors=$survivors%8d  heap=${heapMb()}%5d MB")
      out
    }
    val tTotal0 = System.nanoTime()

    // 1. strict gate stack: quality >= 0.5, per-language pass, dup3
    //    gate ACTIVE (0.9 — strict enough to genuinely evaluate, loose
    //    enough to keep the funnel realistic), minhash-dedup keep
    val curated = stage("curate") {
      val kept = langs.map(l =>
          TextOps.curate(docs, minQuality = 0.5, lang = l,
            shingleSize = 3, threshold = 0.5, maxDup3 = 0.9)
            .select("doc_id"))
        .reduce(_.unionByName(_)).localCheckpoint()
      (kept.count(), kept)
    }

    // 2. Bloom decontamination of the SURVIVORS against an external
    //    eval slice (every 100th doc plays the benchmark corpus —
    //    disjoint from training by construction of the drop)
    val clean = stage("bloom_decontam") {
      val evalDocs = docs.filter(col("doc_id") % 100 === 7)
      val train = docs.join(curated, Seq("doc_id"))
        .filter(col("doc_id") % 100 =!= 7)
      val screened = CorpusOps.bloomDecontaminateAgainst(
          train, evalDocs, n = 3, maxOverlap = 0.5)
        .filter(!col("dropped")).select("doc_id").localCheckpoint()
      (screened.count(), screened)
    }

    // 3. semantic dedup over the survivors' embeddings (vec_id = doc_id
    //    where a vector exists); docs without a vector pass through —
    //    the realistic shape: the embedding table covers a subset
    val kept = stage("semdedup") {
      val survEmb = emb.join(
        clean.withColumnRenamed("doc_id", "vec_id"), Seq("vec_id"))
      val keepVec = Similarity.semDedup(survEmb, tau = 0.4)
        .filter(col("keep")).select(col("vec_id").as("doc_id"))
      val noVec = clean.join(
        emb.select(col("vec_id").as("doc_id")), Seq("doc_id"),
        "left_anti")
      val all = keepVec.unionByName(noVec).localCheckpoint()
      (all.count(), all)
    }

    // 4. split + shard assignment in ONE projection over the kept
    //    payload, partitioned JSONL export (the exportTrainingSet tail)
    stage("split_export") {
      CorpusOps.exportAssigned(docs, kept, s"$outDir/train_set")
      val written = spark.read.json(s"$outDir/train_set").count()
      (written, ())
    }

    val total = (System.nanoTime() - tTotal0) / 1e9
    println(f"[rehearsal] TOTAL $label ${total}%8.2f s, " +
      f"canary cpu_spin=${graft.Bench.cpuSpin()}%.3f s " +
      f"cpu_spin8=${graft.Bench.cpuSpin8()}%.3f s")
    spark.stop()
  }
}
