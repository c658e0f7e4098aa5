package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(Runtime.getRuntime.availableProcessors, 32).toString)
    val spark = SparkSession.builder()
      .withExtensions(new GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      // events.ts is parquet TIMESTAMP(NANOS); Tables converts to micros.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // one UNTIMED warm-up before any timed sample: the first job of a
    // fresh JVM pays JIT + whole-stage-codegen compilation + parquet
    // footer caching for everything after it (round-7 artifact: the
    // suite's first heavy query, graph_pagerank, recorded 6.06 s while
    // its isolated median was 2.91 s — the warm-up absorbs that cost
    // outside the measurement window). NON-headline queries only
    // (round-8 advice: warming up with q20_join5_agg gave that one
    // headline query an identical-plan state advantage no other headline
    // got) — q09_rollup exercises scan+agg codegen on the largest table,
    // q04_join_inner the join machinery, and the bare counts warm the
    // parquet footers of the non-TPC-H tables every later family reads.
    try {
      val t0 = System.nanoTime()
      SparkEntry.queries("q09_rollup")(spark, sfDir).count()
      SparkEntry.queries("q04_join_inner")(spark, sfDir).count()
      Seq("documents", "embeddings", "events")
        .foreach(t => graft.sources.Tables(spark, sfDir, t).count())
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      System.err.println(
        f"[bench] warm-up (q09+q04+footers) ${(System.nanoTime() - t0) / 1e9}%8.3f s (untimed)")
    } catch { case e: Throwable =>
      System.err.println(s"[bench] warm-up failed: ${e.getMessage}")
    }
    var errors = List.empty[String]
    // optional comma-separated allowlist for local iteration: time one
    // query (plus its reruns) without paying for the whole 131-query suite
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val selected = only match {
      case Some(names) => SparkEntry.queries.filter(kv => names(kv._1))
      case None        => SparkEntry.queries
    }
    val results = selected.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try fn(spark, sfDir).count()
      catch { case e: Throwable =>
        // a failing query must be visible in the JSON, not silently
        // folded into a healthy-looking total
        errors ::= name
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
      }
      val dt = (System.nanoTime() - t0) / 1e9
      // each query is an independent job: drop whatever it cached or
      // localCheckpoint'ed so 112 queries in one JVM don't accumulate
      // storage pressure (round-2 bench ran node2vec 3x slower inside
      // the suite than isolated purely from leaked blocks)
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      // full per-query trace on stderr (stdout stays one JSON line)
      System.err.println(f"[bench] $name%-24s $dt%8.3f s")
      name -> dt
    }
    def r3(v: Double) = math.floor(v * 1000 + 0.5) / 1000
    // per-query detail only for the BASELINE.md headline set + the known
    // heavy queries: the driver keeps a bounded tail of stdout, and the
    // round-1 all-89-query line (~2.9 kB) came back decapitated and
    // unparseable. The total still covers every query.
    val headline = Set("q01_scan", "q07_agg", "q11_window_topk",
      "q20_join5_agg", "ml_kmeans", "ml_knn", "graph_pagerank",
      "llm_dedup_minhash", "llm_near_dup_pairs", "llm_ann_cosine",
      "graph_louvain", "graph_betweenness", "graph_subgraph_tri",
      "graph_node2vec", "graph_kcore", "ml_svc", "ml_dbscan",
      "llm_ann_ivf", "llm_ann_native", "llm_embed_dedup",
      "llm_dedup_groups", "llm_curation", "graph_louvain_sync",
      "llm_ann_pq", "llm_ann_ivfpq", "llm_semdedup", "llm_span_dups",
      "llm_ann_text", "llm_hybrid_rrf", "llm_bpe_encode",
      "llm_span_remove", "llm_decontaminate_bloom", "llm_boilerplate",
      "llm_dedup_keep_best", "llm_token_budget", "llm_within_doc_dedup",
      "llm_containment", "llm_pii_consume", "llm_normalize_consume")
    // Every headline number is drop-max-then-mean of 3 runs (1 suite
    // pass + 2 re-runs, caches cleared between). Single samples proved
    // unadjudicable twice: r4/r5 graph_louvain swung 24 -> 77 s on one
    // sample while the plan was unchanged — BASELINE.md documents 4x
    // swings for iterative fits under local[32] contention, and the 2x
    // gate can't distinguish contention from regression without a
    // robust statistic. Median proved insufficient in r7: when all 3
    // samples share one contended window the middle one is still
    // inflated (pagerank 6.06 s median vs 2.91 s isolated), so the max
    // sample is dropped entirely and the remaining two average. The
    // suite total stays the plain single-pass sum.
    val refined = results.map { case (name, t1) =>
      if (!headline(name) || errors.contains(name)) name -> t1
      else {
        val reruns = (1 to 2).map { _ =>
          val t0 = System.nanoTime()
          SparkEntry.queries(name)(spark, sfDir).count()
          val dt = (System.nanoTime() - t0) / 1e9
          spark.catalog.clearCache()
          spark.sparkContext.getPersistentRDDs.values
            .foreach(_.unpersist(blocking = false))
          System.err.println(f"[bench] $name%-24s $dt%8.3f s (rerun)")
          dt
        }
        name -> (t1 +: reruns).sorted.take(2).sum / 2.0
      }
    }
    val qs = refined.filter(r => headline(r._1))
      .map { case (k, v) => "\"" + k + "\":" + r3(v) }
      .mkString("{", ",", "}")
    val errJson = errors.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = r3(results.map(_._2).sum)
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
        s""""errors":$errJson,"n_queries":${results.size},"sf":"$sfDir",""" +
        s""""method":"total=single pass after untimed warm-up; """ +
        s"""headline queries=mean of best 2 of 3 (max dropped)"}"""
    // stop FIRST so no executor/log line interleaves with the one
    // machine-read output line
    spark.stop()
    println(line)
    System.out.flush()
  }
}
