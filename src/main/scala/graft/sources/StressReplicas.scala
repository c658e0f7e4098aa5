package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic ×k replica transforms for scale-rehearsal corpora —
  * the ONE implementation of the replication discipline both the
  * test-side stress generator (`graft.tools.StressGen`, the ×3/×10/×30/
  * ×100/skew ladders of SCALE_r9–r13) and the bench's gated
  * `pipeline_x10` corpus share, so the two can never drift.
  *
  * The discipline (SCALE_r9, documented at length on StressGen): a
  * replica must scale the WORK, not plant artificial quadratic output —
  *  - documents: replica k tags every token with a `~k` suffix, so each
  *    replica's internal shingle structure is exactly the base corpus's
  *    (verified near-dup pairs scale exactly ×k) while cross-replica
  *    vocabularies are disjoint (zero cross-replica shingle overlap).
  *  - embeddings: replica k is the base vector cyclically shifted by k
  *    dims — norm-preserving (the corpus is unit-normalized), genuinely
  *    distinct vectors, identical distance-compute cost.
  */
object StressReplicas {

  /** Every token suffixed `~k` (identity for the base copy k = 0). */
  def taggedText(k: Int): Column =
    if (k == 0) col("text")
    else array_join(
      transform(split(col("text"), " "), t => concat(t, lit(s"~$k"))), " ")

  /** Base vector cyclically shifted; the shift wraps into [1, dim−1]
    * for every replica (k ≥ dim broke the slice with a negative length,
    * and a 0 shift would clone the base vector — a semantic dup the
    * generator must not plant). */
  def shiftedEmbedding(k: Int, dim: Int = 64): Column = {
    val s = if (k == 0) 0 else ((k - 1) % (dim - 1)) + 1
    if (s == 0) col("embedding")
    else concat(slice(col("embedding"), s + 1, dim - s),
      slice(col("embedding"), 1, s))
  }

  /** The k-th documents replica (disjoint doc_id range, tagged text). */
  def docsReplica(base: DataFrame, k: Int): DataFrame =
    base.select((col("doc_id") + lit(k * 10000000L)).as("doc_id"),
      taggedText(k).as("text"), col("lang"), col("source"))

  /** The k-th embeddings replica (disjoint vec_id range, shifted dims). */
  def embReplica(base: DataFrame, k: Int): DataFrame =
    base.select((col("vec_id") + lit(k * 10000000L)).as("vec_id"),
      shiftedEmbedding(k).as("embedding"), col("label"))

  /** Write ×`copies` documents + embeddings replicas of `baseDir` under
    * `outDir` in the testdata layout (the two tables the composed
    * curation chain reads) — enough for [[graft.llm.Pipeline]] at scale
    * without shipping the full StressGen variant writer into main.
    *
    * Replicas are written in `batch`-sized append groups: Catalyst
    * analysis of an N-way union is superlinear in N, so the ×1000 rung
    * would spend more wall in the PLANNER than the writer as one union.
    * `copies ≤ batch` (every gated bench corpus) is a single overwrite
    * group — byte-identical to the pre-batching writer. */
  def writeDocsEmb(spark: SparkSession, baseDir: String, outDir: String,
      copies: Int, batch: Int = 100): Unit = {
    (0 until copies).grouped(batch).zipWithIndex.foreach { case (ks, gi) =>
      val mode = if (gi == 0) "overwrite" else "append"
      val docs = ks
        .map(k => docsReplica(Tables(spark, baseDir, "documents"), k))
        .reduce(_ unionByName _)
      docs.withColumn("n_chars", length(col("text")).cast("long"))
        .select("doc_id", "text", "lang", "source", "n_chars")
        .repartition(8).write.mode(mode)
        .parquet(s"$outDir/documents.parquet")
      ks.map(k => embReplica(Tables(spark, baseDir, "embeddings"), k))
        .reduce(_ unionByName _)
        .repartition(8).write.mode(mode)
        .parquet(s"$outDir/embeddings.parquet")
    }
  }
}
