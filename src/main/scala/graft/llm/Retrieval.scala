package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hybrid corpus retrieval: keyword (BM25) and embedding (exact cosine)
  * rankings fused with Reciprocal Rank Fusion (Cormack et al. 2009,
  * `score = Σ 1/(c + rank)`) — the standard dataset-search /
  * decontamination-sweep ranking that is robust to the two scorers'
  * incomparable scales because only RANKS enter the fusion.
  *
  * The reference has no retrieval surface; this composes the library's
  * own verified [[TextOps.bm25]] and [[Similarity.bruteForceTopK]]
  * operators (each independently oracle-checked).
  */
object Retrieval {

  /** RRF contribution of one rank list, in integer micro-units:
    * `floor(1e6 / (c + rank) + ½)`; 0 when the doc is absent from the
    * list. Integer fusion sums make the final ranking independent of
    * float summation order — the [[TextOps.bm25]] discipline. */
  private def rrf6(rank: Column, c: Int): Column =
    coalesce(floor(lit(1e6) / (lit(c) + rank) + 0.5).cast("long"), lit(0L))

  /** Top-`k` docs by fused keyword + embedding relevance. `terms` drive
    * the BM25 arm over `docs`; the embedding of `queryVecId` drives the
    * exact-cosine arm over `embeddings` (doc_id ≡ vec_id row alignment).
    * Each arm contributes its top `kEach`; a doc absent from one arm
    * scores 0 there (its rank column reports the `-1` sentinel).
    *
    * Scale shape: both arms end in a TakeOrderedAndProject cut, so the
    * two frames entering fusion carry ≤ `kEach` rows each — the
    * re-ranking windows and the full-outer fusion join run on
    * budget-bounded inputs no matter the corpus size. Nothing here adds
    * a corpus-sized shuffle beyond what the two verified arms already
    * plan. */
  def hybridRrf(docs: DataFrame, embeddings: DataFrame, terms: Seq[String],
      queryVecId: Long = 0L, k: Int = 10, kEach: Int = 20,
      c: Int = 60): DataFrame = {
    require(k > 0 && kEach >= k, s"need 0 < k <= kEach, got k=$k kEach=$kEach")
    require(c > 0, s"need c > 0, got $c")
    // keyword arm: ranks re-derived from bm25's (rounded score, doc_id)
    // total order — the window spans at most kEach rows by construction
    val kw = TextOps.bm25(docs, terms, kEach)
      .select(col("doc_id"),
        row_number().over(Window.orderBy(desc("score"), asc("doc_id")))
          .cast("long").as("kw_rank"))
    // embedding arm: bruteForceTopK already emits a 1-based rank
    val ann = Similarity.bruteForceTopK(
        embeddings.filter(col("vec_id") === queryVecId), embeddings, kEach)
      .select(col("neighbor_id").as("doc_id"),
        col("rank").cast("long").as("ann_rank"))
    kw.join(ann, Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        coalesce(col("kw_rank"), lit(-1L)).as("kw_rank"),
        coalesce(col("ann_rank"), lit(-1L)).as("ann_rank"),
        (rrf6(col("kw_rank"), c) + rrf6(col("ann_rank"), c)).as("rrf6"))
      .orderBy(desc("rrf6"), asc("doc_id")).limit(k)
      .select(col("doc_id"), col("kw_rank"), col("ann_rank"), col("rrf6"),
        (floor(col("rrf6").cast("double") / 1e6 * 10000 + 0.5) / 10000)
          .as("rrf_score"))
  }
}
