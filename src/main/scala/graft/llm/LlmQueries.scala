package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** queries()/oracleSql() wiring for the LLM-data-pipeline operators
  * (SURVEY §2.D). Oracle entries exist where the semantics are expressible
  * in portable SQL (text stats, exact dedup, brute-force ANN — DuckDB has
  * `list_inner_product`); hash/LSH/regex-based operators get rows-only
  * checks plus unit-level fixtures in LlmSpec. */
object LlmQueries {

  private def docs(s: SparkSession, d: String) = Tables(s, d, "documents")
  private def emb(s: SparkSession, d: String) = Tables(s, d, "embeddings")

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "llm_text_stats" -> ((s, d) => TextOps.stats(docs(s, d))),
    "llm_quality" -> ((s, d) => TextOps.quality(docs(s, d))),
    "llm_langid" -> ((s, d) => TextOps.langId(docs(s, d))),
    "llm_token_count" -> ((s, d) => TextOps.tokenCount(docs(s, d))),
    "llm_fingerprint" -> ((s, d) => TextOps.fingerprint(docs(s, d))),
    "llm_dedup_exact" -> ((s, d) => Dedup.exact(docs(s, d))),
    "llm_dedup_minhash" -> ((s, d) =>
      Dedup.minHash(docs(s, d)).orderBy("doc_id")),
    "llm_near_dup_pairs" -> ((s, d) =>
      Dedup.nearDupPairs(docs(s, d), shingleSize = 3, threshold = 0.5)),
    "llm_simhash" -> ((s, d) => Dedup.simHash(docs(s, d))),
    "llm_ann_cosine" -> ((s, d) => {
      val e = emb(s, d)
      Similarity.bruteForceTopK(e.filter(col("vec_id") < 10), e, k = 5)
    }),
    "llm_ann_lsh" -> ((s, d) => {
      val e = emb(s, d)
      Similarity.lshNeighbors(e.filter(col("vec_id") < 10), e, maxDist = 1.2)
    }),
    "llm_multimodal" -> ((s, d) => Multimodal.documentsAsMedia(s, docs(s, d))),
    "llm_hll_distinct" -> ((s, d) =>
      // 100 TB distinct counting: HLL sketch vs exact, with relative error
      Tables(s, d, "lineitem").agg(
        approx_count_distinct(col("l_partkey"), 0.02).as("approx_d"),
        countDistinct(col("l_partkey")).as("exact_d"))))

  val oracle: Map[String, String] = Map(
    "llm_text_stats" ->
      ("SELECT doc_id, CAST(LENGTH(text) AS BIGINT) AS n_chars, " +
        "CAST(LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) + 1 AS BIGINT) AS n_tokens, " +
        "FLOOR(CAST(LENGTH(REPLACE(text, ' ', '')) AS DOUBLE) / " +
        "(LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) + 1) * 10000 + 0.5) / 10000 AS avg_token_len " +
        "FROM documents ORDER BY doc_id"),
    "llm_dedup_exact" ->
      ("SELECT MIN(doc_id) AS keep_id, COUNT(*) AS dup_cnt " +
        "FROM documents GROUP BY text ORDER BY keep_id"),
    "llm_ann_cosine" ->
      ("WITH q AS (SELECT vec_id AS query_id, LIST_TRANSFORM(embedding, x -> CAST(x AS DOUBLE)) AS qe " +
        "FROM embeddings WHERE vec_id < 10), " +
        "c AS (SELECT vec_id AS neighbor_id, LIST_TRANSFORM(embedding, x -> CAST(x AS DOUBLE)) AS ce " +
        "FROM embeddings), " +
        "s AS (SELECT query_id, neighbor_id, LIST_INNER_PRODUCT(qe, ce) AS raw_dot FROM q CROSS JOIN c), " +
        "rk AS (SELECT query_id, neighbor_id, " +
        "CAST(ROW_NUMBER() OVER (PARTITION BY query_id " +
        "ORDER BY FLOOR(raw_dot * 1000000 + 0.5) / 1000000 DESC, neighbor_id) AS INTEGER) AS rank, " +
        "FLOOR(raw_dot * 10000 + 0.5) / 10000 AS sim FROM s) " +
        "SELECT query_id, neighbor_id, rank, sim FROM rk WHERE rank <= 5 " +
        "ORDER BY query_id, rank"))
}
