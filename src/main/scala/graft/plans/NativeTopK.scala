package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.GraftSqlBridge

/** Public API over the [[TopKJoin]] plan node: exact top-k similarity
  * search with the same output contract (and bit-identical results) as
  * [[graft.llm.Similarity.bruteForceTopK]], but with the |Q|x|C| scoring
  * kept inside one narrow physical operator. The only exchange in the
  * plan ranks numPartitions * |Q| * k candidate rows.
  *
  * Falls back to the declarative path when the session was built without
  * [[graft.GraftExtensions]] (the planner would have no strategy for the
  * node; presence is probed on the planner's strategy list itself — a
  * session that only registered the graft functions must NOT take the
  * native path, it would fail at planning time).
  */
object NativeTopK {

  /** Exact top-k neighbors by dot product; output
    * (query_id, neighbor_id, rank, sim) — identical to the declarative
    * brute-force path row for row. */
  def topK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val spark = queries.sparkSession
    if (!GraftSqlBridge.hasPlannerStrategy(spark, TopKJoinStrategy))
      return graft.llm.Similarity.bruteForceTopK(queries, corpus, k)
    val q = queries.select(col("vec_id").cast("long").as("query_id"),
      col("embedding").cast("array<float>").as("qe"))
    val c = corpus.select(col("vec_id").cast("long").as("neighbor_id"),
      col("embedding").cast("array<float>").as("ce"))
    val cand = GraftSqlBridge.ofRows(spark,
      TopKJoin(GraftSqlBridge.analyzed(q), GraftSqlBridge.analyzed(c), k))
    // final rank over the pruned candidate set — same rounding/tiebreak
    // as bruteForceTopK, so the two paths are row-identical
    val w = Window.partitionBy("query_id")
      .orderBy((floor(col("raw_dot") * 1e6 + 0.5) / 1e6).desc,
        col("neighbor_id"))
    cand
      .select(col("query_id"), col("neighbor_id"),
        row_number().over(w).as("rank"),
        (floor(col("raw_dot") * 10000 + 0.5) / 10000).as("sim"))
      .filter(col("rank") <= k)
      .orderBy("query_id", "rank")
  }
}
