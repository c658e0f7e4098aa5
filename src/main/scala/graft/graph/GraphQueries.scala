package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** queries()/oracleSql() wiring for the graph layer. The edge builder,
  * degrees, triangle total, and the string-adapter demo are SQL-
  * expressible → DuckDB oracles; iterative algorithms are rows-only with
  * structural unit tests in GraphSpec. */
object GraphQueries {

  private def edges(s: SparkSession, d: String): DataFrame =
    GraphSource.partTransitions(Tables(s, d, "lineitem"))

  private def graph(s: SparkSession, d: String) =
    GraphSource.toGraph(edges(s, d))

  private def ugraph(s: SparkSession, d: String) =
    GraphSource.toGraph(GraphSource.canonicalUndirected(edges(s, d)))

  private def minNode(e: DataFrame): Long =
    e.agg(min(col("src"))).head().getLong(0)

  private def smallestNodes(e: DataFrame, n: Int): Seq[Long] =
    e.select(col("src").as("v")).union(e.select(col("dst")))
      .distinct().orderBy("v").limit(n).collect().map(_.getLong(0)).toSeq

  /** SQL CTE shared by the oracle queries below. */
  private val edgeCte =
    "WITH e0 AS (SELECT l_partkey AS dst, LAG(l_partkey) OVER " +
      "(PARTITION BY l_orderkey ORDER BY l_linenumber, l_partkey) AS src FROM lineitem), " +
      "g AS (SELECT src, dst, CAST(COUNT(*) AS DOUBLE) AS weight FROM e0 " +
      "WHERE src IS NOT NULL AND src <> dst GROUP BY src, dst) "

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "graph_edges" -> ((s, d) => edges(s, d).orderBy("src", "dst")),
    "graph_degree" -> ((s, d) => Builtins.degrees(s, graph(s, d))),
    "graph_triangle_total" -> ((s, d) => Builtins.triangleTotal(s, ugraph(s, d))),
    "graph_triangles" -> ((s, d) => Builtins.triangleCounts(s, ugraph(s, d))),
    "graph_clustering_coef" -> ((s, d) =>
      Builtins.clusteringCoefficient(s, ugraph(s, d))),
    "graph_pagerank" -> ((s, d) => Builtins.pageRank(s, graph(s, d), 10)),
    "graph_pagerank_conv" -> ((s, d) =>
      Builtins.pageRankUntilConvergence(s, graph(s, d), 1e-4)),
    "graph_ppr" -> ((s, d) => {
      val e = edges(s, d)
      Builtins.personalizedPageRank(s, GraphSource.toGraph(e), minNode(e), 10)
    }),
    "graph_wpr" -> ((s, d) => Iterative.weightedPageRank(s, graph(s, d), 10)),
    "graph_trustrank" -> ((s, d) => {
      val e = edges(s, d)
      Iterative.trustRank(s, GraphSource.toGraph(e),
        smallestNodes(e, 5).toSet, 10)
    }),
    "graph_incpr" -> ((s, d) => {
      val g = graph(s, d)
      val prior = Builtins.pageRank(s, g, 5)
      Iterative.incrementalPageRank(s, g, prior, 5)
    }),
    "graph_bfs" -> ((s, d) => {
      val e = edges(s, d)
      Iterative.bfs(s, GraphSource.toGraph(e), minNode(e), 10)
    }),
    "graph_sssp" -> ((s, d) => {
      val e = edges(s, d)
      Builtins.shortestPaths(s, GraphSource.toGraph(e), smallestNodes(e, 3))
    }),
    "graph_cc" -> ((s, d) => Builtins.connectedComponents(s, graph(s, d))),
    "graph_scc" -> ((s, d) =>
      Builtins.stronglyConnectedComponents(s, graph(s, d), 10)),
    "graph_lpa" -> ((s, d) => Builtins.labelPropagation(s, graph(s, d), 5)),
    "graph_kcore" -> ((s, d) => Iterative.kCore(s, ugraph(s, d), maxIter = 20)),
    "graph_modularity" -> ((s, d) => {
      val e = edges(s, d)
      val comm = Builtins.connectedComponents(s, GraphSource.toGraph(e))
        .withColumnRenamed("component", "community")
      Iterative.modularity(s, e, comm)
    }),
    "graph_louvain" -> ((s, d) => {
      val e = GraphSource.canonicalUndirected(edges(s, d))
      val comm = Community.louvain(s, e)
      comm.orderBy("node")
    }),
    "graph_wce" -> ((s, d) =>
      Community.weakCliques(s, GraphSource.canonicalUndirected(edges(s, d)),
        minCommon = 2)),
    "graph_closeness" -> ((s, d) => {
      val e = edges(s, d)
      Centrality.closeness(s, GraphSource.toGraph(e), smallestNodes(e, 8))
    }),
    "graph_betweenness" -> ((s, d) => {
      // batched Brandes makes the source sample nearly free: 8 sources
      // cost one level-synchronous pass, same as 1
      val e = edges(s, d)
      Centrality.betweenness(s, e, smallestNodes(e, 8))
    }),
    "graph_cycles" -> ((s, d) =>
      Motifs.cycles(s, edges(s, d), minLoop = 3, maxLoop = 3)),
    "graph_mce" -> ((s, d) =>
      Motifs.maximalCliques(s, GraphSource.canonicalUndirected(edges(s, d)))),
    "graph_subgraph_tri" -> ((s, d) => {
      // ordered triangle embeddings over the undirected view = 6 × triangles
      val und = GraphSource.canonicalUndirected(edges(s, d))
      val sym = und.select(col("src"), col("dst"))
        .union(und.select(col("dst"), col("src")))
        .withColumn("weight", lit(1.0))
      Motifs.subgraphCount(s, sym, Seq((0, 1), (1, 2), (2, 0)))
    }),
    "graph_node2vec" -> ((s, d) => Node2Vec.embeddings(s, edges(s, d))),
    "graph_adapter" -> ((s, d) => {
      // string-keyed nation→region graph through the encode/decode adapter
      val e = Tables(s, d, "nation")
        .join(Tables(s, d, "region"),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("n_name").as("src"), col("r_name").as("dst"),
          lit(1.0).as("weight"))
      val (enc, dict) = GraphSource.encodeStringEdges(s, e)
      val deg = Builtins.degrees(s, GraphSource.toGraph(enc))
      GraphSource.decode(deg, dict, "node")
        .select(col("node_name").as("name"), col("degree"))
        .orderBy("name")
    }))

  val oracle: Map[String, String] = Map(
    "graph_edges" ->
      (edgeCte + "SELECT src, dst, weight FROM g ORDER BY src, dst"),
    "graph_degree" ->
      (edgeCte +
        "SELECT COALESCE(i.node, o.node) AS node, " +
        "COALESCE(i.in_deg, 0) AS in_deg, COALESCE(o.out_deg, 0) AS out_deg, " +
        "COALESCE(i.in_deg, 0) + COALESCE(o.out_deg, 0) AS degree FROM " +
        "(SELECT dst AS node, CAST(COUNT(*) AS INTEGER) AS in_deg FROM g GROUP BY dst) i " +
        "FULL JOIN (SELECT src AS node, CAST(COUNT(*) AS INTEGER) AS out_deg " +
        "FROM g GROUP BY src) o ON i.node = o.node ORDER BY node"),
    "graph_triangle_total" ->
      (edgeCte +
        ", u AS (SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b FROM g) " +
        "SELECT CAST(COUNT(*) AS BIGINT) AS triangles FROM u x " +
        "JOIN u y ON y.a = x.b JOIN u z ON z.a = x.a AND z.b = y.b"),
    "graph_subgraph_tri" ->
      (edgeCte +
        ", u AS (SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b FROM g) " +
        "SELECT CAST(COUNT(*) * 6 AS BIGINT) AS matches FROM u x " +
        "JOIN u y ON y.a = x.b JOIN u z ON z.a = x.a AND z.b = y.b"),
    "graph_adapter" ->
      ("WITH e AS (SELECT n_name AS src, r_name AS dst FROM nation " +
        "JOIN region ON n_regionkey = r_regionkey) " +
        "SELECT name, CAST(COUNT(*) AS INTEGER) AS degree FROM " +
        "(SELECT src AS name FROM e UNION ALL SELECT dst FROM e) t " +
        "GROUP BY name ORDER BY name"))
}
