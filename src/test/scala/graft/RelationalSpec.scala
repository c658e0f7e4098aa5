package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Relational
import graft.sources.Tables

/** Differential check: every DataFrame-DSL query must produce exactly the
  * rows of its SQL oracle. The oracle strings are DuckDB dialect; the three
  * that use DuckDB-only functions get Spark-SQL-equivalent variants here.
  * (The driver re-runs the DuckDB originals out of process — this spec
  * catches DSL/SQL drift early and in-repo.)
  */
class RelationalSpec extends AnyFunSuite {
  import TestSpark._

  /** Spark-SQL flavor of the DuckDB-only oracles. */
  private val sparkOracleOverrides = Map(
    "q16_date" ->
      ("SELECT o_orderkey, YEAR(o_orderdate) AS y, MONTH(o_orderdate) AS m, " +
        "CAST(DATE_ADD(CAST(o_orderdate AS DATE), 30) AS STRING) AS d30 " +
        "FROM orders ORDER BY o_orderkey"),
    "q18_array" ->
      ("SELECT vec_id, CAST(SIZE(embedding) AS BIGINT) AS n, " +
        "FLOOR(AGGREGATE(embedding, CAST(0.0 AS DOUBLE), (a, x) -> a + CAST(x AS DOUBLE)) * 10000 + 0.5) / 10000 AS s " +
        "FROM embeddings ORDER BY vec_id"),
    "q19_json" ->
      ("SELECT event_id, GET_JSON_OBJECT(props, '$.k') AS k " +
        "FROM events ORDER BY event_id"))

  private def rows(df: DataFrame): Seq[Seq[String]] =
    df.collect().toSeq.map(_.toSeq.map(String.valueOf))

  for ((name, fn) <- Relational.all.toSeq.sortBy(_._1)) {
    test(s"$name matches its SQL oracle on sf0.001") {
      Tables.registerAll(spark, sf0001)
      val dsl = fn(spark, sf0001)
      val sql = sparkOracleOverrides.getOrElse(name, Relational.oracle(name))
      val oracle = spark.sql(sql)
      assert(dsl.columns.toSeq == oracle.columns.toSeq,
        s"column names differ: ${dsl.columns.toSeq} vs ${oracle.columns.toSeq}")
      val got = rows(dsl)
      val want = rows(oracle)
      assert(got.size == want.size, s"row count ${got.size} != ${want.size}")
      got.zip(want).zipWithIndex.foreach { case ((g, w), i) =>
        assert(g == w, s"row $i differs: $g vs $w")
      }
      assert(got.nonEmpty || name == "q06_join_anti", s"$name returned no rows")
    }
  }

  test("oracle map covers exactly the query map") {
    assert(Relational.oracle.keySet == Relational.all.keySet)
  }
}
