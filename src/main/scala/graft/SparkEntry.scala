package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.graph.GraphQueries
import graft.llm.LlmQueries
import graft.ml.MlQueries
import graft.operators.Relational

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Q20 (5-way join + agg) exercises scan, join planning (broadcast dim),
    * and partial+final aggregation in one plan. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q20(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.all ++ LlmQueries.all ++ MlQueries.all ++ GraphQueries.all

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Relational.oracle ++ LlmQueries.oracle ++ MlQueries.oracle ++
      GraphQueries.oracle
}
