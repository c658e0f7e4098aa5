package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Minimal bridge into the `private[sql]` surface that custom logical
  * plans need: wrapping a [[LogicalPlan]] back into a user-facing
  * [[DataFrame]] and extracting the analyzed plan of an existing one.
  * Lives under `org.apache.spark.sql` solely for access; contains no
  * engine logic.
  */
object GraftSqlBridge {

  /** `Dataset.ofRows` for a custom logical node. */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** The analyzed logical plan of a DataFrame (resolved attributes, so a
    * custom BinaryNode can reference child output by ordinal). */
  def analyzed(df: DataFrame): LogicalPlan =
    df.queryExecution.analyzed

  /** Whether the session's planner actually carries `strategy` — the
    * reliable probe for "was GraftExtensions installed". (Probing a
    * co-registered FUNCTION is not: a session that registered the
    * functions directly would pass that probe and then die at planning
    * time with no strategy for the custom node.) */
  def hasPlannerStrategy(spark: SparkSession,
      strategy: org.apache.spark.sql.execution.SparkStrategy): Boolean =
    spark.asInstanceOf[classic.SparkSession].sessionState.planner
      .extraPlanningStrategies.contains(strategy)
}
