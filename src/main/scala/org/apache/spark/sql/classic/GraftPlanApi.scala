package org.apache.spark.sql.classic

import org.apache.spark.sql.{DataFrame, SparkSession => ApiSparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.SparkStrategy

/** Bridge into `private[sql]` plan-construction APIs, so graft's custom
  * logical operators (e.g. [[graft.plans.AsOfJoinPlan]]) can surface as
  * ordinary DataFrames. Lives in `org.apache.spark.sql.classic` solely
  * for access; contains no logic of its own.
  */
object GraftPlanApi {

  /** Wrap an already-resolved logical plan as a DataFrame. */
  def ofRows(spark: ApiSparkSession, plan: LogicalPlan): DataFrame =
    Dataset.ofRows(spark.asInstanceOf[SparkSession], plan)

  /** Idempotently add a planner strategy to the session (the public
    * `spark.experimental` hook — no extensions jar wiring required).
    */
  def ensureStrategy(spark: ApiSparkSession, strategy: SparkStrategy): Unit = {
    val exp = spark.asInstanceOf[SparkSession].experimental
    if (!exp.extraStrategies.contains(strategy)) {
      exp.extraStrategies = exp.extraStrategies :+ strategy
    }
  }
}
