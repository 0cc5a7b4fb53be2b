package org.apache.spark.sql.classic

import org.apache.spark.sql.{Column, DataFrame, SparkSession => ApiSparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
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

  /** Wrap a Catalyst expression as a Column — lets an operator close a
    * model/parameter object into an expression directly instead of
    * routing through a session-global temp-function name (which races
    * when two models register the same name before analysis).
    */
  def column(e: Expression): Column = ExpressionUtils.column(e)

  /** The Catalyst expression behind a Column (may be unresolved). */
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

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
