package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.SparkStrategy

/** Thin `private[sql]`-access bridge for graft's custom plan machinery
  * (the standard pattern for libraries shipping their own operators):
  *  - build a DataFrame from a custom LogicalPlan node;
  *  - register an extra planner strategy on a live session.
  * Deployments that configure `spark.sql.extensions=graft.GraftExtensions`
  * get the strategy injected at session build instead.
  */
object GraftSqlBridge {

  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Idempotently append a planner strategy to the session. */
  def addStrategy(spark: SparkSession, strategy: SparkStrategy): Unit = {
    val exp = spark.asInstanceOf[classic.SparkSession].experimental
    if (!exp.extraStrategies.contains(strategy)) {
      exp.extraStrategies = exp.extraStrategies :+ strategy
    }
  }
}
