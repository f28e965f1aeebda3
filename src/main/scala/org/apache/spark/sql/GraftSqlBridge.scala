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

  /** The Catalyst expression behind a Column (Spark 4 moved `.expr`
    * behind the sql-api ColumnNode seam; this runs the classic-side
    * eager converter, so Column-built comparisons surface as catalyst
    * `UnresolvedFunction("<=", ...)` nodes rather than an opaque lazy
    * wrapper) — used by ManifestTable's manifest-level pruning to walk
    * a filter's predicate tree. */
  def expr(c: Column): org.apache.spark.sql.catalyst.expressions.Expression =
    classic.ColumnNodeToExpressionConverter(c.node)

  /** Re-plan a batch frame as a STREAMING one (isStreaming = true) —
    * what a V1 `Source.getBatch` must hand the engine, and exactly how
    * the built-in file stream source wraps its batch reads: the batch
    * plan compiles to an InternalRow RDD (lazy) and re-enters the
    * streaming query as a leaf. */
  def streamingFrame(df: DataFrame): DataFrame = {
    val ds = df.asInstanceOf[classic.Dataset[Row]]
    ds.sparkSession.internalCreateDataFrame(
      ds.queryExecution.toRdd, ds.schema, isStreaming = true)
  }

  /** Idempotently append a planner strategy to the session. */
  def addStrategy(spark: SparkSession, strategy: SparkStrategy): Unit = {
    val exp = spark.asInstanceOf[classic.SparkSession].experimental
    if (!exp.extraStrategies.contains(strategy)) {
      exp.extraStrategies = exp.extraStrategies :+ strategy
    }
  }
}
