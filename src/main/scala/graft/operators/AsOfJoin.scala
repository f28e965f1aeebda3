package graft.operators

import graft.plans.{AsOfJoinNode, GraftStrategy}
import org.apache.spark.sql.{DataFrame, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.AttributeReference
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.functions._

/** As-of join (no native Spark operator; SURVEY §2.3 q_join_asof, §4.2).
  *
  * For every left row, the single right row with the greatest rTime
  * strictly before lTime among matching keys — LEFT semantics (unmatched
  * left rows survive with nulls).
  *
  * Two formulations, asserted equal in AsOfSpec:
  *  - [[leftAsOf]]: pure-DataFrame composition — left-join on (keys,
  *    rTime < lTime) then max(rTime) per left row. Simple and portable,
  *    but materializes every candidate pair before re-aggregating (the
  *    pair blow-up is bounded by matches-per-key), and the groupBy
  *    collapses fully-duplicate left rows.
  *  - [[leftAsOfMerge]]: whole-operator form — a custom logical node
  *    ([[graft.plans.AsOfJoinNode]]) planned by [[graft.plans.GraftStrategy]]
  *    into the single-pass partitioned merge [[graft.plans.AsOfJoinExec]]:
  *    one hash shuffle per side, in-partition sort, O(|L|+|R|) scan with
  *    O(1) state, no intermediate pairs. Preferred at scale; emits exactly
  *    one output row per left input row.
  *
  * Every shuffle is on the key columns, so bucketed/pre-partitioned
  * inputs ([[BucketedLayout]]) run either form shuffle-free.
  */
object AsOfJoin {

  def leftAsOf(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTime: String, rightTime: String,
               asOfCol: String = "asof_time"): DataFrame = {
    val r = right.select(
      keys.map(k => col(k).as(s"__r_$k")) :+ col(rightTime).as("__r_t"): _*)
    val cond = keys.map(k => col(k) === col(s"__r_$k")).reduce(_ && _) &&
      col("__r_t") < col(leftTime)
    val leftCols = left.columns.toSeq
    left.join(r, cond, "left")
      .groupBy(leftCols.map(col): _*)
      .agg(max(col("__r_t")).as(asOfCol))
  }

  private def attr(p: LogicalPlan, n: String) =
    p.output.find(_.name == n).getOrElse(
      throw new IllegalArgumentException(s"column $n not in ${p.output.map(_.name)}"))

  private def mkNode(left: DataFrame, right: DataFrame, keys: Seq[String],
                     rightKeyNames: Seq[String], leftTime: String,
                     rightTime: String): AsOfJoinNode = {
    // Self-join safety: left and right may share scan attributes (same
    // source); DeduplicateRelations will re-id the right subtree during
    // analysis of the new plan. Pin each side's output behind fresh
    // top-level aliases — alias exprIds are stable under dedup, so the
    // node's key/time references cannot go stale.
    val lp = left.toDF(left.columns: _*).queryExecution.analyzed
    val rp = right.toDF(right.columns: _*).queryExecution.analyzed
    val mirror = rp.output.map(a =>
      AttributeReference(a.name, a.dataType, nullable = true)())
    AsOfJoinNode(lp, rp,
      keys.map(attr(lp, _)), rightKeyNames.map(attr(rp, _)),
      attr(lp, leftTime), attr(rp, rightTime), mirror)
  }

  /** Single-pass merge form emitting left.* + the matched right TIME (the
    * composition-compatible shape). Registers the planner strategy on the
    * session idempotently. */
  def leftAsOfMerge(left: DataFrame, right: DataFrame, keys: Seq[String],
                    leftTime: String, rightTime: String,
                    asOfCol: String = "asof_time"): DataFrame = {
    val spark = left.sparkSession
    GraftSqlBridge.addStrategy(spark, GraftStrategy)
    // project the right side down to uniquely-named key+time columns so
    // the merged output never collides with left names
    val rNarrow = right.select(
      keys.map(k => col(k).as(s"__rk_$k")) :+ col(rightTime).as("__rt"): _*)
    val node = mkNode(left, rNarrow, keys,
      keys.map(k => s"__rk_$k"), leftTime, "__rt")
    GraftSqlBridge.ofRows(spark, node)
      .select(left.columns.map(col) :+ col("__rt").as(asOfCol): _*)
  }

  /** Single-pass merge form carrying the FULL matched right row (true
    * ASOF JOIN payload semantics — null right columns when unmatched).
    * Right column names (keys included) must be disjoint from the
    * left's; rename before calling. */
  def leftAsOfMergeAll(left: DataFrame, right: DataFrame,
                       leftKeys: Seq[String], rightKeys: Seq[String],
                       leftTime: String, rightTime: String): DataFrame = {
    val clash = left.columns.toSet.intersect(right.columns.toSet)
    require(clash.isEmpty, s"rename right columns to be disjoint first: $clash")
    val spark = left.sparkSession
    GraftSqlBridge.addStrategy(spark, GraftStrategy)
    GraftSqlBridge.ofRows(spark,
      mkNode(left, right, leftKeys, rightKeys, leftTime, rightTime))
  }
}
