package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.AttributeReference
import org.apache.spark.sql.catalyst.plans.logical.{LeafNode, LogicalPlan, Statistics}
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.datasources.v2.{DataSourceV2ScanRelation, DataSourceV2Strategy, V1ScanWrapper}

/** Plan-time statistics for graft's V1-executed DSv2 scans.
  *
  * [[graft.sources.GraftScan]] implements SupportsReportStatistics with
  * the snapshot's EXACT post-prune rows/bytes — but Spark wraps every
  * V1Scan in [[V1ScanWrapper]] during V2ScanRelationPushDown, and the
  * wrapper implements only `Scan`, so
  * `DataSourceV2ScanRelation.computeStats` (an `instanceof
  * SupportsReportStatistics` on the WRAPPER) falls back to
  * spark.sql.defaultSizeInBytes. Consequence: every SQL read of a
  * graft table plans as effectively infinite, and a dim-sized table is
  * never auto-broadcast at plan time (AQE can only rescue the join
  * AFTER paying the build side's shuffle map stage). No optimizer
  * extension point runs between that pushdown and physical planning
  * ("Pre CBO Rules" sits BEFORE "Early Filter and Projection
  * Push-Down" in 4.1), so the substitution happens in a planner
  * strategy instead:
  *
  *  1. the first time the planner dispatches a fragment containing a
  *     RAW wrapped graft scan, the strategy substitutes a
  *     stats-bearing leaf per scan and returns `planLater(rewritten)`
  *     — the planner re-plans the rewritten tree, so JoinSelection
  *     reads the manifest-exact statistics;
  *  2. when planning reaches a fragment that bottoms out at a
  *     substituted leaf, the strategy restores the ORIGINAL relation
  *     and delegates to Spark's own DataSourceV2Strategy — the
  *     physical plan is byte-identical to the unsubstituted one; only
  *     the logical statistics differ.
  */
case class GraftStatsScanRelation(original: DataSourceV2ScanRelation,
    reported: Statistics) extends LeafNode {
  override def output: Seq[AttributeReference] = original.output
  override def computeStats(): Statistics = reported
  override def maxRows: Option[Long] = original.maxRows
  override def simpleString(maxFields: Int): String =
    s"GraftStatsScanRelation(sizeInBytes=${reported.sizeInBytes}, " +
      s"rowCount=${reported.rowCount}) ${original.simpleString(maxFields)}"
}

case class GraftScanStatsStrategy(session: classic.SparkSession)
    extends org.apache.spark.sql.execution.SparkStrategy {

  private lazy val delegate = new DataSourceV2Strategy(session)

  private def isRawGraft(p: LogicalPlan): Boolean = p match {
    case DataSourceV2ScanRelation(_, w: V1ScanWrapper, _, _, _) =>
      w.v1Scan.isInstanceOf[graft.sources.GraftScan]
    case _ => false
  }

  private def statsOf(rel: DataSourceV2ScanRelation): Statistics = {
    val st = rel.scan.asInstanceOf[V1ScanWrapper].v1Scan
      .asInstanceOf[graft.sources.GraftScan].estimateStatistics()
    val size =
      if (st.sizeInBytes.isPresent) BigInt(st.sizeInBytes.getAsLong).max(1)
      else BigInt(session.sessionState.conf.defaultSizeInBytes)
    val rows =
      if (st.numRows.isPresent) Some(BigInt(st.numRows.getAsLong)) else None
    Statistics(sizeInBytes = size, rowCount = rows)
  }

  override def apply(plan: LogicalPlan): Seq[SparkPlan] =
    if (plan.exists(isRawGraft)) {
      // substitute ONCE per planning dispatch tree, then re-plan: the
      // rewritten tree carries no raw graft scans, so this branch can
      // never re-fire on it (no recursion)
      val rewritten = plan.transform {
        case rel: DataSourceV2ScanRelation if isRawGraft(rel) =>
          GraftStatsScanRelation(rel, statsOf(rel))
      }
      Seq(planLater(rewritten))
    } else if (plan.exists(_.isInstanceOf[GraftStatsScanRelation])) {
      // bottoming-out fragments (project/filter over the leaf) restore
      // and ride Spark's own strategy; anything wider (a join above
      // the leaf) returns Nil here and is planned by the built-ins,
      // which read this leaf's statistics
      delegate(plan.transform {
        case GraftStatsScanRelation(original, _) => original
      })
    } else Nil
}
