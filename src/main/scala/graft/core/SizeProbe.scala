package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.Attribute
import org.apache.spark.sql.catalyst.plans.logical.{LeafNode, LogicalPlan, Project, SubqueryAlias}

/** One-scan size probing for the size-routed operators
  * ([[graft.operators.ExactPairsTopK]], [[graft.operators.SemanticDedup]],
  * [[graft.operators.HistogramRank]]).
  *
  * The routing probe is a `count()` that picks exactly one plan — but a
  * naive `df.count()` followed by building the chosen plan over `df`
  * executes the input lineage TWICE. Over a bare parquet scan that is
  * fine (a columnless count reads only row-group metadata, and the
  * re-scan is the plan's first read anyway); over a DERIVED frame
  * (filters, joins, computed columns) it means paying the full upstream
  * computation once for the probe and again for the answer.
  *
  * [[count]] routes on plan shape: bare scans (a leaf relation,
  * optionally under aliases / pure column-pruning projections) count
  * directly and are returned untouched; anything derived is
  * `localCheckpoint(eager = false)`-barriered first, so the probe's
  * count materializes the checkpoint once and the chosen plan reads the
  * materialized blocks instead of re-executing the lineage. Routing
  * stays value-identical either way — only the number of executions of
  * the upstream plan changes.
  */
object SizeProbe {

  /** True when `count()` over this plan is already single-scan cheap:
    * nothing above the leaf but aliases and attribute-only projections
    * (no filters, joins, generators, or computed columns). */
  private def bareScan(plan: LogicalPlan): Boolean = plan match {
    case Project(ps, child) if ps.forall(_.isInstanceOf[Attribute]) =>
      bareScan(child)
    case SubqueryAlias(_, child) => bareScan(child)
    case _: LeafNode => true
    case _ => false
  }

  /** (row count, frame to build the routed plan over). The returned
    * frame is the input itself for bare scans, or a lazily-checkpointed
    * barrier (already materialized by the probe) for derived frames. */
  def count(df: DataFrame): (Long, DataFrame) =
    if (bareScan(df.queryExecution.analyzed)) (df.count(), df)
    else {
      val cp = df.localCheckpoint(eager = false)
      (cp.count(), cp)
    }
}
