package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Deduplicate, LogicalPlan, Window}

/** Analysis check rule encoding the 100 TB window discipline: a window
  * with an ORDER BY but no PARTITION BY moves the entire input into ONE
  * task — correct on a laptop, a job-killer at scale (the round-1
  * q_window_ntile shape). With `spark.graft.failUnpartitionedWindow=true`
  * analysis fails fast instead of shipping the plan.
  *
  * Exemption: a global window whose input is an unbroken UNARY chain
  * down to an Aggregate is metadata-scale by construction (histogram
  * offsets in HistogramRank / q_window_ntile — the input cardinality is
  * the group count, not the row count), so it passes even in strict
  * mode. The chain must not cross a Join/Generate/Union: an aggregate in
  * a joined BRANCH does not bound the window's input cardinality (e.g.
  * `fact JOIN (SELECT max(x)…)` is still fact-sized). With this
  * exemption the ENTIRE graft query surface analyzes clean under strict
  * mode (PlanSpec conformance test).
  *
  * Injected via `spark.sql.extensions=graft.GraftExtensions`
  * (injectCheckRule) — the third extension surface next to the codegen
  * expression (graft_dot) and the planner strategy (as-of join).
  */
class UnpartitionedWindowCheck(session: SparkSession)
    extends (LogicalPlan => Unit) {

  @scala.annotation.tailrec
  private def aggBounded(p: LogicalPlan): Boolean = p match {
    case _: Aggregate => true
    // .distinct() analyzes as Deduplicate (the optimizer rewrites it to
    // Aggregate later) — identical group-count cardinality bound
    case _: Deduplicate => true
    case u: org.apache.spark.sql.catalyst.plans.logical.UnaryNode => aggBounded(u.child)
    case _ => false
  }

  override def apply(plan: LogicalPlan): Unit = {
    val strict = session.conf
      .getOption("spark.graft.failUnpartitionedWindow").contains("true")
    if (strict) {
      plan.foreach {
        case w: Window if w.partitionSpec.isEmpty && w.orderSpec.nonEmpty &&
            !aggBounded(w.child) =>
          throw new IllegalStateException(
            "graft strict mode: window with ORDER BY but no PARTITION BY " +
              "single-tasks the whole input at scale; partition the window " +
              "or compute ranks via HistogramRank " +
              s"(offending expressions: ${w.windowExpressions.map(_.name).mkString(", ")})")
        case _ => ()
      }
    }
  }
}
