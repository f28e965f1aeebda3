package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Window}

/** Analysis check rule encoding the 100 TB window discipline: a window
  * with an ORDER BY but no PARTITION BY moves the entire input into ONE
  * task — correct on a laptop, a job-killer at scale (the round-1
  * q_window_ntile shape). With `spark.graft.failUnpartitionedWindow=true`
  * analysis fails fast instead of shipping the plan; off (default) it is
  * silent, because metadata-scale uses over aggregated inputs (histogram
  * offsets in HistogramRank/q_window_ntile) are legitimate and the caller
  * opts into strictness per session or per pipeline.
  *
  * Injected via `spark.sql.extensions=graft.GraftExtensions`
  * (injectCheckRule) — the third extension surface next to the codegen
  * expression (graft_dot) and the planner strategy (as-of join).
  */
class UnpartitionedWindowCheck(session: SparkSession)
    extends (LogicalPlan => Unit) {

  override def apply(plan: LogicalPlan): Unit = {
    val strict = session.conf
      .getOption("spark.graft.failUnpartitionedWindow").contains("true")
    if (strict) {
      plan.foreach {
        case w: Window if w.partitionSpec.isEmpty && w.orderSpec.nonEmpty =>
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
