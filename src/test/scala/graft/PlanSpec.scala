package graft

/** SURVEY §4.2 physical-plan assertions: the optimizations the 100 TB
  * design depends on must actually appear in the executed plan.
  */
class PlanSpec extends SparkSuite {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf("0.001")).queryExecution.executedPlan.toString

  test("filter+projection reach the parquet scan") {
    val p = plan("q_scan_filter_pushdown")
    assert(p.contains("PushedFilters: ["), "expected parquet PushedFilters")
    assert(p.contains("l_returnflag"), "returnflag filter should be pushed")
    // column pruning: the scan must not read all 11 lineitem columns
    assert(!p.contains("l_partkey"), "unused columns should be pruned from the scan")
  }

  test("broadcast hint produces BroadcastHashJoin") {
    assert(plan("q_join_broadcast").contains("BroadcastHashJoin"))
  }

  test("merge hint produces SortMergeJoin") {
    assert(plan("q_join_sortmerge").contains("SortMergeJoin"))
  }

  test("global top-k fuses to TakeOrderedAndProject (no full sort)") {
    assert(plan("q_topk_global").contains("TakeOrderedAndProject"))
  }

  test("flagship aggregates run partial+final (map-side combine)") {
    val p = plan("q_agg_pricing_summary")
    assert(p.contains("HashAggregate"))
    assert("HashAggregate".r.findAllIn(p).size >= 2, "expected partial+final agg")
  }

  test("whole-stage codegen covers the flagship pipeline") {
    // AQE wraps the plan lazily and hides codegen spans from toString →
    // inspect the non-adaptive physical plan for this assertion only.
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      // "*(n)" prefixes mark WholeStageCodegen stages in the compact plan
      val p = plan("q_agg_pricing_summary")
      assert(p.contains("*(1)") && p.contains("*(2)"),
        "expected at least two whole-stage-codegen spans")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }
}
