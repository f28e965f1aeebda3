package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Iterative score propagation (PageRank) as pure DataFrame iterations —
  * the engine's proof that iterative graph algorithms run as a sequence of
  * declarative joins, not a specialized runtime.
  *
  * Per iteration: contributions = edges ⨝ ranks on src (edges carry the
  * precomputed out-degree, so the contribution is rank/outdeg row-locally),
  * then one map-side-combinable groupBy dst. The edge frame is
  * materialized ONCE (localCheckpoint) and every iteration joins against
  * it; at cluster scale the edges would be written bucketed by src so the
  * per-iteration join needs no edge-side shuffle at all
  * ([[BucketedLayout]] is that seam). Rank-frame lineage is truncated
  * every `checkpointEvery` iterations — without it, iteration k's plan
  * contains k copies of the join tree and the driver dies long before the
  * executors do.
  *
  * Dangling nodes (out-degree 0) would leak rank mass; callers either
  * symmetrize the graph (every endpoint then has outdeg ≥ 1 — what
  * [[supplierCustomerGraph]] does) or accept the standard mass leak. The
  * node count N rides in-plan via a broadcast one-row frame — no literal
  * baked from a collect, so the plan stays lazy end to end.
  */
object PageRank {

  /** ranks(node, rank) after `iters` damped iterations over edges(src,
    * dst). Requires every node to appear as a src (no dangling). */
  def run(edges: DataFrame, iters: Int, damping: Double = 0.85,
          checkpointEvery: Int = 5): DataFrame = {
    val e = edges.select("src", "dst")
      .distinct()
      .localCheckpoint(true) // materialize once; every iteration reuses it
    val outdeg = e.groupBy("src").agg(count(lit(1)).as("outdeg"))
    // hash-partition the materialized edge frame by src: distinct() leaves
    // it partitioned by (src, dst), which would force a fresh edge-side
    // exchange EVERY iteration; partitioned by src, only the rank side
    // moves per iteration (the in-session analogue of bucketing by src)
    val withDeg = e.join(outdeg, "src")
      .repartition(col("src")).localCheckpoint(true)
    // One-row node-count frame, crossed onto node-sized frames only (the
    // broadcast-one-row-stats idiom; never a data-sized cross join).
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
      .localCheckpoint(true)
    val nFrame = broadcast(nodes.agg(count(lit(1)).as("n_nodes")))
    var ranks = nodes.crossJoin(nFrame)
      .select(col("node"), (lit(1.0) / col("n_nodes")).as("rank"))
    var i = 0
    while (i < iters) {
      val contribs = withDeg
        .join(ranks.withColumnRenamed("node", "src"), "src")
        .select(col("dst").as("node"), (col("rank") / col("outdeg")).as("c"))
        .groupBy("node").agg(sum(col("c")).as("contrib"))
      ranks = contribs.crossJoin(nFrame)
        .select(col("node"),
          (lit(1.0 - damping) / col("n_nodes") +
            lit(damping) * col("contrib")).as("rank"))
      if ((i + 1) % checkpointEvery == 0 && i + 1 < iters)
        ranks = ranks.localCheckpoint(true)
      i += 1
    }
    ranks
  }

  /** The fixture graph: supplier↔customer trade edges from lineitem ⨝
    * orders, symmetrized (both directions) so no node dangles. Node ids
    * disambiguate the two key spaces: supplier s ↦ 2s, customer c ↦ 2c+1. */
  def supplierCustomerGraph(lineitem: DataFrame, orders: DataFrame): DataFrame = {
    val pairs = lineitem.select("l_orderkey", "l_suppkey")
      .join(orders.select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .select((col("l_suppkey") * 2).as("s"), (col("o_custkey") * 2 + 1).as("c"))
      .distinct()
    pairs.select(col("s").as("src"), col("c").as("dst"))
      .union(pairs.select(col("c").as("src"), col("s").as("dst")))
  }

  /** Integer-unit ("fixed-point") PageRank: ranks in units of
    * 1/`unit`, every operation exact integer arithmetic — so the
    * result is deterministic TO THE BIT across engines, partitionings
    * and summation orders (integer addition commutes), and the
    * iterative-graph shape gets a real DuckDB ORACLE
    * (q_graph_pagerank) instead of the float cap's tolerance gate.
    *
    * Semantics per iteration (the standard damped walk, truncating):
    *   dr(u)   = (r(u)·85) div 100                  — damped mass
    *   share   = dr(u) div outdeg(u) per out-edge   — contribution
    *   dang    = Σ dr(u) over nodes with no out-edge
    *   r'(v)   = (unit·15/100) div n + dang div n + Σ in-shares
    * Every div is the exactly-divisible (x − x%d)/d form — it
    * TRUNCATES identically everywhere instead of rounding; the mass
    * lost under the floor (≤ |edges| + 2·|nodes| units per iteration,
    * ~1e-10 of total at the default unit) is part of the defined
    * semantics, not error.
    *
    * Shape: identical to [[run]] — edges materialized once and joined
    * per iteration, one groupBy(dst) sum, dangling mass and node count
    * as broadcast one-row frames (no driver action inside the loop). */
  def fixedPoint(edges: DataFrame, iters: Int,
                 unit: Long = 1000000000000L): DataFrame = {
    require(unit % 100 == 0, s"unit must be a multiple of 100: $unit")
    def tdiv(x: Column, d: Column): Column = ((x - x % d) / d).cast("long")
    val e = edges.select("src", "dst").distinct().localCheckpoint(true)
    val deg = e.groupBy("src").agg(count(lit(1)).as("d"))
    val withDeg = e.join(deg, "src")
      .repartition(col("src")).localCheckpoint(true)
    val nodes = e.select(col("src").as("v"))
      .union(e.select(col("dst").as("v"))).distinct().localCheckpoint(true)
    val srcs = e.select(col("src").as("v")).distinct()
    val nF = broadcast(nodes.agg(count(lit(1)).as("n")))
    var r = nodes.crossJoin(nF)
      .select(col("v"), tdiv(lit(unit), col("n")).as("r"))
    for (_ <- 1 to iters) {
      val damped = r.select(col("v"), tdiv(col("r") * 85, lit(100)).as("dr"))
      val contrib = withDeg
        .join(damped.withColumnRenamed("v", "src"), "src")
        .select(col("dst").as("v"), tdiv(col("dr"), col("d")).as("share"))
        .groupBy("v").agg(sum("share").as("c"))
      val dang = broadcast(damped.join(srcs, Seq("v"), "left_anti")
        .agg(coalesce(sum("dr"), lit(0L)).as("dm")))
      r = nodes.crossJoin(nF).crossJoin(dang)
        .join(contrib, Seq("v"), "left")
        .select(col("v"),
          (tdiv(lit(unit / 100 * 15), col("n")) +
            tdiv(col("dm"), col("n")) +
            coalesce(col("c"), lit(0L))).as("r"))
        // lineage cut per round (lazy — materializes with the next
        // action): without it iteration k's plan nests k copies of the
        // join tree, exactly the bloat [[run]]'s checkpointEvery guards
        .localCheckpoint(false)
    }
    r
  }

  /** Reference in-JVM PageRank over a collected edge list — the spec's
    * ground truth. Same formula; summation order differs, so comparisons
    * are tolerance-gated (FP associativity), not bitwise. */
  def referenceRun(edges: Seq[(Long, Long)], iters: Int,
                   damping: Double = 0.85): Map[Long, Double] = {
    val e = edges.distinct
    val outdeg = e.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    val nodes = (e.map(_._1) ++ e.map(_._2)).distinct
    val n = nodes.size
    var ranks = nodes.map(_ -> 1.0 / n).toMap
    val byDst = e.groupBy(_._2)
    for (_ <- 0 until iters) {
      ranks = nodes.map { v =>
        val contrib = byDst.getOrElse(v, Nil)
          .map { case (s, _) => ranks(s) / outdeg(s) }.sum
        v -> ((1.0 - damping) / n + damping * contrib)
      }.toMap
    }
    ranks
  }
}
