package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Shared builders for the supplier co-trade graph — the one edge
  * derivation q_graph_triangles / q_graph_clustering /
  * q_graph_assortativity all ride (round-11 verdict item 3: the three
  * queries each rebuilt it independently, and clustering re-enumerated
  * the triangle pass).
  *
  * Edge rule: suppliers co-occur when their LINES share an order; an
  * edge (s1 < s2) exists when the co-occurrence count — Σ over orders of
  * lines(s1)·lines(s2) — reaches `minCo` (the threshold keeps the graph
  * sparse as sf grows: co-occurrence counts concentrate, raw pair
  * existence saturates).
  *
  * The build is NOT the textbook lineitem⨝lineitem self-join the oracle
  * states (two full-fact exchanges + a join): the fact is exchanged
  * ONCE — `groupBy(l_orderkey).collect_list(l_suppkey)` — and the
  * ordered pairs expand ROW-LOCALLY from each order's sorted supplier
  * roster. Fan-out is bounded by lines-per-order (≤ 7 in TPC-H shape,
  * a domain constant like shingle width), so the expansion never
  * amplifies beyond C(lines, 2) per order, and what reaches the pair
  * aggregate is the same multiset of (s1, s2) rows the join would have
  * shuffled — identical counts, half the fact shuffle volume, no join
  * build side. At 100 TB this is the difference between shuffling the
  * fact twice and once.
  *
  * All three downstream queries then share: `degrees` (endpoint counts
  * over the node²-bounded edge frame), and `triangles` (the ordered
  * wedge-close join — Σ_a deg(a)² work, the standard distributed
  * triangle bound). The edge frame is localCheckpoint'ed once per query
  * so its three join uses cost one materialization.
  */
object CoTradeGraph {

  /** Ordered edge list (s1 < s2) with ≥ `minCo` shared order-line
    * pairs, materialized (localCheckpoint) because every consumer joins
    * it against itself at least once. */
  def edges(lineitem: DataFrame, minCo: Long = 4L): DataFrame = {
    val roster = lineitem
      .groupBy(col("l_orderkey"))
      .agg(sort_array(collect_list(col("l_suppkey"))).as("rs"))
      .where(size(col("rs")) >= 2)
    // sorted roster ⇒ for i < j, rs[j] ≥ rs[i]; keeping strictly-greater
    // partners reproduces the join's s1 < s2 multiset exactly (equal-key
    // line pairs never edge)
    roster.select(explode(expr(
        """flatten(transform(rs, (a, i) ->
          |  transform(filter(slice(rs, i + 2, size(rs) - i - 1),
          |                   b -> b > a),
          |    b -> named_struct('s1', a, 's2', b))))""".stripMargin))
        .as("e"))
      .groupBy(col("e.s1").as("s1"), col("e.s2").as("s2"))
      .agg(count(lit(1)).as("nco"))
      .where(col("nco") >= minCo)
      .select("s1", "s2")
      .localCheckpoint(true)
  }

  /** Endpoint degree of every node over the ordered edge list. */
  def degrees(edges: DataFrame): DataFrame =
    edges.select(col("s1").as("v"))
      .unionAll(edges.select(col("s2").as("v")))
      .groupBy("v").agg(count(lit(1)).cast(LongType).as("dg"))

  /** Every triangle a < b < c, enumerated once: wedge join
    * (e1.s2 = e2.s1) + closing-edge semi-check. Both q_graph_triangles'
    * per-vertex rollup and q_graph_clustering's global count aggregate
    * THIS frame — one shared pass shape. */
  def triangles(edges: DataFrame): DataFrame =
    edges.as("e1")
      .join(edges.select(col("s1").as("ws"), col("s2").as("wc")),
        col("s2") === col("ws"))
      .select(col("s1").as("a"), col("s2").as("b"), col("wc").as("c"))
      .join(edges.select(col("s1").as("ca"), col("s2").as("cc")),
        col("a") === col("ca") && col("c") === col("cc"))
      .select("a", "b", "c")
}
