package graft

import graft.core.Tables
import graft.operators.PageRank

/** PageRank gates: the distributed run must agree with an in-JVM reference
  * on the same edge list (tolerance-gated — only summation order differs),
  * and rank mass must be conserved (the symmetrized graph has no dangling
  * nodes, so the total is exactly 1 up to FP).
  */
class GraphSpec extends SparkSuite {

  private lazy val edgesDf = PageRank.supplierCustomerGraph(
    Tables.lineitem(spark, sf("0.001")), Tables.orders(spark, sf("0.001")))
  private lazy val edges: Seq[(Long, Long)] =
    edgesDf.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
  private lazy val got: Map[Long, Double] =
    PageRank.run(edgesDf, iters = 10).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
  private lazy val want: Map[Long, Double] =
    PageRank.referenceRun(edges, iters = 10)

  test("distributed ranks == reference ranks (1e-9 relative)") {
    assert(got.keySet == want.keySet,
      s"node sets differ: ${got.keySet.size} vs ${want.keySet.size}")
    want.foreach { case (node, w) =>
      val g = got(node)
      assert(math.abs(g - w) <= 1e-9 * math.max(math.abs(w), 1e-12),
        s"node $node: spark=$g ref=$w")
    }
  }

  test("rank mass is conserved on the dangling-free graph") {
    val total = got.values.sum
    assert(math.abs(total - 1.0) < 1e-9, s"sum of ranks = $total")
  }

  test("ranks are non-uniform and the hub agrees with the reference") {
    val (maxN, maxR) = got.maxBy(_._2)
    val (minN, minR) = got.minBy(_._2)
    assert(maxR > minR * 1.01,
      s"degenerate uniform ranks: max($maxN)=$maxR min($minN)=$minR")
    assert(maxN == want.maxBy(_._2)._1)
  }
}
