package graft.queries

import graft.core.{Q, Tables}
import graft.operators.PageRank
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Iterative graph analytics over the star schema's implicit graph.
  * ScalaTest-gated (GraphSpec) against an in-JVM reference run —
  * tolerance-gated (FP summation order), with the mass-conservation
  * invariant asserted exactly.
  */
object GraphQueries {

  val all: Seq[Q] = Seq(
    // Degree distribution of the supplier→customer trade graph — the
    // SQL-expressible graph profile (how concentrated is the corpus's
    // connectivity?) that pairs with the iterative cap below. Shape:
    // fact⨝fact join on the order key (both sides hash-shuffled — the
    // honest 100 TB form; neither side is a broadcastable dim), then a
    // two-level aggregate: per-supplier distinct-customer degree
    // (map-side partial distinct on (suppkey, custkey)), then the
    // metadata-sized histogram. supp_sum fingerprints WHICH suppliers
    // sit at each degree, not just how many.
    Q("q_graph_degree",
      """WITH deg AS (
        |  SELECT l_suppkey, COUNT(DISTINCT o_custkey) AS degree
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  GROUP BY l_suppkey)
        |SELECT degree, COUNT(*) AS n_suppliers,
        |  CAST(SUM(l_suppkey) AS BIGINT) AS supp_sum
        |FROM deg GROUP BY degree ORDER BY degree""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d).select("l_orderkey", "l_suppkey")
        .join(Tables.orders(s, d).select("o_orderkey", "o_custkey"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("l_suppkey")
        .agg(countDistinct(col("o_custkey")).as("degree"))
        .groupBy("degree")
        .agg(count(lit(1)).as("n_suppliers"),
          sum(col("l_suppkey")).cast(LongType).as("supp_sum"))
        .orderBy("degree")
    },

    // Damped PageRank on the symmetrized supplier↔customer trade graph:
    // 10 iterations, each one join + one aggregation over a materialized
    // edge frame. Output is the top-20 hub nodes with the key space
    // decoded back to (kind, key).
    Q.cap("cap_graph_pagerank") { (s, d) =>
      val edges = PageRank.supplierCustomerGraph(
        Tables.lineitem(s, d), Tables.orders(s, d))
      PageRank.run(edges, iters = 10)
        .select(
          when(col("node") % 2 === 0, "supplier").otherwise("customer")
            .as("kind"),
          expr("node div 2").as("key"),
          col("rank"))
        .orderBy(desc("rank"), col("kind"), col("key"))
        .limit(20)
    }
  )
}
