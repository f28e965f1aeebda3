package graft.queries

import graft.core.{Q, Tables}
import graft.operators.PageRank
import org.apache.spark.sql.functions._

/** Iterative graph analytics over the star schema's implicit graph.
  * ScalaTest-gated (GraphSpec) against an in-JVM reference run —
  * tolerance-gated (FP summation order), with the mass-conservation
  * invariant asserted exactly.
  */
object GraphQueries {

  val all: Seq[Q] = Seq(
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
