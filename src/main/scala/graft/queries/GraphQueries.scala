package graft.queries

import graft.core.{Q, Tables}
import graft.operators.{HierarchyFlatten, PageRank}
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
    },

    // Fixed-point PageRank — the iterative-graph shape made ORACLE-
    // EXACT. cap_graph_pagerank above runs the float formulation
    // (tolerance-gated: FP summation order); this twin runs the SAME
    // per-iteration shape (edges⨝ranks, groupBy(dst), broadcast
    // dangling/teleport terms) in integer units of 1e-12 with
    // truncating division, so integer-sum commutativity makes the
    // result bit-identical across engines and partitionings, and the
    // DuckDB hash gate pins all three iterations. The graph is the
    // deterministic 97-residue hash graph over orders (dense, with
    // dangling nodes so the redistribution term is exercised). The
    // oracle is the same recurrence unrolled as three CTE blocks.
    Q("q_graph_pagerank", {
      def it(i: Int): String = s"""
        |damp$i AS (
        |  SELECT v, CAST((r*85 - (r*85) % 100) / 100 AS BIGINT) AS dr
        |  FROM r${i - 1}),
        |contrib$i AS (
        |  SELECT e.dst AS v,
        |    CAST(SUM(CAST((dm.dr - dm.dr % dg.d) / dg.d AS BIGINT)) AS BIGINT) AS c
        |  FROM edges e
        |  JOIN damp$i dm ON dm.v = e.src
        |  JOIN deg dg ON dg.src = e.src
        |  GROUP BY e.dst),
        |dang$i AS (
        |  SELECT CAST(COALESCE(SUM(dr), 0) AS BIGINT) AS dm FROM damp$i
        |  WHERE v NOT IN (SELECT src FROM edges)),
        |r$i AS (
        |  SELECT n.v,
        |    CAST((150000000000 - 150000000000 % nn.n) / nn.n AS BIGINT)
        |    + CAST((da.dm - da.dm % nn.n) / nn.n AS BIGINT)
        |    + COALESCE(c.c, 0) AS r
        |  FROM nodes n CROSS JOIN nn CROSS JOIN dang$i da
        |  LEFT JOIN contrib$i c ON c.v = n.v),""".stripMargin
      s"""WITH edges AS (
        |  SELECT DISTINCT o_custkey % 97 AS src, o_orderkey % 97 AS dst
        |  FROM orders WHERE o_custkey % 97 <> o_orderkey % 97),
        |nodes AS (SELECT src AS v FROM edges UNION SELECT dst FROM edges),
        |nn AS (SELECT COUNT(*) AS n FROM nodes),
        |deg AS (SELECT src, COUNT(*) AS d FROM edges GROUP BY src),
        |r0 AS (
        |  SELECT v, CAST((1000000000000 - 1000000000000 % nn.n) / nn.n
        |    AS BIGINT) AS r
        |  FROM nodes CROSS JOIN nn),${it(1)}${it(2)}
        |${it(3).stripSuffix(",")}
        |SELECT v, r AS rank_units FROM r3 ORDER BY v""".stripMargin
    }) { (s, d) =>
      val edges = Tables.orders(s, d)
        .select((col("o_custkey") % 97).as("src"),
          (col("o_orderkey") % 97).as("dst"))
        .where(col("src") =!= col("dst"))
      PageRank.fixedPoint(edges, iters = 3)
        .select(col("v"), col("r").as("rank_units"))
        .orderBy("v")
    },

    // Bounded-round label propagation — the connected-components
    // primitive as an ORACLE query: three min-label rounds over a
    // SPARSE deterministic graph (2 % of orders drawn into a 10007-
    // residue space ⇒ thousands of small components, most of which do
    // NOT converge in 3 rounds — the oracle pins the exact 3-round
    // state, which is well-defined because integer MIN is idempotent
    // and order-free). One equi-join + one groupBy(min) per round, no
    // driver-side frontier; the production pointer-jumping variant
    // (O(log diameter), operators/DedupGroups) is suite-gated — this
    // pins the plain-propagation semantics both share.
    Q("q_graph_labelprop", {
      def round(i: Int): String = s"""
        |l$i AS (
        |  SELECT l.v, LEAST(l.lbl, COALESCE(m.nm, l.lbl)) AS lbl
        |  FROM l${i - 1} l LEFT JOIN (
        |    SELECT ue.a AS v, MIN(lp.lbl) AS nm
        |    FROM ue JOIN l${i - 1} lp ON lp.v = ue.b
        |    GROUP BY ue.a) m ON m.v = l.v),""".stripMargin
      s"""WITH e0 AS (
        |  SELECT DISTINCT o_custkey % 10007 AS a, o_orderkey % 10007 AS b
        |  FROM orders
        |  WHERE o_orderkey % 50 = 0 AND o_custkey % 10007 <> o_orderkey % 10007),
        |ue AS (SELECT a, b FROM e0 UNION SELECT b AS a, a AS b FROM e0),
        |l0 AS (SELECT DISTINCT a AS v, a AS lbl FROM ue),${round(1)}${round(2)}
        |${round(3).stripSuffix(",")}
        |SELECT lbl, COUNT(*) AS n_nodes, CAST(SUM(v) AS BIGINT) AS v_sum
        |FROM l3 GROUP BY lbl ORDER BY lbl""".stripMargin
    }) { (s, d) =>
      val e0 = Tables.orders(s, d)
        .where(col("o_orderkey") % 50 === 0)
        .select((col("o_custkey") % 10007).as("a"),
          (col("o_orderkey") % 10007).as("b"))
        .where(col("a") =!= col("b")).distinct()
      val ue = e0.union(e0.select(col("b").as("a"), col("a").as("b")))
        .distinct()
      var l = ue.select(col("a").as("v")).distinct()
        .withColumn("lbl", col("v"))
      for (_ <- 1 to 3) {
        val nm = ue.join(l.select(col("v").as("b"), col("lbl")), "b")
          .groupBy(col("a").as("v")).agg(min("lbl").as("nm"))
        l = l.join(nm, Seq("v"), "left")
          .select(col("v"),
            least(col("lbl"), coalesce(col("nm"), col("lbl"))).as("lbl"))
          .localCheckpoint(false) // per-round lineage cut (DedupGroups shape)
      }
      l.groupBy("lbl")
        .agg(count(lit(1)).as("n_nodes"), sum("v").cast("long").as("v_sum"))
        .orderBy("lbl")
    },

    // Hierarchy flatten — the recursive-query shape (org chart, BOM,
    // category tree): per node, its root and depth in a parent-pointer
    // forest. The forest derives deterministically from the supplier key
    // space (contiguous 0..N−1 at every sf, FIXTURES.md): roots are
    // keys < 3, everything else parents to k div 3 — so both engines
    // build the identical forest and the oracle can state the semantics
    // as the ANSI recursive CTE it is.
    //
    // The oracle's WITH RECURSIVE descends one LEVEL per iteration
    // (O(depth) rounds); the Spark side routes through
    // [[graft.operators.HierarchyFlatten]]'s pointer DOUBLING —
    // ⌈log₂ depth⌉+1 self-join rounds, each a hash-partitioned
    // equi-join with no driver-side frontier (StressSpec gates the
    // round count on a 4095-deep chain). Same answer, exponentially
    // fewer rounds — the formulation that survives deep hierarchies at
    // 100 TB.
    Q("q_hierarchy_flatten",
      """WITH RECURSIVE h AS (
        |  SELECT s_suppkey AS node, s_suppkey AS root, 0 AS depth
        |  FROM supplier WHERE s_suppkey < 3
        |  UNION ALL
        |  SELECT s.s_suppkey, h.root, h.depth + 1
        |  FROM supplier s JOIN h ON s.s_suppkey // 3 = h.node
        |  WHERE s.s_suppkey >= 3)
        |SELECT node, root, depth FROM h ORDER BY node""".stripMargin) {
      (s, d) =>
        val nodes = Tables.supplier(s, d).select(
          col("s_suppkey").as("v"),
          when(col("s_suppkey") < 3, col("s_suppkey"))
            .otherwise(expr("s_suppkey div 3")).as("parent"))
        HierarchyFlatten.flatten(nodes)
          .select(col("v").as("node"), col("root"),
            col("depth").cast("int").as("depth"))
          .orderBy("node")
    },

    // Subtree rollup — the BOM-explosion report: per node, how many
    // descendants it has and their key sum, over the same deterministic
    // supplier forest as q_hierarchy_flatten. The oracle materializes
    // the proper-ancestor relation with WITH RECURSIVE and groups by
    // ancestor; the engine builds the identical relation by PATH
    // DOUBLING (P ← P ∪ P∘P — ⌈log₂ depth⌉ self-join rounds, see
    // [[graft.operators.HierarchyFlatten.ancestors]] for the Σdepth
    // size bound and when to prefer flatten()). Leaves surface with
    // zero counts via the left join back to the node set.
    Q("q_hierarchy_subtree",
      """WITH RECURSIVE anc AS (
        |  SELECT s_suppkey AS node, s_suppkey // 3 AS anc
        |  FROM supplier WHERE s_suppkey >= 3
        |  UNION ALL
        |  SELECT a.node, s.s_suppkey // 3
        |  FROM anc a JOIN supplier s ON a.anc = s.s_suppkey
        |  WHERE s.s_suppkey >= 3),
        |agg AS (
        |  SELECT anc, COUNT(*) AS n, SUM(node) AS ks
        |  FROM anc GROUP BY anc)
        |SELECT s.s_suppkey AS node,
        |  CAST(COALESCE(agg.n, 0) AS BIGINT) AS n_desc,
        |  CAST(COALESCE(agg.ks, 0) AS BIGINT) AS desc_key_sum
        |FROM supplier s LEFT JOIN agg ON s.s_suppkey = agg.anc
        |ORDER BY node""".stripMargin) { (s, d) =>
      val nodes = Tables.supplier(s, d).select(
        col("s_suppkey").as("v"),
        when(col("s_suppkey") < 3, col("s_suppkey"))
          .otherwise(expr("s_suppkey div 3")).as("parent"))
      val agg = HierarchyFlatten.ancestors(nodes)
        .groupBy("anc")
        .agg(count(lit(1)).as("n"), sum(col("v")).as("ks"))
      nodes.select(col("v").as("node"))
        .join(agg, col("node") === col("anc"), "left")
        .select(col("node"),
          coalesce(col("n"), lit(0L)).cast("long").as("n_desc"),
          coalesce(col("ks"), lit(0L)).cast("long").as("desc_key_sum"))
        .orderBy("node")
    },

    // Triangle counting on the supplier co-trade graph — the clustering
    // primitive of graph analytics. Edges: supplier pairs that co-occur
    // in ≥ 4 orders (the threshold keeps the graph sparse as sf grows —
    // co-occurrence counts concentrate, raw pair existence saturates).
    // Triangles are enumerated over the ORDERED edge list (s1 < s2
    // everywhere), so each triangle appears exactly once as a < b < c:
    // wedge join (e1.b = e2.a) + closing-edge check. Scale shape: see
    // [[graft.operators.CoTradeGraph]] — the edge build the oracle
    // states as a fact self-join runs as ONE fact exchange + row-local
    // roster pair expansion (bounded by lines-per-order); the wedge
    // join is edge⨝edge on a key — Σ_a deg(a)² work, the standard
    // distributed triangle bound. No driver state, no broadcast of
    // anything data-sized.
    Q("q_graph_triangles",
      """WITH co AS (
        |  SELECT a.l_suppkey AS s1, b.l_suppkey AS s2
        |  FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey
        |  WHERE a.l_suppkey < b.l_suppkey
        |  GROUP BY 1, 2 HAVING COUNT(*) >= 4),
        |t AS (
        |  SELECT e1.s1 AS a, e1.s2 AS b, e2.s2 AS c
        |  FROM co e1 JOIN co e2 ON e1.s2 = e2.s1
        |  JOIN co e3 ON e3.s1 = e1.s1 AND e3.s2 = e2.s2)
        |SELECT a AS s_min, COUNT(*) AS n_tri,
        |  CAST(SUM(b + c) AS BIGINT) AS peer_sum
        |FROM t GROUP BY a ORDER BY s_min""".stripMargin) { (s, d) =>
      val co = graft.operators.CoTradeGraph.edges(
        Tables.lineitem(s, d).select("l_orderkey", "l_suppkey"))
      graft.operators.CoTradeGraph.triangles(co)
        .groupBy(col("a").as("s_min"))
        .agg(count(lit(1)).as("n_tri"),
          sum(col("b") + col("c")).cast(LongType).as("peer_sum"))
        .orderBy("s_min")
    },

    // Degree assortativity of the supplier co-occurrence graph (the
    // q_graph_triangles edge rule: ≥4 shared orders, s1 < s2): do
    // well-connected suppliers co-ship with other well-connected ones?
    // Over the DIRECTED edge list the endpoint-degree correlation is
    // symmetric (Σx = Σy, varx = vary), so Pearson r collapses to the
    // single exact rational cov_num/var_num with cov_num = 4e·Σxy − Sx²
    // and var_num = 2e·Σxx2 − Sx² (Sx = Σ(x+y), Σxx2 = Σ(x²+y²)) —
    // one IEEE divide, no sqrt.
    //
    // Scale shape: the per-order self-join is the one row-scale pass
    // (bounded fan-out per order); the edge frame is node²-bounded and
    // checkpointed; degrees and both 1-row aggregates ride it.
    Q("q_graph_assortativity",
      """WITH co AS (
        |  SELECT a.l_suppkey AS s1, b.l_suppkey AS s2
        |  FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey
        |  WHERE a.l_suppkey < b.l_suppkey
        |  GROUP BY 1, 2 HAVING COUNT(*) >= 4),
        |nodes AS (SELECT s1 AS v FROM co UNION ALL SELECT s2 FROM co),
        |deg AS (SELECT v, CAST(COUNT(*) AS BIGINT) AS dg
        |        FROM nodes GROUP BY v),
        |j AS (
        |  SELECT d1.dg AS x, d2.dg AS y
        |  FROM co JOIN deg d1 ON co.s1 = d1.v
        |    JOIN deg d2 ON co.s2 = d2.v),
        |a AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS e,
        |    CAST(SUM(x + y) AS BIGINT) AS sx,
        |    CAST(SUM(x * y) AS BIGINT) AS sxy,
        |    CAST(SUM(x * x + y * y) AS BIGINT) AS sxx2
        |  FROM j),
        |nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_nodes FROM deg)
        |SELECT n_nodes, e AS n_edges,
        |  CAST(4 * e * sxy - sx * sx AS BIGINT) AS cov_num,
        |  CAST(2 * e * sxx2 - sx * sx AS BIGINT) AS var_num,
        |  CASE WHEN 2 * e * sxx2 - sx * sx = 0 THEN NULL
        |    ELSE CAST(4 * e * sxy - sx * sx AS DOUBLE)
        |      / CAST(2 * e * sxx2 - sx * sx AS DOUBLE) END
        |    AS assortativity
        |FROM a CROSS JOIN nn""".stripMargin) { (s, d) =>
      val co = graft.operators.CoTradeGraph.edges(
        Tables.lineitem(s, d).select("l_orderkey", "l_suppkey"))
      val deg = graft.operators.CoTradeGraph.degrees(co)
      val j = co
        .join(deg.toDF("v1", "x"), col("s1") === col("v1"))
        .join(deg.toDF("v2", "y"), col("s2") === col("v2"))
        .select("x", "y")
      val a = j.agg(count(lit(1)).cast(LongType).as("e"),
        sum(col("x") + col("y")).cast(LongType).as("sx"),
        sum(col("x") * col("y")).cast(LongType).as("sxy"),
        sum(col("x") * col("x") + col("y") * col("y"))
          .cast(LongType).as("sxx2"))
      val nn = deg.agg(count(lit(1)).cast(LongType).as("n_nodes"))
      a.crossJoin(broadcast(nn))
        .selectExpr("n_nodes", "e AS n_edges",
          "CAST(4 * e * sxy - sx * sx AS BIGINT) AS cov_num",
          "CAST(2 * e * sxx2 - sx * sx AS BIGINT) AS var_num",
          "CASE WHEN 2 * e * sxx2 - sx * sx = 0 THEN NULL" +
            " ELSE CAST(4 * e * sxy - sx * sx AS DOUBLE)" +
            " / CAST(2 * e * sxx2 - sx * sx AS DOUBLE) END" +
            " AS assortativity")
    },

    // Global clustering coefficient of the same co-occurrence graph:
    // 3·triangles / wedges, with wedges Σ C(deg,2) computed from the
    // degree frame (dg·(dg−1) is even per term, so the /2 is
    // exactly-divisible and IEEE-exact) and triangles counted from the
    // SAME CoTradeGraph.triangles wedge pass q_graph_triangles rolls up
    // — one shared enumeration shape, not a re-derivation. How
    // clique-ish is the supply network — one exact rational plus its
    // one-divide double.
    //
    // Scale shape: identical to q_graph_triangles (Σ deg² wedge join on
    // the checkpointed node²-bounded edge frame); the degree rollup and
    // both 1-row aggregates are metadata.
    Q("q_graph_clustering",
      """WITH co AS (
        |  SELECT a.l_suppkey AS s1, b.l_suppkey AS s2
        |  FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey
        |  WHERE a.l_suppkey < b.l_suppkey
        |  GROUP BY 1, 2 HAVING COUNT(*) >= 4),
        |nodes AS (SELECT s1 AS v FROM co UNION ALL SELECT s2 FROM co),
        |deg AS (SELECT v, CAST(COUNT(*) AS BIGINT) AS dg
        |        FROM nodes GROUP BY v),
        |tri AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS t
        |  FROM co e1 JOIN co e2 ON e1.s2 = e2.s1
        |    JOIN co e3 ON e3.s1 = e1.s1 AND e3.s2 = e2.s2),
        |wg AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n_nodes,
        |    CAST(SUM(dg * (dg - 1)) / 2 AS BIGINT) AS wedges
        |  FROM deg)
        |SELECT n_nodes, t AS n_triangles, wedges,
        |  CASE WHEN wedges = 0 THEN NULL
        |    ELSE CAST(3 * t AS DOUBLE) / CAST(wedges AS DOUBLE) END
        |    AS clustering
        |FROM wg CROSS JOIN tri""".stripMargin) { (s, d) =>
      val co = graft.operators.CoTradeGraph.edges(
        Tables.lineitem(s, d).select("l_orderkey", "l_suppkey"))
      val deg = graft.operators.CoTradeGraph.degrees(co)
      val tri = graft.operators.CoTradeGraph.triangles(co)
        .agg(count(lit(1)).cast(LongType).as("t"))
      val wg = deg.agg(count(lit(1)).cast(LongType).as("n_nodes"),
        (sum(col("dg") * (col("dg") - 1)) / 2).cast(LongType).as("wedges"))
      wg.crossJoin(broadcast(tri))
        .selectExpr("n_nodes", "t AS n_triangles", "wedges",
          "CASE WHEN wedges = 0 THEN NULL" +
            " ELSE CAST(3 * t AS DOUBLE) / CAST(wedges AS DOUBLE) END" +
            " AS clustering")
    }
  )
}
