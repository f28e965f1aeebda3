package graft.queries

import graft.core.{Q, Tables}
import org.apache.spark.sql.functions._

/** Typed Dataset[T] API surface: `groupByKey` + `cogroupSorted` — Spark's
  * escape hatch for genuinely imperative per-group logic (custom state
  * machines, sequence algorithms) that SQL windows express awkwardly.
  *
  * Honest tradeoff, stated up front: CoGroupExec shuffles BOTH sides and
  * runs the lambda on deserialized objects outside whole-stage codegen —
  * for anything an aggregate/window can express, the declarative form is
  * the production plan (and this query's DuckDB oracle IS that window
  * form, which is the row-for-row proof the two routes agree). The entry
  * exists because a complete engine must offer the typed route, and
  * because `cogroupSorted` is the SCALABLE way to take it: the secondary
  * sort happens inside the shuffle (sort-based, spillable), so the lambda
  * streams each group in order with O(1) memory — no per-group
  * materialize-and-sort, no OOM on a hot key.
  */
object TypedQueries {

  final case class CCust(c_custkey: Long, c_mktsegment: String)
  final case class COrd(
      o_custkey: Long,
      o_orderdate: java.sql.Timestamp,
      o_orderkey: Long,
      o_totalprice: Double)

  val all: Seq[Q] = Seq(
    // Per customer (having orders): order count and the longest strictly-
    // increasing run of order totals in (orderdate, orderkey) order — an
    // imperative one-pass scan per group in the typed lambda; lag/run-id
    // windows in the oracle twin.
    Q("q_typed_cogroup",
      """WITH w1 AS (
        |  SELECT o_custkey, o_orderdate, o_orderkey, o_totalprice,
        |    CASE WHEN lag(o_totalprice) OVER (PARTITION BY o_custkey
        |             ORDER BY o_orderdate, o_orderkey) IS NULL
        |           OR o_totalprice <= lag(o_totalprice) OVER (PARTITION BY o_custkey
        |             ORDER BY o_orderdate, o_orderkey)
        |         THEN 1 ELSE 0 END AS brk
        |  FROM orders),
        |w2 AS (
        |  SELECT o_custkey,
        |    SUM(brk) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |                   ROWS UNBOUNDED PRECEDING) AS run_id
        |  FROM w1),
        |runs AS (
        |  SELECT o_custkey, run_id, COUNT(*) AS run_len
        |  FROM w2 GROUP BY o_custkey, run_id),
        |agg AS (
        |  SELECT o_custkey, CAST(SUM(run_len) AS BIGINT) AS n_orders,
        |         MAX(run_len) AS max_run
        |  FROM runs GROUP BY o_custkey)
        |SELECT c.c_custkey, c.c_mktsegment, a.n_orders, a.max_run
        |FROM agg a JOIN customer c ON c.c_custkey = a.o_custkey
        |ORDER BY c.c_custkey""".stripMargin) { (s, d) =>
      import s.implicits._
      val cs = Tables.customer(s, d)
        .select(col("c_custkey"), col("c_mktsegment"))
        .as[CCust].groupByKey(_.c_custkey)
      val os = Tables.orders(s, d)
        .select(col("o_custkey"), col("o_orderdate"), col("o_orderkey"),
          col("o_totalprice"))
        .as[COrd].groupByKey(_.o_custkey)
      cs.cogroupSorted(os)()(col("o_orderdate"), col("o_orderkey")) {
        (k, cIt, oIt) =>
          if (!cIt.hasNext) Iterator.empty
          else {
            val seg = cIt.next().c_mktsegment
            var n = 0L; var run = 0L; var best = 0L; var prev = 0.0
            oIt.foreach { o =>
              run = if (n == 0L || o.o_totalprice <= prev) 1L else run + 1L
              if (run > best) best = run
              prev = o.o_totalprice
              n += 1
            }
            if (n == 0L) Iterator.empty
            else Iterator((k, seg, n, best))
          }
      }.toDF("c_custkey", "c_mktsegment", "n_orders", "max_run")
        .orderBy("c_custkey")
    }
  )
}
