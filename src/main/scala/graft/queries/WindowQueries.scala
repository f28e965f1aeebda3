package graft.queries

import graft.core.{Dsl, Q, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SURVEY §2.5 window functions + §2.6 sorts/top-k.
  *
  * Scale story: every window partitions by an entity key (priority /
  * customer / user) — state per partition stays small and the shuffle is a
  * single hash exchange on that key; no global sorts except the two §2.6
  * queries, where `TakeOrderedAndProject` (top-k) avoids a full sort, and
  * q_sort_multi is a genuine range-partitioned export sort.
  */
object WindowQueries {
  import Dsl._

  val all: Seq[Q] = Seq(
    Q("q_window_rank",
      """SELECT o_orderpriority, o_orderkey, o_totalprice, rn, rk, drk FROM (
        |  SELECT o_orderpriority, o_orderkey, o_totalprice,
        |    row_number() OVER w AS rn, rank() OVER w AS rk, dense_rank() OVER w AS drk
        |  FROM orders
        |  WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey)) t
        |WHERE rk <= 5
        |ORDER BY o_orderpriority, rn""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("o_orderpriority")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables.orders(s, d)
        .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"),
          row_number().over(w).cast("bigint").as("rn"),
          rank().over(w).cast("bigint").as("rk"),
          dense_rank().over(w).cast("bigint").as("drk"))
        .filter(col("rk") <= 5)
        .orderBy("o_orderpriority", "rn")
    },

    Q("q_window_topk_group",
      """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey
        |                       ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders) t
        |WHERE rn <= 3
        |ORDER BY o_custkey, rn""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables.orders(s, d)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
          row_number().over(w).cast("bigint").as("rn"))
        .filter(col("rn") <= 3)
        .orderBy("o_custkey", "rn")
    },

    Q("q_window_lag_lead",
      """SELECT user_id, event_id, ts,
        |  date_diff('microsecond', lag(ts) OVER w, ts) AS gap_us,
        |  lead(event_type) OVER w AS next_type
        |FROM events
        |WHERE user_id < 20
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |ORDER BY user_id, ts, event_id""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      Tables.events(s, d)
        .filter(col("user_id") < 20)
        .select(col("user_id"), col("event_id"), col("ts"),
          expr("timestampdiff(MICROSECOND, lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id), ts)").as("gap_us"),
          lead(col("event_type"), 1).over(w).as("next_type"))
        .orderBy("user_id", "ts", "event_id")
    },

    Q("q_window_running",
      s"""SELECT user_id, event_id, ts, ${d2dSql("run_sum")} AS run_sum FROM (
        |  SELECT user_id, event_id, ts,
        |    CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER (
        |      PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DECIMAL(18,4)) AS run_sum
        |  FROM events) t
        |ORDER BY user_id, ts, event_id""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, d)
        .select(col("user_id"), col("event_id"), col("ts"),
          sum(col("value").cast(D18)).over(w).cast(D18).as("run_sum_dec"))
        .select(col("user_id"), col("event_id"), col("ts"),
          d2d(col("run_sum_dec")).as("run_sum"))
        .orderBy("user_id", "ts", "event_id")
    },

    // 24-hour trailing RANGE frame over epoch-microseconds (epoch seconds
    // would tie-break differently on sub-second data; µs is exact).
    Q("q_window_range_frame",
      s"""SELECT user_id, event_id, cnt_24h, ${d2dSql("sum_24h")} AS sum_24h FROM (
        |  SELECT user_id, event_id,
        |    COUNT(*) OVER w AS cnt_24h,
        |    CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER w AS DECIMAL(18,4)) AS sum_24h
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
        |               RANGE BETWEEN 86400000000 PRECEDING AND CURRENT ROW)) t
        |ORDER BY user_id, event_id""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("user_id")
        .orderBy(expr("unix_micros(cast(ts as timestamp))"))
        .rangeBetween(-86400000000L, 0L)
      Tables.events(s, d)
        .select(col("user_id"), col("event_id"),
          count(lit(1)).over(w).as("cnt_24h"),
          sum(col("value").cast(D18)).over(w).cast(D18).as("sum_24h_dec"))
        .select(col("user_id"), col("event_id"), col("cnt_24h"),
          d2d(col("sum_24h_dec")).as("sum_24h"))
        .orderBy("user_id", "event_id")
    },

    // Sequential-pattern detection (the MATCH_RECOGNIZE shape, expressed
    // as lag windows): customers with runs of 3 strictly-increasing
    // consecutive order totals in order-date sequence. Row-local after
    // ONE per-customer window pass — the scalable form of event-pattern
    // matching (no self-joins, no pattern automaton state).
    Q("q_window_pattern",
      """SELECT o_custkey, COUNT(*) AS n_streaks FROM (
        |  SELECT o_custkey, o_totalprice,
        |    lag(o_totalprice, 1) OVER w AS p1,
        |    lag(o_totalprice, 2) OVER w AS p2
        |  FROM orders
        |  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)) t
        |WHERE o_totalprice > p1 AND p1 > p2
        |GROUP BY o_custkey
        |ORDER BY n_streaks DESC, o_custkey
        |LIMIT 100""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      Tables.orders(s, d)
        .select(col("o_custkey"), col("o_totalprice"),
          lag(col("o_totalprice"), 1).over(w).as("p1"),
          lag(col("o_totalprice"), 2).over(w).as("p2"))
        .filter(col("o_totalprice") > col("p1") && col("p1") > col("p2"))
        .groupBy("o_custkey").agg(count(lit(1)).as("n_streaks"))
        .orderBy(col("n_streaks").desc, col("o_custkey"))
        .limit(100)
    },

    // Scale-safe global ntile: a bare `Window.orderBy` (no partitionBy)
    // would move the whole table into ONE task. Instead the shared
    // HistogramRank primitive assigns every row its global rank (bucket
    // offsets + parallel per-bucket row_number); quartile membership is
    // then a pure CASE on rank vs ntile boundaries.
    Q("q_window_ntile",
      s"""SELECT q, COUNT(*) AS cnt, ${d2dSql(dsumSql("c_acctbal"))} AS sum_bal
         |FROM (SELECT c_acctbal,
         |        ntile(4) OVER (ORDER BY c_acctbal, c_custkey) AS q
         |      FROM customer) t
         |GROUP BY q ORDER BY q""".stripMargin) { (s, d) =>
      val cust = Tables.customer(s, d).select(col("c_custkey"), col("c_acctbal"))
      val ranked = graft.operators.HistogramRank.withGlobalRank(
        cust, "c_acctbal", Seq("c_custkey"), rankCol = "grk")
      val total = cust.agg(count(lit(1)).as("n"))
      // ntile(4) boundary i = i*(n div 4) + min(i, n mod 4)
      def bnd(i: Int) =
        expr("n div 4") * i + least(lit(i.toLong), col("n") % 4)
      ranked
        .crossJoin(broadcast(total))
        .select(col("c_acctbal"),
          (lit(1L) + (col("grk") > bnd(1)).cast("long")
            + (col("grk") > bnd(2)).cast("long")
            + (col("grk") > bnd(3)).cast("long")).as("q"))
        .groupBy("q")
        .agg(count(lit(1)).as("cnt"), d2d(dsum(col("c_acctbal"))).as("sum_bal"))
        .orderBy("q")
    },

    Q("q_window_first_last",
      """SELECT user_id, event_id,
        |  first_value(event_type) OVER w AS first_type,
        |  last_value(event_type) OVER w AS last_type,
        |  nth_value(event_type, 2) OVER w AS second_type
        |FROM events
        |WHERE user_id < 20
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY user_id, event_id""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Tables.events(s, d)
        .filter(col("user_id") < 20)
        .select(col("user_id"), col("event_id"),
          first(col("event_type")).over(w).as("first_type"),
          last(col("event_type")).over(w).as("last_type"),
          nth_value(col("event_type"), 2).over(w).as("second_type"))
        .orderBy("user_id", "event_id")
    },

    // Distribution window functions over a HIGH-cardinality key (per
    // customer, not per status — bounded partitions at any scale).
    // percent_rank = (rank−1)/(n−1), cume_dist = n≤/n: integer÷integer in
    // DOUBLE — one identical IEEE division on identical operands.
    Q("q_window_dist",
      """SELECT o_custkey, o_orderkey,
        |  percent_rank() OVER w AS pr,
        |  cume_dist() OVER w AS cd
        |FROM orders
        |WHERE o_custkey < 200
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("o_custkey").orderBy("o_totalprice", "o_orderkey")
      Tables.orders(s, d)
        .filter(col("o_custkey") < 200)
        .select(col("o_custkey"), col("o_orderkey"),
          percent_rank().over(w).as("pr"),
          cume_dist().over(w).as("cd"))
        .orderBy("o_custkey", "o_orderkey")
    },

    Q("q_topk_global",
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey
        |LIMIT 50""".stripMargin) { (s, d) =>
      // orderBy+limit fuses to TakeOrderedAndProject: per-partition top-50
      // then a driver-side merge — no global sort at any scale.
      Tables.orders(s, d)
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(50)
    },

    Q("q_sort_multi",
      """SELECT s_suppkey, s_name, s_nationkey, s_acctbal
        |FROM supplier
        |ORDER BY s_nationkey ASC, s_acctbal DESC, s_suppkey ASC""".stripMargin) { (s, d) =>
      Tables.supplier(s, d)
        .select("s_suppkey", "s_name", "s_nationkey", "s_acctbal")
        .orderBy(col("s_nationkey").asc, col("s_acctbal").desc, col("s_suppkey").asc)
    },

    // Running DISTINCT count over an ordered window — per customer, how
    // many distinct order priorities have appeared so far. Spark (and
    // ANSI engines generally) reject COUNT(DISTINCT) OVER (ORDER BY …);
    // the scalable formulation is the FIRST-OCCURRENCE FLAG: row_number
    // over (customer, priority) marks each priority's debut, and the
    // running distinct count is a plain running SUM of debut flags over
    // the customer window. Two hash exchanges — (cust, priority) for the
    // debut flag, cust for the running sum — both on high-cardinality
    // keys; no per-row set state, no quadratic rescans. ORDER BY ties
    // broken by the unique o_orderkey on both window and output so the
    // running values are engine-identical.
    Q("q_window_running_distinct",
      """WITH f AS (
        |  SELECT o_custkey, o_orderkey, o_orderdate,
        |    CASE WHEN ROW_NUMBER() OVER (
        |        PARTITION BY o_custkey, o_orderpriority
        |        ORDER BY o_orderdate, o_orderkey) = 1
        |      THEN 1 ELSE 0 END AS debut
        |  FROM orders)
        |SELECT o_custkey, o_orderkey, o_orderdate,
        |  CAST(SUM(debut) OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderdate, o_orderkey) AS BIGINT) AS n_distinct_prio
        |FROM f ORDER BY o_custkey, o_orderdate, o_orderkey""".stripMargin) {
      (s, d) =>
        val debutW = Window.partitionBy("o_custkey", "o_orderpriority")
          .orderBy("o_orderdate", "o_orderkey")
        val runW = Window.partitionBy("o_custkey")
          .orderBy("o_orderdate", "o_orderkey")
        Tables.orders(s, d)
          .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
            when(row_number().over(debutW) === 1, 1L).otherwise(0L)
              .as("debut"))
          .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
            sum(col("debut")).over(runW).as("n_distinct_prio"))
          .orderBy("o_custkey", "o_orderdate", "o_orderkey")
    }
  )
}
