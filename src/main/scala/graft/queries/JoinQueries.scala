package graft.queries

import graft.core.{Dsl, Q, Tables}
import org.apache.spark.sql.functions._

/** SURVEY §2.3 — the join matrix.
  *
  * Scale story (100 TB): dimension joins (part/nation/region/customer-side
  * lookups) are explicitly `broadcast()` — no shuffle of the fact table;
  * fact-fact joins (lineitem⨝orders, events self-join) shuffle on the join
  * key and rely on AQE for skew splitting; the as-of join is the
  * aggregate-then-join composition whose shuffles are all on `user_id`, so
  * a pre-partitioned (bucketed) events table would make it shuffle-free.
  */
object JoinQueries {
  import Dsl._

  val all: Seq[Q] = Seq(
    Q("q_join_inner",
      s"""SELECT c_mktsegment, COUNT(*) AS cnt, ${d2dSql(dsumSql("o_totalprice"))} AS revenue
         |FROM orders JOIN customer ON o_custkey = c_custkey
         |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin) { (s, d) =>
      Tables.orders(s, d)
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("cnt"), d2d(dsum(col("o_totalprice"))).as("revenue"))
        .orderBy("c_mktsegment")
    },

    Q("q_join_broadcast",
      s"""SELECT p_brand, COUNT(*) AS cnt, ${d2dSql(dsumSql("l_extendedprice"))} AS sum_price
         |FROM lineitem JOIN part ON l_partkey = p_partkey
         |GROUP BY p_brand ORDER BY p_brand""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .join(broadcast(Tables.part(s, d)), col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand")
        .agg(count(lit(1)).as("cnt"), d2d(dsum(col("l_extendedprice"))).as("sum_price"))
        .orderBy("p_brand")
    },

    Q("q_join_sortmerge",
      s"""SELECT o_orderstatus, COUNT(*) AS cnt, ${d2dSql(dsumSql("l_extendedprice"))} AS sum_price
         |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin) { (s, d) =>
      // Big-big: pin SortMergeJoin via hint (broadcast would OOM at scale).
      Tables.lineitem(s, d)
        .join(Tables.orders(s, d).hint("merge"), col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("cnt"), d2d(dsum(col("l_extendedprice"))).as("sum_price"))
        .orderBy("o_orderstatus")
    },

    Q("q_join_multiway",
      s"""SELECT r_name, COUNT(*) AS cnt, ${d2dSql(dsumSql("c_acctbal"))} AS sum_bal
         |FROM customer
         |JOIN nation ON c_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |GROUP BY r_name ORDER BY r_name""".stripMargin) { (s, d) =>
      Tables.customer(s, d)
        .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name")
        .agg(count(lit(1)).as("cnt"), d2d(dsum(col("c_acctbal"))).as("sum_bal"))
        .orderBy("r_name")
    },

    Q("q_join_left_outer",
      s"""SELECT o_orderstatus,
         |  COUNT(DISTINCT o_orderkey) AS n_orders,
         |  COUNT(DISTINCT CASE WHEN l_orderkey IS NULL THEN o_orderkey END) AS n_empty,
         |  ${d2dSql(dsumSql("l_extendedprice"))} AS sum_price
         |FROM orders LEFT JOIN lineitem ON o_orderkey = l_orderkey
         |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin) { (s, d) =>
      Tables.orders(s, d)
        .join(Tables.lineitem(s, d), col("o_orderkey") === col("l_orderkey"), "left")
        .groupBy("o_orderstatus")
        .agg(countDistinct(col("o_orderkey")).as("n_orders"),
          countDistinct(when(col("l_orderkey").isNull, col("o_orderkey"))).as("n_empty"),
          d2d(dsum(col("l_extendedprice"))).as("sum_price"))
        .orderBy("o_orderstatus")
    },

    // (user_id, day) signup pairs FULL OUTER error pairs; the day column is
    // join-internal so no cross-engine timestamp-type pinning is needed.
    Q("q_join_full_outer",
      """WITH s AS (SELECT DISTINCT user_id, date_trunc('day', ts) AS d
        |           FROM events WHERE event_type = 'signup'),
        |     e AS (SELECT DISTINCT user_id, date_trunc('day', ts) AS d
        |           FROM events WHERE event_type = 'error')
        |SELECT CASE WHEN e.user_id IS NULL THEN 'left_only'
        |            WHEN s.user_id IS NULL THEN 'right_only'
        |            ELSE 'both' END AS cls,
        |  COUNT(*) AS cnt
        |FROM s FULL JOIN e ON s.user_id = e.user_id AND s.d = e.d
        |GROUP BY 1 ORDER BY cls""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d)
      def pairs(t: String) = ev.filter(col("event_type") === t)
        .select(col("user_id"), date_trunc("day", col("ts")).as("d")).distinct()
      val sp = pairs("signup").withColumnsRenamed(Map("user_id" -> "su", "d" -> "sd"))
      val ep = pairs("error").withColumnsRenamed(Map("user_id" -> "eu", "d" -> "ed"))
      sp.join(ep, col("su") === col("eu") && col("sd") === col("ed"), "full")
        .select(when(col("eu").isNull, "left_only")
          .when(col("su").isNull, "right_only")
          .otherwise("both").as("cls"))
        .groupBy("cls").agg(count(lit(1)).as("cnt"))
        .orderBy("cls")
    },

    Q("q_join_semi",
      """SELECT c_mktsegment, COUNT(*) AS cnt
        |FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin) { (s, d) =>
      Tables.customer(s, d)
        .join(Tables.orders(s, d).filter(col("o_orderpriority") === "1-URGENT"),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .groupBy("c_mktsegment").agg(count(lit(1)).as("cnt"))
        .orderBy("c_mktsegment")
    },

    Q("q_join_anti",
      """SELECT o_orderkey, o_orderstatus, o_totalprice
        |FROM orders
        |WHERE NOT EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey)
        |ORDER BY o_orderkey""".stripMargin) { (s, d) =>
      Tables.orders(s, d)
        .join(Tables.lineitem(s, d), col("o_orderkey") === col("l_orderkey"), "left_anti")
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
        .orderBy("o_orderkey")
    },

    Q("q_join_cross",
      """SELECT r_name, seg FROM region
        |CROSS JOIN (SELECT DISTINCT c_mktsegment AS seg FROM customer) m
        |ORDER BY r_name, seg""".stripMargin) { (s, d) =>
      Tables.region(s, d)
        .crossJoin(Tables.customer(s, d).select(col("c_mktsegment").as("seg")).distinct())
        .select("r_name", "seg")
        .orderBy("r_name", "seg")
    },

    // Non-equi self-join with an equi anchor on user_id: planner runs SMJ on
    // user_id with the time-range as a post-condition — bounded because the
    // fixture has ~67 events/user at every sf (FIXTURES.md).
    Q("q_join_theta_range",
      """SELECT e1.user_id, COUNT(*) AS pairs
        |FROM events e1 JOIN events e2
        |  ON e1.user_id = e2.user_id
        | AND e2.ts > e1.ts AND e2.ts <= e1.ts + INTERVAL 24 HOURS
        |WHERE e1.event_type = 'click'
        |GROUP BY e1.user_id ORDER BY e1.user_id""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d)
      val e1 = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts").as("ts1"))
      val e2 = ev.select(col("user_id").as("u2"), col("ts").as("ts2"))
      e1.join(e2, col("user_id") === col("u2") && col("ts2") > col("ts1") &&
          col("ts2") <= col("ts1") + expr("INTERVAL 24 HOURS"))
        .groupBy("user_id").agg(count(lit(1)).as("pairs"))
        .orderBy("user_id")
    },

    // PURE range join (no equi key): orders placed into OVERLAPPING price
    // bands (stride 25k, width 40k — most orders land in two bands).
    // Spark would plan the bare BETWEEN theta join as
    // BroadcastNestedLoopJoin — O(n·m) pairs and a whole-side broadcast,
    // fatal when the interval side is large. RangeBinJoin turns it into
    // a hash join on a computed bin id (intervals explode to covered
    // bins, points map to one bin, exact residual after the equi-join) —
    // the published range-join optimization shape. PlanSpec asserts the
    // executed plan has no nested-loop join; RangeSpec asserts
    // pair-equality with the nested-loop form at 40x density.
    Q("q_join_range",
      s"""WITH bands AS (
         |  SELECT i AS band_id,
         |    CAST(i * 25000 AS DOUBLE) AS lo,
         |    CAST(i * 25000 + 40000 AS DOUBLE) AS hi
         |  FROM (SELECT unnest(generate_series(0, 19)) AS i))
         |SELECT band_id, COUNT(*) AS n_orders,
         |  ${d2dSql(dsumSql("o_totalprice"))} AS band_value
         |FROM bands b JOIN orders o
         |  ON o.o_totalprice >= b.lo AND o.o_totalprice <= b.hi
         |GROUP BY band_id ORDER BY band_id""".stripMargin) { (s, d) =>
      val bands = s.range(0, 20).select(col("id").as("band_id"),
        (col("id") * 25000).cast("double").as("lo"),
        (col("id") * 25000 + 40000).cast("double").as("hi"))
      graft.operators.RangeBinJoin.pointInInterval(
          Tables.orders(s, d).select("o_totalprice"), bands,
          "o_totalprice", "lo", "hi")
        .groupBy("band_id")
        .agg(count(lit(1)).as("n_orders"),
          d2d(dsum(col("o_totalprice"))).as("band_value"))
        .orderBy("band_id")
    },

    // Interval-OVERLAP join (both sides are intervals, no equi key):
    // per-order price tolerance windows [p−5000, p+5000] against the
    // same overlapping bands. RangeBinJoin.intervalOverlap explodes both
    // sides to covered bins and emits each overlapping pair exactly once
    // (emit-once rule: first shared bin) — no dedup pass, no nested
    // loop. RangeSpec gates pair-equality with the theta form at 40x
    // interval density.
    Q("q_join_overlap",
      s"""WITH bands AS (
         |  SELECT i AS band_id,
         |    CAST(i * 25000 AS DOUBLE) AS blo,
         |    CAST(i * 25000 + 40000 AS DOUBLE) AS bhi
         |  FROM (SELECT unnest(generate_series(0, 19)) AS i)),
         |ords AS (
         |  SELECT o_orderkey, o_totalprice - 5000 AS olo,
         |    o_totalprice + 5000 AS ohi
         |  FROM orders)
         |SELECT band_id, COUNT(*) AS n_overlap,
         |  ${d2dSql(dsumSql("(ohi - olo)"))} AS sum_width
         |FROM bands b JOIN ords o
         |  ON b.blo <= o.ohi AND o.olo <= b.bhi
         |GROUP BY band_id ORDER BY band_id""".stripMargin) { (s, d) =>
      val bands = s.range(0, 20).select(col("id").as("band_id"),
        (col("id") * 25000).cast("double").as("blo"),
        (col("id") * 25000 + 40000).cast("double").as("bhi"))
      val ords = Tables.orders(s, d).select(col("o_orderkey"),
        (col("o_totalprice") - 5000).as("olo"),
        (col("o_totalprice") + 5000).as("ohi"))
      graft.operators.RangeBinJoin.intervalOverlap(
          ords, bands, "olo", "ohi", "blo", "bhi")
        .groupBy("band_id")
        .agg(count(lit(1)).as("n_overlap"),
          d2d(dsum(col("ohi") - col("olo"))).as("sum_width"))
        .orderBy("band_id")
    },

    // As-of join (no native Spark operator): the custom single-pass
    // partitioned-merge operator (AsOfJoinExec via GraftStrategy) — one
    // shuffle per side, no candidate-pair blow-up; AsOfSpec asserts
    // equality with the pure-DataFrame composition. Unmatched purchases
    // survive with null view_ts. lag is exact microseconds (second-
    // granularity diffs are boundary-counting in DuckDB vs truncation in
    // Spark — µs is exact in both).
    Q("q_join_asof",
      """SELECT p.event_id, p.user_id, p.ts AS purchase_ts, v.ts AS view_ts,
        |  date_diff('microsecond', v.ts, p.ts) AS lag_us
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
        |  ON p.user_id = v.user_id AND v.ts < p.ts
        |ORDER BY p.event_id""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d)
      val p = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts").as("purchase_ts"))
      val v = ev.filter(col("event_type") === "view")
        .select(col("user_id"), col("ts").as("vts"))
      graft.operators.AsOfJoin.leftAsOfMerge(p, v, Seq("user_id"),
          leftTime = "purchase_ts", rightTime = "vts", asOfCol = "view_ts")
        .withColumn("lag_us", expr("timestampdiff(MICROSECOND, view_ts, purchase_ts)"))
        .select("event_id", "user_id", "purchase_ts", "view_ts", "lag_us")
        .orderBy("event_id")
    },

    // Skew-mitigated equi-join: the fact side (events, ~13k rows per hot
    // user at scale) joins the customer dim through SaltedJoin — the big
    // side takes a row-local salt, the dim is replicated salt×, and the
    // join key becomes (key, salt), spreading any hot key over 8 reducers.
    // The oracle is the PLAIN join: salting is result-invariant by
    // construction, so the gate proves the skew machinery changes the
    // physical spread and nothing else. shuffle_hash hint keeps the join
    // a shuffled hash join (broadcasting the replicated dim would bypass
    // the very shuffle the salt is spreading). Aggregates are exact
    // decimal (order-independent) — parity-safe under any salt layout.
    Q("q_join_skew_salted",
      s"""SELECT c.c_mktsegment, COUNT(*) AS n_events,
         |  ${d2dSql(dsumSql("e.value"))} AS sum_value
         |FROM events e JOIN customer c ON e.user_id = c.c_custkey
         |GROUP BY c.c_mktsegment ORDER BY c.c_mktsegment""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d).select("user_id", "value")
      val cust = Tables.customer(s, d)
        .select("c_custkey", "c_mktsegment").hint("shuffle_hash")
      graft.operators.SaltedJoin
        .join(ev, cust, "user_id", "c_custkey", salt = 8)
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_events"),
          d2d(dsum(col("value"))).as("sum_value"))
        .orderBy("c_mktsegment")
    },

    // TPC-H Q3 shape (shipping priority, minus the fixture-absent
    // o_shippriority): segment-filtered customers × date-bracketed
    // orders × lineitem, top-10 open orders by revenue. The ORDER BY
    // runs on the EXACT decimal (double conversion can collapse unequal
    // decimals to equal doubles and scramble a tiebreak); the DOUBLE
    // form is output-only. Plan: broadcast the filtered customer dim,
    // fact-fact join shuffles on orderkey, top-10 fuses to
    // TakeOrderedAndProject — no global sort.
    Q("q_tpch_q3",
      s"""SELECT l_orderkey, CAST(o_orderdate AS TIMESTAMP) AS o_orderdate,
         |  ${d2dSql("rev")} AS revenue
         |FROM (
         |  SELECT l_orderkey, o_orderdate,
         |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(19,4)) *
         |      (1 - CAST(l_discount AS DECIMAL(19,4)))) AS DECIMAL(18,4)) AS rev
         |  FROM customer JOIN orders ON c_custkey = o_custkey
         |  JOIN lineitem ON l_orderkey = o_orderkey
         |  WHERE c_mktsegment = 'BUILDING'
         |    AND o_orderdate < TIMESTAMP '1998-06-01'
         |    AND l_shipdate > TIMESTAMP '1998-06-01'
         |  GROUP BY l_orderkey, o_orderdate)
         |ORDER BY rev DESC, l_orderkey LIMIT 10""".stripMargin) { (s, d) =>
      val cust = Tables.customer(s, d)
        .filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
      val ords = Tables.orders(s, d)
        .filter(col("o_orderdate") < lit("1998-06-01").cast("timestamp_ntz"))
        .select("o_orderkey", "o_custkey", "o_orderdate")
      val li = Tables.lineitem(s, d)
        .filter(col("l_shipdate") > lit("1998-06-01").cast("timestamp_ntz"))
        .select("l_orderkey", "l_extendedprice", "l_discount")
      ords.join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .join(li, col("l_orderkey") === col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate")
        .agg(sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
          .cast(D18).as("rev"))
        .orderBy(col("rev").desc, col("l_orderkey")).limit(10)
        .select(col("l_orderkey"), col("o_orderdate"), d2d(col("rev")).as("revenue"))
    },

    // TPC-H Q5 shape (local supplier volume): the 6-way join with the
    // c_nationkey = s_nationkey "local" constraint. region+nation
    // broadcast; customer/orders/lineitem/supplier shuffle on their
    // join keys. Revenue ordered on the exact decimal, name tiebreak.
    Q("q_tpch_q5",
      s"""SELECT n_name, ${d2dSql("rev")} AS revenue
         |FROM (
         |  SELECT n_name,
         |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(19,4)) *
         |      (1 - CAST(l_discount AS DECIMAL(19,4)))) AS DECIMAL(18,4)) AS rev
         |  FROM customer JOIN orders ON c_custkey = o_custkey
         |  JOIN lineitem ON l_orderkey = o_orderkey
         |  JOIN supplier ON l_suppkey = s_suppkey
         |    AND c_nationkey = s_nationkey
         |  JOIN nation ON s_nationkey = n_nationkey
         |  JOIN region ON n_regionkey = r_regionkey
         |  WHERE r_name = 'ASIA'
         |    AND o_orderdate >= TIMESTAMP '1996-01-01'
         |    AND o_orderdate < TIMESTAMP '1997-01-01'
         |  GROUP BY n_name)
         |ORDER BY rev DESC, n_name""".stripMargin) { (s, d) =>
      val ords = Tables.orders(s, d)
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp_ntz") &&
          col("o_orderdate") < lit("1997-01-01").cast("timestamp_ntz"))
        .select("o_orderkey", "o_custkey")
      val asiaNations = Tables.nation(s, d)
        .join(broadcast(Tables.region(s, d).filter(col("r_name") === "ASIA")),
          col("n_regionkey") === col("r_regionkey"))
        .select("n_nationkey", "n_name")
      val supp = Tables.supplier(s, d)
        .join(broadcast(asiaNations), col("s_nationkey") === col("n_nationkey"))
        .select("s_suppkey", "s_nationkey", "n_name")
      Tables.customer(s, d).select("c_custkey", "c_nationkey")
        .join(ords, col("c_custkey") === col("o_custkey"))
        .join(Tables.lineitem(s, d)
            .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(supp), col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
        .groupBy("n_name")
        .agg(sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
          .cast(D18).as("rev"))
        .orderBy(col("rev").desc, col("n_name"))
        .select(col("n_name"), d2d(col("rev")).as("revenue"))
    },

    // TPC-H Q10 shape (returned-item reporting): top-20 customers by
    // revenue lost to returns in a quarter. Exact-decimal ordering with
    // custkey tiebreak; c_acctbal passes through untouched (no
    // arithmetic ⇒ no parity exposure).
    Q("q_tpch_q10",
      s"""SELECT c_custkey, c_name, ${d2dSql("rev")} AS revenue, c_acctbal, n_name
         |FROM (
         |  SELECT c_custkey, c_name, c_acctbal, n_name,
         |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(19,4)) *
         |      (1 - CAST(l_discount AS DECIMAL(19,4)))) AS DECIMAL(18,4)) AS rev
         |  FROM customer JOIN orders ON c_custkey = o_custkey
         |  JOIN lineitem ON l_orderkey = o_orderkey
         |  JOIN nation ON c_nationkey = n_nationkey
         |  WHERE l_returnflag = 'R'
         |    AND o_orderdate >= TIMESTAMP '1996-01-01'
         |    AND o_orderdate < TIMESTAMP '1996-04-01'
         |  GROUP BY c_custkey, c_name, c_acctbal, n_name)
         |ORDER BY rev DESC, c_custkey LIMIT 20""".stripMargin) { (s, d) =>
      val ords = Tables.orders(s, d)
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp_ntz") &&
          col("o_orderdate") < lit("1996-04-01").cast("timestamp_ntz"))
        .select("o_orderkey", "o_custkey")
      val li = Tables.lineitem(s, d).filter(col("l_returnflag") === "R")
        .select("l_orderkey", "l_extendedprice", "l_discount")
      Tables.customer(s, d)
        .join(broadcast(Tables.nation(s, d)),
          col("c_nationkey") === col("n_nationkey"))
        .select("c_custkey", "c_name", "c_acctbal", "n_name")
        .join(ords, col("c_custkey") === col("o_custkey"))
        .join(li, col("l_orderkey") === col("o_orderkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
          .cast(D18).as("rev"))
        .orderBy(col("rev").desc, col("c_custkey")).limit(20)
        .select(col("c_custkey"), col("c_name"), d2d(col("rev")).as("revenue"),
          col("c_acctbal"), col("n_name"))
    },

    // TPC-H Q4 shape (order-priority checking): correlated EXISTS with a
    // NON-equi correlated predicate (a late lineitem for THIS order) —
    // planned as a left-semi join on the key plus the residual date
    // condition, then a combinable count by priority. The fixture has no
    // l_commitdate, so "late" = shipped >30 days after the order date.
    Q("q_tpch_q4",
      """SELECT o_orderpriority, COUNT(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1997-01-01'
        |  AND o_orderdate < TIMESTAMP '1997-04-01'
        |  AND EXISTS (
        |    SELECT 1 FROM lineitem
        |    WHERE l_orderkey = o_orderkey
        |      AND l_shipdate > o_orderdate + INTERVAL 30 DAY)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin) { (s, d) =>
      val li = Tables.lineitem(s, d).select("l_orderkey", "l_shipdate")
      Tables.orders(s, d)
        .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp_ntz") &&
          col("o_orderdate") < lit("1997-04-01").cast("timestamp_ntz"))
        .select("o_orderkey", "o_orderdate", "o_orderpriority")
        .join(li, col("l_orderkey") === col("o_orderkey") &&
          col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 30 DAYS"),
          "left_semi")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("order_count"))
        .orderBy("o_orderpriority")
    },

    // TPC-H Q6 shape (forecast revenue change): a pure scan-side query —
    // every predicate pushes to the parquet scan, the aggregate is one
    // combinable decimal sum, no join and no shuffle beyond the one-row
    // final agg. The decimal product discipline is q3's.
    Q("q_tpch_q6",
      s"""SELECT ${d2dSql("rev")} AS revenue FROM (
         |  SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(19,4)) *
         |    CAST(l_discount AS DECIMAL(19,4))) AS DECIMAL(18,4)) AS rev
         |  FROM lineitem
         |  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
         |    AND l_shipdate < TIMESTAMP '1998-01-01'
         |    AND l_discount BETWEEN 0.05 AND 0.07
         |    AND l_quantity < 24)""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp_ntz") &&
          col("l_shipdate") < lit("1998-01-01").cast("timestamp_ntz") &&
          col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
        .agg(sum(dec(col("l_extendedprice")) * dec(col("l_discount")))
          .cast(D18).as("rev"))
        .select(d2d(col("rev")).as("revenue"))
    },

    // TPC-H Q12 shape (shipping-mode priority counts): the fixture has
    // no l_shipmode/l_commitdate columns, so l_linestatus stands in for
    // the mode and "late" = shipped more than 60 days after the order
    // date — what the query exercises is unchanged: a fact-fact equi
    // join with conditional integer counts grouped by a low-cardinality
    // column. Counts are exact longs, no float anywhere.
    Q("q_tpch_q12",
      """SELECT l_linestatus,
        |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |      THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
        |      THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
        |  AND l_shipdate >= TIMESTAMP '1997-01-01'
        |  AND l_shipdate < TIMESTAMP '1998-01-01'
        |GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin) { (s, d) =>
      val li = Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp_ntz") &&
          col("l_shipdate") < lit("1998-01-01").cast("timestamp_ntz"))
        .select("l_orderkey", "l_linestatus", "l_shipdate")
      Tables.orders(s, d).select("o_orderkey", "o_orderdate", "o_orderpriority")
        .join(li, col("o_orderkey") === col("l_orderkey") &&
          col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
        .groupBy("l_linestatus")
        .agg(sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1)
          .otherwise(0)).as("high_line_count"),
          sum(when(!col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1)
            .otherwise(0)).as("low_line_count"))
        .orderBy("l_linestatus")
    },

    // TPC-H Q14 shape (promo revenue share): lineitem ⋈ broadcast part,
    // two combinable decimal sums in ONE aggregate pass (the conditional
    // sum rides the same shuffle), ratio taken after both sums land as
    // exact decimals — one double division and one multiply, identically
    // ordered in both engines.
    Q("q_tpch_q14",
      s"""SELECT 100.0 * ${d2dSql("promo")} / ${d2dSql("total")} AS promo_revenue
         |FROM (
         |  SELECT
         |    CAST(SUM(CASE WHEN p_type = 'PROMO'
         |      THEN CAST(l_extendedprice AS DECIMAL(19,4)) *
         |           (1 - CAST(l_discount AS DECIMAL(19,4)))
         |      ELSE 0 END) AS DECIMAL(18,4)) AS promo,
         |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(19,4)) *
         |      (1 - CAST(l_discount AS DECIMAL(19,4)))) AS DECIMAL(18,4)) AS total
         |  FROM lineitem JOIN part ON l_partkey = p_partkey
         |  WHERE l_shipdate >= TIMESTAMP '1997-09-01'
         |    AND l_shipdate < TIMESTAMP '1997-10-01')""".stripMargin) { (s, d) =>
      val rev = dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount")))
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1997-09-01").cast("timestamp_ntz") &&
          col("l_shipdate") < lit("1997-10-01").cast("timestamp_ntz"))
        .select("l_partkey", "l_extendedprice", "l_discount")
        .join(broadcast(Tables.part(s, d).select("p_partkey", "p_type")),
          col("l_partkey") === col("p_partkey"))
        .agg(sum(when(col("p_type") === "PROMO", rev).otherwise(0))
          .cast(D18).as("promo"),
          sum(rev).cast(D18).as("total"))
        .select((lit(100.0) * d2d(col("promo")) / d2d(col("total")))
          .as("promo_revenue"))
    },

    // TPC-H Q18 shape (large-volume customers): the HAVING-subquery
    // pattern — the qualifying order keys (a tiny set by construction)
    // come from a first aggregate and BROADCAST into the fact scan, so
    // the big join only materializes qualifying orders. l_quantity is
    // integral-valued, so its double sums are exact in any order (no
    // decimal detour needed — probed, 0 fractional quantities).
    Q("q_tpch_q18",
      """SELECT c_name, c_custkey, o_orderkey,
        |  CAST(o_orderdate AS TIMESTAMP) AS o_orderdate, o_totalprice,
        |  SUM(l_quantity) AS total_qty
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE o_orderkey IN (
        |  SELECT l_orderkey FROM lineitem
        |  GROUP BY l_orderkey HAVING SUM(l_quantity) > 300)
        |GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin) { (s, d) =>
      val li = Tables.lineitem(s, d).select("l_orderkey", "l_quantity")
      val big = li.groupBy("l_orderkey")
        .agg(sum(col("l_quantity")).as("q")).filter(col("q") > 300)
        .select(col("l_orderkey").as("b_orderkey"))
      Tables.orders(s, d)
        .select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
        .join(broadcast(big), col("o_orderkey") === col("b_orderkey"), "left_semi")
        .join(Tables.customer(s, d).select("c_custkey", "c_name"),
          col("o_custkey") === col("c_custkey"))
        .join(li, col("l_orderkey") === col("o_orderkey"))
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate",
          "o_totalprice")
        .agg(sum(col("l_quantity")).as("total_qty"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey")).limit(100)
    },

    // TPC-H Q7 shape (volume shipping between two nations): the
    // nation-PAIR disjunction — revenue flowing either direction between
    // NATION_1 and NATION_2, by supplier nation × customer nation ×
    // ship year. Both nation dims broadcast onto their fact side; the
    // only shuffles are lineitem⨝orders (orderkey) and ⨝customer
    // (custkey). The pair filter lands AFTER both nations are attached
    // (it references both sides), but each broadcast join already
    // reduced its side to the two named nations.
    Q("q_tpch_q7",
      s"""SELECT supp_nation, cust_nation, l_year, ${d2dSql("rev")} AS revenue
         |FROM (
         |  SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
         |    CAST(YEAR(l_shipdate) AS BIGINT) AS l_year,
         |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(19,4)) *
         |      (1 - CAST(l_discount AS DECIMAL(19,4)))) AS DECIMAL(18,4)) AS rev
         |  FROM lineitem
         |  JOIN orders ON l_orderkey = o_orderkey
         |  JOIN customer ON o_custkey = c_custkey
         |  JOIN supplier ON l_suppkey = s_suppkey
         |  JOIN nation ns ON s_nationkey = ns.n_nationkey
         |  JOIN nation nc ON c_nationkey = nc.n_nationkey
         |  WHERE (ns.n_name = 'NATION_1' AND nc.n_name = 'NATION_2')
         |     OR (ns.n_name = 'NATION_2' AND nc.n_name = 'NATION_1')
         |  GROUP BY ns.n_name, nc.n_name, YEAR(l_shipdate))
         |ORDER BY supp_nation, cust_nation, l_year""".stripMargin) { (s, d) =>
      val pairNations = Tables.nation(s, d)
        .filter(col("n_name").isin("NATION_1", "NATION_2"))
      val supp = Tables.supplier(s, d)
        .join(broadcast(pairNations), col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name").as("supp_nation"))
      val cust = Tables.customer(s, d)
        .join(broadcast(pairNations), col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), col("n_name").as("cust_nation"))
      Tables.lineitem(s, d)
        .select("l_orderkey", "l_suppkey", "l_shipdate",
          "l_extendedprice", "l_discount")
        .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
        .join(Tables.orders(s, d).select("o_orderkey", "o_custkey"),
          col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .filter((col("supp_nation") === "NATION_1" &&
            col("cust_nation") === "NATION_2") ||
          (col("supp_nation") === "NATION_2" &&
            col("cust_nation") === "NATION_1"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).cast("long").as("l_year"))
        .agg(sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
          .cast(D18).as("rev"))
        .orderBy("supp_nation", "cust_nation", "l_year")
        .select(col("supp_nation"), col("cust_nation"), col("l_year"),
          d2d(col("rev")).as("revenue"))
    },

    // TPC-H Q8 shape (national market share): conditional-sum RATIO per
    // year — NATION_5 suppliers' share of ECONOMY-part revenue sold to
    // ASIA customers. Both decimal sums ride ONE aggregate pass; the
    // division happens once per year row on d2d doubles (identical IEEE
    // tree in DuckDB). part + both nation sides broadcast.
    Q("q_tpch_q8",
      s"""SELECT o_year,
         |  ${d2dSql("nat")} / ${d2dSql("tot")} AS mkt_share
         |FROM (
         |  SELECT CAST(YEAR(o_orderdate) AS BIGINT) AS o_year,
         |    CAST(SUM(CASE WHEN ns.n_name = 'NATION_5'
         |      THEN CAST(l_extendedprice AS DECIMAL(19,4)) *
         |           (1 - CAST(l_discount AS DECIMAL(19,4)))
         |      ELSE 0 END) AS DECIMAL(18,4)) AS nat,
         |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(19,4)) *
         |      (1 - CAST(l_discount AS DECIMAL(19,4)))) AS DECIMAL(18,4)) AS tot
         |  FROM lineitem
         |  JOIN part ON l_partkey = p_partkey
         |  JOIN orders ON l_orderkey = o_orderkey
         |  JOIN customer ON o_custkey = c_custkey
         |  JOIN nation nc ON c_nationkey = nc.n_nationkey
         |  JOIN region ON nc.n_regionkey = r_regionkey
         |  JOIN supplier ON l_suppkey = s_suppkey
         |  JOIN nation ns ON s_nationkey = ns.n_nationkey
         |  WHERE p_type = 'ECONOMY' AND r_name = 'ASIA'
         |  GROUP BY YEAR(o_orderdate))
         |ORDER BY o_year""".stripMargin) { (s, d) =>
      val rev = dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount")))
      val econParts = Tables.part(s, d)
        .filter(col("p_type") === "ECONOMY").select("p_partkey")
      val asiaCust = Tables.customer(s, d)
        .join(broadcast(Tables.nation(s, d)
            .join(broadcast(Tables.region(s, d)
                .filter(col("r_name") === "ASIA")),
              col("n_regionkey") === col("r_regionkey"))
            .select("n_nationkey")),
          col("c_nationkey") === col("n_nationkey"))
        .select("c_custkey")
      val suppNation = Tables.supplier(s, d)
        .join(broadcast(Tables.nation(s, d)
            .select(col("n_nationkey"), col("n_name").as("supp_nation"))),
          col("s_nationkey") === col("n_nationkey"))
        .select("s_suppkey", "supp_nation")
      Tables.lineitem(s, d)
        .select("l_orderkey", "l_partkey", "l_suppkey",
          "l_extendedprice", "l_discount")
        .join(broadcast(econParts), col("l_partkey") === col("p_partkey"))
        .join(broadcast(suppNation), col("l_suppkey") === col("s_suppkey"))
        .join(Tables.orders(s, d).select("o_orderkey", "o_custkey", "o_orderdate"),
          col("l_orderkey") === col("o_orderkey"))
        .join(asiaCust, col("o_custkey") === col("c_custkey"), "left_semi")
        .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
        .agg(sum(when(col("supp_nation") === "NATION_5", rev).otherwise(0))
          .cast(D18).as("nat"),
          sum(rev).cast(D18).as("tot"))
        .orderBy("o_year")
        .select(col("o_year"), (d2d(col("nat")) / d2d(col("tot"))).as("mkt_share"))
    },

    // TPC-H Q13 shape (customer order-count distribution): the LEFT
    // OUTER fact join whose NULL side carries signal — customers with
    // zero qualifying orders must survive into the c_count=0 bucket.
    // Two aggregations: per-customer count (shuffles on custkey), then
    // the tiny count-of-counts (the distribution domain is ≤ ~50 rows).
    // All-integer outputs — no float parity exposure at all.
    Q("q_tpch_q13",
      """SELECT c_count, COUNT(*) AS custdist
        |FROM (
        |  SELECT c_custkey, COUNT(o_orderkey) AS c_count
        |  FROM customer LEFT OUTER JOIN orders
        |    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        |  GROUP BY c_custkey)
        |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin) { (s, d) =>
      Tables.customer(s, d).select("c_custkey")
        .join(Tables.orders(s, d)
            .filter(col("o_orderpriority") =!= "1-URGENT")
            .select("o_orderkey", "o_custkey"),
          col("c_custkey") === col("o_custkey"), "left_outer")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy("c_count")
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    },

    // TPC-H Q15 shape (top supplier): the VIEW + scalar-MAX pattern —
    // quarterly revenue per supplier, then select the supplier(s) whose
    // revenue EQUALS the max. The per-supplier frame is computed once
    // (localCheckpoint barrier — it feeds both the max and the final
    // select), the one-row max broadcasts via crossJoin (the blessed
    // one-row stats-frame idiom), and equality compares EXACT decimals
    // (never the d2d doubles — double collapse could admit a false tie).
    Q("q_tpch_q15",
      s"""WITH rev AS (
         |  SELECT l_suppkey,
         |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(19,4)) *
         |      (1 - CAST(l_discount AS DECIMAL(19,4)))) AS DECIMAL(18,4)) AS total_rev
         |  FROM lineitem
         |  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
         |    AND l_shipdate < TIMESTAMP '1997-04-01'
         |  GROUP BY l_suppkey)
         |SELECT s_suppkey, s_name, ${d2dSql("total_rev")} AS total_revenue
         |FROM supplier JOIN rev ON s_suppkey = l_suppkey
         |WHERE total_rev = (SELECT MAX(total_rev) FROM rev)
         |ORDER BY s_suppkey""".stripMargin) { (s, d) =>
      val rev = Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp_ntz") &&
          col("l_shipdate") < lit("1997-04-01").cast("timestamp_ntz"))
        .groupBy("l_suppkey")
        .agg(sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
          .cast(D18).as("total_rev"))
        .localCheckpoint(eager = false)
      val top = rev.agg(max(col("total_rev")).as("max_rev"))
      rev.crossJoin(broadcast(top))
        .filter(col("total_rev") === col("max_rev"))
        .join(broadcast(Tables.supplier(s, d).select("s_suppkey", "s_name")),
          col("l_suppkey") === col("s_suppkey"))
        .orderBy("s_suppkey")
        .select(col("s_suppkey"), col("s_name"),
          d2d(col("total_rev")).as("total_revenue"))
    },

    // TPC-H Q17 shape (small-quantity-order revenue): the CORRELATED
    // SCALAR AVG subquery, decorrelated as aggregate-then-join — the
    // per-part mean quantity joins back to the fact on partkey.
    // l_quantity is integral (probed: 0 fractional), so SUM(double) is
    // exact in any partition order and avg = exact_sum / exact_count is
    // the same two IEEE ops in both engines — the 0.2·avg threshold is
    // bit-identical. The part filter broadcasts; the per-part avg frame
    // is small (one row per filtered part) and broadcasts too.
    Q("q_tpch_q17",
      s"""SELECT ${d2dSql("s")} / 7.0e0 AS avg_yearly FROM (
         |  SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)))
         |    AS DECIMAL(18,4)) AS s
         |  FROM lineitem
         |  JOIN part ON p_partkey = l_partkey
         |  WHERE p_brand = 'Brand#1' AND p_type = 'SMALL'
         |    AND l_quantity < 0.2e0 * (
         |      SELECT SUM(l_quantity) / COUNT(*) FROM lineitem l2
         |      WHERE l2.l_partkey = p_partkey))""".stripMargin) { (s, d) =>
      val parts = Tables.part(s, d)
        .filter(col("p_brand") === "Brand#1" && col("p_type") === "SMALL")
        .select("p_partkey")
      val li = Tables.lineitem(s, d)
        .select("l_partkey", "l_quantity", "l_extendedprice")
        .join(broadcast(parts), col("l_partkey") === col("p_partkey"))
      val avgQty = li.groupBy(col("p_partkey").as("a_partkey"))
        .agg((sum(col("l_quantity")) / count(lit(1))).as("avg_qty"))
      li.join(broadcast(avgQty), col("p_partkey") === col("a_partkey"))
        .filter(col("l_quantity") < lit(0.2) * col("avg_qty"))
        .agg(sum(col("l_extendedprice").cast(D18)).cast(D18).as("s"))
        .select((d2d(col("s")) / lit(7.0)).as("avg_yearly"))
    },

    // TPC-H Q19 shape (discounted revenue, disjunctive brackets): three
    // OR'd (brand × size-range × quantity-range) predicates spanning
    // BOTH join sides. Spark splits the disjunction: the part-only
    // conjuncts (brand, size) prune the broadcast build side, the
    // lineitem-only bounds (quantity envelope 1..40) push to the scan,
    // and the full OR evaluates as the join residual — the classic
    // "derive implied single-side predicates from a cross-side OR" test.
    Q("q_tpch_q19",
      s"""SELECT ${d2dSql("rev")} AS revenue FROM (
         |  SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(19,4)) *
         |    (1 - CAST(l_discount AS DECIMAL(19,4)))) AS DECIMAL(18,4)) AS rev
         |  FROM lineitem JOIN part ON p_partkey = l_partkey
         |  WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 5
         |      AND l_quantity BETWEEN 1 AND 11)
         |     OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 10
         |      AND l_quantity BETWEEN 10 AND 20)
         |     OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
         |      AND l_quantity BETWEEN 20 AND 40))""".stripMargin) { (s, d) =>
      val p = Tables.part(s, d)
        .filter(col("p_brand").isin("Brand#1", "Brand#2", "Brand#3") &&
          col("p_size").between(1, 15))
        .select("p_partkey", "p_brand", "p_size")
      Tables.lineitem(s, d)
        .filter(col("l_quantity").between(1, 40))
        .select("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
        .join(broadcast(p), col("p_partkey") === col("l_partkey") && (
          (col("p_brand") === "Brand#1" && col("p_size").between(1, 5) &&
            col("l_quantity").between(1, 11)) ||
          (col("p_brand") === "Brand#2" && col("p_size").between(1, 10) &&
            col("l_quantity").between(10, 20)) ||
          (col("p_brand") === "Brand#3" && col("p_size").between(1, 15) &&
            col("l_quantity").between(20, 40))))
        .agg(sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
          .cast(D18).as("rev"))
        .select(d2d(col("rev")).as("revenue"))
    },

    // TPC-H Q22 shape (global sales opportunity): scalar-subquery
    // threshold + ANTI join — rich (above-average-balance) customers in
    // seven nations with no URGENT orders, counted per nation. Two
    // fixture adaptations: c_nationkey stands in for the phone-prefix
    // country code (no c_phone column), and the NOT EXISTS tests for
    // '1-URGENT' orders because this generator gives EVERY customer at
    // least one order (probed: 0 order-less customers at both SFs — the
    // literal TPC-H predicate would gate an empty result). The
    // positive-balance average follows the davg discipline (exact
    // decimal sum → double ÷ count, same IEEE ops in DuckDB); the
    // one-row threshold broadcasts via crossJoin; the anti join
    // shuffles on custkey (at scale: the filtered orders side is a
    // fraction of the fact, and Spark's left-anti build ships only its
    // distinct custkeys).
    Q("q_tpch_q22",
      s"""SELECT c_nationkey AS cntrycode, COUNT(*) AS numcust,
         |  ${d2dSql(dsumSql("c_acctbal"))} AS totacctbal
         |FROM customer
         |WHERE c_nationkey IN (0, 1, 2, 3, 4, 5, 6)
         |  AND c_acctbal > (
         |    SELECT ${davgSql("c_acctbal")} FROM customer
         |    WHERE c_acctbal > 0.0 AND c_nationkey IN (0, 1, 2, 3, 4, 5, 6))
         |  AND NOT EXISTS (
         |    SELECT 1 FROM orders WHERE o_custkey = c_custkey
         |      AND o_orderpriority = '1-URGENT')
         |GROUP BY c_nationkey ORDER BY cntrycode""".stripMargin) { (s, d) =>
      val cust = Tables.customer(s, d)
        .filter(col("c_nationkey").isin(0, 1, 2, 3, 4, 5, 6))
        .select("c_custkey", "c_nationkey", "c_acctbal")
        .localCheckpoint(eager = false)
      val thresh = cust.filter(col("c_acctbal") > 0.0)
        .agg(davg(col("c_acctbal")).as("avg_bal"))
      cust.crossJoin(broadcast(thresh))
        .filter(col("c_acctbal") > col("avg_bal"))
        .join(Tables.orders(s, d)
            .filter(col("o_orderpriority") === "1-URGENT").select("o_custkey"),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy(col("c_nationkey").as("cntrycode"))
        .agg(count(lit(1)).as("numcust"), d2d(dsum(col("c_acctbal"))).as("totacctbal"))
        .orderBy("cntrycode")
    },

    // TPC-H Q21 shape (suppliers who kept orders waiting): the DOUBLE
    // correlated-EXISTS — a semi join (some OTHER supplier contributed
    // to the order) and an anti join (but no OTHER supplier was late)
    // against the SAME fact, both with a non-equi residual on top of
    // the orderkey equi key, the anti's residual referencing a column
    // (o_orderdate) from a THIRD table. "Late" = shipped >30 days after
    // the order date (the q4 convention — no l_commitdate/receiptdate
    // in this fixture). All three lineitem sides key on l_orderkey, so
    // the semi and anti ride the same co-partitioning as the
    // lineitem⨝orders join — one shuffle key end to end; the two-nation
    // supplier dim broadcasts.
    Q("q_tpch_q21",
      """SELECT s_name, COUNT(*) AS numwait FROM supplier
        |JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
        |JOIN orders ON o_orderkey = l1.l_orderkey
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE o_orderstatus = 'F'
        |  AND l1.l_shipdate > o_orderdate + INTERVAL 30 DAY
        |  AND EXISTS (
        |    SELECT 1 FROM lineitem l2
        |    WHERE l2.l_orderkey = l1.l_orderkey
        |      AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (
        |    SELECT 1 FROM lineitem l3
        |    WHERE l3.l_orderkey = l1.l_orderkey
        |      AND l3.l_suppkey <> l1.l_suppkey
        |      AND l3.l_shipdate > o_orderdate + INTERVAL 30 DAY)
        |  AND n_name IN ('NATION_3', 'NATION_4')
        |GROUP BY s_name ORDER BY numwait DESC, s_name""".stripMargin) { (s, d) =>
      val nat = Tables.nation(s, d)
        .filter(col("n_name").isin("NATION_3", "NATION_4"))
        .select("n_nationkey")
      val supp = Tables.supplier(s, d)
        .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
        .select("s_suppkey", "s_name")
      val li = Tables.lineitem(s, d)
        .select("l_orderkey", "l_suppkey", "l_shipdate")
      val late = col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 30 DAYS")
      li.join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
        .join(Tables.orders(s, d)
            .filter(col("o_orderstatus") === "F")
            .select("o_orderkey", "o_orderdate"),
          col("l_orderkey") === col("o_orderkey"))
        .filter(late)
        .join(li.select(col("l_orderkey").as("l2_orderkey"),
            col("l_suppkey").as("l2_suppkey")),
          col("l2_orderkey") === col("l_orderkey") &&
            col("l2_suppkey") =!= col("l_suppkey"), "left_semi")
        .join(li.select(col("l_orderkey").as("l3_orderkey"),
            col("l_suppkey").as("l3_suppkey"),
            col("l_shipdate").as("l3_shipdate")),
          col("l3_orderkey") === col("l_orderkey") &&
            col("l3_suppkey") =!= col("l_suppkey") &&
            col("l3_shipdate") > col("o_orderdate") + expr("INTERVAL 30 DAYS"),
          "left_anti")
        .groupBy("s_name").agg(count(lit(1)).as("numwait"))
        .orderBy(col("numwait").desc, col("s_name"))
    },

    // Null-safe equality join (`<=>` / IS NOT DISTINCT FROM): the
    // semantic corner where plain equi-joins silently drop rows — a NULL
    // join key must match the dim's NULL bucket, not vanish. Nullable
    // keys derive deterministically (NULLIF(k % 23, 11)) on both sides
    // so both engines see identical NULL populations. Output ordering
    // pins NULLS FIRST explicitly — the engines' defaults differ
    // (Spark ASC = NULLS FIRST, DuckDB = NULLS LAST). Planning note:
    // Spark plans a null-safe equi-condition as a HASH join on the
    // key's null-wrapped form — not a nested loop — so the shape
    // survives scale like any equi-join.
    Q("q_join_null_safe",
      s"""WITH f AS (
         |  SELECT NULLIF(o_custkey % 23, 11) AS grp, o_totalprice
         |  FROM orders),
         |d AS (
         |  SELECT DISTINCT NULLIF(c_custkey % 23, 11) AS dgrp
         |  FROM customer)
         |SELECT grp, COUNT(*) AS n,
         |  ${Dsl.d2dSql(Dsl.dsumSql("o_totalprice"))} AS total
         |FROM f JOIN d ON f.grp IS NOT DISTINCT FROM d.dgrp
         |GROUP BY grp ORDER BY grp NULLS FIRST""".stripMargin) { (s, d) =>
      val f = Tables.orders(s, d)
        .select(nullif(col("o_custkey") % 23, lit(11)).as("grp"),
          col("o_totalprice"))
      val dim = Tables.customer(s, d)
        .select(nullif(col("c_custkey") % 23, lit(11)).as("dgrp"))
        .distinct()
      f.join(broadcast(dim), col("grp") <=> col("dgrp"))
        .groupBy("grp")
        .agg(count(lit(1)).as("n"),
          Dsl.d2d(Dsl.dsum(col("o_totalprice"))).as("total"))
        .orderBy(col("grp").asc_nulls_first)
    },

    // Runtime bloom-prefilter join ([[graft.operators.BloomJoin]]): a
    // selective fact⨝dim join where the fact side is filtered by a bloom
    // built over the dim keys BEFORE its shuffle — the 100 TB pattern
    // Spark's InjectRuntimeFilter applies only under narrow plan
    // conditions, made explicit. The bloom is an IMPLEMENTATION of the
    // plain selective join (no false negatives), so the oracle is that
    // join's ANSI text — the hash gate proves the filter drops nothing.
    // BloomJoinSpec additionally gates the fp tail and row-identity.
    // Dim = urgent orders (~20% of keys), so ~80% of lineitem rows never
    // reach the join exchange.
    Q("q_join_bloom",
      s"""SELECT l_returnflag, COUNT(*) AS n,
         |  ${Dsl.d2dSql(Dsl.dsumSql("l_quantity"))} AS qty
         |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |WHERE o_orderpriority = '1-URGENT'
         |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) {
      (s, d) =>
        val fact = Tables.lineitem(s, d).select("l_orderkey", "l_quantity",
          "l_returnflag")
        val dim = Tables.orders(s, d)
          .where(col("o_orderpriority") === "1-URGENT")
          .select("o_orderkey")
        graft.operators.BloomJoin
          .prefiltered(fact, dim, "l_orderkey", "o_orderkey",
            expectedItems = 200000L)
          .groupBy("l_returnflag")
          .agg(count(lit(1)).as("n"),
            Dsl.d2d(Dsl.dsum(col("l_quantity"))).as("qty"))
          .orderBy("l_returnflag")
    },

    // Blocked fuzzy join (record linkage): supplier-name near-matches
    // within a nation, the standard entity-resolution shape — an EQUI
    // blocking key bounds the candidate space, then a cheap row-local
    // edit distance (levenshtein is a built-in on BOTH engines) filters
    // pairs. Reported per block: pair count, closest and total distance.
    //
    // Scale shape: the blocker is an equi-join, so the planner gets a
    // plain shuffle-hash/sort-merge on nk — NO cartesian product, NO
    // udf; the quadratic blow-up is confined inside a block and the
    // distance predicate is evaluated post-join, row-local. At 100 TB
    // the nation key is too coarse a blocker (25 blocks ⇒ skew +
    // quadratic block size); production blocks on (nation, name-prefix)
    // or a q-gram signature so block cardinality scales with the data —
    // the plan shape (equi-block ⨝ + local distance) stays identical,
    // which is exactly why this op is expressed as a join, not a UDF
    // cross-score.
    Q("q_join_fuzzy",
      """WITH s AS (
        |  SELECT s_suppkey AS k, s_nationkey AS nk, s_name AS nm
        |  FROM supplier)
        |SELECT a.nk AS nationkey,
        |  CAST(COUNT(*) AS BIGINT) AS n_pairs,
        |  CAST(MIN(levenshtein(a.nm, b.nm)) AS BIGINT) AS min_dist,
        |  CAST(SUM(levenshtein(a.nm, b.nm)) AS BIGINT) AS sum_dist
        |FROM s a JOIN s b ON a.nk = b.nk AND a.k < b.k
        |WHERE levenshtein(a.nm, b.nm) <= 2
        |GROUP BY a.nk ORDER BY nationkey""".stripMargin) { (s, d) =>
      graft.operators.FuzzyBlockJoin
        .selfPairs(Tables.supplier(s, d), "s_nationkey", "s_suppkey",
          "s_name", maxDist = 2)
        .groupBy(col("block").as("nationkey"))
        .agg(count(lit(1)).as("n_pairs"),
          min(col("dist")).cast("long").as("min_dist"),
          sum(col("dist")).cast("long").as("sum_dist"))
        .orderBy("nationkey")
    },

    // Bucketed co-located join — the 100 TB repeated-join answer: both
    // fact tables are written ONCE with bucketBy(8, key) + sortBy, so
    // every later equi-join on that key is a SortMergeJoin with ZERO
    // exchanges and ZERO sorts (the scan itself satisfies the join's
    // distribution and ordering). A nightly pipeline joining the same
    // keys N times amortizes its one clustering shuffle across all N
    // runs — this is Spark's answer to co-located storage in the
    // reference-class engines. The merge hint keeps the demonstration
    // honest at test SF (a broadcast would trivially avoid the shuffle
    // without proving co-location); the shuffle-free plan is pinned in
    // PlanSpec.
    Q.cap("cap_join_bucketed") { (s, d) =>
      val root = graft.core.Scratch.wiped("bucketed_join")
      s.sql("DROP TABLE IF EXISTS graft_buck_orders")
      s.sql("DROP TABLE IF EXISTS graft_buck_lineitem")
      Tables.orders(s, d).select("o_orderkey", "o_orderdate")
        .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .option("path", s"$root/orders").mode("overwrite")
        .saveAsTable("graft_buck_orders")
      Tables.lineitem(s, d).select(col("l_orderkey"), col("l_quantity"))
        .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .option("path", s"$root/lineitem").mode("overwrite")
        .saveAsTable("graft_buck_lineitem")
      s.table("graft_buck_lineitem").hint("merge")
        .join(s.table("graft_buck_orders").hint("merge"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderkey"))
        .agg(sum(col("l_quantity")).cast("long").as("sum_qty"))
        .orderBy(col("sum_qty").desc, col("o_orderkey")).limit(10)
    }
  )
}
