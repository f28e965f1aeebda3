package graft.queries

import graft.core.{Dsl, Q, Tables}
import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** SURVEY §2.4 aggregations. All sums run through exact DECIMAL (partial+
  * final HashAggregate is then order-independent → safe under any partition
  * count, incl. 1000-executor shuffles); ratios/moments convert the exact
  * decimals to DOUBLE and run one identical IEEE expression tree in both
  * engines (Dsl scaladoc).
  */
object AggQueries {
  import Dsl._

  /** Exact decimal product sum, result pinned to scale 4 (the true scale of
    * ≤2-decimal × ≤2-decimal products — the down-cast only drops trailing
    * zeros). DuckDB factors are DECIMAL(19,4) to force int128 multiply
    * (width ≤18 overflows int64, probed); Spark's BigDecimal is arbitrary
    * precision so (12,4) suffices and keeps the product narrow. */
  private def psum(a: Column, b: Column): Column =
    sum(dec(a) * dec(b)).cast(DecimalType(38, 4))
  private def psumSql(a: String, b: String): String =
    s"CAST(SUM(CAST($a AS DECIMAL(19,4)) * CAST($b AS DECIMAL(19,4))) AS DECIMAL(38,4))"

  val all: Seq[Q] = Seq(
    // Flagship (TPC-H Q1 shape). Sums run exact DECIMAL internally (scale 6
    // for price*(1-disc)*(1+tax) — its true scale), then d2d/d2d6 to the
    // shared DOUBLE output representation (Dsl scaladoc).
    Q("q_agg_pricing_summary",
      s"""SELECT l_returnflag, l_linestatus,
        |  ${d2dSql(dsumSql("l_quantity"))} AS sum_qty,
        |  ${d2dSql(dsumSql("l_extendedprice"))} AS sum_base_price,
        |  ${d2dSql("CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4)) * (1 - CAST(l_discount AS DECIMAL(12,4)))) AS DECIMAL(18,4))")} AS sum_disc_price,
        |  ${d2dSql6("CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4)) * (1 - CAST(l_discount AS DECIMAL(12,4))) * (1 + CAST(l_tax AS DECIMAL(12,4)))) AS DECIMAL(18,6))")} AS sum_charge,
        |  CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS DOUBLE) / COUNT(*) AS avg_qty,
        |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS DOUBLE) / COUNT(*) AS avg_price,
        |  CAST(CAST(SUM(CAST(l_discount AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS DOUBLE) / COUNT(*) AS avg_disc,
        |  COUNT(*) AS count_order
        |FROM lineitem
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          d2d(dsum(col("l_quantity"))).as("sum_qty"),
          d2d(dsum(col("l_extendedprice"))).as("sum_base_price"),
          d2d(sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
            .cast(D18)).as("sum_disc_price"),
          d2d6(sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount")))
            * (lit(1) + dec(col("l_tax")))).cast(D186)).as("sum_charge"),
          davg(col("l_quantity")).as("avg_qty"),
          davg(col("l_extendedprice")).as("avg_price"),
          davg(col("l_discount")).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    },

    // Fixed-width value histogram ($5000 buckets over l_extendedprice):
    // the distribution-profile primitive (skew diagnosis, bucket sizing).
    // Cents via FLOOR(x*100 + 0.5), spelled IDENTICALLY in both engines:
    // a bare double→long cast would truncate in Spark but round in DuckDB,
    // so the cents step must be an explicit symmetric floor (both engines'
    // FLOOR over the same IEEE doubles). Integer cents < 2^53 are exact;
    // one more divide + floor yields the bucket; one map-side combinable
    // groupBy — linear at any scale.
    Q("q_agg_histogram",
      s"""SELECT bucket, COUNT(*) AS n,
         |  ${d2dSql("MIN(l_extendedprice)")} AS lo,
         |  ${d2dSql("MAX(l_extendedprice)")} AS hi,
         |  ${d2dSql(dsumSql("l_extendedprice"))} AS sum_price
         |FROM (
         |  SELECT l_extendedprice,
         |    CAST(FLOOR(FLOOR(l_extendedprice * 100 + 0.5)
         |      / 500000.0) AS BIGINT) AS bucket
         |  FROM lineitem)
         |GROUP BY bucket ORDER BY bucket""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .select(col("l_extendedprice"),
          floor(floor(col("l_extendedprice") * 100 + 0.5).cast("double")
            / 500000.0).cast("long").as("bucket"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n"),
          d2d(min(col("l_extendedprice"))).as("lo"),
          d2d(max(col("l_extendedprice"))).as("hi"),
          d2d(dsum(col("l_extendedprice"))).as("sum_price"))
        .orderBy("bucket")
    },

    Q("q_agg_count_distinct",
      """SELECT o_orderpriority, COUNT(DISTINCT o_custkey) AS uniq_cust, COUNT(*) AS cnt
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin) { (s, d) =>
      Tables.orders(s, d)
        .groupBy("o_orderpriority")
        .agg(countDistinct(col("o_custkey")).as("uniq_cust"), count(lit(1)).as("cnt"))
        .orderBy("o_orderpriority")
    },

    // GROUPING() is pinned to INT on both sides (Spark emits TINYINT, DuckDB
    // BIGINT natively); NULLS FIRST pinned explicitly in the oracle (DuckDB
    // defaults NULLS LAST, Spark ASC defaults NULLS FIRST).
    Q("q_agg_rollup",
      s"""SELECT r_name, n_name,
         |  CAST(GROUPING(r_name) AS INT) AS g_r, CAST(GROUPING(n_name) AS INT) AS g_n,
         |  COUNT(*) AS cnt, ${d2dSql(dsumSql("c_acctbal"))} AS sum_bal
         |FROM customer
         |JOIN nation ON c_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |GROUP BY ROLLUP(r_name, n_name)
         |ORDER BY g_r, g_n, r_name NULLS FIRST, n_name NULLS FIRST""".stripMargin) { (s, d) =>
      // DataFrame .rollup + grouping() trips Spark's ambiguous-self-join
      // lint on the re-selected key columns → express via SQL (same plan:
      // Expand + HashAggregate over two broadcast joins).
      val joined = Tables.customer(s, d)
        .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
        .select("r_name", "n_name", "c_acctbal")
      joined.createOrReplaceTempView("cust_nr")
      s.sql(
        s"""SELECT r_name, n_name,
           |  CAST(GROUPING(r_name) AS INT) AS g_r, CAST(GROUPING(n_name) AS INT) AS g_n,
           |  COUNT(*) AS cnt, ${d2dSql(dsumSql("c_acctbal"))} AS sum_bal
           |FROM cust_nr
           |GROUP BY ROLLUP(r_name, n_name)
           |ORDER BY g_r, g_n, r_name NULLS FIRST, n_name NULLS FIRST""".stripMargin)
    },

    Q("q_agg_cube",
      """SELECT o_orderstatus, o_orderpriority,
        |  CAST(GROUPING(o_orderstatus) AS INT) AS g_s, CAST(GROUPING(o_orderpriority) AS INT) AS g_p,
        |  COUNT(*) AS cnt
        |FROM orders
        |GROUP BY CUBE(o_orderstatus, o_orderpriority)
        |ORDER BY g_s, g_p, o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin) { (s, d) =>
      Tables.orders(s, d)
        .cube("o_orderstatus", "o_orderpriority")
        .agg(grouping("o_orderstatus").cast("int").as("g_s"),
          grouping("o_orderpriority").cast("int").as("g_p"),
          count(lit(1)).as("cnt"))
        .select("o_orderstatus", "o_orderpriority", "g_s", "g_p", "cnt")
        .orderBy(col("g_s"), col("g_p"), col("o_orderstatus").asc_nulls_first,
          col("o_orderpriority").asc_nulls_first)
    },

    Q("q_agg_grouping_sets",
      s"""SELECT event_type, day,
         |  CAST(GROUPING(event_type) AS INT) AS g_t, CAST(GROUPING(day) AS INT) AS g_d,
         |  COUNT(*) AS cnt, ${d2dSql(dsumSql("value"))} AS sum_value
         |FROM (SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, value FROM events) e
         |GROUP BY GROUPING SETS ((event_type), (day), ())
         |ORDER BY g_t, g_d, event_type NULLS FIRST, day NULLS FIRST""".stripMargin) { (s, d) =>
      // day is computed in a subquery: GROUPING() over a raw expression does
      // not resolve in either engine; DuckDB's date_trunc('day') yields DATE
      // so the oracle pins TIMESTAMP to match Spark.
      Tables.events(s, d).createOrReplaceTempView("events")
      s.sql(
        s"""SELECT event_type, day,
           |  CAST(GROUPING(event_type) AS INT) AS g_t, CAST(GROUPING(day) AS INT) AS g_d,
           |  COUNT(*) AS cnt, ${d2dSql(dsumSql("value"))} AS sum_value
           |FROM (SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP_NTZ) AS day, value FROM events) e
           |GROUP BY GROUPING SETS ((event_type), (day), ())
           |ORDER BY g_t, g_d, event_type NULLS FIRST, day NULLS FIRST""".stripMargin)
    },

    // stddev/var/corr/covar from exact decimal moments + one shared IEEE
    // formula — the builtin one-pass reducers are partition-order-dependent
    // FP and would never hash-match (Appendix A rule 4).
    Q("q_agg_stats",
      s"""WITH m AS (
         |  SELECT l_returnflag,
         |    COUNT(*) AS n,
         |    ${d2dSql(dsumSql("l_extendedprice"))} AS sx,
         |    ${d2dSql(dsumSql("l_quantity"))} AS sy,
         |    ${d2dSql(psumSql("l_extendedprice", "l_extendedprice"))} AS sxx,
         |    ${d2dSql(psumSql("l_quantity", "l_quantity"))} AS syy,
         |    ${d2dSql(psumSql("l_extendedprice", "l_quantity"))} AS sxy
         |  FROM lineitem GROUP BY l_returnflag)
         |SELECT l_returnflag, n,
         |  (sxx - sx * sx / n) / (n - 1) AS var_price,
         |  sqrt((sxx - sx * sx / n) / (n - 1)) AS stddev_price,
         |  (syy - sy * sy / n) / (n - 1) AS var_qty,
         |  (sxy - sx * sy / n) / (n - 1) AS covar_pq,
         |  (sxy - sx * sy / n) / sqrt((sxx - sx * sx / n) * (syy - sy * sy / n)) AS corr_pq
         |FROM m ORDER BY l_returnflag""".stripMargin) { (s, d) =>
      val m = Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          d2d(dsum(col("l_extendedprice"))).as("sx"),
          d2d(dsum(col("l_quantity"))).as("sy"),
          d2d(psum(col("l_extendedprice"), col("l_extendedprice"))).as("sxx"),
          d2d(psum(col("l_quantity"), col("l_quantity"))).as("syy"),
          d2d(psum(col("l_extendedprice"), col("l_quantity"))).as("sxy"))
      m.select(col("l_returnflag"), col("n"),
          ((col("sxx") - col("sx") * col("sx") / col("n")) / (col("n") - 1)).as("var_price"),
          sqrt((col("sxx") - col("sx") * col("sx") / col("n")) / (col("n") - 1)).as("stddev_price"),
          ((col("syy") - col("sy") * col("sy") / col("n")) / (col("n") - 1)).as("var_qty"),
          ((col("sxy") - col("sx") * col("sy") / col("n")) / (col("n") - 1)).as("covar_pq"),
          ((col("sxy") - col("sx") * col("sy") / col("n")) /
            sqrt((col("sxx") - col("sx") * col("sx") / col("n")) *
              (col("syy") - col("sy") * col("sy") / col("n")))).as("corr_pq"))
        .orderBy("l_returnflag")
    },

    // max_by/arg_max are tie-unstable in both engines → deterministic
    // windowed pick (Appendix B).
    // Pearson correlation via the one-pass moment formula over EXACT
    // decimal sums (builtin corr/covar accumulate doubles in partition
    // order — nondeterministic under shuffle). The five moments convert
    // through d2d, then one identical IEEE tree on both engines. The
    // formula's cancellation behavior is likewise identical bit-for-bit.
    Q("q_agg_corr",
      s"""WITH s AS (
         |  SELECT l_returnflag,
         |    CAST(COUNT(*) AS DOUBLE) AS n,
         |    ${d2dSql(dsumSql("l_quantity"))} AS sx,
         |    ${d2dSql(dsumSql("l_extendedprice"))} AS sy,
         |    ${d2dSql(psumSql("l_quantity", "l_extendedprice"))} AS sxy,
         |    ${d2dSql(psumSql("l_quantity", "l_quantity"))} AS sxx,
         |    ${d2dSql(psumSql("l_extendedprice", "l_extendedprice"))} AS syy
         |  FROM lineitem GROUP BY l_returnflag)
         |SELECT l_returnflag, CAST(n AS BIGINT) AS cnt,
         |  (n * sxy - sx * sy)
         |    / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)) AS corr_qp
         |FROM s ORDER BY l_returnflag""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d).groupBy("l_returnflag")
        .agg(count(lit(1)).cast("double").as("n"),
          d2d(dsum(col("l_quantity"))).as("sx"),
          d2d(dsum(col("l_extendedprice"))).as("sy"),
          d2d(psum(col("l_quantity"), col("l_extendedprice"))).as("sxy"),
          d2d(psum(col("l_quantity"), col("l_quantity"))).as("sxx"),
          d2d(psum(col("l_extendedprice"), col("l_extendedprice"))).as("syy"))
        .select(col("l_returnflag"), col("n").cast("bigint").as("cnt"),
          ((col("n") * col("sxy") - col("sx") * col("sy"))
            / (sqrt(col("n") * col("sxx") - col("sx") * col("sx"))
              * sqrt(col("n") * col("syy") - col("sy") * col("sy"))))
            .as("corr_qp"))
        .orderBy("l_returnflag")
    },

    // Skewness + kurtosis (population) from EXACT raw moments: x² of a
    // 2-decimal input is exactly DECIMAL(12,4), so x³ = x²·x and x⁴ =
    // x²·x² stay exact; the four decimal sums convert through d2d and
    // the central-moment expansion runs as one identical IEEE tree on
    // both engines (m2^1.5 via m2·sqrt(m2) — pow is libm, banned).
    // Builtin skewness/kurtosis accumulate doubles in partition order —
    // nondeterministic under shuffle, never used (same rule as corr).
    Q("q_agg_moments",
      s"""WITH b AS (
         |  SELECT l_returnflag, CAST(l_quantity AS DECIMAL(12,4)) AS xd,
         |    CAST(CAST(l_quantity AS DECIMAL(12,4)) * CAST(l_quantity AS DECIMAL(12,4)) AS DECIMAL(12,4)) AS x2
         |  FROM lineitem),
         |s AS (
         |  SELECT l_returnflag,
         |    CAST(COUNT(*) AS DOUBLE) AS n,
         |    ${d2dSql("CAST(SUM(xd) AS DECIMAL(18,4))")} AS sx,
         |    ${d2dSql("CAST(SUM(x2) AS DECIMAL(38,4))")} AS sxx,
         |    ${d2dSql6("CAST(SUM(x2 * xd) AS DECIMAL(38,6))")} AS sxxx,
         |    ${d2dSql8("CAST(SUM(x2 * x2) AS DECIMAL(38,8))")} AS sxxxx
         |  FROM b GROUP BY l_returnflag)
         |SELECT l_returnflag, CAST(n AS BIGINT) AS cnt,
         |  (sxxx / n - 3e0 * (sx / n) * (sxx / n)
         |     + 2e0 * (sx / n) * (sx / n) * (sx / n))
         |    / ((sxx / n - (sx / n) * (sx / n))
         |       * sqrt(sxx / n - (sx / n) * (sx / n))) AS skewness,
         |  (sxxxx / n - 4e0 * (sx / n) * (sxxx / n)
         |     + 6e0 * (sx / n) * (sx / n) * (sxx / n)
         |     - 3e0 * (sx / n) * (sx / n) * (sx / n) * (sx / n))
         |    / ((sxx / n - (sx / n) * (sx / n))
         |       * (sxx / n - (sx / n) * (sx / n))) AS kurtosis
         |FROM s ORDER BY l_returnflag""".stripMargin) { (s, d) =>
      val xd = col("l_quantity").cast(DFac)
      val x2 = (xd * xd).cast(DFac)
      val base = Tables.lineitem(s, d)
        .select(col("l_returnflag"), xd.as("xd"), x2.as("x2"))
      val sums = base.groupBy("l_returnflag").agg(
        count(lit(1)).cast("double").as("n"),
        d2d(sum(col("xd")).cast(D18)).as("sx"),
        d2d(sum(col("x2")).cast(DecimalType(38, 4))).as("sxx"),
        d2d6(sum(col("x2") * col("xd")).cast(DecimalType(38, 6))).as("sxxx"),
        d2d8(sum(col("x2") * col("x2")).cast(DecimalType(38, 8))).as("sxxxx"))
      val m = col("sx") / col("n")
      val m2 = col("sxx") / col("n") - m * m
      val skew = (col("sxxx") / col("n") - lit(3e0) * m * (col("sxx") / col("n"))
          + lit(2e0) * m * m * m) / (m2 * sqrt(m2))
      val kurt = (col("sxxxx") / col("n") - lit(4e0) * m * (col("sxxx") / col("n"))
          + lit(6e0) * m * m * (col("sxx") / col("n"))
          - lit(3e0) * m * m * m * m) / (m2 * m2)
      sums.select(col("l_returnflag"), col("n").cast("bigint").as("cnt"),
          skew.as("skewness"), kurt.as("kurtosis"))
        .orderBy("l_returnflag")
    },

    // Bitwise aggregates — exact integer folds, associative+commutative ⇒
    // partition-order independent by construction.
    Q("q_agg_bitwise",
      """SELECT o_orderstatus,
        |  BIT_AND(o_orderkey) AS k_and,
        |  BIT_OR(o_orderkey) AS k_or,
        |  BIT_XOR(o_orderkey) AS k_xor,
        |  COUNT(*) AS cnt
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin) { (s, d) =>
      Tables.orders(s, d).groupBy("o_orderstatus")
        .agg(expr("bit_and(o_orderkey)").as("k_and"),
          expr("bit_or(o_orderkey)").as("k_or"),
          expr("bit_xor(o_orderkey)").as("k_xor"),
          count(lit(1)).as("cnt"))
        .orderBy("o_orderstatus")
    },

    // Mode (most frequent value) with deterministic ties — the window
    // runs over the already-aggregated (status, priority) pairs (tiny).
    Q("q_agg_mode",
      """SELECT o_orderstatus, pri AS mode_priority, c FROM (
        |  SELECT o_orderstatus, o_orderpriority AS pri, COUNT(*) AS c,
        |    row_number() OVER (PARTITION BY o_orderstatus
        |      ORDER BY COUNT(*) DESC, o_orderpriority) AS rn
        |  FROM orders GROUP BY o_orderstatus, o_orderpriority) t
        |WHERE rn = 1 ORDER BY o_orderstatus""".stripMargin) { (s, d) =>
      val agg = Tables.orders(s, d)
        .groupBy("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("c"))
      val w = Window.partitionBy("o_orderstatus")
        .orderBy(col("c").desc, col("o_orderpriority"))
      agg.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("o_orderstatus"), col("o_orderpriority").as("mode_priority"),
          col("c"))
        .orderBy("o_orderstatus")
    },

    Q("q_agg_argmax",
      """SELECT o_orderpriority, o_orderkey, o_totalprice FROM (
        |  SELECT o_orderpriority, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_orderpriority
        |                       ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders) t
        |WHERE rn = 1 ORDER BY o_orderpriority""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("o_orderpriority")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables.orders(s, d)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select("o_orderpriority", "o_orderkey", "o_totalprice")
        .orderBy("o_orderpriority")
    },

    // Exact interpolated percentiles via a shared manual formula: builtin
    // percentile/percentile_cont interpolate with different FP expression
    // trees across engines, so both sides compute
    //   v[k] + f * (v[k+1] - v[k]),  pos = p*(n-1), k = floor(pos), f = pos-k
    // The ORACLE ranks with a per-group row_number (fine in DuckDB); the
    // Spark side gets the same v[k] values scale-safely via HistogramRank —
    // a per-status global window would sort the whole table in 3 tasks at
    // 100 TB, whereas the histogram form only sorts the buckets containing
    // the target positions (RankSpec asserts equality with the window form).
    Q("q_agg_percentile",
      """WITH r AS (
        |  SELECT o_orderstatus, o_totalprice AS v,
        |    row_number() OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice) - 1 AS i,
        |    COUNT(*) OVER (PARTITION BY o_orderstatus) AS n
        |  FROM orders),
        |k AS (
        |  -- 0.5e0/0.9e0: scientific literals are DOUBLE in DuckDB; a bare
        |  -- 0.9 parses as DECIMAL there, making f EXACT where Spark's
        |  -- double math is not (1-ulp p90 divergence, caught at sf0.1)
        |  SELECT o_orderstatus, v, i,
        |    CAST(FLOOR(0.5e0 * (n - 1)) AS BIGINT) AS k50, 0.5e0 * (n - 1) - FLOOR(0.5e0 * (n - 1)) AS f50,
        |    CAST(FLOOR(0.9e0 * (n - 1)) AS BIGINT) AS k90, 0.9e0 * (n - 1) - FLOOR(0.9e0 * (n - 1)) AS f90
        |  FROM r)
        |SELECT o_orderstatus,
        |  MAX(CASE WHEN i = k50 THEN v END)
        |    + MAX(f50) * (COALESCE(MAX(CASE WHEN i = k50 + 1 THEN v END), MAX(CASE WHEN i = k50 THEN v END))
        |                  - MAX(CASE WHEN i = k50 THEN v END)) AS p50,
        |  MAX(CASE WHEN i = k90 THEN v END)
        |    + MAX(f90) * (COALESCE(MAX(CASE WHEN i = k90 + 1 THEN v END), MAX(CASE WHEN i = k90 THEN v END))
        |                  - MAX(CASE WHEN i = k90 THEN v END)) AS p90
        |FROM k GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin) { (s, d) =>
      val orders = Tables.orders(s, d)
        .select(col("o_orderstatus"), col("o_totalprice").as("v"))
      // ONE stats scan feeds the percentile positions AND the histogram's
      // domain bounds (HistogramRank's stats hook); the lazy checkpoint
      // stops each broadcast of a derived frame from re-running the scan
      val nDf = orders.groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"),
          min(col("v").cast("double")).as("lo"),
          max(col("v").cast("double")).as("hi"))
        .localCheckpoint(eager = false)
      def pctCols(p: Double, tag: String) = {
        val pos = lit(p) * (col("n") - 1)
        Seq(floor(pos).cast("bigint").as(s"k$tag"), (pos - floor(pos)).as(s"f$tag"))
      }
      val ks = nDf.select(Seq(col("o_orderstatus")) ++
        pctCols(0.5, "50") ++ pctCols(0.9, "90"): _*)
      // duplicate positions (k50+1 == k90 etc.) are harmless downstream —
      // the MAX-of-CASE agg dedups — so no distinct() shuffle
      val positions = ks.select(col("o_orderstatus"),
        explode(array(col("k50"), col("k50") + 1, col("k90"), col("k90") + 1)).as("pos"))
      // depth 1: adaptive bounds alone spread this domain; the recursive
      // refinement level (RankSpec) is for adversarially-clustered domains
      // and costs an extra round of driver-blocking jobs
      val vals = graft.operators.HistogramRank.valuesAtPositions(
        orders, "o_orderstatus", "v", positions, depth = 1,
        stats = Some(nDf.select("o_orderstatus", "n", "lo", "hi")))
      // Classify the ≤12 positional values by tag in ONE pass (MAX-of-CASE,
      // the oracle's own shape) — a join per tag would re-evaluate the
      // whole rank subtree four times.
      val j = vals.join(broadcast(ks), col("grp") === col("o_orderstatus"))
        .groupBy("o_orderstatus")
        .agg(
          max(when(col("pos") === col("k50"), col("v"))).as("va50"),
          max(when(col("pos") === col("k50") + 1, col("v"))).as("vb50"),
          max(when(col("pos") === col("k90"), col("v"))).as("va90"),
          max(when(col("pos") === col("k90") + 1, col("v"))).as("vb90"),
          max(col("f50")).as("fx50"), max(col("f90")).as("fx90"))
      def interp(tag: String) = {
        val va = col(s"va$tag")
        val vb = coalesce(col(s"vb$tag"), va)
        va + col(s"fx$tag") * (vb - va)
      }
      j.select(col("o_orderstatus"), interp("50").as("p50"), interp("90").as("p90"))
        .orderBy("o_orderstatus")
    },

    // Robust statistics: per-group DISCRETE median (the value at rank
    // ⌊(n−1)/2⌋ — an actual data point, so no cross-engine interpolation
    // arithmetic) and the median absolute deviation around it. Both
    // selections ride HistogramRank.valuesAtPositions: small groups take
    // the plain window form, large groups the bucketed histogram — never
    // an unbounded single-task sort (the 100 TB shape for two-level
    // order statistics).
    Q("q_agg_mad",
      """WITH r AS (
        |  SELECT l_returnflag, l_quantity AS v,
        |    row_number() OVER (PARTITION BY l_returnflag ORDER BY l_quantity) - 1 AS i,
        |    COUNT(*) OVER (PARTITION BY l_returnflag) AS n
        |  FROM lineitem),
        |med AS (
        |  SELECT l_returnflag,
        |    MAX(CASE WHEN i = CAST(FLOOR((n - 1) / 2.0e0) AS BIGINT) THEN v END) AS med
        |  FROM r GROUP BY l_returnflag),
        |dev AS (
        |  SELECT r.l_returnflag, m.med, ABS(r.v - m.med) AS dv,
        |    row_number() OVER (PARTITION BY r.l_returnflag ORDER BY ABS(r.v - m.med)) - 1 AS j,
        |    COUNT(*) OVER (PARTITION BY r.l_returnflag) AS n2
        |  FROM r JOIN med m ON r.l_returnflag = m.l_returnflag)
        |SELECT l_returnflag, MAX(med) AS med,
        |  MAX(CASE WHEN j = CAST(FLOOR((n2 - 1) / 2.0e0) AS BIGINT) THEN dv END) AS mad
        |FROM dev GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin) { (s, d) =>
      import graft.operators.HistogramRank
      val li = Tables.lineitem(s, d)
        .select(col("l_returnflag"), col("l_quantity").as("v"))
      // Discrete-domain route (the common case for typed quantity-like
      // columns; the fixture carries 50 distinct values): both order
      // statistics collapse to count-histogram selection. Round-11: the
      // per-(group, value) counts frame is built FIRST and ndv derived
      // from it (counts.count() on the cached frame) — one scan of the
      // fact total, where round 10 paid a separate approx_count_distinct
      // probe scan before the counts scan (two scans + an extra
      // serialized driver action, ~40% of the query's 4.7 s median).
      // Trade-off, documented: when the domain turns out CONTINUOUS
      // (ndv > 65536) this route has shuffled n (grp, v, c) rows where
      // the old probe shuffled nothing — bounded by one scan's volume,
      // unpersisted immediately, and the fallback's own multi-scan cost
      // dominates it. (Discrete selection is exact — identical to the
      // oracle's rank definition — not an approximation.)
      val counts0 = li.groupBy("l_returnflag", "v")
        .agg(count(lit(1)).as("c"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val ndv = counts0.count()
      if (ndv <= 65536) {
        val counts = counts0 // ndv-sized, cached; reused by both selections
        def valueAt(cnts: org.apache.spark.sql.DataFrame, valCol: String,
                    outCol: String) = {
          val run = Window.partitionBy("l_returnflag").orderBy(valCol)
          val all = Window.partitionBy("l_returnflag")
          // 0-based target index floor((n-1)/2): the value whose
          // cumulative-count interval [cum−c, cum) covers it
          cnts.withColumn("cum", sum(col("c")).over(run))
            .withColumn("p", floor((sum(col("c")).over(all) - 1) / 2.0))
            .filter(col("cum") - col("c") <= col("p") && col("p") < col("cum"))
            .select(col("l_returnflag"), col(valCol).as(outCol))
        }
        val med = valueAt(counts, "v", "med")
        val devCounts = counts.join(broadcast(med), "l_returnflag")
          .groupBy(col("l_returnflag"), abs(col("v") - col("med")).as("dv"))
          .agg(sum(col("c")).as("c"))
        // Materialize the group-sized result NOW (eager localCheckpoint)
        // so the ndv-sized cache can be dropped before returning:
        // round-11 advice — the persist used to outlive the query
        // (ContextCleaner-GC lifetime), leaking a ≤65536-row block per
        // invocation across a 263-query bench session. The final
        // orderBy re-sorts the ≤|groups| checkpointed rows, so row
        // order stays deterministic regardless of RDD scan order.
        val res = med.join(valueAt(devCounts, "dv", "mad"), "l_returnflag")
          .select(col("l_returnflag"), col("med"), col("mad"))
          .localCheckpoint(true)
        counts0.unpersist(false)
        res.orderBy("l_returnflag")
      } else {
        counts0.unpersist(false)
        // Level-1 stats CAN still come from counts0 (it holds every
        // distinct value with its multiplicity) — but n-row re-shuffles
        // of a huge counts frame lose to a straight fact re-scan with
        // map-side partial min/max/count, so the fallback stays on li.
        val stats = li.groupBy("l_returnflag").agg(count(lit(1)).as("n"),
            min(col("v").cast("double")).as("lo"),
            max(col("v").cast("double")).as("hi"))
          .localCheckpoint(eager = false)
        val pos = stats.select(col("l_returnflag"),
          floor((col("n") - 1) / 2.0).cast("long").as("pos"))
        val med = HistogramRank.valuesAtPositions(li, "l_returnflag", "v",
            pos, stats = Some(stats))
          .select(col("grp").as("l_returnflag"), col("v").as("med"))
          .localCheckpoint(eager = false)
        // med is one row per group — broadcast back onto the fact rows.
        // No checkpoint: with level-2 stats DERIVED below, the deviations
        // frame has exactly one consumer and materializing 600k rows to
        // local disk was the single biggest cost of this query (round-10
        // guard: 5.4 s, 2.8x the next-slowest query).
        val dev = li.join(broadcast(med), "l_returnflag")
          .select(col("l_returnflag"), abs(col("v") - col("med")).as("dv"))
        // Level-2 stats need NO scan of dev: the row count is level 1's n
        // exactly (|v−med| keeps every row), and HistogramRank only needs
        // BOUNDS for its bucket domain — 0 ≤ |v−med| ≤ max(hi−med, med−lo)
        // is tight enough and metadata-derived (3 rows joined to 3 rows).
        val stats2 = stats.join(med, "l_returnflag")
          .select(col("l_returnflag"), col("n"), lit(0.0).as("lo"),
            greatest(col("hi") - col("med"), col("med") - col("lo")).as("hi"))
          .localCheckpoint(eager = false)
        val pos2 = stats2.select(col("l_returnflag"),
          floor((col("n") - 1) / 2.0).cast("long").as("pos"))
        val mad = HistogramRank.valuesAtPositions(dev, "l_returnflag", "dv",
            pos2, stats = Some(stats2))
          .select(col("grp").as("l_returnflag"), col("v").as("mad"))
        med.join(mad, "l_returnflag")
          .select(col("l_returnflag"), col("med"), col("mad"))
          .orderBy("l_returnflag")
      }
    },

    Q("q_agg_collect_sorted",
      """SELECT n_name, string_agg(s_name, ',' ORDER BY s_name) AS names
        |FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin) { (s, d) =>
      Tables.supplier(s, d)
        .join(broadcast(Tables.nation(s, d)), col("s_nationkey") === col("n_nationkey"))
        .groupBy("n_name")
        .agg(array_join(array_sort(collect_list(col("s_name"))), ",").as("names"))
        .orderBy("n_name")
    },

    Q("q_agg_weighted_avg",
      s"""SELECT p_type,
         |  ${d2dSql(psumSql("l_extendedprice", "l_quantity"))}
         |    / CAST(${dsumSql("l_quantity")} AS DOUBLE) AS wavg
         |FROM lineitem JOIN part ON l_partkey = p_partkey
         |GROUP BY p_type ORDER BY p_type""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .join(broadcast(Tables.part(s, d)), col("l_partkey") === col("p_partkey"))
        .groupBy("p_type")
        .agg((d2d(psum(col("l_extendedprice"), col("l_quantity")))
          / dsum(col("l_quantity")).cast(DoubleType)).as("wavg"))
        .orderBy("p_type")
    },

    // Interpolated (continuous) median — percentile_cont(0.5) as exact
    // cross-engine arithmetic: the two straddling order statistics are
    // selected POSITIONALLY (rn = (n+1) div 2 and (n+2) div 2, which
    // coincide for odd n — pure integer math, both engines pick the
    // identical sorted elements; the value at a sorted position is
    // well-defined under ties), then averaged as exact-decimal-sum →
    // d2d double → ÷ COUNT(*), the davg-pinned IEEE tree. Native
    // percentile_cont/approx FP paths diverge across engines — this is
    // the hash-stable form. ONE window exchange on the group key; the
    // filter + rollup reuse its layout.
    Q("q_agg_median_cont",
      s"""WITH r AS (
         |  SELECT l_returnflag, l_extendedprice,
         |    ROW_NUMBER() OVER (PARTITION BY l_returnflag
         |      ORDER BY l_extendedprice) AS rn,
         |    COUNT(*) OVER (PARTITION BY l_returnflag) AS n
         |  FROM lineitem)
         |SELECT l_returnflag, CAST(MAX(n) AS BIGINT) AS n,
         |  ${d2dSql(dsumSql("l_extendedprice"))} / COUNT(*) AS median_cont
         |FROM r WHERE rn = (n+1)//2 OR rn = (n+2)//2
         |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, d) =>
      val byFlag = Window.partitionBy("l_returnflag")
      Tables.lineitem(s, d)
        .select(col("l_returnflag"), col("l_extendedprice"))
        .withColumn("rn",
          row_number().over(byFlag.orderBy("l_extendedprice")))
        .withColumn("n", count(lit(1)).over(byFlag))
        .filter(col("rn") === expr("(n+1) div 2") ||
          col("rn") === expr("(n+2) div 2"))
        .groupBy("l_returnflag")
        .agg(max(col("n")).cast("long").as("n"),
          (d2d(dsum(col("l_extendedprice"))) / count(lit(1)))
            .as("median_cont"))
        .orderBy("l_returnflag")
    },

    // Scalar subquery: orders priced above 2× the global mean (exact
    // decimal mean → shared double tree) — exercises ScalarSubquery
    // planning (one broadcast scalar, no per-row recompute).
    Q("q_subquery_scalar",
      s"""SELECT o_orderkey, o_totalprice
         |FROM orders
         |WHERE o_totalprice > 2 * (SELECT ${davgSql("o_totalprice")} FROM orders)
         |ORDER BY o_orderkey""".stripMargin) { (s, d) =>
      Tables.orders(s, d).createOrReplaceTempView("orders_sq")
      s.sql(
        s"""SELECT o_orderkey, o_totalprice
           |FROM orders_sq
           |WHERE o_totalprice > 2 * (SELECT ${davgSql("o_totalprice")} FROM orders_sq)
           |ORDER BY o_orderkey""".stripMargin)
    },

    // GROUP BY + HAVING on an exact decimal sum (the HAVING predicate stays
    // on the exact decimal; only the emitted column converts to double).
    Q("q_having",
      s"""SELECT o_custkey, COUNT(*) AS cnt, ${d2dSql(dsumSql("o_totalprice"))} AS total
         |FROM orders
         |GROUP BY o_custkey
         |HAVING ${dsumSql("o_totalprice")} > 1500000
         |ORDER BY o_custkey""".stripMargin) { (s, d) =>
      Tables.orders(s, d)
        .groupBy("o_custkey")
        .agg(count(lit(1)).as("cnt"), dsum(col("o_totalprice")).as("total_dec"))
        .filter(col("total_dec") > 1500000)
        .select(col("o_custkey"), col("cnt"), d2d(col("total_dec")).as("total"))
        .orderBy("o_custkey")
    },

    // Pivot: wide counts per (priority × status). The oracle spells the
    // fixed status domain as FILTER'd counts — same columns, same values.
    Q("q_pivot",
      """SELECT o_orderpriority,
        |  COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS "F",
        |  COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS "O",
        |  COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS "P"
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin) { (s, d) =>
      Tables.orders(s, d)
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(count(lit(1)))
        .orderBy("o_orderpriority")
    },

    // Unpivot/melt: two exact-decimal measures converted to the double
    // output representation, then stacked to (measure, value) rows.
    Q("q_unpivot",
      s"""SELECT l_returnflag, measure, value FROM (
        |  SELECT l_returnflag, 'sum_qty' AS measure,
        |    ${d2dSql(dsumSql("l_quantity"))} AS value
        |  FROM lineitem GROUP BY l_returnflag
        |  UNION ALL
        |  SELECT l_returnflag, 'sum_price' AS measure,
        |    ${d2dSql(dsumSql("l_extendedprice"))} AS value
        |  FROM lineitem GROUP BY l_returnflag) u
        |ORDER BY l_returnflag, measure""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(d2d(dsum(col("l_quantity"))).as("sum_qty"),
          d2d(dsum(col("l_extendedprice"))).as("sum_price"))
        .unpivot(Array(col("l_returnflag")),
          Array(col("sum_qty"), col("sum_price")), "measure", "value")
        .orderBy("l_returnflag", "measure")
    },

    // Herfindahl–Hirschman concentration index per group — how
    // concentrated is supplier share of shipped quantity? HHI = Σ shareᵢ²
    // computed as ONE exact integer division: (Σcᵢ²)·10⁶ // (Σcᵢ)² over
    // cents-integer per-supplier totals — no per-supplier FP shares, no
    // rounding drift. Exact to ~3×10¹⁵ total cents per group (≈ the
    // 100 TB corpus), loud overflow beyond. Shape: two map-side-
    // combinable aggregates (supplier totals, then the group moment) —
    // the same two-level layout as q_graph_degree.
    Q("q_agg_hhi",
      """WITH c AS (
        |  SELECT l_linestatus AS st, l_suppkey,
        |    CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(12,2)) * 100 AS BIGINT))
        |      AS HUGEINT) AS q
        |  FROM lineitem GROUP BY 1, 2),
        |a AS (
        |  SELECT st, COUNT(*) AS n_supp, SUM(q) AS s, SUM(q * q) AS q2
        |  FROM c GROUP BY st)
        |SELECT st AS l_linestatus, CAST(n_supp AS BIGINT) AS n_supp,
        |  CAST((q2 * 1000000) // (s * s) AS BIGINT) AS hhi_e6
        |FROM a ORDER BY st""".stripMargin) { (s, d) =>
      val c = Tables.lineitem(s, d)
        .groupBy(col("l_linestatus").as("st"), col("l_suppkey"))
        .agg(sum((col("l_quantity").cast(DecimalType(12, 2)) * 100)
          .cast(LongType)).cast("decimal(16,0)").as("q"))
      c.groupBy("st")
        .agg(count(lit(1)).as("n_supp"),
          sum(col("q")).as("s"),
          sum((col("q") * col("q")).cast("decimal(33,0)")).as("q2"))
        .selectExpr("st AS l_linestatus", "CAST(n_supp AS BIGINT) AS n_supp",
          "CAST((q2 * 1000000) div (s * s) AS BIGINT) AS hhi_e6")
        .orderBy("l_linestatus")
    },

    // Skyline (2-D Pareto frontier): per group, the (price, quantity)
    // points not dominated by any other (≤ in both, < in one) — the
    // multi-criteria "best offers" operator. The naive oracle is an
    // O(n²) NOT-EXISTS self-join; for 2-D, sorting by (x, y) and keeping
    // rows strictly below the running min of y over STRICTLY PRECEDING
    // rows is the exact same set in ONE ordered window pass — linear
    // after the sort, the shape that survives 100 TB (same cost class as
    // any ranked window; no self-join ever materializes). Exactness:
    // cents-integer domain, DISTINCT points, deterministic (x, y) order —
    // both engines walk the identical sequence.
    Q("q_agg_skyline",
      """WITH p AS (
        |  SELECT DISTINCT l_returnflag,
        |    CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS price_c,
        |    CAST(CAST(l_quantity AS DECIMAL(12,2)) * 100 AS BIGINT) AS qty_c
        |  FROM lineitem),
        |s AS (
        |  SELECT l_returnflag, price_c, qty_c,
        |    MIN(qty_c) OVER (PARTITION BY l_returnflag ORDER BY price_c, qty_c
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_min
        |  FROM p)
        |SELECT l_returnflag, price_c, qty_c
        |FROM s WHERE prev_min IS NULL OR qty_c < prev_min
        |ORDER BY l_returnflag, price_c, qty_c""".stripMargin) { (s, d) =>
      val p = Tables.lineitem(s, d).select(col("l_returnflag"),
          (col("l_extendedprice").cast(DecimalType(12, 2)) * 100)
            .cast(LongType).as("price_c"),
          (col("l_quantity").cast(DecimalType(12, 2)) * 100)
            .cast(LongType).as("qty_c"))
        .distinct()
      val w = Window.partitionBy("l_returnflag")
        .orderBy("price_c", "qty_c")
        .rowsBetween(Window.unboundedPreceding, -1)
      p.withColumn("prev_min", min(col("qty_c")).over(w))
        .filter(col("prev_min").isNull || col("qty_c") < col("prev_min"))
        .select("l_returnflag", "price_c", "qty_c")
        .orderBy("l_returnflag", "price_c", "qty_c")
    },

    // HLL sketches are not bit-portable across engines → capability only;
    // ScalaTest bounds-checks vs exact (PropertySpec).
    Q.cap("cap_agg_approx") { (s, d) =>
      Tables.orders(s, d)
        .select(approx_count_distinct(col("o_custkey")).as("approx_cust"))
    },

    // Approximate percentile sketch: at 100 TB the exact HistogramRank
    // percentiles (q_agg_percentile) trade for a mergeable single-pass
    // sketch when interpolated exactness is waived. Sketch internals are
    // not bit-portable across engines → capability only; PropertySpec
    // bounds-checks against the exact query.
    Q.cap("cap_agg_approx_percentile") { (s, d) =>
      Tables.orders(s, d)
        .groupBy("o_orderstatus")
        .agg(
          percentile_approx(col("o_totalprice"), lit(0.5), lit(10000)).as("ap50"),
          percentile_approx(col("o_totalprice"), lit(0.9), lit(10000)).as("ap90"))
        .orderBy("o_orderstatus")
    },

    // Mergeable distinct-count sketches (DataSketches HLL): the incremental
    // 100 TB pattern. Stage 1 builds one small binary sketch per
    // (status, order-month) partition — at scale these are persisted next to
    // each day's ingest; stage 2 answers per-status distinct customers by
    // UNIONing the partials (hll_union_agg), never rescanning the fact
    // table. PropertySpec asserts the merged estimate tracks both the exact
    // count and the single-pass sketch.
    Q.cap("cap_agg_sketch_merge") { (s, d) =>
      val partials = Tables.orders(s, d)
        .groupBy(col("o_orderstatus"),
          date_trunc("month", col("o_orderdate")).as("om"))
        .agg(hll_sketch_agg(col("o_custkey"), lit(12)).as("sk"))
      partials
        .groupBy("o_orderstatus")
        .agg(
          count(lit(1)).as("n_partials"),
          hll_sketch_estimate(hll_union_agg(col("sk"))).as("est_cust"))
        .orderBy("o_orderstatus")
    },

    // SpaceSaving heavy hitters ([[graft.operators.HeavyHitters]]): the
    // mergeable top-k frequency sketch — top terms over a key domain too
    // wide to groupBy exactly. Planned as a normal partial+final
    // aggregate: each scan task folds its rows into one m-entry summary
    // and only #tasks × m entries cross the wire. SketchSpec gates the
    // SpaceSaving invariants (est ≥ true ≥ est − err; every key above
    // the m-th estimate is present) and exactness when m ≥ vocabulary.
    Q.cap("cap_agg_heavyhitters") { (s, d) =>
      val terms = Tables.documents(s, d)
        .select(explode(split(col("text"), " ")).as("term"))
        .filter(length(col("term")) > 0)
      terms
        .agg(graft.operators.HeavyHitters.heavyHitters(16)(col("term")).as("sk"))
        .select(explode(col("sk")).as("e"))
        .select(col("e._1").as("term"), col("e._2").as("est_count"),
          col("e._3").as("max_err"))
        .orderBy(desc("est_count"), col("term"))
    },

    // Gini–Simpson diversity index per group with EXACT integer
    // arithmetic: 1 − Σp² over the brand mix of each linestatus, emitted
    // as the fraction (n² − Σc²)/n² — the diversity/concentration
    // counterpart to q_agg_hhi's market-share form, and (unlike Shannon
    // entropy) expressible with no logarithm, so it is bitwise-checkable
    // across engines.
    //
    // Scale shape: one (status, brand) count aggregate (map-side
    // combinable, ≤2×25 cells at any sf — the support is the categorical
    // domain), then a metadata-sized rollup. LONG squares hold to ~3·10⁹
    // rows per status; DECIMAL(38,0) beyond.
    Q("q_agg_simpson",
      """WITH c AS (
        |  SELECT l_linestatus AS st, p_brand AS b, COUNT(*) AS c
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  GROUP BY st, b)
        |SELECT st AS l_linestatus,
        |  CAST(SUM(c) AS BIGINT) AS n,
        |  CAST(SUM(c) * SUM(c) - SUM(c * c) AS BIGINT) AS simpson_num,
        |  CAST(SUM(c) * SUM(c) AS BIGINT) AS simpson_den
        |FROM c GROUP BY st ORDER BY st""".stripMargin) { (s, d) =>
      val c = Tables.lineitem(s, d)
        .join(Tables.part(s, d), col("l_partkey") === col("p_partkey"))
        .groupBy(col("l_linestatus").as("st"), col("p_brand").as("b"))
        .agg(count(lit(1)).as("c"))
      c.groupBy("st")
        .agg(sum(col("c")).cast("long").as("n"),
          (sum(col("c")) * sum(col("c")) - sum(col("c") * col("c")))
            .cast("long").as("simpson_num"),
          (sum(col("c")) * sum(col("c"))).cast("long").as("simpson_den"))
        .select(col("st").as("l_linestatus"), col("n"),
          col("simpson_num"), col("simpson_den"))
        .orderBy("l_linestatus")
    },

    // Four-quantile summary (p25/p50/p75/p90) of line price per
    // linenumber in ONE pass — the summary-stats table that heads every
    // profiling report, with POSITIONAL (disc) quantiles: value at
    // sorted position ⌈q·n/100⌉, the position computed by the
    // exactly-divisible-`/` trunc trick ((x − x%100)/100, IEEE-exact in
    // both engines — no dialect div, no interpolation, no FP position).
    // Ties make the positional value well-defined regardless of tie
    // order (the q_stat_winsorize argument).
    //
    // Scale shape: ONE (group, cents) histogram exchange (map-side
    // combinable, support ≤ the cent domain); the cumulative window and
    // the 4-position probes ride that histogram; the rollup is
    // |groups|-bounded. No per-quantile rescans — all four come off the
    // same cum column.
    Q("q_agg_quartiles",
      """WITH h AS (
        |  SELECT l_linenumber AS g,
        |    CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT)
        |      AS v,
        |    COUNT(*) AS c
        |  FROM lineitem GROUP BY 1, 2),
        |w AS (
        |  SELECT g, v, c,
        |    SUM(c) OVER (PARTITION BY g ORDER BY v) AS cum,
        |    SUM(c) OVER (PARTITION BY g) AS n
        |  FROM h)
        |SELECT g AS l_linenumber, CAST(MAX(n) AS BIGINT) AS n,
        |  CAST(MAX(CASE WHEN cum - c < (25 * n + 99 - (25 * n + 99) % 100) / 100
        |    AND (25 * n + 99 - (25 * n + 99) % 100) / 100 <= cum
        |    THEN v END) AS BIGINT) AS p25_cents,
        |  CAST(MAX(CASE WHEN cum - c < (50 * n + 99 - (50 * n + 99) % 100) / 100
        |    AND (50 * n + 99 - (50 * n + 99) % 100) / 100 <= cum
        |    THEN v END) AS BIGINT) AS p50_cents,
        |  CAST(MAX(CASE WHEN cum - c < (75 * n + 99 - (75 * n + 99) % 100) / 100
        |    AND (75 * n + 99 - (75 * n + 99) % 100) / 100 <= cum
        |    THEN v END) AS BIGINT) AS p75_cents,
        |  CAST(MAX(CASE WHEN cum - c < (90 * n + 99 - (90 * n + 99) % 100) / 100
        |    AND (90 * n + 99 - (90 * n + 99) % 100) / 100 <= cum
        |    THEN v END) AS BIGINT) AS p90_cents
        |FROM w GROUP BY g ORDER BY l_linenumber""".stripMargin) { (s, d) =>
      val h = Tables.lineitem(s, d)
        .groupBy(col("l_linenumber").as("g"),
          (col("l_extendedprice").cast(DecimalType(12, 2)) * 100)
            .cast(LongType).as("v"))
        .agg(count(lit(1)).as("c"))
      val w = h.select(col("g"), col("v"), col("c"),
        sum("c").over(Window.partitionBy("g").orderBy("v")
          .rowsBetween(Window.unboundedPreceding, 0)).as("cum"),
        sum("c").over(Window.partitionBy("g")).as("n"))
      def pos(q: Int) =
        s"($q * n + 99 - ($q * n + 99) % 100) / 100"
      def at(q: Int, name: String) =
        expr(s"CAST(MAX(CASE WHEN cum - c < ${pos(q)} AND ${pos(q)} <= cum" +
          s" THEN v END) AS BIGINT) AS $name")
      w.groupBy("g")
        .agg(max("n").cast(LongType).as("n"), at(25, "p25_cents"),
          at(50, "p50_cents"), at(75, "p75_cents"), at(90, "p90_cents"))
        .select(col("g").as("l_linenumber"), col("n"), col("p25_cents"),
          col("p50_cents"), col("p75_cents"), col("p90_cents"))
        .orderBy("l_linenumber")
    },

    // 10%-trimmed mean of line price per linenumber — the outlier-robust
    // location estimate (between the mean and the median), computed
    // EXACTLY on the value histogram: each cell contributes
    // min(cum, k_hi) − max(cum − c, k_lo) clipped at 0 rows to the
    // trimmed sum (pure integer clipping — no row ever re-sorts), with
    // k_lo = ⌊n/10⌋ via the exactly-divisible-`/` trunc trick. The mean
    // is the single IEEE divide of exact cents over the trimmed count.
    //
    // Scale shape: identical to q_agg_quartiles — ONE histogram
    // exchange, cumulative window on the support, |groups|-bounded
    // rollup. The naive form (rank window over raw rows + filter)
    // shuffles and sorts the fact; this never does.
    Q("q_agg_trimmed",
      """WITH h AS (
        |  SELECT l_linenumber AS g,
        |    CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT)
        |      AS v,
        |    COUNT(*) AS c
        |  FROM lineitem GROUP BY 1, 2),
        |w AS (
        |  SELECT g, v, c,
        |    SUM(c) OVER (PARTITION BY g ORDER BY v) AS cum,
        |    SUM(c) OVER (PARTITION BY g) AS n
        |  FROM h),
        |k AS (
        |  SELECT g, v, c, cum, n,
        |    CAST((10 * n - (10 * n) % 100) / 100 AS BIGINT) AS k_lo
        |  FROM w)
        |SELECT g AS l_linenumber, CAST(MAX(n) AS BIGINT) AS n,
        |  CAST(MAX(n) - 2 * MAX(k_lo) AS BIGINT) AS n_trimmed,
        |  CAST(SUM(v * GREATEST(CAST(0 AS BIGINT),
        |    LEAST(cum, n - k_lo) - GREATEST(cum - c, k_lo))) AS BIGINT)
        |    AS trimmed_cents,
        |  CAST(SUM(v * GREATEST(CAST(0 AS BIGINT),
        |    LEAST(cum, n - k_lo) - GREATEST(cum - c, k_lo))) AS DOUBLE)
        |    / CAST(MAX(n) - 2 * MAX(k_lo) AS DOUBLE) AS trimmed_mean_cents
        |FROM k GROUP BY g ORDER BY l_linenumber""".stripMargin) { (s, d) =>
      val h = Tables.lineitem(s, d)
        .groupBy(col("l_linenumber").as("g"),
          (col("l_extendedprice").cast(DecimalType(12, 2)) * 100)
            .cast(LongType).as("v"))
        .agg(count(lit(1)).as("c"))
      val w = h.select(col("g"), col("v"), col("c"),
        sum("c").over(Window.partitionBy("g").orderBy("v")
          .rowsBetween(Window.unboundedPreceding, 0)).as("cum"),
        sum("c").over(Window.partitionBy("g")).as("n"))
      w.selectExpr("g", "v", "c", "cum", "n",
          "CAST((10 * n - (10 * n) % 100) / 100 AS BIGINT) AS k_lo")
        .groupBy("g")
        .agg(
          expr("CAST(MAX(n) AS BIGINT) AS n"),
          expr("CAST(MAX(n) - 2 * MAX(k_lo) AS BIGINT) AS n_trimmed"),
          expr("CAST(SUM(v * GREATEST(CAST(0 AS BIGINT)," +
            " LEAST(cum, n - k_lo) - GREATEST(cum - c, k_lo)))" +
            " AS BIGINT) AS trimmed_cents"),
          expr("CAST(SUM(v * GREATEST(CAST(0 AS BIGINT)," +
            " LEAST(cum, n - k_lo) - GREATEST(cum - c, k_lo)))" +
            " AS DOUBLE) / CAST(MAX(n) - 2 * MAX(k_lo) AS DOUBLE)" +
            " AS trimmed_mean_cents"))
        .select(col("g").as("l_linenumber"), col("n"), col("n_trimmed"),
          col("trimmed_cents"), col("trimmed_mean_cents"))
        .orderBy("l_linenumber")
    }
  )
}
