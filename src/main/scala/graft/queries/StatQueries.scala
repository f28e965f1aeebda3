package graft.queries

import graft.core.{Dsl, Q, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, LongType}

/** Robust-statistics and data-management shapes that operate on exact
  * sorted positions and key-partitioned diffs — the cleanup passes an
  * analytics corpus runs before anything downstream trusts the numbers.
  */
object StatQueries {

  val all: Seq[Q] = Seq(
    // Winsorization (percentile clipping): per supplier, clip
    // l_extendedprice into [p05, p95] and report raw vs clipped exact
    // sums plus the clip count — the standard outlier-taming pass before
    // any mean-based statistic. Percentiles are POSITIONAL (disc):
    // threshold = value at sorted position ceil(q·n), computed with pure
    // integer arithmetic ((q·n+99) div 100) so both engines pick the
    // identical element — no interpolation, no FP position math. The
    // value at a sorted position is well-defined under ties regardless
    // of tie order, so row_number nondeterminism cannot leak out.
    //
    // Scale shape: ONE data shuffle. The window pass (partitioned by
    // l_suppkey — high-cardinality, each group task-sized at any sf)
    // computes rn AND the two thresholds as unordered window aggregates
    // over the SAME partitioning — no threshold join, no second scan of
    // the fact (the naive ranked⨝thresholds form re-scans and re-sorts
    // lineitem for the threshold branch; PlanSpec pins this one out).
    // The final groupBy reuses the window's hash layout. An all-rows
    // global winsorize would instead route through HistogramRank
    // (q_agg_percentile's path) — per-key grouping is the common
    // production form.
    Q("q_stat_winsorize",
      """WITH ranked AS (
        |  SELECT l_suppkey, l_extendedprice,
        |    ROW_NUMBER() OVER (PARTITION BY l_suppkey ORDER BY l_extendedprice) AS rn,
        |    COUNT(*) OVER (PARTITION BY l_suppkey) AS n
        |  FROM lineitem),
        |w AS (
        |  SELECT l_suppkey, l_extendedprice, n,
        |    MAX(CASE WHEN rn = (5*n+99)//100 THEN l_extendedprice END)
        |      OVER (PARTITION BY l_suppkey) AS lo,
        |    MAX(CASE WHEN rn = (95*n+99)//100 THEN l_extendedprice END)
        |      OVER (PARTITION BY l_suppkey) AS hi
        |  FROM ranked)
        |SELECT l_suppkey, MAX(n) AS n,
        |  COUNT(CASE WHEN l_extendedprice < lo OR l_extendedprice > hi
        |             THEN 1 END) AS n_clipped,
        |  MIN(lo) AS lo, MIN(hi) AS hi,
        |  %SUMRAW% AS sum_raw,
        |  %SUMWINS% AS sum_wins
        |FROM w GROUP BY l_suppkey ORDER BY l_suppkey""".stripMargin
        .replace("%SUMRAW%", Dsl.d2dSql(Dsl.dsumSql("l_extendedprice")))
        .replace("%SUMWINS%", Dsl.d2dSql(
          Dsl.dsumSql("LEAST(GREATEST(l_extendedprice, lo), hi)")))) {
      (s, d) =>
        val li = Tables.lineitem(s, d).select("l_suppkey", "l_extendedprice")
        val byKey = Window.partitionBy("l_suppkey")
        val ranked = li
          .withColumn("rn", row_number().over(byKey.orderBy("l_extendedprice")))
          .withColumn("n", count(lit(1)).over(byKey))
        val atPos = (q: Int) =>
          max(when(col("rn") === expr(s"($q*n+99) div 100"),
            col("l_extendedprice"))).over(byKey)
        val w = ranked
          .withColumn("lo", atPos(5))
          .withColumn("hi", atPos(95))
        val wins = least(greatest(col("l_extendedprice"), col("lo")), col("hi"))
        w.groupBy("l_suppkey")
          .agg(
            max(col("n")).as("n"),
            count(when(col("l_extendedprice") < col("lo") ||
              col("l_extendedprice") > col("hi"), 1)).as("n_clipped"),
            min(col("lo")).as("lo"), min(col("hi")).as("hi"),
            Dsl.d2d(Dsl.dsum(col("l_extendedprice"))).as("sum_raw"),
            Dsl.d2d(Dsl.dsum(wins)).as("sum_wins"))
          .orderBy("l_suppkey")
    },

    // Snapshot diff — the CDC/migration primitive: given two table
    // snapshots, classify every key as added / removed / changed /
    // unchanged and account for the value drift, in ONE key-partitioned
    // full-outer join (both sides hash-shuffled on the key — the only
    // shape that survives two 100 TB snapshots; no broadcast, no sort of
    // either snapshot). Snapshots derive deterministically from orders so
    // the oracle sees byte-identical inputs: snapshot A drops keys
    // divisible by 89, snapshot B drops keys divisible by 97 and bumps
    // the price of keys divisible by 11 by an exact key-dependent DECIMAL
    // amount (all arithmetic in DECIMAL(12,4) — no FP drift can enter the
    // changed/unchanged classification). key_sum fingerprints WHICH keys
    // landed in each class, not just how many.
    Q("q_snapshot_diff",
      """WITH a AS (
        |  SELECT o_orderkey AS k, CAST(o_totalprice AS DECIMAL(12,4)) AS p
        |  FROM orders WHERE o_orderkey % 89 <> 0),
        |b AS (
        |  SELECT o_orderkey AS k,
        |    CAST(o_totalprice AS DECIMAL(12,4)) +
        |      CASE WHEN o_orderkey % 11 = 0
        |           THEN CAST(o_orderkey % 5 + 1 AS DECIMAL(12,4))
        |           ELSE CAST(0 AS DECIMAL(12,4)) END AS p
        |  FROM orders WHERE o_orderkey % 97 <> 0),
        |d AS (
        |  SELECT COALESCE(a.k, b.k) AS k,
        |    CASE WHEN a.k IS NULL THEN 'added'
        |         WHEN b.k IS NULL THEN 'removed'
        |         WHEN a.p <> b.p THEN 'changed'
        |         ELSE 'unchanged' END AS status,
        |    CASE WHEN a.k IS NOT NULL AND b.k IS NOT NULL THEN b.p - a.p
        |         ELSE CAST(0 AS DECIMAL(12,4)) END AS delta
        |  FROM a FULL OUTER JOIN b ON a.k = b.k)
        |SELECT status, COUNT(*) AS n, CAST(SUM(k) AS BIGINT) AS key_sum,
        |  %DELTA% AS delta_sum
        |FROM d GROUP BY status ORDER BY status""".stripMargin
        .replace("%DELTA%", Dsl.d2dSql("SUM(delta)"))) { (s, d) =>
      val o = Tables.orders(s, d)
        .select(col("o_orderkey").as("k"),
          col("o_totalprice").cast(Dsl.DFac).as("p"))
      val a = o.filter(col("k") % 89 =!= 0)
      val b = o.filter(col("k") % 97 =!= 0)
        .withColumn("p", col("p") +
          when(col("k") % 11 === 0, (col("k") % 5 + 1).cast(Dsl.DFac))
            .otherwise(lit(0).cast(Dsl.DFac)))
        .withColumnRenamed("k", "bk").withColumnRenamed("p", "bp")
      a.join(b, col("k") === col("bk"), "full_outer")
        .select(
          coalesce(col("k"), col("bk")).as("dk"),
          when(col("k").isNull, "added")
            .when(col("bk").isNull, "removed")
            .when(col("p") =!= col("bp"), "changed")
            .otherwise("unchanged").as("status"),
          when(col("k").isNotNull && col("bk").isNotNull, col("bp") - col("p"))
            .otherwise(lit(0).cast(Dsl.DFac)).as("delta"))
        .groupBy("status")
        .agg(count(lit(1)).as("n"),
          sum(col("dk")).cast("long").as("key_sum"),
          Dsl.d2d(sum(col("delta"))).as("delta_sum"))
        .orderBy("status")
    },

    // Per-group OLS regression (slope + intercept of extendedprice on
    // quantity per linenumber) computed as EXACT RATIONAL arithmetic —
    // the FP-free cross-engine formulation: centi-scaled integer (x, y)
    // via lossless DECIMAL(12,2) casts (l_extendedprice*100 is NOT
    // FP-integral — 6.7k rows at sf0.01 fail a naive *100 — the decimal
    // cast is what makes scaling exact), one map-side-combinable
    // aggregate for (n, Σx, Σy, Σxy, Σx²), then slope = num/den and
    // intercept = (Σy·den − num·Σx)/(n·den) emitted as truncated
    // micro/centi integers. DuckDB runs the identical math in HUGEINT
    // (int128); Spark in capped DECIMAL(38,0) — exact for groups up to
    // n ≈ 10¹⁰ rows (see the bound budget at the agg below), loud
    // overflow beyond, and `div`/`//` both truncate toward zero (the
    // CASE keeps the dividend positive so even a floor-division engine
    // would agree). ONE shuffle: the 7-group aggregate; everything after
    // is on 7 rows.
    Q("q_stat_regression",
      """WITH c AS (
        |  SELECT l_linenumber,
        |    CAST(CAST(l_quantity AS DECIMAL(12,2)) * 100 AS BIGINT) AS x,
        |    CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS y
        |  FROM lineitem),
        |a AS (
        |  SELECT l_linenumber, COUNT(*) AS n,
        |    CAST(SUM(x) AS HUGEINT) AS sx, CAST(SUM(y) AS HUGEINT) AS sy,
        |    CAST(SUM(x*y) AS HUGEINT) AS sxy, CAST(SUM(x*x) AS HUGEINT) AS sxx
        |  FROM c GROUP BY l_linenumber),
        |f AS (
        |  SELECT l_linenumber, n,
        |    CAST(n AS HUGEINT)*sxy - sx*sy AS num,
        |    CAST(n AS HUGEINT)*sxx - sx*sx AS den,
        |    sy*sxx - sx*sxy AS inum
        |  FROM a)
        |SELECT l_linenumber, CAST(n AS BIGINT) AS n,
        |  CAST(CASE WHEN num < 0 THEN -((-num * 1000000) // den)
        |            ELSE (num * 1000000) // den END AS BIGINT) AS slope_e6,
        |  CAST(CASE WHEN inum < 0
        |            THEN -((-inum * 100) // den)
        |            ELSE (inum * 100) // den
        |       END AS BIGINT) AS intercept_e2
        |FROM f ORDER BY l_linenumber""".stripMargin) { (s, d) =>
      val c = Tables.lineitem(s, d).selectExpr(
        "l_linenumber",
        "CAST(CAST(l_quantity AS DECIMAL(12,2)) * 100 AS BIGINT) AS x",
        "CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS y")
      // Sums aggregate in DECIMAL, not long (round-11 advice: a long
      // SUM(x*y) silently caps groups at ~1.7×10⁸ rows). With x ≤ 5×10³,
      // y ≤ 1.1×10⁷ and n ≤ 10¹⁰ rows/group, every true value below is
      // < 10³⁸: sx ≤ 5e13, sy ≤ 1.1e17, sxy ≤ 5.5e20, sxx ≤ 2.5e17,
      // num ≤ 1.1e31·10⁶ = 1.1e37, inum·100 ≤ 5.5e36. Past n = 10¹⁰
      // both engines fail loudly (ANSI overflow / HUGEINT range).
      val a = c.groupBy("l_linenumber").agg(
        count(lit(1)).as("n"),
        sum(col("x").cast("decimal(8,0)")).as("sx0"),
        sum(col("y").cast("decimal(8,0)")).as("sy0"),
        sum((col("x") * col("y")).cast("decimal(11,0)")).as("sxy0"),
        sum((col("x") * col("x")).cast("decimal(8,0)")).as("sxx0"))
      // intercept via the n-cancelled identity sy·den − num·sx =
      // n·(sy·sxx − sx·sxy): same truncated value (a//b = na//nb), but
      // the worst intermediate drops from ~n³·2.5e14 to ~n²·2.75e14
      a.selectExpr(
        "l_linenumber", "n",
        "CAST(n AS DECIMAL(10,0)) * CAST(sxy0 AS DECIMAL(21,0))" +
          " - CAST(sx0 AS DECIMAL(14,0)) * CAST(sy0 AS DECIMAL(18,0)) AS num",
        "CAST(n AS DECIMAL(10,0)) * CAST(sxx0 AS DECIMAL(18,0))" +
          " - CAST(sx0 AS DECIMAL(14,0)) * CAST(sx0 AS DECIMAL(14,0)) AS den",
        "CAST(sy0 AS DECIMAL(18,0)) * CAST(sxx0 AS DECIMAL(18,0))" +
          " - CAST(sx0 AS DECIMAL(14,0)) * CAST(sxy0 AS DECIMAL(21,0)) AS inum")
        .selectExpr(
          "l_linenumber", "CAST(n AS BIGINT) AS n",
          """CAST(CASE WHEN num < 0 THEN -((-num * 1000000) div den)
            |          ELSE (num * 1000000) div den END AS BIGINT)
            |  AS slope_e6""".stripMargin,
          """CAST(CASE WHEN inum < 0
            |     THEN -((-inum * 100) div den)
            |     ELSE (inum * 100) div den
            |     END AS BIGINT) AS intercept_e2""".stripMargin)
        .orderBy("l_linenumber")
    },

    // Spearman rank correlation per group — monotonic-association
    // strength, robust to the price outliers Pearson chases. Ranks are
    // ROW_NUMBER over a TOTAL order (value, then the
    // (orderkey, partkey, suppkey) triple as tiebreak — per FIXTURES.md
    // the triple is unique within a linenumber group at sf0.01/sf0.1,
    // the gated scales; sf0.001 carries exactly one colliding 4-tuple,
    // which would only matter if that pair also tied on the ordered
    // value), so both engines assign the identical permutation and
    // ρ = 1 − 6Σd²/(n(n²−1)) is an exact rational — emitted as the
    // truncated ρ·10⁶ integer, HUGEINT in DuckDB / capped
    // DECIMAL(38,0) in Spark, no FP anywhere. Overflow budget (round-11
    // advice): Σd² is summed in DECIMAL(30,0), NOT long (a long sum
    // silently caps groups at ~2×10⁶ rows since Σd² ≤ n³), and every
    // downstream product's true value stays < 10³⁸ for groups up to
    // n ≈ 10¹⁰ rows (≈ 10 TB of lineitem per group); past that both
    // engines fail loudly (ANSI overflow / HUGEINT range), never
    // silently.
    // Shape: both rank windows ride ONE hash(l_linenumber) exchange
    // (same partition key, two sort orders), then the 7-group aggregate
    // reuses the layout — no join, no second fact scan.
    Q("q_stat_spearman",
      """WITH r AS (
        |  SELECT l_linenumber,
        |    ROW_NUMBER() OVER (PARTITION BY l_linenumber
        |      ORDER BY l_quantity, l_orderkey, l_partkey, l_suppkey) AS rx,
        |    ROW_NUMBER() OVER (PARTITION BY l_linenumber
        |      ORDER BY l_extendedprice, l_orderkey, l_partkey, l_suppkey) AS ry
        |  FROM lineitem),
        |a AS (
        |  SELECT l_linenumber, COUNT(*) AS n,
        |    CAST(SUM(CAST(rx - ry AS HUGEINT) * (rx - ry)) AS HUGEINT) AS sd2
        |  FROM r GROUP BY l_linenumber),
        |f AS (
        |  SELECT l_linenumber, n,
        |    (CAST(n AS HUGEINT) * (CAST(n AS HUGEINT) * CAST(n AS HUGEINT) - 1)
        |      - 6 * sd2) * 1000000 AS num,
        |    CAST(n AS HUGEINT) * (CAST(n AS HUGEINT) * CAST(n AS HUGEINT) - 1)
        |      AS den
        |  FROM a)
        |SELECT l_linenumber, CAST(n AS BIGINT) AS n,
        |  CAST(CASE WHEN num < 0 THEN -((-num) // den) ELSE num // den END
        |       AS BIGINT) AS rho_e6
        |FROM f ORDER BY l_linenumber""".stripMargin) { (s, d) =>
      val g = Window.partitionBy("l_linenumber")
      val rx = row_number().over(
        g.orderBy("l_quantity", "l_orderkey", "l_partkey", "l_suppkey"))
      val ry = row_number().over(
        g.orderBy("l_extendedprice", "l_orderkey", "l_partkey", "l_suppkey"))
      Tables.lineitem(s, d)
        .select(col("l_linenumber"),
          // row_number is 32-bit in Spark; the squared difference is not
          rx.cast("long").as("rx"), ry.cast("long").as("ry"))
        .groupBy("l_linenumber")
        .agg(count(lit(1)).as("n"),
          // (rx−ry)² fits long (ranks ≤ n ≤ 10¹⁰ ⇒ d² ≤ 10²⁰? no —
          // d ≤ n so d² needs decimal too at the extreme; cast the
          // DIFFERENCE first so the square is exact to n = 10¹⁰)
          sum(((col("rx") - col("ry")).cast("decimal(11,0)")
            * (col("rx") - col("ry")).cast("decimal(11,0)"))
            .cast("decimal(20,0)")).as("sd2"))
        .selectExpr(
          "l_linenumber", "n",
          """(CAST(n AS DECIMAL(11,0)) * (CAST(n AS DECIMAL(11,0))
            |   * CAST(n AS DECIMAL(11,0)) - 1)
            | - 6 * CAST(sd2 AS DECIMAL(30,0))) * 1000000 AS num""".stripMargin,
          """CAST(n AS DECIMAL(11,0)) * (CAST(n AS DECIMAL(11,0))
            |  * CAST(n AS DECIMAL(11,0)) - 1) AS den""".stripMargin)
        .selectExpr(
          "l_linenumber", "CAST(n AS BIGINT) AS n",
          """CAST(CASE WHEN num < 0 THEN -((-num) div den)
            |          ELSE num div den END AS BIGINT) AS rho_e6""".stripMargin)
        .orderBy("l_linenumber")
    },

    // CDC apply — the complement of q_snapshot_diff: materialize a base
    // snapshot plus an ordered changelog (upserts / deletes / inserts,
    // sequence-numbered) into the current view, latest-sequence-wins.
    // The Delta/Iceberg MERGE shape expressed relationally: union the
    // base (seq 0) with the log, ONE key-partitioned row_number window
    // picks each key's latest version, deletes drop out, and the
    // surviving view is fingerprinted per key-bucket (count, key_sum,
    // exact decimal price sum). The changelog derives deterministically
    // from orders (%7→update with exact key-dependent DECIMAL bump,
    // %13→delete, %17→insert under the disjoint NEGATIVE key space
    // -(k+1), collision-free at any scale) so both engines apply the
    // identical log. Scale: both exchanges are on the key /
    // its bucket — each 100 TB snapshot+log shuffled once, no broadcast,
    // no driver state; all money math in DECIMAL(14,4).
    Q("q_cdc_apply",
      """WITH base AS (
        |  SELECT o_orderkey AS k, 0 AS seq, 'U' AS op,
        |    CAST(o_totalprice AS DECIMAL(14,4)) AS p
        |  FROM orders),
        |upd AS (
        |  SELECT o_orderkey, 1, 'U',
        |    CAST(CAST(o_totalprice AS DECIMAL(12,4))
        |      + CAST(o_orderkey % 500 AS DECIMAL(12,4))
        |      + CAST(0.25 AS DECIMAL(12,4)) AS DECIMAL(14,4))
        |  FROM orders WHERE o_orderkey % 7 = 3),
        |del AS (
        |  SELECT o_orderkey, 2, 'D', CAST(0 AS DECIMAL(14,4))
        |  FROM orders WHERE o_orderkey % 13 = 4),
        |ins AS (
        |  SELECT -(o_orderkey + 1), 1, 'U',
        |    CAST(CAST(o_orderkey % 1000 AS DECIMAL(12,4))
        |      + CAST(1.5 AS DECIMAL(12,4)) AS DECIMAL(14,4))
        |  FROM orders WHERE o_orderkey % 17 = 5),
        |chg AS (
        |  SELECT * FROM base UNION ALL SELECT * FROM upd
        |  UNION ALL SELECT * FROM del UNION ALL SELECT * FROM ins),
        |latest AS (
        |  SELECT k, op, p,
        |    ROW_NUMBER() OVER (PARTITION BY k ORDER BY seq DESC) AS rn
        |  FROM chg)
        |SELECT CAST(k % 10 AS BIGINT) AS bucket, COUNT(*) AS n_rows,
        |  CAST(SUM(k) AS BIGINT) AS key_sum, %PSUM% AS price_sum
        |FROM latest WHERE rn = 1 AND op <> 'D'
        |GROUP BY k % 10 ORDER BY bucket""".stripMargin
        .replace("%PSUM%", Dsl.d2dSql(Dsl.dsumSql("p")))) { (s, d) =>
      val P = org.apache.spark.sql.types.DataTypes.createDecimalType(14, 4)
      val o = Tables.orders(s, d)
        .select(col("o_orderkey").as("k"),
          col("o_totalprice").cast(Dsl.DFac).as("tp"))
      val base = o.select(col("k"), lit(0).as("seq"), lit("U").as("op"),
        col("tp").cast(P).as("p"))
      val upd = o.filter(col("k") % 7 === 3)
        .select(col("k"), lit(1).as("seq"), lit("U").as("op"),
          (col("tp") + (col("k") % 500).cast(Dsl.DFac)
            + lit(0.25).cast(Dsl.DFac)).cast(P).as("p"))
      val del = o.filter(col("k") % 13 === 4)
        .select(col("k"), lit(2).as("seq"), lit("D").as("op"),
          lit(0).cast(P).as("p"))
      // inserts live in the NEGATIVE key space: -(k+1) is disjoint from
      // every real orderkey at ANY scale (round-11 advice: the old fixed
      // +10M shift collides once orderkeys exceed 10M, making the seq=1
      // latest-wins tie nondeterministic). Negative keys hash/bucket like
      // any other — no scale cost.
      val ins = o.filter(col("k") % 17 === 5)
        .select((-(col("k") + 1L)).as("k"), lit(1).as("seq"),
          lit("U").as("op"),
          ((col("k") % 1000).cast(Dsl.DFac)
            + lit(1.5).cast(Dsl.DFac)).cast(P).as("p"))
      val w = Window.partitionBy("k").orderBy(col("seq").desc)
      base.union(upd).union(del).union(ins)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1 && col("op") =!= "D")
        .groupBy((col("k") % 10).as("bucket"))
        .agg(count(lit(1)).as("n_rows"),
          sum(col("k")).cast("long").as("key_sum"),
          Dsl.d2d(Dsl.dsum(col("p"))).as("price_sum"))
        .orderBy("bucket")
    },

    // Mann–Whitney U (rank-sum) test statistic — the nonparametric
    // two-sample location test (are 'R'-flag quantities distributed
    // differently from 'A'-flag?), EXACT: ranks with tie-averaging are
    // computed on the value HISTOGRAM (the q_agg_mad trick — quantity is
    // ndv-bounded), so no rank window ever touches the fact: one
    // (status, value) count aggregate, a cumulative window over ndv rows,
    // and doubled-rank integer algebra (avg tie rank = cum + (c+1)/2, so
    // 2·R₁ = Σ cₐ·(2·cum + c + 1) stays integral — no fractions, no FP).
    // Summed in DECIMAL/HUGEINT (exact to ~10¹² rows/group; the BIGINT
    // output caps U at n ≈ 3×10⁹ per status — loud cast failure beyond).
    Q("q_stat_mannwhitney",
      """WITH s AS (
        |  SELECT l_linestatus AS st,
        |    CAST(CAST(l_quantity AS DECIMAL(12,2)) * 100 AS BIGINT) AS v,
        |    CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS isa
        |  FROM lineitem WHERE l_returnflag IN ('R', 'A')),
        |h AS (
        |  SELECT st, v, SUM(isa) AS ca, COUNT(*) AS c
        |  FROM s GROUP BY st, v),
        |r AS (
        |  SELECT st, ca, c,
        |    COALESCE(SUM(c) OVER (PARTITION BY st ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum
        |  FROM h),
        |agg AS (
        |  SELECT st,
        |    CAST(SUM(ca) AS BIGINT) AS n1,
        |    CAST(SUM(c - ca) AS BIGINT) AS n2,
        |    CAST(SUM(ca * (2 * cum + c + 1)) AS HUGEINT) AS r1x2
        |  FROM r GROUP BY st)
        |SELECT st AS l_linestatus, n1, n2,
        |  CAST(r1x2 - CAST(n1 AS HUGEINT) * (n1 + 1) AS BIGINT) AS u1_x2
        |FROM agg ORDER BY l_linestatus""".stripMargin) { (s, d) =>
      val src = Tables.lineitem(s, d)
        .filter(col("l_returnflag").isin("R", "A"))
        .select(col("l_linestatus").as("st"),
          (col("l_quantity").cast(DecimalType(12, 2)) * 100)
            .cast(LongType).as("v"),
          when(col("l_returnflag") === "R", 1L).otherwise(0L).as("isa"))
      val h = src.groupBy("st", "v")
        .agg(sum(col("isa")).as("ca"), count(lit(1)).as("c"))
      val w = Window.partitionBy("st").orderBy("v")
        .rowsBetween(Window.unboundedPreceding, -1)
      val r = h.withColumn("cum", coalesce(sum(col("c")).over(w), lit(0L)))
      // doubled-rank products summed in DECIMAL (a long sum silently
      // caps at ~2×10⁹ rows/status: each term ≤ 2n²)
      r.groupBy("st")
        .agg(sum(col("ca")).cast(LongType).as("n1"),
          sum(col("c") - col("ca")).cast(LongType).as("n2"),
          sum((col("ca") * (lit(2) * col("cum") + col("c") + 1))
            .cast("decimal(25,0)")).as("r1x2"))
        .select(col("st").as("l_linestatus"), col("n1"), col("n2"),
          (col("r1x2") - col("n1").cast("decimal(19,0)")
            * (col("n1") + 1).cast("decimal(19,0)"))
            .cast(LongType).as("u1_x2"))
        .orderBy("l_linestatus")
    },

    // SCD2 (slowly-changing-dimension type 2) build — the versioned-
    // dimension ETL op: a sequence-numbered changelog becomes validity
    // intervals [valid_from, valid_to) per key version via ONE
    // lead-over-key window; the open version (valid_to NULL) is current.
    // Changelog derives deterministically from orders (base seq 0,
    // %7-update seq 1, %11-rewrite seq 2); output is the bucket-rolled
    // fingerprint (version counts, current counts, closed-interval span,
    // exact current-price sum). Scale: one hash(k) exchange for the
    // window, then the ≤10-key rollup — the same shape at any corpus
    // size; no self-join, no driver state.
    Q("q_scd2_intervals",
      """WITH chg AS (
        |  SELECT o_orderkey AS k, 0 AS seq,
        |    CAST(o_totalprice AS DECIMAL(14,4)) AS p
        |  FROM orders
        |  UNION ALL
        |  SELECT o_orderkey, 1,
        |    CAST(CAST(o_totalprice AS DECIMAL(12,4))
        |      + CAST(o_orderkey % 500 AS DECIMAL(12,4)) AS DECIMAL(14,4))
        |  FROM orders WHERE o_orderkey % 7 = 3
        |  UNION ALL
        |  SELECT o_orderkey, 2,
        |    CAST(CAST(o_orderkey % 1000 AS DECIMAL(12,4)) AS DECIMAL(14,4))
        |  FROM orders WHERE o_orderkey % 11 = 5),
        |v AS (
        |  SELECT k, seq AS valid_from,
        |    LEAD(seq) OVER (PARTITION BY k ORDER BY seq) AS valid_to, p
        |  FROM chg)
        |SELECT CAST(k % 10 AS BIGINT) AS bucket,
        |  COUNT(*) AS n_versions,
        |  CAST(SUM(CASE WHEN valid_to IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_current,
        |  CAST(SUM(COALESCE(valid_to - valid_from, 0)) AS BIGINT)
        |    AS closed_span,
        |  %CUR% AS cur_price_sum
        |FROM v GROUP BY k % 10 ORDER BY bucket""".stripMargin
        .replace("%CUR%", Dsl.d2dSql(Dsl.dsumSql(
          "CASE WHEN valid_to IS NULL THEN p ELSE CAST(0 AS DECIMAL(14,4)) END")))) {
      (s, d) =>
        val P = org.apache.spark.sql.types.DataTypes.createDecimalType(14, 4)
        val o = Tables.orders(s, d)
          .select(col("o_orderkey").as("k"),
            col("o_totalprice").cast(Dsl.DFac).as("tp"))
        val base = o.select(col("k"), lit(0).as("seq"),
          col("tp").cast(P).as("p"))
        val upd = o.filter(col("k") % 7 === 3)
          .select(col("k"), lit(1).as("seq"),
            (col("tp") + (col("k") % 500).cast(Dsl.DFac)).cast(P).as("p"))
        val rew = o.filter(col("k") % 11 === 5)
          .select(col("k"), lit(2).as("seq"),
            (col("k") % 1000).cast(Dsl.DFac).cast(P).as("p"))
        val w = Window.partitionBy("k").orderBy("seq")
        base.union(upd).union(rew)
          .select(col("k"), col("seq").as("valid_from"),
            lead(col("seq"), 1).over(w).as("valid_to"), col("p"))
          .groupBy((col("k") % 10).as("bucket"))
          .agg(count(lit(1)).as("n_versions"),
            sum(when(col("valid_to").isNull, 1).otherwise(0)).cast("long")
              .as("n_current"),
            sum(coalesce(col("valid_to") - col("valid_from"), lit(0)))
              .cast("long").as("closed_span"),
            Dsl.d2d(Dsl.dsum(when(col("valid_to").isNull, col("p"))
              .otherwise(lit(0).cast(P)))).as("cur_price_sum"))
          .orderBy("bucket")
    },

    // NOT IN with a nullable subquery — SQL's most-misread three-valued-
    // logic trap, pinned cross-engine: against a null-FREE list NOT IN
    // is the anti-join; one NULL in the list and NOT IN can never be
    // TRUE (x <> NULL is UNKNOWN), so the poisoned count is exactly 0.
    // The engine implements the semantics distributedly: anti-join for
    // the clean branch, and a metadata-scale has-null probe gating the
    // poisoned branch (the probe aggregates to one row — no driver
    // collect of data). Both engines must agree on both branches.
    Q("q_subquery_notin_nulls",
      """SELECT
        |  (SELECT COUNT(*) FROM customer
        |   WHERE c_custkey NOT IN
        |     (SELECT o_custkey FROM orders WHERE o_orderkey % 5 = 0))
        |    AS n_clean,
        |  (SELECT COUNT(*) FROM customer
        |   WHERE c_custkey NOT IN
        |     (SELECT NULLIF(o_custkey, (SELECT MIN(o_custkey) FROM orders))
        |      FROM orders WHERE o_orderkey % 5 = 0))
        |    AS n_poisoned""".stripMargin) { (s, d) =>
      val cust = Tables.customer(s, d).select("c_custkey")
      val list = Tables.orders(s, d).filter(col("o_orderkey") % 5 === 0)
        .select(col("o_custkey"))
      val nClean = cust.join(list.distinct(),
        col("c_custkey") === col("o_custkey"), "left_anti")
        .agg(count(lit(1)).as("n_clean"))
      val minKey = Tables.orders(s, d)
        .agg(min(col("o_custkey")).as("mk"))
      val poisonedList = list.crossJoin(broadcast(minKey))
        .select(nullif(col("o_custkey"), col("mk")).as("pk"))
      // three-valued logic: any NULL in the list ⇒ NOT IN never TRUE
      val hasNull = poisonedList.agg(
        max(when(col("pk").isNull, 1).otherwise(0)).as("has_null"))
      val nPoisonedIfClean = cust.join(
          poisonedList.filter(col("pk").isNotNull).distinct(),
          col("c_custkey") === col("pk"), "left_anti")
        .agg(count(lit(1)).as("anti_n"))
      nClean.crossJoin(broadcast(hasNull))
        .crossJoin(broadcast(nPoisonedIfClean))
        .select(col("n_clean"),
          when(col("has_null") === 1, lit(0L)).otherwise(col("anti_n"))
            .as("n_poisoned"))
    },

    // Weighted sampling without replacement (Efraimidis–Spirakis A-ES):
    // quality-weighted subsampling — the pretrain "sample the corpus
    // proportional to doc quality" op. Each row gets priority
    // ln(u)/w with u a DETERMINISTIC md5-derived uniform (so the sample
    // is reproducible run to run and engine-checkable against the
    // in-JVM reference in SampleSpec); the k largest priorities are the
    // sample. Distributed shape: row-local priority + TakeOrdered top-k
    // — no shuffle of the corpus, no per-row RNG state. ln lives only in
    // this cap (banned from oracle SQL — libm divergence; SampleSpec is
    // same-JVM so equality is exact).
    Q.cap("cap_sample_weighted") { (s, d) =>
      val u = conv(substring(md5(col("doc_id").cast("string")), 1, 13), 16, 10)
        .cast("double") / lit(4503599627370496.0) // / 2^52 → uniform [0,1)
      Tables.documents(s, d)
        .select(col("doc_id"), col("lang"), col("n_chars"),
          (log(u) / col("n_chars")).as("priority"))
        .orderBy(desc("priority"), col("doc_id"))
        .limit(100)
    },

    // Two-sample Kolmogorov–Smirnov statistic with EXACT integer
    // arithmetic: per linestatus, compare the l_quantity distribution of
    // returned (R) vs accepted (A) lineitems. D = max|F1 − F2| over the
    // merged support is a rational with fixed denominator n1·n2, so we
    // emit the NUMERATOR max|n2·cum1(v) − n1·cum2(v)| as a BIGINT — no
    // division, no float, bit-identical across engines (the same design
    // as q_stat_mannwhitney's doubled rank sum). Values are quantized to
    // exact cents via DECIMAL(12,2), the proven FP-integrality route.
    //
    // Scale shape: one (st, v) count aggregate (map-side combinable; the
    // support is the quantized value domain, ≤5 001 cells per status at
    // any corpus size because l_quantity ∈ [1, 50]), then a window +
    // rollup over that METADATA-SIZED histogram — the fact table is
    // scanned once and never shuffled row-wise. LONG products hold to
    // ~3·10⁹ rows per side; beyond that the cum/n columns route through
    // DECIMAL(38,0) unchanged.
    Q("q_stat_ks",
      """WITH s AS (
        |  SELECT l_linestatus AS st,
        |    CAST(CAST(l_quantity AS DECIMAL(12,2)) * 100 AS BIGINT) AS v,
        |    CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS isa
        |  FROM lineitem WHERE l_returnflag IN ('R', 'A')),
        |h AS (
        |  SELECT st, v, SUM(isa) AS c1, COUNT(*) - SUM(isa) AS c2
        |  FROM s GROUP BY st, v),
        |c AS (
        |  SELECT st,
        |    SUM(c1) OVER (PARTITION BY st ORDER BY v) AS cum1,
        |    SUM(c2) OVER (PARTITION BY st ORDER BY v) AS cum2,
        |    SUM(c1) OVER (PARTITION BY st) AS n1,
        |    SUM(c2) OVER (PARTITION BY st) AS n2
        |  FROM h)
        |SELECT st AS l_linestatus,
        |  CAST(MAX(n1) AS BIGINT) AS n1,
        |  CAST(MAX(n2) AS BIGINT) AS n2,
        |  CAST(MAX(ABS(n2 * cum1 - n1 * cum2)) AS BIGINT) AS ks_num
        |FROM c GROUP BY st ORDER BY st""".stripMargin) { (s, d) =>
      val src = Tables.lineitem(s, d)
        .filter(col("l_returnflag").isin("R", "A"))
        .select(col("l_linestatus").as("st"),
          (col("l_quantity").cast(DecimalType(12, 2)) * 100)
            .cast(LongType).as("v"),
          when(col("l_returnflag") === "R", 1L).otherwise(0L).as("isa"))
      graft.operators.ExactStats.ksNumerator(src, "st", "v", "isa")
        .select(col("st").as("l_linestatus"),
          col("n1"), col("n2"), col("ks_num"))
        .orderBy("l_linestatus")
    },

    // Exact ROC-AUC of a score against a binary label — the model-eval
    // op every training pipeline runs, computed with NO floats: AUC is
    // U/(n⁺n⁻), i.e. the Mann–Whitney statistic rescaled, so we emit the
    // exact fraction (auc_num_x2, auc_den) with midrank tie handling
    // (doubled to stay integral). Here: does an event's value predict
    // that it is a purchase?
    //
    // Scale shape: the score is quantized to cents over a BOUNDED domain
    // (value ∈ [0.01, 490.02] ⇒ ≤49 002 distinct cells measured 17 792
    // at sf0.1), so after the map-side-combinable histogram the global
    // ORDER BY v window runs over metadata, not rows — the single-
    // partition window is deliberate and safe at any corpus size. Rank
    // products accumulate in DECIMAL(25,0) (a LONG silently caps near
    // 2·10⁹ events).
    Q("q_stat_auc",
      """WITH s AS (
        |  SELECT CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS v,
        |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pos
        |  FROM events),
        |h AS (
        |  SELECT v, SUM(pos) AS cp, COUNT(*) AS c FROM s GROUP BY v),
        |r AS (
        |  SELECT cp, c,
        |    COALESCE(SUM(c) OVER (ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum
        |  FROM h)
        |SELECT CAST(SUM(cp) AS BIGINT) AS n_pos,
        |  CAST(SUM(c - cp) AS BIGINT) AS n_neg,
        |  CAST(SUM(cp * (2 * cum + c + 1)) - SUM(cp) * (SUM(cp) + 1)
        |    AS BIGINT) AS auc_num_x2,
        |  CAST(2 * SUM(cp) * SUM(c - cp) AS BIGINT) AS auc_den
        |FROM r""".stripMargin) { (s, d) =>
      val src = Tables.events(s, d)
        .select((col("value").cast(DecimalType(12, 2)) * 100)
            .cast(LongType).as("v"),
          when(col("event_type") === "purchase", 1L).otherwise(0L).as("pos"))
      graft.operators.ExactStats.aucExact(src, "v", "pos")
    },

    // Benford leading-digit profile of order totals — the fraud/anomaly
    // screen auditors run on monetary columns. The digit is taken from
    // the EXACT cents integer via a string head (an arithmetic
    // floor(v/10^floor(log10 v)) would route through libm and can
    // misround at decade boundaries cross-engine; the string head
    // cannot). Counts only — the Benford expectation needs a log, so the
    // test statistic stays caller-side.
    //
    // Scale shape: row-local digit extraction folded into ONE map-side-
    // combinable ≤9-key count — nothing else moves. Oracle uses DuckDB's
    // CAST AS VARCHAR; the Spark twin says STRING (SparkDialect).
    Q("q_stat_benford",
      """WITH v AS (
        |  SELECT CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)
        |    AS cents
        |  FROM orders)
        |SELECT CAST(SUBSTRING(CAST(cents AS VARCHAR), 1, 1) AS BIGINT)
        |    AS digit,
        |  CAST(COUNT(*) AS BIGINT) AS n_orders
        |FROM v GROUP BY 1 ORDER BY digit""".stripMargin) { (s, d) =>
      Tables.orders(s, d)
        .select((col("o_totalprice").cast(DecimalType(14, 2)) * 100)
          .cast(LongType).as("cents"))
        .groupBy(substring(col("cents").cast("string"), 1, 1)
          .cast(LongType).as("digit"))
        .agg(count(lit(1)).as("n_orders"))
        .orderBy("digit")
    },

    // Wald–Wolfowitz runs test on the daily event-volume series: is the
    // sequence of above/below-median days random, or does volume trend?
    // Emitted as the exact integers (n_runs, n_above, n_below) — the z
    // approximation is one caller-side formula over them. The median is
    // POSITIONAL (lower median via rn·2 ≤ n+1 — no integer division
    // operator, which is dialect-divergent); median ties count as
    // "below", making the split deterministic under any tie order.
    //
    // Scale shape: after the map-side-combinable per-day count, every
    // window (rank, lag) runs over the calendar-bounded day spine — the
    // single-partition windows are over ≤31 rows here and can never
    // exceed the calendar at any corpus size.
    Q("q_stat_runs",
      """WITH d AS (
        |  SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
        |    COUNT(*) AS x
        |  FROM events GROUP BY 1),
        |r AS (
        |  SELECT x, ROW_NUMBER() OVER (ORDER BY x, day) AS rn,
        |    COUNT(*) OVER () AS n
        |  FROM d),
        |med AS (SELECT MAX(x) AS mv FROM r WHERE rn * 2 <= n + 1),
        |sg AS (
        |  SELECT day, CASE WHEN x > mv THEN 1 ELSE 0 END AS sgn
        |  FROM d CROSS JOIN med),
        |runs AS (
        |  SELECT sgn, LAG(sgn) OVER (ORDER BY day) AS prev FROM sg)
        |SELECT
        |  CAST(SUM(CASE WHEN prev IS NULL OR prev <> sgn THEN 1 ELSE 0
        |    END) AS BIGINT) AS n_runs,
        |  CAST(SUM(sgn) AS BIGINT) AS n_above,
        |  CAST(SUM(1 - sgn) AS BIGINT) AS n_below
        |FROM runs""".stripMargin) { (s, d) =>
      val days = Tables.events(s, d)
        .groupBy(date_trunc("day", col("ts")).cast("timestamp_ntz").as("day"))
        .agg(count(lit(1)).as("x"))
      // the median is an unordered global-window agg over the SAME
      // aggregated spine (no join — keeps the whole chain inside the
      // strict-lint aggregate-bounded exemption, and every global window
      // here runs on ≤31 rows)
      val sg = days
        .select(col("day"), col("x"),
          row_number().over(Window.orderBy("x", "day")).as("rn"),
          count(lit(1)).over(Window.partitionBy()).as("n"))
        .withColumn("mv",
          max(when(col("rn") * 2 <= col("n") + 1, col("x")))
            .over(Window.partitionBy()))
        .select(col("day"),
          when(col("x") > col("mv"), 1L).otherwise(0L).as("sgn"))
      val runs = sg.select(col("sgn"),
        lag(col("sgn"), 1).over(Window.orderBy("day")).as("prev"))
      runs.agg(
        sum(when(col("prev").isNull || col("prev") =!= col("sgn"), 1L)
          .otherwise(0L)).as("n_runs"),
        sum(col("sgn")).as("n_above"),
        sum(lit(1L) - col("sgn")).as("n_below"))
    },

    // Chi-square test of independence over the returnflag × linestatus
    // contingency table, EXACT: each cell's statistic term is the
    // integer-truncated scaled rational (n·o − r·c)²·10⁶ / (n·r·c) —
    // the q_stat_spearman design (HUGEINT // in DuckDB, tightly-capped
    // DECIMAL(38,0) div in Spark, both truncating toward zero; the
    // numerator is non-negative so no sign split is needed). The
    // truncated expected count r·c/n is emitted alongside the observed
    // so the margins are reconstructible.
    //
    // Scale shape: ONE map-side-combinable (flag, status) count — the
    // contingency frame is the categorical domain (6 cells at any sf);
    // margins are windows over those 6 rows (aggregate-bounded). The e6
    // scaling keeps dev²·10⁶ under 10³⁸ for n ≤ 10⁸ rows; past that
    // both engines overflow LOUDLY (ANSI / HUGEINT range) — drop the
    // scale factor or emit (o, r, c, n) raw to go further.
    Q("q_stat_chi2",
      """WITH ob AS (
        |  SELECT l_returnflag AS rf, l_linestatus AS ls, COUNT(*) AS o
        |  FROM lineitem GROUP BY rf, ls),
        |m AS (
        |  SELECT rf, ls, o,
        |    CAST(SUM(o) OVER (PARTITION BY rf) AS HUGEINT) AS r,
        |    CAST(SUM(o) OVER (PARTITION BY ls) AS HUGEINT) AS c,
        |    CAST(SUM(o) OVER () AS HUGEINT) AS n
        |  FROM ob),
        |t AS (
        |  SELECT rf, ls, o, r, c, n, n * o - r * c AS dev FROM m)
        |SELECT rf AS l_returnflag, ls AS l_linestatus,
        |  CAST(o AS BIGINT) AS n_obs,
        |  CAST((r * c) // n AS BIGINT) AS expected_trunc,
        |  CAST((dev * dev * 1000000) // (n * r * c) AS BIGINT)
        |    AS chi2_term_e6
        |FROM t ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, d) =>
      val ob = Tables.lineitem(s, d)
        .groupBy(col("l_returnflag").as("rf"), col("l_linestatus").as("ls"))
        .agg(count(lit(1)).as("o"))
      ob.select(col("rf"), col("ls"), col("o"),
          sum("o").over(Window.partitionBy("rf")).as("r"),
          sum("o").over(Window.partitionBy("ls")).as("c"),
          sum("o").over(Window.partitionBy()).as("n"))
        .selectExpr("rf", "ls", "o", "r", "c", "n",
          "CAST(n AS DECIMAL(38,0)) * o - CAST(r AS DECIMAL(38,0)) * c AS dev")
        .selectExpr(
          "rf AS l_returnflag", "ls AS l_linestatus",
          "CAST(o AS BIGINT) AS n_obs",
          "CAST((CAST(r AS DECIMAL(38,0)) * c) div n AS BIGINT)" +
            " AS expected_trunc",
          "CAST((dev * dev * 1000000) div (CAST(n AS DECIMAL(38,0)) * r * c)" +
            " AS BIGINT) AS chi2_term_e6")
        .orderBy("l_returnflag", "l_linestatus")
    },

    // Welch's unequal-variance t² per linenumber group (R vs A flag on
    // quantity) — the two-sample location test in its variance-robust
    // form. The sums and sums-of-squares are EXACT decimals emitted
    // through d2d; everything after is a FIXED double expression tree
    // (the Dsl ratio discipline: identical IEEE ops on bit-identical
    // operands are bit-identical in both engines). t² is emitted instead
    // of t so no sqrt enters the oracle.
    //
    // Scale shape: one conditional-sum aggregate over the fact (7
    // groups, map-side combinable) — no window, no join, nothing else
    // moves. The d2d pieces stay exact to |Σq²| < 2⁵³·10⁻⁴ ≈ 9·10¹¹,
    // i.e. ~3·10⁸ rows per group at quantity ≤ 50; beyond that route
    // the sums through wider split emission before trusting low bits.
    Q("q_stat_ttest",
      s"""WITH s AS (
        |  SELECT l_linenumber AS g,
        |    CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS isr,
        |    CAST(l_quantity AS DECIMAL(12,2)) AS q
        |  FROM lineitem WHERE l_returnflag IN ('R', 'A')),
        |a AS (
        |  SELECT g,
        |    CAST(SUM(isr) AS BIGINT) AS n1,
        |    CAST(COUNT(*) - SUM(isr) AS BIGINT) AS n2,
        |    ${Dsl.d2dSql("CAST(SUM(CASE WHEN isr = 1 THEN q END) AS DECIMAL(18,4))")} AS s1,
        |    ${Dsl.d2dSql("CAST(SUM(CASE WHEN isr = 0 THEN q END) AS DECIMAL(18,4))")} AS s2,
        |    ${Dsl.d2dSql("CAST(SUM(CASE WHEN isr = 1 THEN q * q END) AS DECIMAL(28,4))")} AS q1,
        |    ${Dsl.d2dSql("CAST(SUM(CASE WHEN isr = 0 THEN q * q END) AS DECIMAL(28,4))")} AS q2
        |  FROM s GROUP BY g),
        |v AS (
        |  SELECT g, n1, n2,
        |    s1 / CAST(n1 AS DOUBLE) - s2 / CAST(n2 AS DOUBLE) AS mean_diff,
        |    (q1 - s1 * s1 / CAST(n1 AS DOUBLE)) / CAST(n1 - 1 AS DOUBLE) AS v1,
        |    (q2 - s2 * s2 / CAST(n2 AS DOUBLE)) / CAST(n2 - 1 AS DOUBLE) AS v2
        |  FROM a)
        |SELECT g AS l_linenumber, n1, n2, mean_diff,
        |  mean_diff * mean_diff /
        |    (v1 / CAST(n1 AS DOUBLE) + v2 / CAST(n2 AS DOUBLE)) AS t2_welch
        |FROM v ORDER BY l_linenumber""".stripMargin) { (s, d) =>
      val src = Tables.lineitem(s, d)
        .filter(col("l_returnflag").isin("R", "A"))
        .select(col("l_linenumber").as("g"),
          when(col("l_returnflag") === "R", 1L).otherwise(0L).as("isr"),
          col("l_quantity").cast(DecimalType(12, 2)).as("q"))
      val a = src.groupBy("g")
        .agg(sum(col("isr")).cast("long").as("n1"),
          (count(lit(1)) - sum(col("isr"))).cast("long").as("n2"),
          Dsl.d2d(sum(when(col("isr") === 1, col("q"))).cast(Dsl.D18)).as("s1"),
          Dsl.d2d(sum(when(col("isr") === 0, col("q"))).cast(Dsl.D18)).as("s2"),
          Dsl.d2d(sum(when(col("isr") === 1, col("q") * col("q")))
            .cast(DecimalType(28, 4))).as("q1"),
          Dsl.d2d(sum(when(col("isr") === 0, col("q") * col("q")))
            .cast(DecimalType(28, 4))).as("q2"))
      a.selectExpr("g", "n1", "n2",
          "s1 / CAST(n1 AS DOUBLE) - s2 / CAST(n2 AS DOUBLE) AS mean_diff",
          "(q1 - s1 * s1 / CAST(n1 AS DOUBLE)) / CAST(n1 - 1 AS DOUBLE) AS v1",
          "(q2 - s2 * s2 / CAST(n2 AS DOUBLE)) / CAST(n2 - 1 AS DOUBLE) AS v2")
        .selectExpr("g AS l_linenumber", "n1", "n2", "mean_diff",
          "mean_diff * mean_diff /" +
            " (v1 / CAST(n1 AS DOUBLE) + v2 / CAST(n2 AS DOUBLE)) AS t2_welch")
        .orderBy("l_linenumber")
    },

    // Cohen's kappa between two deterministic document "raters" (the
    // char-length rule vs the whitespace token-count rule — the
    // inter-annotator-agreement check every labeling pipeline runs,
    // here over machine labelers). Exact: kappa = (p_o − p_e)/(1 − p_e)
    // reduces to the integer rational
    //   (n·(n11+n00) − (r1·c1 + r0·c0)) / (n² − (r1·c1 + r0·c0)),
    // emitted as (kappa_num, kappa_den) beside the full 2×2 table. The
    // token count is the REPLACE-based space count — dual-dialect, no
    // tokenizer needed.
    //
    // Scale shape: ONE global conditional-sum aggregate over documents —
    // row-local rating, map-side combine to a single row; no window, no
    // join. LONG products hold to n ≈ 3·10⁹ docs; loud overflow beyond.
    Q("q_stat_kappa",
      """WITH r AS (
        |  SELECT
        |    CASE WHEN n_chars >= 900 THEN 1 ELSE 0 END AS ra,
        |    CASE WHEN LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) + 1
        |      >= 150 THEN 1 ELSE 0 END AS rb
        |  FROM documents),
        |c AS (
        |  SELECT
        |    CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(ra * rb) AS BIGINT) AS n11,
        |    CAST(SUM((1 - ra) * (1 - rb)) AS BIGINT) AS n00,
        |    CAST(SUM(ra) AS BIGINT) AS r1,
        |    CAST(SUM(rb) AS BIGINT) AS c1
        |  FROM r)
        |SELECT n, n11, n00, r1, c1,
        |  CAST(n * (n11 + n00) - (r1 * c1 + (n - r1) * (n - c1)) AS BIGINT)
        |    AS kappa_num,
        |  CAST(n * n - (r1 * c1 + (n - r1) * (n - c1)) AS BIGINT)
        |    AS kappa_den
        |FROM c""".stripMargin) { (s, d) =>
      val r = Tables.documents(s, d)
        .select(
          when(col("n_chars") >= 900, 1L).otherwise(0L).as("ra"),
          when(length(col("text"))
            - length(regexp_replace(col("text"), " ", "")) + 1 >= 150, 1L)
            .otherwise(0L).as("rb"))
      r.agg(count(lit(1)).cast("long").as("n"),
          sum(col("ra") * col("rb")).cast("long").as("n11"),
          sum((lit(1) - col("ra")) * (lit(1) - col("rb")))
            .cast("long").as("n00"),
          sum(col("ra")).cast("long").as("r1"),
          sum(col("rb")).cast("long").as("c1"))
        .selectExpr("n", "n11", "n00", "r1", "c1",
          "CAST(n * (n11 + n00) - (r1 * c1 + (n - r1) * (n - c1)) AS BIGINT)" +
            " AS kappa_num",
          "CAST(n * n - (r1 * c1 + (n - r1) * (n - c1)) AS BIGINT)" +
            " AS kappa_den")
    },

    // Mood's median test: split every lineitem at the POOLED median of
    // quantity (positional selection over the value histogram — the
    // q_stat_runs idiom, no dialect-divergent division) and count each
    // linenumber group's above/at-or-below split. The per-group
    // association term n·a_g − A·n_g is emitted exactly (its chi²
    // normalization is caller-side, like q_time_autocorr's pieces).
    //
    // Scale shape: ONE (group, value) count exchange — the frame is
    // groups × quantized support (7 × ≤5 001 cells at any sf); the
    // pooled-median selection and the A/n margins are windows over that
    // support; the 1-row median broadcasts back. The fact is scanned
    // once. LONG dev products hold to ~3·10⁹ rows; loud beyond.
    Q("q_stat_mediantest",
      """WITH s AS (
        |  SELECT l_linenumber AS g,
        |    CAST(CAST(l_quantity AS DECIMAL(12,2)) * 100 AS BIGINT) AS v,
        |    COUNT(*) AS c
        |  FROM lineitem GROUP BY g, v),
        |h AS (SELECT v, SUM(c) AS c FROM s GROUP BY v),
        |z AS (
        |  SELECT v,
        |    SUM(c) OVER (ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |    SUM(c) OVER () AS n
        |  FROM h),
        |m AS (SELECT MIN(v) AS med FROM z WHERE cum * 2 >= n + 1),
        |t AS (
        |  SELECT g,
        |    SUM(CASE WHEN v > med THEN c ELSE 0 END) AS a,
        |    SUM(CASE WHEN v <= med THEN c ELSE 0 END) AS le
        |  FROM s CROSS JOIN m GROUP BY g),
        |w AS (
        |  SELECT g, a, le,
        |    SUM(a) OVER () AS ba, SUM(a + le) OVER () AS n
        |  FROM t)
        |SELECT g AS l_linenumber,
        |  CAST(a AS BIGINT) AS n_above,
        |  CAST(le AS BIGINT) AS n_le_median,
        |  CAST(n * a - ba * (a + le) AS BIGINT) AS dev_num,
        |  CAST(ba AS BIGINT) AS total_above,
        |  CAST(n AS BIGINT) AS total_n
        |FROM w ORDER BY l_linenumber""".stripMargin) { (s, d) =>
      val sFrame = Tables.lineitem(s, d)
        .groupBy(col("l_linenumber").as("g"),
          (col("l_quantity").cast(DecimalType(12, 2)) * 100)
            .cast(LongType).as("v"))
        .agg(count(lit(1)).as("c"))
      val h = sFrame.groupBy("v").agg(sum(col("c")).as("c"))
      val z = h.select(col("v"),
        sum(col("c")).over(Window.orderBy("v")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .as("cum"),
        sum(col("c")).over(Window.partitionBy()).as("n"))
      val m = z.filter(col("cum") * 2 >= col("n") + 1)
        .agg(min(col("v")).as("med"))
      val t = sFrame.crossJoin(broadcast(m))
        .groupBy("g")
        .agg(sum(when(col("v") > col("med"), col("c")).otherwise(0L)).as("a"),
          sum(when(col("v") <= col("med"), col("c")).otherwise(0L)).as("le"))
      t.select(col("g"), col("a"), col("le"),
          sum(col("a")).over(Window.partitionBy()).as("ba"),
          sum(col("a") + col("le")).over(Window.partitionBy()).as("n"))
        .selectExpr("g AS l_linenumber",
          "CAST(a AS BIGINT) AS n_above",
          "CAST(le AS BIGINT) AS n_le_median",
          "CAST(n * a - ba * (a + le) AS BIGINT) AS dev_num",
          "CAST(ba AS BIGINT) AS total_above",
          "CAST(n AS BIGINT) AS total_n")
        .orderBy("l_linenumber")
    },

    // Two-proportion A/B test on the event stream: variant = user_id
    // parity (the deterministic assignment), success = "did the user
    // ever purchase". z² is the exact integer rational
    // d²N/(n1·n2·X·(N−X)) (see ExactStats.twoProportion) — the
    // experiment readout with no FP accumulation anywhere; the one
    // divide runs on exactly-converted BIGINTs.
    //
    // Scale shape: one per-user aggregate (map-side combinable on the
    // user-hash exchange) feeding a one-row conditional-sum — nothing
    // else moves. BIGINT pieces overflow loudly past ~10⁶ conversions
    // per arm (documented in the operator).
    Q("q_stat_proportion",
      """WITH u AS (
        |  SELECT user_id,
        |    MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
        |  FROM events GROUP BY user_id),
        |v AS (SELECT user_id % 2 AS variant, conv FROM u),
        |c AS (
        |  SELECT CAST(SUM(variant) AS BIGINT) AS n1,
        |    CAST(SUM(variant * conv) AS BIGINT) AS x1,
        |    CAST(COUNT(*) - SUM(variant) AS BIGINT) AS n2,
        |    CAST(SUM(conv) - SUM(variant * conv) AS BIGINT) AS x2
        |  FROM v),
        |z AS (
        |  SELECT n1, x1, n2, x2,
        |    CAST(x1 AS DECIMAL(38,0)) * n2 - CAST(x2 AS DECIMAL(38,0)) * n1
        |      AS d
        |  FROM c),
        |p AS (
        |  SELECT n1, x1, n2, x2,
        |    CAST(d * d * (n1 + n2) AS BIGINT) AS z2_num,
        |    CAST(CAST(n1 AS DECIMAL(38,0)) * n2 * (x1 + x2)
        |      * (n1 + n2 - x1 - x2) AS BIGINT) AS z2_den
        |  FROM z)
        |SELECT n1, x1, n2, x2, z2_num, z2_den,
        |  CASE WHEN z2_den = 0 THEN NULL
        |    ELSE CAST(z2_num AS DOUBLE) / CAST(z2_den AS DOUBLE) END AS z2
        |FROM p""".stripMargin) { (s, d) =>
      val u = Tables.events(s, d)
        .groupBy(col("user_id"))
        .agg(max(when(col("event_type") === "purchase", 1).otherwise(0))
          .as("conv"))
        .select((col("user_id") % 2).as("variant"), col("conv"))
      graft.operators.ExactStats.twoProportion(u, "variant", "conv")
    },

    // Theil–Sen robust slope of monthly revenue (cents per month index):
    // the median of all C(months,2) pairwise slopes — the trend estimate
    // outliers can't drag. Median selection is positional over the
    // (slope, dy, dx) histogram, so the chosen pair is deterministic
    // cross-engine even where distinct rationals collide as doubles.
    //
    // Scale shape: one orders-sized month aggregate (checkpointed — the
    // pair self-join consumes it twice, never rescanning the fact), then
    // C(80,2) ≈ 3.2k pairs — CALENDAR-bounded, the same count at 100 TB;
    // the position window rides the pair histogram (strict-lint exempt).
    Q("q_stat_theilsen",
      """WITH m AS (
        |  SELECT CAST(EXTRACT(YEAR FROM o_orderdate) * 12
        |      + EXTRACT(MONTH FROM o_orderdate) AS BIGINT) AS x,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2)) * 100) AS BIGINT)
        |      AS y
        |  FROM orders GROUP BY 1),
        |p AS (
        |  SELECT b.y - a.y AS dy, b.x - a.x AS dx,
        |    CAST(b.y - a.y AS DOUBLE) / CAST(b.x - a.x AS DOUBLE) AS slope
        |  FROM m a JOIN m b ON a.x < b.x),
        |h AS (SELECT slope, dy, dx, COUNT(*) AS c FROM p GROUP BY 1, 2, 3),
        |w AS (
        |  SELECT slope, dy, dx, c,
        |    SUM(c) OVER (ORDER BY slope, dy, dx
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |    SUM(c) OVER () AS n
        |  FROM h)
        |SELECT CAST(n AS BIGINT) AS n_pairs,
        |  CAST(dy AS BIGINT) AS slope_num,
        |  CAST(dx AS BIGINT) AS slope_den, slope
        |FROM w
        |WHERE cum - c < (n + 1 - (n + 1) % 2) / 2
        |  AND (n + 1 - (n + 1) % 2) / 2 <= cum""".stripMargin) { (s, d) =>
      val m = Tables.orders(s, d)
        .groupBy((year(col("o_orderdate")) * 12 + month(col("o_orderdate")))
          .cast(LongType).as("x"))
        .agg(sum(col("o_totalprice").cast(DecimalType(12, 2)) * 100)
          .cast(LongType).as("y"))
        .localCheckpoint()
      graft.operators.ExactStats.theilSen(m, "x", "y")
    },

    // Kendall tau-b rank concordance per linestatus (does a bigger
    // quantity come with a bigger discount?) — the rank-correlation
    // robust to non-linear monotone relations, EXACT via the joint
    // value histogram: concordant/discordant pair counts are products
    // of cell counts, emitted beside the DOUBLED tie-corrected
    // denominators so tau_b = 2·tau_num/√(den_x_x2·den_y_x2) stays a
    // caller-side rational (no sqrt, no division in the oracle — the
    // q_stat_ks discipline applied to pairs).
    //
    // Scale shape: the O(n²) pair space never materializes — the ONE
    // row-scale exchange is the (st, qty, disc) histogram (≤ 50·11
    // cells per status at ANY corpus size); the strict-x self-join,
    // both marginal rollups and the final assembly all ride that
    // support² frame (operators/ExactStats.kendallTau). BIGINT output
    // holds to ~4·10⁹ rows per group (C ≤ n²/2); loud ANSI overflow
    // beyond. Dual-dialect ANSI: DuckDB sums in HUGEINT, Spark in
    // DECIMAL(38,0) — both exact, no twin needed.
    Q("q_stat_kendall",
      """WITH s AS (
        |  SELECT l_linestatus AS st,
        |    CAST(CAST(l_quantity AS DECIMAL(12,2)) AS BIGINT) AS x,
        |    CAST(CAST(l_discount AS DECIMAL(12,2)) * 100 AS BIGINT) AS y
        |  FROM lineitem),
        |h AS (SELECT st, x, y, COUNT(*) AS c FROM s GROUP BY st, x, y),
        |cd AS (
        |  SELECT a.st AS st,
        |    SUM(CASE WHEN a.y < b.y
        |      THEN CAST(a.c * b.c AS DECIMAL(38,0)) END) AS conc,
        |    SUM(CASE WHEN a.y > b.y
        |      THEN CAST(a.c * b.c AS DECIMAL(38,0)) END) AS disc
        |  FROM h a JOIN h b ON a.st = b.st AND a.x < b.x
        |  GROUP BY a.st),
        |mx AS (
        |  SELECT st, SUM(t) AS n,
        |    SUM(CAST(t * (t - 1) AS DECIMAL(38,0))) AS tx2
        |  FROM (SELECT st, x, SUM(c) AS t FROM h GROUP BY st, x) tt
        |  GROUP BY st),
        |my AS (
        |  SELECT st, SUM(CAST(t * (t - 1) AS DECIMAL(38,0))) AS ty2
        |  FROM (SELECT st, y, SUM(c) AS t FROM h GROUP BY st, y) tt
        |  GROUP BY st)
        |SELECT mx.st AS l_linestatus,
        |  CAST(mx.n AS BIGINT) AS n,
        |  CAST(COALESCE(cd.conc, CAST(0 AS DECIMAL(38,0))) AS BIGINT)
        |    AS n_conc,
        |  CAST(COALESCE(cd.disc, CAST(0 AS DECIMAL(38,0))) AS BIGINT)
        |    AS n_disc,
        |  CAST(COALESCE(cd.conc, CAST(0 AS DECIMAL(38,0)))
        |    - COALESCE(cd.disc, CAST(0 AS DECIMAL(38,0))) AS BIGINT)
        |    AS tau_num,
        |  CAST(CAST(mx.n * (mx.n - 1) AS DECIMAL(38,0)) - mx.tx2
        |    AS BIGINT) AS den_x_x2,
        |  CAST(CAST(mx.n * (mx.n - 1) AS DECIMAL(38,0)) - my.ty2
        |    AS BIGINT) AS den_y_x2
        |FROM mx JOIN my ON mx.st = my.st
        |  LEFT JOIN cd ON mx.st = cd.st
        |ORDER BY l_linestatus""".stripMargin) { (s, d) =>
      val src = Tables.lineitem(s, d)
        .select(col("l_linestatus").as("st"),
          col("l_quantity").cast(DecimalType(12, 2))
            .cast(LongType).as("x"),
          (col("l_discount").cast(DecimalType(12, 2)) * 100)
            .cast(LongType).as("y"))
      graft.operators.ExactStats.kendallTau(src, "st", "x", "y")
        .withColumnRenamed("st", "l_linestatus")
        .orderBy("l_linestatus")
    },

    // CUPED variance-reduced A/B readout (Deng et al. 2013): customers
    // split by key parity into two arms; the experiment metric y is
    // each customer's 1998+ revenue, the pre-period covariate x their
    // pre-1998 revenue, both exact cents. Per arm: raw mean and the
    // adjusted mean ȳ_a − θ·(x̄_a − x̄) with θ = Cov(x,y)/Var(x) pooled —
    // the industry-standard sensitivity boost for experiment metrics.
    // θ is exact-truncated to micros (DECIMAL(38,0) div — the spearman
    // design); the adjusted mean is a FIXED IEEE double tree on exact
    // < 2⁵³ operands, so both engines emit bit-identical doubles.
    //
    // Scale shape: the per-customer rollup is the ONE row-scale
    // exchange (map-side combinable conditional sums); the arm
    // aggregate and its pooled windows ride the 2-row arm frame
    // (operators/ExactStats.cuped). Oracle runs in DuckDB HUGEINT with
    // `//`; the Spark twin (SparkDialect) says DECIMAL(38,0) + div.
    Q("q_stat_cuped",
      """WITH m AS (
        |  SELECT o_custkey AS k,
        |    SUM(CASE WHEN o_orderdate < TIMESTAMP '1998-01-01'
        |      THEN CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)
        |      ELSE 0 END) AS x,
        |    SUM(CASE WHEN o_orderdate >= TIMESTAMP '1998-01-01'
        |      THEN CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)
        |      ELSE 0 END) AS y
        |  FROM orders GROUP BY o_custkey),
        |a AS (
        |  SELECT k % 2 AS arm, COUNT(*) AS n_a, SUM(x) AS sx_a,
        |    SUM(y) AS sy_a, SUM(x * x) AS sxx_a, SUM(x * y) AS sxy_a
        |  FROM m GROUP BY k % 2),
        |g AS (
        |  SELECT arm, n_a, sx_a, sy_a,
        |    SUM(n_a) OVER () AS n, SUM(sx_a) OVER () AS sx,
        |    SUM(sy_a) OVER () AS sy, SUM(sxx_a) OVER () AS sxx,
        |    SUM(sxy_a) OVER () AS sxy
        |  FROM a),
        |t AS (
        |  SELECT arm, n_a, sx_a, sy_a, n, sx,
        |    CASE WHEN n * sxx - sx * sx = 0 THEN NULL
        |      WHEN n * sxy - sx * sy < 0
        |      THEN CAST(-((-((n * sxy - sx * sy) * 1000000))
        |        // (n * sxx - sx * sx)) AS BIGINT)
        |      ELSE CAST(((n * sxy - sx * sy) * 1000000)
        |        // (n * sxx - sx * sx) AS BIGINT) END AS theta_micro
        |  FROM g)
        |SELECT arm, CAST(n_a AS BIGINT) AS n_units,
        |  CAST(sx_a AS BIGINT) AS x_cents, CAST(sy_a AS BIGINT) AS y_cents,
        |  theta_micro,
        |  CAST(sy_a AS DOUBLE) / CAST(n_a AS DOUBLE) AS y_mean,
        |  CAST(sy_a AS DOUBLE) / CAST(n_a AS DOUBLE)
        |    - CAST(theta_micro AS DOUBLE) / CAST(1000000 AS DOUBLE)
        |      * (CAST(sx_a AS DOUBLE) / CAST(n_a AS DOUBLE)
        |         - CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)) AS y_adj
        |FROM t ORDER BY arm""".stripMargin) { (s, d) =>
      val cut = lit("1998-01-01").cast("timestamp")
      val cents = (col("o_totalprice").cast(DecimalType(14, 2)) * 100)
        .cast(LongType)
      val m = Tables.orders(s, d)
        .groupBy(col("o_custkey").as("k"))
        .agg(sum(when(col("o_orderdate") < cut, cents).otherwise(0L))
            .cast(LongType).as("x"),
          sum(when(col("o_orderdate") >= cut, cents).otherwise(0L))
            .cast(LongType).as("y"))
        .select((col("k") % 2).as("arm"), col("x"), col("y"))
      graft.operators.ExactStats.cuped(m, "arm", "x", "y")
        .orderBy("arm")
    },

    // Decile gains/lift table — the model-evaluation report every
    // scoring pipeline runs: rank units by a score (here account
    // balance, richest first), cut into 10 equal deciles, and report
    // per-decile response rate, cumulative gain and lift against the
    // base rate (response = the customer has a finalized order). Rates
    // are single IEEE divides on exact < 2⁵³ integers (products
    // n_resp·N bound the claim to ~10⁸ units — loud past that);
    // the decile cut is NTILE(10) under the total order
    // (balance DESC, custkey).
    //
    // Scale shape: NO global sort — the global rank routes through
    // HistogramRank (the q_window_ntile path: value-histogram buckets +
    // within-bucket ranks), the response flag is a co-partitioned
    // custkey join, and the decile rollup is 10 cells; every window
    // after it rides those 10 rows. The oracle's NTILE window is the
    // DuckDB-side form of the same cut.
    Q("q_stat_gains",
      """WITH f AS (
        |  SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'F'),
        |r AS (
        |  SELECT c.c_custkey, c.c_acctbal,
        |    CASE WHEN f.o_custkey IS NOT NULL THEN 1 ELSE 0 END AS y
        |  FROM customer c LEFT JOIN f ON c.c_custkey = f.o_custkey),
        |d AS (
        |  SELECT y, NTILE(10) OVER (ORDER BY c_acctbal DESC, c_custkey)
        |    AS decile
        |  FROM r),
        |g AS (
        |  SELECT decile, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(y) AS BIGINT) AS n_resp
        |  FROM d GROUP BY decile),
        |w AS (
        |  SELECT decile, n, n_resp,
        |    SUM(n_resp) OVER (ORDER BY decile) AS cum_resp,
        |    SUM(n) OVER () AS nn, SUM(n_resp) OVER () AS rr
        |  FROM g)
        |SELECT decile, n, n_resp,
        |  CAST(cum_resp AS BIGINT) AS cum_resp,
        |  CAST(n_resp AS DOUBLE) / CAST(n AS DOUBLE) AS resp_rate,
        |  CAST(cum_resp AS DOUBLE) / CAST(rr AS DOUBLE) AS cum_gain,
        |  CAST(n_resp * nn AS DOUBLE) / CAST(n * rr AS DOUBLE) AS lift
        |FROM w ORDER BY decile""".stripMargin) { (s, d) =>
      val f = Tables.orders(s, d)
        .filter(col("o_orderstatus") === "F")
        .select(col("o_custkey").as("fk")).distinct()
      val r = Tables.customer(s, d)
        .select(col("c_custkey"), col("c_acctbal"))
        .join(f, col("c_custkey") === col("fk"), "left")
        .select(col("c_custkey"),
          // ascending rank of the NEGATED balance = balance DESC; the
          // custkey tiebreak keeps the total order identical to the
          // oracle's NTILE ordering
          negate(col("c_acctbal")).as("negbal"),
          when(col("fk").isNotNull, 1L).otherwise(0L).as("y"))
      val ranked = graft.operators.HistogramRank.withGlobalRank(
        r, "negbal", Seq("c_custkey"), rankCol = "grk")
      val total = r.agg(count(lit(1)).as("n"))
      // ntile(10) boundary i = i·(n div 10) + min(i, n mod 10)
      def bnd(i: Int) =
        expr("n div 10") * i + least(lit(i.toLong), col("n") % 10)
      val g = ranked.crossJoin(broadcast(total))
        .select(col("y"),
          (lit(1L) + (1 to 9).map(i => (col("grk") > bnd(i)).cast("long"))
            .reduce(_ + _)).as("decile"))
        .groupBy("decile")
        .agg(count(lit(1)).cast(LongType).as("n"),
          sum("y").cast(LongType).as("n_resp"))
      val wCum = Window.orderBy("decile")
        .rowsBetween(Window.unboundedPreceding, 0)
      val wAll = Window.partitionBy()
      g.select(col("decile"), col("n"), col("n_resp"),
          sum("n_resp").over(wCum).cast(LongType).as("cum_resp"),
          sum("n").over(wAll).as("nn"), sum("n_resp").over(wAll).as("rr"))
        .selectExpr("decile", "n", "n_resp", "cum_resp",
          "CAST(n_resp AS DOUBLE) / CAST(n AS DOUBLE) AS resp_rate",
          "CAST(cum_resp AS DOUBLE) / CAST(rr AS DOUBLE) AS cum_gain",
          "CAST(n_resp * nn AS DOUBLE) / CAST(n * rr AS DOUBLE) AS lift")
        .orderBy("decile")
    },

    // Score-calibration table: bucket a score (event value, fixed $50
    // bands — fixed bands, not quantiles, so refreshes don't drift) and
    // report the observed positive rate per band against the band's
    // average score — the reliability-diagram data behind "is this
    // model's 0.8 really an 80%?". Rates and averages are single IEEE
    // divides on exact integers. The band index is trunc-division
    // written (c − c%5000)/5000 — the exactly-divisible `/` is
    // IEEE-exact in both engines (the q_privacy_kanon discipline).
    //
    // Scale shape: ONE map-side-combinable band aggregate (≤10 cells at
    // the fixture domain, value-domain-bounded anywhere); nothing else
    // moves.
    Q("q_stat_calibration",
      """WITH s AS (
        |  SELECT CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)
        |      AS cents,
        |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pos
        |  FROM events),
        |b AS (
        |  SELECT CAST((cents - cents % 5000) / 5000 AS BIGINT) AS band,
        |    CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(pos) AS BIGINT) AS n_pos,
        |    CAST(SUM(cents) AS BIGINT) AS sum_cents
        |  FROM s GROUP BY 1)
        |SELECT band, n, n_pos,
        |  CAST(sum_cents AS DOUBLE) / CAST(n AS DOUBLE) AS avg_cents,
        |  CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE) AS pos_rate
        |FROM b ORDER BY band""".stripMargin) { (s, d) =>
      val src = Tables.events(s, d)
        .select((col("value").cast(DecimalType(12, 2)) * 100)
            .cast(LongType).as("cents"),
          when(col("event_type") === "purchase", 1L).otherwise(0L)
            .as("pos"))
      graft.operators.ExactStats.calibration(src, "cents", "pos", 5000L)
        .withColumnRenamed("avg_score", "avg_cents")
        .orderBy("band")
    },

    // Decision-stump split evaluation: for every candidate threshold
    // over the $1000 balance bands, the Gini impurity gain of splitting
    // customers into (≤t, >t) against the has-finalized-order label —
    // the tree-learner inner loop (and the feature-usefulness screen)
    // as ONE aggregation + spine windows. Counts are exact; each
    // impurity is the fixed tree 2·pos·neg/n (single divide per side),
    // exact to ~10⁸ rows per side (2·pos·neg < 2⁵³ — loud FP
    // discrepancy never occurs below that because both engines run the
    // identical IEEE ops).
    //
    // Scale shape: the label join is co-partitioned on custkey, the
    // band histogram is the one domain-bounded aggregate (≤11 cells),
    // and the threshold sweep is cumulative windows over that spine —
    // no per-threshold rescan (the naive form scans once per candidate).
    Q("q_stat_split_gain",
      """WITH f AS (
        |  SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'F'),
        |r AS (
        |  SELECT CAST(CAST(c.c_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT)
        |      AS cents,
        |    CASE WHEN f.o_custkey IS NOT NULL THEN 1 ELSE 0 END AS y
        |  FROM customer c LEFT JOIN f ON c.c_custkey = f.o_custkey),
        |h AS (
        |  SELECT CAST((cents - cents % 100000) / 100000 AS BIGINT) AS band,
        |    CAST(COUNT(*) AS BIGINT) AS n_b,
        |    CAST(SUM(y) AS BIGINT) AS pos_b
        |  FROM r GROUP BY 1),
        |c AS (
        |  SELECT band,
        |    SUM(n_b) OVER (ORDER BY band) AS n_l,
        |    SUM(pos_b) OVER (ORDER BY band) AS pos_l,
        |    SUM(n_b) OVER () AS n, SUM(pos_b) OVER () AS pos
        |  FROM h)
        |SELECT band AS threshold_band,
        |  CAST(n_l AS BIGINT) AS n_left, CAST(pos_l AS BIGINT) AS pos_left,
        |  CAST(n - n_l AS BIGINT) AS n_right,
        |  CAST(pos - pos_l AS BIGINT) AS pos_right,
        |  CAST(2 * pos * (n - pos) AS DOUBLE) / CAST(n AS DOUBLE)
        |    - (CAST(2 * pos_l * (n_l - pos_l) AS DOUBLE)
        |        / CAST(n_l AS DOUBLE)
        |       + CAST(2 * (pos - pos_l) * ((n - n_l) - (pos - pos_l))
        |           AS DOUBLE) / CAST(n - n_l AS DOUBLE)) AS gini_gain_x_n
        |FROM c WHERE n_l < n ORDER BY threshold_band""".stripMargin) {
      (s, d) =>
      val f = Tables.orders(s, d)
        .filter(col("o_orderstatus") === "F")
        .select(col("o_custkey").as("fk")).distinct()
      val r = Tables.customer(s, d)
        .join(f, col("c_custkey") === col("fk"), "left")
        .select((col("c_acctbal").cast(DecimalType(12, 2)) * 100)
            .cast(LongType).as("cents"),
          when(col("fk").isNotNull, 1L).otherwise(0L).as("y"))
      val h = r
        .groupBy(((col("cents") - col("cents") % 100000) / 100000)
          .cast(LongType).as("band"))
        .agg(count(lit(1)).cast(LongType).as("n_b"),
          sum("y").cast(LongType).as("pos_b"))
      val wCum = Window.orderBy("band")
        .rowsBetween(Window.unboundedPreceding, 0)
      val wAll = Window.partitionBy()
      h.select(col("band"),
          sum("n_b").over(wCum).as("n_l"),
          sum("pos_b").over(wCum).as("pos_l"),
          sum("n_b").over(wAll).as("n"),
          sum("pos_b").over(wAll).as("pos"))
        .where(col("n_l") < col("n"))
        .selectExpr("band AS threshold_band",
          "CAST(n_l AS BIGINT) AS n_left",
          "CAST(pos_l AS BIGINT) AS pos_left",
          "CAST(n - n_l AS BIGINT) AS n_right",
          "CAST(pos - pos_l AS BIGINT) AS pos_right",
          "CAST(2 * pos * (n - pos) AS DOUBLE) / CAST(n AS DOUBLE)" +
            " - (CAST(2 * pos_l * (n_l - pos_l) AS DOUBLE)" +
            "     / CAST(n_l AS DOUBLE)" +
            "    + CAST(2 * (pos - pos_l) * ((n - n_l) - (pos - pos_l))" +
            "        AS DOUBLE) / CAST(n - n_l AS DOUBLE))" +
            " AS gini_gain_x_n")
        .orderBy("threshold_band")
    },

    // Friedman rank test pieces (nonparametric repeated measures): does
    // order priority have a consistent volume ORDERING across months?
    // Within each month block the five priorities are midranked by
    // order count (midranks DOUBLED to stay integral under ties:
    // mr_x2 = 2·minrank + ties − 1), and the per-priority rank sums are
    // emitted exactly — χ²_F and its tie correction are caller-side
    // arithmetic over these five integers (the Kendall emission
    // discipline). Zero months are materialized through a complete
    // month×priority grid so blocks stay balanced.
    //
    // Scale shape: the (month, priority) count is the one row-scale
    // exchange; the grid completion, rank windows and the 5-row rollup
    // all ride the calendar×domain-bounded frame (≤80·5 cells at any
    // corpus size).
    Q("q_stat_friedman",
      """WITH mo AS (
        |  SELECT CAST(EXTRACT(YEAR FROM o_orderdate) * 12
        |      + EXTRACT(MONTH FROM o_orderdate) AS BIGINT) AS m,
        |    o_orderpriority AS p, CAST(COUNT(*) AS BIGINT) AS cnt
        |  FROM orders GROUP BY 1, 2),
        |grid AS (
        |  SELECT mm.m, pp.p, COALESCE(mo.cnt, 0) AS cnt
        |  FROM (SELECT DISTINCT m FROM mo) mm
        |  CROSS JOIN (SELECT DISTINCT p FROM mo) pp
        |  LEFT JOIN mo ON mo.m = mm.m AND mo.p = pp.p),
        |r AS (
        |  SELECT p,
        |    2 * RANK() OVER (PARTITION BY m ORDER BY cnt)
        |      + COUNT(*) OVER (PARTITION BY m, cnt) - 1 AS mr_x2
        |  FROM grid)
        |SELECT p AS o_orderpriority,
        |  CAST(COUNT(*) AS BIGINT) AS b_months,
        |  CAST(SUM(mr_x2) AS BIGINT) AS rank_sum_x2
        |FROM r GROUP BY p ORDER BY o_orderpriority""".stripMargin) {
      (s, d) =>
      val mo = Tables.orders(s, d)
        .groupBy((year(col("o_orderdate")) * 12 + month(col("o_orderdate")))
            .cast(LongType).as("m"),
          col("o_orderpriority").as("p"))
        .agg(count(lit(1)).cast(LongType).as("cnt"))
        // grid completion + both join sides ride this frame — one scan
        .localCheckpoint()
      val grid = mo.select("m").distinct()
        .crossJoin(mo.select("p").distinct())
        .join(mo, Seq("m", "p"), "left")
        .select(col("m"), col("p"), coalesce(col("cnt"), lit(0L)).as("cnt"))
      val r = grid.select(col("p"),
        (lit(2) * rank().over(Window.partitionBy("m").orderBy("cnt"))
          + count(lit(1)).over(Window.partitionBy("m", "cnt")) - 1)
          .as("mr_x2"))
      r.groupBy("p")
        .agg(count(lit(1)).cast(LongType).as("b_months"),
          sum("mr_x2").cast(LongType).as("rank_sum_x2"))
        .select(col("p").as("o_orderpriority"), col("b_months"),
          col("rank_sum_x2"))
        .orderBy("o_orderpriority")
    },

    // Wilson score interval for per-arm conversion (the CI every
    // experiment dashboard draws beside q_stat_proportion's test): at
    // z = 2 (~95.4%), z² = 4 makes EVERY Wilson piece an exact integer
    // rational — center = (x + 2)/(n + 4) and
    // radius² = 4·(x·(n−x) + n)/(n·(n+4)²) — so the interval is
    // [center − √radius², center + √radius²] with the sqrt caller-side
    // (no sqrt in oracles) and the emitted doubles are single divides.
    // Exact while n·(n+4)² < 2⁶³ (~2·10⁶ users/arm as LONG pieces;
    // the divides stay bit-identical beyond because int64→double
    // conversion is correctly rounded in both engines).
    //
    // Scale shape: per-user conversion rollup (the one row-scale
    // exchange, map-side combinable) + a 2-row arm aggregate.
    Q("q_stat_wilson",
      """WITH u AS (
        |  SELECT user_id % 2 AS arm,
        |    MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |      AS conv
        |  FROM events GROUP BY user_id),
        |a AS (
        |  SELECT arm, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(conv) AS BIGINT) AS x
        |  FROM u GROUP BY arm)
        |SELECT arm, n, x,
        |  CAST(x + 2 AS BIGINT) AS center_num,
        |  CAST(n + 4 AS BIGINT) AS center_den,
        |  CAST(4 * (x * (n - x) + n) AS BIGINT) AS rad2_num,
        |  CAST(n * (n + 4) * (n + 4) AS BIGINT) AS rad2_den,
        |  CAST(x + 2 AS DOUBLE) / CAST(n + 4 AS DOUBLE) AS center,
        |  CAST(4 * (x * (n - x) + n) AS DOUBLE)
        |    / CAST(n * (n + 4) * (n + 4) AS DOUBLE) AS radius2
        |FROM a ORDER BY arm""".stripMargin) { (s, d) =>
      val u = Tables.events(s, d)
        .groupBy(col("user_id"))
        .agg(max(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("conv"))
        .select((col("user_id") % 2).as("arm"), col("conv"))
      u.groupBy("arm")
        .agg(count(lit(1)).cast(LongType).as("n"),
          sum("conv").cast(LongType).as("x"))
        .selectExpr("arm", "n", "x",
          "CAST(x + 2 AS BIGINT) AS center_num",
          "CAST(n + 4 AS BIGINT) AS center_den",
          "CAST(4 * (x * (n - x) + n) AS BIGINT) AS rad2_num",
          "CAST(n * (n + 4) * (n + 4) AS BIGINT) AS rad2_den",
          "CAST(x + 2 AS DOUBLE) / CAST(n + 4 AS DOUBLE) AS center",
          "CAST(4 * (x * (n - x) + n) AS DOUBLE)" +
            " / CAST(n * (n + 4) * (n + 4) AS DOUBLE) AS radius2")
        .orderBy("arm")
    },

    // Chi-square GOODNESS-OF-FIT against the uniform design (the
    // complement of q_stat_chi2's independence test, and — at k = 2 —
    // exactly the experimenter's sample-ratio-mismatch check): is event
    // traffic really spread evenly over the five types? Each term
    // (o − n/k)²/(n/k) collapses to the exact integer rational
    // (k·o − n)²/(k·n) — BIGINT pieces plus the one-divide double;
    // χ² is their caller-side sum (k−1 df).
    //
    // Scale shape: ONE map-side-combinable type count (≤5 cells at any
    // corpus size); the margins are windows over those cells. Squared
    // deviations hold in LONG to ~10⁹ events per cell; loud beyond.
    Q("q_stat_gof",
      """WITH c AS (
        |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS o
        |  FROM events GROUP BY 1),
        |g AS (
        |  SELECT event_type, o, SUM(o) OVER () AS n,
        |    COUNT(*) OVER () AS k
        |  FROM c)
        |SELECT event_type, o AS n_obs,
        |  CAST((k * o - n) * (k * o - n) AS BIGINT) AS term_num,
        |  CAST(k * n AS BIGINT) AS term_den,
        |  CAST((k * o - n) * (k * o - n) AS DOUBLE)
        |    / CAST(k * n AS DOUBLE) AS chi2_term
        |FROM g ORDER BY event_type""".stripMargin) { (s, d) =>
      val c = Tables.events(s, d)
        .groupBy("event_type")
        .agg(count(lit(1)).cast(LongType).as("o"))
      val wAll = Window.partitionBy()
      c.select(col("event_type"), col("o"),
          sum("o").over(wAll).as("n"), count(lit(1)).over(wAll).as("k"))
        .selectExpr("event_type", "o AS n_obs",
          "CAST((k * o - n) * (k * o - n) AS BIGINT) AS term_num",
          "CAST(k * n AS BIGINT) AS term_den",
          "CAST((k * o - n) * (k * o - n) AS DOUBLE)" +
            " / CAST(k * n AS DOUBLE) AS chi2_term")
        .orderBy("event_type")
    },

    // Binary-classifier confusion report — the ML-eval staple beside
    // q_stat_auc/q_stat_gains/q_stat_calibration: treat "event value ≥
    // $100" as the predictor and "is a purchase" as the truth, and emit
    // the exact 2×2 matrix with precision/recall/F1 (single divides;
    // F1 as 2TP/(2TP+FP+FN) — one divide, not a mean of means) and the
    // Matthews-correlation pieces (denominator squared so no sqrt
    // enters the oracle). The threshold is exact-cents integer
    // arithmetic — no FP compare.
    //
    // Scale shape: ONE conditional-sum aggregate (map-side combinable,
    // one counter row at any corpus size — and streaming-legal
    // verbatim: s_stream_confusion). operators/ExactStats.confusion.
    Q("q_stat_confusion",
      """WITH u AS (
        |  SELECT CASE WHEN CAST(CAST(value AS DECIMAL(12,2)) * 100
        |      AS BIGINT) >= 10000 THEN 1 ELSE 0 END AS pred,
        |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END
        |      AS actual
        |  FROM events),
        |c AS (
        |  SELECT CAST(SUM(pred * actual) AS BIGINT) AS tp,
        |    CAST(SUM(pred * (1 - actual)) AS BIGINT) AS fp,
        |    CAST(SUM((1 - pred) * actual) AS BIGINT) AS fn,
        |    CAST(SUM((1 - pred) * (1 - actual)) AS BIGINT) AS tn
        |  FROM u)
        |SELECT tp, fp, fn, tn,
        |  CASE WHEN tp + fp = 0 THEN NULL ELSE CAST(tp AS DOUBLE)
        |    / CAST(tp + fp AS DOUBLE) END AS precision_,
        |  CASE WHEN tp + fn = 0 THEN NULL ELSE CAST(tp AS DOUBLE)
        |    / CAST(tp + fn AS DOUBLE) END AS recall_,
        |  CASE WHEN 2 * tp + fp + fn = 0 THEN NULL
        |    ELSE CAST(2 * tp AS DOUBLE)
        |    / CAST(2 * tp + fp + fn AS DOUBLE) END AS f1,
        |  CAST(tp * tn - fp * fn AS BIGINT) AS mcc_num,
        |  CAST((tp + fp) * (tp + fn) AS BIGINT) AS mcc_den_a,
        |  CAST((tn + fp) * (tn + fn) AS BIGINT) AS mcc_den_b
        |FROM c""".stripMargin) { (s, d) =>
      val u = Tables.events(s, d)
        .select(
          when((col("value").cast(DecimalType(12, 2)) * 100)
            .cast(LongType) >= 10000L, 1L).otherwise(0L).as("pred"),
          when(col("event_type") === "purchase", 1L).otherwise(0L)
            .as("actual"))
      graft.operators.ExactStats.confusion(u, "pred", "actual")
    }
  )
}
