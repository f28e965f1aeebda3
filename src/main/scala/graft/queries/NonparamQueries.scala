package graft.queries

import graft.core.{Q, Tables}
import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, LongType}

/** Nonparametric and categorical test statistics — the experiment-
  * analysis layer beyond q_stat_ttest/q_stat_mannwhitney: k-group rank
  * tests (Kruskal–Wallis), ordered-alternative trend (Jonckheere–
  * Terpstra), paired binary (McNemar), repeated-measures binary
  * (Cochran's Q), 2×2 association (odds ratio / relative risk), and the
  * parametric one-way ANOVA decomposition beside them.
  *
  * Discipline (the q_stat_kendall emission contract): every statistic is
  * emitted as EXACT integer pieces (doubled midranks under ties, scaled
  * deviations) plus at most a fixed-shape double tree of single divides —
  * no sqrt, no log, no FP accumulation order dependence, so both engines
  * hash-match bit-for-bit. Ranks NEVER touch the fact: they are computed
  * on the (group, value) count HISTOGRAM (quantity is ndv-bounded — the
  * q_agg_mad/q_stat_mannwhitney route), so the one row-scale exchange in
  * every query here is a map-side-combinable count aggregate and
  * everything after rides domain-bounded frames.
  */
object NonparamQueries {

  val all: Seq[Q] = Seq(
    // Kruskal–Wallis rank pieces — the k-group generalization of
    // q_stat_mannwhitney (does quantity's distribution differ across
    // the three return flags?). Midranks with tie-averaging come from
    // the global value histogram: a value cell with tc ties starting
    // after cum prior observations has doubled midrank 2·cum + tc + 1,
    // so each group's doubled rank sum Σ c_gv·(2·cum_v + tc_v + 1)
    // stays integral. H and its tie correction are caller-side algebra:
    // H = [12/(N(N+1))·Σ_g (R_g)²/n_g − 3(N+1)] / (1 − tie_sum/(N³−N))
    // with R_g = rank_sum_x2/2.
    //
    // Scale shape: ONE map-side-combinable (flag, value) count; the
    // histogram cum window and the tie rollup ride the ndv-bounded
    // value frame (≤50 cells), the join back is broadcast. Doubled
    // products are summed in DECIMAL(25,0) (exact to ~10¹² rows);
    // tc³ holds in BIGINT to ~2·10⁶ rows per value cell — loud
    // (ANSI / HUGEINT range) beyond, never silent.
    Q("q_stat_kruskal",
      """WITH s AS (
        |  SELECT l_returnflag AS g,
        |    CAST(CAST(l_quantity AS DECIMAL(12,2)) * 100 AS BIGINT) AS v
        |  FROM lineitem),
        |h AS (
        |  SELECT g, v, CAST(COUNT(*) AS BIGINT) AS c FROM s GROUP BY g, v),
        |vt AS (
        |  SELECT v, CAST(SUM(c) AS BIGINT) AS tc FROM h GROUP BY v),
        |vc AS (
        |  SELECT v, tc,
        |    CAST(COALESCE(SUM(tc) OVER (ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS BIGINT) AS cum
        |  FROM vt),
        |gr AS (
        |  SELECT g, CAST(SUM(c) AS BIGINT) AS n_g,
        |    CAST(SUM(CAST(c AS DECIMAL(25,0)) * (2 * cum + tc + 1))
        |      AS BIGINT) AS rank_sum_x2
        |  FROM h JOIN vc ON h.v = vc.v GROUP BY g),
        |gw AS (
        |  SELECT g, n_g, rank_sum_x2,
        |    CAST(SUM(n_g) OVER () AS BIGINT) AS n_total
        |  FROM gr),
        |t AS (
        |  SELECT CAST(SUM(tc * tc * tc - tc) AS BIGINT) AS tie_sum
        |  FROM vt)
        |SELECT g AS l_returnflag, n_g, rank_sum_x2, n_total, tie_sum
        |FROM gw CROSS JOIN t ORDER BY l_returnflag""".stripMargin) {
      (s, d) =>
      val h = Tables.lineitem(s, d)
        .select(col("l_returnflag").as("g"),
          (col("l_quantity").cast(DecimalType(12, 2)) * 100)
            .cast(LongType).as("v"))
        .groupBy("g", "v")
        .agg(count(lit(1)).cast(LongType).as("c"))
        // the value histogram, the tie rollup and the rank join all
        // ride this ndv-bounded frame — one scan of the fact
        .localCheckpoint()
      val vt = h.groupBy("v").agg(sum("c").cast(LongType).as("tc"))
      val vc = vt.withColumn("cum",
        coalesce(sum("tc").over(Window.orderBy("v")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L))
          .cast(LongType))
      val gr = h.join(broadcast(vc), Seq("v"))
        .groupBy("g")
        .agg(sum("c").cast(LongType).as("n_g"),
          sum(col("c").cast(DecimalType(25, 0))
            * (lit(2) * col("cum") + col("tc") + 1))
            .cast(LongType).as("rank_sum_x2"))
      val gw = gr.withColumn("n_total",
        sum("n_g").over(Window.partitionBy()).cast(LongType))
      val t = vt.agg(
        sum(col("tc") * col("tc") * col("tc") - col("tc"))
          .cast(LongType).as("tie_sum"))
      gw.crossJoin(broadcast(t))
        .select(col("g").as("l_returnflag"), col("n_g"),
          col("rank_sum_x2"), col("n_total"), col("tie_sum"))
        .orderBy("l_returnflag")
    },

    // Jonckheere–Terpstra trend pieces — the ordered-alternative rank
    // test (does quantity trend with line number 1→7?): JT is the sum
    // over ordered group pairs i<j of Mann–Whitney counts
    // #{x_i < x_j} + ½·#{x_i = x_j}. On the COMPLETED group×value grid
    // each cell contributes c·(2·gt + eq) to the doubled statistic,
    // where gt = observations in LATER groups with HIGHER values (a
    // suffix-of-suffix window) and eq = later groups, same value. The
    // null moments are caller-side from the emitted group sizes:
    // E[2·JT] = (N² − Σn_g²)/2.
    //
    // Scale shape: one (group, value) count exchange; the grid is
    // |groups|×|values| ≤ 350 cells at any corpus size, and both
    // dominance windows ride it. Cell products hold in DECIMAL(25,0)
    // to ~10¹² rows.
    Q("q_stat_jonckheere",
      """WITH s AS (
        |  SELECT l_linenumber AS g,
        |    CAST(CAST(l_quantity AS DECIMAL(12,2)) * 100 AS BIGINT) AS v
        |  FROM lineitem),
        |h AS (
        |  SELECT g, v, CAST(COUNT(*) AS BIGINT) AS c FROM s GROUP BY g, v),
        |grid AS (
        |  SELECT gg.g, vv.v, COALESCE(h.c, 0) AS c
        |  FROM (SELECT DISTINCT g FROM h) gg
        |  CROSS JOIN (SELECT DISTINCT v FROM h) vv
        |  LEFT JOIN h ON h.g = gg.g AND h.v = vv.v),
        |sx AS (
        |  SELECT g, v, c,
        |    CAST(COALESCE(SUM(c) OVER (PARTITION BY g ORDER BY v DESC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS BIGINT) AS sv
        |  FROM grid),
        |dom AS (
        |  SELECT g, c,
        |    CAST(COALESCE(SUM(sv) OVER (PARTITION BY v ORDER BY g
        |      ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING), 0)
        |      AS BIGINT) AS gt,
        |    CAST(COALESCE(SUM(c) OVER (PARTITION BY v ORDER BY g
        |      ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING), 0)
        |      AS BIGINT) AS eq
        |  FROM sx)
        |SELECT g AS l_linenumber, CAST(SUM(c) AS BIGINT) AS n_g,
        |  CAST(SUM(CAST(c AS DECIMAL(25,0)) * (2 * gt + eq)) AS BIGINT)
        |    AS jt_term_x2
        |FROM dom GROUP BY g ORDER BY l_linenumber""".stripMargin) {
      (s, d) =>
      val h = Tables.lineitem(s, d)
        .select(col("l_linenumber").as("g"),
          (col("l_quantity").cast(DecimalType(12, 2)) * 100)
            .cast(LongType).as("v"))
        .groupBy("g", "v")
        .agg(count(lit(1)).cast(LongType).as("c"))
        // grid spine + completion join all ride this ≤350-cell frame
        .localCheckpoint()
      val grid = h.select("g").distinct()
        .crossJoin(h.select("v").distinct())
        .join(h, Seq("g", "v"), "left")
        .select(col("g"), col("v"), coalesce(col("c"), lit(0L)).as("c"))
      val sx = grid.withColumn("sv",
        coalesce(sum("c").over(Window.partitionBy("g").orderBy(col("v").desc)
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L))
          .cast(LongType))
      val later = Window.partitionBy("v").orderBy("g")
        .rowsBetween(1, Window.unboundedFollowing)
      val dom = sx.select(col("g"), col("c"),
        coalesce(sum("sv").over(later), lit(0L)).cast(LongType).as("gt"),
        coalesce(sum("c").over(later), lit(0L)).cast(LongType).as("eq"))
      dom.groupBy("g")
        .agg(sum("c").cast(LongType).as("n_g"),
          sum(col("c").cast(DecimalType(25, 0))
            * (lit(2) * col("gt") + col("eq")))
            .cast(LongType).as("jt_term_x2"))
        .select(col("g").as("l_linenumber"), col("n_g"), col("jt_term_x2"))
        .orderBy("l_linenumber")
    },

    // McNemar's paired-proportion test — week-over-week user activity
    // as the matched-pairs 2×2 (the before/after retention check): did
    // the active-user set CHANGE between week 1 and week 2, judged only
    // by the discordant cells? χ² = (b−c)²/(b+c) plus the
    // continuity-corrected (max(|b−c|−1,0))²/(b+c) — every piece an
    // exact integer, one IEEE divide each (NULL when b+c = 0, the
    // degenerate no-switch corpus, identically in both engines).
    //
    // Scale shape: ONE per-user conditional-flag rollup (map-side
    // combinable) then a single counter row — streaming-legal shape.
    // Weeks are fixture-anchored ([2024-01-01, 2024-01-15) halves).
    Q("q_stat_mcnemar",
      """WITH u AS (
        |  SELECT user_id,
        |    MAX(CASE WHEN ts < TIMESTAMP '2024-01-08 00:00:00'
        |      THEN 1 ELSE 0 END) AS w1,
        |    MAX(CASE WHEN ts >= TIMESTAMP '2024-01-08 00:00:00'
        |      AND ts < TIMESTAMP '2024-01-15 00:00:00'
        |      THEN 1 ELSE 0 END) AS w2
        |  FROM events GROUP BY user_id),
        |m AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
        |    CAST(SUM(w1 * w2) AS BIGINT) AS both_weeks,
        |    CAST(SUM(w1 * (1 - w2)) AS BIGINT) AS only_w1,
        |    CAST(SUM((1 - w1) * w2) AS BIGINT) AS only_w2,
        |    CAST(SUM((1 - w1) * (1 - w2)) AS BIGINT) AS neither
        |  FROM u)
        |SELECT n_users, both_weeks, only_w1, only_w2, neither,
        |  CAST((only_w1 - only_w2) * (only_w1 - only_w2) AS BIGINT)
        |    AS chi2_num,
        |  CAST(only_w1 + only_w2 AS BIGINT) AS chi2_den,
        |  CAST((only_w1 - only_w2) * (only_w1 - only_w2) AS DOUBLE)
        |    / CAST(NULLIF(only_w1 + only_w2, 0) AS DOUBLE) AS mcnemar_chi2,
        |  CAST(GREATEST(ABS(only_w1 - only_w2) - 1, 0)
        |    * GREATEST(ABS(only_w1 - only_w2) - 1, 0) AS BIGINT) AS cc_num,
        |  CAST(GREATEST(ABS(only_w1 - only_w2) - 1, 0)
        |    * GREATEST(ABS(only_w1 - only_w2) - 1, 0) AS DOUBLE)
        |    / CAST(NULLIF(only_w1 + only_w2, 0) AS DOUBLE) AS mcnemar_cc
        |FROM m""".stripMargin) { (s, d) =>
      val u = Tables.events(s, d)
        .groupBy("user_id")
        .agg(
          max(when(col("ts") < lit("2024-01-08 00:00:00").cast("timestamp"),
            1L).otherwise(0L)).as("w1"),
          max(when(col("ts") >= lit("2024-01-08 00:00:00").cast("timestamp")
            && col("ts") < lit("2024-01-15 00:00:00").cast("timestamp"),
            1L).otherwise(0L)).as("w2"))
      u.agg(count(lit(1)).cast(LongType).as("n_users"),
          sum(col("w1") * col("w2")).cast(LongType).as("both_weeks"),
          sum(col("w1") * (lit(1L) - col("w2"))).cast(LongType).as("only_w1"),
          sum((lit(1L) - col("w1")) * col("w2")).cast(LongType).as("only_w2"),
          sum((lit(1L) - col("w1")) * (lit(1L) - col("w2")))
            .cast(LongType).as("neither"))
        .selectExpr("n_users", "both_weeks", "only_w1", "only_w2", "neither",
          "CAST((only_w1 - only_w2) * (only_w1 - only_w2) AS BIGINT)" +
            " AS chi2_num",
          "CAST(only_w1 + only_w2 AS BIGINT) AS chi2_den",
          "CAST((only_w1 - only_w2) * (only_w1 - only_w2) AS DOUBLE)" +
            " / CAST(NULLIF(only_w1 + only_w2, 0) AS DOUBLE)" +
            " AS mcnemar_chi2",
          "CAST(GREATEST(ABS(only_w1 - only_w2) - 1, 0)" +
            " * GREATEST(ABS(only_w1 - only_w2) - 1, 0) AS BIGINT)" +
            " AS cc_num",
          "CAST(GREATEST(ABS(only_w1 - only_w2) - 1, 0)" +
            " * GREATEST(ABS(only_w1 - only_w2) - 1, 0) AS DOUBLE)" +
            " / CAST(NULLIF(only_w1 + only_w2, 0) AS DOUBLE)" +
            " AS mcnemar_cc")
    },

    // Cochran's Q pieces — the k-treatment generalization of McNemar
    // (the binary Friedman): is weekly activity consistent across the
    // four fixture weeks? Q = (k−1)·(k·ΣC_j² − N²) / (k·N − ΣR_i²)
    // with C_j the per-week active counts and R_i the per-user
    // weeks-active totals — every piece an exact integer. All-zero
    // blocks provably cancel from BOTH numerator and denominator, so
    // the user universe needs no completion. Weeks come from the
    // day-of-month via the exactly-divisible (d − d%7)/7 trick (no
    // dialect div operator needed).
    //
    // Scale shape: one distinct (user, week) exchange; C_j is a ≤4-row
    // rollup with its windows, ΣR_i² a per-user rollup folded to one
    // broadcast row. ΣC_j² ≤ N² holds in BIGINT to ~3·10⁹ active
    // user-weeks; loud beyond.
    Q("q_stat_cochranq",
      """WITH e AS (
        |  SELECT DISTINCT user_id,
        |    CAST((EXTRACT(DAY FROM ts) - 1
        |      - ((EXTRACT(DAY FROM ts) - 1) % 7)) / 7 AS BIGINT) AS wk
        |  FROM events WHERE ts < TIMESTAMP '2024-01-29 00:00:00'),
        |c AS (
        |  SELECT wk, CAST(COUNT(*) AS BIGINT) AS c_j FROM e GROUP BY wk),
        |cw AS (
        |  SELECT wk, c_j,
        |    CAST(SUM(c_j * c_j) OVER () AS BIGINT) AS sum_c2,
        |    CAST(SUM(c_j) OVER () AS BIGINT) AS n_active
        |  FROM c),
        |r AS (
        |  SELECT CAST(SUM(ri * ri) AS BIGINT) AS sum_r2
        |  FROM (SELECT user_id, COUNT(*) AS ri FROM e GROUP BY user_id) t)
        |SELECT wk AS week, c_j, n_active,
        |  CAST(3 * (4 * sum_c2 - n_active * n_active) AS BIGINT) AS q_num,
        |  CAST(4 * n_active - sum_r2 AS BIGINT) AS q_den,
        |  CAST(3 * (4 * sum_c2 - n_active * n_active) AS DOUBLE)
        |    / CAST(NULLIF(4 * n_active - sum_r2, 0) AS DOUBLE) AS cochran_q
        |FROM cw CROSS JOIN r ORDER BY week""".stripMargin) { (s, d) =>
      val e = Tables.events(s, d)
        .filter(col("ts") < lit("2024-01-29 00:00:00").cast("timestamp"))
        .select(col("user_id"),
          expr("CAST((EXTRACT(DAY FROM ts) - 1" +
            " - ((EXTRACT(DAY FROM ts) - 1) % 7)) / 7 AS BIGINT)").as("wk"))
        .distinct()
        // both the week rollup and the per-user rollup ride this frame
        .localCheckpoint()
      val cw = e.groupBy("wk")
        .agg(count(lit(1)).cast(LongType).as("c_j"))
        .withColumn("sum_c2",
          sum(col("c_j") * col("c_j")).over(Window.partitionBy())
            .cast(LongType))
        .withColumn("n_active",
          sum("c_j").over(Window.partitionBy()).cast(LongType))
      val r = e.groupBy("user_id").agg(count(lit(1)).as("ri"))
        .agg(sum(col("ri") * col("ri")).cast(LongType).as("sum_r2"))
      cw.crossJoin(broadcast(r))
        .selectExpr("wk AS week", "c_j", "n_active",
          "CAST(3 * (4 * sum_c2 - n_active * n_active) AS BIGINT) AS q_num",
          "CAST(4 * n_active - sum_r2 AS BIGINT) AS q_den",
          "CAST(3 * (4 * sum_c2 - n_active * n_active) AS DOUBLE)" +
            " / CAST(NULLIF(4 * n_active - sum_r2, 0) AS DOUBLE)" +
            " AS cochran_q")
        .orderBy("week")
    },

    // Odds ratio and relative risk over the user-level 2×2 (exposure =
    // ever clicked, outcome = ever purchased) — the effect-size report
    // beside q_stat_proportion's significance test. Plain OR = ad/bc
    // and RR = a(c+d)/(c(a+b)) as exact integer num/den pieces with one
    // IEEE divide each; the Haldane–Anscombe +½-corrected OR is emitted
    // exactly too, as (2a+1)(2d+1)/((2b+1)(2c+1)) — doubling the table
    // turns the ½ correction into integers.
    //
    // Scale shape: one per-user conditional-flag rollup then a single
    // counter row — the q_stat_confusion shape, streaming-legal.
    // Products hold in BIGINT to ~3·10⁹ users per cell; loud beyond.
    Q("q_stat_oddsratio",
      """WITH u AS (
        |  SELECT user_id,
        |    MAX(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS ex,
        |    MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS oc
        |  FROM events GROUP BY user_id),
        |m AS (
        |  SELECT CAST(SUM(ex * oc) AS BIGINT) AS n_exp_out,
        |    CAST(SUM(ex * (1 - oc)) AS BIGINT) AS n_exp_noout,
        |    CAST(SUM((1 - ex) * oc) AS BIGINT) AS n_noexp_out,
        |    CAST(SUM((1 - ex) * (1 - oc)) AS BIGINT) AS n_noexp_noout
        |  FROM u)
        |SELECT n_exp_out, n_exp_noout, n_noexp_out, n_noexp_noout,
        |  CAST(n_exp_out * n_noexp_noout AS BIGINT) AS or_num,
        |  CAST(n_exp_noout * n_noexp_out AS BIGINT) AS or_den,
        |  CAST(n_exp_out * n_noexp_noout AS DOUBLE)
        |    / CAST(NULLIF(n_exp_noout * n_noexp_out, 0) AS DOUBLE)
        |    AS odds_ratio,
        |  CAST((2 * n_exp_out + 1) * (2 * n_noexp_noout + 1) AS BIGINT)
        |    AS or_ha_num,
        |  CAST((2 * n_exp_noout + 1) * (2 * n_noexp_out + 1) AS BIGINT)
        |    AS or_ha_den,
        |  CAST(n_exp_out * (n_noexp_out + n_noexp_noout) AS BIGINT)
        |    AS rr_num,
        |  CAST(n_noexp_out * (n_exp_out + n_exp_noout) AS BIGINT)
        |    AS rr_den,
        |  CAST(n_exp_out * (n_noexp_out + n_noexp_noout) AS DOUBLE)
        |    / CAST(NULLIF(n_noexp_out * (n_exp_out + n_exp_noout), 0)
        |      AS DOUBLE) AS risk_ratio
        |FROM m""".stripMargin) { (s, d) =>
      val u = Tables.events(s, d)
        .groupBy("user_id")
        .agg(max(when(col("event_type") === "click", 1L).otherwise(0L))
            .as("ex"),
          max(when(col("event_type") === "purchase", 1L).otherwise(0L))
            .as("oc"))
      u.agg(sum(col("ex") * col("oc")).cast(LongType).as("n_exp_out"),
          sum(col("ex") * (lit(1L) - col("oc"))).cast(LongType)
            .as("n_exp_noout"),
          sum((lit(1L) - col("ex")) * col("oc")).cast(LongType)
            .as("n_noexp_out"),
          sum((lit(1L) - col("ex")) * (lit(1L) - col("oc"))).cast(LongType)
            .as("n_noexp_noout"))
        .selectExpr("n_exp_out", "n_exp_noout", "n_noexp_out",
          "n_noexp_noout",
          "CAST(n_exp_out * n_noexp_noout AS BIGINT) AS or_num",
          "CAST(n_exp_noout * n_noexp_out AS BIGINT) AS or_den",
          "CAST(n_exp_out * n_noexp_noout AS DOUBLE)" +
            " / CAST(NULLIF(n_exp_noout * n_noexp_out, 0) AS DOUBLE)" +
            " AS odds_ratio",
          "CAST((2 * n_exp_out + 1) * (2 * n_noexp_noout + 1) AS BIGINT)" +
            " AS or_ha_num",
          "CAST((2 * n_exp_noout + 1) * (2 * n_noexp_out + 1) AS BIGINT)" +
            " AS or_ha_den",
          "CAST(n_exp_out * (n_noexp_out + n_noexp_noout) AS BIGINT)" +
            " AS rr_num",
          "CAST(n_noexp_out * (n_exp_out + n_exp_noout) AS BIGINT)" +
            " AS rr_den",
          "CAST(n_exp_out * (n_noexp_out + n_noexp_noout) AS DOUBLE)" +
            " / CAST(NULLIF(n_noexp_out * (n_exp_out + n_exp_noout), 0)" +
            " AS DOUBLE) AS risk_ratio")
    },

    // One-way ANOVA decomposition — the parametric complement of
    // q_stat_kruskal on the same design (quantity by line number):
    // per-group between/within sum-of-squares terms with the scaled
    // deviation dev_g = N·s_g − n_g·S emitted as the EXACT integer
    // piece, and the double terms as fixed single-divide trees over
    // exactly-emitted integers (ssb_term = dev_g²/(n_g·N²),
    // ssw_term = q_g − s_g²/n_g). F assembles caller-side:
    // F = (Σssb/(k−1)) / (Σssw/(N−k)) — kept out of the oracle so no
    // cross-group double accumulation order exists.
    //
    // Scale shape: ONE map-side-combinable conditional-sum aggregate
    // (7 groups); margins are windows over those rows. Exact while
    // N·s_g < 2⁶³ — ~10⁶ rows/group at quantity cents; the pieces
    // overflow LOUDLY (ANSI) beyond, never silently.
    Q("q_stat_anova",
      """WITH s AS (
        |  SELECT l_linenumber AS g,
        |    CAST(CAST(l_quantity AS DECIMAL(12,2)) * 100 AS BIGINT) AS x
        |  FROM lineitem),
        |a AS (
        |  SELECT g, CAST(COUNT(*) AS BIGINT) AS n_g,
        |    CAST(SUM(x) AS BIGINT) AS s_g,
        |    CAST(SUM(x * x) AS BIGINT) AS q_g
        |  FROM s GROUP BY g),
        |w AS (
        |  SELECT g, n_g, s_g, q_g,
        |    CAST(SUM(n_g) OVER () AS BIGINT) AS n,
        |    CAST(SUM(s_g) OVER () AS BIGINT) AS st,
        |    CAST(COUNT(*) OVER () AS BIGINT) AS k
        |  FROM a)
        |SELECT g AS l_linenumber, n_g, s_g, q_g, n AS n_total,
        |  k AS k_groups,
        |  CAST(n * s_g - n_g * st AS BIGINT) AS dev_num,
        |  CAST(n * s_g - n_g * st AS DOUBLE)
        |    * CAST(n * s_g - n_g * st AS DOUBLE)
        |    / (CAST(n_g AS DOUBLE) * CAST(n AS DOUBLE) * CAST(n AS DOUBLE))
        |    AS ssb_term,
        |  CAST(q_g AS DOUBLE) - CAST(s_g AS DOUBLE) * CAST(s_g AS DOUBLE)
        |    / CAST(n_g AS DOUBLE) AS ssw_term
        |FROM w ORDER BY l_linenumber""".stripMargin) { (s, d) =>
      val a = Tables.lineitem(s, d)
        .select(col("l_linenumber").as("g"),
          (col("l_quantity").cast(DecimalType(12, 2)) * 100)
            .cast(LongType).as("x"))
        .groupBy("g")
        .agg(count(lit(1)).cast(LongType).as("n_g"),
          sum("x").cast(LongType).as("s_g"),
          sum(col("x") * col("x")).cast(LongType).as("q_g"))
      val wAll = Window.partitionBy()
      a.select(col("g"), col("n_g"), col("s_g"), col("q_g"),
          sum("n_g").over(wAll).cast(LongType).as("n"),
          sum("s_g").over(wAll).cast(LongType).as("st"),
          count(lit(1)).over(wAll).cast(LongType).as("k"))
        .selectExpr("g AS l_linenumber", "n_g", "s_g", "q_g",
          "n AS n_total", "k AS k_groups",
          "CAST(n * s_g - n_g * st AS BIGINT) AS dev_num",
          "CAST(n * s_g - n_g * st AS DOUBLE)" +
            " * CAST(n * s_g - n_g * st AS DOUBLE)" +
            " / (CAST(n_g AS DOUBLE) * CAST(n AS DOUBLE)" +
            " * CAST(n AS DOUBLE)) AS ssb_term",
          "CAST(q_g AS DOUBLE) - CAST(s_g AS DOUBLE)" +
            " * CAST(s_g AS DOUBLE) / CAST(n_g AS DOUBLE) AS ssw_term")
        .orderBy("l_linenumber")
    },

    // Wilcoxon signed-rank pieces — THE paired two-sample test
    // (q_stat_mannwhitney's sibling for matched pairs): does a line-1
    // item's quantity systematically exceed its line-2 sibling within
    // the same order? Pairs are orders carrying exactly one line 1 and
    // one line 2 (l_linenumber is NOT unique per order in the fixture —
    // the exactly-one guard keeps the pairing deterministic). Zero
    // differences are dropped (the classic Wilcoxon reduction), |d|
    // midranks come DOUBLED from the |d| histogram (cell after cum
    // priors with ctot ties ⇒ doubled midrank 2·cum + ctot + 1), and
    // W⁺/W⁻ stay exact integers: W⁺ₓ₂ + W⁻ₓ₂ = m(m+1) with
    // m = n_pos + n_neg (the conservation law StressSpec pins). The
    // normal approximation z = (W⁺ − m(m+1)/4)/√(var) is caller-side
    // algebra over the emitted pieces incl. tie_sum = Σ(t³ − t).
    //
    // Scale shape: ONE row-scale exchange (the per-order pair rollup,
    // map-side combinable); the |d| histogram (≤ 100 cells — quantity
    // is 1..50 in hundredths), its cum window and the 1-row rollup all
    // ride domain-bounded frames. Pair products hold in BIGINT to
    // ~10⁹ pairs per tie cell; loud beyond.
    Q("q_stat_wilcoxon",
      """WITH p AS (
        |  SELECT l_orderkey,
        |    MAX(CASE WHEN l_linenumber = 1 THEN
        |      CAST(CAST(l_quantity AS DECIMAL(12,2)) * 100 AS BIGINT)
        |      END) AS q1,
        |    MAX(CASE WHEN l_linenumber = 2 THEN
        |      CAST(CAST(l_quantity AS DECIMAL(12,2)) * 100 AS BIGINT)
        |      END) AS q2
        |  FROM lineitem WHERE l_linenumber <= 2 GROUP BY l_orderkey
        |  HAVING SUM(CASE WHEN l_linenumber = 1 THEN 1 ELSE 0 END) = 1
        |     AND SUM(CASE WHEN l_linenumber = 2 THEN 1 ELSE 0 END) = 1),
        |h AS (
        |  SELECT ABS(q1 - q2) AS v,
        |    CAST(SUM(CASE WHEN q1 > q2 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS cpos,
        |    CAST(SUM(CASE WHEN q1 < q2 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS cneg,
        |    CAST(COUNT(*) AS BIGINT) AS ctot
        |  FROM p GROUP BY ABS(q1 - q2)),
        |nz AS (
        |  SELECT CAST(SUM(ctot) AS BIGINT) AS n_pairs,
        |    CAST(COALESCE(SUM(CASE WHEN v = 0 THEN ctot END), 0)
        |      AS BIGINT) AS n_zero
        |  FROM h),
        |vc AS (
        |  SELECT v, cpos, cneg, ctot,
        |    CAST(COALESCE(SUM(ctot) OVER (ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS BIGINT) AS cum
        |  FROM h WHERE v <> 0)
        |SELECT n_pairs, n_zero,
        |  CAST(SUM(cpos) AS BIGINT) AS n_pos,
        |  CAST(SUM(cneg) AS BIGINT) AS n_neg,
        |  CAST(SUM(cpos * (2 * cum + ctot + 1)) AS BIGINT) AS w_plus_x2,
        |  CAST(SUM(cneg * (2 * cum + ctot + 1)) AS BIGINT) AS w_minus_x2,
        |  CAST(SUM(ctot * ctot * ctot - ctot) AS BIGINT) AS tie_sum
        |FROM vc CROSS JOIN nz GROUP BY n_pairs, n_zero""".stripMargin) {
      (s, d) =>
      val p = Tables.lineitem(s, d).where(col("l_linenumber") <= 2)
        .groupBy("l_orderkey")
        .agg(
          max(when(col("l_linenumber") === 1,
            (col("l_quantity").cast(DecimalType(12, 2)) * 100)
              .cast(LongType))).as("q1"),
          max(when(col("l_linenumber") === 2,
            (col("l_quantity").cast(DecimalType(12, 2)) * 100)
              .cast(LongType))).as("q2"),
          sum(when(col("l_linenumber") === 1, 1L).otherwise(0L)).as("c1"),
          sum(when(col("l_linenumber") === 2, 1L).otherwise(0L)).as("c2"))
        .where(col("c1") === 1 && col("c2") === 1)
      // the |d| histogram (zero cell included) is the ONLY frame the
      // rollup, the zero-count and the rank window touch — one scan,
      // ONE frame: the zero cell contributes nothing to the windowed
      // rank mass (the when() inside the sum skips it), so the same
      // ordered pass serves the zero diagnostics and the nonzero
      // ranks with no checkpoint and no cross join — and the global
      // window sits directly on the histogram Aggregate, which is
      // exactly the shape the strict window lint exempts
      val h = p.groupBy(abs(col("q1") - col("q2")).as("v"))
        .agg(sum(when(col("q1") > col("q2"), 1L).otherwise(0L))
            .cast(LongType).as("cpos"),
          sum(when(col("q1") < col("q2"), 1L).otherwise(0L))
            .cast(LongType).as("cneg"),
          count(lit(1)).cast(LongType).as("ctot"))
      val nzCum = sum(when(col("v") =!= 0, col("ctot")))
        .over(Window.orderBy("v")
          .rowsBetween(Window.unboundedPreceding, -1))
      val vc = h.withColumn("cum",
        coalesce(nzCum, lit(0L)).cast(LongType))
      def nz(c: Column): Column = when(col("v") =!= 0, c)
      vc.agg(
        sum("ctot").cast(LongType).as("n_pairs"),
        coalesce(sum(when(col("v") === 0, col("ctot"))), lit(0L))
          .cast(LongType).as("n_zero"),
        sum(nz(col("cpos"))).cast(LongType).as("n_pos"),
        sum(nz(col("cneg"))).cast(LongType).as("n_neg"),
        sum(nz(col("cpos") * (lit(2) * col("cum") + col("ctot") + 1)))
          .cast(LongType).as("w_plus_x2"),
        sum(nz(col("cneg") * (lit(2) * col("cum") + col("ctot") + 1)))
          .cast(LongType).as("w_minus_x2"),
        sum(nz(col("ctot") * col("ctot") * col("ctot") - col("ctot")))
          .cast(LongType).as("tie_sum"))
    },

    // Page's L trend pieces — the ORDERED-alternative Friedman (is
    // volume monotone in priority urgency across month blocks?):
    // q_stat_friedman's exact midrank machinery with the treatment
    // weight j = the priority's leading digit (1-URGENT … 5-LOW), so
    // L = Σⱼ j·Rⱼ is emitted doubled and exact. Under H₀,
    // E[Lₓ₂] = b·k·(k+1)²/2 — caller-side algebra over the emitted
    // b_months/j_weight/rank_sum_x2 (the Kendall emission discipline);
    // the Friedman conservation Σ rank_sum_x2 = b·k·(k+1) still holds
    // (StressSpec pins both).
    //
    // Scale shape: identical to q_stat_friedman — one (month, priority)
    // count exchange; grid completion, rank windows and the 5-row
    // rollup ride the ≤80·5-cell calendar×domain frame.
    Q("q_stat_page",
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
        |  CAST(SUBSTR(p, 1, 1) AS BIGINT) AS j_weight,
        |  CAST(COUNT(*) AS BIGINT) AS b_months,
        |  CAST(SUM(mr_x2) AS BIGINT) AS rank_sum_x2,
        |  CAST(SUBSTR(p, 1, 1) AS BIGINT) * CAST(SUM(mr_x2) AS BIGINT)
        |    AS l_term_x2
        |FROM r GROUP BY p ORDER BY o_orderpriority""".stripMargin) {
      (s, d) =>
      val mo = Tables.orders(s, d)
        .groupBy((year(col("o_orderdate")) * 12 + month(col("o_orderdate")))
            .cast(LongType).as("m"),
          col("o_orderpriority").as("p"))
        .agg(count(lit(1)).cast(LongType).as("cnt"))
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
        .select(col("p").as("o_orderpriority"),
          substring(col("p"), 1, 1).cast(LongType).as("j_weight"),
          col("b_months"), col("rank_sum_x2"),
          (substring(col("p"), 1, 1).cast(LongType) * col("rank_sum_x2"))
            .as("l_term_x2"))
        .orderBy("o_orderpriority")
    },

    // Cramér's V pieces — the r×c contingency association (does order
    // status depend on priority?), generalizing q_stat_chi2's 2×2: per
    // cell the exact deviation dev = N·o − r·c (every marginal from
    // window sums over the k·l-cell frame — deviations telescope to 0
    // along EVERY row and column, the law StressSpec pins) and the χ²
    // term as the fixed two-divide double tree dev/N · dev/r / c, so
    // both engines evaluate the identical IEEE expression.
    // V² = χ²/(N·min(r−1, c−1)) is caller-side algebra.
    //
    // Scale shape: one map-side-combinable (priority, status) count —
    // NO join (both axes live on the fact); marginal windows ride the
    // 15-cell frame. N·o holds in BIGINT to ~3·10⁹ orders; loud beyond.
    Q("q_stat_cramersv",
      """WITH c AS (
        |  SELECT o_orderpriority AS p, o_orderstatus AS st,
        |    CAST(COUNT(*) AS BIGINT) AS o
        |  FROM orders GROUP BY 1, 2),
        |w AS (
        |  SELECT p, st, o,
        |    CAST(SUM(o) OVER (PARTITION BY p) AS BIGINT) AS r_tot,
        |    CAST(SUM(o) OVER (PARTITION BY st) AS BIGINT) AS c_tot,
        |    CAST(SUM(o) OVER () AS BIGINT) AS n
        |  FROM c)
        |SELECT p AS o_orderpriority, st AS o_orderstatus, o AS observed,
        |  r_tot, c_tot, n,
        |  CAST(n * o - r_tot * c_tot AS BIGINT) AS dev,
        |  ((CAST(n * o - r_tot * c_tot AS DOUBLE) / CAST(n AS DOUBLE))
        |    * (CAST(n * o - r_tot * c_tot AS DOUBLE)
        |       / CAST(r_tot AS DOUBLE)))
        |    / CAST(c_tot AS DOUBLE) AS chi2_term
        |FROM w ORDER BY o_orderpriority, o_orderstatus""".stripMargin) {
      (s, d) =>
      val c = Tables.orders(s, d)
        .groupBy(col("o_orderpriority").as("p"),
          col("o_orderstatus").as("st"))
        .agg(count(lit(1)).cast(LongType).as("o"))
      val w = c.select(col("p"), col("st"), col("o"),
        sum("o").over(Window.partitionBy("p")).cast(LongType).as("r_tot"),
        sum("o").over(Window.partitionBy("st")).cast(LongType).as("c_tot"),
        sum("o").over(Window.partitionBy()).cast(LongType).as("n"))
      w.selectExpr("p AS o_orderpriority", "st AS o_orderstatus",
          "o AS observed", "r_tot", "c_tot", "n",
          "CAST(n * o - r_tot * c_tot AS BIGINT) AS dev",
          "((CAST(n * o - r_tot * c_tot AS DOUBLE) / CAST(n AS DOUBLE))" +
            " * (CAST(n * o - r_tot * c_tot AS DOUBLE)" +
            " / CAST(r_tot AS DOUBLE)))" +
            " / CAST(c_tot AS DOUBLE) AS chi2_term")
        .orderBy("o_orderpriority", "o_orderstatus")
    },

    // Brown-Forsythe (median-centered Levene) pieces — THE variance-
    // homogeneity gate in front of ANOVA (q_stat_anova assumes equal
    // group variances; this measures that assumption): per linenumber
    // group, absolute deviations z = |x - median_g| and their spread.
    // The group median comes exactly from the (group, value) count
    // histogram (doubled: med_x2 = lower + upper median, selected by
    // the 2*cum >= n / 2*cum > n positional conditions — no dialect-
    // divergent division), deviations are the exact integers
    // |2v - med_x2|, and the per-group variance numerator
    // n_g * SUM(z^2) - SUM(z)^2 >= 0 by Cauchy-Schwarz (StressSpec
    // pins it, plus the doubled-median bracket). The W statistic's
    // between/within ratio is caller-side algebra over (n_g, abs_sum,
    // abs_sumsq) — the Kruskal-Wallis emission discipline.
    //
    // Scale shape: ONE (group, value) count exchange — the frame is
    // groups x quantized support (7 x <= 5 001 cells at any sf); the
    // median selection windows, the 7-row median join (broadcast) and
    // the z rollup all ride that frame. The fact is scanned once.
    // n_g * abs_sumsq holds in BIGINT to ~10^5-row groups per unit
    // value range — loud beyond (Spark ANSI throws, DuckDB HUGEINT
    // disagrees loudly at the cast).
    Q("q_stat_levene",
      """WITH s AS (
        |  SELECT l_linenumber AS g,
        |    CAST(CAST(l_quantity AS DECIMAL(12,2)) * 100 AS BIGINT) AS v,
        |    CAST(COUNT(*) AS BIGINT) AS c
        |  FROM lineitem GROUP BY 1, 2),
        |z AS (
        |  SELECT g, v, c,
        |    SUM(c) OVER (PARTITION BY g ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |    SUM(c) OVER (PARTITION BY g) AS n
        |  FROM s),
        |m AS (
        |  SELECT g,
        |    CAST(MIN(CASE WHEN 2 * cum >= n THEN v END)
        |      + MIN(CASE WHEN 2 * cum > n THEN v END) AS BIGINT) AS med_x2
        |  FROM z GROUP BY g),
        |t AS (
        |  SELECT s.g AS g, m.med_x2 AS med_x2,
        |    CAST(SUM(s.c) AS BIGINT) AS n_g,
        |    CAST(SUM(s.c * ABS(2 * s.v - m.med_x2)) AS BIGINT) AS abs_sum,
        |    CAST(SUM(s.c * (2 * s.v - m.med_x2) * (2 * s.v - m.med_x2))
        |      AS BIGINT) AS abs_sumsq
        |  FROM s JOIN m ON s.g = m.g GROUP BY s.g, m.med_x2)
        |SELECT g AS l_linenumber, n_g, med_x2, abs_sum, abs_sumsq,
        |  CAST(n_g * abs_sumsq - abs_sum * abs_sum AS BIGINT) AS var_num
        |FROM t ORDER BY l_linenumber""".stripMargin) { (s, d) =>
      val sF = Tables.lineitem(s, d)
        .groupBy(col("l_linenumber").as("g"),
          (col("l_quantity").cast(DecimalType(12, 2)) * 100)
            .cast(LongType).as("v"))
        .agg(count(lit(1)).cast(LongType).as("c"))
        // the histogram feeds the median selection AND the z rollup —
        // one scan of the fact
        .localCheckpoint()
      val z = sF.select(col("g"), col("v"), col("c"),
        sum("c").over(Window.partitionBy("g").orderBy("v")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .as("cum"),
        sum("c").over(Window.partitionBy("g")).as("n"))
      val m = z.groupBy("g").agg(
        (min(when(lit(2) * col("cum") >= col("n"), col("v")))
          + min(when(lit(2) * col("cum") > col("n"), col("v"))))
          .cast(LongType).as("med_x2"))
      sF.join(broadcast(m), Seq("g"))
        .groupBy("g", "med_x2")
        .agg(sum("c").cast(LongType).as("n_g"),
          sum(col("c") * abs(lit(2) * col("v") - col("med_x2")))
            .cast(LongType).as("abs_sum"),
          sum(col("c") * (lit(2) * col("v") - col("med_x2"))
            * (lit(2) * col("v") - col("med_x2")))
            .cast(LongType).as("abs_sumsq"))
        .selectExpr("g AS l_linenumber", "n_g", "med_x2", "abs_sum",
          "abs_sumsq",
          "CAST(n_g * abs_sumsq - abs_sum * abs_sum AS BIGINT) AS var_num")
        .orderBy("l_linenumber")
    },


    // Cronbach's alpha pieces — internal-consistency reliability over
    // a 4-item instrument (the quantities of lines 1..4 within orders
    // carrying exactly one of each — the Wilcoxon pairing guard
    // widened to a 4-tuple; l_linenumber is NOT unique per order in
    // the fixture, so the exactly-one HAVING keeps the case base
    // deterministic). Emitted long-form via UNION ALL: per item (and
    // for the row total) the complete-case n, sum, sum of squares and
    // the exact variance numerator n*SS - S^2 >= 0 (Cauchy-Schwarz,
    // StressSpec-pinned; the total row's S equals the item S's sum —
    // the additivity law). alpha = k/(k-1) * (1 - SUM var_i/var_t) is
    // caller-side algebra: all five numerators share the same n, so
    // the denominators cancel.
    //
    // Scale shape: one per-order pivot rollup (map-side combinable on
    // the orderkey exchange) feeding a 1-row aggregate; the UNION ALL
    // long format rides five 1-row frames. Sums of squares hold in
    // BIGINT to ~2*10^10 complete cases; loud beyond.
    Q("q_stat_cronbach",
      """WITH p AS (
        |  SELECT l_orderkey,
        |    MAX(CASE WHEN l_linenumber = 1 THEN
        |      CAST(CAST(l_quantity AS DECIMAL(12,2)) * 100 AS BIGINT)
        |      END) AS q1,
        |    MAX(CASE WHEN l_linenumber = 2 THEN
        |      CAST(CAST(l_quantity AS DECIMAL(12,2)) * 100 AS BIGINT)
        |      END) AS q2,
        |    MAX(CASE WHEN l_linenumber = 3 THEN
        |      CAST(CAST(l_quantity AS DECIMAL(12,2)) * 100 AS BIGINT)
        |      END) AS q3,
        |    MAX(CASE WHEN l_linenumber = 4 THEN
        |      CAST(CAST(l_quantity AS DECIMAL(12,2)) * 100 AS BIGINT)
        |      END) AS q4
        |  FROM lineitem WHERE l_linenumber <= 4 GROUP BY l_orderkey
        |  HAVING SUM(CASE WHEN l_linenumber = 1 THEN 1 ELSE 0 END) = 1
        |     AND SUM(CASE WHEN l_linenumber = 2 THEN 1 ELSE 0 END) = 1
        |     AND SUM(CASE WHEN l_linenumber = 3 THEN 1 ELSE 0 END) = 1
        |     AND SUM(CASE WHEN l_linenumber = 4 THEN 1 ELSE 0 END) = 1),
        |a AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(q1) AS BIGINT) AS s1,
        |    CAST(SUM(q1 * q1) AS BIGINT) AS ss1,
        |    CAST(SUM(q2) AS BIGINT) AS s2,
        |    CAST(SUM(q2 * q2) AS BIGINT) AS ss2,
        |    CAST(SUM(q3) AS BIGINT) AS s3,
        |    CAST(SUM(q3 * q3) AS BIGINT) AS ss3,
        |    CAST(SUM(q4) AS BIGINT) AS s4,
        |    CAST(SUM(q4 * q4) AS BIGINT) AS ss4,
        |    CAST(SUM(q1 + q2 + q3 + q4) AS BIGINT) AS st,
        |    CAST(SUM((q1 + q2 + q3 + q4) * (q1 + q2 + q3 + q4)) AS BIGINT)
        |      AS sst
        |  FROM p),
        |u AS (
        |  SELECT 'q1' AS item, n, s1 AS s, ss1 AS ss FROM a
        |  UNION ALL SELECT 'q2', n, s2, ss2 FROM a
        |  UNION ALL SELECT 'q3', n, s3, ss3 FROM a
        |  UNION ALL SELECT 'q4', n, s4, ss4 FROM a
        |  UNION ALL SELECT 'total', n, st, sst FROM a)
        |SELECT item, n, s, ss, CAST(n * ss - s * s AS BIGINT) AS var_num
        |FROM u ORDER BY item""".stripMargin) { (s, d) =>
      def qi(i: Int) = max(when(col("l_linenumber") === i,
        (col("l_quantity").cast(DecimalType(12, 2)) * 100)
          .cast(LongType))).as(s"q$i")
      def ci(i: Int) =
        sum(when(col("l_linenumber") === i, 1L).otherwise(0L)).as(s"c$i")
      val p = Tables.lineitem(s, d).where(col("l_linenumber") <= 4)
        .groupBy("l_orderkey")
        .agg(qi(1), qi(2), qi(3), qi(4), ci(1), ci(2), ci(3), ci(4))
        .where(col("c1") === 1 && col("c2") === 1
          && col("c3") === 1 && col("c4") === 1)
      val a = p.agg(count(lit(1)).cast(LongType).as("n"),
        sum("q1").cast(LongType).as("s1"),
        sum(col("q1") * col("q1")).cast(LongType).as("ss1"),
        sum("q2").cast(LongType).as("s2"),
        sum(col("q2") * col("q2")).cast(LongType).as("ss2"),
        sum("q3").cast(LongType).as("s3"),
        sum(col("q3") * col("q3")).cast(LongType).as("ss3"),
        sum("q4").cast(LongType).as("s4"),
        sum(col("q4") * col("q4")).cast(LongType).as("ss4"),
        sum(col("q1") + col("q2") + col("q3") + col("q4"))
          .cast(LongType).as("st"),
        sum((col("q1") + col("q2") + col("q3") + col("q4"))
          * (col("q1") + col("q2") + col("q3") + col("q4")))
          .cast(LongType).as("sst"))
      a.selectExpr("n",
          "stack(5, 'q1', s1, ss1, 'q2', s2, ss2, 'q3', s3, ss3," +
            " 'q4', s4, ss4, 'total', st, sst) AS (item, s, ss)")
        .selectExpr("item", "n", "s", "ss",
          "CAST(n * ss - s * s AS BIGINT) AS var_num")
        .orderBy("item")
    },

    // Goodman–Kruskal gamma / Somers' D pieces — ordinal×ordinal
    // association on the priority-class × order-status grid (both axes
    // carry a deterministic total order: the priority's leading digit,
    // the status's ASCII order). On the COMPLETED grid each cell's
    // concordant mass (orders strictly higher on BOTH axes) and
    // discordant mass (higher priority class, lower status) come from
    // the Jonckheere dominance machinery: a suffix window within the
    // row, then a suffix-of-that across rows at fixed column. C = Σ
    // o·conc and D = Σ o·disc count each pair exactly once at its
    // lower cell, so gamma = (C−D)/(C+D) and Somers' D variants are
    // caller-side algebra over the emitted exact terms (2·(C+D) ≤
    // N·(N−1) — the pair bound StressSpec pins, plus conc/disc ≥ 0).
    //
    // Scale shape: one map-side-combinable (class, status) count — NO
    // join to the fact; completion and all four dominance windows ride
    // the 15-cell grid. o·mass holds in BIGINT to ~3·10⁹ orders.
    Q("q_stat_gamma",
      """WITH c AS (
        |  SELECT CAST(SUBSTR(o_orderpriority, 1, 1) AS BIGINT) AS g1,
        |    o_orderstatus AS g2, CAST(COUNT(*) AS BIGINT) AS o
        |  FROM orders GROUP BY 1, 2),
        |grid AS (
        |  SELECT aa.g1, bb.g2, COALESCE(c.o, 0) AS o
        |  FROM (SELECT DISTINCT g1 FROM c) aa
        |  CROSS JOIN (SELECT DISTINCT g2 FROM c) bb
        |  LEFT JOIN c ON c.g1 = aa.g1 AND c.g2 = bb.g2),
        |sx AS (
        |  SELECT g1, g2, o,
        |    CAST(COALESCE(SUM(o) OVER (PARTITION BY g1 ORDER BY g2
        |      ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING), 0)
        |      AS BIGINT) AS suf,
        |    CAST(COALESCE(SUM(o) OVER (PARTITION BY g1 ORDER BY g2
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS BIGINT) AS pre
        |  FROM grid),
        |dom AS (
        |  SELECT g1, g2, o,
        |    CAST(COALESCE(SUM(suf) OVER (PARTITION BY g2 ORDER BY g1
        |      ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING), 0)
        |      AS BIGINT) AS conc_mass,
        |    CAST(COALESCE(SUM(pre) OVER (PARTITION BY g2 ORDER BY g1
        |      ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING), 0)
        |      AS BIGINT) AS disc_mass
        |  FROM sx)
        |SELECT g1 AS priority_class, g2 AS o_orderstatus, o AS observed,
        |  conc_mass, disc_mass,
        |  CAST(o * conc_mass AS BIGINT) AS c_term,
        |  CAST(o * disc_mass AS BIGINT) AS d_term
        |FROM dom ORDER BY priority_class, o_orderstatus""".stripMargin) {
      (s, d) =>
      val c = Tables.orders(s, d)
        .groupBy(substring(col("o_orderpriority"), 1, 1).cast(LongType)
            .as("g1"),
          col("o_orderstatus").as("g2"))
        .agg(count(lit(1)).cast(LongType).as("o"))
        .localCheckpoint()
      val grid = c.select("g1").distinct()
        .crossJoin(c.select("g2").distinct())
        .join(c, Seq("g1", "g2"), "left")
        .select(col("g1"), col("g2"), coalesce(col("o"), lit(0L)).as("o"))
      val wRow = Window.partitionBy("g1").orderBy("g2")
      val sx = grid.select(col("g1"), col("g2"), col("o"),
        coalesce(sum("o").over(wRow
          .rowsBetween(1, Window.unboundedFollowing)), lit(0L))
          .cast(LongType).as("suf"),
        coalesce(sum("o").over(wRow
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L))
          .cast(LongType).as("pre"))
      val wCol = Window.partitionBy("g2").orderBy("g1")
        .rowsBetween(1, Window.unboundedFollowing)
      sx.select(col("g1"), col("g2"), col("o"),
          coalesce(sum("suf").over(wCol), lit(0L)).cast(LongType)
            .as("conc_mass"),
          coalesce(sum("pre").over(wCol), lit(0L)).cast(LongType)
            .as("disc_mass"))
        .selectExpr("g1 AS priority_class", "g2 AS o_orderstatus",
          "o AS observed", "conc_mass", "disc_mass",
          "CAST(o * conc_mass AS BIGINT) AS c_term",
          "CAST(o * disc_mass AS BIGINT) AS d_term")
        .orderBy("priority_class", "o_orderstatus")
    },

    // Weighted Cohen's kappa pieces — ordinal inter-rater agreement
    // with quadratic distance penalties (the instrument-validation
    // statistic q_stat_kappa's binary form can't express): two
    // document "raters" classify every doc into 3 ordinal classes
    // (char-length cuts 250/400, token-count cuts 45/75 — fixed
    // thresholds, non-degenerate at every gated sf), the 3×3 grid is
    // COMPLETED (an absent cell still contributes w·r·c to the
    // expected-disagreement mass), and per cell the exact pieces are
    // w = (a−b)², wo_term = w·o and wrc_term = w·r_tot·c_tot. The
    // statistic is one exact integer ratio caller-side:
    // κ_w = 1 − N·Σwo / Σwrc. Diagonal weights are zero and the o
    // margins telescope (StressSpec pins both).
    //
    // Scale shape: one map-side-combinable (a, b) count — NO join to
    // the fact; completion and margin windows ride the 9-cell grid.
    // w·r·c holds in BIGINT to ~10⁹ docs; loud beyond.
    Q("q_stat_kappaw",
      """WITH cls AS (
        |  SELECT CASE WHEN n_chars < 250 THEN 1
        |           WHEN n_chars < 400 THEN 2 ELSE 3 END AS a,
        |    CASE WHEN len(string_split(text, ' ')) < 45 THEN 1
        |         WHEN len(string_split(text, ' ')) < 75 THEN 2
        |         ELSE 3 END AS b
        |  FROM documents),
        |c AS (
        |  SELECT a, b, CAST(COUNT(*) AS BIGINT) AS o
        |  FROM cls GROUP BY a, b),
        |grid AS (
        |  SELECT aa.a, bb.b, COALESCE(c.o, 0) AS o
        |  FROM (VALUES (1),(2),(3)) AS aa(a)
        |  CROSS JOIN (VALUES (1),(2),(3)) AS bb(b)
        |  LEFT JOIN c ON c.a = aa.a AND c.b = bb.b),
        |w AS (
        |  SELECT a, b, o,
        |    CAST(SUM(o) OVER (PARTITION BY a) AS BIGINT) AS r_tot,
        |    CAST(SUM(o) OVER (PARTITION BY b) AS BIGINT) AS c_tot,
        |    CAST(SUM(o) OVER () AS BIGINT) AS n
        |  FROM grid)
        |SELECT CAST(a AS BIGINT) AS class_chars,
        |  CAST(b AS BIGINT) AS class_tokens,
        |  o AS observed, r_tot, c_tot, n,
        |  CAST((a - b) * (a - b) AS BIGINT) AS wgt,
        |  CAST((a - b) * (a - b) * o AS BIGINT) AS wo_term,
        |  CAST((a - b) * (a - b) * r_tot * c_tot AS BIGINT) AS wrc_term
        |FROM w ORDER BY class_chars, class_tokens""".stripMargin) {
      (s, d) =>
      import s.implicits._
      val cls = Tables.documents(s, d).select(
        when(col("n_chars") < 250, 1L).when(col("n_chars") < 400, 2L)
          .otherwise(3L).as("a"),
        when(size(split(col("text"), " ")) < 45, 1L)
          .when(size(split(col("text"), " ")) < 75, 2L)
          .otherwise(3L).as("b"))
      val c = cls.groupBy("a", "b")
        .agg(count(lit(1)).cast(LongType).as("o"))
      val grid = broadcast(Seq(1L, 2L, 3L).toDF("a"))
        .crossJoin(broadcast(Seq(1L, 2L, 3L).toDF("b")))
        .join(c, Seq("a", "b"), "left")
        .select(col("a"), col("b"), coalesce(col("o"), lit(0L)).as("o"))
      val w = grid.select(col("a"), col("b"), col("o"),
        sum("o").over(Window.partitionBy("a")).cast(LongType).as("r_tot"),
        sum("o").over(Window.partitionBy("b")).cast(LongType).as("c_tot"),
        sum("o").over(Window.partitionBy()).cast(LongType).as("n"))
      w.selectExpr("CAST(a AS BIGINT) AS class_chars",
          "CAST(b AS BIGINT) AS class_tokens",
          "o AS observed", "r_tot", "c_tot", "n",
          "CAST((a - b) * (a - b) AS BIGINT) AS wgt",
          "CAST((a - b) * (a - b) * o AS BIGINT) AS wo_term",
          "CAST((a - b) * (a - b) * r_tot * c_tot AS BIGINT) AS wrc_term")
        .orderBy("class_chars", "class_tokens")
    },

    // Cramer-von Mises profile pieces -- the whole-distribution
    // two-sample comparison q_stat_ks's max-deviation collapses: per
    // support cell the exact scaled ECDF gap dev_num = n2*cum1 -
    // n1*cum2 (positive where returned items run ahead in quantity
    // mass), weighted by the pooled cell count. T = Sum c*dev^2 /
    // (n1*n2*(n1+n2)) is caller-side algebra over the emitted profile
    // -- dev^2 would overflow BIGINT at sf>=0.1, the pieces never do.
    // The gap telescopes to EXACTLY zero at the top cell (both ECDFs
    // reach 1 -- StressSpec pins it, plus pooled-mass conservation).
    //
    // Scale shape: the q_stat_ks contract -- ONE map-side-combinable
    // value-histogram exchange; the cum windows and the 50-cell
    // profile ride the ndv-bounded support. dev_num holds in BIGINT
    // to ~3*10^9 rows per side; loud beyond.
    Q("q_stat_cvm",
      """WITH s AS (
        |  SELECT CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS grp,
        |    CAST(CAST(l_quantity AS DECIMAL(12,2)) * 100 AS BIGINT) AS v
        |  FROM lineitem),
        |h AS (
        |  SELECT v,
        |    CAST(SUM(grp) AS BIGINT) AS c1,
        |    CAST(SUM(1 - grp) AS BIGINT) AS c2,
        |    CAST(COUNT(*) AS BIGINT) AS c
        |  FROM s GROUP BY v),
        |z AS (
        |  SELECT v, c,
        |    CAST(SUM(c1) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)
        |      AS BIGINT) AS cum1,
        |    CAST(SUM(c2) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)
        |      AS BIGINT) AS cum2,
        |    CAST(SUM(c1) OVER () AS BIGINT) AS n1,
        |    CAST(SUM(c2) OVER () AS BIGINT) AS n2
        |  FROM h)
        |SELECT v, c, cum1, cum2, n1, n2,
        |  CAST(n2 * cum1 - n1 * cum2 AS BIGINT) AS dev_num
        |FROM z ORDER BY v""".stripMargin) { (s, d) =>
      val h = Tables.lineitem(s, d)
        .select(when(col("l_returnflag") === "R", 1L).otherwise(0L)
            .as("grp"),
          (col("l_quantity").cast(DecimalType(12, 2)) * 100)
            .cast(LongType).as("v"))
        .groupBy("v")
        .agg(sum("grp").cast(LongType).as("c1"),
          sum(lit(1L) - col("grp")).cast(LongType).as("c2"),
          count(lit(1)).cast(LongType).as("c"))
      val wCum = Window.orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wAll = Window.partitionBy()
      h.select(col("v"), col("c"),
          sum("c1").over(wCum).cast(LongType).as("cum1"),
          sum("c2").over(wCum).cast(LongType).as("cum2"),
          sum("c1").over(wAll).cast(LongType).as("n1"),
          sum("c2").over(wAll).cast(LongType).as("n2"))
        .selectExpr("v", "c", "cum1", "cum2", "n1", "n2",
          "CAST(n2 * cum1 - n1 * cum2 AS BIGINT) AS dev_num")
        .orderBy("v")
    }
  )
}
