package graft.queries

import graft.core.{Q, Tables}
import org.apache.spark.sql.functions._

/** Data-governance audits (SURVEY §2 extension, round 11): the
  * re-identification-risk reports a privacy office runs before a table —
  * or a training corpus — leaves the building. Both queries are pure
  * relational aggregation (no UDFs, no sampling), so they run as one
  * map-combinable pass over the fact table at any scale.
  *
  * Scale story: the only row-scale exchange is the quasi-identifier
  * groupBy (partial+final HashAggregate — the QI domain, nations ×
  * segments × balance bands, is orders of magnitude smaller than the
  * rows, so the map side collapses almost everything); the k/l histogram
  * rollup that follows runs on the QI-group frame, which is
  * domain-bounded, not row-bounded. No window touches raw rows.
  */
object GovernanceQueries {

  /** Balance band = $1000-wide truncating bucket of the exact cents value.
    * Integer-only: cents = CAST(DECIMAL(12,2)·100 AS BIGINT) (exact — the
    * fixture money columns carry ≤2 true decimals), then trunc-division
    * expressed as (b − b % 100000)/100000 so both engines truncate toward
    * zero identically (`%` follows the dividend sign in both; the `/` is
    * IEEE double on an exactly-divisible pair, so the quotient is exact).
    */
  private def centsCol = (col("c_acctbal").cast("decimal(12,2)") * 100)
    .cast("long")
  private def bandCol = ((col("b") - col("b") % 100000L) / 100000L)
    .cast("long")

  val all: Seq[Q] = Seq(
    // k-anonymity census: bucket every customer by the quasi-identifier
    // triple (nation, market segment, $1000 balance band) and report how
    // much of the table sits in groups of size k=1 (unique ⇒ directly
    // re-identifiable), 2–4, 5–9, and ≥10 — the k-anonymity report in
    // its standard presentation (Sweeney 2002, public literature).
    //
    // Scale shape: one QI-keyed partial+final aggregate over customer
    // (the sole row-scale exchange), then a ≤4-row band rollup over the
    // QI-group frame. Counts are LONGs — exact to 9·10¹⁸ rows.
    Q("q_privacy_kanon",
      """WITH q AS (
        |  SELECT c_nationkey AS nk, c_mktsegment AS seg,
        |    CAST((b - b % 100000) / 100000 AS BIGINT) AS band
        |  FROM (SELECT c_nationkey, c_mktsegment,
        |          CAST(CAST(c_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT) AS b
        |        FROM customer) t),
        |g AS (
        |  SELECT nk, seg, band, COUNT(*) AS k
        |  FROM q GROUP BY nk, seg, band)
        |SELECT
        |  CASE WHEN k = 1 THEN 'k=1_unique'
        |       WHEN k < 5 THEN 'k=2_4'
        |       WHEN k < 10 THEN 'k=5_9'
        |       ELSE 'k_ge_10' END AS k_band,
        |  CAST(COUNT(*) AS BIGINT) AS n_groups,
        |  CAST(SUM(k) AS BIGINT) AS n_rows,
        |  CAST(MIN(k) AS BIGINT) AS min_k,
        |  CAST(MAX(k) AS BIGINT) AS max_k
        |FROM g GROUP BY 1 ORDER BY k_band""".stripMargin) { (s, d) =>
      val q = Tables.customer(s, d)
        .select(col("c_nationkey").as("nk"), col("c_mktsegment").as("seg"),
          centsCol.as("b"))
        .select(col("nk"), col("seg"), bandCol.as("band"))
      val g = graft.operators.PrivacyAudit
        .groupSizes(q, Seq("nk", "seg", "band"))
      g.groupBy(
          when(col("k") === 1, "k=1_unique")
            .when(col("k") < 5, "k=2_4")
            .when(col("k") < 10, "k=5_9")
            .otherwise("k_ge_10").as("k_band"))
        .agg(count(lit(1)).cast("long").as("n_groups"),
          sum(col("k")).cast("long").as("n_rows"),
          min(col("k")).cast("long").as("min_k"),
          max(col("k")).cast("long").as("max_k"))
        .orderBy("k_band")
    },

    // l-diversity audit: with the SENSITIVE attribute (market segment)
    // dropped from the quasi-identifier, how many distinct sensitive
    // values does each (nation, balance band) group carry? Groups with
    // l=1 are homogeneous — k-anonymity alone does not stop attribute
    // disclosure there (Machanavajjhala 2007, public literature). Output
    // is the l histogram: for each diversity level, the group count, row
    // count, and the k range of those groups.
    //
    // Scale shape: the COUNT(DISTINCT seg) rides Spark's two-phase
    // expand on the same QI exchange (sensitive domain is 5 values, so
    // the expanded frame is ≤5× the group frame, still domain-bounded);
    // the histogram rollup is ≤5 rows.
    Q("q_privacy_ldiversity",
      """WITH q AS (
        |  SELECT c_nationkey AS nk,
        |    CAST((b - b % 100000) / 100000 AS BIGINT) AS band,
        |    c_mktsegment AS seg
        |  FROM (SELECT c_nationkey, c_mktsegment,
        |          CAST(CAST(c_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT) AS b
        |        FROM customer) t),
        |g AS (
        |  SELECT nk, band, COUNT(*) AS k, COUNT(DISTINCT seg) AS l
        |  FROM q GROUP BY nk, band)
        |SELECT CAST(l AS BIGINT) AS l_div,
        |  CAST(COUNT(*) AS BIGINT) AS n_groups,
        |  CAST(SUM(k) AS BIGINT) AS n_rows,
        |  CAST(MIN(k) AS BIGINT) AS min_k,
        |  CAST(MAX(k) AS BIGINT) AS max_k
        |FROM g GROUP BY l ORDER BY l_div""".stripMargin) { (s, d) =>
      val q = Tables.customer(s, d)
        .select(col("c_nationkey").as("nk"), col("c_mktsegment").as("seg"),
          centsCol.as("b"))
        .select(col("nk"), bandCol.as("band"), col("seg"))
      val g = graft.operators.PrivacyAudit
        .groupDiversity(q, Seq("nk", "band"), "seg")
      g.groupBy(col("l").cast("long").as("l_div"))
        .agg(count(lit(1)).cast("long").as("n_groups"),
          sum(col("k")).cast("long").as("n_rows"),
          min(col("k")).cast("long").as("min_k"),
          max(col("k")).cast("long").as("max_k"))
        .orderBy("l_div")
    },

    // t-closeness audit (Li et al. 2007) — the third leg of the privacy
    // family: per (nation, segment) QI group, how far the group's
    // balance-band distribution sits from the global one, by the
    // ordered-attribute Earth-Mover's Distance. EMD over an ordered
    // support is the sum of |cumulative differences|; scaled through
    // n·k_g it is the EXACT integer t_num = Σ_band |n·cumg − k_g·cum|
    // against t_den = n·k_g·(B−1), with t = the one-divide double.
    // Groups are completed against the full band spine (missing bands
    // still carry cumulative mass — dropping them undercounts EMD).
    //
    // Scale shape: the (QI, band) cell aggregate is the one row-scale
    // exchange; the global band histogram, the QI×band grid completion
    // and every window ride domain-bounded frames (≤125·11 cells).
    // Products n·cumg stay < 2⁵³ to ~10⁸ rows; loud beyond.
    Q("q_privacy_tcloseness",
      """WITH q AS (
        |  SELECT c_nationkey AS nk, c_mktsegment AS seg,
        |    CAST(CAST(c_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT)
        |      AS cents
        |  FROM customer),
        |cell AS (
        |  SELECT nk, seg,
        |    CAST((cents - cents % 100000) / 100000 AS BIGINT) AS band,
        |    CAST(COUNT(*) AS BIGINT) AS cb
        |  FROM q GROUP BY 1, 2, 3),
        |gb AS (
        |  SELECT band, SUM(cb) AS nb FROM cell GROUP BY band),
        |g2 AS (
        |  SELECT band, SUM(nb) OVER (ORDER BY band) AS cum,
        |    SUM(nb) OVER () AS n, COUNT(*) OVER () AS nbands
        |  FROM gb),
        |grid AS (
        |  SELECT gs.nk, gs.seg, g2.band, g2.cum, g2.n, g2.nbands,
        |    COALESCE(cell.cb, 0) AS cb
        |  FROM (SELECT DISTINCT nk, seg FROM cell) gs
        |  CROSS JOIN g2
        |  LEFT JOIN cell ON cell.nk = gs.nk AND cell.seg = gs.seg
        |    AND cell.band = g2.band),
        |w AS (
        |  SELECT nk, seg, cum, n, nbands, cb,
        |    SUM(cb) OVER (PARTITION BY nk, seg ORDER BY band) AS cumg,
        |    SUM(cb) OVER (PARTITION BY nk, seg) AS kg
        |  FROM grid)
        |SELECT nk AS c_nationkey, seg AS c_mktsegment,
        |  CAST(MAX(kg) AS BIGINT) AS k,
        |  CAST(SUM(ABS(n * cumg - kg * cum)) AS BIGINT) AS t_num,
        |  CAST(MAX(n * kg * (nbands - 1)) AS BIGINT) AS t_den,
        |  CAST(SUM(ABS(n * cumg - kg * cum)) AS DOUBLE)
        |    / CAST(MAX(n * kg * (nbands - 1)) AS DOUBLE) AS t_closeness
        |FROM w GROUP BY nk, seg
        |ORDER BY c_nationkey, c_mktsegment""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val cell = Tables.customer(s, d)
        .select(col("c_nationkey").as("nk"), col("c_mktsegment").as("seg"),
          (col("c_acctbal").cast("decimal(12,2)") * 100).cast("long")
            .as("cents"))
        .groupBy(col("nk"), col("seg"),
          ((col("cents") - col("cents") % 100000) / 100000).cast("long")
            .as("band"))
        .agg(count(lit(1)).cast("long").as("cb"))
        // the global histogram, the grid spine and the grid join all
        // consume this frame — one scan
        .localCheckpoint()
      val g2 = cell.groupBy("band").agg(sum("cb").as("nb"))
        .select(col("band"),
          sum("nb").over(Window.orderBy("band")
            .rowsBetween(Window.unboundedPreceding, 0)).as("cum"),
          sum("nb").over(Window.partitionBy()).as("n"),
          count(lit(1)).over(Window.partitionBy()).as("nbands"))
      val grid = cell.select("nk", "seg").distinct()
        .crossJoin(g2)
        .join(cell, Seq("nk", "seg", "band"), "left")
        .select(col("nk"), col("seg"), col("band"), col("cum"), col("n"),
          col("nbands"), coalesce(col("cb"), lit(0L)).as("cb"))
      val wg = Window.partitionBy("nk", "seg")
      grid.select(col("nk"), col("seg"), col("cum"), col("n"),
          col("nbands"), col("cb"),
          sum("cb").over(wg.orderBy("band")
            .rowsBetween(Window.unboundedPreceding, 0)).as("cumg"),
          sum("cb").over(wg).as("kg"))
        .groupBy("nk", "seg")
        .agg(expr("CAST(MAX(kg) AS BIGINT) AS k"),
          expr("CAST(SUM(ABS(n * cumg - kg * cum)) AS BIGINT) AS t_num"),
          expr("CAST(MAX(n * kg * (nbands - 1)) AS BIGINT) AS t_den"),
          expr("CAST(SUM(ABS(n * cumg - kg * cum)) AS DOUBLE)" +
            " / CAST(MAX(n * kg * (nbands - 1)) AS DOUBLE)" +
            " AS t_closeness"))
        .select(col("nk").as("c_nationkey"), col("seg").as("c_mktsegment"),
          col("k"), col("t_num"), col("t_den"), col("t_closeness"))
        .orderBy("c_nationkey", "c_mktsegment")
    },

    // Differential-privacy sensitivity census -- the clipping-budget
    // prep every DP release needs BEFORE noise is chosen: per event
    // type, the exact L-infinity user contribution (the count query's
    // sensitivity under user-level adjacency) and the mass a clip at
    // 8 events/user would discard. A release mechanism is caller
    // policy; the emitted pieces are exact integers so both engines
    // agree bit-for-bit (max_user_contrib <= n_events and clip loss
    // bounded by the unclipped excess -- StressSpec pins both).
    //
    // Scale shape: the (type, user) rollup is the one row-scale
    // exchange (map-side combinable); the per-type census rides the
    // bounded type frame.
    Q("q_privacy_sensitivity",
      """WITH ub AS (
        |  SELECT event_type, user_id, CAST(COUNT(*) AS BIGINT) AS c
        |  FROM events GROUP BY 1, 2)
        |SELECT event_type,
        |  CAST(SUM(c) AS BIGINT) AS n_events,
        |  CAST(COUNT(*) AS BIGINT) AS n_users,
        |  CAST(MAX(c) AS BIGINT) AS max_user_contrib,
        |  CAST(SUM(CASE WHEN c > 8 THEN c - 8 ELSE 0 END) AS BIGINT)
        |    AS clip_loss_at_8
        |FROM ub GROUP BY event_type ORDER BY event_type""".stripMargin) {
      (s, d) =>
      val ub = Tables.events(s, d)
        .groupBy("event_type", "user_id")
        .agg(count(lit(1)).cast("long").as("c"))
      ub.groupBy("event_type")
        .agg(sum("c").cast("long").as("n_events"),
          count(lit(1)).cast("long").as("n_users"),
          max("c").cast("long").as("max_user_contrib"),
          sum(when(col("c") > 8, col("c") - 8).otherwise(0L))
            .cast("long").as("clip_loss_at_8"))
        .orderBy("event_type")
    },

    // Clipped aggregation -- the EXACT half of the DP release mechanism
    // q_privacy_sensitivity prepared for: each user's contribution to a
    // per-type count capped at 8 (so the count query's L1 sensitivity
    // is exactly 8), with the raw total, unit census, and discarded
    // mass alongside. The seeded-noise half is cap_privacy_release
    // (ScalaTest-gated -- ln() is not cross-engine bit-stable; the clip
    // is, so it carries the oracle). Scale shape: the (type, user)
    // rollup is the one row-scale map-side-combinable exchange; the
    // per-type census rides the bounded type frame.
    Q("q_privacy_clipped",
      """WITH ub AS (
        |  SELECT event_type, user_id, CAST(COUNT(*) AS BIGINT) AS c
        |  FROM events GROUP BY 1, 2)
        |SELECT event_type,
        |  CAST(SUM(LEAST(c, 8)) AS BIGINT) AS clipped_count,
        |  CAST(SUM(c) AS BIGINT) AS raw_count,
        |  CAST(COUNT(*) AS BIGINT) AS n_units,
        |  CAST(SUM(c) - SUM(LEAST(c, 8)) AS BIGINT) AS clip_loss
        |FROM ub GROUP BY event_type ORDER BY event_type""".stripMargin) {
      (s, d) =>
      graft.operators.DpRelease.clippedCounts(
          Tables.events(s, d), "event_type", "user_id", cap = 8L)
        .orderBy("event_type")
    },

    // The ε-DP count release on top of the clip: Laplace(8/ε) noise
    // drawn from a DETERMINISTIC md5-seeded uniform per group -- the
    // release is reproducible and auditable (same seed ⇒ same noise,
    // exact 1/ε scaling; DpSpec pins determinism, scaling, sign
    // balance and the E|noise| ≈ b distribution band). Capability-only
    // because ln() is libm-dependent across engines; the mechanism's
    // exact stage is q_privacy_clipped above.
    Q.cap("cap_privacy_release") { (s, d) =>
      val clipped = graft.operators.DpRelease.clippedCounts(
        Tables.events(s, d), "event_type", "user_id", cap = 8L)
      graft.operators.DpRelease.release(
          clipped, "event_type", epsilon = 1.0, seed = "graft-r12", cap = 8L)
        .orderBy("event_type")
    }
  )
}
