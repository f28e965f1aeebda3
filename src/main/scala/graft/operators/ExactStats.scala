package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Exact nonparametric statistics over integer-quantized values — no
  * floats, no division: each statistic is emitted as an integer numerator
  * against a closed-form denominator, so results are bitwise-reproducible
  * across engines, partitionings and scales (SURVEY Appendix A).
  *
  * Both ops share one scale shape: the only row-scale work is a map-side-
  * combinable histogram over (group, value); every window/rollup after it
  * runs on the quantized support, which is metadata-sized whenever the
  * value domain is bounded (prices in cents, quantities, scores).
  */
object ExactStats {

  /** Two-sample Kolmogorov–Smirnov numerator per group.
    *
    * Input columns: `group`; `value` (integral — quantize floats to cents
    * first); `isFirst` (1 = sample 1, 0 = sample 2). Output per group:
    * (group, n1, n2, ks_num) with D = ks_num / (n1·n2) — the caller keeps
    * the exact rational. LONG products hold to ~3·10⁹ rows per sample;
    * beyond that widen cum/n to DECIMAL(38,0).
    */
  def ksNumerator(df: DataFrame, group: String, value: String,
      isFirst: String): DataFrame = {
    val h = df.groupBy(col(group).as("__g"), col(value).as("__v"))
      .agg(sum(col(isFirst)).as("c1"),
        (count(lit(1)) - sum(col(isFirst))).as("c2"))
    // __v is unique within __g after the groupBy, so ROWS ≡ RANGE
    val wCum = Window.partitionBy("__g").orderBy("__v")
      .rowsBetween(Window.unboundedPreceding, 0)
    val wAll = Window.partitionBy("__g")
    h.select(col("__g"),
        sum(col("c1")).over(wCum).as("cum1"),
        sum(col("c2")).over(wCum).as("cum2"),
        sum(col("c1")).over(wAll).as("n1"),
        sum(col("c2")).over(wAll).as("n2"))
      .groupBy("__g")
      .agg(max(col("n1")).cast(LongType).as("n1"),
        max(col("n2")).cast(LongType).as("n2"),
        max(abs(col("n2") * col("cum1") - col("n1") * col("cum2")))
          .cast(LongType).as("ks_num"))
      .select(col("__g").as(group), col("n1"), col("n2"), col("ks_num"))
  }

  /** Exact ROC-AUC of an integral score against a 0/1 label, as the
    * fraction (auc_num_x2, auc_den) — AUC = U/(n⁺n⁻) with midrank ties,
    * doubled to stay integral. One row out: (n_pos, n_neg, auc_num_x2,
    * auc_den). The global ORDER BY window runs over the quantized score
    * support (bounded domain ⇒ metadata-sized at any corpus size); rank
    * products accumulate in DECIMAL(25,0) (a LONG caps near 2·10⁹ rows).
    */
  def aucExact(df: DataFrame, score: String, pos: String): DataFrame = {
    val h = df.groupBy(col(score).as("__v"))
      .agg(sum(col(pos)).as("cp"), count(lit(1)).as("c"))
    val w = Window.orderBy("__v")
      .rowsBetween(Window.unboundedPreceding, -1)
    h.withColumn("cum", coalesce(sum(col("c")).over(w), lit(0L)))
      .agg(sum(col("cp")).as("np"),
        sum(col("c") - col("cp")).as("nn"),
        sum((col("cp") * (lit(2) * col("cum") + col("c") + 1))
          .cast("decimal(25,0)")).as("r1x2"))
      .select(col("np").cast(LongType).as("n_pos"),
        col("nn").cast(LongType).as("n_neg"),
        (col("r1x2") - col("np").cast("decimal(19,0)")
          * (col("np") + 1).cast("decimal(19,0)"))
          .cast(LongType).as("auc_num_x2"),
        (col("np") * col("nn") * 2).cast(LongType).as("auc_den"))
  }

  /** Offline CUSUM changepoint scan over a PRE-AGGREGATED series (one
    * row per `order` bucket — day counts, hourly sums): the cumulative
    * deviation from the series mean kept EXACT by scaling through the
    * series length, CUSUM_k = Σ_{i≤k}(n·x_i − T) = n·cum_k − T·k, with
    * the max-|CUSUM| row flagged. Output: (order, value, cusum, is_peak).
    *
    * The input must already be bucket-aggregated (calendar-bounded): the
    * global windows here run single-partition BY DESIGN over that spine,
    * never over raw rows (the q_time_changepoint shape). n·cum stays
    * exact in LONG to ~10¹⁴ total value over a 10⁴-row spine; ANSI
    * overflow is loud beyond. */
  def cusumScaled(series: DataFrame, order: String,
      value: String): DataFrame = {
    val spine = Window.orderBy(order)
    val glob = Window.partitionBy()
    series.select(col(order), col(value),
        count(lit(1)).over(glob).cast(LongType).as("__n"),
        sum(col(value)).over(glob).cast(LongType).as("__t"),
        sum(col(value)).over(
          spine.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast(LongType).as("__cum"),
        row_number().over(spine).cast(LongType).as("__i"))
      .select(col(order), col(value),
        (col("__n") * col("__cum") - col("__t") * col("__i")).as("cusum"))
      .select(col(order), col(value), col("cusum"),
        when(abs(col("cusum")) === max(abs(col("cusum")))
          .over(Window.partitionBy()), 1L).otherwise(0L).as("is_peak"))
  }

  /** First-occurrence novelty share over an (owner, item) pair frame
    * (pairs must be distinct per owner): for each owner, the fraction of
    * its items whose global first owner (MIN over the item partition) is
    * itself. Output: (owner, n_items, n_novel, novelty_share). The
    * q_text_novelty shape: one item-partitioned window + one owner
    * rollup — both exchanges carry ≤ the distinct pair count, linear in
    * the input at any scale. */
  def firstOccurrenceShare(pairs: DataFrame, owner: String,
      item: String): DataFrame =
    pairs
      .withColumn("__first",
        min(col(owner)).over(Window.partitionBy(item)))
      .groupBy(owner)
      .agg(count(lit(1)).cast(LongType).as("n_items"),
        sum(when(col("__first") === col(owner), 1L).otherwise(0L))
          .cast(LongType).as("n_novel"))
      .select(col(owner), col("n_items"), col("n_novel"),
        (col("n_novel").cast("double") / col("n_items").cast("double"))
          .as("novelty_share"))

  /** Two-proportion z² A/B test over unit-level (variant, success) 0/1
    * flags — the experiment-dashboard primitive. With d = x1·n2 − x2·n1,
    * pooled X = x1+x2 and N = n1+n2, the squared z statistic is the
    * exact integer rational
    *   z² = d²·N / (n1·n2·X·(N−X))
    * (algebraically the 2×2 chi-square), emitted as (z2_num, z2_den)
    * BIGINTs plus the one-divide double — identical IEEE ops on exactly-
    * converted (<2⁵³) integers are bit-identical cross-engine. Products
    * run in DECIMAL(38,0); the BIGINT casts overflow LOUDLY under ANSI
    * past ~10⁶ conversions per arm (d²·N ≤ 9·10¹⁸) — emit the pieces
    * unsquared to go further. One conditional-sum aggregate: map-side
    * combinable, no window, no join — one row of counters at any corpus
    * size (and streaming-legal as-is: see StreamOps.abTestStream). */
  def twoProportion(df: DataFrame, variant: String,
      success: String): DataFrame =
    df.agg(
        sum(col(variant)).cast(LongType).as("n1"),
        sum(col(variant) * col(success)).cast(LongType).as("x1"),
        (count(lit(1)) - sum(col(variant))).cast(LongType).as("n2"),
        (sum(col(success)) - sum(col(variant) * col(success)))
          .cast(LongType).as("x2"))
      .selectExpr("n1", "x1", "n2", "x2",
        "CAST(x1 AS DECIMAL(38,0)) * n2 - CAST(x2 AS DECIMAL(38,0)) * n1 AS d")
      .selectExpr("n1", "x1", "n2", "x2",
        "CAST(d * d * (n1 + n2) AS BIGINT) AS z2_num",
        "CAST(CAST(n1 AS DECIMAL(38,0)) * n2 * (x1 + x2) " +
          "* (n1 + n2 - x1 - x2) AS BIGINT) AS z2_den")
      .selectExpr("n1", "x1", "n2", "x2", "z2_num", "z2_den",
        // degenerate experiments (one arm empty, 0% or 100% pooled
        // conversion) have no z² — NULL, identically in both engines
        // (DuckDB would emit inf, Spark ANSI would throw)
        "CASE WHEN z2_den = 0 THEN NULL " +
          "ELSE CAST(z2_num AS DOUBLE) / CAST(z2_den AS DOUBLE) END AS z2")

  /** Binary-classifier confusion report over unit-level (pred, actual)
    * 0/1 flags: the 2×2 matrix as exact LONG counts plus
    * precision/recall/F1 (single divides; F1 = 2TP/(2TP+FP+FN) — one
    * divide, not a mean of means) and the Matthews-correlation pieces
    * (mcc_num = TP·TN − FP·FN against the four-margin product
    * denominator, squared to avoid the sqrt; caller keeps the exact
    * rational). Products hold in LONG to ~3·10⁹ units per cell pair,
    * loud beyond. ONE conditional-sum aggregate: map-side combinable —
    * and streaming-legal as-is (StreamOps.confusionStream reuses it
    * verbatim; state is one row of four counters at any corpus size). */
  def confusion(df: DataFrame, pred: String, actual: String): DataFrame =
    df.agg(
        sum(col(pred) * col(actual)).cast(LongType).as("tp"),
        sum(col(pred) * (lit(1) - col(actual))).cast(LongType).as("fp"),
        sum((lit(1) - col(pred)) * col(actual)).cast(LongType).as("fn"),
        sum((lit(1) - col(pred)) * (lit(1) - col(actual)))
          .cast(LongType).as("tn"))
      .selectExpr("tp", "fp", "fn", "tn",
        "CASE WHEN tp + fp = 0 THEN NULL ELSE CAST(tp AS DOUBLE)" +
          " / CAST(tp + fp AS DOUBLE) END AS precision_",
        "CASE WHEN tp + fn = 0 THEN NULL ELSE CAST(tp AS DOUBLE)" +
          " / CAST(tp + fn AS DOUBLE) END AS recall_",
        "CASE WHEN 2 * tp + fp + fn = 0 THEN NULL" +
          " ELSE CAST(2 * tp AS DOUBLE)" +
          " / CAST(2 * tp + fp + fn AS DOUBLE) END AS f1",
        "CAST(tp * tn - fp * fn AS BIGINT) AS mcc_num",
        "CAST((tp + fp) * (tp + fn) AS BIGINT) AS mcc_den_a",
        "CAST((tn + fp) * (tn + fn) AS BIGINT) AS mcc_den_b")

  /** Score-calibration bands over unit-level (score, pos) rows with an
    * INTEGRAL score (quantize to cents upstream): fixed-width bands
    * (trunc-division via the exactly-divisible `/` — IEEE-exact both
    * engines), per band the count, positives, average score and observed
    * positive rate (single IEEE divides on exact sums). ONE map-side-
    * combinable aggregate over a value-domain-bounded band spine — and
    * streaming-legal as-is (StreamOps.calibrationStream reuses this
    * verbatim; state = one counter row per band). */
  def calibration(df: DataFrame, score: String, pos: String,
      bandWidth: Long): DataFrame =
    df.groupBy(((col(score) - col(score) % bandWidth) / bandWidth)
        .cast(LongType).as("band"))
      .agg(count(lit(1)).cast(LongType).as("n"),
        sum(col(pos)).cast(LongType).as("n_pos"),
        sum(col(score)).cast(LongType).as("sum_score"))
      .selectExpr("band", "n", "n_pos",
        "CAST(sum_score AS DOUBLE) / CAST(n AS DOUBLE) AS avg_score",
        "CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE) AS pos_rate")

  /** Per-arm CUPED pieces over unit-level (arm, x, y) rows with INTEGRAL
    * x (pre-period covariate) and y (experiment metric), both quantized
    * to cents upstream: one conditional-sum aggregate emitting
    * (arm, n_a, sx_a, sy_a, sxx_a, sxy_a) — counts and sums exact LONGs,
    * cross-moments exact DECIMAL(38,0) (x² overflows a LONG after ONE
    * row at cent scale). A single groupBy is streaming-legal as-is
    * (StreamOps.cupedStream reuses this verbatim; state = one counter
    * row per arm at any corpus size). */
  def cupedArms(df: DataFrame, arm: String, x: String,
      y: String): DataFrame =
    df.groupBy(col(arm).as("__arm"))
      .agg(count(lit(1)).cast(LongType).as("n_a"),
        sum(col(x)).cast(LongType).as("sx_a"),
        sum(col(y)).cast(LongType).as("sy_a"),
        sum(col(x).cast("decimal(38,0)") * col(x)).as("sxx_a"),
        sum(col(x).cast("decimal(38,0)") * col(y)).as("sxy_a"))
      .withColumnRenamed("__arm", arm)

  /** CUPED variance-reduced A/B readout (Deng et al. 2013, public
    * literature): per arm the raw mean and the adjusted mean
    * ȳ_a − θ·(x̄_a − x̄) with θ = Cov(x,y)/Var(x) POOLED across arms.
    * θ is exact-truncated to micros via DECIMAL(38,0) `div` (the
    * spearman/chi2 integer-division design — scale-0 decimals never
    * round, only overflow loudly; exact while n·Σxy < 10³² i.e. ~10¹²
    * unit-cents²-rows); the adjusted mean is then a FIXED IEEE double
    * tree on exact < 2⁵³ operands — bit-identical cross-engine.
    *
    * Scale shape: ONE conditional-sum aggregate over units (map-side
    * combinable, no join, no row-scale window — the pooled pieces are
    * window sums over the ≤|arms|-row arm frame). Output per arm:
    * (arm, n_units, x_cents, y_cents, theta_micro, y_mean, y_adj). */
  def cuped(df: DataFrame, arm: String, x: String, y: String): DataFrame = {
    val a = cupedArms(df, arm, x, y)
    val w = Window.partitionBy()
    a.select(col(arm), col("n_a"), col("sx_a"), col("sy_a"),
        sum(col("n_a")).over(w).as("n"),
        sum(col("sx_a")).over(w).as("sx"),
        sum(col("sy_a")).over(w).as("sy"),
        sum(col("sxx_a")).over(w).as("sxx"),
        sum(col("sxy_a")).over(w).as("sxy"))
      .selectExpr(arm, "n_a", "sx_a", "sy_a", "n", "sx",
        "(CAST(n AS DECIMAL(38,0)) * sxy - CAST(sx AS DECIMAL(38,0)) * sy)" +
          " * 1000000 AS th_num",
        "CAST(n AS DECIMAL(38,0)) * sxx - CAST(sx AS DECIMAL(38,0)) * sx" +
          " AS th_den")
      .selectExpr(arm, "n_a", "sx_a", "sy_a", "n", "sx",
        // degenerate covariate (constant x) has no θ — NULL, identically
        // in both engines (ANSI would throw on the zero divide). The
        // sign split pins truncation-toward-zero on a possibly-negative
        // numerator (the q_stat_spearman rho_e6 discipline).
        "CASE WHEN th_den = 0 THEN NULL" +
          " WHEN th_num < 0 THEN CAST(-((-th_num) div th_den) AS BIGINT)" +
          " ELSE CAST(th_num div th_den AS BIGINT) END AS theta_micro")
      .selectExpr(s"$arm", "CAST(n_a AS BIGINT) AS n_units",
        "CAST(sx_a AS BIGINT) AS x_cents", "CAST(sy_a AS BIGINT) AS y_cents",
        "theta_micro",
        "CAST(sy_a AS DOUBLE) / CAST(n_a AS DOUBLE) AS y_mean",
        "CAST(sy_a AS DOUBLE) / CAST(n_a AS DOUBLE)" +
          " - CAST(theta_micro AS DOUBLE) / CAST(1000000 AS DOUBLE)" +
          " * (CAST(sx_a AS DOUBLE) / CAST(n_a AS DOUBLE)" +
          "    - CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)) AS y_adj")
  }

  /** Kendall tau-b rank concordance per group over integer-quantized
    * (x, y) pairs, EXACT and scalable: every pairwise comparison count is
    * a product of joint-histogram cell counts, so the O(n²) pair space
    * collapses to support² CELL pairs — the only row-scale work is the
    * one map-side-combinable (group, x, y) histogram; the concordance
    * join, both marginal rollups and the final join all ride that
    * value-domain-bounded frame (≤ |X|·|Y| cells per group at ANY corpus
    * size). The histogram is localCheckpointed because four consumers
    * (both join sides + two marginals) would otherwise rescan the fact.
    *
    * Output per group: (group, n, n_conc, n_disc, tau_num, den_x_x2,
    * den_y_x2) with tau_num = C − D and the tie-corrected denominators
    * DOUBLED to stay integral (n(n−1) − Σt(t−1) = 2(n0 − n1)), so
    * tau_b = 2·tau_num / √(den_x_x2 · den_y_x2) — the caller keeps the
    * exact rational; no division or sqrt enters this frame. Products
    * accumulate in DECIMAL(38,0); the BIGINT output casts overflow
    * LOUDLY under ANSI past ~4·10⁹ rows per group (C ≤ n²/2) — keep the
    * decimals beyond that. */
  def kendallTau(df: DataFrame, group: String, x: String,
      y: String): DataFrame = {
    val D38 = "decimal(38,0)"
    val h = df.groupBy(col(group).as("__g"), col(x).as("__x"),
        col(y).as("__y"))
      .agg(count(lit(1)).as("__c"))
      .localCheckpoint()
    val a = h.select(col("__g"), col("__x").as("xa"), col("__y").as("ya"),
      col("__c").as("ca"))
    val b = h.select(col("__g").as("__gb"), col("__x").as("xb"),
      col("__y").as("yb"), col("__c").as("cb"))
    // cell pairs with strictly increasing x — each unordered row pair
    // with differing x is counted exactly once via the cell-count
    // product; the support frame broadcasts (domain-bounded by contract)
    val cd = a.join(broadcast(b),
        col("__g") === col("__gb") && col("xa") < col("xb"))
      .groupBy("__g")
      .agg(
        sum(when(col("ya") < col("yb"),
          (col("ca") * col("cb")).cast(D38))).as("conc"),
        sum(when(col("ya") > col("yb"),
          (col("ca") * col("cb")).cast(D38))).as("disc"))
    val mx = h.groupBy(col("__g"), col("__x")).agg(sum("__c").as("t"))
      .groupBy("__g")
      .agg(sum(col("t")).as("n"),
        sum((col("t") * (col("t") - 1)).cast(D38)).as("tx2"))
    val my = h.groupBy(col("__g"), col("__y")).agg(sum("__c").as("t"))
      .groupBy("__g")
      .agg(sum((col("t") * (col("t") - 1)).cast(D38)).as("ty2"))
    // mx is the base (always one row per group); a group whose x is
    // constant has no increasing-x cell pairs → coalesce to 0. All three
    // frames are |groups|-bounded — broadcast the assembly
    mx.join(broadcast(my), "__g").join(broadcast(cd), Seq("__g"), "left")
      .selectExpr("__g",
        "CAST(n AS BIGINT) AS n",
        s"CAST(COALESCE(conc, CAST(0 AS $D38)) AS BIGINT) AS n_conc",
        s"CAST(COALESCE(disc, CAST(0 AS $D38)) AS BIGINT) AS n_disc",
        s"CAST(COALESCE(conc, CAST(0 AS $D38)) - COALESCE(disc, CAST(0 AS $D38)) AS BIGINT) AS tau_num",
        s"CAST(CAST(n * (n - 1) AS $D38) - tx2 AS BIGINT) AS den_x_x2",
        s"CAST(CAST(n * (n - 1) AS $D38) - ty2 AS BIGINT) AS den_y_x2")
      .withColumnRenamed("__g", group)
  }

  /** Theil–Sen robust trend over a PRE-AGGREGATED series (one row per
    * integral `x` bucket, integral `y`): the median of all pairwise
    * slopes (yⱼ−yᵢ)/(xⱼ−xᵢ), selected POSITIONALLY under the
    * deterministic total order (slope, dy, dx) — distinct rationals that
    * collide in double space still order identically in both engines, so
    * the selected pair is reproducible. Output one row:
    * (n_pairs, slope_num, slope_den, slope) with slope = dy/dx as the
    * one-divide double on exact (<2⁵³) integer operands.
    *
    * Scale shape: the pair fan-out is C(|spine|,2) — a function of the
    * SPINE length (calendar months, days), not the row count, so at
    * 100 TB the pair frame is the same few thousand rows it is here. The
    * cumulative-position window rides the (slope, dy, dx) histogram (an
    * Aggregate → strict-lint exempt). Callers should localCheckpoint a
    * series derived from an expensive scan: the self-join consumes it
    * twice. */
  def theilSen(series: DataFrame, x: String, y: String): DataFrame = {
    val m = series.select(col(x).cast(LongType).as("__x"),
      col(y).cast(LongType).as("__y"))
    val pairs = m.toDF("xa", "ya")
      .join(m.toDF("xb", "yb"), col("xa") < col("xb"))
      .select((col("yb") - col("ya")).as("dy"),
        (col("xb") - col("xa")).as("dx"))
      .select(col("dy"), col("dx"),
        (col("dy").cast("double") / col("dx").cast("double")).as("slope"))
    val h = pairs.groupBy("slope", "dy", "dx").agg(count(lit(1)).as("c"))
    val w = h.select(col("slope"), col("dy"), col("dx"), col("c"),
      sum(col("c")).over(Window.orderBy("slope", "dy", "dx")
        .rowsBetween(Window.unboundedPreceding, 0)).as("cum"),
      sum(col("c")).over(Window.partitionBy()).as("n"))
    // lower-median position k = ⌊(n+1)/2⌋ via the exactly-divisible `/`
    // (IEEE-exact in both engines — no dialect integer-division operator)
    val k = (col("n") + 1 - (col("n") + 1) % 2) / 2
    w.filter(col("cum") - col("c") < k && k <= col("cum"))
      .select(col("n").cast(LongType).as("n_pairs"),
        col("dy").cast(LongType).as("slope_num"),
        col("dx").cast(LongType).as("slope_den"),
        col("slope"))
  }
}
