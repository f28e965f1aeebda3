package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Differentially-private release prep — the step AFTER
  * q_privacy_sensitivity's census: bound each user's contribution
  * (clip), then draw calibrated Laplace noise from a DETERMINISTIC
  * md5-seeded uniform so a release is reproducible, auditable, and
  * engine-portable (the same seed string yields the same noise in any
  * runtime that can md5).
  *
  * Split by design into an EXACT stage (clipping — oracle-gated as
  * q_privacy_clipped, bit-identical cross-engine) and a SEEDED stage
  * (the noise draw — ScalaTest-gated laws: seed determinism, exact
  * 1/ε scaling, sign balance and mean-|noise| ≈ b distribution
  * bounds). Production would swap the seed for a vetted DRBG feed; the
  * MECHANISM (clip → scale → add) is exactly this.
  *
  * Scale shape: clipping is the (group, unit) rollup — one map-side
  * combinable exchange over the fact — followed by the bounded group
  * rollup; the noise draw is a row-local expression over the GROUP
  * frame (metadata-sized). Nothing new touches row scale.
  */
object DpRelease {

  /** Per-group clipped counts under user-level adjacency: each unit
    * (user) contributes at most `cap` to its group's count, so the
    * count query's L1 sensitivity is exactly `cap`. Emits per group the
    * clipped and raw totals, the unit count, and the mass the clip
    * discarded. */
  def clippedCounts(df: DataFrame, group: String, unit: String,
      cap: Long = 8L): DataFrame =
    df.groupBy(col(group), col(unit))
      .agg(count(lit(1)).cast("long").as("c"))
      .groupBy(col(group))
      .agg(sum(least(col("c"), lit(cap))).cast("long").as("clipped_count"),
        sum(col("c")).cast("long").as("raw_count"),
        count(lit(1)).cast("long").as("n_units"),
        (sum(col("c")) - sum(least(col("c"), lit(cap))))
          .cast("long").as("clip_loss"))

  /** Deterministic uniform in (0, 1) from md5(seed ":" group): 48 bits
    * of the digest (< 2⁵³, so the long→double is EXACT — 60 bits would
    * round and could land on exactly 1.0), offset half a grid step so
    * the draw can never be 0, ½, or 1 and the log below never sees a
    * zero argument. */
  private def seededUniform(group: Column, seed: String): Column =
    (conv(substring(md5(concat(lit(seed), lit(":"),
      group.cast("string"))), 1, 12), 16, 10).cast("double") + lit(0.5)) /
      lit(math.pow(2, 48))

  /** Laplace(b = sensitivity/ε) noise via inverse-CDF on the seeded
    * uniform: noise = −b · sign(u−½) · ln(1 − 2|u−½|). Exactly
    * proportional to 1/ε for a fixed seed (the law DpSpec pins). */
  private def laplace(group: Column, seed: String, scaleB: Double): Column = {
    val u = seededUniform(group, seed)
    val t = u - lit(0.5)
    -lit(scaleB) * signum(t) * log(lit(1.0) - lit(2.0) * abs(t))
  }

  /** The ε-DP count release: clipped count + Laplace(cap/ε) noise per
    * group. `clipped` must be a [[clippedCounts]] frame (or any frame
    * with `group` and a `clipped_count` column). */
  def release(clipped: DataFrame, group: String, epsilon: Double,
      seed: String, cap: Long = 8L): DataFrame = {
    require(epsilon > 0, s"epsilon must be positive: $epsilon")
    val b = cap.toDouble / epsilon
    clipped.select(col(group),
      col("clipped_count"),
      laplace(col(group), seed, b).as("noise"),
      (col("clipped_count").cast("double") +
        laplace(col(group), seed, b)).as("released"))
  }
}
