package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bin-overlap reformulation of the PURE range join (no equi key).
  *
  * Spark plans `points JOIN intervals ON p BETWEEN lo AND hi` with no
  * equi-condition as BroadcastNestedLoopJoin — O(n·m) pair evaluations
  * and a broadcast of one whole side. Fine for a 20-row band table,
  * fatal for a 10⁷-row interval table at 100 TB. The classic fix (the
  * published range-join optimization in Spark-family engines) turns the
  * theta join into an EQUI join on a computed bin id:
  *
  *  1. pick a bin width `w` (caller-supplied, or derived from the mean
  *     interval length by a one-row aggregate probe — the SizeProbe
  *     idiom: resolved ONCE on the driver to a literal, so both sides
  *     provably share the same value. Round-7 advice: the previous
  *     in-plan one-row width frame was cross-joined into both sides and
  *     could execute twice — exchange reuse is an optimization, not a
  *     guarantee — and two float aggregations merging in different
  *     orders can differ in the last ULP, silently re-binning a point
  *     sitting exactly on a bin boundary);
  *  2. every interval explodes to the bins it covers
  *     (floor(lo/w) .. floor(hi/w));
  *  3. every point maps to its single bin floor(p/w);
  *  4. hash-join on the bin id, then the exact `lo ≤ p ≤ hi` residual.
  *
  * A (point, interval) pair can meet in at most ONE bin — the point's —
  * so no dedup pass is needed and the join output is exactly the theta
  * join's. Work is O(points + intervals·(len/w) + candidates) where
  * candidates = pairs sharing a bin; with w ≈ mean interval length each
  * interval explodes to ~2 bins and candidates stay near the true output
  * size. Both sides shuffle by bin id — even partitioning for any
  * point distribution Spark's hash can spread (a single pathological
  * bin is AQE skew-join fodder, like any hot key).
  *
  * FAN-OUT CLAMP (round-7 advice): one outlier interval vastly longer
  * than w explodes to len/w bins — unbounded, and past sequence()'s
  * element cap the query would throw where the plain theta join
  * succeeds. Intervals covering more than `maxBinsPerInterval` bins are
  * routed to a broadcast nested-loop side union instead of exploding.
  * With the derived width w = mean length, Markov bounds the wide set:
  * at most n/maxBinsPerInterval intervals are ≥ maxBins·mean long, so
  * the broadcast side is ≤ 1/4096 of the interval count by default.
  * The route EXISTS only when the probe sees an over-wide interval
  * (max length rides the same one-row aggregate), so the common plan
  * stays a pure hash join with no nested-loop node at all.
  *
  * JoinSpec-style gate: RangeSpec asserts pair-for-pair equality with
  * the nested-loop form and that the executed plan contains no
  * CartesianProduct and joins on the bin id.
  */
object RangeBinJoin {

  /** Default per-interval bin-count clamp; 4096 keeps the worst explode
    * fan-out 3 decimal orders under sequence()'s ~2³¹ element cap while
    * bounding the broadcast side at n/4096 for derived widths. */
  val MaxBinsPerInterval = 4096L

  /** Broadcast-safe row cap for the wide-outlier side when `binWidth` is
    * CALLER-SUPPLIED. A derived width bounds the wide set by Markov
    * (≤ n/maxBinsPerInterval), but a caller's too-small width can
    * classify an arbitrarily large fraction of intervals as wide — and
    * broadcasting them all would OOM where the old plan merely exploded
    * bins (round-8 advice). The probe counts wide rows up front and the
    * route fails fast past this cap with an actionable message. */
  val WideBroadcastMaxRows = 1L << 20

  private def positive(w: Double): Double = {
    require(w > 0 && !w.isNaN && !w.isInfinity,
      s"binWidth $w must be a finite positive number")
    w
  }

  /** `points ⋈ intervals ON points(pointCol) BETWEEN lo AND hi` as a
    * bin equi-join. Returns all point columns + all interval columns.
    * Intervals with hi < lo are dropped (they match nothing; an
    * unguarded descending `sequence()` would throw instead). `binWidth`
    * None derives w from the mean interval length via a one-row probe. */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
                      pointCol: String, loCol: String, hiCol: String,
                      binWidth: Option[Double] = None,
                      maxBinsPerInterval: Long = MaxBinsPerInterval,
                      wideRowCap: Long = WideBroadcastMaxRows): DataFrame = {
    require(maxBinsPerInterval >= 2, "maxBinsPerInterval must be >= 2")
    val lo = col(loCol).cast("double")
    val hi = col(hiCol).cast("double")
    val p = col(pointCol).cast("double")
    val valid = intervals.filter(hi >= lo)
    // one-row probe: mean length resolves the derived width to a DRIVER
    // LITERAL (single value by construction); max length decides whether
    // the wide route exists at all. For caller-supplied widths the wide
    // count rides the same probe (see [[WideBroadcastMaxRows]]).
    val suppliedW = binWidth.map(positive)
    val wideCnt = suppliedW.map { w0 =>
      coalesce(sum(when(hi - lo >= lit(w0 * maxBinsPerInterval), 1L)
        .otherwise(0L)), lit(0L))
    }.getOrElse(lit(0L))
    val stats = valid.agg(
      coalesce(sum(hi - lo), lit(0.0)).as("s"),
      count(lit(1)).as("n"),
      coalesce(max(hi - lo), lit(0.0)).as("mx"),
      wideCnt.as("wc")).head()
    val w = suppliedW.getOrElse(
      math.max(stats.getDouble(0) / math.max(stats.getLong(1), 1L), 1e-9))
    val isWide = (hi - lo) >= lit(w * maxBinsPerInterval)
    val hasWide = stats.getDouble(2) >= w * maxBinsPerInterval
    if (suppliedW.isDefined && hasWide)
      require(stats.getLong(3) <= wideRowCap,
        s"binWidth $w classifies ${stats.getLong(3)} intervals as wide " +
          s"(>= $maxBinsPerInterval bins each) — past the broadcast-safe " +
          s"cap $wideRowCap; supply a larger binWidth or None " +
          "to derive one from the mean interval length")

    val narrow = if (hasWide) valid.filter(!isWide) else valid
    val iv = narrow.withColumn("__bin",
      explode(sequence(floor(lo / w), floor(hi / w))))
    val pt = points.withColumn("__bin", floor(p / w))
    val binned = pt.join(iv, Seq("__bin"))
      .filter(p >= lo && p <= hi)
      .drop("__bin")
    if (!hasWide) binned
    else binned.unionByName(
      // over-wide outliers: a small broadcast theta join (≤ n/maxBins
      // rows for derived widths by Markov) instead of a len/w explode
      points.join(broadcast(valid.filter(isWide)), p >= lo && p <= hi))
  }

  /** INTERVAL-OVERLAP join: `left ⋈ right ON lo1 ≤ hi2 AND lo2 ≤ hi1`
    * as the same bin equi-join. Both sides explode to the bins of their
    * NORMALIZED cover [least(lo,hi), greatest(lo,hi)] — not the raw
    * (lo, hi) pair, because the raw theta predicate is still satisfiable
    * when an interval is inverted (the other side then has to span the
    * whole swapped range; RangeSpec's randomized-geometry property
    * caught exactly this: a validity pre-filter silently lost those
    * pairs). The raw predicate implies the normalized covers overlap
    * (min(lo1,hi1) ≤ lo1 ≤ hi2 ≤ max(lo2,hi2) and symmetrically), so
    * binning the normalized covers is a complete candidate generator
    * and the original predicate rides along as the exact residual. An
    * overlapping pair shares every bin in the intersection of the two
    * covers; the EMIT-ONCE rule keeps only the first shared bin
    * (`__bin == max(floor(nlo1/w), floor(nlo2/w))`, provably inside
    * both covers), so the output is exactly the theta join's with no
    * dedup pass — and with `w` a driver literal the rule is evaluated
    * against the SAME width everywhere by construction. Column names
    * must be disjoint across the two sides (standard join hygiene).
    * `binWidth` None derives w from the mean normalized interval length
    * over BOTH sides via the probe. Covers wider than
    * `maxBinsPerInterval` bins route to broadcast theta side unions
    * (wide-left × all-right, narrow-left × wide-right — disjoint, so
    * no pair is double-counted). */
  def intervalOverlap(left: DataFrame, right: DataFrame,
                      lo1Col: String, hi1Col: String,
                      lo2Col: String, hi2Col: String,
                      binWidth: Option[Double] = None,
                      maxBinsPerInterval: Long = MaxBinsPerInterval,
                      wideRowCap: Long = WideBroadcastMaxRows): DataFrame = {
    require(maxBinsPerInterval >= 2, "maxBinsPerInterval must be >= 2")
    val (lo1, hi1) = (col(lo1Col).cast("double"), col(hi1Col).cast("double"))
    val (lo2, hi2) = (col(lo2Col).cast("double"), col(hi2Col).cast("double"))
    val (nlo1, nhi1) = (least(lo1, hi1), greatest(lo1, hi1))
    val (nlo2, nhi2) = (least(lo2, hi2), greatest(lo2, hi2))
    // one-row probe over BOTH sides' normalized lengths (see
    // pointInInterval): width literal + per-side max for wide routing;
    // per-side wide counts ride along for caller-supplied widths
    // (see [[WideBroadcastMaxRows]])
    val suppliedW = binWidth.map(positive)
    val wideCnt = suppliedW.map { w0 =>
      coalesce(sum(when(col("__len") >= lit(w0 * maxBinsPerInterval), 1L)
        .otherwise(0L)), lit(0L))
    }.getOrElse(lit(0L))
    val stats = left.select((nhi1 - nlo1).as("__len"), lit(0).as("__side"))
      .unionByName(right.select((nhi2 - nlo2).as("__len"), lit(1).as("__side")))
      .groupBy("__side")
      .agg(coalesce(sum(col("__len")), lit(0.0)).as("s"),
        count(lit(1)).as("n"),
        coalesce(max(col("__len")), lit(0.0)).as("mx"),
        wideCnt.as("wc"))
      .collect().map(r => r.getInt(0) -> r).toMap
    def s(i: Int, f: org.apache.spark.sql.Row => Double) = stats.get(i).map(f).getOrElse(0.0)
    val totalN = stats.values.map(_.getLong(2)).sum
    val w = suppliedW.getOrElse(
      math.max((s(0, _.getDouble(1)) + s(1, _.getDouble(1))) / math.max(totalN, 1L), 1e-9))
    val wideL = (nhi1 - nlo1) >= lit(w * maxBinsPerInterval)
    val wideR = (nhi2 - nlo2) >= lit(w * maxBinsPerInterval)
    val hasWideL = s(0, _.getDouble(3)) >= w * maxBinsPerInterval
    val hasWideR = s(1, _.getDouble(3)) >= w * maxBinsPerInterval
    if (suppliedW.isDefined && (hasWideL || hasWideR)) {
      val nWide = stats.values.map(_.getLong(4)).sum
      require(nWide <= wideRowCap,
        s"binWidth $w classifies $nWide intervals as wide " +
          s"(>= $maxBinsPerInterval bins each) — past the broadcast-safe " +
          s"cap $wideRowCap; supply a larger binWidth or None " +
          "to derive one from the mean interval length")
    }
    val theta = lo1 <= hi2 && lo2 <= hi1

    val ln = if (hasWideL) left.filter(!wideL) else left
    val rn = if (hasWideR) right.filter(!wideR) else right
    val la = ln.withColumn("__bin",
      explode(sequence(floor(nlo1 / w), floor(nhi1 / w))))
    val rb = rn.withColumn("__bin",
      explode(sequence(floor(nlo2 / w), floor(nhi2 / w))))
    var out = la.join(rb, Seq("__bin"))
      .filter(theta &&
        col("__bin") === greatest(floor(nlo1 / w), floor(nlo2 / w)))
      .drop("__bin")
    if (hasWideL)
      out = out.unionByName(broadcast(left.filter(wideL)).join(right, theta))
    if (hasWideR)
      out = out.unionByName(ln.join(broadcast(right.filter(wideR)), theta))
    out
  }
}
