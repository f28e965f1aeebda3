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
  *  1. pick a bin width `w` (caller-supplied, or derived in-plan from
  *     the mean interval length — a one-row broadcast aggregate, the
  *     [[HistogramRank]] stats pattern, so no driver action);
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
  * JoinSpec-style gate: RangeSpec asserts pair-for-pair equality with
  * the nested-loop form and that the executed plan contains no
  * BroadcastNestedLoopJoin / CartesianProduct.
  */
object RangeBinJoin {

  /** `points ⋈ intervals ON points(pointCol) BETWEEN lo AND hi` as a
    * bin equi-join. Returns all point columns + all interval columns.
    * Intervals with hi < lo are dropped (they match nothing; an
    * unguarded descending `sequence()` would throw instead). `binWidth`
    * None derives w from the mean interval length inside the plan. */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
                      pointCol: String, loCol: String, hiCol: String,
                      binWidth: Option[Double] = None): DataFrame = {
    val lo = col(loCol).cast("double")
    val hi = col(hiCol).cast("double")
    val p = col(pointCol).cast("double")
    val valid = intervals.filter(hi >= lo)
    // one-row width frame: caller constant, or mean interval length
    // (floored away from zero so zero-length intervals cannot divide by
    // zero) — broadcast into both sides' bin expressions
    val wFrame = binWidth match {
      case Some(w) =>
        require(w > 0, s"binWidth $w must be positive")
        valid.sparkSession.range(1).select(lit(w).as("__w"))
      case None =>
        valid.agg(greatest(
          (sum(hi - lo) / count(lit(1))).cast("double"), lit(1e-9)).as("__w"))
    }
    val iv = valid.crossJoin(broadcast(wFrame))
      .withColumn("__bin",
        explode(sequence(floor(lo / col("__w")), floor(hi / col("__w")))))
      .drop("__w")
    val pt = points.crossJoin(broadcast(wFrame))
      .withColumn("__bin", floor(p / col("__w")))
      .drop("__w")
    pt.join(iv, Seq("__bin"))
      .filter(p >= lo && p <= hi)
      .drop("__bin")
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
    * dedup pass. Column names must be disjoint across the two sides
    * (standard join hygiene). `binWidth` None derives w from the mean
    * normalized interval length over BOTH sides. */
  def intervalOverlap(left: DataFrame, right: DataFrame,
                      lo1Col: String, hi1Col: String,
                      lo2Col: String, hi2Col: String,
                      binWidth: Option[Double] = None): DataFrame = {
    val (lo1, hi1) = (col(lo1Col).cast("double"), col(hi1Col).cast("double"))
    val (lo2, hi2) = (col(lo2Col).cast("double"), col(hi2Col).cast("double"))
    val (nlo1, nhi1) = (least(lo1, hi1), greatest(lo1, hi1))
    val (nlo2, nhi2) = (least(lo2, hi2), greatest(lo2, hi2))
    val wFrame = binWidth match {
      case Some(w) =>
        require(w > 0, s"binWidth $w must be positive")
        left.sparkSession.range(1).select(lit(w).as("__w"))
      case None =>
        left.select((nhi1 - nlo1).as("__len"))
          .unionByName(right.select((nhi2 - nlo2).as("__len")))
          .agg(greatest((sum(col("__len")) / count(lit(1))).cast("double"),
            lit(1e-9)).as("__w"))
    }
    val la = left.crossJoin(broadcast(wFrame))
      .withColumn("__bin",
        explode(sequence(floor(nlo1 / col("__w")), floor(nhi1 / col("__w")))))
    val rb = right.crossJoin(broadcast(wFrame))
      .withColumn("__bin",
        explode(sequence(floor(nlo2 / col("__w")), floor(nhi2 / col("__w")))))
      .drop("__w")
    la.join(rb, Seq("__bin"))
      .filter(lo1 <= hi2 && lo2 <= hi1 &&
        col("__bin") === greatest(floor(nlo1 / col("__w")),
          floor(nlo2 / col("__w"))))
      .drop("__bin", "__w")
  }
}
