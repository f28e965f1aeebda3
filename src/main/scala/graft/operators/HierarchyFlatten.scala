package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Flatten a parent-pointer hierarchy (org chart, BOM, category tree) to
  * per-node (root, depth) — the iterative-query shape SQL engines express
  * as `WITH RECURSIVE` (the oracle twin of q_hierarchy_flatten runs
  * exactly that in DuckDB).
  *
  * Algorithm: pointer DOUBLING, not per-level descent. Each round joins
  * the label frame to itself on the current ancestor pointer and jumps
  * `anc(v) ← anc(anc(v))`, accumulating the hop distance, so pointer
  * reach doubles per round: a depth-D hierarchy converges in
  * ⌈log₂ D⌉ + 1 rounds (the +1 detects the fixpoint), vs D rounds for
  * the naive level-at-a-time expansion a recursive CTE performs. At
  * 100 TB that matters twice over: deep hierarchies (file trees, BOM
  * chains) stop being round-count-bound, and each round is ONE
  * self-equi-join on a hash-partitioned (v, anc, dist) frame — no
  * driver-side frontier, no broadcast, state linear in |V|.
  *
  * Roots are encoded as `parent == v`; a root's row (v, v, 0) is its own
  * join fixpoint, so resolved rows pass through unchanged and the moved
  * count reaches zero exactly when every pointer names a root. Lineage
  * is cut per round (lazy localCheckpoint materialized by the round's
  * convergence count — one Spark job per round, the DedupGroups idiom).
  */
object HierarchyFlatten {

  /** Diagnostic (StressSpec): rounds the last flatten() took, fixpoint
    * detection round included. Test telemetry, not API. */
  private[graft] val lastRounds = new java.util.concurrent.atomic.AtomicInteger

  /** `nodes`: (v, parent) with roots encoded as parent == v; every
    * non-root's parent must exist as a node (forest, no cycles).
    * Returns (v, root, depth). */
  def flatten(nodes: DataFrame, maxIters: Int = 40): DataFrame = {
    var labels = nodes
      .select(col("v"), col("parent").as("anc"),
        when(col("parent") === col("v"), 0L).otherwise(1L).as("dist"))
      .localCheckpoint(true)
    var converged = false
    var iter = 0
    while (!converged && iter < maxIters) {
      iter += 1
      val jumped = labels.as("l")
        .join(labels.select(col("v").as("av"), col("anc").as("aanc"),
          col("dist").as("adist")), col("l.anc") === col("av"))
        .select(col("l.v").as("v"), col("aanc").as("anc"),
          (col("l.dist") + col("adist")).as("dist"),
          // a non-root ancestor never points at itself, so the pointer
          // moves iff the previous ancestor was not yet a root
          (col("aanc") =!= col("l.anc")).as("moved"))
        .localCheckpoint(eager = false)
      val moved = jumped
        .agg(sum(when(col("moved"), 1L).otherwise(0L))).head().getLong(0)
      labels = jumped.drop("moved")
      converged = moved == 0L
    }
    // Precondition violations fail LOUDLY (round-11 advice): a cycle —
    // or depth > 2^maxIters — leaves pointers still moving at exit, and
    // silently returning the partially-resolved frame would hand callers
    // plausible-looking wrong (root, depth) labels.
    if (!converged)
      throw new IllegalStateException(
        s"HierarchyFlatten.flatten did not converge in $maxIters rounds: " +
          "ancestor pointers still moving — the input has a cycle (the " +
          "documented forest precondition excludes them) or depth " +
          s"exceeds 2^$maxIters; raise maxIters only in the latter case")
    lastRounds.set(iter)
    labels.select(col("v"), col("anc").as("root"), col("dist").as("depth"))
  }

  /** The PROPER-ANCESTOR relation — every (v, ancestor) pair — by path
    * doubling on the pair set itself: P ← P ∪ (P ∘ P), so after r rounds
    * P holds all ancestor paths of length ≤ 2^r: ⌈log₂ depth⌉ rounds,
    * each one self-equi-join + distinct, no driver-side frontier. The
    * materialized relation is Σdepth(v)-sized — n·O(log n) for the
    * balanced hierarchies subtree rollups run on (org charts, BOMs,
    * category trees); a degenerate chain makes it quadratic, and those
    * shapes belong on [[flatten]]'s (root, depth) analytics instead —
    * the same honesty note a recursive CTE owes you, since its
    * intermediate is the identical relation built in O(depth) rounds. */
  def ancestors(nodes: DataFrame, maxIters: Int = 40): DataFrame = {
    var pairs = nodes.filter(col("parent") =!= col("v"))
      .select(col("v"), col("parent").as("anc"))
      .localCheckpoint(true)
    var prevN = -1L
    var iter = 0
    while (iter < maxIters) {
      iter += 1
      val jumped = pairs.as("l")
        .join(pairs.select(col("v").as("jv"), col("anc").as("janc")),
          col("l.anc") === col("jv"))
        .select(col("l.v").as("v"), col("janc").as("anc"))
      // tree ancestry ⇒ (v, anc) pairs are unique; distinct only folds
      // the multiple length-decompositions of one path
      val next = pairs.union(jumped).distinct()
        .localCheckpoint(eager = false)
      val n = next.count()
      val done = n == prevN
      prevN = n
      pairs = next
      if (done) {
        // A cycle SATURATES the pair set (count stabilizes at ≤ n²), so
        // convergence alone is not proof of validity — but a forest
        // closure can never contain a self-pair (v, v), while every
        // cycle's composition produces one. One cheap filter-count on
        // the final frame turns the silent-wrong-closure case into a
        // loud failure (round-11 advice).
        if (pairs.filter(col("v") === col("anc")).limit(1).count() > 0)
          throw new IllegalStateException(
            "HierarchyFlatten.ancestors: input contains a cycle (self-" +
              "reachable node) — violates the forest precondition; the " +
              "saturated closure is not a valid ancestor relation")
        lastRounds.set(iter); return pairs
      }
    }
    // Exhausting maxIters without a stable count: depth > 2^maxIters or
    // a cycle still lengthening paths — either way the partial closure
    // is wrong, not merely late.
    throw new IllegalStateException(
      s"HierarchyFlatten.ancestors did not converge in $maxIters rounds: " +
        "pair count still growing — cyclic input (violates the forest " +
        "precondition) or pathological depth; the partial closure is not " +
        "a valid ancestor relation")
  }
}
