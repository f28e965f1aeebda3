package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Near-dup candidate pairs → duplicate CLUSTERS (connected components)
  * → canonical representative per cluster. The step every dedup pipeline
  * needs after candidate generation: pairs alone don't say which docs to
  * drop — transitive closure does (A≈B, B≈C ⇒ {A,B,C} is one group even
  * if A,C never paired).
  *
  * Algorithm: iterative min-label propagation with pointer jumping —
  * label(v) starts as v; each round takes the min over neighbors' labels
  * AND shortcuts through label(label(v)), so label chains halve per
  * round: convergence in O(log diameter) rounds — label reach doubles
  * per round (reach(r) = 2^(r+1) − 2), so a 2^20-vertex chain converges
  * in 20 propagation rounds + 1 detection round, comfortably inside the
  * default 24-round budget (which covers diameters to ~2^24) — not
  * O(diameter) as plain
  * propagation would need on chain-shaped clusters (incremental document
  * revisions pairing only with their neighbors). Each round is two
  * shuffles (neighbor join + jump self-join, no driver data) in ONE
  * Spark job: the previous label rides the update frame, the round's
  * convergence count is the action that materializes the round's LAZY
  * localCheckpoint, and labels-only reads reuse the cached blocks —
  * round-7 advice folded the former separate count()-with-join plus
  * eager checkpoint (~3 jobs/round, 2 of them recomputing the update)
  * into this single pass. Lineage is still cut per round so the plan
  * stays bounded — the standard Spark iterative-graph shape.
  */
object DedupGroups {

  /** Diagnostic (MarqueeStressSpec): rounds the last components() call
    * took to converge, detection round included. Same contract as the
    * other private[graft] work-metric probes — test telemetry, not API. */
  private[graft] val lastRounds = new java.util.concurrent.atomic.AtomicInteger

  /** Component label per vertex: (v, lbl) where lbl = min doc_id reachable.
    * `pairs` needs columns (d1, d2); vertices not in any pair are absent
    * (callers union isolated docs back as their own group). */
  def components(pairs: DataFrame, maxIters: Int = 24): DataFrame = {
    val edges = pairs.select(col("d1").as("src"), col("d2").as("dst"))
      .union(pairs.select(col("d2").as("src"), col("d1").as("dst")))
      .distinct()
      .localCheckpoint(true)
    var labels = edges.select(col("src").as("v")).distinct()
      .withColumn("lbl", col("v"))
      .localCheckpoint(true)
    var converged = false
    var iter = 0
    while (!converged && iter < maxIters) {
      val nbrMin = edges
        .join(labels.select(col("v").as("dst"), col("lbl")), "dst")
        .groupBy("src").agg(min("lbl").as("nlbl"))
      val propagated = labels
        .join(nbrMin.withColumnRenamed("src", "v"), Seq("v"), "left")
        .select(col("v"), col("lbl").as("prev"),
          least(col("lbl"), coalesce(col("nlbl"), col("lbl"))).as("lbl"))
      // pointer jumping: shortcut to label(label(v)) — halves chains.
      // `prev` (this round's starting label) rides along so convergence
      // is a plain column compare, not a join back to `labels`.
      val updated = propagated
        .join(propagated.select(col("v").as("lv"), col("lbl").as("lbl2")),
          col("lbl") === col("lv"), "left")
        .select(col("v"), col("prev"),
          least(col("lbl"), coalesce(col("lbl2"), col("lbl"))).as("lbl"))
        .localCheckpoint(eager = false)
      // the ONE action of the round: materializes the lazy checkpoint
      // (labels are monotone non-increasing, so lbl != prev ⟺ changed)
      val changed = updated.filter(col("lbl") =!= col("prev")).count()
      labels = updated.drop("prev")
      converged = changed == 0
      iter += 1
    }
    lastRounds.set(iter)
    require(converged, s"label propagation did not converge in $maxIters rounds")
    labels
  }

  /** Drop non-canonical duplicates: keep each document whose doc_id is its
    * component's min (docs in no component survive untouched). */
  def dropDuplicates(documents: DataFrame, pairs: DataFrame): DataFrame = {
    val comp = components(pairs)
    documents.join(comp.select(col("v").as("doc_id"), col("lbl")),
        Seq("doc_id"), "left")
      .filter(col("lbl").isNull || col("lbl") === col("doc_id"))
      .drop("lbl")
  }
}
