package graft

import graft.core.Tables
import org.apache.spark.sql.functions._

/** The measured recall/nprobe/m trade-off for IVF-PQ ANN (round-11
  * verdict item 6): the 0.6 gate in AnnSpec proved the route works but
  * nobody had MEASURED where on the curve the defaults sit. This spec
  * sweeps the 3×3 grid (m subspaces × nprobe probed cells; m ≤ 8 — the PqCodec packs m×4-bit codes in one long) on the
  * sf0.01 fixture against the exact top-5 and pins:
  *
  *   - the measured table (info-logged per cell, and asserted as a
  *     floor grid committed from the first measured run − noise
  *     margin) — the committed curve IS the evidence artifact, in
  *     tools/bench_evidence/r12_ann_recall.md;
  *   - nprobe monotonicity per m: more probed cells ⇒ candidate
  *     supersets ⇒ recall must not fall beyond inversion noise (ties
  *     broken inside the shortlist can reorder at equal ADC);
  *   - the floors themselves are the tightened gates: measured − 0.05
  *     per cell (first run: 0.236/0.414/0.512 … 0.236/0.452/0.714 —
  *     the full table is in the evidence note). AnnSpec's end-to-end
  *     gates rise with the same evidence (0.6 → the measured − margin
  *     values there).
  *
  * What the curve says: recall is probe-bound, not code-bound — all
  * three m rows sit at ≈0.24 for nprobe=1 and fan apart only at
  * nprobe=4 (0.51/0.63/0.71), so at fixture scale the coarse quantizer
  * (8 cells, ~12 % of the corpus probed per cell) caps recall and finer
  * PQ codes only help once enough candidates are probed at all. The
  * production lever order is therefore nprobe (linear candidate cost)
  * before m (per-candidate ADC cost).
  *
  * Cost note: one exact pass + 3 index builds + 9 queries at sf0.01;
  * each build fits m tiny k-means models — the whole sweep is a few
  * bench-scale actions, well inside the regular suite budget.
  */
class RecallSpec extends SparkSuite {

  test("IVF-PQ recall@5 grid: m in {2,4,8} x nprobe in {1,2,4}") {
    val d = sf("0.01")
    val emb = Tables.embeddings(spark, d)
    val anchorPred = col("vec_id") < 100

    val exact = SparkEntry.queries("q_sim_cosine_topk")(spark, d)
      .select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    val ms = Seq(2, 4, 8)
    val nprobes = Seq(1, 2, 4)
    val grid = ms.map { m =>
      val idx = graft.operators.IvfPq.buildIndex(emb, cells = 8, m = m)
      m -> nprobes.map { np =>
        val got = graft.operators.IvfPq
          .query(idx, emb, k = 5, anchorPred = anchorPred, nprobe = np)
          .select("a_id", "b_id").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        val recall = (exact & got).size.toDouble / exact.size
        info(f"m=$m%2d nprobe=$np recall@5=$recall%.3f")
        np -> recall
      }.toMap
    }.toMap

    // Floor grid from the committed first run (r12_ann_recall.md) minus
    // a 0.05 noise margin: k-means seeds are deterministic, so drift
    // can only come from tie-order inside shortlists.
    val floor = Map(
      2 -> Map(1 -> 0.18, 2 -> 0.36, 4 -> 0.46),
      4 -> Map(1 -> 0.18, 2 -> 0.39, 4 -> 0.58),
      8 -> Map(1 -> 0.18, 2 -> 0.40, 4 -> 0.66))
    for (m <- ms; np <- nprobes) {
      assert(grid(m)(np) >= floor(m)(np),
        f"recall@5 m=$m nprobe=$np = ${grid(m)(np)}%.3f under floor ${floor(m)(np)}")
    }

    // nprobe monotonicity per m (supersets of candidates; allow 0.02
    // inversion noise from equal-ADC tie ordering in the shortlist)
    for (m <- ms) {
      assert(grid(m)(2) >= grid(m)(1) - 0.02,
        f"m=$m: recall fell 1->2 probes: ${grid(m)(1)}%.3f -> ${grid(m)(2)}%.3f")
      assert(grid(m)(4) >= grid(m)(2) - 0.02,
        f"m=$m: recall fell 2->4 probes: ${grid(m)(2)}%.3f -> ${grid(m)(4)}%.3f")
    }
  }
}
