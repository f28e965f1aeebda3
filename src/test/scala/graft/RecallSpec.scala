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
        // shortlist pinned to the r12 measurement width (64): this grid
        // characterizes the PROBE-bound regime; the shortlist-bound
        // regime is the next test's subject (and the 256 default)
        val got = graft.operators.IvfPq
          .query(idx, emb, k = 5, anchorPred = anchorPred, nprobe = np,
            shortlist = 64)
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

  test("cells axis + shortlist decomposition: recall rides the PROBED " +
    "FRACTION, and the full-probe ceiling is shortlist-bound") {
    // Round-13 verdict item 8. Measured law (r13_ann_recall.md): at
    // equal probed fraction nprobe/cells, recall is the same within
    // noise whether the corpus is cut into 8 or 16 cells — the coarse
    // quantizer's granularity is a COST knob (finer cells = cheaper
    // probes at the same fraction), not a recall knob. And the
    // full-probe ceiling (~0.81 at shortlist 64) is the exact re-rank
    // WIDTH, not PQ distortion: shortlist 256 at full probe reaches
    // ~0.99, which is why 256 is the production default.
    val d = sf("0.01")
    val emb = Tables.embeddings(spark, d)
    val anchorPred = col("vec_id") < 100
    val exact = SparkEntry.queries("q_sim_cosine_topk")(spark, d)
      .select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def recallOf(cells: Int, np: Int, sl: Int): Double = {
      val idx = graft.operators.IvfPq.buildIndex(emb, cells = cells, m = 8)
      val got = graft.operators.IvfPq
        .query(idx, emb, k = 5, anchorPred = anchorPred, nprobe = np,
          shortlist = sl)
        .select("a_id", "b_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      (exact & got).size.toDouble / exact.size
    }
    // probed-fraction equivalence at 50% and 100% (0.08 pairing noise:
    // different cell boundaries shuffle which neighbors fall in-probe)
    val half8 = recallOf(8, 4, 64); val half16 = recallOf(16, 8, 64)
    val full8 = recallOf(8, 8, 64); val full16 = recallOf(16, 16, 64)
    info(f"50%% probed: cells=8 $half8%.3f vs cells=16 $half16%.3f")
    info(f"100%% probed: cells=8 $full8%.3f vs cells=16 $full16%.3f")
    assert(math.abs(half8 - half16) <= 0.08, f"$half8%.3f vs $half16%.3f")
    assert(math.abs(full8 - full16) <= 0.04, f"$full8%.3f vs $full16%.3f")
    // the ceiling is shortlist-bound: widening the exact re-rank at
    // full probe must recover nearly all of the exact top-5
    val fullWide = recallOf(8, 8, 256)
    info(f"full probe, shortlist 256: $fullWide%.3f")
    assert(fullWide >= 0.95, f"shortlist-bound ceiling law: $fullWide%.3f")
    assert(fullWide >= full8 + 0.1, "widening the shortlist must beat " +
      f"the sl=64 ceiling: $fullWide%.3f vs $full8%.3f")
    // floors from the committed r13 first run, minus 0.05
    assert(half16 >= 0.68, f"cells=16 np=8: $half16%.3f")
    assert(full8 >= 0.76, f"cells=8 np=8: $full8%.3f")
  }
}
