package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Embedding-cosine near-duplicate DEDUP: candidate pairs above `tau` →
  * connected components ([[DedupGroups]]) → keep the min-vec_id
  * representative per component. The semantic twin of the lexical dedup
  * family (exact / n-gram / SimHash / MinHash): two docs whose embeddings
  * point the same way are duplicates even when they share no tokens.
  *
  * Size-routed like [[ExactPairsTopK]]: corpora at or below `directMax`
  * rows take an exact blocked all-pairs threshold join (complete at ANY
  * tau — the fixture shape). Above `directMax` the route depends on tau,
  * because banding is honest only for the near-dup regime it exists for:
  *
  *  - **tau ≥ [[BandedTauFloor]] (0.8)** — hyperplane-signature banding:
  *    `planes` sign bits from the same literal hyperplane family, split
  *    into `bands` bands; vectors agreeing on any full band meet in an
  *    equi-join bucket and only those pairs pay an exact cosine. At
  *    tau ≥ 0.8 a same-band miss needs every band to split a ≤ 37° angle
  *    (p_collide = (1 − θ/π)^{planes/bands} per band) — recall is
  *    effectively certain on chained components.
  *  - **tau < 0.8** — banding's recall decays fast at moderate angles
  *    (the round-3 lesson that killed LSH for exact top-k), so instead of
  *    silently returning incomplete components the scale route switches
  *    to [[ExactPairsTopK.thresholdPairs]]: centroid triangle-inequality
  *    pruning, PROVABLY complete at any tau — cell pairs whose spherical
  *    upper bound falls below tau are dropped, survivors pay the exact
  *    cosine. On clustered (real) corpora the bound kills most cell
  *    pairs; on diffuse data it degrades gracefully toward the blocked
  *    all-pairs floor rather than dropping duplicates.
  *
  * Every route is gated: DedupSpec checks the exact route pair-for-pair
  * against brute force, the banded route's component recall on a planted
  * 0.99-cosine corpus, and the moderate-tau pruned route label-for-label
  * against the exact route on the fixture.
  */
object SemanticDedup {

  /** Below this tau the banded route's per-pair recall is no longer
    * near-certain, so the scale branch uses provably-complete centroid
    * pruning instead (see object doc). */
  val BandedTauFloor = 0.8

  private val MaxDim = 1024

  /** Same seeded-literal hyperplane family as [[ExactPairsTopK]] (plane
    * index offset so the two operators stay independent). */
  private def planeComponents(plane: Int): Array[Float] = {
    val rng = new scala.util.Random(0x51ed2701L + plane)
    Array.fill(MaxDim)(rng.nextFloat() * 2 - 1)
  }

  /** (vec_id, lbl, kept): component label (min reachable vec_id; own id
    * when isolated) and survivor flag per vector. */
  def flags(embeddings: DataFrame, tau: Double, planes: Int = 16,
            bands: Int = 4, directMax: Long = 8192): DataFrame = {
    // mirror ExactPairsTopK's ceiling: directMax bounds a deliberate
    // O(n²/2) broadcast exact join — a careless caller must not be able
    // to route an unbounded corpus into it
    require(directMax <= 65536,
      s"directMax $directMax exceeds the blocked all-pairs ceiling 2^16")
    // signature bits live in one Long (1L << i per plane)
    require(planes <= 63, s"planes $planes overflows a 64-bit signature")
    val spark = embeddings.sparkSession
    graft.functions.GraftFunctions.register(spark)
    // one-scan routing probe (shared lineage on derived frames)
    val (n, shared) = graft.core.SizeProbe.count(embeddings)
    val pairs =
      if (n <= directMax) exactPairs(shared, tau)
      else if (tau >= BandedTauFloor) bandedPairs(shared, tau, planes, bands)
      else ExactPairsTopK.thresholdPairs(shared, tau)
    val comps = DedupGroups.components(pairs)
      .select(col("v").as("vec_id"), col("lbl"))
    shared.select(col("vec_id"))
      .join(comps, Seq("vec_id"), "left")
      .select(col("vec_id"),
        coalesce(col("lbl"), col("vec_id")).as("lbl"))
      .withColumn("kept", col("lbl") === col("vec_id"))
  }

  private def normed(embeddings: DataFrame): DataFrame = {
    import graft.functions.GraftFunctions.dot
    embeddings.select(col("vec_id"), col("embedding"),
      dot(col("embedding"), col("embedding")).as("nrm"))
  }

  private def simCol: org.apache.spark.sql.Column = {
    import graft.functions.GraftFunctions.dot
    dot(col("ea"), col("eb")) / (sqrt(col("na")) * sqrt(col("nb")))
  }

  /** Exact small-route: broadcast nested-loop threshold join, bounded
    * ≤ directMax²/2 candidate dots by the routing. */
  private def exactPairs(embeddings: DataFrame, tau: Double): DataFrame = {
    val spark = embeddings.sparkSession
    val n = normed(embeddings)
    val a = n.select(col("vec_id").as("d1"), col("embedding").as("ea"),
        col("nrm").as("na"))
      .repartition(spark.sparkContext.defaultParallelism)
    val b = n.select(col("vec_id").as("d2"), col("embedding").as("eb"),
      col("nrm").as("nb"))
    a.join(broadcast(b), col("d1") < col("d2"))
      .filter(simCol >= tau)
      .select("d1", "d2")
  }

  /** The banded (band, bits)-keyed row set behind [[bandedPairs]] and the
    * candidate-count diagnostic. */
  private def bandedFrame(embeddings: DataFrame, planes: Int,
                          bands: Int): DataFrame = {
    graft.functions.GraftFunctions.register(embeddings.sparkSession)
    import graft.functions.GraftFunctions.dot
    require(planes % bands == 0, s"planes $planes not divisible by $bands")
    val r = planes / bands
    val sig = (0 until planes).map { i =>
      val proj = dot(col("embedding"), typedLit(planeComponents(i)))
      when(proj > 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)
    normed(embeddings).withColumn("sig", sig)
      .localCheckpoint(eager = false)
      .select(col("vec_id"), col("embedding"), col("nrm"),
        explode(array((0 until bands).map { b =>
          struct(lit(b).as("band"),
            shiftright(col("sig"), b * r)
              .bitwiseAND(lit((1L << r) - 1)).as("bits"))
        }: _*)).as("bb"))
      .select(col("vec_id"), col("embedding"), col("nrm"),
        col("bb.band").as("band"), col("bb.bits").as("bits"))
  }

  /** Banded scale route: only same-band vectors pay an exact cosine; a
    * pair appears once per shared band, so `distinct()` inside
    * [[DedupGroups.components]]' edge build dedups the multi-band hits. */
  private def bandedPairs(embeddings: DataFrame, tau: Double, planes: Int,
                          bands: Int): DataFrame = {
    val banded = bandedFrame(embeddings, planes, bands)
    val a = banded.select(col("band"), col("bits"), col("vec_id").as("d1"),
      col("embedding").as("ea"), col("nrm").as("na"))
    val b = banded.select(col("band"), col("bits"), col("vec_id").as("d2"),
      col("embedding").as("eb"), col("nrm").as("nb"))
    a.join(b, Seq("band", "bits"))
      .filter(col("d1") < col("d2") && simCol >= tau)
      .select("d1", "d2")
  }

  /** Work-metric diagnostic (StressSpec): how many same-band candidate
    * pairs the banded route pays an exact cosine for — Σ over (band,
    * bits) buckets of C(|bucket|, 2). The complexity claim lives here,
    * not in wall-clock: banding is honest when this is far below the
    * all-pairs n(n−1)/2. */
  private[graft] def bandedCandidateCount(embeddings: DataFrame,
                                          planes: Int = 16,
                                          bands: Int = 4): Long =
    bandedFrame(embeddings, planes, bands)
      .groupBy("band", "bits").agg(count(lit(1)).as("c"))
      .agg(coalesce(sum(col("c") * (col("c") - 1)), lit(0L)).as("s"))
      .head().getLong(0) / 2
}
