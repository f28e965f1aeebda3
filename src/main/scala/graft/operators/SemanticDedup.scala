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
    * when isolated) and survivor flag per vector.
    *
    * `codecDir`: optional persistence seam for the banded route's PQ
    * codebooks (the [[IvfPq]] save/load pattern). First call fits and
    * saves; later calls load — so a corpus pays the codebook fit once,
    * not once per flags() invocation (round-8's honest ~30 s-at-100 k
    * cost note, closed). A weaker/stale-but-same-dimension codec can
    * never change the result — only the pruning rate (the conservative
    * bound, [[PqCodec]] doc); a codec for a different dimension fails
    * fast. */
  def flags(embeddings: DataFrame, tau: Double, planes: Int = 16,
            bands: Int = 4, directMax: Long = 8192,
            codecDir: Option[String] = None): DataFrame = {
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
      else if (tau >= BandedTauFloor)
        bandedPairs(shared, tau, planes, bands, n, codecDir)
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

  /** Hyperplane sign signature over `vecCol`; the sign of ⟨v, plane⟩ is
    * scale-invariant, so raw and unit-normalized inputs bucket
    * identically (the PQ and float routes share band geometry). */
  private def signatureCol(vecCol: String, planes: Int): org.apache.spark.sql.Column = {
    import graft.functions.GraftFunctions.dot
    (0 until planes).map { i =>
      val proj = dot(col(vecCol), typedLit(planeComponents(i)))
      when(proj > 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** Explode a frame carrying a `sig` column into its (band, bits) keys,
    * preserving every other column. */
  private def explodeBands(df: DataFrame, planes: Int,
                           bands: Int): DataFrame = {
    require(planes % bands == 0, s"planes $planes not divisible by $bands")
    val r = planes / bands
    df.withColumn("bb", explode(array((0 until bands).map { b =>
        struct(lit(b).as("band"),
          shiftright(col("sig"), b * r)
            .bitwiseAND(lit((1L << r) - 1)).as("bits"))
      }: _*)))
      .withColumn("band", col("bb.band"))
      .withColumn("bits", col("bb.bits"))
      .drop("bb", "sig")
  }

  /** The float (band, bits)-keyed row set behind [[bandedPairsFloat]] and
    * the candidate-count diagnostic. */
  private def bandedFrame(embeddings: DataFrame, planes: Int,
                          bands: Int): DataFrame = {
    graft.functions.GraftFunctions.register(embeddings.sparkSession)
    explodeBands(
      normed(embeddings)
        .withColumn("sig", signatureCol("embedding", planes))
        .localCheckpoint(eager = false),
      planes, bands)
      .select("vec_id", "embedding", "nrm", "band", "bits")
  }

  /** PQ parameters for the banded candidate payload: 8 subspaces × 16
    * codewords = 4-bit codes, all 8 packed into ONE long. */
  private val PqM = 8
  private val PqKsub = 16
  /** Below this corpus size a 16-centroid k-means per subspace is not
    * meaningfully fit — use the float payload (the pre-round-8 plan). */
  private val PqMinRows = 4L * PqKsub

  /** Banded scale route: only same-band vectors pay a distance check; a
    * pair appears once per shared band, so `distinct()` inside
    * [[DedupGroups.components]]' edge build dedups the multi-band hits.
    *
    * Round 8: the band join shuffles PQ-coded candidates — one packed
    * long of 8×4-bit codes plus the exact quantization residual — not
    * `bands` copies of the full float embedding (4·dim+ bytes → 16).
    * Candidates are scored with the SDC table first and only pairs that
    * clear the PROVABLE bound `sdc + ra + rb + ra·rb ≥ tau`
    * ([[PqCodec]] doc) are re-ranked against the true floats via two
    * narrow vec_id joins — so the final pair set is bit-identical to
    * the float plan's (DedupSpec/StressSpec gate it), the bound prunes
    * the exact-cosine work on clustered corpora, and the shuffle pays
    * bytes proportional to codes, not dimensions. Falls back to the
    * float payload when the dimension does not split into [[PqM]]
    * subspaces or the corpus is too small to fit codebooks. */
  private[graft] def bandedPairs(embeddings: DataFrame, tau: Double, planes: Int,
                                 bands: Int, n: Long,
                                 codecDir: Option[String] = None): DataFrame = {
    val dim = embeddings.select(size(col("embedding"))).head().getInt(0)
    if (dim % PqM != 0 || n < PqMinRows)
      return bandedPairsFloat(embeddings, tau, planes, bands)
    graft.functions.GraftFunctions.register(embeddings.sparkSession)
    // unit-normalized copy for the PQ codes (the bound is stated on the
    // unit sphere) — but the RAW embedding rides along because band
    // signatures are computed on it, not on uv: sign is scale-invariant,
    // so mathematically the buckets agree, yet a hyperplane projection
    // within one float ulp of zero could band differently on the
    // float-cast uv (round-8 advice). Signing the same column the float
    // route signs makes the two plans' band geometry IDENTICAL by
    // construction, so the final pair set is bit-equal (DedupSpec gates
    // it pair-for-pair).
    val nf = normed(embeddings)
    val unit = nf.select(col("vec_id"), col("embedding"),
        transform(col("embedding"), x =>
          when(col("nrm") > 0, x.cast("double") / sqrt(col("nrm")))
            .otherwise(lit(0.0)).cast("float")).as("uv"))
      .localCheckpoint(eager = false)
    // bounded-sample codebook fit — the 100 TB design point: k-means cost
    // must not grow with the corpus. A deterministic hash sample of
    // ~16 k vectors trains 16 centroids per subspace just as well, and a
    // weaker codebook can never break exactness — it only inflates
    // residuals, which the conservative bound converts into less pruning,
    // never into dropped pairs.
    val fitRows = 16384L
    val fitInput =
      if (n <= fitRows) unit
      else unit.filter(pmod(xxhash64(col("vec_id")),
        lit(math.max(n / fitRows, 1L))) === 0)
    val spark = embeddings.sparkSession
    // fit-once seam: load a persisted codec when one exists, else fit
    // (and persist when a dir was given) — see [[flags]] scaladoc
    val codec = codecDir.filter(PqCodec.exists(spark, _)) match {
      case Some(d) =>
        val c = PqCodec.load(spark, d)
        require(c.m * c.sub == dim,
          s"persisted codec at $d is for dimension ${c.m * c.sub}, " +
            s"corpus is $dim")
        c
      case None =>
        val c = PqCodec.fit(fitInput, "uv", PqM, PqKsub)
        codecDir.foreach(PqCodec.save(c, _))
        c
    }
    // a persisted codec sized for ADC-only use (m·ksub² beyond the SDC
    // codegen-literal cap — e.g. one saved by an IvfPq build) cannot take
    // the SDC route; degrade to the float-payload plan rather than fail
    // at sdcFlat materialization (round-9 advice)
    if (!codec.sdcCapable)
      return bandedPairsFloat(embeddings, tau, planes, bands)
    // materialize BEFORE the band explode: packed codes + residual are
    // plain column reads in the join, not re-evaluated encode trees
    val coded = unit.select(col("vec_id"),
        signatureCol("embedding", planes).as("sig"),
        PqCodec.packedCol(codec, "uv").as("pq"),
        sqrt(PqCodec.residual2Col(codec, "uv")).as("r"))
      .localCheckpoint(eager = false)
    val banded = explodeBands(coded, planes, bands)
      .select(col("vec_id"), col("pq"), col("r"), col("band"), col("bits"))
    val a = banded.select(col("band"), col("bits"), col("vec_id").as("d1"),
      col("pq").as("pq1"), col("r").as("r1"))
    val b = banded.select(col("band"), col("bits"), col("vec_id").as("d2"),
      col("pq").as("pq2"), col("r").as("r2"))
    // 1e-6 slack: the codec quantizes the FLOAT-cast unit vector, which
    // sits within ~1e-7·√dim of the ideal unit vector the exact re-rank
    // scores — the analytic bound plus this epsilon stays conservative
    val cand = a.join(b, Seq("band", "bits"))
      .filter(col("d1") < col("d2") &&
        PqCodec.sdcSim(codec, col("pq1"), col("pq2")) +
          col("r1") + col("r2") + col("r1") * col("r2") + lit(1e-6) >= tau)
      .select("d1", "d2")
    // exact re-rank: only bound survivors fetch floats, by key
    cand.join(nf.select(col("vec_id").as("d1"), col("embedding").as("ea"),
        col("nrm").as("na")), "d1")
      .join(nf.select(col("vec_id").as("d2"), col("embedding").as("eb"),
        col("nrm").as("nb")), "d2")
      .filter(simCol >= tau)
      .select("d1", "d2")
  }

  /** Float-payload banded plan (fallback + gate twin for the PQ route). */
  private[graft] def bandedPairsFloat(embeddings: DataFrame, tau: Double,
                                      planes: Int, bands: Int): DataFrame = {
    val banded = bandedFrame(embeddings, planes, bands)
    val a = banded.select(col("band"), col("bits"), col("vec_id").as("d1"),
      col("embedding").as("ea"), col("nrm").as("na"))
    val b = banded.select(col("band"), col("bits"), col("vec_id").as("d2"),
      col("embedding").as("eb"), col("nrm").as("nb"))
    a.join(b, Seq("band", "bits"))
      .filter(col("d1") < col("d2") && simCol >= tau)
      .select("d1", "d2")
  }

  /** Work-metric diagnostic (StressSpec): per-row PAYLOAD bytes entering
    * the banded candidate shuffle under the float plan vs the round-8 PQ
    * plan — rows and dimension measured from the actual banded frame,
    * payload from the physical column layout (float array: 4·dim + 16
    * bytes header, + 8 for nrm; PQ: one packed long + one residual
    * double = 16 bytes). The shared key/id columns are identical in both
    * plans and excluded. */
  private[graft] def bandedPayloadBytes(embeddings: DataFrame,
                                        planes: Int = 16,
                                        bands: Int = 4): (Long, Long) = {
    val f = bandedFrame(embeddings, planes, bands)
      .agg(count(lit(1)).as("n"),
        coalesce(sum(size(col("embedding")) * 4 + 16 + 8), lit(0L)).as("fb"))
      .head()
    (f.getLong(1), f.getLong(0) * 16L)
  }

  /** Work-metric diagnostic (StressSpec): how many same-band candidate
    * pairs the banded route pays a distance check for — Σ over (band,
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
