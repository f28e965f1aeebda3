package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Density-aware SimHash near-dup pair generation — the linear-scale form
  * of q_dedup_simhash's bucket self-join.
  *
  * Two physical plans, routed per bucket by MEASURED bucket size:
  *
  *  - small buckets (≤ `directMax` docs): the plain bucket equi-self-join
  *    the oracle spells out — m²/2 codegen'd xor/bit_count comparisons per
  *    bucket, no explode, no extra shuffle. At ≤ 8k docs a bucket that is
  *    ≤ 34M cheap comparisons inside one task: fractions of a second.
  *  - large buckets: banded candidate generation. Pigeonhole guarantee:
  *    split a 30-bit fingerprint into 5 bands of 6 bits; any pair with
  *    Hamming distance ≤ 4 differs in at most 4 bands, so at least one
  *    band is identical — an equi-join on (band_idx, band_value) finds
  *    every such pair, linear in candidates instead of O(m²) per bucket.
  *
  * Why route at all (the round-3 lesson, BENCH_r03): on a duplicate-dense
  * corpus near-identical fingerprints collide on MOST bands, so banding
  * produces up to Bands× the candidates of the direct join it replaces —
  * measured 4.5× slower on this fixture, where no (lang, source) bucket
  * exceeds ~112 docs. Banding only pays when m²/2 per-bucket work dwarfs
  * the candidate count, i.e. for buckets too large to cross — exactly the
  * 100 TB case. The routing statistic is a metadata-scale aggregate
  * (one count per bucket, broadcast); both plans are exact (banding
  * verifies candidates with the true Hamming distance), so routing cannot
  * change the result set — SimHashSpec asserts direct ≡ banded ≡ routed.
  */
object SimHashBanding {

  private val Bands = 5
  private val BandBits = 6

  /** Hamming ≤ maxHamming pairs (d1 < d2) from a (doc_id, simhash) frame,
    * routed per bucket: direct self-join for buckets ≤ `directMax` docs,
    * banded candidate generation above. `bucketCols` (e.g. lang/source)
    * restrict pairs to the same bucket. Requires maxHamming < bands.
    *
    * EAGER PROBE (the blessed SizeProbe idiom, as in
    * [[RangeBinJoin.pointInInterval]]): building the returned frame runs
    * a bucket-size aggregation — Spark jobs fire at CONSTRUCTION time,
    * the input fingerprints are snapshotted via localCheckpoint, and
    * routing is frozen against that snapshot. Callers that construct but
    * never execute still pay the probe; nondeterministic inputs are
    * routed on the materialized snapshot, never re-observed.
    *
    * `bands` × `bandBits` is the banding geometry. WIDTH MUST SCALE WITH
    * BUCKET DENSITY: a band's value space is 2^bandBits, so expected
    * candidates are bands · 2^bandBits · C(m/2^bandBits, 2) per bucket —
    * at 50k docs in one bucket a 30-bit fingerprint pays ~95M candidate
    * comparisons where a 60-bit one (5×12) pays ~1.5M (measured in
    * StressSpec). [[fingerprints64]] builds the wide form.
    *
    * `bandBits = 0` (the default since round 10) AUTO-SIZES from the
    * probe: bandBits ≈ log₂(maxBucket / (bands·c)) — the documented
    * production rule `planes ≈ bands·log₂(n/(bands·c))` with occupancy
    * target c = 4 — clamped to the bits the fingerprints actually carry
    * (measured off the probe's max fingerprint), so callers can no
    * longer under-size the bucket space as the corpus grows. Banding on
    * a PREFIX of the fingerprint keeps the pigeonhole guarantee (≤
    * maxHamming differing bits in total ⇒ ≤ maxHamming differing bands
    * over ANY bit subset) and the final filter always verifies the
    * full-width Hamming distance, so auto-sizing is plan-only — the
    * pair set is bit-identical at every width (SimHashSpec). */
  def pairs(fingerprints: DataFrame, maxHamming: Int,
            bucketCols: Seq[String] = Nil,
            directMax: Long = 8192,
            bands: Int = Bands, bandBits: Int = 0): DataFrame = {
    require(maxHamming < bands,
      s"pigeonhole needs maxHamming < $bands bands")
    require(bandBits == 0 || bands * bandBits <= 63,
      s"$bands x $bandBits bits overflows a 64-bit fingerprint")
    // lineage barrier: the (expensive) fingerprint aggregation feeds the
    // size statistic plus both sides of both join branches — without it
    // the tokenize+30-bit-sum subtree re-runs up to 5×
    val fp = fingerprints.localCheckpoint(eager = false)
    val sizes =
      if (bucketCols.isEmpty)
        fp.groupBy().agg(count(lit(1)).as("__bn"), max(col("simhash")).as("__mx"))
      else fp.groupBy(bucketCols.map(col): _*)
        .agg(count(lit(1)).as("__bn"), max(col("simhash")).as("__mx"))
    // one-row routing probe (round-8, the SizeProbe idiom): when EVERY
    // bucket sits on one side of the threshold, build only that branch —
    // the common small-bucket case drops the per-bucket-size broadcast
    // join, the empty banded subtree and the union from the plan
    // entirely, and the probe doubles as the checkpoint materializer so
    // the query plan starts from the cached fingerprints
    // (q_dedup_simhash: 5 shuffles/6 broadcasts → 1/1). Routing stays
    // bit-exact: the skipped branch was provably empty, and mixed
    // densities fall through to the per-bucket two-branch plan.
    val bounds = sizes.agg(
      coalesce(max(col("__bn")), lit(0L)),
      coalesce(min(col("__bn")), lit(0L)),
      coalesce(max(col("__mx")), lit(0L))).head()
    val (maxBucket, minBucket) = (bounds.getLong(0), bounds.getLong(1))
    // observed fingerprint width off the same probe (no extra job): the
    // position of the highest bit any fingerprint sets. Slightly
    // UNDER-measuring width (no doc happens to set the top bit) only
    // narrows the auto clamp — still correct, marginally less pruning.
    val availBits = 64 - java.lang.Long.numberOfLeadingZeros(bounds.getLong(2) | 1L)
    val bb = if (bandBits > 0) bandBits
             else autoBandBits(maxBucket, bands, availBits)
    // NO global sort here (round-7 advice): only the gated query needs
    // ORDER BY (d1, d2) for oracle parity and adds it at the query layer;
    // operator callers (DedupGroups component builds, cap counts) would
    // pay a wasted full-range exchange over the pair set at scale.
    if (maxBucket <= directMax) directPairs(fp, maxHamming, bucketCols)
    else if (minBucket > directMax)
      bandedPairs(fp, maxHamming, bucketCols, bands, bb)
    else {
      val sized = fp.join(broadcast(sizes.drop("__mx")), bucketCols)
      val small = sized.filter(col("__bn") <= directMax).drop("__bn")
      val large = sized.filter(col("__bn") > directMax).drop("__bn")
      directPairs(small, maxHamming, bucketCols)
        .unionByName(bandedPairs(large, maxHamming, bucketCols, bands, bb))
    }
  }

  /** The production sizing rule, applied when the caller does not pin
    * `bandBits`: a band's bucket space should hold the densest bucket at
    * ~c docs per (band, value) cell ⇒ bandBits = ⌈log₂(n/(bands·c))⌉,
    * clamped to [1, availBits/bands] (can't band bits the fingerprint
    * doesn't carry) and the 63-bit packing cap. c = 4 keeps expected
    * per-cell self-join work at ~C(4,2)·bands per doc — constant. */
  private[graft] def autoBandBits(maxBucket: Long, bands: Int,
                                  availBits: Int, c: Long = 4): Int = {
    val want = math.ceil(math.log(math.max(maxBucket, 1L).toDouble /
      (bands.toLong * c)) / math.log(2.0)).toInt
    val widthCap = math.max(availBits / bands, 1)
    math.max(1, math.min(want, math.min(widthCap, 63 / bands)))
  }

  /** 60-bit SimHash fingerprints from xxhash64 token hashes — the scale
    * form of the 30-bit oracle-parity tokHash fingerprint (5 bands × 12
    * bits: 64× finer band buckets, same pigeonhole guarantee at
    * maxHamming ≤ 4). One explode + one combinable agg, like the 30-bit
    * builder. Output: (doc_id [, bucketCols...], simhash). */
  def fingerprints64(docs: DataFrame,
                     bucketCols: Seq[String] = Nil): DataFrame = {
    val tok = docs
      .select((Seq(col("doc_id")) ++ bucketCols.map(col) :+
        explode(array_distinct(split(col("text"), " "))).as("tok")): _*)
      .withColumn("h", xxhash64(col("tok")))
    val bits = (0 until 60).map { b =>
      when(sum(when(shiftright(col("h"), b).bitwiseAND(1) === 1, 1)
        .otherwise(-1)) > 0, lit(1L << b)).otherwise(0L)
    }.reduce(_ + _)
    tok.groupBy((col("doc_id") +: bucketCols.map(col)): _*)
      .agg(bits.as("simhash"))
  }

  /** Work-metric diagnostic (StressSpec): same-band candidate pairs the
    * banded route pays an exact Hamming check for — Σ over (band, value)
    * of C(|bucket|, 2). The width-must-scale-with-density claim lives
    * here. */
  private[graft] def bandedCandidateCount(fingerprints: DataFrame,
                                          bands: Int = Bands,
                                          bandBits: Int = BandBits): Long =
    fingerprints.select(explode(array((0 until bands).map { b =>
        shiftright(col("simhash"), b * bandBits)
          .bitwiseAND((1L << bandBits) - 1) * bands + b
      }: _*)).as("bk"))
      .groupBy("bk").agg(count(lit(1)).as("c"))
      .agg(coalesce(sum(col("c") * (col("c") - 1)), lit(0L)))
      .head().getLong(0) / 2

  /** The oracle's own plan: equi-self-join on the bucket columns (a pure
    * cross join when bucketCols is empty — only ever routed to for frames
    * below `directMax` rows), exact Hamming filter. Right when buckets are
    * small or duplicate-dense. */
  def directPairs(fingerprints: DataFrame, maxHamming: Int,
                  bucketCols: Seq[String] = Nil): DataFrame = {
    val a = fingerprints.select(bucketCols.map(col) ++
      Seq(col("doc_id").as("d1"), col("simhash").as("h1")): _*)
    val b = fingerprints.select(bucketCols.map(c => col(c).as(c + "2")) ++
      Seq(col("doc_id").as("d2"), col("simhash").as("h2")): _*)
    val bucketCond = bucketCols.map(c => col(c) === col(c + "2"))
      .foldLeft(col("d1") < col("d2"))(_ && _)
    a.join(b, bucketCond)
      .select(col("d1"), col("d2"),
        bit_count(col("h1").bitwiseXOR(col("h2"))).as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }

  /** Banded candidate generation + exact verification — the large-bucket
    * path. One shuffle on (band, value, bucket) keys; candidates verified
    * with the true Hamming distance. */
  def bandedPairs(fingerprints: DataFrame, maxHamming: Int,
                  bucketCols: Seq[String] = Nil,
                  bands: Int = Bands, bandBits: Int = BandBits): DataFrame = {
    val banded = fingerprints.select(
      (Seq(col("doc_id"), col("simhash")) ++ bucketCols.map(col) :+
        explode(array((0 until bands).map { b =>
          struct(lit(b).as("band"),
            shiftright(col("simhash"), b * bandBits)
              .bitwiseAND((1L << bandBits) - 1).as("bval"))
        }: _*)).as("bb")): _*)
      .select((Seq(col("doc_id"), col("simhash"),
        col("bb.band").as("band"), col("bb.bval").as("bval")) ++
        bucketCols.map(col)): _*)
    val a = banded.select((Seq(col("band"), col("bval"),
      col("doc_id").as("d1"), col("simhash").as("h1")) ++
      bucketCols.map(col)): _*)
    val b = banded.select((Seq(col("band").as("band2"), col("bval").as("bval2"),
      col("doc_id").as("d2"), col("simhash").as("h2")) ++
      bucketCols.map(c => col(c).as(c + "2"))): _*)
    val bucketCond = bucketCols
      .map(c => col(c) === col(c + "2"))
      .foldLeft(lit(true))(_ && _)
    // first-matching-band dedup: a pair colliding on several bands is kept
    // only where every EARLIER band differs — exactly-once per pair with a
    // cheap codegen predicate instead of a distinct() shuffle over the
    // (much larger) candidate set
    def bandVal(h: org.apache.spark.sql.Column, p: Int) =
      shiftright(h, p * bandBits).bitwiseAND((1L << bandBits) - 1)
    // bands == 1 has no earlier band to test — reduce over the empty
    // sequence would throw, and every pair trivially meets in its only
    // band exactly once, so the dedup predicate degenerates to false
    val earlierMatch =
      if (bands <= 1) lit(false)
      else (0 until bands - 1).map { p =>
        col("band") > p && bandVal(col("h1"), p) === bandVal(col("h2"), p)
      }.reduce(_ || _)
    a.join(b, col("band") === col("band2") && col("bval") === col("bval2") &&
        col("d1") < col("d2") && bucketCond && !earlierMatch)
      .select(col("d1"), col("d2"),
        bit_count(col("h1").bitwiseXOR(col("h2"))).as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }
}
