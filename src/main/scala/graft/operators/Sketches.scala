package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable data sketches as DataFrame builders — the fixed-size
  * summaries a 100 TB profiling pass ships instead of raw keys:
  * HyperLogLog (cardinality), count–min (frequency), KMV (cardinality
  * with set algebra), Bloom bits (membership). Each builder returns the
  * sketch AS A FRAME in exact integer pieces, so sketches from different
  * partitions / days / sources merge with plain SQL (max for HLL, sum
  * for CMS, merge-and-keep-k for KMV, union for Bloom) and hash-match
  * across engines — no opaque binary blobs, no FP in the build.
  *
  * All hashes derive from md5 (identical in Spark and DuckDB), so the
  * q_sketch_* oracle queries pin these builders bit-for-bit against an
  * independent engine, and the s_stream_hll / s_stream_cms streaming
  * twins run the SAME builders as streaming aggregations (the merge IS
  * the state update).
  *
  * Scale shape: every builder is one map-side-combinable exchange over
  * the input (the per-key count, the distinct, or nothing at all) with
  * the sketch-sized rollup riding bounded frames. Estimator helpers that
  * fold a sketch run driver-side over ≤ sketch-size rows — documented
  * metadata-scale collects.
  */
object Sketches {

  /** 60-bit md5 key hash — positive, uniform, engine-portable. */
  def hv60(key: Column): Column =
    conv(substring(md5(key.cast("string")), 1, 15), 16, 10).cast("long")

  private def log2(m: Int): Int = {
    require(m > 1 && (m & (m - 1)) == 0, s"m must be a power of two: $m")
    java.lang.Integer.numberOfTrailingZeros(m)
  }

  /** HyperLogLog register table (bucket, register) over the VALUES of
    * `key` — duplicates are harmless (max absorbs them), so the input
    * needs no pre-distinct. rho is exact: the position of the lowest
    * set bit of the (60 − log₂ m)-bit suffix via length(bin(w & -w)),
    * with the all-zero suffix pinned one past the max position. */
  def hllRegisters(df: DataFrame, key: String, m: Int = 64): DataFrame = {
    val bBits = log2(m)
    val wBits = 60 - bBits
    df.select(hv60(col(key)).as("hv"))
      .select((col("hv") % m).as("bucket"), expr(s"hv div $m").as("w"))
      .select(col("bucket"),
        when(col("w") === 0, (wBits + 1).toLong)
          .otherwise(length(bin(expr("w & -w"))).cast("long")).as("rho"))
      .groupBy("bucket").agg(max("rho").cast("long").as("register"))
  }

  /** Raw HLL harmonic estimate from a register frame (≤ m rows — a
    * documented metadata-scale collect). Empty buckets count at rho 0. */
  def hllEstimate(registers: DataFrame, m: Int = 64): Double = {
    val regs = registers.collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val alpha = m match {
      case 16 => 0.673
      case 32 => 0.697
      case 64 => 0.709
      case _ => 0.7213 / (1 + 1.079 / m)
    }
    val sumInv = (0 until m).map(b =>
      math.pow(2, -regs.getOrElse(b.toLong, 0L).toDouble)).sum
    alpha * m * m / sumInv
  }

  /** Count–min counter grid (r, bkt, counter) with `depth` independent
    * md5-derived rows of `width` buckets; `weight` (default: one per
    * input row) adds exactly. Mergeable by (r, bkt) sum. */
  def cmsCounters(df: DataFrame, key: String, depth: Int = 4,
                  width: Int = 256, weight: Option[String] = None): DataFrame = {
    val w = weight.map(col).getOrElse(lit(1L)).cast("long")
    df.select(col(key).as("k"), w.as("wt"),
        explode(expr(s"sequence(0L, ${depth - 1}L)")).as("r"))
      .select(col("r"), cmsBucket(col("r"), col("k"), width), col("wt"))
      .groupBy("r", "bkt")
      .agg(sum("wt").cast("long").as("counter"))
  }

  private def cmsBucket(r: Column, key: Column, width: Int): Column =
    (conv(substring(md5(concat(r.cast("string"), lit(":"),
      key.cast("string"))), 1, 8), 16, 10).cast("long") % width).as("bkt")

  /** Point-lookup estimates for `probes`: each key's MIN over its
    * `depth` counters — never below the true total (the one-sided CMS
    * guarantee). The counter grid broadcasts (≤ depth·width rows). */
  def cmsLookup(counters: DataFrame, probes: DataFrame, key: String,
                depth: Int = 4, width: Int = 256): DataFrame =
    probes.select(col(key).as("k"),
        explode(expr(s"sequence(0L, ${depth - 1}L)")).as("r"))
      .select(col("k"), col("r"), cmsBucket(col("r"), col("k"), width))
      .join(broadcast(counters), Seq("r", "bkt"))
      .groupBy("k")
      .agg(min("counter").cast("long").as("est_cnt"))

  /** KMV sketch: the k smallest 60-bit hashes of the distinct key set,
    * ranked 1..k (one distinct exchange + TakeOrdered — no global
    * sort). Merge = union-and-keep-k-smallest. */
  def kmv(df: DataFrame, key: String, k: Int = 64): DataFrame =
    df.select(col(key).as("k")).distinct()
      .select(hv60(col("k")).as("hv"))
      .orderBy("hv").limit(k)
      .select(row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy("hv"))
        .cast("long").as("r"), col("hv"))

  /** Unbiased KMV estimate (k−1)·2⁶⁰/h₍ₖ₎ from a sketch frame (≤ k
    * rows — a documented metadata-scale collect). Returns the exact
    * distinct count when the key set is smaller than k. */
  def kmvEstimate(sketch: DataFrame, k: Int = 64): Double = {
    val rows = sketch.orderBy("r").collect()
    if (rows.length < k) rows.length.toDouble
    else (k - 1).toDouble * math.pow(2, 60) / rows.last.getLong(1).toDouble
  }

  /** Bucketed ("stochastic averaging") KMV: the hash space split into k
    * equal ranges by the TOP hash bits, minimum hash kept per range — a
    * ≤ k-row sketch whose merge is per-bucket MIN. Unlike the global
    * bottom-k ([[kmv]], which needs a total order and a single-reducer
    * TakeOrdered step), this form is a plain hash aggregation: map-side
    * combine collapses every partition to ≤ k cells, and the SAME
    * builder runs as a Structured Streaming state update
    * (s_stream_kmv — the state IS the sketch). Duplicates are harmless
    * (min absorbs them), so the input needs no pre-distinct. */
  def kmvBuckets(df: DataFrame, key: String, k: Int = 64): DataFrame = {
    require(k > 1 && (k & (k - 1)) == 0, s"k must be a power of two: $k")
    val r = (1L << 60) / k
    df.select(hv60(col(key)).as("hv"))
      .groupBy(expr(s"hv div $r").as("bucket"))
      .agg(min("hv").cast("long").as("min_hv"))
  }

  /** MinCount estimate from a bucketed-KMV frame (≤ k rows — a
    * documented metadata-scale collect). Dense regime (every bucket
    * occupied): each normalized minimum m/r is ≈ Exp(n_i)-distributed,
    * their sum ≈ Gamma(k, k/n), so k(k−1)/Σ inverts it with variance
    * ~ n²/(k−2) — bounded tails, unlike summing per-bucket inverses
    * (one lucky tiny minimum would dominate). Sparse regime (empty
    * buckets remain): bucket occupancy is a balls-in-bins census, and
    * the linear-counting inversion k·ln(k/empty) is the tighter read.
    * Constant-factor accuracy either way (the specs gate bands); the
    * tight estimator remains bottom-k [[kmvEstimate]] — this form's
    * value is the streaming-mergeable shape. */
  def kmvBucketsEstimate(sketch: DataFrame, k: Int = 64): Double = {
    val r = (1L << 60) / k
    val rows = sketch.collect()
    if (rows.length < k) {
      k.toDouble * math.log(k.toDouble / (k - rows.length).toDouble)
    } else {
      val sumU = rows.iterator.map { row =>
        val m = row.getLong(1) - row.getLong(0) * r
        (m + 1).toDouble / r.toDouble
      }.sum
      k.toDouble * (k - 1).toDouble / sumU
    }
  }

  /** Walsh-hyperplane LSH signatures (vec_id, band, sig): bands ×
    * bitsPerBand deterministic ±1 hyperplanes (sign_j(i) = parity of
    * bit_count(i & (j+1)) — no stored random matrix), each bit the
    * sign of an EXACT µ-quantized integer dot product, packed
    * bitsPerBand to a band. Entirely ROW-LOCAL (one codegen'd
    * projection — the hyperplane×coordinate expansion never leaves
    * the row); cosine-similar vectors collide in some band with
    * probability 1−(1−(1−θ/π)^b)^bands.
    *
    * PRECONDITION: the vector dimension must exceed the largest mask
    * bands·bitsPerBand. Hyperplane j's sign pattern is the parity of
    * `i & (j+1)` over coordinate index i — with dimension ≤ the mask,
    * the high hyperplanes see a constant sign across all coordinates
    * and degenerate to constant bits, silently weakening LSH
    * discrimination. The dimension is data-carried (per-row arrays),
    * so the bound is documented here and the static require below caps
    * the mask range rather than probing the data. */
  def walshSignatures(df: DataFrame, vecCol: String, idCol: String,
                      bands: Int = 4, bitsPerBand: Int = 4): DataFrame = {
    require(bands * bitsPerBand <= 16,
      s"bands*bitsPerBand = ${bands * bitsPerBand} exceeds 16: masks j+1 " +
        "past 16 degenerate unless vectors carry dim > mask (see scaladoc)")
    df.select(col(idCol).as("vec_id"), explode(expr(
      s"""transform(sequence(0, ${bands - 1}), b -> named_struct(
         |  'band', CAST(b AS BIGINT),
         |  'sig', aggregate(sequence(0, ${bitsPerBand - 1}), 0L,
         |    (acc, t) ->
         |    acc + IF(aggregate(
         |        transform($vecCol, (x, i) ->
         |          IF(bit_count(CAST(i AS BIGINT)
         |               & (b * $bitsPerBand + t + 1)) % 2 = 0,
         |             CAST(FLOOR(CAST(x AS DOUBLE) * 1000000) AS BIGINT),
         |             -CAST(FLOOR(CAST(x AS DOUBLE) * 1000000)
         |               AS BIGINT))),
         |        0L, (a, v) -> a + v) >= 0,
         |      CAST(shiftleft(1, CAST(t AS INT)) AS BIGINT), 0L))))"""
        .stripMargin)).as("bs"))
      .select(col("vec_id"), col("bs.band").as("band"),
        col("bs.sig").as("sig"))
  }

  /** Per-band bucket census over LSH signatures: bucket count, vector
    * mass, max bucket, and the exact banded candidate volume
    * Σ c·(c−1) — the LSH join's cost measured without materializing a
    * single pair. Both rollups combine map-side to ≤ 2^bitsPerBand
    * cells per partition. */
  def lshBandCensus(signatures: DataFrame): DataFrame =
    signatures.groupBy("band", "sig")
      .agg(count(lit(1)).cast("long").as("cnt"))
      .groupBy("band")
      .agg(count(lit(1)).cast("long").as("n_buckets"),
        sum("cnt").cast("long").as("n_vecs"),
        max("cnt").cast("long").as("max_bucket"),
        sum(col("cnt") * (col("cnt") - 1)).cast("long")
          .as("cand_pairs_x2"))

  /** Bloom bit set (bit) for the distinct `key` values: `hashes`
    * md5-derived positions in [0, bits). Merge = union/distinct. */
  def bloomBits(df: DataFrame, key: String, bits: Int = 65536,
                hashes: Int = 2): DataFrame =
    df.select(col(key).as("k")).distinct()
      .select(col("k"), explode(expr(s"sequence(0L, ${hashes - 1}L)")).as("r"))
      .select((conv(substring(md5(concat(col("r").cast("string"), lit(":"),
        col("k").cast("string"))), 1, 8), 16, 10).cast("long")
        % bits).as("bit"))
      .distinct()

  /** Streaming-safe Bloom bit histogram (bit, n_hits): the same bit SET
    * as [[bloomBits]] (a bit is present ⇔ n_hits ≥ 1) built as ONE
    * aggregation — no pre-distinct stage — so it runs unchanged as a
    * streaming state update (s_stream_bloom) where two chained stateful
    * distincts would not. n_hits counts raw (key, hash) arrivals;
    * merge = SUM, monotone across micro-batches. */
  def bloomHits(df: DataFrame, key: String, bits: Int = 65536,
                hashes: Int = 2): DataFrame =
    df.select(col(key).as("k"),
        explode(expr(s"sequence(0L, ${hashes - 1}L)")).as("r"))
      .select((conv(substring(md5(concat(col("r").cast("string"), lit(":"),
        col("k").cast("string"))), 1, 8), 16, 10).cast("long")
        % bits).as("bit"))
      .groupBy("bit")
      .agg(count(lit(1)).cast("long").as("n_hits"))

  /** Probe a bit set: claimed ⇔ ALL `hashes` positions present. NEVER
    * false-negative; false positives at the usual (1−e^(−hn/m))^h rate.
    * The bit frame broadcasts (≤ bits rows — the production shape of a
    * bloom-pruned join). */
  def bloomProbe(bitsDf: DataFrame, probes: DataFrame, key: String,
                 bits: Int = 65536, hashes: Int = 2): DataFrame =
    probes.select(col(key).as("k")).distinct()
      .select(col("k"), explode(expr(s"sequence(0L, ${hashes - 1}L)")).as("r"))
      .select(col("k"),
        (conv(substring(md5(concat(col("r").cast("string"), lit(":"),
          col("k").cast("string"))), 1, 8), 16, 10).cast("long")
          % bits).as("bit"))
      .join(broadcast(bitsDf), Seq("bit"))
      .groupBy("k").agg(count(lit(1)).as("nhit"))
      .where(col("nhit") === hashes)
      .select(col("k"))

  // ------------------------------------------------------ quantiles

  /** HDR-histogram-style log₂ bucket index of an integer column — the
    * MERGEABLE QUANTILE sketch that completes the family (CMS =
    * frequency, HLL/KMV = cardinality, Bloom = membership, this =
    * rank). Buckets: values 0..15 exact; above, 8 sub-buckets per
    * octave — index 16 + (bitlen−5)·8 + (3 bits below the MSB) — so a
    * bucket's width is ≤ 1/8 of its lower bound and a midpoint read is
    * within 6.25 % relative error. Negatives mirror to −1−bucket(−v),
    * keeping bucket order = value order. ALL-INTEGER and row-local, so
    * the sketch is deterministic to the bit across engines and
    * partitionings — q_sketch_quantile is ORACLE-hashed, where
    * DDSketch/t-digest (FP logs, merge-order-dependent centroids)
    * could only ever be tolerance-gated. State: ≤ 16 + 8·59 buckets
    * per sign at ANY input volume; merge = count addition. */
  def hdrBucket(v: Column): Column = {
    def pos(av: Column): Column = {
      val o = length(bin(av)) // bitlen
      // 2^(o-4) via pow: exact in double well past any 63-bit value's
      // octave, and a plain arithmetic shift stays codegen'd without
      // needing a column-shift builtin
      val p = pow(lit(2.0), (o - 4).cast("double")).cast("long")
      when(av < 16, av.cast("long"))
        .otherwise(lit(16L) + (o - 5).cast("long") * 8L +
          ((av - av % p) / p).cast("long") % 8L)
    }
    when(v >= 0, pos(v)).otherwise(lit(-1L) - pos(-v))
  }

  /** Inclusive [lo, hi] value bounds of an [[hdrBucket]] index. */
  def hdrBounds(b: Column): (Column, Column) = {
    def oct(pb: Column): Column = ((pb - 16L) - (pb - 16L) % 8L) / 8L + 5L
    def p(pb: Column): Column =
      pow(lit(2.0), (oct(pb) - 4).cast("double")).cast("long")
    def posLo(pb: Column): Column =
      when(pb < 16, pb.cast("long"))
        .otherwise((((pb - 16L) % 8L) + 8L).cast("long") * p(pb))
    def posHi(pb: Column): Column =
      when(pb < 16, pb.cast("long"))
        .otherwise(posLo(pb) + p(pb) - 1L)
    val lo = when(b >= 0, posLo(b)).otherwise(-posHi(lit(-1L) - b))
    val hi = when(b >= 0, posHi(b)).otherwise(-posLo(lit(-1L) - b))
    (lo, hi)
  }

  /** The sketch: (bucket, n) counters over `valueCol` (integer-typed).
    * One map-side-combinable aggregation — and the SAME builder is the
    * streaming state update (s_stream_quantile: counts only grow,
    * merge IS addition). */
  def hdrCounters(df: DataFrame, valueCol: String): DataFrame =
    df.select(hdrBucket(col(valueCol).cast("long")).as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("n"))

  /** Quantile read: for each q (percent), the first bucket whose
    * cumulative count reaches ceil(q·n/100), with its exact value
    * bounds — the true rank-q element is INSIDE [lo, hi] by
    * construction (the one-sided guarantee the spec pins). Runs as a
    * window over the ≤ few-hundred-row sketch. */
  def hdrQuantiles(counters: DataFrame, qs: Seq[Int]): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .orderBy("bucket").rowsBetween(Long.MinValue, 0)
    val tot = broadcast(counters.agg(sum("n").as("total")))
    val cum = counters.withColumn("c", sum("n").over(w)).crossJoin(tot)
    val spine = counters.sparkSession.range(1)
      .select(explode(lit(qs.toArray)).as("q"))
    val (lo, hi) = hdrBounds(col("bucket"))
    cum.join(broadcast(spine),
        col("c") * 100 >= col("q") * col("total"))
      .groupBy("q").agg(min("bucket").as("bucket"))
      .select(col("q").cast("long").as("q_pct"), col("bucket"),
        lo.as("est_lo"), hi.as("est_hi"))
      .orderBy("q_pct")
  }
}
