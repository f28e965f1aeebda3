package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Banded SimHash candidate generation — the linear-scale form of
  * q_dedup_simhash's bucket self-join.
  *
  * Pigeonhole guarantee: split a 30-bit fingerprint into 5 bands of 6
  * bits; any pair with Hamming distance ≤ 4 differs in at most 4 bands, so
  * at least one band is identical — an equi-join on (band_idx, band_value)
  * finds every such pair. At 100 TB that is one shuffle on band values
  * (linear in candidates) instead of an O(n²) per-bucket cross join; the
  * exact Hamming check then verifies candidates. SimHashSpec asserts the
  * candidate set covers the exact q_dedup_simhash pairs.
  */
object SimHashBanding {

  private val Bands = 5
  private val BandBits = 6

  /** Hamming ≤ maxHamming pairs (d1 < d2) from a (doc_id, simhash) frame,
    * via banded candidate generation + exact verification. `bucketCols`
    * (e.g. lang/source) are appended to the band equi-join key, restricting
    * pairs to the same bucket without any per-bucket cross join.
    * Requires maxHamming < Bands. */
  def pairs(fingerprints: DataFrame, maxHamming: Int,
            bucketCols: Seq[String] = Nil): DataFrame = {
    require(maxHamming < Bands,
      s"pigeonhole needs maxHamming < $Bands bands")
    val banded = fingerprints.select(
      (Seq(col("doc_id"), col("simhash")) ++ bucketCols.map(col) :+
        explode(array((0 until Bands).map { b =>
          struct(lit(b).as("band"),
            shiftright(col("simhash"), b * BandBits)
              .bitwiseAND((1 << BandBits) - 1).as("bval"))
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
      shiftright(h, p * BandBits).bitwiseAND((1 << BandBits) - 1)
    val earlierMatch = (0 until Bands - 1).map { p =>
      col("band") > p && bandVal(col("h1"), p) === bandVal(col("h2"), p)
    }.reduce(_ || _)
    a.join(b, col("band") === col("band2") && col("bval") === col("bval2") &&
        col("d1") < col("d2") && bucketCond && !earlierMatch)
      .select(col("d1"), col("d2"),
        bit_count(col("h1").bitwiseXOR(col("h2"))).as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .orderBy("d1", "d2")
  }
}
