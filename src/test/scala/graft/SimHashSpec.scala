package graft

import graft.core.Tables
import graft.operators.SimHashBanding
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Banded SimHash candidates must cover the exact Hamming-scan pairs
  * (pigeonhole: ≤4 diffs over 5 bands ⇒ one identical band). */
class SimHashSpec extends SparkSuite {

  test("banded candidates equal the exact Hamming<=4 pair set (global)") {
    val d = sf("0.01")
    // reuse the fingerprint construction from q_dedup_simhash by deriving
    // fingerprints from the query's own building blocks: recompute via the
    // public query then strip the bucket restriction using the operator
    val exact = SparkEntry.queries("q_dedup_simhash")(spark, d)
      .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    // fingerprints per doc (same hash pipeline as the query, all buckets)
    val tok = Tables.documents(spark, d)
      .select(col("doc_id"), col("lang"), col("source"),
        explode(array_distinct(split(col("text"), " "))).as("tok"))
      .withColumn("h", aggregate(filter(split(col("tok"), ""), c => c =!= ""),
        lit(7L), (acc, c) => (acc * 31 + ascii(c)) % 2147483647L))
    val bits = (0 until 30).map { b =>
      when(sum(when(shiftright(col("h"), b).bitwiseAND(1) === 1, 1).otherwise(-1)) > 0,
        lit(1L << b)).otherwise(0L)
    }.reduce(_ + _)
    val fp = tok.groupBy("doc_id", "lang", "source").agg(bits.as("simhash"))

    val banded = SimHashBanding.bandedPairs(fp.select("doc_id", "simhash"),
      maxHamming = 4)
    val bandedSet = banded.select("d1", "d2").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    // exact (bucketed) pairs must all be found by the global banded scan
    val missed = exact -- bandedSet
    assert(missed.isEmpty, s"banding missed ${missed.size} of ${exact.size} pairs")

    // and the banded set must itself be Hamming-correct (no false positives
    // survive the verify step)
    banded.collect().foreach(r => assert(r.getInt(r.fieldIndex("hamming")) <= 4))
  }

  test("density routing is invisible: direct ≡ banded ≡ routed pair sets") {
    val d = sf("0.01")
    val tok = Tables.documents(spark, d)
      .select(col("doc_id"), col("lang"), col("source"),
        explode(array_distinct(split(col("text"), " "))).as("tok"))
      .withColumn("h", aggregate(filter(split(col("tok"), ""), c => c =!= ""),
        lit(7L), (acc, c) => (acc * 31 + ascii(c)) % 2147483647L))
    val bits = (0 until 30).map { b =>
      when(sum(when(shiftright(col("h"), b).bitwiseAND(1) === 1, 1).otherwise(-1)) > 0,
        lit(1L << b)).otherwise(0L)
    }.reduce(_ + _)
    val fp = tok.groupBy("doc_id", "lang", "source").agg(bits.as("simhash"))
    val buckets = Seq("lang", "source")

    def pairSet(df: org.apache.spark.sql.DataFrame) =
      df.select("d1", "d2", "hamming").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet

    val direct = pairSet(SimHashBanding.directPairs(fp, 4, buckets))
    val band = pairSet(SimHashBanding.bandedPairs(fp, 4, buckets))
    assert(direct === band, "direct and banded plans disagree")
    // routed-all-direct (threshold above every bucket) and routed-all-banded
    // (threshold 0) both equal the same set — the routing statistic cannot
    // change the answer
    val routedSmall = pairSet(SimHashBanding.pairs(fp, 4, buckets, directMax = 1000000L))
    val routedLarge = pairSet(SimHashBanding.pairs(fp, 4, buckets, directMax = 0L))
    assert(routedSmall === direct && routedLarge === direct,
      "adaptive routing changed the pair set")
  }
}
