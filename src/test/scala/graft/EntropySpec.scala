package graft

import graft.queries.EntropyQueries
import scala.collection.mutable

/** Gate for cap_text_entropy (round-10 verdict item 4).
  *
  * Tolerance rationale: Spark and this reference run the SAME JVM libm
  * (StrictMath-backed Math.log), so per-term log2 values are bit-identical;
  * the only divergence is floating summation ORDER across partitions.
  * For n ≤ 10⁴ terms the relative error of reordered double summation is
  * bounded by ~n·ε ≈ 10⁴·2⁻⁵² < 10⁻¹¹, so a 1e-9 relative gate is ~100×
  * looser than the worst case while still catching any formula error
  * (wrong base, off-by-one in N, missing term) which shifts results by
  * ≥1e-3 on this corpus.
  */
class EntropySpec extends SparkSuite {

  private def relEq(a: Double, b: Double, tol: Double = 1e-9): Boolean =
    (a == b) || math.abs(a - b) <= tol * math.max(math.abs(a), math.abs(b))

  test("cap_text_entropy matches an in-JVM double reference at sf0.001") {
    val rows = SparkEntry.queries("cap_text_entropy")(spark, sf("0.001"))
      .collect().map(r => r.getLong(0) -> r).toMap
    val docs = spark.read.parquet(sf("0.001") + "/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(docs.nonEmpty && rows.size == docs.length)

    def log2(x: Double): Double = math.log(x) / math.log(2.0)
    // corpus bigram model (MLE)
    val bc = mutable.Map.empty[(String, String), Long].withDefaultValue(0L)
    val cc = mutable.Map.empty[String, Long].withDefaultValue(0L)
    for ((_, text) <- docs) {
      // Spark's split(col, pat) uses limit -1: trailing empties KEPT
      val ts = text.split(" ", -1)
      for (i <- 0 until ts.length - 1) {
        bc((ts(i), ts(i + 1))) += 1
        cc(ts(i)) += 1
      }
    }
    for ((id, text) <- docs) {
      val ts = text.split(" ", -1)
      val row = rows(id)
      // entropy
      val tf = ts.groupBy(identity).map(_._2.length.toDouble)
      val n = ts.length.toDouble
      val h = -tf.map(c => (c / n) * log2(c / n)).sum
      assert(row.getLong(1) == ts.length, s"$id n_tokens")
      assert(relEq(row.getDouble(2), h), s"$id entropy ${row.getDouble(2)} vs $h")
      // bigram perplexity
      if (ts.length >= 2) {
        val lp = (0 until ts.length - 1).map { i =>
          log2(bc((ts(i), ts(i + 1))).toDouble / cc(ts(i)))
        }.sum
        val ppl = math.pow(2.0, -lp / (ts.length - 1))
        assert(row.getLong(3) == ts.length - 1, s"$id n_bigrams")
        assert(relEq(row.getDouble(4), ppl, 1e-6), s"$id ppl ${row.getDouble(4)} vs $ppl")
      } else assert(row.getLong(3) == 0L && row.isNullAt(4))
    }
  }

  test("exact closed-form values on a synthetic corpus") {
    import spark.implicits._
    // Corpus: d1 "a b a b" → bigrams (a,b),(b,a),(a,b); d2 "a a a a" →
    // (a,a)×3; d3 "x" → none. MLE model over the pooled corpus:
    //   cc(a) = 5 (2 from d1, 3 from d2), cc(b) = 1
    //   P(b|a) = 2/5, P(a|b) = 1, P(a|a) = 3/5
    val docs = Seq(("d1", "a b a b"), ("d2", "a a a a"), ("d3", "x")).toDF("doc_id", "text")
    val out = EntropyQueries.entropyFrame(docs).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out("d1").getDouble(2) == 1.0)       // H of uniform {a,b} = 1 bit
    assert(out("d2").getDouble(2) == 0.0)       // degenerate dist
    // d2: PP = 2^(−3·log2(3/5)/3) = 5/3 exactly (up to libm)
    assert(math.abs(out("d2").getDouble(4) - 5.0 / 3.0) < 1e-12)
    assert(out("d3").getLong(3) == 0L && out("d3").isNullAt(4)) // no bigrams
    // d1: lp = 2·log2(2/5) + log2(1); PP = 2^(−lp/3) = (5/2)^(2/3)
    val exp = math.pow(2.5, 2.0 / 3.0)
    assert(math.abs(out("d1").getDouble(4) - exp) < 1e-12)
  }
}
