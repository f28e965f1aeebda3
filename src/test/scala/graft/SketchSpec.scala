package graft

import graft.core.Tables
import graft.operators.HeavyHitters
import org.apache.spark.sql.functions._

/** SpaceSaving heavy-hitters gates. An approximate sketch has no bit-equal
  * oracle; its contract is its INVARIANTS, which hold under any partition
  * split and any merge tree:
  *   - est ≥ true ≥ est − err for every reported key;
  *   - every key whose true count exceeds the m-th (smallest) reported
  *     estimate is present in the summary;
  *   - with m ≥ vocabulary size nothing is ever evicted, so the sketch
  *     IS the exact count table with zero error.
  */
class SketchSpec extends SparkSuite {

  private lazy val terms = Tables.documents(spark, sf("0.001"))
    .select(explode(split(col("text"), " ")).as("term"))
    .filter(length(col("term")) > 0)

  private lazy val exact: Map[String, Long] =
    terms.groupBy("term").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap

  private def sketch(m: Int, parts: Int): Seq[(String, Long, Long)] =
    terms.repartition(parts)
      .agg(HeavyHitters.heavyHitters(m)(col("term")).as("sk"))
      .select(explode(col("sk")).as("e"))
      .select(col("e._1"), col("e._2"), col("e._3"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq

  test("m >= vocabulary: the sketch is the exact count table, zero error") {
    assert(exact.size <= 64, s"fixture vocabulary grew past 64 (${exact.size})")
    for (parts <- Seq(1, 7)) {
      val got = sketch(64, parts)
      assert(got.map { case (t, c, _) => t -> c }.toMap == exact,
        s"parts=$parts: eviction-free sketch must equal exact counts")
      assert(got.forall(_._3 == 0L), s"parts=$parts: nothing evicted => err 0")
    }
  }

  test("m < vocabulary: SpaceSaving invariants hold under any split") {
    for (parts <- Seq(1, 3, 8)) {
      val got = sketch(8, parts)
      assert(got.size == 8)
      got.foreach { case (t, est, err) =>
        val tru = exact.getOrElse(t, 0L)
        assert(est >= tru, s"parts=$parts $t: est $est < true $tru")
        assert(est - err <= tru, s"parts=$parts $t: est-err ${est - err} > true $tru")
      }
      // coverage: every key with true count above the smallest reported
      // estimate is guaranteed present (an absent key's true count is
      // bounded by the merged minimum, which bounds the m-th estimate)
      val minEst = got.map(_._2).min
      val reported = got.map(_._1).toSet
      exact.foreach { case (t, c) =>
        if (c > minEst)
          assert(reported(t), s"parts=$parts: $t (true=$c) missing, minEst=$minEst")
      }
    }
  }

  test("HDR quantile sketch: every value sits inside its own bucket's " +
    "bounds, widths honor the 1/8 law, merge is exact count addition") {
    import spark.implicits._
    import graft.operators.Sketches
    // bounds law over a dense ± range plus far octaves
    val vals = ((-3000L to 3000L) ++
      Seq(1L << 40, -(1L << 40), 123456789L, Long.MaxValue / 4)).toSeq
    val vdf = vals.toDF("v")
    val (lo, hi) = Sketches.hdrBounds(Sketches.hdrBucket(col("v")))
    val rows = vdf.select(col("v"), lo.as("lo"), hi.as("hi")).collect()
    rows.foreach { r =>
      val (v, l, h) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(l <= v && v <= h, s"$v outside its bucket [$l, $h]")
      val m = math.max(math.abs(l), math.abs(h))
      if (math.min(math.abs(l), math.abs(h)) >= 16)
        assert(h - l + 1 <= m / 8 + 1, s"bucket [$l, $h] too wide")
      else assert(h == l || h - l + 1 <= 16, s"small bucket [$l, $h]")
    }
    // bucket order = value order (quantile walks depend on it)
    val ordered = vdf.select(Sketches.hdrBucket(col("v")).as("b"), col("v"))
      .orderBy("v").collect().map(_.getLong(0))
    assert(ordered.sameElements(ordered.sorted), "bucket order broke")
    // merge additivity under any split: counters(A ∪ B) = A-counters
    // sum-merged with B-counters, regardless of partitioning
    val a = (1L to 500L).map(i => i * 7 - 800)
    val b = (1L to 300L).map(i => (i * i) % 5000 - 250)
    def counters(xs: Seq[Long], parts: Int): Map[Long, Long] =
      Sketches.hdrCounters(xs.toDF("v").repartition(parts), "v")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val merged = (counters(a, 3).toSeq ++ counters(b, 5).toSeq)
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    assert(counters(a ++ b, 7) == merged, "merge law broke")
  }
}
