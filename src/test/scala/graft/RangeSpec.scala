package graft

import org.apache.spark.sql.functions._

/** RangeBinJoin: the pure range join (no equi key) must match the
  * nested-loop theta join pair-for-pair while planning as a hash join on
  * the bin id — the claim that survives a large interval side at 100 TB.
  */
class RangeSpec extends SparkSuite {

  // planted: 20k points, 2k intervals of irregular width over [0, 1e6)
  private def fixture = {
    import spark.implicits._
    val rnd = new scala.util.Random(51)
    val pts = (0 until 20000).map(i => (i.toLong, rnd.nextDouble() * 1e6))
      .toDF("p_id", "x")
    val ivs = (0 until 2000).map { i =>
      val lo = rnd.nextDouble() * 1e6
      (i.toLong, lo, lo + rnd.nextDouble() * 2000)
    }.toDF("iv_id", "lo", "hi")
    (pts.localCheckpoint(eager = false), ivs.localCheckpoint(eager = false))
  }

  test("bin join == nested-loop theta join, derived and explicit widths") {
    val (pts, ivs) = fixture
    val want = pts.join(ivs, col("x") >= col("lo") && col("x") <= col("hi"))
      .select("p_id", "iv_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(want.nonEmpty)
    for (w <- Seq(None, Some(1000.0), Some(97.0))) {
      val got = graft.operators.RangeBinJoin
        .pointInInterval(pts, ivs, "x", "lo", "hi", w)
        .select("p_id", "iv_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == want, s"binWidth=$w diverged from the theta join")
    }
  }

  test("interval-overlap join == nested-loop theta join (emit-once, no dupes)") {
    import spark.implicits._
    val rnd = new scala.util.Random(53)
    val a = (0 until 4000).map { i =>
      val lo = rnd.nextDouble() * 1e6
      (i.toLong, lo, lo + rnd.nextDouble() * 3000)
    }.toDF("a_id", "alo", "ahi").localCheckpoint(eager = false)
    val b = (0 until 2000).map { i =>
      val lo = rnd.nextDouble() * 1e6
      (i.toLong, lo, lo + rnd.nextDouble() * 800)
    }.toDF("b_id", "blo", "bhi").localCheckpoint(eager = false)
    val want = a.join(b, col("alo") <= col("bhi") && col("blo") <= col("ahi"))
      .select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(want.nonEmpty && want.length == want.distinct.length)
    for (w <- Seq(None, Some(500.0), Some(1700.0))) {
      val got = graft.operators.RangeBinJoin
        .intervalOverlap(a, b, "alo", "ahi", "blo", "bhi", w)
        .select("a_id", "b_id").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      assert(got.length == got.distinct.length,
        s"binWidth=$w emitted duplicate pairs")
      assert(got.toSet == want.toSet, s"binWidth=$w diverged from theta join")
    }
  }

  test("inverted intervals match nothing instead of throwing") {
    import spark.implicits._
    val pts = Seq((1L, 5.0)).toDF("p_id", "x")
    val ivs = Seq((1L, 0.0, 10.0), (2L, 10.0, 0.0)).toDF("iv_id", "lo", "hi")
    val got = graft.operators.RangeBinJoin
      .pointInInterval(pts, ivs, "x", "lo", "hi")
      .select("iv_id").collect().map(_.getLong(0)).toSeq
    assert(got == Seq(1L))
  }

  test("q_join_range plans a hash join on the bin id, not a nested loop") {
    val p = SparkEntry.queries("q_join_range")(spark, sf("0.001"))
      .queryExecution.executedPlan.toString
    // the point↔interval join must be a HASH join keyed on the computed
    // bin with the exact range residual attached; since round 8 the
    // width is a driver-resolved literal, so NO nested loop of any kind
    // remains in the tree (the wide-outlier route only exists when the
    // probe sees one, and these bands are uniform)
    assert(p.contains("HashJoin [__bin"),
      s"range join is not a bin-keyed hash join:\n${p.take(1500)}")
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"),
      s"width literal should have removed all nested loops:\n${p.take(1500)}")
    val hashJoinLine = p.linesIterator
      .find(l => l.contains("HashJoin [__bin")).get
    assert(hashJoinLine.contains(">=") && hashJoinLine.contains("<="),
      s"range residual missing from the hash join:\n$hashJoinLine")
  }

  test("range joins match the nested loop across randomized geometries") {
    import spark.implicits._
    // seeded property sweep: negative domains, zero-length and inverted
    // intervals, random or derived bin widths — every configuration must
    // be pair-identical to the nested-loop theta join
    val rnd = new scala.util.Random(97)
    for (round <- 1 to 3) {
      val scale = rnd.nextDouble() * 1e5 + 10
      val pts = (0 until 500 + rnd.nextInt(1000))
        .map(i => (i.toLong, (rnd.nextDouble() - 0.5) * scale))
        .toDF("p_id", "x").localCheckpoint(eager = false)
      val ivs = (0 until 200 + rnd.nextInt(600)).map { i =>
        val lo = (rnd.nextDouble() - 0.5) * scale
        val len = rnd.nextInt(4) match {
          case 0 => 0.0               // degenerate point interval
          case 1 => -scale * 0.01     // inverted: matches nothing
          case _ => rnd.nextDouble() * scale * 0.05
        }
        (i.toLong, lo, lo + len)
      }.toDF("iv_id", "lo", "hi").localCheckpoint(eager = false)
      val w = if (rnd.nextBoolean()) None
        else Some(rnd.nextDouble() * scale * 0.1 + 1e-3)
      val wantPt = pts.join(ivs, col("x") >= col("lo") && col("x") <= col("hi"))
        .select("p_id", "iv_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val gotPt = graft.operators.RangeBinJoin
        .pointInInterval(pts, ivs, "x", "lo", "hi", w)
        .select("p_id", "iv_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(gotPt == wantPt, s"pointInInterval round $round (w=$w)")
      // overlap: points widened to random tolerance windows vs the same
      // interval set
      val hw = rnd.nextDouble() * scale * 0.02
      val aIv = pts.select(col("p_id"),
        (col("x") - hw).as("alo"), (col("x") + hw).as("ahi"))
      val wantOv = aIv.join(ivs,
          col("alo") <= col("hi") && col("lo") <= col("ahi"))
        .select("p_id", "iv_id").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      val gotOv = graft.operators.RangeBinJoin
        .intervalOverlap(aIv, ivs, "alo", "ahi", "lo", "hi", w)
        .select("p_id", "iv_id").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      assert(gotOv.length == gotOv.distinct.length,
        s"intervalOverlap round $round emitted duplicates")
      assert(gotOv.toSet == wantOv.toSet, s"intervalOverlap round $round (w=$w)")
    }
  }

  test("optimizer rule rewrites the bare BETWEEN theta join to a hash join") {
    val (pts, ivs) = fixture
    val theta = pts.join(ivs, col("x") >= col("lo") && col("x") <= col("hi"))
    val want = theta.select("p_id", "iv_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // without the rule: Spark has no equi key → nested loop
    assert(theta.queryExecution.executedPlan.toString
      .contains("BroadcastNestedLoopJoin"))
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ graft.plans.RangeBinJoinRewrite
    spark.conf.set("spark.graft.rangeJoin.binWidth", "1000")
    try {
      val rewritten = pts.join(ivs,
        col("x") >= col("lo") && col("x") <= col("hi"))
      val plan = rewritten.queryExecution.executedPlan.toString
      assert(plan.contains("HashJoin") && plan.contains("__bin"),
        s"rule did not produce a bin hash join:\n${plan.take(1200)}")
      assert(!plan.contains("BroadcastNestedLoopJoin"))
      val got = rewritten.select("p_id", "iv_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == want, "rewritten join diverged from the theta join")
      // conf unset → the rule is inert, plan reverts to the nested loop
      spark.conf.unset("spark.graft.rangeJoin.binWidth")
      assert(pts.join(ivs, col("x") >= col("lo") && col("x") <= col("hi"))
        .queryExecution.executedPlan.toString
        .contains("BroadcastNestedLoopJoin"))
    } finally {
      spark.conf.unset("spark.graft.rangeJoin.binWidth")
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations
          .filterNot(_ eq graft.plans.RangeBinJoinRewrite)
    }
  }

  test("rewrite rule leaves equi-keyed and non-range joins untouched") {
    val (pts, ivs) = fixture
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ graft.plans.RangeBinJoinRewrite
    spark.conf.set("spark.graft.rangeJoin.binWidth", "1000")
    try {
      // equi key present → Spark's own hash join, no __bin anywhere
      val equi = pts.join(ivs, col("p_id") === col("iv_id") &&
        col("x") >= col("lo") && col("x") <= col("hi"))
      assert(!equi.queryExecution.optimizedPlan.toString.contains("__bin"))
      // one-sided bound only → not a range join, untouched
      val half = pts.join(ivs, col("x") >= col("lo"))
      assert(!half.queryExecution.optimizedPlan.toString.contains("__bin"))
    } finally {
      spark.conf.unset("spark.graft.rangeJoin.binWidth")
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations
          .filterNot(_ eq graft.plans.RangeBinJoinRewrite)
    }
  }

  test("over-wide outlier intervals route to the clamp, exactly (r7 advice)") {
    import spark.implicits._
    // one interval 10^8 wide at binWidth=1 would explode to 10^8 bins
    // (sequence() element blow-up); the clamp must route it to the
    // broadcast theta side and keep the result pair-identical
    val pts = (0 until 2000).map(i => (i.toLong, i * 97.0 % 100000))
      .toDF("p_id", "x").localCheckpoint(eager = false)
    val ivs = ((0 until 200).map { i =>
      val lo = i * 500.0
      (i.toLong, lo, lo + 40.0)
    } :+ ((999L, 0.0, 1e8))).toDF("iv_id", "lo", "hi")
      .localCheckpoint(eager = false)
    val want = pts.join(ivs, col("x") >= col("lo") && col("x") <= col("hi"))
      .select("p_id", "iv_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(want.count(_._2 == 999L) == 2000, "outlier must cover every point")
    val got = graft.operators.RangeBinJoin
      .pointInInterval(pts, ivs, "x", "lo", "hi", Some(1.0))
      .select("p_id", "iv_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want, "clamped plan diverged from the theta join")
    // derived width + a tight clamp: same exactness through the wide route
    val gotDerived = graft.operators.RangeBinJoin
      .pointInInterval(pts, ivs, "x", "lo", "hi", None, maxBinsPerInterval = 16)
      .select("p_id", "iv_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(gotDerived == want, "derived-width clamp diverged from the theta join")
    // overlap form: widen points to windows, keep the outlier on the right
    val aIv = pts.select(col("p_id"), (col("x") - 10).as("alo"),
      (col("x") + 10).as("ahi"))
    val wantOv = aIv.join(ivs, col("alo") <= col("hi") && col("lo") <= col("ahi"))
      .select("p_id", "iv_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val gotOv = graft.operators.RangeBinJoin
      .intervalOverlap(aIv, ivs, "alo", "ahi", "lo", "hi", Some(1.0))
      .select("p_id", "iv_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(gotOv.length == gotOv.distinct.length, "clamped overlap emitted dupes")
    assert(gotOv.toSet == wantOv, "clamped overlap diverged from the theta join")
  }

  test("caller-supplied binWidth past the wide-row cap fails fast (r8 advice)") {
    import spark.implicits._
    // a pathologically small caller width makes EVERY interval wide; with
    // a derived width Markov bounds the broadcast side, but here nothing
    // does — the probe must count the wide rows and refuse, not broadcast
    // the whole interval table (wideRowCap pinned low, the size-routing
    // test discipline)
    val pts = (0 until 100).map(i => (i.toLong, i.toDouble)).toDF("p_id", "x")
    val ivs = (0 until 50).map { i =>
      (i.toLong, i * 2.0, i * 2.0 + 100.0)
    }.toDF("iv_id", "lo", "hi")
    val e = intercept[IllegalArgumentException] {
      graft.operators.RangeBinJoin.pointInInterval(
        pts, ivs, "x", "lo", "hi", Some(1e-6), wideRowCap = 10)
    }
    assert(e.getMessage.contains("broadcast-safe"))
    val e2 = intercept[IllegalArgumentException] {
      graft.operators.RangeBinJoin.intervalOverlap(
        pts.select(col("p_id"), col("x").as("alo"), (col("x") + 5).as("ahi")),
        ivs, "alo", "ahi", "lo", "hi", Some(1e-6), wideRowCap = 10)
    }
    assert(e2.getMessage.contains("broadcast-safe"))
    // the same widths clear an adequate cap and stay exact
    val want = pts.join(ivs, col("x") >= col("lo") && col("x") <= col("hi"))
      .count()
    val got = graft.operators.RangeBinJoin.pointInInterval(
      pts, ivs, "x", "lo", "hi", Some(1e-6), wideRowCap = 50).count()
    assert(got == want, "capped route diverged once under the cap")
  }

  test("invalid binWidth conf is ignored, not a planner crash (r7 advice)") {
    val (pts, ivs) = fixture
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ graft.plans.RangeBinJoinRewrite
    try {
      for (bad <- Seq("not-a-number", "0", "-5", "NaN", "Infinity")) {
        spark.conf.set("spark.graft.rangeJoin.binWidth", bad)
        // the rule must stay inert (nested loop, no __bin) — and, above
        // all, planning must not throw
        val plan = pts.join(ivs, col("x") >= col("lo") && col("x") <= col("hi"))
          .queryExecution.executedPlan.toString
        assert(!plan.contains("__bin"), s"rule fired on binWidth='$bad'")
      }
    } finally {
      spark.conf.unset("spark.graft.rangeJoin.binWidth")
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations
          .filterNot(_ eq graft.plans.RangeBinJoinRewrite)
    }
  }

  test("candidate volume stays near the output size (work metric)") {
    val (pts, ivs) = fixture
    // with w = mean interval length (~1000), candidates = pairs sharing a
    // bin; the deterministic work-volume claim vs the 40M-pair nested loop
    val w = 1000.0
    val binned = pts.withColumn("__bin", floor(col("x") / w))
      .groupBy("__bin").agg(count(lit(1)).as("np"))
    val ivBins = ivs.filter(col("hi") >= col("lo"))
      .withColumn("__bin", explode(sequence(
        floor(col("lo") / w), floor(col("hi") / w))))
      .groupBy("__bin").agg(count(lit(1)).as("ni"))
    val cand = binned.join(ivBins, "__bin")
      .agg(coalesce(sum(col("np") * col("ni")), lit(0L)))
      .head().getLong(0)
    val out = graft.operators.RangeBinJoin
      .pointInInterval(pts, ivs, "x", "lo", "hi", Some(w)).count()
    val nm = 20000L * 2000L
    info(s"candidates $cand vs output $out vs nested-loop $nm pairs " +
      f"(${nm.toDouble / cand}%.0fx pruned)")
    assert(cand < nm / 100, s"bin join examined $cand of $nm pairs")
  }
}
