package graft

import graft.core.Tables
import org.apache.spark.sql.functions._

/** SURVEY §5.2.3 algebraic laws over the fixtures. */
class PropertySpec extends SparkSuite {

  test("exact dedup is idempotent") {
    val docs = Tables.documents(spark, sf("0.001"))
    val surv1 = docs.withColumn("h", md5(col("text")))
      .withColumn("m", min("doc_id").over(
        org.apache.spark.sql.expressions.Window.partitionBy("h")))
      .filter(col("doc_id") === col("m")).drop("h", "m")
    val surv2 = surv1.withColumn("h", md5(col("text")))
      .withColumn("m", min("doc_id").over(
        org.apache.spark.sql.expressions.Window.partitionBy("h")))
      .filter(col("doc_id") === col("m")).drop("h", "m")
    assert(surv1.count() == surv2.count())
  }

  test("d2d equals the JVM's correctly-rounded decimal-to-double (1000 randoms)") {
    // d2d's split conversion (floor→long→double + small exact fraction)
    // must land on the SAME double as BigDecimal.doubleValue for every
    // value in its contract range (scale ≤ 4, |x| < 1e13) — including
    // negatives and unscaled values past 2^53.
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val samples = Seq.fill(1000) {
      val unscaled = BigInt(rnd.nextLong() % 10000000000000000L)
      BigDecimal(unscaled, 4)
    } ++ Seq(BigDecimal("0.0001"), BigDecimal("-0.0001"), BigDecimal(0),
      BigDecimal("9999999999999.9999"), BigDecimal("-9999999999999.9999"))
    val df = samples.map(_.toString).toDF("s")
      .select(col("s").cast("decimal(21,4)").as("x"))
    val got = df.select(col("x"), graft.core.Dsl.d2d(col("x")).as("d"))
      .collect()
    got.foreach { r =>
      val x = r.getDecimal(0)
      val expect = x.doubleValue()
      assert(r.getDouble(1) == expect,
        s"d2d($x) = ${r.getDouble(1)} != correctly-rounded $expect")
    }
  }

  test("jaccard scores are within [0,1] and d1 < d2") {
    val rows = SparkEntry.queries("q_text_jaccard_pairs")(spark, sf("0.001")).collect()
    rows.foreach { r =>
      val j = r.getDouble(r.fieldIndex("jac"))
      assert(j >= 0.0 && j <= 1.0)
      assert(r.getLong(r.fieldIndex("d1")) < r.getLong(r.fieldIndex("d2")))
    }
  }

  test("cosine(v, v) == 1 within 1e-12") {
    import org.apache.spark.sql.Column
    def dot(a: Column, b: Column) =
      aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
        lit(0.0), (acc, v) => acc + v)
    val e = Tables.embeddings(spark, sf("0.001")).limit(50)
    val sims = e.select((dot(col("embedding"), col("embedding")) /
        (sqrt(dot(col("embedding"), col("embedding"))) *
          sqrt(dot(col("embedding"), col("embedding"))))).as("s"))
      .collect().map(_.getDouble(0))
    sims.foreach(s => assert(math.abs(s - 1.0) < 1e-12))
  }

  test("sessionization conserves events and bounds sessions") {
    val sess = SparkEntry.queries("q_sessionize")(spark, sf("0.001")).collect()
    val total = Tables.events(spark, sf("0.001")).count()
    assert(sess.map(r => r.getLong(r.fieldIndex("n_events"))).sum == total)
    sess.foreach { r =>
      assert(!r.getAs[java.time.LocalDateTime]("session_start")
        .isAfter(r.getAs[java.time.LocalDateTime]("session_end")))
    }
  }

  test("running sum final value equals group total") {
    val run = SparkEntry.queries("q_window_running")(spark, sf("0.001"))
    val last = run.groupBy("user_id").agg(max("run_sum").as("m"))
    // max over a cumulative sum of positive values = final value
    val direct = Tables.events(spark, sf("0.001")).groupBy("user_id")
      .agg(sum(col("value").cast("decimal(18,4)")).cast("decimal(18,4)").as("t"))
    val joined = last.join(direct, "user_id")
      .filter(col("m") =!= col("t"))
    assert(joined.count() == 0)
  }

  test("union-all cardinality law") {
    val out = SparkEntry.queries("q_union_all")(spark, sf("0.001")).collect()
    val total = out.map(_.getLong(1)).sum
    val expect = Tables.customer(spark, sf("0.001")).count() +
      Tables.supplier(spark, sf("0.001")).count()
    assert(total == expect)
  }

  test("intersect + except partition the signup pair set") {
    val d = sf("0.001")
    def pairs(t: String) = Tables.events(spark, d)
      .filter(col("event_type") === t)
      .select(col("user_id"), date_trunc("day", col("ts")).as("d")).distinct()
    val s = pairs("signup"); val e = pairs("error")
    assert(s.intersect(e).count() + s.except(e).count() == s.count())
  }

  test("approx_count_distinct is within 10% of exact") {
    val approx = SparkEntry.queries("cap_agg_approx")(spark, sf("0.01"))
      .collect()(0).getLong(0)
    val exact = Tables.orders(spark, sf("0.01"))
      .select(countDistinct(col("o_custkey"))).collect()(0).getLong(0)
    assert(math.abs(approx - exact).toDouble / exact < 0.10)
  }

  test("merged HLL partials track exact distinct counts and the single-pass sketch") {
    val d = sf("0.01")
    val merged = SparkEntry.queries("cap_agg_sketch_merge")(spark, d)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val exact = Tables.orders(spark, d)
      .groupBy("o_orderstatus").agg(countDistinct(col("o_custkey")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val onePass = Tables.orders(spark, d)
      .groupBy("o_orderstatus")
      .agg(hll_sketch_estimate(hll_sketch_agg(col("o_custkey"), lit(12))).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(merged.keySet == exact.keySet)
    for ((k, n) <- exact; (parts, est) = merged(k)) {
      assert(parts > 1, s"$k: expected multiple monthly partials, got $parts")
      // Union of partials is NOT bit-identical to the one-pass sketch
      // (sparse partials promote through a different register path), but
      // both must sit inside HLL's error envelope of each other and of
      // the exact count.
      assert(math.abs(est - onePass(k)).toDouble / onePass(k) < 0.03,
        s"$k: merged $est vs one-pass ${onePass(k)}")
      assert(math.abs(est - n).toDouble / n < 0.05, s"$k: $est vs exact $n")
    }
  }

  test("approx_percentile is within 1% of the exact percentiles") {
    val d = sf("0.01")
    val approx = SparkEntry.queries("cap_agg_approx_percentile")(spark, d)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val exact = SparkEntry.queries("q_agg_percentile")(spark, d)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(approx.keySet == exact.keySet)
    for ((k, (e50, e90)) <- exact; (a50, a90) = approx(k)) {
      assert(math.abs(a50 - e50) / e50 < 0.01, s"$k p50: $a50 vs $e50")
      assert(math.abs(a90 - e90) / e90 < 0.01, s"$k p90: $a90 vs $e90")
    }
  }

  test("KS numerator is symmetric in the samples (4 random groups × 400 rows)") {
    // |n2·F1 − n1·F2| is invariant under swapping which sample is
    // "first" — a wrong cumulative pairing breaks this immediately.
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val rows = Seq.fill(400)((rnd.nextInt(4).toString,
      rnd.nextInt(30).toLong, rnd.nextInt(2).toLong))
    val df = rows.toDF("g", "v", "isa")
    val fwd = graft.operators.ExactStats.ksNumerator(df, "g", "v", "isa")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val swapped = df.withColumn("isa", lit(1L) - col("isa"))
    val bwd = graft.operators.ExactStats.ksNumerator(swapped, "g", "v", "isa")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(fwd.keySet == bwd.keySet)
    fwd.foreach { case (g, (n1, n2, num)) =>
      val (bn1, bn2, bnum) = bwd(g)
      assert(bn1 == n2 && bn2 == n1 && bnum == num,
        s"group $g: ($n1,$n2,$num) vs swapped ($bn1,$bn2,$bnum)")
    }
  }

  test("AUC complement law: negating the score flips AUC to 1 − AUC") {
    // With midrank ties, U(score) + U(−score) = n⁺n⁻ exactly — the
    // doubled numerators must sum to the doubled denominator half.
    import spark.implicits._
    val rnd = new scala.util.Random(29)
    val rows = Seq.fill(500)((rnd.nextInt(40).toLong, rnd.nextInt(2).toLong))
    val df = rows.toDF("v", "pos")
    val a = graft.operators.ExactStats.aucExact(df, "v", "pos").head()
    val b = graft.operators.ExactStats
      .aucExact(df.withColumn("v", -col("v")), "v", "pos").head()
    assert(a.getLong(0) == b.getLong(0) && a.getLong(1) == b.getLong(1))
    assert(a.getLong(3) == b.getLong(3), "denominator must not move")
    assert(a.getLong(2) + b.getLong(2) == a.getLong(3),
      s"num(v) ${a.getLong(2)} + num(−v) ${b.getLong(2)} != den ${a.getLong(3)}")
  }
}
