package graft

import graft.core.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** HistogramRank (the scale-safe positional-value primitive behind
  * q_agg_percentile / q_window_ntile) must return exactly what the
  * global-window form returns — including first/middle/last positions of
  * every group — and must stay parallel under pathological value skew
  * (adaptive bounds + hot-value tie split; no hardcoded bucket widths).
  */
class RankSpec extends SparkSuite {

  test("HistogramRank values match the global-window row_number form") {
    val orders = Tables.orders(spark, sf("0.01"))
      .select(col("o_orderstatus"), col("o_totalprice").as("v"))
    val nDf = orders.groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
    val positions = nDf.select(col("o_orderstatus"),
      explode(array(lit(0L), (col("n") / 2).cast("long"), col("n") - 1)).as("pos"))
    // directMax = 0 forces the histogram machinery (the default routing
    // would send these sf0.01 groups to the small/window branch, which the
    // routing tests below already cover)
    val got = graft.operators.HistogramRank
      .valuesAtPositions(orders, "o_orderstatus", "v", positions, directMax = 0)
      .collect().map(r => (r.getString(0), r.getLong(1), r.get(2).toString)).toSet
    val w = Window.partitionBy("o_orderstatus").orderBy("v")
    val want = orders.withColumn("i", row_number().over(w).cast("long") - 1)
      .join(positions.withColumnRenamed("o_orderstatus", "st"),
        col("o_orderstatus") === col("st") && col("i") === col("pos"))
      .select(col("o_orderstatus"), col("pos"), col("v"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.get(2).toString)).toSet
    assert(got == want)
    assert(got.size == positions.count())
  }

  test("HistogramRank recursion level (tiny fan-out) still matches") {
    val orders = Tables.orders(spark, sf("0.001"))
      .select(col("o_orderstatus"), col("o_totalprice").as("v"))
    val nDf = orders.groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
    val positions = nDf.select(col("o_orderstatus"),
      explode(array(lit(1L), (col("n") / 3).cast("long"), col("n") - 2)).as("pos"))
      .filter(col("pos") >= 0)
    // buckets = 4 forces every target bucket to be multi-valued ⇒ the
    // recursive finer-histogram path runs (depth 2), then local sorts
    val got = graft.operators.HistogramRank
      .valuesAtPositions(orders, "o_orderstatus", "v", positions, buckets = 4,
        directMax = 0)
      .collect().map(r => (r.getString(0), r.getLong(1), r.get(2).toString)).toSet
    val w = Window.partitionBy("o_orderstatus").orderBy("v")
    val want = orders.withColumn("i", row_number().over(w).cast("long") - 1)
      .join(positions.withColumnRenamed("o_orderstatus", "st"),
        col("o_orderstatus") === col("st") && col("i") === col("pos"))
      .select(col("o_orderstatus"), col("pos"), col("v"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.get(2).toString)).toSet
    assert(got == want)
  }

  test("HistogramRank returns nothing for past-the-end positions") {
    val orders = Tables.orders(spark, sf("0.001"))
      .select(col("o_orderstatus"), col("o_totalprice").as("v"))
    val past = orders.groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
      .select(col("o_orderstatus"), col("n").as("pos"))
    val got = graft.operators.HistogramRank
      .valuesAtPositions(orders, "o_orderstatus", "v", past, directMax = 0)
    assert(got.count() == 0)
    val gotSmall = graft.operators.HistogramRank
      .valuesAtPositions(orders, "o_orderstatus", "v", past)
    assert(gotSmall.count() == 0)
  }

  test("withGlobalRank is exact and stays parallel when one value holds 90%") {
    import spark.implicits._
    // 2000 rows, 1800 share value 42.0; unique tie keys
    val rows = (0 until 2000).map { i =>
      (if (i < 1800) 42.0 else 100.0 + i % 37, i.toLong)
    }
    val df = rows.toDF("v", "k")
    val ranked = graft.operators.HistogramRank.withGlobalRank(
      df, "v", Seq("k"), rankCol = "r", buckets = 64, hotGroup = 100,
      keepBuckets = true, directMax = 0)
    val w = Window.orderBy("v", "k")
    val want = df.withColumn("r", row_number().over(w).cast("long"))
      .select("v", "k", "r").collect().map(x => (x.getDouble(0), x.getLong(1), x.getLong(2))).toSet
    val got = ranked.select("v", "k", "r").collect()
      .map(x => (x.getDouble(0), x.getLong(1), x.getLong(2))).toSet
    assert(got == want)
    // the hot value's 1800 rows must be spread over many tie sub-buckets —
    // each (__hb, __tb) pair is an independent parallel sort partition
    val hotBuckets = ranked.filter(col("v") === 42.0)
      .select(countDistinct(col("__tb"))).collect()(0).getLong(0)
    info(s"hot value split over $hotBuckets tie buckets")
    assert(hotBuckets >= 16, s"hot value sorted in only $hotBuckets buckets")
  }

  test("size routing is invisible: both branches engaged ≡ window form") {
    import spark.implicits._
    // group "a": 50 rows (routes small), group "b": 400 rows (routes large)
    // with directMax = 100 — the routed union must equal the window form
    val rows = (0 until 50).map(i => ("a", i * 3.0)) ++
      (0 until 400).map(i => ("b", (i * 7919 % 401).toDouble))
    val df = rows.toDF("g", "v")
    val positions = Seq(("a", 0L), ("a", 24L), ("a", 49L),
      ("b", 0L), ("b", 199L), ("b", 399L)).toDF("g", "pos")
    val got = graft.operators.HistogramRank
      .valuesAtPositions(df, "g", "v", positions, directMax = 100)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    val w = Window.partitionBy("g").orderBy("v")
    val want = df.withColumn("i", row_number().over(w).cast("long") - 1)
      .join(positions.withColumnRenamed("g", "g2"),
        col("g") === col("g2") && col("i") === col("pos"))
      .select(col("g"), col("pos"), col("v"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == want)
    assert(got.size == 6)
  }

  test("withGlobalRank routed small branch ≡ histogram branch ≡ window") {
    import spark.implicits._
    val rows = (0 until 3000).map(i => ((i * 6151 % 997).toDouble, i.toLong))
    val df = rows.toDF("v", "k")
    def ranks(directMax: Long) = graft.operators.HistogramRank
      .withGlobalRank(df, "v", Seq("k"), rankCol = "r", buckets = 64,
        directMax = directMax)
      .select("v", "k", "r").collect()
      .map(x => (x.getDouble(0), x.getLong(1), x.getLong(2))).toSet
    val w = Window.orderBy("v", "k")
    val want = df.withColumn("r", row_number().over(w).cast("long"))
      .select("v", "k", "r").collect()
      .map(x => (x.getDouble(0), x.getLong(1), x.getLong(2))).toSet
    assert(ranks(directMax = 1L << 20) == want) // small/window branch
    assert(ranks(directMax = 0) == want)        // histogram branch
  }

  test("valuesAtPositions answers skewed-median from the no-sort branch") {
    import spark.implicits._
    // one value holds 90% of rows ⇒ the median bucket is single-valued and
    // must resolve directly (correctness is what we can observe; the
    // single-valued shortcut guarantees no sort of the dominant bucket)
    val rows = (0 until 5000).map { i =>
      ("g", if (i < 4500) 7.5 else i.toDouble)
    }
    val df = rows.toDF("g", "v")
    val positions = Seq(("g", 2500L), ("g", 0L), ("g", 4999L)).toDF("g", "pos")
    val got = graft.operators.HistogramRank
      .valuesAtPositions(df, "g", "v", positions, directMax = 0)
      .collect().map(r => (r.getLong(1), r.getDouble(2))).toMap
    val w = Window.partitionBy("g").orderBy("v")
    val want = df.withColumn("i", row_number().over(w).cast("long") - 1)
      .filter(col("i").isin(2500L, 0L, 4999L))
      .collect().map(r => (r.getLong(2), r.getDouble(1))).toMap
    assert(got == want)
  }
}
