package graft

import graft.core.Tables
import graft.operators.IncrementalLoad
import org.apache.spark.sql.functions._

/** Incremental upsert semantics (the reference's daily-build pattern). */
class EtlSpec extends SparkSuite {

  test("incremental upsert: incoming wins, non-colliding rows survive") {
    val d = sf("0.001")
    val all = Tables.orders(spark, d)
    val day1 = all.filter(col("o_orderkey") < 1000)
    // day2 re-files half of day1 (amended prices) plus new orders
    val day2 = all.filter(col("o_orderkey") >= 500 && col("o_orderkey") < 1500)
      .withColumn("o_totalprice", col("o_totalprice") + 1.0)
    val merged = IncrementalLoad.upsert(day1, day2, "o_orderkey")

    val expectKeys = all.filter(col("o_orderkey") < 1500)
      .select("o_orderkey").distinct().count()
    assert(merged.select("o_orderkey").distinct().count() == expectKeys)
    assert(merged.count() == expectKeys, "no duplicate keys after upsert")
    // amended rows must carry the day2 price
    val amended = merged.filter(col("o_orderkey") === 500).collect()(0)
    val orig = all.filter(col("o_orderkey") === 500).collect()(0)
    assert(amended.getDouble(amended.fieldIndex("o_totalprice")) ==
      orig.getDouble(orig.fieldIndex("o_totalprice")) + 1.0)
    // upsert is idempotent: replaying day2 changes nothing
    val again = IncrementalLoad.upsert(merged, day2, "o_orderkey")
    assert(again.count() == merged.count())
  }
}
