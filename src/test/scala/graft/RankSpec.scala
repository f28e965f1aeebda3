package graft

import graft.core.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** HistogramRank (the scale-safe positional-value primitive behind
  * q_agg_percentile) must return exactly what the global-window form
  * returns — including first/middle/last positions of every group.
  */
class RankSpec extends SparkSuite {

  test("HistogramRank values match the global-window row_number form") {
    val orders = Tables.orders(spark, sf("0.01"))
      .select(col("o_orderstatus"), col("o_totalprice").as("v"))
    val nDf = orders.groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
    val positions = nDf.select(col("o_orderstatus"),
      explode(array(lit(0L), (col("n") / 2).cast("long"), col("n") - 1)).as("pos"))
    val got = graft.operators.HistogramRank
      .valuesAtPositions(orders, "o_orderstatus", "v", positions, bucketWidth = 1000.0)
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

  test("HistogramRank returns nothing for past-the-end positions") {
    val orders = Tables.orders(spark, sf("0.001"))
      .select(col("o_orderstatus"), col("o_totalprice").as("v"))
    val past = orders.groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
      .select(col("o_orderstatus"), col("n").as("pos"))
    val got = graft.operators.HistogramRank
      .valuesAtPositions(orders, "o_orderstatus", "v", past, bucketWidth = 1000.0)
    assert(got.count() == 0)
  }
}
