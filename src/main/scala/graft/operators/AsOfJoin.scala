package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** As-of join (no native Spark operator; SURVEY §2.3 q_join_asof, §4.2).
  *
  * `leftAsOf(l, r, keys, lTime, rTime)`: for every left row, the single
  * right row with the greatest rTime strictly before lTime among matching
  * keys — LEFT semantics (unmatched left rows survive with nulls).
  *
  * Composition: left-join on (keys, rTime < lTime) then max(rTime) per
  * left row. Output carries the matched right timestamp; joining further
  * right-side payload columns is a second equi-join on (keys, rTime).
  * Every shuffle is on the key columns, so bucketed/pre-partitioned inputs
  * ([[BucketedLayout]]) run it shuffle-free; a dedicated SparkStrategy
  * (single partitioned merge pass) is the documented future optimization.
  */
object AsOfJoin {

  def leftAsOf(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTime: String, rightTime: String,
               asOfCol: String = "asof_time"): DataFrame = {
    val r = right.select(
      keys.map(k => col(k).as(s"__r_$k")) :+ col(rightTime).as("__r_t"): _*)
    val cond = keys.map(k => col(k) === col(s"__r_$k")).reduce(_ && _) &&
      col("__r_t") < col(leftTime)
    val leftCols = left.columns.toSeq
    left.join(r, cond, "left")
      .groupBy(leftCols.map(col): _*)
      .agg(max(col("__r_t")).as(asOfCol))
  }
}
