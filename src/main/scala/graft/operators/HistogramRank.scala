package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scale-safe value-at-global-sort-position lookup (the primitive behind
  * exact percentiles and ntile boundaries).
  *
  * A `Window.partitionBy(group).orderBy(value)` row_number moves each
  * ENTIRE group into one task — with low-cardinality groups (order status:
  * 3) that is three serial sorts of the whole table at 100 TB. This
  * operator gets the same positional values with no global sort:
  *
  *   1. coarse value histogram per (group, bucket) — one aggregated pass,
  *      bucket count bounded by the value domain / width, not by rows;
  *   2. running-sum offsets over the histogram (a window over AGGREGATED
  *      metadata-scale rows only);
  *   3. each requested position lands in exactly one bucket (offset ≤ pos
  *      < offset + count) — only THOSE buckets' rows are locally sorted
  *      (small, parallel partitions) and rank = bucket offset + local
  *      row_number.
  *
  * Equal-value ties are interchangeable by construction (ranks differ only
  * within runs of identical values), so the value at each position is
  * deterministic even though row order within a tie is not.
  */
object HistogramRank {

  /** Global 1-based ascending rank for EVERY row, no global sort: the
    * same histogram-offset decomposition, but every bucket gets its local
    * row_number (parallel, small partitions) plus the broadcast offset.
    * Used by q_window_ntile; valuesAtPositions is the sparse variant that
    * only sorts the buckets containing requested positions. */
  def withGlobalRank(df: DataFrame, valueCol: String, tieCols: Seq[String],
                     bucketWidth: Double, rankCol: String): DataFrame = {
    val r = df.withColumn("__hb",
      floor(col(valueCol).cast("double") / bucketWidth).cast("long"))
    val wh = Window.orderBy("__hb").rowsBetween(Window.unboundedPreceding, -1)
    val off = r.groupBy("__hb").agg(count(lit(1)).as("__cnt"))
      .withColumn("__off", coalesce(sum("__cnt").over(wh), lit(0L)))
      .select("__hb", "__off")
    val wb = Window.partitionBy("__hb")
      .orderBy((valueCol +: tieCols).map(col): _*)
    r.join(broadcast(off), "__hb")
      .withColumn(rankCol, col("__off") + row_number().over(wb))
      .drop("__hb", "__off")
  }

  /** Values at the given per-group global ascending-sort positions.
    *
    * @param df        input rows
    * @param groupCol  grouping column name
    * @param valueCol  numeric column to rank by
    * @param positions tiny DataFrame of (group, pos) targets, 0-based;
    *                  broadcast to every stage
    * @param bucketWidth histogram granularity in value units
    * @return (grp, pos, v) — one row per target position that exists;
    *         positions past the end of a group yield no row
    */
  def valuesAtPositions(df: DataFrame, groupCol: String, valueCol: String,
                        positions: DataFrame, bucketWidth: Double): DataFrame = {
    val r = df.select(col(groupCol).as("grp"), col(valueCol).as("v"))
      .withColumn("hb", floor(col("v").cast("double") / bucketWidth).cast("long"))
    val hist = r.groupBy("grp", "hb").agg(count(lit(1)).as("cnt"))
    val wh = Window.partitionBy("grp").orderBy("hb")
      .rowsBetween(Window.unboundedPreceding, -1)
    val off = hist.withColumn("off", coalesce(sum("cnt").over(wh), lit(0L)))
    val tgt = positions.toDF("grp", "pos")
    val need = off.join(broadcast(tgt), Seq("grp"))
      .filter(col("pos") >= col("off") && col("pos") < col("off") + col("cnt"))
    val buckets = need.select("grp", "hb", "off").distinct()
    val wb = Window.partitionBy("grp", "hb").orderBy("v")
    r.join(broadcast(buckets), Seq("grp", "hb"))
      .withColumn("i", col("off") + row_number().over(wb) - 1)
      .join(broadcast(tgt), Seq("grp"))
      .filter(col("i") === col("pos"))
      .select(col("grp"), col("pos"), col("v"))
  }
}
