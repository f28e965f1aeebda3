package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Largest-Triangle-Three-Buckets time-series downsampling — the
  * fixed-anchor variant that parallelizes.
  *
  * Classic LTTB is inherently sequential: the point chosen for bucket k
  * is the triangle apex against the point *chosen* for bucket k−1, so
  * bucket k cannot start until k−1 finishes — a driver-side loop at any
  * scale. The standard distributed relaxation (used by every SQL-engine
  * port of LTTB) anchors each bucket's triangles on its NEIGHBOR BUCKET
  * AVERAGES instead of the previously-selected point: visually
  * near-identical output, and every bucket becomes independent — the
  * whole pass is two key-partitioned windows and one (key, bucket) join,
  * linear and shuffle-bounded.
  *
  * Determinism: bucket assignment is pure integer math on the rank;
  * anchor means divide EXACT sums (int64 x, DECIMAL(18,4) y) so they are
  * bit-stable under any partitioning; areas are a fixed IEEE expression
  * tree over those stable inputs; the per-bucket argmax breaks area ties
  * by (x, tie) — so two runs (or 1 vs 1000 executors) pick identical
  * points. Endpoints are their own buckets, as in the reference
  * algorithm, so the series' first/last points always survive.
  *
  * Scale shape: windows partition by the series key (each series'
  * bucket directory is metadata-sized); the anchor frame is B rows per
  * key and joins back broadcast-eligible. No global sort, no driver
  * loop, no per-point state.
  */
object Lttb {

  /** Downsample each series to ≤ `buckets` points.
    *
    * @param series input frame
    * @param key    series identifier column name
    * @param x      ordinate column (int64, e.g. epoch micros), ascending
    * @param y      value column (double with ≤4 true decimals)
    * @param tie    unique tie-breaker column for equal x
    * @param buckets target points per series (≥ 3: two endpoints + interior)
    */
  def downsample(series: DataFrame, key: String, x: String, y: String,
                 tie: String, buckets: Int): DataFrame = {
    require(buckets >= 3, s"need >= 3 buckets, got $buckets")
    val D = DecimalType(18, 4)
    val wk = Window.partitionBy(key)
    val ord = wk.orderBy(col(x), col(tie))

    val ranked = series
      .select(col(key), col(x), col(y), col(tie))
      .withColumn("rn", row_number().over(ord))
      .withColumn("n", count(lit(1)).over(wk))
      // endpoints own buckets 0 and B-1; interior ranks 2..n-1 spread
      // uniformly over buckets 1..B-2 by integer division
      .withColumn("bucket",
        when(col("rn") === 1, lit(0L))
          .when(col("rn") === col("n"), lit(buckets - 1L))
          .otherwise(expr(
            s"1L + (CAST(rn - 2 AS BIGINT) * ${buckets - 2}) div " +
              "greatest(CAST(n - 2 AS BIGINT), 1L)")))

    // exact per-bucket sums -> bit-stable means (sum order never matters)
    val anchors = ranked.groupBy(col(key), col("bucket"))
      .agg(count(lit(1)).as("cnt"),
        sum(col(x)).cast(DecimalType(38, 0)).as("sx"),
        sum(col(y).cast(D)).cast(D).as("sy"))
      .select(col(key), col("bucket"),
        (col("sx").cast("double") / col("cnt")).as("ax"),
        (col("sy").cast("double") / col("cnt")).as("ay"))
    val wb = Window.partitionBy(key).orderBy("bucket")
    val withNbrs = anchors
      .withColumn("px", lag("ax", 1).over(wb))
      .withColumn("py", lag("ay", 1).over(wb))
      .withColumn("nx", lead("ax", 1).over(wb))
      .withColumn("ny", lead("ay", 1).over(wb))

    val area =
      abs((col("px") - col("nx")) * (col(y) - col("py")) -
        (col("px") - col(x).cast("double")) * (col("ny") - col("py")))
    val picked = ranked.join(withNbrs, Seq(key, "bucket"))
      .withColumn("area",
        // endpoint buckets keep their single point; interior buckets
        // score the fixed-anchor triangle
        when(col("px").isNull || col("nx").isNull, lit(0.0)).otherwise(area))
      .withColumn("pick", row_number().over(
        Window.partitionBy(col(key), col("bucket"))
          .orderBy(col("area").desc, col(x), col(tie))))
      .where(col("pick") === 1)

    picked.select(col(key), col("bucket"), col(x), col(y))
  }
}
