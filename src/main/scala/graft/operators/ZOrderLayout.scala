package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton curve) data layout: multi-dimensional row-group
  * pruning from a single sort key — the data-clustering complement to
  * [[BucketedLayout]]'s join co-location (the same layout lever the
  * published lakehouse engines expose as `OPTIMIZE ... ZORDER BY`).
  *
  * A table sorted by one column prunes parquet row groups only for
  * filters on THAT column: every file's min/max on any other column
  * spans the full domain, so a filter on the second dimension scans
  * everything. Interleaving the bits of both columns' normalized ranks
  * (16 bits each → one 32-bit Morton code) and range-partitioning on
  * that code gives every output file a tight min/max ON BOTH columns —
  * a filter on either dimension skips most row groups at scan time, with
  * zero read-path changes (plain parquet stats pruning does the work).
  *
  * Normalization bounds come from one in-plan min/max aggregate
  * broadcast into the projection (the [[HistogramRank]] stats pattern —
  * no driver action, domain shifts can't collapse the curve); the bit
  * interleave is 32 unrolled codegen'd integer expressions, no UDF.
  * ZOrderSpec measures the claim: scanned-row counts (scan-node metrics)
  * for a second-dimension filter drop ≥ 4× vs the linear layout.
  */
object ZOrderLayout {

  private val Bits = 16

  /** 0..65535 rank of `c` within [lo, hi]; degenerate domains map to 0. */
  private def normalized(c: Column, lo: Column, hi: Column): Column =
    when(hi > lo,
      least(floor((c.cast("double") - lo) / ((hi - lo) / ((1 << Bits) - 1))),
        lit((1 << Bits) - 1)).cast("long"))
      .otherwise(lit(0L))

  /** Morton interleave of two 16-bit values: a's bit i → bit 2i,
    * b's bit i → bit 2i+1. */
  private def morton(a: Column, b: Column): Column =
    (0 until Bits).map { i =>
      shiftleft(shiftright(a, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce(_ + _)

  /** `df` with a `__z` Morton code over (colA, colB), bounds from one
    * broadcast min/max aggregate. */
  def withZ(df: DataFrame, colA: String, colB: String): DataFrame = {
    val stats = df.agg(
      min(col(colA).cast("double")).as("__alo"),
      max(col(colA).cast("double")).as("__ahi"),
      min(col(colB).cast("double")).as("__blo"),
      max(col(colB).cast("double")).as("__bhi"))
    df.crossJoin(broadcast(stats))
      .withColumn("__z", morton(
        normalized(col(colA), col("__alo"), col("__ahi")),
        normalized(col(colB), col("__blo"), col("__bhi"))))
      .drop("__alo", "__ahi", "__blo", "__bhi")
  }

  /** Write `df` z-ordered on (colA, colB) into `files` range-partitioned
    * parquet files — each file covers a contiguous Morton range, so its
    * min/max stats are tight on BOTH columns. */
  def writeZOrdered(df: DataFrame, dir: String, colA: String, colB: String,
                    files: Int): Unit =
    withZ(df, colA, colB)
      .repartitionByRange(files, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(dir)
}
