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

  /** 0..2^bits−1 rank of `c` within [lo, hi]; degenerate domains map
    * to 0. */
  private def normalized(c: Column, lo: Column, hi: Column,
      bits: Int = Bits): Column =
    when(hi > lo,
      least(floor((c.cast("double") - lo) / ((hi - lo) / ((1 << bits) - 1))),
        lit((1 << bits) - 1)).cast("long"))
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

  /** Morton interleave of n equal-width values: column j's bit i lands
    * at position n·i + j (n·bits ≤ 62 keeps the code a non-negative
    * long) — the straight generalization of [[morton]]. */
  private def mortonN(vs: Seq[Column], bits: Int): Column =
    (for { i <- 0 until bits; j <- vs.indices } yield
      shiftleft(shiftright(vs(j), i).bitwiseAND(lit(1L)),
        vs.size * i + j)).reduce(_ + _)

  /** `df` with a `__z` Morton code over 2–4 columns — the
    * `OPTIMIZE … ZORDER BY (a, b, c[, d])` shape. The 62-bit budget
    * splits evenly (2 cols keep [[withZ]]'s 16-bit resolution; 3 cols
    * get 20 bits each, 4 get 15), so every packed file stays tight on
    * EVERY listed dimension; resolution per dimension falls as columns
    * are added — the standard Z-order trade, which is why the arity is
    * capped at 4 instead of silently degrading. Bounds come from one
    * broadcast min/max aggregate, same as [[withZ]]. */
  def withZN(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.size >= 2 && cols.size <= 4,
      s"zorder: 2 to 4 columns, got ${cols.size}")
    if (cols.size == 2) return withZ(df, cols.head, cols(1))
    val bits = 62 / cols.size // 3 cols → 20 bits each, 4 → 15
    val aggs = cols.zipWithIndex.flatMap { case (c, j) =>
      Seq(min(col(c).cast("double")).as(s"__lo$j"),
        max(col(c).cast("double")).as(s"__hi$j"))
    }
    val stats = df.agg(aggs.head, aggs.tail: _*)
    val ranks = cols.zipWithIndex.map { case (c, j) =>
      normalized(col(c), col(s"__lo$j"), col(s"__hi$j"), bits)
    }
    df.crossJoin(broadcast(stats))
      .withColumn("__z", mortonN(ranks, bits))
      .drop(cols.indices.flatMap(j => Seq(s"__lo$j", s"__hi$j")): _*)
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
