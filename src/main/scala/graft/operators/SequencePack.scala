package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-sequence packing — the document-concatenation step of a
  * pretraining pipeline: documents are laid out in a deterministic
  * order, token counts accumulate, and every `capacity`-token boundary
  * starts a new training sequence (a document belongs to the chunk
  * where it STARTS — contiguous packing, the "concat then chunk"
  * recipe). All-integer, so chunk ids are exact and cross-engine
  * hashable: chunk(d) = ⌊(cum(d) − tok(d)) / capacity⌋ over the
  * running token count cum.
  *
  * Scale shape: the running count is the engine's two-pass distributed
  * prefix sum — the order key's space is bucketed, one PARTITIONED
  * running sum per bucket, bucket offsets via a window over the
  * aggregate-bounded bucket totals, broadcast back. No global
  * single-task window (strict-lint-clean); prefix sums are
  * associative, so the result is bit-identical to the one-window form
  * at any partitioning. At 100 TB the packing of a trillion-token
  * corpus is one bucket-partitioned pass plus a bucket-count-sized
  * rollup.
  */
object SequencePack {

  /** Whitespace token count, the engine's cross-engine-exact form:
    * separators + 1 (documents are non-empty single-spaced text). */
  def tokenCount(text: Column): Column =
    (length(text) - length(translate(text, " ", "")) + 1L).cast("long")

  /** `df` + (`__cum` running token total inclusive, `chunk` = the
    * training sequence this row starts in). `orderCol` must be unique
    * and non-negative (doc ids); `tokCol` holds per-row token counts.
    * `bucketWidth` trades offset-frame size against bucket parallelism
    * (offset frame rows = key range / bucketWidth). */
  def assignChunks(df: DataFrame, orderCol: String, tokCol: String,
      capacity: Long, bucketWidth: Long = 1024L): DataFrame = {
    require(capacity > 0, s"capacity must be positive: $capacity")
    val k = col(orderCol)
    val local = df
      .withColumn("__bkt", ((k - k % bucketWidth) / bucketWidth).cast("long"))
      .withColumn("__lcw",
        sum(col(tokCol)).over(Window.partitionBy("__bkt").orderBy(orderCol)))
    val offs = local.groupBy("__bkt").agg(sum(col(tokCol)).as("__bw"))
      .withColumn("__off", coalesce(sum("__bw").over(
        Window.orderBy("__bkt")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("__bkt", "__off")
    local.join(broadcast(offs), "__bkt")
      .withColumn("__cum", col("__lcw") + col("__off"))
      .withColumn("chunk", {
        val start = col("__cum") - col(tokCol)
        ((start - start % capacity) / capacity).cast("long")
      })
      .drop("__bkt", "__lcw", "__off")
  }
}
