package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.XxHash64
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.functions._

/** Runtime bloom-prefilter join — the 100 TB shuffle-reduction pattern.
  *
  * A selective fact⨝dim join shuffles every fact row, then discards most
  * of them at the join. The fix: build a bloom filter over the dim keys
  * (one small aggregate), broadcast its bytes, and filter the fact BEFORE
  * its shuffle — rows that cannot match never cross the wire. Spark's
  * optimizer injects this itself only under specific plan conditions
  * (`InjectRuntimeFilter`); this operator makes the pattern explicit and
  * unconditional, reusing Spark's own codegen'd
  * [[BloomFilterAggregate]] / [[BloomFilterMightContain]] expressions
  * (both sides keyed through XxHash64, the pairing the optimizer itself
  * uses). Registered as SQL functions `graft_bloom_agg` /
  * `graft_bloom_contains` so the SQL surface gets the same primitive.
  *
  * Guarantees: NO false negatives (the filtered join equals the plain
  * join bit-for-bit — BloomJoinSpec gates equality); false positives only
  * cost shuffle bytes, bounded by the sized filter (default 8 bits/key
  * ≈ 2% fp). The bloom build is one pass over the DIM (the small side);
  * the fact is scanned once with the filter fused into the scan stage.
  */
object BloomJoin {

  /** Idempotent session registration of the SQL-facing functions. */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_bloom_agg",
      children => new BloomFilterAggregate(new XxHash64(Seq(children(0))),
        children(1), children(2)),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_bloom_contains",
      children => BloomFilterMightContain(children(0),
        new XxHash64(Seq(children(1)))),
      "built-in")
  }

  /** The serialized bloom filter over `dim`'s key column. Driver-held by
    * DESIGN, like the IVF-PQ codebooks: `might_contain` requires a
    * constant (or scalar-subquery) filter so codegen can bind it once per
    * task — and the bytes are expectedItems-bounded (8 bits/key ⇒ ~1 MB
    * per million keys), metadata-scale, never data-scale. The build
    * itself is one distributed aggregate over the dim. */
  def buildFilterBytes(dim: DataFrame, dimKey: String,
                       expectedItems: Long): Array[Byte] = {
    register(dim.sparkSession)
    dim.agg(call_function("graft_bloom_agg", col(dimKey),
      lit(expectedItems), lit(expectedItems * 8)).as("bf"))
      .head().getAs[Array[Byte]](0)
  }

  /** fact⨝dim equi-join with the fact side bloom-prefiltered by the dim
    * keys. Result is row-identical to the plain join (no false
    * negatives); the win is the fact shuffle volume, which drops to
    * (matching rows + fp rate). `expectedItems` sizes the filter — pass
    * the dim's approximate key count. */
  def prefiltered(fact: DataFrame, dim: DataFrame,
                  factKey: String, dimKey: String,
                  expectedItems: Long = 1000000L): DataFrame = {
    register(fact.sparkSession)
    val bytes = buildFilterBytes(dim, dimKey, expectedItems)
    fact
      .where(call_function("graft_bloom_contains", lit(bytes), col(factKey)))
      .join(dim, col(factKey) === col(dimKey))
  }
}
