package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed table layout for shuffle-free fact-fact joins (the core 100 TB
  * co-location primitive; SURVEY §7.5 "pre-partitioning/bucketing").
  *
  * Writing both join sides bucketed by the join key with the same bucket
  * count lets the planner satisfy both children's distribution requirements
  * from the storage layout: the sort-merge join runs with ZERO Exchange
  * nodes. At 100 TB this converts the dominant cost of every
  * lineitem⨝orders-shaped query (a full two-sided shuffle) into a local
  * merge per bucket. LayoutSpec asserts the exchange-free plan.
  */
object BucketedLayout {

  /** Write `df` as a bucketed managed table (parquet, in-session catalog). */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write.mode("overwrite")
      .format("parquet")
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)

  /** Co-located join of two bucketed tables on their bucket key. */
  def colocatedJoin(spark: SparkSession, left: String, right: String,
                    leftKey: String, rightKey: String): DataFrame =
    spark.table(left).join(spark.table(right),
      org.apache.spark.sql.functions.col(leftKey) ===
        org.apache.spark.sql.functions.col(rightKey))
}
