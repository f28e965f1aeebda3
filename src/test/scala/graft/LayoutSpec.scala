package graft

import graft.core.Tables
import graft.operators.BucketedLayout
import org.apache.spark.sql.functions._

/** Bucketed co-location: the fact-fact join must plan with no shuffle. */
class LayoutSpec extends SparkSuite {

  test("bucketed lineitem x orders joins with zero Exchange nodes") {
    spark.conf.set("spark.sql.sources.bucketing.enabled", "true")
    // the in-memory catalog forgets tables between JVMs but the warehouse
    // dirs persist — clear both before writing
    Seq("li_bkt", "ord_bkt").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(s"spark-warehouse/$t")
      if (loc.exists()) {
        import scala.reflect.io.Directory
        new Directory(loc).deleteRecursively()
      }
    }
    BucketedLayout.writeBucketed(
      Tables.lineitem(spark, sf("0.001")).select("l_orderkey", "l_extendedprice"),
      "li_bkt", "l_orderkey", 8)
    BucketedLayout.writeBucketed(
      Tables.orders(spark, sf("0.001")).select("o_orderkey", "o_orderstatus"),
      "ord_bkt", "o_orderkey", 8)
    val joined = BucketedLayout.colocatedJoin(spark, "li_bkt", "ord_bkt",
      "l_orderkey", "o_orderkey")
    // disable AQE so the static plan shows the join strategy directly,
    // and broadcast so the small side can't dodge the merge join
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"))
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle:\n$plan")
      // and it computes the right thing
      val cnt = joined.count()
      val expect = Tables.lineitem(spark, sf("0.001"))
        .join(Tables.orders(spark, sf("0.001")),
          col("l_orderkey") === col("o_orderkey")).count()
      assert(cnt == expect)
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    }
  }

  test("dynamic partition pruning fires on a partitioned fact x filtered dim join") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_dpp").toString
    Tables.lineitem(spark, sf("0.001"))
      .write.mode("overwrite").partitionBy("l_returnflag").parquet(tmp)
    val fact = spark.read.parquet(tmp)
    // dim values must come from a scan (a literal folds to a static
    // partition filter — also pruning, but not the dynamic path)
    val dim = Tables.lineitem(spark, sf("0.001"))
      .filter(col("l_partkey") < 5 && col("l_linenumber") === 1)
      .select(col("l_returnflag").as("flag")).distinct()
    val joined = fact.join(dim, col("l_returnflag") === col("flag"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"),
      s"expected a dynamicpruning partition filter on the fact scan:\n$plan")
  }
}
