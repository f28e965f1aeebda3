package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: dump executed plans for named queries (plan-audit loop). */
object ExplainNew {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", false).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    for (q <- args) {
      println(s"===== $q =====")
      println(graft.SparkEntry.queries(q)(spark, d)
        .queryExecution.executedPlan.toString.take(2200))
    }
    spark.stop()
  }
}
