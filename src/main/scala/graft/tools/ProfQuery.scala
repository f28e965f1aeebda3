package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only micro-profiler: run one registry query repeatedly to separate
  * cold (first-scan, plan, broadcast) cost from steady-state cost. */
object ProfQuery {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"
    val name = if (args.nonEmpty) args(0) else "q_text_langid"
    val fn = graft.SparkEntry.queries(name)
    (1 to 3).foreach { k =>
      val t0 = System.nanoTime()
      val n = fn(spark, d).count()
      println(f"[prof] $name run$k ${(System.nanoTime() - t0) / 1e9}%6.2f s rows=$n")
    }
    spark.stop()
  }
}
