package graft

import org.apache.spark.sql.SparkSession

/** Dev-loop steady-state profiler: runs the named queries `SPARK_GRAFT_REPS`
  * times each (default 3) in ONE warm JVM and prints every timing — the
  * per-round driver bench times each query once, so distinguishing a real
  * plan regression from codegen/JIT cold cost needs this loop.
  * Usage: sbt "runMain graft.BenchLoop q_agg_percentile q_window_ntile"
  */
object BenchLoop {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries.get("q_agg_pricing_summary")
      .foreach(fn => try fn(spark, sfDir).count()
      catch { case _: Throwable => () })
    for (q <- args.toSeq; i <- 1 to reps) {
      val t0 = System.nanoTime()
      try SparkEntry.queries(q)(spark, sfDir).count()
      catch { case e: Throwable => println(s"FAIL $q: $e") }
      println(f"TIMING $q run$i ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    spark.stop()
  }
}
