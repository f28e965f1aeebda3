package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: dump join strategies of scale-sensitive queries. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val qs = if (args.nonEmpty) args.toSeq
      else Seq("q_join_theta_range", "q_join_asof", "q_text_jaccard_pairs",
        "q_sim_cosine_topk", "q_dedup_simhash")
    qs.foreach { q =>
      val df = graft.SparkEntry.queries(q)(spark, "/root/testdata/sf0.001")
      val p = df.queryExecution.executedPlan.toString
      println(s"== $q")
      val interesting = if (args.nonEmpty)
        p.linesIterator.filter(l => l.contains("Join") || l.contains("Exchange") ||
          l.contains("Generate") || l.contains("Scan"))
      else p.linesIterator.filter(_.contains("Join"))
      interesting.map(_.trim.take(120)).foreach(l => println("   " + l))
    }
    spark.stop()
  }
}
