package graft

/** SURVEY §5.2.2 self-differential gate: every contract query must produce
  * identical output under different parallelism (1 vs 4 shuffle
  * partitions) — catches partition-order-dependent FP/nondeterminism
  * before the driver's hash gate ever sees it.
  */
class DifferentialSpec extends SparkSuite {

  private def run(name: String, parts: String): Seq[String] = {
    spark.conf.set("spark.sql.shuffle.partitions", parts)
    try SparkEntry.queries(name)(spark, sf("0.001")).collect()
      .map(_.toString).toSeq
    finally spark.conf.set("spark.sql.shuffle.partitions", "4")
  }

  SparkEntry.registry.filter(_.oracle.nonEmpty).foreach { q =>
    test(s"${q.name} is partition-count invariant") {
      assert(run(q.name, "1") == run(q.name, "4"))
    }
  }
}
