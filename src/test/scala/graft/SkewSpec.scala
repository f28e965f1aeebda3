package graft

import graft.core.Tables
import graft.operators.SaltedJoin
import graft.streaming.StreamOps
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Salted skew join parity + RocksDB state store (production streaming). */
class SkewSpec extends SparkSuite {

  case class Ev(event_id: Long, ts: java.time.LocalDateTime, user_id: Long,
                event_type: String, value: Double)

  test("salted join equals plain join on a skewed key") {
    val d = sf("0.001")
    // synthesize skew: all events collapse onto user_id % 5
    val big = Tables.events(spark, d)
      .withColumn("k", (col("user_id") % 5).cast("long"))
    val dim = spark.range(5).select(col("id").as("dk"),
      concat(lit("seg_"), col("id")).as("segment"))
    val plain = big.join(dim, col("k") === col("dk"))
      .groupBy("segment").agg(count(lit(1)).as("c"), sum("event_id").as("s"))
      .collect().map(_.toString).sorted.toSeq
    val salted = SaltedJoin.join(big, dim, "k", "dk", salt = 8)
      .groupBy("segment").agg(count(lit(1)).as("c"), sum("event_id").as("s"))
      .collect().map(_.toString).sorted.toSeq
    assert(salted == plain)
  }

  test("streaming tumbling agg is identical under the RocksDB state store") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val fixture = Tables.events(spark, sf("0.001"))
      .select("event_id", "ts", "user_id", "event_type", "value")
      .limit(300).collect()
      .map(r => Ev(r.getLong(0), r.getAs[java.time.LocalDateTime](1),
        r.getLong(2), r.getString(3), r.getDouble(4))).toSeq
    val sentinel = Ev(999999L, java.time.LocalDateTime.of(2030, 1, 1, 0, 0),
      999999L, "sentinel", 0.0)

    def run(name: String, provider: Option[String]): Seq[String] = {
      provider.foreach(p =>
        spark.conf.set("spark.sql.streaming.stateStore.providerClass", p))
      try {
        val mem = MemoryStream[Ev]
        val q = StreamOps.tumblingCounts(mem.toDF()).writeStream
          .format("memory").queryName(name).outputMode("append").start()
        mem.addData(fixture)
        q.processAllAvailable()
        mem.addData(Seq(sentinel))
        q.processAllAvailable()
        q.stop()
        spark.table(name).filter(col("event_type") =!= "sentinel")
          .collect().map(_.toString).sorted.toSeq
      } finally provider.foreach(_ => spark.conf.unset(
        "spark.sql.streaming.stateStore.providerClass"))
    }

    val hdfs = run("ss_default", None)
    val rocks = run("ss_rocksdb", Some(
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"))
    assert(rocks == hdfs)
    assert(rocks.nonEmpty)
  }
}
