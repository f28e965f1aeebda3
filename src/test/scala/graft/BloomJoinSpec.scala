package graft

import graft.core.Tables
import graft.operators.BloomJoin
import org.apache.spark.sql.functions._

/** Gates for the runtime bloom-prefilter join: exactness (no false
  * negatives — the prefiltered join is row-identical to the plain join)
  * and the point of the exercise (the fact rows entering the join
  * shuffle drop to matches + a small fp tail).
  */
class BloomJoinSpec extends SparkSuite {

  test("prefiltered join is row-identical to the plain join") {
    val fact = Tables.lineitem(spark, sf("0.001"))
      .select("l_orderkey", "l_quantity", "l_returnflag")
    val dim = Tables.orders(spark, sf("0.001"))
      .where(col("o_orderpriority") === "1-URGENT")
      .select("o_orderkey")
    val plain = fact.join(dim, col("l_orderkey") === col("o_orderkey"))
    val pre = BloomJoin.prefiltered(fact, dim, "l_orderkey", "o_orderkey",
      expectedItems = 10000L)
    assert(pre.count() == plain.count(), "bloom dropped a matching row")
    assert(pre.exceptAll(plain).count() == 0 &&
      plain.exceptAll(pre).count() == 0,
      "prefiltered join diverged from the plain join")
  }

  test("bloom filter passes few non-matching fact rows (fp rate bounded)") {
    val fact = Tables.lineitem(spark, sf("0.001")).select("l_orderkey")
    val dim = Tables.orders(spark, sf("0.001"))
      .where(col("o_orderpriority") === "1-URGENT")
      .select("o_orderkey")
    val nFact = fact.count()
    val matching = fact.join(dim, col("l_orderkey") === col("o_orderkey"))
      .count()
    // apply ONLY the bloom predicate: survivors = matches + false
    // positives; at 8 bits/key the fp rate is ~2%, gate at 10%
    val bytes = BloomJoin.buildFilterBytes(dim, "o_orderkey", 10000L)
    val surviving = fact
      .where(call_function("graft_bloom_contains", lit(bytes),
        col("l_orderkey")))
      .count()
    assert(surviving >= matching, "bloom must never reject a match")
    val fp = surviving - matching
    assert(fp <= (nFact - matching) / 10,
      s"false-positive tail too fat: $fp of ${nFact - matching} non-matches")
    info(s"fact $nFact rows -> $surviving past bloom " +
      s"($matching true matches, $fp false positives)")
  }

  test("q_join_bloom: registry entry aggregates the filtered join") {
    val out = SparkEntry.queries("q_join_bloom")(spark, sf("0.001"))
      .collect()
    assert(out.nonEmpty)
    // cross-check the aggregate against the plain-join computation
    val fact = Tables.lineitem(spark, sf("0.001"))
      .select("l_orderkey", "l_quantity", "l_returnflag")
    val dim = Tables.orders(spark, sf("0.001"))
      .where(col("o_orderpriority") === "1-URGENT").select("o_orderkey")
    val want = fact.join(dim, col("l_orderkey") === col("o_orderkey"))
      .groupBy("l_returnflag").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out.map(r => r.getString(0) -> r.getLong(1)).toMap == want)
  }
}
