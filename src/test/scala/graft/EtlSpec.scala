package graft

import graft.core.Tables
import graft.operators.IncrementalLoad
import org.apache.spark.sql.functions._

/** Incremental upsert semantics (the reference's daily-build pattern). */
class EtlSpec extends SparkSuite {

  test("incremental upsert: incoming wins, non-colliding rows survive") {
    val d = sf("0.001")
    val all = Tables.orders(spark, d)
    val day1 = all.filter(col("o_orderkey") < 1000)
    // day2 re-files half of day1 (amended prices) plus new orders
    val day2 = all.filter(col("o_orderkey") >= 500 && col("o_orderkey") < 1500)
      .withColumn("o_totalprice", col("o_totalprice") + 1.0)
    val merged = IncrementalLoad.upsert(day1, day2, "o_orderkey")

    val expectKeys = all.filter(col("o_orderkey") < 1500)
      .select("o_orderkey").distinct().count()
    assert(merged.select("o_orderkey").distinct().count() == expectKeys)
    assert(merged.count() == expectKeys, "no duplicate keys after upsert")
    // amended rows must carry the day2 price
    val amended = merged.filter(col("o_orderkey") === 500).collect()(0)
    val orig = all.filter(col("o_orderkey") === 500).collect()(0)
    assert(amended.getDouble(amended.fieldIndex("o_totalprice")) ==
      orig.getDouble(orig.fieldIndex("o_totalprice")) + 1.0)
    // upsert is idempotent: replaying day2 changes nothing
    val again = IncrementalLoad.upsert(merged, day2, "o_orderkey")
    assert(again.count() == merged.count())
  }

  test("filings pipeline: XML ingest -> facts -> upsert -> dedup -> rollup, idempotent") {
    import graft.operators.{FilingsPipeline => FP}
    val orders = Tables.orders(spark, sf("0.001"))
    val filings = FP.ordersAsFilings(orders)
    val b1 = filings.filter(col("filing_id") % 4 < 3)
    val amendments = FP.ordersAsFilings(
      orders.filter(col("o_orderkey") % 8 === 0), "1111.00", amended = true)
    val b2 = amendments.unionByName(filings.filter(col("filing_id") % 4 === 3))
    val dir1 = graft.core.Scratch.dir("xbrl_spec_b1")
    val dir2 = graft.core.Scratch.dir("xbrl_spec_b2")
    FP.writeBatch(b1, dir1)
    FP.writeBatch(b2, dir2)

    // ingest fidelity: the XML round-trip loses nothing and the typed
    // fact parse is total (no nulls from a failed from_xml)
    val facts1 = FP.extractFacts(FP.ingest(spark, dir1))
      .localCheckpoint(eager = false)
    val facts2 = FP.extractFacts(FP.ingest(spark, dir2))
      .localCheckpoint(eager = false)
    assert(facts1.count() == b1.count())
    assert(facts2.count() == b2.count())
    assert(facts1.filter(col("value").isNull || col("concept").isNull)
      .count() == 0, "fact parse must be total")

    // amendment semantics: the re-filed accession carries the revised
    // decimal value after the upsert, exactly
    val upserted = IncrementalLoad.upsert(facts1, facts2, "accession")
      .localCheckpoint(eager = false)
    assert(upserted.select("accession").distinct().count() == upserted.count())
    val amendedKey = orders.filter(col("o_orderkey") % 8 === 0)
      .select(min("o_orderkey")).head().getLong(0)
    val origPrice = orders.filter(col("o_orderkey") === amendedKey)
      .select(col("o_totalprice")).head().getDouble(0)
    val gotValue = upserted.filter(col("filing_id") === amendedKey)
      .select("value").head().getDecimal(0)
    val wantValue = new java.math.BigDecimal(origPrice)
      .setScale(2, java.math.RoundingMode.HALF_UP)
      .add(new java.math.BigDecimal("1111.00"))
    assert(gotValue.compareTo(wantValue) == 0,
      s"amended value $gotValue != $wantValue")

    // idempotence: replaying batch 2 into the warehouse changes NOTHING —
    // same rows bit-for-bit, not just the same count
    val replay = IncrementalLoad.upsert(upserted, facts2, "accession")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSet
    assert(rows(replay) == rows(upserted), "upsert replay must be a no-op")

    // retention accounting: each dedup stage only removes rows, and the
    // near-dup stage actually fires (same-entity same-period repeat
    // narratives exist in the fixture by construction)
    val exact = FP.dedupExact(upserted).localCheckpoint(eager = false)
    val near = FP.dedupNear(exact).localCheckpoint(eager = false)
    val (nUp, nEx, nNear) = (upserted.count(), exact.count(), near.count())
    assert(nEx <= nUp && nNear < nEx,
      s"retention must be monotone with near-dup engaged: $nUp/$nEx/$nNear")

    // rollup exactness: distributed decimal sum == driver BigDecimal fold
    val roll = near.transform(FP.rollup)
    val got = roll.agg(sum(col("total_value"))).head().getDecimal(0)
    val want = near.select("value").collect()
      .map(_.getDecimal(0))
      .foldLeft(java.math.BigDecimal.ZERO)(_.add(_))
    assert(got.compareTo(want) == 0, s"rollup $got != driver fold $want")
    // and the rollup is deterministic across reruns (fresh plan)
    val roll2 = near.transform(FP.rollup)
    assert(rows(roll2) == rows(roll))

    // the literal north star: the pipeline ends IN A DB. Land the rollup
    // in Derby (the offline stand-in for the documented SQLite target)
    // through the same df.write.jdbc seam, read it back, and assert the
    // round-trip is exact and the landing idempotent (overwrite = the
    // daily-rebuild contract: second run leaves the same table)
    val url = "jdbc:derby:memory:graft_xbrl;create=true"
    def land(): Unit = roll
      .select(col("period"), col("n_facts"),
        col("total_value").cast("string").as("total_value"))
      .write.mode("overwrite")
      .format("jdbc").option("url", url).option("dbtable", "period_rollup")
      .save()
    land(); land() // idempotent daily rebuild
    val back = spark.read.format("jdbc")
      .option("url", url).option("dbtable", "period_rollup").load()
      .select(col("period"), col("n_facts"),
        col("total_value").cast("decimal(18,2)").as("total_value"))
    assert(rows(back) == rows(roll), "DB round-trip must be exact")
  }
}
