package graft

import graft.core.Tables
import graft.operators.AsOfJoin
import org.apache.spark.sql.functions._

/** The custom single-pass as-of join (AsOfJoinExec) must be bit-equal to
  * the pure-DataFrame composition and must plan as one merge operator —
  * no candidate-pair join, no re-aggregation.
  */
class AsOfSpec extends SparkSuite {

  private def sides(d: String) = {
    val ev = Tables.events(spark, d)
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts").as("pts"))
    val v = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts").as("vts"))
    (p, v)
  }

  test("merge form equals the join+aggregate composition") {
    val (p, v) = sides(sf("0.01"))
    val merge = AsOfJoin.leftAsOfMerge(p, v, Seq("user_id"), "pts", "vts")
      .collect().map(_.toString).sorted.toSeq
    val comp = AsOfJoin.leftAsOf(p, v, Seq("user_id"), "pts", "vts")
      .select("event_id", "user_id", "pts", "asof_time")
      .collect().map(_.toString).sorted.toSeq
    assert(merge.nonEmpty && merge == comp)
  }

  test("merge form keeps unmatched left rows (null asof)") {
    val (p, v) = sides(sf("0.001"))
    val out = AsOfJoin.leftAsOfMerge(p, v, Seq("user_id"), "pts", "vts")
    assert(out.count() == p.count(), "exactly one output row per left row")
    // users whose first event is a purchase have no earlier view
    assert(out.filter(col("asof_time").isNull).count() ==
      AsOfJoin.leftAsOf(p, v, Seq("user_id"), "pts", "vts")
        .filter(col("asof_time").isNull).count())
  }

  test("payload form carries the matched right row, nulls when unmatched") {
    val ev = Tables.events(spark, sf("0.01"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts").as("pts"))
    val v = ev.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("ts").as("vts"),
        col("event_id").as("v_id"))
    val all = AsOfJoin.leftAsOfMergeAll(p, v,
      Seq("user_id"), Seq("v_user"), "pts", "vts")
    // the payload row's time must equal the time-only form's asof_time
    val timeOnly = AsOfJoin.leftAsOfMerge(p, v.withColumnRenamed("v_user", "user_id")
        .select(col("user_id"), col("vts")),
      Seq("user_id"), "pts", "vts")
    val gotTimes = all.select("event_id", "vts")
      .collect().map(r => (r.getLong(0), Option(r.get(1)).map(_.toString))).toMap
    val wantTimes = timeOnly.select("event_id", "asof_time")
      .collect().map(r => (r.getLong(0), Option(r.get(1)).map(_.toString))).toMap
    assert(gotTimes == wantTimes)
    // unmatched rows have null across the ENTIRE payload
    val unmatched = all.filter(col("vts").isNull)
    assert(unmatched.count() ==
      unmatched.filter(col("v_user").isNull && col("v_id").isNull).count())
    // matched payload ids really are view events of the same user
    val badPairs = all.filter(col("vts").isNotNull &&
      (col("v_user") =!= col("user_id") || col("vts") >= col("pts"))).count()
    assert(badPairs == 0)
  }

  test("SQL null semantics: null keys and null times never match") {
    import spark.implicits._
    val l = Seq(
      (1L, Option(1L), Option(10L)),   // normal: should match right rt=5
      (2L, Option.empty[Long], Option(10L)), // null key → no match
      (3L, Option(1L), Option.empty[Long]))  // null time → no match
      .toDF("id", "k", "t")
    val r = Seq(
      (Option(1L), Option(5L), "a"),         // the match for id=1
      (Option.empty[Long], Option(4L), "b"), // null key: matches nothing
      (Option(1L), Option.empty[Long], "c")) // null time: matches nothing
      .toDF("rk", "rt", "payload")
    val out = AsOfJoin.leftAsOfMergeAll(l, r, Seq("k"), Seq("rk"), "t", "rt")
      .collect().map(row => (row.getLong(0),
        Option(row.get(row.fieldIndex("rt"))).map(_.toString),
        Option(row.getAs[String]("payload")))).toSet
    assert(out == Set(
      (1L, Some("5"), Some("a")),
      (2L, None, None),
      (3L, None, None)))
    // the composition agrees (its join predicate is false on NULLs)
    val comp = AsOfJoin.leftAsOf(l, r.select(col("rk").as("k"), col("rt")),
        Seq("k"), "t", "rt")
      .collect().map(row => (row.getLong(0),
        Option(row.get(row.fieldIndex("asof_time"))).map(_.toString))).toSet
    assert(comp.map(x => (x._1, x._2)) == out.map(x => (x._1, x._2)))
  }

  test("merge form plans one AsOfJoinExec, no pair join or re-aggregation") {
    val (p, v) = sides(sf("0.001"))
    val plan = AsOfJoin.leftAsOfMerge(p, v, Seq("user_id"), "pts", "vts")
      .queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), s"expected AsOfJoinExec in:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("HashAggregate"),
      s"merge form must not fall back to join+aggregate:\n$plan")
  }
}
