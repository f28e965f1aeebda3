package graft

import graft.queries.{SparkDialect, SqlParityQueries}

/** Gate for cap_sql_parity (round-10 verdict item 3): every member of the
  * parity set, executed as raw SQL text through spark.sql over temp views,
  * must produce a frame identical to its DataFrame implementation.
  *
  * The oracle strings are the exact ANSI text the driver runs in DuckDB, so
  * green here + the driver's hash gate means the same SQL yields the same
  * result on both engines — the SQL-first user's migration path.
  */
class SqlParitySpec extends SparkSuite {

  test("cap_sql_parity: every parity-set oracle round-trips through spark.sql") {
    val rows = SparkEntry.queries("cap_sql_parity")(spark, sf("0.001")).collect()
    assert(rows.length == SqlParityQueries.paritySet.length)
    val bad = rows.filter(_.getString(1) != "ok")
    assert(bad.isEmpty, "non-ok parity rows:\n" +
      bad.map(r => s"  ${r.getString(0)}: ${r.getString(1)} ${r.getString(2)}").mkString("\n"))
  }

  test("parity set spans ≥10 queries and ≥6 categories") {
    val set = SqlParityQueries.paritySet
    assert(set.size >= 10)
    val cats = set.map(_.split("_")(1)).toSet
    assert(cats.size >= 6, s"categories covered: $cats")
  }

  test("full-surface SQL dialect census (every oracle through spark.sql)", Marquee) {
    // Round-11: the census is TOTAL. Every oracle runs through spark.sql —
    // as its own ANSI text where Spark parses it, as its SparkDialect twin
    // where DuckDB-only syntax needed translation — and every one must
    // match the DataFrame implementation frame-for-frame: 162/162, no
    // dialect-only bucket left. Opt-in (Marquee): runs the whole query
    // surface twice.
    SqlParityQueries.registerViews(spark, sf("0.001"))
    val results = SparkEntry.oracleSql.keys.toSeq.sorted.map { name =>
      val status =
        try SqlParityQueries.diff(spark, sf("0.001"), name) match {
          case None => "ok"
          case Some(why) => s"mismatch: ${why.take(120)}"
        } catch { case e: Exception => s"parse/run: ${
          String.valueOf(e.getMessage).linesIterator.take(1).mkString.take(120)}" }
      name -> status
    }
    val ok = results.collect { case (n, "ok") => n }
    val bad = results.filterNot(_._2 == "ok")
    info(s"census: ${ok.size} ok of ${results.size} oracles " +
      s"(${SparkDialect.twins.size} via Spark-dialect twins)")
    bad.foreach { case (n, s) => info(s"  BAD $n: $s") }
    assert(bad.isEmpty, "every oracle must run as Spark SQL and match " +
      "frames: " + bad.map(b => s"${b._1} -> ${b._2}").mkString("; "))
  }

  test("SparkDialect twins cover exactly the DuckDB-only oracles") {
    // every twin key names a real oracle…
    val orphan = SparkDialect.twins.keySet -- SparkEntry.oracleSql.keySet
    assert(orphan.isEmpty, s"twins without an oracle: $orphan")
    // …and a twin exists only where it differs from the oracle (a twin
    // identical to the oracle would silently mask dialect drift)
    val redundant = SparkDialect.twins.filter { case (n, s) =>
      SparkEntry.oracleSql(n).trim == s.trim }
    assert(redundant.isEmpty, s"redundant twins: ${redundant.keySet}")
  }
}
