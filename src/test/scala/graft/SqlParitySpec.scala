package graft

import graft.queries.SqlParityQueries

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
    // Informational sweep over ALL oracle strings — the DuckDB-dialect
    // ones (list_*, string_split, unnest, strftime…) legitimately fail to
    // parse; everything that PARSES must also match frames, and the
    // curated paritySet must stay a subset of the ok set. Opt-in
    // (Marquee): runs the whole query surface twice.
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
    val mismatch = results.filter(_._2.startsWith("mismatch"))
    info(s"census: ${ok.size} ok, ${mismatch.size} mismatch, " +
      s"${results.size - ok.size - mismatch.size} DuckDB-dialect-only " +
      s"of ${results.size} oracles")
    mismatch.foreach { case (n, s) => info(s"  MISMATCH $n: $s") }
    assert(SqlParityQueries.paritySet.forall(ok.contains),
      "curated parity set must round-trip")
    assert(mismatch.isEmpty,
      "every Spark-parseable oracle must match frames: " +
        mismatch.map(_._1).mkString(", "))
  }
}
