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
}
