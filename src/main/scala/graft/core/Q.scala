package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One contract query from SURVEY.md §2: a Spark implementation plus an
  * optional DuckDB oracle SQL twin (None ⇒ capability-only, ScalaTest-gated).
  *
  * Determinism contract (SURVEY Appendix A): the result must be bitwise
  * stable across partitionings and hash-match the oracle run by the driver
  * at sf0.01 — every query ends with a total ORDER BY and aggregates via
  * exact DECIMAL arithmetic.
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Q {
  def apply(name: String, oracle: String)(fn: (SparkSession, String) => DataFrame): Q =
    Q(name, fn, Some(oracle))
  def cap(name: String)(fn: (SparkSession, String) => DataFrame): Q =
    Q(name, fn, None)
}
