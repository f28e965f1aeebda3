package graft.queries

import graft.core.{Q, Tables}
import org.apache.spark.sql.functions._

/** SURVEY §2.7 set operations. Spark's intersect/except are DISTINCT
  * semantics, matching SQL INTERSECT/EXCEPT. At scale these are shuffle
  * hash-aggregates on the full row — the (user_id, day) pair sets here are
  * pre-deduped projections, so the shuffled payload is just the key pair.
  */
object SetQueries {

  private def dayPairs(s: org.apache.spark.sql.SparkSession, d: String, t: String) =
    Tables.events(s, d).filter(col("event_type") === t)
      .select(col("user_id"), date_trunc("day", col("ts")).as("d"))
      .distinct()

  val all: Seq[Q] = Seq(
    Q("q_union_all",
      """SELECT nk, COUNT(*) AS cnt FROM (
        |  SELECT c_nationkey AS nk FROM customer
        |  UNION ALL
        |  SELECT s_nationkey AS nk FROM supplier) u
        |GROUP BY nk ORDER BY nk""".stripMargin) { (s, d) =>
      Tables.customer(s, d).select(col("c_nationkey").as("nk"))
        .unionByName(Tables.supplier(s, d).select(col("s_nationkey").as("nk")))
        .groupBy("nk").agg(count(lit(1)).as("cnt"))
        .orderBy("nk")
    },

    Q("q_union_distinct",
      """SELECT c_nationkey AS nk FROM customer
        |UNION
        |SELECT s_nationkey AS nk FROM supplier
        |ORDER BY nk""".stripMargin) { (s, d) =>
      Tables.customer(s, d).select(col("c_nationkey").as("nk"))
        .union(Tables.supplier(s, d).select(col("s_nationkey").as("nk")))
        .distinct()
        .orderBy("nk")
    },

    Q("q_intersect",
      """WITH s AS (SELECT DISTINCT user_id, date_trunc('day', ts) AS d
        |           FROM events WHERE event_type = 'signup'),
        |     e AS (SELECT DISTINCT user_id, date_trunc('day', ts) AS d
        |           FROM events WHERE event_type = 'error')
        |SELECT user_id, COUNT(*) AS cnt
        |FROM (SELECT * FROM s INTERSECT SELECT * FROM e) b
        |GROUP BY user_id ORDER BY user_id""".stripMargin) { (s, d) =>
      dayPairs(s, d, "signup").intersect(dayPairs(s, d, "error"))
        .groupBy("user_id").agg(count(lit(1)).as("cnt"))
        .orderBy("user_id")
    },

    // day appears in the output → pin naive-µs timestamp on both sides
    // (Spark date_trunc yields LTZ; DuckDB yields DATE-ish).
    Q("q_except",
      """WITH s AS (SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS d
        |           FROM events WHERE event_type = 'signup'),
        |     e AS (SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS d
        |           FROM events WHERE event_type = 'error')
        |SELECT d AS day, COUNT(*) AS cnt
        |FROM (SELECT * FROM s EXCEPT SELECT * FROM e) o
        |GROUP BY d ORDER BY day""".stripMargin) { (s, d) =>
      def pairs(t: String) =
        Tables.events(s, d).filter(col("event_type") === t)
          .select(col("user_id"),
            expr("CAST(date_trunc('day', ts) AS TIMESTAMP_NTZ)").as("d"))
          .distinct()
      pairs("signup").except(pairs("error"))
        .groupBy("d").agg(count(lit(1)).as("cnt"))
        .select(col("d").as("day"), col("cnt"))
        .orderBy("day")
    }
  )
}
