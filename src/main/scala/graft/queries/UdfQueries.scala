package graft.queries

import graft.core.{Dsl, Q, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** SURVEY §2.11 UDF / UDAF / UDTF surfaces + §2.1 sink capabilities.
  *
  * Scale note: scalar UDFs and typed Aggregators run per-partition with
  * partial aggregation; the flatMap UDTF is the one deliberately
  * non-codegen operator (it demonstrates the typed generator surface —
  * the explode-based form in q_text_tokens_tf is the codegen'd shape).
  */
object UdfQueries {

  /** Pure branching arithmetic — same double expression tree as the SQL
    * CASE twin, so banding is bit-identical. */
  private def chargeBand(price: Double, disc: Double, tax: Double): String = {
    val charge = price * (1 - disc) * (1 + tax)
    if (charge < 20000) "S" else if (charge < 60000) "M" else if (charge < 100000) "L" else "XL"
  }

  val all: Seq[Q] = Seq(
    Q("q_udf_scalar",
      """SELECT band, COUNT(*) AS cnt FROM (
        |  SELECT CASE
        |    WHEN l_extendedprice * (1 - l_discount) * (1 + l_tax) < 20000 THEN 'S'
        |    WHEN l_extendedprice * (1 - l_discount) * (1 + l_tax) < 60000 THEN 'M'
        |    WHEN l_extendedprice * (1 - l_discount) * (1 + l_tax) < 100000 THEN 'L'
        |    ELSE 'XL' END AS band
        |  FROM lineitem) t
        |GROUP BY band ORDER BY band""".stripMargin) { (s, d) =>
      val bandUdf = udf(chargeBand _)
      Tables.lineitem(s, d)
        .select(bandUdf(col("l_extendedprice"), col("l_discount"), col("l_tax")).as("band"))
        .groupBy("band").agg(count(lit(1)).as("cnt"))
        .orderBy("band")
    },

    Q("q_udaf_l2",
      s"""SELECT p_brand,
        |  ${Dsl.d2dSql("CAST(SUM(CAST(p_retailprice AS DECIMAL(19,4)) * CAST(p_retailprice AS DECIMAL(19,4))) AS DECIMAL(38,4))")} AS sum_sq
        |FROM part GROUP BY p_brand ORDER BY p_brand""".stripMargin) { (s, d) =>
      val l2 = udaf(graft.functions.SumSquares)
      Tables.part(s, d)
        .groupBy("p_brand")
        .agg(Dsl.d2d(l2(col("p_retailprice")).cast(DecimalType(38, 4))).as("sum_sq"))
        .orderBy("p_brand")
    },

    // Typed generator (UDTF ≙ flatMap): one output row per adjacent token
    // pair. The oracle builds the same bigrams with lateral generate_series.
    Q("q_udtf_bigrams",
      """WITH tk AS (SELECT string_split(text, ' ') AS toks FROM documents)
        |SELECT bigram, COUNT(*) AS cnt FROM (
        |  SELECT toks[i] || ' ' || toks[i + 1] AS bigram
        |  FROM tk, LATERAL (SELECT unnest(generate_series(1, len(toks) - 1)) AS i) g) b
        |GROUP BY bigram ORDER BY cnt DESC, bigram LIMIT 20""".stripMargin) { (s, d) =>
      import s.implicits._
      Tables.documents(s, d).select("text").as[String]
        .flatMap(t => t.split(" ").iterator.sliding(2).withPartial(false)
          .map(_.mkString(" ")))
        .toDF("bigram")
        .groupBy("bigram").agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("bigram"))
        .limit(20)
    },

    // JDBC sink round-trip against in-memory Derby (the only offline JDBC
    // DB; SQLite is the documented production target). Derby upper-cases
    // unquoted identifiers → re-alias on read-back.
    Q.cap("cap_sink_jdbc") { (s, d) =>
      val url = "jdbc:derby:memory:graftdb;create=true"
      val agg = Tables.orders(s, d)
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("cnt"))
      agg.write.mode("overwrite")
        .format("jdbc").option("url", url).option("dbtable", "status_counts")
        .save()
      s.read.format("jdbc").option("url", url).option("dbtable", "status_counts")
        .load()
        .select(col("o_orderstatus"), col("cnt"))
        .orderBy("o_orderstatus")
    },

    // Partitioned parquet write + partition-pruned re-read (exercises DPP
    // metadata layout — the 100 TB table layout primitive).
    Q.cap("cap_sink_parquet") { (s, d) =>
      val tmp = graft.core.Scratch.dir("part")
      Tables.lineitem(s, d)
        .write.mode("overwrite").partitionBy("l_returnflag").parquet(tmp)
      s.read.parquet(tmp)
        .filter(col("l_returnflag") === "R")
        .groupBy("l_linestatus").agg(count(lit(1)).as("cnt"))
        .orderBy("l_linestatus")
    }
  )
}
