package graft.queries

import graft.core.{Q, Tables}
import org.apache.spark.sql.functions._

/** SURVEY §2.8 scalar function families — one query per family, all
  * row-parallel codegen'd projections (no shuffle except the final sort),
  * using only the Java∩RE2 regex subset and cross-engine-stable numerics
  * (Appendix B).
  */
object ScalarQueries {

  val all: Seq[Q] = Seq(
    Q("q_str_funcs",
      """SELECT p_partkey,
        |  upper(p_name) AS up_name,
        |  lower(p_brand) AS lo_brand,
        |  substring(p_name, 1, 8) AS name8,
        |  trim(p_name) AS trimmed,
        |  concat_ws('|', p_brand, p_name) AS joined,
        |  lpad(p_brand, 12, '*') AS padded,
        |  CAST(length(p_name) AS BIGINT) AS name_len,
        |  replace(p_name, ' ', '_') AS snake,
        |  string_split(p_name, ' ')[1] AS first_tok
        |FROM part ORDER BY p_partkey""".stripMargin) { (s, d) =>
      Tables.part(s, d).select(
          col("p_partkey"),
          upper(col("p_name")).as("up_name"),
          lower(col("p_brand")).as("lo_brand"),
          substring(col("p_name"), 1, 8).as("name8"),
          trim(col("p_name")).as("trimmed"),
          concat_ws("|", col("p_brand"), col("p_name")).as("joined"),
          lpad(col("p_brand"), 12, "*").as("padded"),
          length(col("p_name")).cast("bigint").as("name_len"),
          regexp_replace(col("p_name"), " ", "_").as("snake"),
          element_at(split(col("p_name"), " "), 1).as("first_tok"))
        .orderBy("p_partkey")
    },

    Q("q_regex",
      """SELECT p_partkey, p_brand,
        |  CAST(regexp_extract(p_brand, '#(\d+)$', 1) AS INT) AS brand_num,
        |  regexp_replace(p_name, '[aeiou]', '', 'g') AS no_vowels
        |FROM part
        |WHERE regexp_matches(p_brand, '#1\d$')
        |ORDER BY p_partkey""".stripMargin) { (s, d) =>
      Tables.part(s, d)
        .filter(col("p_brand").rlike("#1\\d$"))
        .select(col("p_partkey"), col("p_brand"),
          regexp_extract(col("p_brand"), "#(\\d+)$", 1).cast("int").as("brand_num"),
          regexp_replace(col("p_name"), "[aeiou]", "").as("no_vowels"))
        .orderBy("p_partkey")
    },

    // dow normalized to 0=Monday on both sides (Spark dayofweek 1=Sunday,
    // DuckDB dayofweek 0=Sunday); day diffs on midnight timestamps are
    // exact in both. DATE never reaches the output (Appendix B, same rule
    // as DECIMAL): pandas reads Spark parquet DATE as datetime.date
    // objects while DuckDB .df() renders DATE as datetime64 — so date
    // arithmetic results are emitted as midnight TIMESTAMPs.
    Q("q_datetime",
      """SELECT o_orderkey,
        |  CAST(year(o_orderdate) AS INT) AS y,
        |  CAST(month(o_orderdate) AS INT) AS m,
        |  CAST(quarter(o_orderdate) AS INT) AS q,
        |  CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
        |  CAST(CAST(o_orderdate + INTERVAL 30 DAY AS DATE) AS TIMESTAMP) AS plus30,
        |  CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '2000-01-01') AS INT) AS days_to_2000,
        |  CAST((dayofweek(o_orderdate) + 6) % 7 AS INT) AS dow_iso
        |FROM orders ORDER BY o_orderkey""".stripMargin) { (s, d) =>
      Tables.orders(s, d).select(
          col("o_orderkey"),
          year(col("o_orderdate")).as("y"),
          month(col("o_orderdate")).as("m"),
          quarter(col("o_orderdate")).as("q"),
          expr("CAST(date_trunc('month', o_orderdate) AS TIMESTAMP_NTZ)").as("month_start"),
          date_add(col("o_orderdate"), 30).cast("timestamp_ntz").as("plus30"),
          datediff(lit("2000-01-01").cast("date"), col("o_orderdate")).as("days_to_2000"),
          ((dayofweek(col("o_orderdate")) + 5) % 7).as("dow_iso"))
        .orderBy("o_orderkey")
    },

    // Numeric family on keys + 2-decimal money (where round() ties are exact
    // binary .5 ⇒ both engines round away from zero identically). sqrt is
    // IEEE-correctly-rounded everywhere; ln/log10 are excluded from the
    // oracle set — JVM Math.log differs from libm by 1 ulp on this fixture.
    Q("q_math",
      """SELECT o_orderkey,
        |  round(o_totalprice) AS rounded,
        |  CAST(floor(o_totalprice) AS BIGINT) AS fl,
        |  CAST(ceil(o_totalprice) AS BIGINT) AS ce,
        |  abs(o_totalprice - 100000) AS dist,
        |  pow(2, o_orderkey % 10) AS p2,
        |  sqrt(o_orderkey) AS sq,
        |  o_orderkey % 7 AS m7,
        |  CAST(sign(o_totalprice - 100000) AS INT) AS sgn,
        |  o_orderkey & 255 AS band,
        |  o_orderkey | 16 AS bor,
        |  xor(o_orderkey, 85) AS bxor
        |FROM orders ORDER BY o_orderkey""".stripMargin) { (s, d) =>
      Tables.orders(s, d).select(
          col("o_orderkey"),
          round(col("o_totalprice")).as("rounded"),
          floor(col("o_totalprice")).as("fl"),
          ceil(col("o_totalprice")).as("ce"),
          abs(col("o_totalprice") - 100000).as("dist"),
          pow(lit(2), col("o_orderkey") % 10).as("p2"),
          sqrt(col("o_orderkey")).as("sq"),
          (col("o_orderkey") % 7).as("m7"),
          signum(col("o_totalprice") - 100000).cast("int").as("sgn"),
          col("o_orderkey").bitwiseAND(lit(255L)).as("band"),
          col("o_orderkey").bitwiseOR(lit(16L)).as("bor"),
          col("o_orderkey").bitwiseXOR(lit(85L)).as("bxor"))
        .orderBy("o_orderkey")
    },

    // Higher-order array functions over the 64-dim embedding column.
    // Elementwise math casts to DOUBLE first (float→double is exact; both
    // engines then do identical IEEE ops). ARRAY never reaches the output
    // (Appendix B, same rule as MAP): element arrays are quantized to
    // exact integers (floor(x·10⁶) — identical IEEE ops both engines)
    // and emitted as comma-joined strings; float scalars widen to DOUBLE.
    Q("q_array_funcs",
      """SELECT vec_id,
        |  CAST(len(embedding) AS INT) AS dim,
        |  array_to_string(list_transform(list_slice(embedding, 1, 4),
        |    x -> CAST(CAST(FLOOR(CAST(x AS DOUBLE) * 1000000) AS BIGINT) AS VARCHAR)), ',') AS head4_q,
        |  CAST(embedding[1] AS DOUBLE) AS first_el,
        |  CAST(list_max(embedding) AS DOUBLE) AS el_max,
        |  CAST(list_min(embedding) AS DOUBLE) AS el_min,
        |  array_to_string(list_transform(embedding,
        |    x -> CAST(CAST(FLOOR(CAST(x AS DOUBLE) * 2 * 1000000) AS BIGINT) AS VARCHAR)), ',') AS doubled_q,
        |  CAST(len(list_filter(embedding, x -> x > 0)) AS INT) AS n_pos
        |FROM embeddings ORDER BY vec_id""".stripMargin) { (s, d) =>
      Tables.embeddings(s, d).select(
          col("vec_id"),
          size(col("embedding")).as("dim"),
          array_join(transform(slice(col("embedding"), 1, 4),
            x => floor(x.cast("double") * 1000000).cast("long").cast("string")), ",").as("head4_q"),
          element_at(col("embedding"), 1).cast("double").as("first_el"),
          array_max(col("embedding")).cast("double").as("el_max"),
          array_min(col("embedding")).cast("double").as("el_min"),
          array_join(transform(col("embedding"),
            x => floor(x.cast("double") * 2 * 1000000).cast("long").cast("string")), ",").as("doubled_q"),
          size(filter(col("embedding"), x => x > 0)).as("n_pos"))
        .orderBy("vec_id")
    },

    Q("q_json_extract",
      """SELECT event_type,
        |  COUNT(*) AS cnt,
        |  CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        |  MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
        |  MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
        |FROM events
        |GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .withColumn("k", get_json_object(col("props"), "$.k").cast("bigint"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("cnt"), sum("k").as("sum_k"),
          min("k").as("min_k"), max("k").as("max_k"))
        .orderBy("event_type")
    },

    // MAP never reaches the output (Appendix B): parse → explode → flat
    // columns. The fixture maps are single-key, so the oracle's scalar
    // extraction is an exact twin.
    Q("q_map_funcs",
      """SELECT 'k' AS key, COUNT(*) AS cnt,
        |  CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_v
        |FROM events
        |ORDER BY key""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .select(explode(from_json(col("props"), org.apache.spark.sql.types.MapType(
          org.apache.spark.sql.types.StringType,
          org.apache.spark.sql.types.LongType))).as(Seq("key", "value")))
        .groupBy("key")
        .agg(count(lit(1)).as("cnt"), sum("value").as("sum_v"))
        .orderBy("key")
    }
  )
}
