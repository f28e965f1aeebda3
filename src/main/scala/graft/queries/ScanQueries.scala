package graft.queries

import graft.core.{Dsl, Q, Tables}
import org.apache.spark.sql.functions._

/** SURVEY §2.1 scans/sources + §2.2 projections/filters/predicates.
  *
  * Scale notes: every query here is a single-pass scan whose predicates and
  * projections reach the parquet reader (PushedFilters/ReadSchema asserted in
  * ScanSpec); at 100 TB these become row-group/page skips + column pruning
  * with no shuffle except the final (tiny) ordered aggregate output.
  */
object ScanQueries {
  import Dsl._

  val all: Seq[Q] = Seq(
    Q("q_scan_project",
      """SELECT l_orderkey, l_partkey, l_quantity, l_extendedprice, l_shipdate
        |FROM lineitem
        |ORDER BY l_orderkey, l_partkey, l_quantity, l_extendedprice, l_shipdate
        |LIMIT 100""".stripMargin) { (s, d) =>
      // lineitem has no small unique key (FIXTURES.md) → order by the whole
      // output column list; identical rows are byte-interchangeable so the
      // LIMIT cut stays hash-deterministic.
      Tables.lineitem(s, d)
        .select("l_orderkey", "l_partkey", "l_quantity", "l_extendedprice", "l_shipdate")
        .orderBy("l_orderkey", "l_partkey", "l_quantity", "l_extendedprice", "l_shipdate")
        .limit(100)
    },

    Q("q_scan_filter_pushdown",
      s"""SELECT l_linestatus, COUNT(*) AS cnt, ${d2dSql(dsumSql("l_extendedprice"))} AS sum_price
         |FROM lineitem
         |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
         |  AND l_shipdate < TIMESTAMP '1999-01-01'
         |  AND l_returnflag = 'R'
         |GROUP BY l_linestatus
         |ORDER BY l_linestatus""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1999-01-01").cast("timestamp") &&
          col("l_returnflag") === "R")
        .groupBy("l_linestatus")
        .agg(count(lit(1)).as("cnt"), d2d(dsum(col("l_extendedprice"))).as("sum_price"))
        .orderBy("l_linestatus")
    },

    // CSV round-trip is engine-internal: the oracle answers from parquet, so
    // the CSV read must faithfully reproduce the committed data.
    Q("q_source_csv",
      "SELECT n_nationkey, n_name, n_regionkey FROM nation ORDER BY n_nationkey") { (s, d) =>
      val src = Tables.nation(s, d)
      val tmp = graft.core.Scratch.dir("csv")
      src.coalesce(1).write.mode("overwrite").option("header", "true").csv(tmp)
      s.read.schema(src.schema).option("header", "true").csv(tmp)
        .select("n_nationkey", "n_name", "n_regionkey")
        .orderBy("n_nationkey")
    },

    Q("q_source_json",
      "SELECT r_regionkey, r_name FROM region ORDER BY r_regionkey") { (s, d) =>
      val src = Tables.region(s, d)
      val tmp = graft.core.Scratch.dir("json")
      src.coalesce(1).write.mode("overwrite").json(tmp)
      s.read.schema(src.schema).json(tmp)
        .select("r_regionkey", "r_name")
        .orderBy("r_regionkey")
    },

    // Avro round-trip through graft.sources.AvroSource (the spark-avro
    // connector jar doesn't ship in this offline image, so the
    // container-file protocol is implemented directly on the avro core
    // jars — see AvroSource's scaladoc for the block-splittable read).
    // Engine-internal like the CSV/JSON twins: the oracle answers from
    // parquet, so the write+split-read path must reproduce the data
    // bit-exactly (the 4 KB splitBytes forces multi-split reads of each
    // container file — the 100 TB fan-out shape, exercised at sf0.01).
    Q("q_source_avro",
      """SELECT o_orderkey, o_orderpriority,
        |  CAST(o_totalprice AS DOUBLE) AS price
        |FROM orders WHERE o_orderkey % 7 = 0 ORDER BY o_orderkey""".stripMargin) {
      (s, d) =>
      val src = Tables.orders(s, d)
        .filter(col("o_orderkey") % 7 === 0)
        .select(col("o_orderkey"), col("o_orderpriority"),
          col("o_totalprice").cast("double").as("price"))
      val tmp = graft.core.Scratch.wiped("avro_rt")
      graft.sources.AvroSource.write(src.repartition(3), tmp)
      graft.sources.AvroSource.read(s, tmp, splitBytes = 4L << 10)
        .orderBy("o_orderkey")
    },

    // Pagination semantics: LIMIT + OFFSET over a total order — the
    // cursor shape result APIs expose. Deterministic only because the
    // ORDER BY is total (unique key); the offset is applied before the
    // limit in both engines. Scale note: OFFSET is a driver-side skip of
    // an ordered prefix — fine for page-sized offsets, and deliberately
    // NOT the keyset-pagination shape (WHERE key > last) a 100 TB scan
    // would use; the oracle pins the semantics, not the access path.
    Q("q_limit_offset",
      """SELECT o_orderkey, o_orderpriority
        |FROM orders ORDER BY o_orderkey
        |LIMIT 20 OFFSET 10""".stripMargin) { (s, d) =>
      Tables.orders(s, d)
        .select("o_orderkey", "o_orderpriority")
        .orderBy("o_orderkey")
        .offset(10).limit(20)
    },

    // Line-delimited text source: the rawest ingest format a corpus
    // arrives in (one document per line). Round-trip: documents render to
    // '<lang>\t<text>' lines via the TEXT writer, read back with
    // spark.read.text + a limit-2 split (text may itself contain tabs —
    // the fixture doesn't, but the parse must not depend on that), then
    // per-lang aggregate. The oracle computes the same profile straight
    // off the parquet table, so the gate proves byte-exact line
    // round-tripping, not just row counts.
    Q("q_source_text",
      """SELECT lang, COUNT(*) AS n_docs,
        |  CAST(SUM(length(text)) AS BIGINT) AS n_chars
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin) { (s, d) =>
      val src = Tables.documents(s, d)
        .select(concat_ws("\t", col("lang"), col("text")).as("value"))
      val tmp = graft.core.Scratch.dir("textsrc")
      src.coalesce(1).write.mode("overwrite").text(tmp)
      s.read.text(tmp)
        .select(split(col("value"), "\t", 2).as("p"))
        .select(col("p").getItem(0).as("lang"), col("p").getItem(1).as("text"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(length(col("text"))).cast("long").as("n_chars"))
        .orderBy("lang")
    },

    // ORC round-trip (spark-avro connector is not shipped offline; ORC is
    // built in): columnar alternative source with schema + pushdown parity.
    Q("q_source_orc",
      "SELECT s_suppkey, s_name, s_nationkey, s_acctbal FROM supplier WHERE s_nationkey < 10 ORDER BY s_suppkey") { (s, d) =>
      val src = Tables.supplier(s, d)
      val tmp = graft.core.Scratch.dir("orc")
      src.write.mode("overwrite").orc(tmp)
      s.read.schema(src.schema).orc(tmp)
        .filter(col("s_nationkey") < 10)
        .select("s_suppkey", "s_name", "s_nationkey", "s_acctbal")
        .orderBy("s_suppkey")
    },

    // XML round-trip via Spark 4's native XML source — the reference's core
    // input shape (SEC EDGAR XBRL filings are XML). Engine-internal like
    // the CSV/JSON twins: the oracle answers from parquet, so the XML
    // write+read must faithfully reproduce the committed data (the writer
    // escapes markup; doubles survive via shortest-roundtrip formatting).
    Q("q_source_xml",
      "SELECT c_custkey, c_name, c_mktsegment, c_acctbal FROM customer WHERE c_custkey <= 500 ORDER BY c_custkey") { (s, d) =>
      val src = Tables.customer(s, d).filter(col("c_custkey") <= 500)
        .select("c_custkey", "c_name", "c_mktsegment", "c_acctbal")
      val tmp = graft.core.Scratch.dir("xml")
      src.write.mode("overwrite").format("xml")
        .option("rootTag", "customers").option("rowTag", "customer").save(tmp)
      s.read.format("xml").schema(src.schema)
        .option("rowTag", "customer").load(tmp)
        .orderBy("c_custkey")
    },

    // from_xml over XBRL-fact-shaped strings: each row renders as
    // <fact><key>…</key><name>…</name><size>…</size><value>…</value></fact>
    // (the reference's numeric-fact record: concept + typed value), then
    // the native XML parser recovers the typed columns. The oracle selects
    // the source columns directly — the parse must be lossless (doubles
    // round-trip exactly through Java shortest-repr formatting; p_name is
    // markup-free alphanumerics).
    Q("q_xml_extract",
      """SELECT p_partkey, p_name, p_size, p_retailprice FROM part
        |WHERE p_size >= 40 ORDER BY p_partkey""".stripMargin) { (s, d) =>
      val xml = concat(
        lit("<fact><key>"), col("p_partkey"),
        lit("</key><name>"), col("p_name"),
        lit("</name><size>"), col("p_size"),
        lit("</size><value>"), col("p_retailprice"), lit("</value></fact>"))
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("key", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("name", org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("size", org.apache.spark.sql.types.IntegerType),
        org.apache.spark.sql.types.StructField("value", org.apache.spark.sql.types.DoubleType)))
      Tables.part(s, d).filter(col("p_size") >= 40)
        .select(xml.as("x"))
        .select(from_xml(col("x"), schema).as("f"))
        .select(col("f.key").as("p_partkey"), col("f.name").as("p_name"),
          col("f.size").as("p_size"), col("f.value").as("p_retailprice"))
        .orderBy("p_partkey")
    },

    Q("q_filter_complex",
      """SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate
        |FROM orders
        |WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
        |  AND o_totalprice BETWEEN 50000 AND 200000
        |  AND (o_orderstatus = 'F' OR o_orderdate >= TIMESTAMP '1998-01-01')
        |  AND o_orderpriority LIKE '1-%'
        |ORDER BY o_orderkey""".stripMargin) { (s, d) =>
      Tables.orders(s, d)
        .filter(col("o_orderpriority").isin("1-URGENT", "2-HIGH") &&
          col("o_totalprice").between(50000, 200000) &&
          (col("o_orderstatus") === "F" ||
            col("o_orderdate") >= lit("1998-01-01").cast("timestamp")) &&
          col("o_orderpriority").like("1-%"))
        .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")
        .orderBy("o_orderkey")
    },

    // Integer sums: Spark SUM(int)→BIGINT but DuckDB SUM(int)→HUGEINT, so the
    // oracle pins CAST(... AS BIGINT).
    Q("q_case_conditional",
      """SELECT
        |  CASE WHEN p_retailprice < 950 THEN 'low'
        |       WHEN p_retailprice < 1450 THEN 'mid'
        |       ELSE 'high' END AS band,
        |  COUNT(*) AS cnt,
        |  CAST(SUM(COALESCE(NULLIF(p_size, 0), -1)) AS BIGINT) AS sum_sz,
        |  CAST(SUM(LEAST(p_size, 25)) AS BIGINT) AS sum_least,
        |  CAST(SUM(GREATEST(p_size, 10)) AS BIGINT) AS sum_greatest
        |FROM part
        |GROUP BY 1
        |ORDER BY band""".stripMargin) { (s, d) =>
      Tables.part(s, d)
        .select(
          when(col("p_retailprice") < 950, "low")
            .when(col("p_retailprice") < 1450, "mid")
            .otherwise("high").as("band"),
          coalesce(nullif(col("p_size"), lit(0)), lit(-1)).as("sz"),
          least(col("p_size"), lit(25)).as("l25"),
          greatest(col("p_size"), lit(10)).as("g10"))
        .groupBy("band")
        .agg(count(lit(1)).as("cnt"), sum("sz").as("sum_sz"),
          sum("l25").as("sum_least"), sum("g10").as("sum_greatest"))
        .orderBy("band")
    }
  )
}
