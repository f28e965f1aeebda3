package graft.queries

import graft.core.{Q, Scratch, Tables}
import graft.operators.Compaction
import org.apache.spark.sql.functions._

/** Table-maintenance and data-management operators: column profiling
  * (the ANALYZE/stats pass), schema-evolution reads, and small-file
  * compaction — the operational layer a 100 TB table lives or dies by.
  */
object MaintenanceQueries {

  val all: Seq[Q] = Seq(
    // Column profiler: the stats a catalog/CBO ingests — row count, null
    // count, exact NDV, min/max — for four orders columns in ONE scan
    // (multi-distinct lands in a single Expand-based aggregate, not four
    // passes; the single output row is exploded to per-column rows).
    // At 100 TB the same plan runs with approx_count_distinct swapped in
    // (cap_agg_approx is that sketch's gate); exact NDV here keeps the
    // DuckDB twin bit-checkable. min/max travel as VARCHAR so the
    // unpivoted rows are one type: BIGINT and DATE casts are
    // format-stable across engines (no doubles — double→string differs).
    Q("q_profile_table",
      """SELECT col_name, n, n_null, ndv, min_s, max_s FROM (
        |  SELECT 'o_orderkey' AS col_name, COUNT(*) AS n,
        |    CAST(COUNT(*) - COUNT(o_orderkey) AS BIGINT) AS n_null,
        |    COUNT(DISTINCT o_orderkey) AS ndv,
        |    CAST(MIN(o_orderkey) AS VARCHAR) AS min_s,
        |    CAST(MAX(o_orderkey) AS VARCHAR) AS max_s
        |  FROM orders
        |  UNION ALL
        |  SELECT 'o_custkey', COUNT(*),
        |    CAST(COUNT(*) - COUNT(o_custkey) AS BIGINT),
        |    COUNT(DISTINCT o_custkey),
        |    CAST(MIN(o_custkey) AS VARCHAR), CAST(MAX(o_custkey) AS VARCHAR)
        |  FROM orders
        |  UNION ALL
        |  SELECT 'o_orderstatus', COUNT(*),
        |    CAST(COUNT(*) - COUNT(o_orderstatus) AS BIGINT),
        |    COUNT(DISTINCT o_orderstatus),
        |    CAST(MIN(o_orderstatus) AS VARCHAR), CAST(MAX(o_orderstatus) AS VARCHAR)
        |  FROM orders
        |  UNION ALL
        |  SELECT 'o_orderdate', COUNT(*),
        |    CAST(COUNT(*) - COUNT(o_orderdate) AS BIGINT),
        |    COUNT(DISTINCT CAST(o_orderdate AS DATE)),
        |    CAST(MIN(CAST(o_orderdate AS DATE)) AS VARCHAR),
        |    CAST(MAX(CAST(o_orderdate AS DATE)) AS VARCHAR)
        |  FROM orders) t
        |ORDER BY col_name""".stripMargin) { (s, d) =>
      val o = Tables.orders(s, d)
        .withColumn("o_orderdate_d", col("o_orderdate").cast("date"))
      def prof(name: String, c: String) = struct(
        lit(name).as("col_name"),
        count(lit(1)).as("n"),
        (count(lit(1)) - count(col(c))).as("n_null"),
        countDistinct(col(c)).as("ndv"),
        min(col(c)).cast("string").as("min_s"),
        max(col(c)).cast("string").as("max_s"))
      o.agg(
        prof("o_orderkey", "o_orderkey").as("p1"),
        prof("o_custkey", "o_custkey").as("p2"),
        prof("o_orderstatus", "o_orderstatus").as("p3"),
        prof("o_orderdate", "o_orderdate_d").as("p4"))
        .select(explode(array(col("p1"), col("p2"), col("p3"), col("p4"))).as("p"))
        .select("p.*")
        .orderBy("col_name")
    },

    // Cross-engine table checksum — the migration-validation primitive: a
    // user switching engines needs ROW-LEVEL proof the data came across,
    // not just matching counts. Each row is canonicalized to a '|'-joined
    // string (ints/strings as-is, timestamps via DATE, money via
    // DECIMAL(12,4) — the only cross-engine-stable string forms; raw
    // doubles are banned from the repr), md5'd, the first 15 hex digits
    // parsed to a BIGINT, and SUMmed as DECIMAL(38,0) — an
    // order-independent, partition-independent, overflow-free fingerprint
    // per group. One linear scan with map-side partial sums; any single
    // changed/missing/extra row flips the group checksum.
    Q("q_table_checksum",
      """SELECT l_returnflag, COUNT(*) AS n,
        |  CAST(CAST(SUM(CAST(CAST('0x' || substr(md5(
        |    l_orderkey || '|' || l_linenumber || '|' || l_returnflag || '|' ||
        |    l_linestatus || '|' || CAST(CAST(l_shipdate AS DATE) AS VARCHAR) || '|' ||
        |    CAST(CAST(l_quantity AS DECIMAL(12,4)) AS VARCHAR)), 1, 15)
        |    AS BIGINT) AS DECIMAL(20,0))) AS DECIMAL(38,0)) AS VARCHAR) AS checksum
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) {
      (s, d) =>
        val repr = concat_ws("|",
          col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
          col("l_linestatus"), col("l_shipdate").cast("date"),
          col("l_quantity").cast("decimal(12,4)"))
        // addends at (20,0): the sum widens exactly in BOTH engines
        // (DuckDB would demote a SUM of DECIMAL(38,_) to DOUBLE). The
        // ~2^79 exact sum ships as its canonical digit STRING — a raw
        // decimal column would be rendered float64 by the driver's pandas
        // path, and d2d's double form would cap row-level sensitivity at
        // ulp(1e23) ≈ 1e7.
        val h = conv(substring(md5(repr), 1, 15), 16, 10).cast("decimal(20,0)")
        Tables.lineitem(s, d)
          .groupBy("l_returnflag")
          .agg(count(lit(1)).as("n"),
            sum(h).cast("decimal(38,0)").cast("string").as("checksum"))
          .orderBy("l_returnflag")
    },

    // Corrupt-record-tolerant ingest: a JSONL drop where ~1/7 of the
    // lines are malformed (truncated mid-object — the torn-write /
    // bad-producer reality of any large ingest). PERMISSIVE mode must
    // capture each bad line VERBATIM in the corrupt-record column while
    // parsing every good line, so the pipeline can quarantine bad rows
    // to a dead-letter table instead of failing the load or silently
    // dropping data. Emits (n_good, n_bad, exact good-row sum);
    // MaintenanceSpec pins both counts and the sum against the batch
    // ground truth, and asserts DROPMALFORMED parses the same good set.
    Q.cap("cap_source_corrupt") { (s, d) =>
      val root = Scratch.dir("corrupt")
      val o = Tables.orders(s, d).select("o_orderkey", "o_totalprice")
      o.select(when(col("o_orderkey") % 7 === 0,
          // truncate mid-object: unparseable, deterministically derived
          expr("substring(to_json(struct(o_orderkey, o_totalprice)), 1, 12)"))
          .otherwise(to_json(struct(col("o_orderkey"), col("o_totalprice"))))
          .as("value"))
        .write.mode("overwrite").text(root)
      val schema = "o_orderkey BIGINT, o_totalprice DOUBLE, _bad STRING"
      val read = s.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_bad")
        .json(root)
      read.agg(
        count(when(col("_bad").isNull, 1)).as("n_good"),
        count(col("_bad")).as("n_bad"),
        graft.core.Dsl.d2d(graft.core.Dsl.dsum(
          when(col("_bad").isNull, col("o_totalprice")))).as("sum_good"))
    },

    // Schema-evolution read: a table whose later ingest batches carry an
    // extra column (the normal life of a 100 TB table). Two batches land
    // under ingest=1/ (o_orderkey, o_orderstatus) and ingest=2/ (+
    // o_totalprice); a mergeSchema read of the root must unify the schema
    // and null-backfill the old batch. Emits one row per ingest batch
    // with the null count of the late column — batch 1 all-null, batch 2
    // none — so a silent column drop or misalignment fails the ScalaTest
    // gate (MaintenanceSpec).
    Q.cap("cap_source_evolution") { (s, d) =>
      val root = Scratch.dir("evolve")
      val o = Tables.orders(s, d)
      o.select("o_orderkey", "o_orderstatus")
        .write.mode("overwrite").parquet(s"$root/ingest=1")
      o.select("o_orderkey", "o_orderstatus", "o_totalprice")
        .write.mode("overwrite").parquet(s"$root/ingest=2")
      s.read.option("mergeSchema", "true").parquet(root)
        .groupBy("ingest")
        .agg(count(lit(1)).as("n_rows"),
          sum(when(col("o_totalprice").isNull, 1L).otherwise(0L)).as("n_null_late"))
        .orderBy("ingest")
    },

    // Dynamic partition overwrite: rewrite ONLY the partitions the
    // incoming frame touches — the daily-restatement primitive for a
    // partitioned 100 TB table (static overwrite mode would TRUNCATE the
    // whole root; the conf scopes the write to the partitions present in
    // the data). Writes lineitem partitioned by l_returnflag, restates
    // just the R partition with doubled quantities, and reports per-flag
    // counts and exact sums before/after — MaintenanceSpec asserts A/N
    // survive bit-identically while R doubles.
    Q.cap("cap_sink_dynamic_overwrite") { (s, d) =>
      val root = Scratch.dir("dynover")
      val li = Tables.lineitem(s, d)
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")
      li.write.mode("overwrite").partitionBy("l_returnflag").parquet(root)
      // materialize the before-stats NOW — a lazy read over the same root
      // would execute after the restatement and see the rewritten data
      val before = s.read.parquet(root).groupBy("l_returnflag")
        .agg(count(lit(1)).as("n_before"),
          graft.core.Dsl.dsum(col("l_quantity")).as("q_before"))
        .localCheckpoint(true)
      val prev = s.conf.getOption("spark.sql.sources.partitionOverwriteMode")
      s.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
      try
        li.filter(col("l_returnflag") === "R")
          .withColumn("l_quantity", col("l_quantity") * 2)
          .write.mode("overwrite").partitionBy("l_returnflag").parquet(root)
      finally prev match {
        case Some(v) => s.conf.set("spark.sql.sources.partitionOverwriteMode", v)
        case None => s.conf.unset("spark.sql.sources.partitionOverwriteMode")
      }
      val after = s.read.parquet(root).groupBy(col("l_returnflag").as("flag2"))
        .agg(count(lit(1)).as("n_after"),
          graft.core.Dsl.dsum(col("l_quantity")).as("q_after"))
      before.join(after, col("l_returnflag") === col("flag2"))
        .select(col("l_returnflag"), col("n_before"), col("n_after"),
          graft.core.Dsl.d2d(col("q_before")).as("sum_before"),
          graft.core.Dsl.d2d(col("q_after")).as("sum_after"))
        .orderBy("l_returnflag")
    },

    // Small-file compaction ([[graft.operators.Compaction]]): fragment
    // lineitem into 64 splinter files, compact to 4, and report the
    // before/after file counts plus row parity in one frame.
    Q.cap("cap_maintain_compact") { (s, d) =>
      val in = Scratch.dir("frag_in")
      val out = Scratch.dir("frag_out")
      val li = Tables.lineitem(s, d)
      li.repartition(64).write.mode("overwrite").parquet(in)
      val st = Compaction.compact(s, in, out, targetFiles = Some(4))
      val expected = li.count()
      import s.implicits._
      Seq((st.filesBefore, st.filesAfter, st.rows, expected,
        st.rows == expected))
        .toDF("files_before", "files_after", "rows_out", "rows_in", "rows_match")
    },

    // Incremental materialized-aggregate maintenance: a monthly revenue
    // rollup kept current by MERGING each arriving batch's PARTIAL
    // aggregates into the persisted view — partial+final aggregation as
    // a storage design, the nightly materialized-view primitive. The
    // three arrival batches split orders by key hash, so months OVERLAP
    // across batches and every merge is a genuine re-aggregation (not an
    // append). count and DECIMAL sums are associative partials, so the
    // maintained view is BIT-EQUAL to a from-scratch recompute — the
    // emitted frame carries the per-month comparison and MaintenanceSpec
    // gates all-match plus merge-order invariance. Scale: each merge
    // reads the view (months-sized, not fact-sized) plus ONE batch; the
    // fact's history is never rescanned — at 100 TB the nightly cost is
    // O(batch) + O(view), and the companion cap_sink_dynamic_overwrite
    // shows how to restate only the partitions a batch touches.
    Q.cap("cap_incremental_rollup") { (s, d) =>
      val root = Scratch.dir("rollup")
      val o = Tables.orders(s, d).select(
        // midnight timestamp, not DATE — the output contract
        // (OutputContractSpec) bans DATE from emitted schemas
        date_trunc("month", col("o_orderdate")).as("month"),
        col("o_totalprice"), col("o_orderkey"))
      def partials(df: org.apache.spark.sql.DataFrame) =
        df.groupBy("month").agg(count(lit(1)).as("cnt"),
          graft.core.Dsl.dsum(col("o_totalprice")).as("rev"))
      var viewPath = ""
      (0 until 3).foreach { i =>
        val batch = partials(o.filter(pmod(col("o_orderkey"), lit(3)) === i))
        val merged =
          if (i == 0) batch
          else s.read.parquet(viewPath).unionByName(batch)
            .groupBy("month")
            .agg(sum("cnt").as("cnt"),
              sum(col("rev")).cast(graft.core.Dsl.D18).as("rev"))
        val out = s"$root/view_$i"
        merged.write.mode("overwrite").parquet(out)
        viewPath = out
      }
      val view = s.read.parquet(viewPath)
      val full = partials(o)
        .withColumnRenamed("cnt", "full_cnt")
        .withColumnRenamed("rev", "full_rev")
      view.join(full, Seq("month"), "full_outer")
        .select(col("month"), col("cnt"), col("full_cnt"),
          graft.core.Dsl.d2d(col("rev")).as("rev"),
          (col("cnt") === col("full_cnt") &&
            col("rev") === col("full_rev")).as("is_match"))
        .orderBy("month")
    },

    // Rule-based data-quality audit — the contract gate a 100 TB ingest
    // runs before publishing a snapshot: domain checks, range checks,
    // referential integrity both directions, and key uniqueness, each
    // reported as (rule, rows checked, violations). Zero-violation rows
    // are emitted too: an audit that only reports failures cannot prove
    // it ran.
    //
    // Scale shape: ONE pass over each fact computes all conditional
    // counts (a single map-side-combinable aggregate per table — adding
    // a rule costs a column, not a scan); the two referential checks are
    // anti-joins on the key (the orphan side is null-producing LEFT
    // JOIN ... IS NULL so the oracle text stays engine-portable); the
    // uniqueness check groups on the documented candidate key. All
    // branches reduce to ONE-ROW frames before the cross joins, so the
    // final assembly is metadata-sized. The DataFrame impl emits the 10
    // rules via one explode over the single assembled row — the oracle's
    // 10-way UNION ALL re-reads a CTE instead (equivalent frames; the
    // engine-side plan is the one-scan shape).
    Q("q_quality_rules",
      """WITH li AS (
        |  SELECT COUNT(*) AS n,
        |    SUM(CASE WHEN l_partkey IS NULL THEN 1 ELSE 0 END) AS v_nullkey,
        |    SUM(CASE WHEN l_quantity < 1 OR l_quantity > 50 THEN 1 ELSE 0 END) AS v_qty,
        |    SUM(CASE WHEN l_discount < 0 OR l_discount > 0.1 THEN 1 ELSE 0 END) AS v_disc,
        |    SUM(CASE WHEN l_discount >= 0.08 THEN 1 ELSE 0 END) AS v_hidisc,
        |    SUM(CASE WHEN l_extendedprice <= 0 THEN 1 ELSE 0 END) AS v_price
        |  FROM lineitem),
        |od AS (
        |  SELECT COUNT(*) AS n,
        |    SUM(CASE WHEN o_orderstatus NOT IN ('O', 'F', 'P') THEN 1 ELSE 0 END) AS v_status,
        |    SUM(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS v_total
        |  FROM orders),
        |orph AS (
        |  SELECT COUNT(*) AS v FROM lineitem l LEFT JOIN orders o
        |    ON l.l_orderkey = o.o_orderkey WHERE o.o_orderkey IS NULL),
        |childless AS (
        |  SELECT COUNT(*) AS v FROM orders o LEFT JOIN
        |    (SELECT DISTINCT l_orderkey FROM lineitem) l
        |    ON o.o_orderkey = l.l_orderkey WHERE l.l_orderkey IS NULL),
        |dup AS (
        |  SELECT COUNT(*) AS v FROM (
        |    SELECT l_orderkey FROM lineitem
        |    GROUP BY l_orderkey, l_linenumber, l_partkey, l_suppkey
        |    HAVING COUNT(*) > 1) t),
        |x AS (
        |  SELECT li.n AS li_n, li.v_nullkey, li.v_qty, li.v_disc,
        |    li.v_hidisc, li.v_price, od.n AS od_n, od.v_status, od.v_total,
        |    orph.v AS v_orph, childless.v AS v_childless, dup.v AS v_dup
        |  FROM li CROSS JOIN od CROSS JOIN orph
        |    CROSS JOIN childless CROSS JOIN dup)
        |SELECT 'li_discount_domain' AS rule, CAST(li_n AS BIGINT) AS n_checked, CAST(v_disc AS BIGINT) AS n_violations FROM x
        |UNION ALL SELECT 'li_discount_high', CAST(li_n AS BIGINT), CAST(v_hidisc AS BIGINT) FROM x
        |UNION ALL SELECT 'li_dup_key', CAST(li_n AS BIGINT), CAST(v_dup AS BIGINT) FROM x
        |UNION ALL SELECT 'li_null_partkey', CAST(li_n AS BIGINT), CAST(v_nullkey AS BIGINT) FROM x
        |UNION ALL SELECT 'li_orphan', CAST(li_n AS BIGINT), CAST(v_orph AS BIGINT) FROM x
        |UNION ALL SELECT 'li_price_positive', CAST(li_n AS BIGINT), CAST(v_price AS BIGINT) FROM x
        |UNION ALL SELECT 'li_qty_range', CAST(li_n AS BIGINT), CAST(v_qty AS BIGINT) FROM x
        |UNION ALL SELECT 'ord_childless', CAST(od_n AS BIGINT), CAST(v_childless AS BIGINT) FROM x
        |UNION ALL SELECT 'ord_status_domain', CAST(od_n AS BIGINT), CAST(v_status AS BIGINT) FROM x
        |UNION ALL SELECT 'ord_total_positive', CAST(od_n AS BIGINT), CAST(v_total AS BIGINT) FROM x
        |ORDER BY rule""".stripMargin) { (s, d) =>
      val one1 = lit(1L)
      val li = Tables.lineitem(s, d).agg(
        count(lit(1)).as("li_n"),
        sum(when(col("l_partkey").isNull, one1).otherwise(0L)).as("v_nullkey"),
        sum(when(col("l_quantity") < 1 || col("l_quantity") > 50, one1)
          .otherwise(0L)).as("v_qty"),
        sum(when(col("l_discount") < 0 || col("l_discount") > 0.1, one1)
          .otherwise(0L)).as("v_disc"),
        sum(when(col("l_discount") >= 0.08, one1).otherwise(0L)).as("v_hidisc"),
        sum(when(col("l_extendedprice") <= 0, one1).otherwise(0L)).as("v_price"))
      val od = Tables.orders(s, d).agg(
        count(lit(1)).as("od_n"),
        sum(when(!col("o_orderstatus").isin("O", "F", "P"), one1)
          .otherwise(0L)).as("v_status"),
        sum(when(col("o_totalprice") <= 0, one1).otherwise(0L)).as("v_total"))
      val orph = Tables.lineitem(s, d)
        .join(Tables.orders(s, d).select(col("o_orderkey")),
          col("l_orderkey") === col("o_orderkey"), "left_anti")
        .agg(count(lit(1)).as("v_orph"))
      val childless = Tables.orders(s, d)
        .join(Tables.lineitem(s, d).select(col("l_orderkey")).distinct(),
          col("o_orderkey") === col("l_orderkey"), "left_anti")
        .agg(count(lit(1)).as("v_childless"))
      val dup = Tables.lineitem(s, d)
        .groupBy("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")
        .agg(count(lit(1)).as("c")).filter(col("c") > 1)
        .agg(count(lit(1)).as("v_dup"))
      val x = li.crossJoin(od).crossJoin(orph).crossJoin(childless)
        .crossJoin(dup)
      def rule(name: String, checked: String, viol: String) =
        struct(lit(name).as("rule"), col(checked).as("n_checked"),
          col(viol).as("n_violations"))
      x.select(explode(array(
          rule("li_discount_domain", "li_n", "v_disc"),
          rule("li_discount_high", "li_n", "v_hidisc"),
          rule("li_dup_key", "li_n", "v_dup"),
          rule("li_null_partkey", "li_n", "v_nullkey"),
          rule("li_orphan", "li_n", "v_orph"),
          rule("li_price_positive", "li_n", "v_price"),
          rule("li_qty_range", "li_n", "v_qty"),
          rule("ord_childless", "od_n", "v_childless"),
          rule("ord_status_domain", "od_n", "v_status"),
          rule("ord_total_positive", "od_n", "v_total"))).as("r"))
        .select(col("r.rule").as("rule"),
          col("r.n_checked").as("n_checked"),
          col("r.n_violations").as("n_violations"))
        .orderBy("rule")
    },

    // Snapshot-profile drift: the per-metric comparison a pipeline runs
    // between the current and previous slice before publishing —
    // row/entity counts, exact-cents min/max/sum of the measure — here
    // pre-1998 vs 1998+ orders. Both sides come from ONE conditional
    // aggregate (never two scans), and every value is an exact integer
    // < 2⁵³ emitted as DOUBLE, so the frame is bit-stable cross-engine.
    //
    // Scale shape: one map-side-combinable aggregate over the fact (the
    // two COUNT(DISTINCT)s expand the single pass ×2 — bounded); the
    // metric unpivot is row-local over the 1-row stats frame (stack on
    // the engine side, the UNION ALL spelling in the dual-ANSI oracle —
    // DuckDB materializes the CTE; Spark's census run inlines it, which
    // is correct just redundant, and the gated DataFrame path is the
    // one-pass plan).
    Q("q_profile_drift",
      """WITH s AS (
        |  SELECT CASE WHEN o_orderdate < TIMESTAMP '1998-01-01'
        |      THEN 1 ELSE 0 END AS pre,
        |    CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)
        |      AS cents,
        |    o_custkey AS k
        |  FROM orders),
        |g AS (
        |  SELECT CAST(SUM(pre) AS DOUBLE) AS n_pre,
        |    CAST(COUNT(*) - SUM(pre) AS DOUBLE) AS n_post,
        |    CAST(COUNT(DISTINCT CASE WHEN pre = 1 THEN k END) AS DOUBLE)
        |      AS c_pre,
        |    CAST(COUNT(DISTINCT CASE WHEN pre = 0 THEN k END) AS DOUBLE)
        |      AS c_post,
        |    CAST(MIN(CASE WHEN pre = 1 THEN cents END) AS DOUBLE)
        |      AS min_pre,
        |    CAST(MIN(CASE WHEN pre = 0 THEN cents END) AS DOUBLE)
        |      AS min_post,
        |    CAST(MAX(CASE WHEN pre = 1 THEN cents END) AS DOUBLE)
        |      AS max_pre,
        |    CAST(MAX(CASE WHEN pre = 0 THEN cents END) AS DOUBLE)
        |      AS max_post,
        |    CAST(SUM(CASE WHEN pre = 1 THEN cents ELSE 0 END) AS DOUBLE)
        |      AS sum_pre,
        |    CAST(SUM(CASE WHEN pre = 0 THEN cents ELSE 0 END) AS DOUBLE)
        |      AS sum_post
        |  FROM s)
        |SELECT 'cents_max' AS metric, max_pre AS v_pre, max_post AS v_post
        |  FROM g
        |UNION ALL SELECT 'cents_min', min_pre, min_post FROM g
        |UNION ALL SELECT 'cents_sum', sum_pre, sum_post FROM g
        |UNION ALL SELECT 'n_customers', c_pre, c_post FROM g
        |UNION ALL SELECT 'n_rows', n_pre, n_post FROM g
        |ORDER BY metric""".stripMargin) { (s, d) =>
      val src = Tables.orders(s, d)
        .select(when(col("o_orderdate") <
            lit("1998-01-01").cast("timestamp"), 1L).otherwise(0L)
            .as("pre"),
          (col("o_totalprice").cast("decimal(14,2)") * 100)
            .cast("long").as("cents"),
          col("o_custkey").as("k"))
      src
        .agg(
          sum("pre").cast("double").as("n_pre"),
          (count(lit(1)) - sum("pre")).cast("double").as("n_post"),
          countDistinct(when(col("pre") === 1, col("k")))
            .cast("double").as("c_pre"),
          countDistinct(when(col("pre") === 0, col("k")))
            .cast("double").as("c_post"),
          min(when(col("pre") === 1, col("cents"))).cast("double")
            .as("min_pre"),
          min(when(col("pre") === 0, col("cents"))).cast("double")
            .as("min_post"),
          max(when(col("pre") === 1, col("cents"))).cast("double")
            .as("max_pre"),
          max(when(col("pre") === 0, col("cents"))).cast("double")
            .as("max_post"),
          sum(when(col("pre") === 1, col("cents")).otherwise(0L))
            .cast("double").as("sum_pre"),
          sum(when(col("pre") === 0, col("cents")).otherwise(0L))
            .cast("double").as("sum_post"))
        .selectExpr(
          """stack(5,
            |  'cents_max', max_pre, max_post,
            |  'cents_min', min_pre, min_post,
            |  'cents_sum', sum_pre, sum_post,
            |  'n_customers', c_pre, c_post,
            |  'n_rows', n_pre, n_post) AS (metric, v_pre, v_post)
            |""".stripMargin)
        .orderBy("metric")
    }
  )
}
