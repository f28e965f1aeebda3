package graft.queries

import graft.core.{Dsl, Q, Scratch, Tables}
import graft.table.ManifestTable
import org.apache.spark.sql.functions._

/** ACID-table queries over [[graft.table.ManifestTable]] — the
  * transactional seam (atomic commit, snapshot isolation, time travel,
  * MERGE) exercised end-to-end and ORACLE-GATED: each query runs a real
  * multi-commit table lifecycle in a scratch warehouse, reads the
  * committed snapshots back, and emits a deterministic fingerprint that
  * DuckDB reproduces relationally from the same parquet inputs. The
  * oracle knows nothing about manifests — it states what the table MUST
  * contain after each commit, so the whole commit/read path is pinned by
  * the same hash gate as any other operator.
  *
  * Scale shape: every commit is one distributed parquet write + a
  * footer-metadata sweep + one JSON rename; MERGE rewrites only the
  * files whose manifest key-range overlaps the changelog (verified by
  * ManifestTableSpec; at 100 TB the rewrite is proportional to touched
  * data, not table size). The fingerprint aggregates are the usual
  * map-side-combinable rollups.
  */
object TableQueries {

  private val P = org.apache.spark.sql.types.DataTypes.createDecimalType(14, 4)

  val all: Seq[Q] = Seq(

    // MERGE into a manifest table — q_cdc_apply's latest-wins changelog
    // applied TRANSACTIONALLY: base snapshot committed at v0 (4
    // range-partitioned files so key-range pruning is real), the
    // changelog resolved per key (latest sequence wins, the CDC
    // pre-compaction every MERGE consumer does) and merged in one
    // atomic commit, then the COMMITTED table is read back and
    // fingerprinted per key-bucket. The oracle is the pure relational
    // statement of the same latest-wins semantics.
    Q("q_table_merge",
      """WITH base AS (
        |  SELECT o_orderkey AS k, 0 AS seq, 'U' AS op,
        |    CAST(o_totalprice AS DECIMAL(14,4)) AS p
        |  FROM orders),
        |upd AS (
        |  SELECT o_orderkey, 1, 'U',
        |    CAST(CAST(o_totalprice AS DECIMAL(12,4))
        |      + CAST(o_orderkey % 300 AS DECIMAL(12,4))
        |      + CAST(0.75 AS DECIMAL(12,4)) AS DECIMAL(14,4))
        |  FROM orders WHERE o_orderkey % 5 = 2),
        |del AS (
        |  SELECT o_orderkey, 2, 'D', CAST(0 AS DECIMAL(14,4))
        |  FROM orders WHERE o_orderkey % 11 = 3),
        |ins AS (
        |  SELECT -(o_orderkey + 1), 1, 'U',
        |    CAST(CAST(o_orderkey % 700 AS DECIMAL(12,4))
        |      + CAST(2.5 AS DECIMAL(12,4)) AS DECIMAL(14,4))
        |  FROM orders WHERE o_orderkey % 19 = 7),
        |chg AS (
        |  SELECT * FROM base UNION ALL SELECT * FROM upd
        |  UNION ALL SELECT * FROM del UNION ALL SELECT * FROM ins),
        |latest AS (
        |  SELECT k, op, p,
        |    ROW_NUMBER() OVER (PARTITION BY k ORDER BY seq DESC) AS rn
        |  FROM chg)
        |SELECT CAST(k % 10 AS BIGINT) AS bucket, COUNT(*) AS n_rows,
        |  CAST(SUM(k) AS BIGINT) AS key_sum, %PSUM% AS price_sum
        |FROM latest WHERE rn = 1 AND op <> 'D'
        |GROUP BY k % 10 ORDER BY bucket""".stripMargin
        .replace("%PSUM%", Dsl.d2dSql(Dsl.dsumSql("p")))) { (s, d) =>
      val dir = Scratch.wiped("mtable_merge")
      val o = Tables.orders(s, d)
        .select(col("o_orderkey").as("k"),
          col("o_totalprice").cast(Dsl.DFac).as("tp"))
      val base = o.select(col("k"), col("tp").cast(P).as("p"))
      // v0: 4 range-partitioned files ⇒ honest per-file key stats
      ManifestTable.create(s, dir,
        base.repartitionByRange(4, col("k")), statsCols = Seq("k"))
      val upd = o.filter(col("k") % 5 === 2)
        .select(col("k"), lit(1).as("seq"), lit("U").as("_op"),
          (col("tp") + (col("k") % 300).cast(Dsl.DFac)
            + lit(0.75).cast(Dsl.DFac)).cast(P).as("p"))
      val del = o.filter(col("k") % 11 === 3)
        .select(col("k"), lit(2).as("seq"), lit("D").as("_op"),
          lit(0).cast(P).as("p"))
      // inserts in the disjoint NEGATIVE key space (collision-free at
      // any scale — see q_cdc_apply)
      val ins = o.filter(col("k") % 19 === 7)
        .select((-(col("k") + 1L)).as("k"), lit(1).as("seq"),
          lit("U").as("_op"),
          ((col("k") % 700).cast(Dsl.DFac)
            + lit(2.5).cast(Dsl.DFac)).cast(P).as("p"))
      // CDC resolution (one row per key, latest sequence wins —
      // update+delete collisions resolve to the delete, seq 2) is
      // MERGE's own seqCol contract: one window pass inside the
      // operator instead of a pre-compaction shuffle plus a second
      // uniqueness window
      val changelog = upd.union(del).union(ins)
      ManifestTable.merge(s, dir, changelog, "k", opCol = Some("_op"),
        seqCol = Some("seq"))
      ManifestTable.read(s, dir)
        .groupBy((col("k") % 10).as("bucket"))
        .agg(count(lit(1)).as("n_rows"),
          sum(col("k")).cast("long").as("key_sum"),
          Dsl.d2d(Dsl.dsum(col("p"))).as("price_sum"))
        .orderBy("bucket")
    },

    // The format("graft") SQL surface end-to-end: the table is CREATED
    // and APPENDED through the registered DataSourceV2 connector (no
    // facade write call), then read back BOTH ways — spark.read
    // .format("graft") and ManifestTable.read — and fingerprinted per
    // key bucket under a 'sql' / 'facade' tag. One oracle hash pins the
    // two paths equal to each other AND to the relational statement of
    // the lifecycle: a plain-SQL user and a Scala-facade user see the
    // byte-same table.
    Q("q_table_sql",
      """WITH t AS (
        |  SELECT o_orderkey AS k,
        |    CAST(o_totalprice AS DECIMAL(14,4)) AS p
        |  FROM orders
        |  UNION ALL
        |  SELECT -o_orderkey,
        |    CAST(CAST(o_totalprice AS DECIMAL(12,4))
        |      + CAST(1.25 AS DECIMAL(12,4)) AS DECIMAL(14,4))
        |  FROM orders WHERE o_orderkey % 13 = 5),
        |fp AS (
        |  SELECT CAST(k % 10 AS BIGINT) AS bucket, COUNT(*) AS n_rows,
        |    CAST(SUM(k) AS BIGINT) AS key_sum, %PSUM% AS price_sum
        |  FROM t GROUP BY k % 10)
        |SELECT 'facade' AS api, bucket, n_rows, key_sum, price_sum FROM fp
        |UNION ALL
        |SELECT 'sql', bucket, n_rows, key_sum, price_sum FROM fp
        |ORDER BY api, bucket""".stripMargin
        .replace("%PSUM%", Dsl.d2dSql(Dsl.dsumSql("p")))) { (s, d) =>
      val dir = Scratch.wiped("mtable_sql")
      val o = Tables.orders(s, d)
        .select(col("o_orderkey").as("k"),
          col("o_totalprice").cast(Dsl.DFac).as("tp"))
      // CREATE through the connector (default save mode on a missing
      // table), layout spec via writer options
      o.select(col("k"), col("tp").cast(P).as("p"))
        .write.format("graft").option("statsCols", "k").save(dir)
      // APPEND through the connector — an atomic commit like any other
      o.filter(col("k") % 13 === 5)
        .select((-col("k")).as("k"),
          (col("tp") + lit(1.25).cast(Dsl.DFac)).cast(P).as("p"))
        .write.format("graft").mode("append").save(dir)
      def fp(df: org.apache.spark.sql.DataFrame, tag: String) = df
        .groupBy((col("k") % 10).cast("long").as("bucket"))
        .agg(count(lit(1)).as("n_rows"),
          sum(col("k")).cast("long").as("key_sum"),
          Dsl.d2d(Dsl.dsum(col("p"))).as("price_sum"))
        .select(lit(tag).as("api"), col("bucket"), col("n_rows"),
          col("key_sum"), col("price_sum"))
      fp(s.read.format("graft").load(dir), "sql")
        .unionByName(fp(graft.table.ManifestTable.read(s, dir), "facade"))
        .orderBy("api", "bucket")
    },

    // The TABLE CATALOG surface end-to-end, plain SQL only: a
    // GraftCatalog is registered on a scratch warehouse, the table is
    // created by CTAS, grown by INSERT INTO, and read back at the
    // current version AND via VERSION AS OF 1 (the CTAS data commit;
    // v0 is the empty CREATE) — SQL time travel
    // through the manifest log. The oracle restates both snapshots
    // relationally; one hash pins the whole catalog lifecycle.
    Q("q_table_catalog",
      """WITH base AS (
        |  SELECT o_orderkey AS k, CAST(o_totalprice AS DECIMAL(14,4)) AS p
        |  FROM orders),
        |ins AS (
        |  SELECT -o_orderkey AS k,
        |    CAST(CAST(o_totalprice AS DECIMAL(12,4))
        |      + CAST(1.25 AS DECIMAL(12,4)) AS DECIMAL(14,4)) AS p
        |  FROM orders WHERE o_orderkey % 13 = 5),
        |fp0 AS (
        |  SELECT 'v0' AS snap, CAST(k % 10 AS BIGINT) AS bucket,
        |    COUNT(*) AS n_rows, CAST(SUM(k) AS BIGINT) AS key_sum,
        |    %PSUM% AS price_sum
        |  FROM base GROUP BY k % 10),
        |fp1 AS (
        |  SELECT 'v1', CAST(k % 10 AS BIGINT), COUNT(*),
        |    CAST(SUM(k) AS BIGINT), %PSUM%
        |  FROM (SELECT * FROM base UNION ALL SELECT * FROM ins)
        |  GROUP BY k % 10)
        |SELECT * FROM fp0 UNION ALL SELECT * FROM fp1
        |ORDER BY snap, bucket""".stripMargin
        .replace("%PSUM%", Dsl.d2dSql(Dsl.dsumSql("p")))) { (s, d) =>
      val wh = Scratch.wiped("mtable_cat")
      s.conf.set("spark.sql.catalog.gqcat",
        "graft.sources.GraftCatalog")
      s.conf.set("spark.sql.catalog.gqcat.warehouse", wh)
      Tables.orders(s, d)
        .select(col("o_orderkey").as("k"),
          col("o_totalprice").cast(Dsl.DFac).as("tp"))
        .createOrReplaceTempView("gqcat_orders")
      s.sql("CREATE NAMESPACE IF NOT EXISTS gqcat.m")
      s.sql("""CREATE TABLE gqcat.m.o
        TBLPROPERTIES ('option.statsCols' = 'k')
        AS SELECT k, CAST(tp AS DECIMAL(14,4)) AS p FROM gqcat_orders""")
      s.sql("""INSERT INTO gqcat.m.o
        SELECT -k, CAST(tp + CAST(1.25 AS DECIMAL(12,4)) AS DECIMAL(14,4))
        FROM gqcat_orders WHERE k % 13 = 5""")
      def fp(df: org.apache.spark.sql.DataFrame, tag: String) = df
        .groupBy((col("k") % 10).cast("long").as("bucket"))
        .agg(count(lit(1)).as("n_rows"),
          sum(col("k")).cast("long").as("key_sum"),
          Dsl.d2d(Dsl.dsum(col("p"))).as("price_sum"))
        .select(lit(tag).as("snap"), col("bucket"), col("n_rows"),
          col("key_sum"), col("price_sum"))
      // catalog CTAS is ONE staged commit (r18): the data IS version 0
      fp(s.sql("SELECT * FROM gqcat.m.o VERSION AS OF 0"), "v0")
        .unionByName(fp(s.sql("SELECT * FROM gqcat.m.o"), "v1"))
        .orderBy("snap", "bucket")
    },

    // SQL row-level DML end-to-end (round-15 verdict #2): the table is
    // mutated by SQL TEXT — `UPDATE t SET … WHERE …` and a full-matrix
    // `MERGE INTO` (conditional DELETE / UPDATE composing target+source
    // / INSERT / NOT MATCHED BY SOURCE) through GraftSqlDmlRule — and a
    // FACADE twin table applies the identical operations through
    // ManifestTable.update + MergeInto. Both committed tables are
    // fingerprinted under 'sql' / 'facade' tags; the oracle restates
    // the final contents relationally, so ONE hash pins SQL ≡ facade ≡
    // the relational semantics. Keys are de-duplicated by a GROUP BY
    // base (fixture orderkeys are not guaranteed unique) so the MERGE
    // cardinality rule cannot fire.
    Q("q_table_sqldml",
      """WITH base AS (
        |  SELECT o_orderkey AS k,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(12,4)))
        |      AS DECIMAL(14,4)) AS p
        |  FROM orders GROUP BY o_orderkey),
        |after_upd AS (
        |  SELECT k, CASE WHEN k % 7 = 3
        |    THEN CAST(p + CAST(2.5 AS DECIMAL(12,4)) AS DECIMAL(14,4))
        |    ELSE p END AS p
        |  FROM base),
        |final AS (
        |  SELECT k, CASE
        |      WHEN k % 11 = 2 THEN
        |        CAST(p + CAST(k % 97 AS DECIMAL(12,4)) AS DECIMAL(14,4))
        |      WHEN NOT (k % 11 = 2) AND k % 19 = 7 THEN
        |        CAST(0 AS DECIMAL(14,4))
        |      ELSE p END AS p
        |  FROM after_upd WHERE NOT (k % 13 = 5)
        |  UNION ALL
        |  SELECT -k, CAST(CAST(k % 53 AS DECIMAL(12,4)) AS DECIMAL(14,4))
        |  FROM base WHERE k % 17 = 1),
        |fp AS (
        |  SELECT CAST(k % 10 AS BIGINT) AS bucket, COUNT(*) AS n_rows,
        |    CAST(SUM(k) AS BIGINT) AS key_sum, %PSUM% AS price_sum
        |  FROM final GROUP BY k % 10)
        |SELECT 'facade' AS api, bucket, n_rows, key_sum, price_sum FROM fp
        |UNION ALL
        |SELECT 'sql', bucket, n_rows, key_sum, price_sum FROM fp
        |ORDER BY api, bucket""".stripMargin
        .replace("%PSUM%", Dsl.d2dSql(Dsl.dsumSql("p")))) { (s, d) =>
      import graft.table.MergeInto
      val wh = Scratch.wiped("mtable_sqldml")
      val facDir = Scratch.wiped("mtable_sqldml_facade")
      s.conf.set("spark.sql.catalog.gqdml", "graft.sources.GraftCatalog")
      s.conf.set("spark.sql.catalog.gqdml.warehouse", wh)
      // the de-duplicated base feeds FOUR consumers (CTAS, the facade
      // create, both src branches) — persist so its groupBy shuffle
      // runs once, not per consumer
      val base = Tables.orders(s, d)
        .groupBy(col("o_orderkey").as("k"))
        .agg(sum(col("o_totalprice").cast(Dsl.DFac)).cast(P).as("p"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      base.createOrReplaceTempView("gqdml_base")
      // the shared MERGE source: one row per key — matched keys carry
      // an op ('D' wins where both predicates hold) and a delta, the
      // negative keys are pure inserts
      val src = base.where(col("k") % 13 === 5 || col("k") % 11 === 2)
        .select(col("k"),
          when(col("k") % 13 === 5, lit("D")).otherwise(lit("U")).as("op"),
          (col("k") % 97).cast(Dsl.DFac).as("dp"))
        .unionByName(base.where(col("k") % 17 === 1)
          .select((-col("k")).as("k"), lit("U").as("op"),
            (col("k") % 53).cast(Dsl.DFac).as("dp")))
      src.createOrReplaceTempView("gqdml_src")
      // --- SQL path: statements only ---
      s.sql("CREATE NAMESPACE IF NOT EXISTS gqdml.m")
      s.sql("""CREATE TABLE gqdml.m.t
        TBLPROPERTIES ('option.statsCols' = 'k')
        AS SELECT k, p FROM gqdml_base""")
      s.sql("""UPDATE gqdml.m.t
        SET p = CAST(p + CAST(2.5 AS DECIMAL(12,4)) AS DECIMAL(14,4))
        WHERE k % 7 = 3""")
      s.sql("""MERGE INTO gqdml.m.t AS t USING gqdml_src AS s
        ON t.k = s.k
        WHEN MATCHED AND s.op = 'D' THEN DELETE
        WHEN MATCHED THEN UPDATE SET p = CAST(t.p + s.dp AS DECIMAL(14,4))
        WHEN NOT MATCHED THEN INSERT (k, p) VALUES (s.k,
          CAST(s.dp AS DECIMAL(14,4)))
        WHEN NOT MATCHED BY SOURCE AND t.k % 19 = 7 THEN
          UPDATE SET p = CAST(0 AS DECIMAL(14,4))""")
      // --- facade twin: the same operations through the Scala API ---
      ManifestTable.create(s, facDir, base, statsCols = Seq("k"))
      ManifestTable.update(s, facDir, col("k") % 7 === 3,
        Map("p" -> (col("p") + lit(2.5).cast(Dsl.DFac))))
      MergeInto(s, facDir, src, keys = Seq("k"),
        matched = Seq(
          MergeInto.WhenMatched(MergeInto.Delete,
            Some(MergeInto.src("op") === "D")),
          MergeInto.WhenMatched(MergeInto.Update(Map(
            "p" -> (col("p") + MergeInto.src("dp")))))),
        notMatched = Seq(
          MergeInto.WhenNotMatched(MergeInto.Insert(Map(
            "k" -> col("k"), "p" -> col("dp"))))),
        notMatchedBySource = Seq(
          MergeInto.WhenNotMatchedBySource(
            MergeInto.Update(Map("p" -> lit(0))),
            Some(col("k") % 19 === 7))))
      def fp(df: org.apache.spark.sql.DataFrame, tag: String) = df
        .groupBy((col("k") % 10).cast("long").as("bucket"))
        .agg(count(lit(1)).as("n_rows"),
          sum(col("k")).cast("long").as("key_sum"),
          Dsl.d2d(Dsl.dsum(col("p"))).as("price_sum"))
        .select(lit(tag).as("api"), col("bucket"), col("n_rows"),
          col("key_sum"), col("price_sum"))
      base.unpersist()
      fp(s.sql("SELECT * FROM gqdml.m.t"), "sql")
        .unionByName(fp(ManifestTable.read(s, facDir), "facade"))
        .orderBy("api", "bucket")
    },

    // RENAME COLUMN end-to-end (round-15 verdict #4): the column is
    // renamed by one METADATA commit between two data commits, so the
    // final table mixes files carrying the OLD physical name (pre-
    // rename) and the NEW one (post-rename append + update rewrite) —
    // the read path's coalesce-over-lineage must surface ONE logical
    // column across generations, and time travel must answer v1 under
    // the old name. The oracle restates both snapshots relationally
    // (it never sees a rename — only what the table must contain), so
    // one hash pins the whole lineage mechanism.
    Q("q_table_rename",
      """WITH base AS (
        |  SELECT o_orderkey AS k,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(12,4)))
        |      AS DECIMAL(14,4)) AS amt
        |  FROM orders GROUP BY o_orderkey),
        |ins AS (
        |  SELECT -k, CAST(CAST(k % 31 AS DECIMAL(12,4)) AS DECIMAL(14,4))
        |  FROM base WHERE k % 13 = 5),
        |final AS (
        |  SELECT k, CASE WHEN k % 7 = 3
        |    THEN CAST(amt + CAST(5 AS DECIMAL(12,4)) AS DECIMAL(14,4))
        |    ELSE amt END AS amt
        |  FROM (SELECT * FROM base UNION ALL SELECT * FROM ins)),
        |fp0 AS (
        |  SELECT 'v1_oldname' AS snap, CAST(k % 10 AS BIGINT) AS bucket,
        |    COUNT(*) AS n_rows, CAST(SUM(k) AS BIGINT) AS key_sum,
        |    %PSUM% AS price_sum
        |  FROM base GROUP BY k % 10),
        |fp1 AS (
        |  SELECT 'head_newname', CAST(k % 10 AS BIGINT), COUNT(*),
        |    CAST(SUM(k) AS BIGINT), %PSUM%
        |  FROM final GROUP BY k % 10)
        |SELECT * FROM fp0 UNION ALL SELECT * FROM fp1
        |ORDER BY snap, bucket""".stripMargin
        .replace("%PSUM%", Dsl.d2dSql(Dsl.dsumSql("amt")))) { (s, d) =>
      val dir = Scratch.wiped("mtable_rename")
      val base = Tables.orders(s, d)
        .groupBy(col("o_orderkey").as("k"))
        .agg(sum(col("o_totalprice").cast(Dsl.DFac)).cast(P).as("p"))
      ManifestTable.create(s, dir, base, statsCols = Seq("k"))    // v0
      ManifestTable.renameColumn(s, dir, "p", "amt")              // v1
      // post-rename data commits write the NEW physical name
      ManifestTable.append(s, dir, base.where(col("k") % 13 === 5) // v2
        .select((-col("k")).as("k"),
          (col("k") % 31).cast(Dsl.DFac).cast(P).as("amt")))
      ManifestTable.update(s, dir, col("k") % 7 === 3,            // v3
        Map("amt" -> (col("amt") + lit(5).cast(Dsl.DFac))))
      def fp(df: org.apache.spark.sql.DataFrame, vcol: String, tag: String) =
        df.groupBy((col("k") % 10).cast("long").as("bucket"))
          .agg(count(lit(1)).as("n_rows"),
            sum(col("k")).cast("long").as("key_sum"),
            Dsl.d2d(Dsl.dsum(col(vcol))).as("price_sum"))
          .select(lit(tag).as("snap"), col("bucket"), col("n_rows"),
            col("key_sum"), col("price_sum"))
      // time travel BEFORE the rename answers under the OLD name
      fp(ManifestTable.readVersion(s, dir, 0L), "p", "v1_oldname")
        .unionByName(fp(ManifestTable.read(s, dir), "amt", "head_newname"))
        .orderBy("snap", "bucket")
    },

    // MERGE schema evolution end-to-end (round-16 verdict #2): the
    // merge source carries a column the table does not have; the SQL
    // path (`MERGE WITH SCHEMA EVOLUTION INTO` — Spark's analyzer
    // applies the additive AddColumn through GraftCatalog.alterTable,
    // the engine's metadata-only commit) and the facade path
    // (MergeInto(..., schemaEvolution = true) — the widened schema
    // rides the SAME commit as the merged data) must both yield a
    // table where matched/inserted rows carry the new column and every
    // PRE-MERGE row answers NULL under it with zero data IO. The
    // oracle restates the evolved table relationally (it never sees a
    // schema change — only what the table must contain), and the
    // NULL-vs-value split is pinned by n_extra/extra_sum per bucket;
    // ONE hash covers SQL ≡ facade ≡ the relational semantics.
    Q("q_table_merge_evolve",
      """WITH base AS (
        |  SELECT o_orderkey AS k,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(12,4)))
        |      AS DECIMAL(14,4)) AS p
        |  FROM orders GROUP BY o_orderkey),
        |src AS (
        |  SELECT k,
        |    CAST(p + CAST(k % 97 AS DECIMAL(12,4)) AS DECIMAL(14,4)) AS p,
        |    CAST(k % 37 AS BIGINT) AS extra
        |  FROM base WHERE k % 11 = 2
        |  UNION ALL
        |  SELECT -k, CAST(CAST(k % 53 AS DECIMAL(12,4)) AS DECIMAL(14,4)),
        |    CAST(k % 29 AS BIGINT)
        |  FROM base WHERE k % 17 = 1),
        |final AS (
        |  SELECT b.k AS k, CASE WHEN s.k IS NOT NULL THEN s.p ELSE b.p
        |    END AS p, s.extra AS extra
        |  FROM base b LEFT JOIN src s ON b.k = s.k
        |  UNION ALL
        |  SELECT s.k, s.p, s.extra FROM src s
        |  WHERE NOT EXISTS (SELECT 1 FROM base b WHERE b.k = s.k)),
        |fp AS (
        |  SELECT CAST(k % 10 AS BIGINT) AS bucket, COUNT(*) AS n_rows,
        |    CAST(SUM(k) AS BIGINT) AS key_sum, %PSUM% AS price_sum,
        |    COUNT(extra) AS n_extra, CAST(SUM(extra) AS BIGINT) AS extra_sum
        |  FROM final GROUP BY k % 10)
        |SELECT 'facade' AS api, bucket, n_rows, key_sum, price_sum,
        |  n_extra, extra_sum FROM fp
        |UNION ALL
        |SELECT 'sql', bucket, n_rows, key_sum, price_sum,
        |  n_extra, extra_sum FROM fp
        |ORDER BY api, bucket""".stripMargin
        .replace("%PSUM%", Dsl.d2dSql(Dsl.dsumSql("p")))) { (s, d) =>
      import graft.table.MergeInto
      val wh = Scratch.wiped("mtable_evolve")
      val facDir = Scratch.wiped("mtable_evolve_facade")
      s.conf.set("spark.sql.catalog.gqse", "graft.sources.GraftCatalog")
      s.conf.set("spark.sql.catalog.gqse.warehouse", wh)
      val base = Tables.orders(s, d)
        .groupBy(col("o_orderkey").as("k"))
        .agg(sum(col("o_totalprice").cast(Dsl.DFac)).cast(P).as("p"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      base.createOrReplaceTempView("gqse_base")
      val src = base.where(col("k") % 11 === 2)
        .select(col("k"),
          (col("p") + (col("k") % 97).cast(Dsl.DFac)).cast(P).as("p"),
          (col("k") % 37).cast("long").as("extra"))
        .unionByName(base.where(col("k") % 17 === 1)
          .select((-col("k")).as("k"),
            (col("k") % 53).cast(Dsl.DFac).cast(P).as("p"),
            (col("k") % 29).cast("long").as("extra")))
      src.createOrReplaceTempView("gqse_src")
      // --- SQL path: the statement drives the evolution itself ---
      s.sql("CREATE NAMESPACE IF NOT EXISTS gqse.m")
      s.sql("""CREATE TABLE gqse.m.t
        TBLPROPERTIES ('option.statsCols' = 'k')
        AS SELECT k, p FROM gqse_base""")
      s.sql("""MERGE WITH SCHEMA EVOLUTION INTO gqse.m.t AS t
        USING gqse_src AS s ON t.k = s.k
        WHEN MATCHED THEN UPDATE SET *
        WHEN NOT MATCHED THEN INSERT *""")
      // --- facade twin: one commit carries schema + data ---
      ManifestTable.create(s, facDir, base, statsCols = Seq("k"))
      MergeInto(s, facDir, src, keys = Seq("k"),
        matched = Seq(MergeInto.WhenMatched(MergeInto.UpdateAll)),
        notMatched = Seq(MergeInto.WhenNotMatched(MergeInto.InsertAll)),
        schemaEvolution = true)
      def fp(df: org.apache.spark.sql.DataFrame, tag: String) = df
        .groupBy((col("k") % 10).cast("long").as("bucket"))
        .agg(count(lit(1)).as("n_rows"),
          sum(col("k")).cast("long").as("key_sum"),
          Dsl.d2d(Dsl.dsum(col("p"))).as("price_sum"),
          count(col("extra")).as("n_extra"),
          sum(col("extra")).cast("long").as("extra_sum"))
        .select(lit(tag).as("api"), col("bucket"), col("n_rows"),
          col("key_sum"), col("price_sum"), col("n_extra"),
          col("extra_sum"))
      base.unpersist()
      fp(s.sql("SELECT * FROM gqse.m.t"), "sql")
        .unionByName(fp(ManifestTable.read(s, facDir), "facade"))
        .orderBy("api", "bucket")
    },

    // Row-group-granularity pruning end-to-end: one single-file table
    // with many small row groups (sorted by key, so each group owns a
    // tight key range), read back through read(dir, filter) — which
    // skips non-matching row groups BEFORE the scan is planned — and
    // through the full scan + filter. Both fingerprints must equal the
    // oracle's relational statement: row-group pruning can only skip
    // IO, never rows. (Kept-bytes ∝ selectivity is pinned by
    // ManifestTableSpec's row-group laws and the r14 marquee.)
    Q("q_table_rowgroup",
      """WITH t AS (
        |  SELECT o_orderkey AS k, CAST(o_totalprice AS DECIMAL(14,4)) AS p
        |  FROM orders WHERE o_orderkey <= 6000),
        |fp AS (
        |  SELECT CAST(k % 10 AS BIGINT) AS bucket, COUNT(*) AS n_rows,
        |    CAST(SUM(k) AS BIGINT) AS key_sum, %PSUM% AS price_sum
        |  FROM t GROUP BY k % 10)
        |SELECT 'full' AS api, bucket, n_rows, key_sum, price_sum FROM fp
        |UNION ALL
        |SELECT 'pruned', bucket, n_rows, key_sum, price_sum FROM fp
        |ORDER BY api, bucket""".stripMargin
        .replace("%PSUM%", Dsl.d2dSql(Dsl.dsumSql("p")))) { (s, d) =>
      val dir = Scratch.wiped("mtable_rg")
      val o = Tables.orders(s, d).select(col("o_orderkey").as("k"),
        col("o_totalprice").cast(P).as("p"))
      val hc = s.sparkContext.hadoopConfiguration
      val oldBlock = hc.get("parquet.block.size")
      try {
        hc.setInt("parquet.block.size", 64 * 1024)
        ManifestTable.create(s, dir, o.orderBy("k").coalesce(1),
          statsCols = Seq("k"))
      } finally {
        if (oldBlock == null) hc.unset("parquet.block.size")
        else hc.set("parquet.block.size", oldBlock)
      }
      def fp(df: org.apache.spark.sql.DataFrame, tag: String) = df
        .groupBy((col("k") % 10).cast("long").as("bucket"))
        .agg(count(lit(1)).as("n_rows"),
          sum(col("k")).cast("long").as("key_sum"),
          Dsl.d2d(Dsl.dsum(col("p"))).as("price_sum"))
        .select(lit(tag).as("api"), col("bucket"), col("n_rows"),
          col("key_sum"), col("price_sum"))
      fp(ManifestTable.read(s, dir, col("k") <= 6000L), "pruned")
        .unionByName(fp(ManifestTable.read(s, dir)
          .where(col("k") <= 6000L), "full"))
        .orderBy("api", "bucket")
    },

    // Standard MERGE INTO with a COMPOSITE key and the WHEN-clause
    // matrix: lineitem's natural (l_orderkey, l_linenumber) key, a
    // conditional UPDATE (src.action = 'U'), a fallthrough DELETE and a
    // NOT MATCHED INSERT — all in one atomic commit through
    // [[graft.table.MergeInto]] (per-column interval pruning, touched
    // files only). The oracle is the relational statement of ANSI MERGE:
    // left join for the matched matrix, NOT EXISTS for the inserts.
    Q("q_table_merge_multi",
      """WITH base AS (
        |  SELECT l_orderkey AS k1, CAST(l_linenumber AS BIGINT) AS k2,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(12,4)))
        |      AS DECIMAL(12,4)) AS tq
        |  FROM lineitem GROUP BY 1, 2),
        |src AS (
        |  SELECT k1, k2,
        |    CAST(tq + CAST(5 AS DECIMAL(12,4)) AS DECIMAL(14,4)) AS q,
        |    'U' AS action
        |  FROM base WHERE k1 % 7 = 1
        |  UNION ALL
        |  SELECT k1, k2, CAST(0 AS DECIMAL(14,4)), 'D'
        |  FROM base WHERE k1 % 11 = 4 AND k1 % 7 <> 1
        |  UNION ALL
        |  SELECT -k1, k2,
        |    CAST(tq + CAST(100 AS DECIMAL(12,4)) AS DECIMAL(14,4)), 'U'
        |  FROM base WHERE k1 % 19 = 7),
        |merged AS (
        |  SELECT b.k1 AS k1, b.k2 AS k2,
        |    CASE WHEN s.action = 'U' THEN s.q
        |      ELSE CAST(b.tq AS DECIMAL(14,4)) END AS q,
        |    s.action AS action
        |  FROM base b LEFT JOIN src s ON b.k1 = s.k1 AND b.k2 = s.k2
        |  UNION ALL
        |  SELECT s.k1, s.k2, s.q, NULL FROM src s
        |  WHERE NOT EXISTS (
        |    SELECT 1 FROM base b WHERE b.k1 = s.k1 AND b.k2 = s.k2))
        |SELECT CAST(k1 % 10 AS BIGINT) AS bucket, COUNT(*) AS n_rows,
        |  CAST(SUM(k1) AS BIGINT) AS key_sum,
        |  CAST(SUM(k2) AS BIGINT) AS k2_sum, %PSUM% AS price_sum
        |FROM merged WHERE action IS NULL OR action <> 'D'
        |GROUP BY k1 % 10 ORDER BY bucket""".stripMargin
        .replace("%PSUM%", Dsl.d2dSql(Dsl.dsumSql("q")))) { (s, d) =>
      import graft.table.MergeInto
      import MergeInto.{Delete, Insert, Update, WhenMatched, WhenNotMatched}
      val dir = Scratch.wiped("mtable_mmulti")
      // the synthetic fixture does NOT enforce TPC-H's unique
      // (orderkey, linenumber) — aggregate to a composite key that is
      // unique BY CONSTRUCTION (and relationally restatable)
      val li = Tables.lineitem(s, d)
        .groupBy(col("l_orderkey").as("k1"),
          col("l_linenumber").cast("long").as("k2"))
        .agg(sum(col("l_quantity").cast(Dsl.DFac)).cast(Dsl.DFac).as("tq"))
      ManifestTable.create(s, dir,
        li.select(col("k1"), col("k2"), col("tq").cast(P).as("q"))
          .repartitionByRange(4, col("k1")),
        statsCols = Seq("k1", "k2"))
      // derive the changelog from the COMMITTED table, not from the
      // aggregate: reading 4 sealed files back is one scan per branch,
      // where re-deriving from lineitem would re-run the 460k-group
      // dedupe shuffle three more times (q is tq exactly — the (14,4)
      // cast of a (12,4) value round-trips)
      val tbl = ManifestTable.read(s, dir)
        .select(col("k1"), col("k2"), col("q").cast(Dsl.DFac).as("tq"))
      val upd = tbl.filter(col("k1") % 7 === 1)
        .select(col("k1"), col("k2"),
          (col("tq") + lit(5).cast(Dsl.DFac)).cast(P).as("q"),
          lit("U").as("action"))
      val del = tbl.filter(col("k1") % 11 === 4 && col("k1") % 7 =!= 1)
        .select(col("k1"), col("k2"), lit(0).cast(P).as("q"),
          lit("D").as("action"))
      val ins = tbl.filter(col("k1") % 19 === 7)
        .select((-col("k1")).as("k1"), col("k2"),
          (col("tq") + lit(100).cast(Dsl.DFac)).cast(P).as("q"),
          lit("U").as("action"))
      MergeInto(s, dir, upd.union(del).union(ins), Seq("k1", "k2"),
        matched = Seq(
          WhenMatched(Update(Map("q" -> MergeInto.src("q"))),
            condition = Some(MergeInto.src("action") === "U")),
          WhenMatched(Delete)),
        notMatched = Seq(WhenNotMatched(Insert(Map(
          "k1" -> col("k1"), "k2" -> col("k2"), "q" -> col("q"))))))
      ManifestTable.read(s, dir)
        .groupBy((col("k1") % 10).cast("long").as("bucket"))
        .agg(count(lit(1)).as("n_rows"),
          sum(col("k1")).cast("long").as("key_sum"),
          sum(col("k2")).cast("long").as("k2_sum"),
          Dsl.d2d(Dsl.dsum(col("q"))).as("price_sum"))
        .orderBy("bucket")
    },

    // Version-diff changelog: the SAME merge lifecycle as q_table_merge,
    // then ManifestTable.changes(v0, v1) — the multiset I/D row diff
    // between two committed snapshots — aggregated per change type. The
    // oracle states the diff relationally (EXCEPT ALL both ways over the
    // latest-wins result), so the manifest read path, the merge, AND the
    // changelog derivation are all pinned by one hash. Scale shape:
    // changes() is two group-by-all-columns aggregates full-outer-joined
    // — one exchange per side, no row-scale driver state.
    Q("q_table_changelog",
      """WITH base AS (
        |  SELECT o_orderkey AS k, CAST(o_totalprice AS DECIMAL(14,4)) AS p
        |  FROM orders),
        |upd AS (
        |  SELECT k, CAST(CAST(p AS DECIMAL(12,4))
        |      + CAST(k % 300 AS DECIMAL(12,4))
        |      + CAST(0.75 AS DECIMAL(12,4)) AS DECIMAL(14,4)) AS p
        |  FROM base WHERE k % 5 = 2),
        |ins AS (
        |  SELECT -(k + 1) AS k,
        |    CAST(CAST(k % 700 AS DECIMAL(12,4))
        |      + CAST(2.5 AS DECIMAL(12,4)) AS DECIMAL(14,4)) AS p
        |  FROM base WHERE k % 19 = 7),
        |v1 AS (
        |  SELECT k, p FROM base WHERE k % 11 <> 3 AND k % 5 <> 2
        |  UNION ALL SELECT k, p FROM upd WHERE k % 11 <> 3
        |  UNION ALL SELECT k, p FROM ins),
        |chg AS (
        |  SELECT 'I' AS _change, k, p FROM
        |    ((SELECT k, p FROM v1) EXCEPT ALL (SELECT k, p FROM base))
        |  UNION ALL
        |  SELECT 'D' AS _change, k, p FROM
        |    ((SELECT k, p FROM base) EXCEPT ALL (SELECT k, p FROM v1)))
        |SELECT _change, COUNT(*) AS n_rows,
        |  CAST(SUM(k) AS BIGINT) AS key_sum, %PSUM% AS price_sum
        |FROM chg GROUP BY _change ORDER BY _change""".stripMargin
        .replace("%PSUM%", Dsl.d2dSql(Dsl.dsumSql("p")))) { (s, d) =>
      val dir = Scratch.wiped("mtable_chg")
      val o = Tables.orders(s, d)
        .select(col("o_orderkey").as("k"),
          col("o_totalprice").cast(Dsl.DFac).as("tp"))
      val base = o.select(col("k"), col("tp").cast(P).as("p"))
      ManifestTable.create(s, dir,
        base.repartitionByRange(4, col("k")), statsCols = Seq("k"))
      val upd = o.filter(col("k") % 5 === 2)
        .select(col("k"), lit(1).as("seq"), lit("U").as("_op"),
          (col("tp") + (col("k") % 300).cast(Dsl.DFac)
            + lit(0.75).cast(Dsl.DFac)).cast(P).as("p"))
      val del = o.filter(col("k") % 11 === 3)
        .select(col("k"), lit(2).as("seq"), lit("D").as("_op"),
          lit(0).cast(P).as("p"))
      val ins = o.filter(col("k") % 19 === 7)
        .select((-(col("k") + 1L)).as("k"), lit(1).as("seq"),
          lit("U").as("_op"),
          ((col("k") % 700).cast(Dsl.DFac)
            + lit(2.5).cast(Dsl.DFac)).cast(P).as("p"))
      val changelog = upd.union(del).union(ins)
      ManifestTable.merge(s, dir, changelog, "k", opCol = Some("_op"),
        seqCol = Some("seq"))
      ManifestTable.changes(s, dir, 0L, 1L)
        .groupBy("_change")
        .agg(count(lit(1)).as("n_rows"),
          sum(col("k")).cast("long").as("key_sum"),
          Dsl.d2d(Dsl.dsum(col("p"))).as("price_sum"))
        .orderBy("_change")
    },

    // Additive schema evolution: v0 committed as (k, p), a later append
    // carries an extra column — files written BEFORE the widening read
    // back with NULLs in it (parquet resolves the explicit read schema
    // by name), and the fingerprint splits on that presence. The oracle
    // states the same widened union relationally. Old snapshots keep
    // their committed schema (ManifestTableSpec pins that half).
    Q("q_table_evolve",
      """WITH v1 AS (
        |  SELECT o_orderkey AS k, CAST(o_totalprice AS DECIMAL(14,4)) AS p,
        |    CAST(NULL AS BIGINT) AS urgency
        |  FROM orders WHERE o_orderkey % 3 = 0
        |  UNION ALL
        |  SELECT o_orderkey, CAST(o_totalprice AS DECIMAL(14,4)),
        |    CAST(LENGTH(o_orderpriority) AS BIGINT)
        |  FROM orders WHERE o_orderkey % 3 = 1)
        |SELECT urgency IS NULL AS pre_evolution, COUNT(*) AS n_rows,
        |  CAST(SUM(k) AS BIGINT) AS key_sum,
        |  CAST(COALESCE(SUM(urgency), 0) AS BIGINT) AS urgency_sum,
        |  %PSUM% AS price_sum
        |FROM v1 GROUP BY urgency IS NULL ORDER BY pre_evolution""".stripMargin
        .replace("%PSUM%", Dsl.d2dSql(Dsl.dsumSql("p")))) { (s, d) =>
      val dir = Scratch.wiped("mtable_evolve")
      val o = Tables.orders(s, d)
        .select(col("o_orderkey").as("k"),
          col("o_totalprice").cast(Dsl.DFac).cast(P).as("p"),
          length(col("o_orderpriority")).cast("long").as("urgency"))
      ManifestTable.create(s, dir,
        o.filter(col("k") % 3 === 0).select("k", "p"), statsCols = Seq("k"))
      ManifestTable.append(s, dir, o.filter(col("k") % 3 === 1))
      ManifestTable.read(s, dir)
        .groupBy(col("urgency").isNull.as("pre_evolution"))
        .agg(count(lit(1)).as("n_rows"),
          sum(col("k")).cast("long").as("key_sum"),
          coalesce(sum(col("urgency")), lit(0L)).cast("long").as("urgency_sum"),
          Dsl.d2d(Dsl.dsum(col("p"))).as("price_sum"))
        .orderBy("pre_evolution")
    },

    // DROP COLUMN as a metadata-only commit: two commits carry a
    // 3-column schema, the drop narrows it WITHOUT touching a data
    // file (the physical column stays in the old parquet, invisible to
    // the explicit read schema), and a later append writes the
    // narrowed shape. The head fingerprint proves dropped values never
    // leak into reads; the pre-drop version fingerprint proves time
    // travel still sees them. Tombstone semantics (re-add refused,
    // restore/overwrite behavior) are pinned in ManifestTableSpec. At
    // 100 TB this is the schema-change primitive that costs one JSON
    // rename instead of a table rewrite.
    Q("q_table_drop",
      """WITH b AS (
        |  SELECT o_orderkey AS k, CAST(o_totalprice AS DECIMAL(14,4)) AS p,
        |    CAST(LENGTH(o_orderpriority) AS BIGINT) AS urgency
        |  FROM orders)
        |SELECT 'head' AS phase, COUNT(*) AS n_rows,
        |  CAST(SUM(k) AS BIGINT) AS key_sum, %PSUM% AS price_sum,
        |  CAST(0 AS BIGINT) AS urgency_sum
        |FROM b
        |UNION ALL
        |SELECT 'pre_drop' AS phase, COUNT(*) AS n_rows,
        |  CAST(SUM(k) AS BIGINT) AS key_sum, %PSUM% AS price_sum,
        |  CAST(SUM(urgency) AS BIGINT) AS urgency_sum
        |FROM b WHERE k % 3 IN (0, 1)
        |ORDER BY phase""".stripMargin
        .replace("%PSUM%", Dsl.d2dSql(Dsl.dsumSql("p")))) { (s, d) =>
      val dir = Scratch.wiped("mtable_drop")
      val o = Tables.orders(s, d)
        .select(col("o_orderkey").as("k"),
          col("o_totalprice").cast(Dsl.DFac).cast(P).as("p"),
          length(col("o_orderpriority")).cast("long").as("urgency"))
      ManifestTable.create(s, dir, o.filter(col("k") % 3 === 0),
        statsCols = Seq("k"))
      ManifestTable.append(s, dir, o.filter(col("k") % 3 === 1))
      ManifestTable.dropColumn(s, dir, "urgency")
      ManifestTable.append(s, dir,
        o.filter(col("k") % 3 === 2).select("k", "p"))
      val head = ManifestTable.read(s, dir)
        .agg(count(lit(1)).as("n_rows"),
          sum(col("k")).cast("long").as("key_sum"),
          Dsl.d2d(Dsl.dsum(col("p"))).as("price_sum"))
        .select(lit("head").as("phase"), col("n_rows"), col("key_sum"),
          col("price_sum"), lit(0L).as("urgency_sum"))
      val preDrop = ManifestTable.readVersion(s, dir, 1L)
        .agg(count(lit(1)).as("n_rows"),
          sum(col("k")).cast("long").as("key_sum"),
          Dsl.d2d(Dsl.dsum(col("p"))).as("price_sum"),
          sum(col("urgency")).cast("long").as("urgency_sum"))
        .select(lit("pre_drop").as("phase"), col("n_rows"), col("key_sum"),
          col("price_sum"), col("urgency_sum"))
      head.unionByName(preDrop).orderBy("phase")
    },

    // DELETE as deletion vectors (merge-on-read): two stacked DV
    // commits hide rows WITHOUT rewriting a data file — the manifest
    // attaches (file, row-position) vectors and every read subtracts
    // them through a broadcast anti-join priced by deleted rows, the
    // 100 TB needle-delete answer (copy-on-write delete stays the bulk
    // path). The head fingerprint proves subtraction is exact, the v0
    // fingerprint proves time travel still sees everything;
    // materialization-on-rewrite, changelog pricing, IVM flow and DV
    // vacuum are pinned in ManifestTableSpec.
    Q("q_table_dv",
      """WITH b AS (
        |  SELECT o_orderkey AS k, CAST(o_totalprice AS DECIMAL(14,4)) AS p
        |  FROM orders)
        |SELECT 'head' AS phase, COUNT(*) AS n_rows,
        |  CAST(SUM(k) AS BIGINT) AS key_sum, %PSUM% AS price_sum
        |FROM b WHERE k % 10 <> 0 AND k % 7 <> 0
        |UNION ALL
        |SELECT 'v0' AS phase, COUNT(*) AS n_rows,
        |  CAST(SUM(k) AS BIGINT) AS key_sum, %PSUM% AS price_sum
        |FROM b
        |ORDER BY phase""".stripMargin
        .replace("%PSUM%", Dsl.d2dSql(Dsl.dsumSql("p")))) { (s, d) =>
      val dir = Scratch.wiped("mtable_dv")
      val o = Tables.orders(s, d)
        .select(col("o_orderkey").as("k"),
          col("o_totalprice").cast(Dsl.DFac).cast(P).as("p"))
      ManifestTable.create(s, dir, o.repartitionByRange(2, col("k")),
        statsCols = Seq("k"))
      ManifestTable.deleteVector(s, dir, col("k") % 10 === 0)
      ManifestTable.deleteVector(s, dir, col("k") % 7 === 0)
      def fp(df: org.apache.spark.sql.DataFrame, phase: String) =
        df.agg(count(lit(1)).as("n_rows"),
          sum(col("k")).cast("long").as("key_sum"),
          Dsl.d2d(Dsl.dsum(col("p"))).as("price_sum"))
          .select(lit(phase).as("phase"), col("n_rows"), col("key_sum"),
            col("price_sum"))
      fp(ManifestTable.read(s, dir), "head")
        .unionByName(fp(ManifestTable.readVersion(s, dir, 0L), "v0"))
        .orderBy("phase")
    },

    // Time travel: three commits (create / append / overwrite), then
    // every snapshot read back AS OF its version and fingerprinted.
    // The oracle states each version's required contents directly from
    // orders; matching all three rows proves old snapshots stay intact
    // and readable after later commits (snapshot isolation) and that
    // overwrite atomically replaced — not merged — the file set.
    Q("q_table_timetravel",
      """WITH b AS (
        |  SELECT o_orderkey AS k, CAST(o_totalprice AS DECIMAL(14,4)) AS p
        |  FROM orders)
        |SELECT CAST(0 AS BIGINT) AS version, COUNT(*) AS n_rows,
        |  CAST(SUM(k) AS BIGINT) AS key_sum, %PSUM% AS price_sum
        |FROM b WHERE k % 4 = 0
        |UNION ALL
        |SELECT CAST(1 AS BIGINT), COUNT(*), CAST(SUM(k) AS BIGINT), %PSUM%
        |FROM b WHERE k % 4 = 0 OR k % 4 = 1
        |UNION ALL
        |SELECT CAST(2 AS BIGINT), COUNT(*), CAST(SUM(k) AS BIGINT), %PSUM%
        |FROM b WHERE k % 4 = 2
        |ORDER BY version""".stripMargin
        .replace("%PSUM%", Dsl.d2dSql(Dsl.dsumSql("p")))) { (s, d) =>
      val dir = Scratch.wiped("mtable_tt")
      val b = Tables.orders(s, d)
        .select(col("o_orderkey").as("k"),
          col("o_totalprice").cast(Dsl.DFac).cast(P).as("p"))
      ManifestTable.create(s, dir, b.filter(col("k") % 4 === 0),
        statsCols = Seq("k"))
      ManifestTable.append(s, dir, b.filter(col("k") % 4 === 1))
      ManifestTable.overwrite(s, dir, b.filter(col("k") % 4 === 2))
      val reads = (0L to 2L).map { v =>
        ManifestTable.readVersion(s, dir, v)
          .groupBy(lit(v).as("version"))
          .agg(count(lit(1)).as("n_rows"),
            sum(col("k")).cast("long").as("key_sum"),
            Dsl.d2d(Dsl.dsum(col("p"))).as("price_sum"))
      }
      reads.reduce(_.unionAll(_)).orderBy("version")
    },

    // Partitioned table + manifest-level file pruning: the table is
    // created PARTITIONED on a derived bucket column (partition values
    // recorded per file, Iceberg-style — the column stays in the data
    // files), then the SAME filtered aggregate is computed twice: once
    // through the PRUNED read path (read(dir, filter) — partition
    // values + footer key stats drop non-matching files before the
    // scan is planned) and once through the full scan + where. The
    // oracle states one relational truth for both rows, so the hash
    // gate pins pruned ≡ full — pruning can only ever skip IO. The
    // strict file-count laws (kept < total, kept files all match the
    // predicate) live in ManifestTableSpec; the 100 TB story is that
    // the skip decision is manifest-metadata-only, one driver pass
    // over |files| entries, no data IO for excluded partitions.
    Q("q_table_partition",
      """WITH b AS (
        |  SELECT o_orderkey AS k, o_orderkey % 8 AS bucket,
        |    CAST(o_totalprice AS DECIMAL(14,4)) AS p
        |  FROM orders),
        |f AS (SELECT * FROM b WHERE bucket = 3 AND k <= 300000)
        |SELECT 'full' AS src, COUNT(*) AS n_rows,
        |  CAST(SUM(k) AS BIGINT) AS key_sum, %PSUM% AS price_sum FROM f
        |UNION ALL
        |SELECT 'pruned', COUNT(*), CAST(SUM(k) AS BIGINT), %PSUM% FROM f
        |ORDER BY src""".stripMargin
        .replace("%PSUM%", Dsl.d2dSql(Dsl.dsumSql("p")))) { (s, d) =>
      val dir = Scratch.wiped("mtable_part")
      val o = Tables.orders(s, d)
        .select(col("o_orderkey").as("k"),
          (col("o_orderkey") % 8).as("bucket"),
          col("o_totalprice").cast(Dsl.DFac).cast(P).as("p"))
      ManifestTable.create(s, dir, o.repartition(8, col("bucket")),
        statsCols = Seq("k"), partitionCols = Seq("bucket"))
      val pred = col("bucket") === 3 && col("k") <= 300000L
      def fingerprint(df: org.apache.spark.sql.DataFrame, tag: String) =
        df.groupBy(lit(tag).as("src"))
          .agg(count(lit(1)).as("n_rows"),
            sum(col("k")).cast("long").as("key_sum"),
            Dsl.d2d(Dsl.dsum(col("p"))).as("price_sum"))
      fingerprint(ManifestTable.read(s, dir).where(pred), "full")
        .unionAll(fingerprint(ManifestTable.read(s, dir, pred), "pruned"))
        .orderBy("src")
    },

    // DELETE FROM … WHERE as a transactional lifecycle: partitioned
    // table, a partition-scoped + key-bounded predicate, one atomic
    // delete commit — the read-back fingerprint must equal the pure
    // relational complement. SQL null/row semantics and the
    // touched-files-only law (only the bucket-5 partition files
    // rewrite; ManifestTableSpec pins the carried set) ride the same
    // pruning metadata as read(filter). At 100 TB: a GDPR-style
    // partition delete rewrites one partition, never the table.
    Q("q_table_delete",
      """WITH b AS (
        |  SELECT o_orderkey AS k, o_orderkey % 8 AS bucket,
        |    CAST(o_totalprice AS DECIMAL(14,4)) AS p
        |  FROM orders),
        |kept AS (SELECT * FROM b WHERE NOT (bucket = 5 AND k <= 300000))
        |SELECT CAST(bucket AS BIGINT) AS bucket, COUNT(*) AS n_rows,
        |  CAST(SUM(k) AS BIGINT) AS key_sum, %PSUM% AS price_sum
        |FROM kept GROUP BY bucket ORDER BY bucket""".stripMargin
        .replace("%PSUM%", Dsl.d2dSql(Dsl.dsumSql("p")))) { (s, d) =>
      val dir = Scratch.wiped("mtable_del")
      val o = Tables.orders(s, d)
        .select(col("o_orderkey").as("k"),
          (col("o_orderkey") % 8).as("bucket"),
          col("o_totalprice").cast(Dsl.DFac).cast(P).as("p"))
      ManifestTable.create(s, dir, o.repartition(8, col("bucket")),
        statsCols = Seq("k"), partitionCols = Seq("bucket"))
      ManifestTable.delete(s, dir,
        col("bucket") === 5L && col("k") <= 300000L)
      ManifestTable.read(s, dir)
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n_rows"),
          sum(col("k")).cast("long").as("key_sum"),
          Dsl.d2d(Dsl.dsum(col("p"))).as("price_sum"))
        .orderBy("bucket")
    },

    // UPDATE … SET … WHERE, same lifecycle: a partition-scoped update
    // bumps matching prices by an exact decimal delta; non-matching
    // rows AND non-matching partitions must come back byte-identical,
    // and the staged files' re-harvested stats keep later merges/reads
    // prunable. The oracle is the relational CASE.
    Q("q_table_update",
      """WITH b AS (
        |  SELECT o_orderkey AS k, o_orderkey % 8 AS bucket,
        |    CAST(o_totalprice AS DECIMAL(14,4)) AS p
        |  FROM orders),
        |u AS (
        |  SELECT k, bucket,
        |    CASE WHEN bucket = 3 AND k <= 300000
        |      THEN CAST(CAST(p AS DECIMAL(12,4))
        |        + CAST(1.25 AS DECIMAL(12,4)) AS DECIMAL(14,4))
        |      ELSE p END AS p
        |  FROM b)
        |SELECT CAST(bucket AS BIGINT) AS bucket, COUNT(*) AS n_rows,
        |  CAST(SUM(k) AS BIGINT) AS key_sum, %PSUM% AS price_sum
        |FROM u GROUP BY bucket ORDER BY bucket""".stripMargin
        .replace("%PSUM%", Dsl.d2dSql(Dsl.dsumSql("p")))) { (s, d) =>
      val dir = Scratch.wiped("mtable_upd")
      val o = Tables.orders(s, d)
        .select(col("o_orderkey").as("k"),
          (col("o_orderkey") % 8).as("bucket"),
          col("o_totalprice").cast(Dsl.DFac).cast(P).as("p"))
      ManifestTable.create(s, dir, o.repartition(8, col("bucket")),
        statsCols = Seq("k"), partitionCols = Seq("bucket"))
      ManifestTable.update(s, dir,
        col("bucket") === 3L && col("k") <= 300000L,
        Map("p" -> (col("p").cast(Dsl.DFac)
          + lit(1.25).cast(Dsl.DFac)).cast(P)))
      ManifestTable.read(s, dir)
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n_rows"),
          sum(col("k")).cast("long").as("key_sum"),
          Dsl.d2d(Dsl.dsum(col("p"))).as("price_sum"))
        .orderBy("bucket")
    },

    // OPTIMIZE ... ZORDER as an oracle lifecycle: the table starts as 8
    // hash-scattered files (every file spans both dimensions — nothing
    // prunable), compact(zorderBy = (x, y)) rewrites them into ~4
    // Morton-ordered files, and the SAME two-dimensional filtered
    // aggregate is computed through the pruned read path and the full
    // scan. One oracle hash pins: the layout commit changed NO data,
    // and pruning on the post-compact manifest stats is exact. The
    // file-count/span laws live in ManifestTableSpec; at 100 TB this is
    // the maintenance pairing that turns a second-dimension filter from
    // a full scan into a quadrant read.
    Q("q_table_zorder",
      """WITH b AS (
        |  SELECT o_orderkey AS k, o_orderkey % 997 AS x,
        |    CAST((o_orderkey - o_orderkey % 997) / 997 AS BIGINT) AS y,
        |    CAST(o_totalprice AS DECIMAL(14,4)) AS p
        |  FROM orders),
        |f AS (SELECT * FROM b WHERE x < 300 AND y < 120)
        |SELECT 'full' AS src, COUNT(*) AS n_rows,
        |  CAST(SUM(k) AS BIGINT) AS key_sum, %PSUM% AS price_sum FROM f
        |UNION ALL
        |SELECT 'pruned', COUNT(*), CAST(SUM(k) AS BIGINT), %PSUM% FROM f
        |ORDER BY src""".stripMargin
        .replace("%PSUM%", Dsl.d2dSql(Dsl.dsumSql("p")))) { (s, d) =>
      val dir = Scratch.wiped("mtable_zorder")
      val b = Tables.orders(s, d)
        .select(col("o_orderkey").as("k"),
          (col("o_orderkey") % 997).as("x"),
          ((col("o_orderkey") - col("o_orderkey") % 997) / 997)
            .cast("long").as("y"),
          col("o_totalprice").cast(Dsl.DFac).cast(P).as("p"))
      ManifestTable.create(s, dir, b.repartition(8),
        statsCols = Seq("x", "y"))
      val v0 = ManifestTable.history(s, dir).last
      ManifestTable.compact(s, dir, smallBytes = 32L << 20,
        targetBytes = math.max(1L, v0.totalBytes / 4),
        zorderBy = Seq("x", "y"))
      val pred = col("x") < 300L && col("y") < 120L
      def fingerprint(df: org.apache.spark.sql.DataFrame, tag: String) =
        df.groupBy(lit(tag).as("src"))
          .agg(count(lit(1)).as("n_rows"),
            sum(col("k")).cast("long").as("key_sum"),
            Dsl.d2d(Dsl.dsum(col("p"))).as("price_sum"))
      fingerprint(ManifestTable.read(s, dir).where(pred), "full")
        .unionAll(fingerprint(ManifestTable.read(s, dir, pred), "pruned"))
        .orderBy("src")
    },

    // RESTORE … TO VERSION as an oracle lifecycle: create, append, then
    // an overwrite plays the "bad commit"; restore(1) re-publishes v1's
    // exact file set as the new head in one METADATA commit (no data
    // IO — the spec law pins that no data directory is written). The
    // fingerprint reads BOTH the restored head and the overwritten v2
    // (still time-travelable: rollback preserves history, the audit
    // trail keeps every step), so one hash pins that restore neither
    // loses the rollback target nor resurrects the wrong snapshot. At
    // 100 TB: undoing a bad commit costs one JSON rename, not a table
    // rewrite.
    Q("q_table_restore",
      """WITH b AS (
        |  SELECT o_orderkey AS k, CAST(o_totalprice AS DECIMAL(14,4)) AS p
        |  FROM orders)
        |SELECT 'head_restored_v1' AS src, COUNT(*) AS n_rows,
        |  CAST(SUM(k) AS BIGINT) AS key_sum, %PSUM% AS price_sum
        |FROM b WHERE k % 4 = 0 OR k % 4 = 1
        |UNION ALL
        |SELECT 'overwritten_v2', COUNT(*), CAST(SUM(k) AS BIGINT), %PSUM%
        |FROM b WHERE k % 4 = 2
        |ORDER BY src""".stripMargin
        .replace("%PSUM%", Dsl.d2dSql(Dsl.dsumSql("p")))) { (s, d) =>
      val dir = Scratch.wiped("mtable_restore")
      val b = Tables.orders(s, d)
        .select(col("o_orderkey").as("k"),
          col("o_totalprice").cast(Dsl.DFac).cast(P).as("p"))
      ManifestTable.create(s, dir, b.filter(col("k") % 4 === 0),
        statsCols = Seq("k"))
      ManifestTable.append(s, dir, b.filter(col("k") % 4 === 1))
      ManifestTable.overwrite(s, dir, b.filter(col("k") % 4 === 2))
      ManifestTable.restore(s, dir, 1L)
      def fingerprint(df: org.apache.spark.sql.DataFrame, tag: String) =
        df.groupBy(lit(tag).as("src"))
          .agg(count(lit(1)).as("n_rows"),
            sum(col("k")).cast("long").as("key_sum"),
            Dsl.d2d(Dsl.dsum(col("p"))).as("price_sum"))
      fingerprint(ManifestTable.read(s, dir), "head_restored_v1")
        .unionAll(fingerprint(
          ManifestTable.readVersion(s, dir, 2L), "overwritten_v2"))
        .orderBy("src")
    },

    // Metadata-only aggregation: COUNT/MIN/MAX answered from the
    // MANIFEST alone — the snapshot's exact row totals and per-file
    // footer [min,max] reduced driver-side, ZERO data IO (the emitted
    // frame is a one-row LocalRelation; the spec law answers the same
    // numbers after the data files are deleted outright). The oracle
    // recomputes from the raw rows, so the hash pins that footer
    // stats harvested across THREE separate commits stay exact — the
    // property every stats-based planner decision (pruning, MERGE
    // touch sets) rests on. At 100 TB this is `SELECT count(*)` in
    // milliseconds instead of a cluster scan.
    Q("q_table_meta_agg",
      """WITH b AS (
        |  SELECT o_orderkey AS k,
        |    CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS c
        |  FROM orders)
        |SELECT COUNT(*) AS n_rows,
        |  CAST(MIN(k) AS BIGINT) AS k_min, CAST(MAX(k) AS BIGINT) AS k_max,
        |  CAST(MIN(c) AS BIGINT) AS c_min, CAST(MAX(c) AS BIGINT) AS c_max
        |FROM b""".stripMargin) { (s, d) =>
      val dir = Scratch.wiped("mtable_meta")
      val b = Tables.orders(s, d)
        .select(col("o_orderkey").as("k"),
          (col("o_totalprice").cast(org.apache.spark.sql.types
            .DecimalType(12, 2)) * 100).cast("long").as("c"))
      ManifestTable.create(s, dir,
        b.filter(col("k") % 3 === 0).repartitionByRange(4, col("k")),
        statsCols = Seq("k", "c"))
      ManifestTable.append(s, dir, b.filter(col("k") % 3 === 1))
      ManifestTable.append(s, dir, b.filter(col("k") % 3 === 2))
      val snap = ManifestTable.snapshot(s, dir)
      def bounds(c: String) = {
        val bs = snap.files.map(_.longBounds(c))
        require(bs.forall(_.isDefined),
          s"meta_agg: a file lacks footer stats for $c — exactness lost")
        (bs.flatten.map(_._1).min, bs.flatten.map(_._2).max)
      }
      val (kMin, kMax) = bounds("k")
      val (cMin, cMax) = bounds("c")
      import s.implicits._
      Seq((snap.totalRows, kMin, kMax, cMin, cMax))
        .toDF("n_rows", "k_min", "k_max", "c_min", "c_max")
    },

    // Incrementally-maintained aggregate view: the MV (bucket → count +
    // two long sums) is computed from the fact table ONCE, then kept
    // fresh through three fact commits — a latest-wins MERGE, a whole-
    // group DELETE, and an APPEND that re-inserts the deleted group —
    // by two refreshes (the first catches up across TWO commits in
    // one changelog read; the group reaching n = 0 exercises the
    // view's MERGE-delete path, the re-insert the new-group path).
    // Every refresh is changelog-priced: the
    // delta comes from changesStructural (only files that changed
    // hands are read — the fact table never re-enters the plan), the
    // view is probed with a broadcast semi join, and the maintenance
    // merge commits exactly-once under the fact version (a replay is
    // a structural no-op). The oracle recomputes the final aggregate
    // from scratch, so one hash pins incremental ≡ recompute across
    // group creation, update, deletion, and re-insertion.
    Q("q_table_ivm",
      """WITH base AS (
        |  SELECT o_orderkey AS k, o_orderkey % 10 AS b,
        |    CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS c
        |  FROM orders),
        |upd AS (
        |  SELECT k, b, c + (k % 300) * 100 + 75 AS c, 1 AS seq, 'U' AS op
        |  FROM base WHERE k % 5 = 2),
        |del AS (
        |  SELECT k, 0 AS b, 0 AS c, 2 AS seq, 'D' AS op
        |  FROM base WHERE k % 11 = 3),
        |ins AS (
        |  SELECT -(k + 1) AS k, k % 10 AS b, (k % 700) * 100 + 250 AS c,
        |    1 AS seq, 'U' AS op
        |  FROM base WHERE k % 19 = 7),
        |chg AS (
        |  SELECT k, b, c, 0 AS seq, 'U' AS op FROM base
        |  UNION ALL SELECT * FROM upd
        |  UNION ALL SELECT * FROM del
        |  UNION ALL SELECT * FROM ins),
        |latest AS (
        |  SELECT k, b, c, op,
        |    ROW_NUMBER() OVER (PARTITION BY k ORDER BY seq DESC) AS rn
        |  FROM chg),
        |v1 AS (SELECT k, b, c FROM latest WHERE rn = 1 AND op <> 'D'),
        |v2 AS (SELECT k, b, c FROM v1 WHERE b <> 7),
        |app AS (
        |  SELECT k + 10000000 AS k, b,
        |    (k % 500) * 100 + 125 AS c
        |  FROM base WHERE k % 13 = 5),
        |v3 AS (SELECT * FROM v2 UNION ALL SELECT * FROM app)
        |SELECT CAST(b AS BIGINT) AS bucket, COUNT(*) AS n_rows,
        |  CAST(SUM(c) AS BIGINT) AS c_sum, CAST(SUM(k) AS BIGINT) AS k_sum
        |FROM v3 GROUP BY b ORDER BY bucket""".stripMargin) { (s, d) =>
      val factDir = Scratch.wiped("mtable_ivm_fact")
      val mvDir = Scratch.wiped("mtable_ivm_view")
      val base = Tables.orders(s, d)
        .select(col("o_orderkey").as("k"),
          (col("o_orderkey") % 10).as("b"),
          (col("o_totalprice").cast(org.apache.spark.sql.types
            .DecimalType(12, 2)) * 100).cast("long").as("c"))
      ManifestTable.create(s, factDir,
        base.repartitionByRange(4, col("k")), statsCols = Seq("k", "b"))
      graft.table.IncrementalView.init(s, factDir, mvDir, "b",
        sums = Seq("c", "k"), numFiles = 4)
      // fact v1: latest-wins CDC merge (update + delete + insert)
      val upd = base.filter(col("k") % 5 === 2)
        .select(col("k"), col("b"),
          (col("c") + (col("k") % 300) * 100 + 75).as("c"),
          lit(1).as("seq"), lit("U").as("_op"))
      val del = base.filter(col("k") % 11 === 3)
        .select(col("k"), lit(0L).as("b"), lit(0L).as("c"),
          lit(2).as("seq"), lit("D").as("_op"))
      val ins = base.filter(col("k") % 19 === 7)
        .select((-(col("k") + 1L)).as("k"), (col("k") % 10).as("b"),
          ((col("k") % 700) * 100 + 250).as("c"),
          lit(1).as("seq"), lit("U").as("_op"))
      ManifestTable.merge(s, factDir, upd.union(del).union(ins), "k",
        opCol = Some("_op"), seqCol = Some("seq"))
      // fact v2: drop a whole group — refresh #1 catches up across
      // BOTH commits in one changelog read, and group 7 reaching
      // n = 0 exercises the view's MERGE-delete path
      ManifestTable.delete(s, factDir, col("b") === 7L)
      graft.table.IncrementalView.refresh(s, factDir, mvDir, "b",
        sums = Seq("c", "k"))
      // fact v3: append re-inserts into the deleted group — refresh #2
      // re-creates it from empty state (the insert-new-group path)
      ManifestTable.append(s, factDir, base.filter(col("k") % 13 === 5)
        .select((col("k") + 10000000L).as("k"), col("b"),
          ((col("k") % 500) * 100 + 125).as("c")))
      graft.table.IncrementalView.refresh(s, factDir, mvDir, "b",
        sums = Seq("c", "k"))
      ManifestTable.read(s, mvDir)
        .select(col("b").cast("long").as("bucket"),
          col("n").as("n_rows"), col("sum_c").as("c_sum"),
          col("sum_k").as("k_sum"))
        .orderBy("bucket")
    },

    // CHECK-constraint capability: the write-time quality gate. A
    // table created WITH constraints rejects a violating append
    // atomically (caught here — the history must show no trace),
    // accepts a conforming one, evolves its constraint set through
    // ALTER (add validates existing data), and records everything in
    // the snapshot log. Emitted: the per-version operation trail with
    // constraint counts — rows-only gate; the hard laws (all five
    // write paths gated, NULL semantics, restore carrying) live in
    // ManifestTableSpec.
    // SQL DML capability: DELETE FROM / ALTER ADD COLUMN / TRUNCATE on
    // a catalog table — every statement lands as one atomic manifest
    // commit; emitted: the per-version operation trail (rows-only
    // gate; the hard laws live in GraftCatalogSpec).
    Q.cap("cap_table_sqldml") { (s, d) =>
      val wh = Scratch.wiped("mtable_sqldml")
      s.conf.set("spark.sql.catalog.gqdml", "graft.sources.GraftCatalog")
      s.conf.set("spark.sql.catalog.gqdml.warehouse", wh)
      s.sql("CREATE NAMESPACE IF NOT EXISTS gqdml.m")
      Tables.orders(s, d).select(col("o_orderkey").as("k"),
        (col("o_orderkey") % 7).as("g"))
        .createOrReplaceTempView("gqdml_orders")
      s.sql("""CREATE TABLE gqdml.m.t
        TBLPROPERTIES ('option.statsCols' = 'k')
        AS SELECT k, g FROM gqdml_orders""")
      s.sql("DELETE FROM gqdml.m.t WHERE g = 3 AND k > 100")
      s.sql("ALTER TABLE gqdml.m.t ADD COLUMN note STRING")
      s.sql("INSERT INTO gqdml.m.t VALUES (-1, 0, 'tagged')")
      // round-15: row-level statements land as engine commits too
      s.sql("UPDATE gqdml.m.t SET note = 'even' WHERE g = 0")
      s.sql("""MERGE INTO gqdml.m.t AS t
        USING (SELECT -1 AS k, 99 AS g, 'merged' AS note
               UNION ALL SELECT -2, 98, 'inserted') AS src
        ON t.k = src.k
        WHEN MATCHED THEN UPDATE SET g = src.g, note = src.note
        WHEN NOT MATCHED THEN INSERT (k, g, note)
          VALUES (src.k, src.g, src.note)""")
      s.sql("ALTER TABLE gqdml.m.t RENAME COLUMN note TO label")
      s.sql("CALL gqdml.system.checkpoint(table => 'm.t')")
      s.sql("TRUNCATE TABLE gqdml.m.t")
      import s.implicits._
      ManifestTable.history(s, s"$wh/m/t")
        .map(sn => (sn.version, sn.operation, sn.totalRows))
        .toDF("version", "operation", "rows")
    },

    Q.cap("cap_table_constraints") { (s, d) =>
      val dir = Scratch.wiped("mtable_check")
      val o = Tables.orders(s, d)
        .select(col("o_orderkey").as("k"),
          col("o_totalprice").cast(Dsl.DFac).cast(P).as("p"))
      ManifestTable.create(s, dir, o.filter(col("k") % 2 === 0),
        statsCols = Seq("k"),
        constraints = Map("k_nonneg" -> "k >= 0", "p_present" -> "p IS NOT NULL"))
      val rejected =
        try {
          ManifestTable.append(s, dir,
            o.filter(col("k") % 2 === 1).withColumn("k", -col("k")))
          0L
        } catch {
          case _: ManifestTable.ConstraintViolationException => 1L
        }
      ManifestTable.append(s, dir, o.filter(col("k") % 2 === 1))
      ManifestTable.alterConstraints(s, dir,
        add = Map("p_positive" -> "p > 0"))
      import s.implicits._
      ManifestTable.history(s, dir)
        .map(sn => (sn.version, sn.operation,
          sn.constraints.size.toLong, sn.totalRows, rejected))
        .toDF("version", "operation", "n_constraints", "n_rows",
          "n_rejected_commits")
        .orderBy("version")
    },

    // Commit-protocol capability: crash safety + maintenance in one
    // lifecycle. A torn writer (sealed data directory + dot-tmp
    // manifest, no rename — the exact state a crash mid-commit leaves)
    // must stay INVISIBLE; vacuum then drops the orphaned commit plus
    // out-of-retention versions while the live read stays intact. The
    // emitted frame is the snapshot log joined with live-file counts —
    // rows-only gate here, with the hard laws (conflict loser raises,
    // replay idempotence, pruning) asserted in ManifestTableSpec.
    Q.cap("cap_table_commit") { (s, d) =>
      val dir = Scratch.wiped("mtable_commit")
      val b = Tables.supplier(s, d)
        .select(col("s_suppkey").as("k"), col("s_name").as("name"))
      ManifestTable.create(s, dir, b.filter(col("k") % 2 === 0),
        statsCols = Seq("k"))
      ManifestTable.append(s, dir, b.filter(col("k") % 2 === 1))
      // torn commit: stage a data dir and a dot-tmp manifest by hand,
      // "crash" before the rename — readers must not see it
      val torn = new org.apache.hadoop.fs.Path(dir, "data/torn-commit")
      b.limit(5).write.mode("overwrite").parquet(torn.toString)
      val fs = torn.getFileSystem(s.sparkContext.hadoopConfiguration)
      val tmp = new org.apache.hadoop.fs.Path(
        dir, "_graft_log/.tmp-v00000000000000000002.json-crashed")
      val out = fs.create(tmp, true)
      out.write("{\"version\":2,\"torn\":".getBytes("UTF-8")); out.close()
      val liveRows = ManifestTable.read(s, dir).count()
      val liveVersion = ManifestTable.latestVersion(s, dir).getOrElse(-1L)
      ManifestTable.vacuum(s, dir, keepLast = 1)
      val afterRows = ManifestTable.read(s, dir).count()
      val hist = ManifestTable.history(s, dir)
      import s.implicits._
      hist.map(sn => (sn.version, sn.operation, sn.files.size.toLong,
          sn.totalRows, liveVersion, liveRows, afterRows))
        .toDF("version", "operation", "n_files", "n_rows",
          "live_version", "rows_before_vacuum", "rows_after_vacuum")
        .orderBy("version")
    },

    // Layout maintenance: many small append commits accumulate small
    // files (the streaming-ingest pathology); compact() bin-packs them
    // into one layout commit with contents untouched, and changes()
    // proves it relationally — the v(last)→v(compacted) changelog is
    // EMPTY. Emits the file-count trajectory + row totals per version
    // so the packed shape is pinned, with the hard laws (value
    // equality, stats survival, no-op threshold) in ManifestTableSpec.
    Q.cap("cap_table_compact") { (s, d) =>
      val dir = Scratch.wiped("mtable_compact")
      val o = Tables.orders(s, d)
        .select(col("o_orderkey").as("k"),
          col("o_totalprice").cast(Dsl.DFac).cast(P).as("p"))
      ManifestTable.create(s, dir, o.filter(col("k") % 4 === 0),
        statsCols = Seq("k"))
      (1L to 3L).foreach { r =>
        ManifestTable.append(s, dir, o.filter(col("k") % 4 === r))
      }
      val before = ManifestTable.history(s, dir).last
      val packed = ManifestTable.compact(s, dir)
      val diff = ManifestTable.changes(s, dir, before.version, packed.version)
        .count()
      import s.implicits._
      ManifestTable.history(s, dir)
        .map(sn => (sn.version, sn.operation, sn.files.size.toLong,
          sn.totalRows, diff))
        .toDF("version", "operation", "n_files", "n_rows",
          "compact_changelog_rows")
        .orderBy("version")
    },

    // Optimistic concurrency, driven for real: 4 threads MERGE into
    // disjoint key ranges of one table at once — every writer that
    // loses the version race rebases (its staged files are reused, one
    // manifest read + one rename, zero data IO) because the concurrent
    // commits provably commute (each kept the others' rewritten files
    // and their key ranges are bounds-disjoint). A 5th, stale merge
    // whose touched file WAS rewritten must throw
    // ConcurrentCommitException instead of silently losing an update.
    // Emits the serialized history plus the race verdicts; the conflict
    // taxonomy laws (write-write, read-write, metadata drift,
    // base-awareness) are pinned in ManifestTableSpec.
    Q.cap("cap_table_concurrent") { (s, d) =>
      val dir = Scratch.wiped("mtable_concurrent")
      val b = Tables.supplier(s, d)
        .select(col("s_suppkey").as("k"), col("s_name").as("v"))
      // four bounds-disjoint files: quartile slices of the dense key
      // space (fixture-size independent — s_suppkey is 1..N)
      val n = b.count()
      val q = math.max(1L, n / 4L)
      def lo(i: Int): Long = i * q + 1L
      ManifestTable.create(s, dir,
        b.filter(col("k") < lo(1)).coalesce(1), statsCols = Seq("k"))
      (1 to 3).foreach { i =>
        val hiBound = if (i == 3) n + 1L else lo(i + 1)
        ManifestTable.append(s, dir,
          b.filter(col("k") >= lo(i) && col("k") < hiBound).coalesce(1))
      }
      val h0 = ManifestTable.snapshot(s, dir)
      import s.implicits._
      val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
      val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
      (0 to 3).foreach { i =>
        pool.submit(new Runnable {
          def run(): Unit =
            try ManifestTable.merge(s, dir,
              Seq((lo(i), s"writer$i")).toDF("k", "v"), "k")
            catch { case t: Throwable => errs.add(t) }
        })
      }
      pool.shutdown()
      pool.awaitTermination(180, java.util.concurrent.TimeUnit.SECONDS)
      // stale writer: prepared against h0, but every file it would
      // rewrite has since been replaced — must fail loudly
      val conflictCaught =
        try {
          ManifestTable.mergeAt(s, dir, h0.version,
            Seq((2L, "stale")).toDF("k", "v"), "k")
          false
        } catch {
          case _: ManifestTable.ConcurrentCommitException => true
        }
      require(errs.isEmpty, s"racing merges failed: ${errs.toArray.toSeq}")
      require(conflictCaught, "stale merge was NOT rejected")
      val got = ManifestTable.read(s, dir)
      val winners = got.filter(col("v").startsWith("writer")).count()
      val dups = got.groupBy("k").count().filter(col("count") > 1).count()
      ManifestTable.history(s, dir)
        .map(sn => (sn.version, sn.operation, sn.parent))
        .toDF("version", "operation", "parent")
        .withColumn("racers_failed", lit(errs.size))
        .withColumn("winners_landed", lit(winners))
        .withColumn("duplicate_keys", lit(dups))
        .withColumn("stale_conflict_caught", lit(conflictCaught))
        .orderBy("version")
    },

    // Shallow clone + row provenance + AS OF timestamp, one lifecycle:
    // the clone is a single JSON write referencing the source's files
    // by URI (zero bytes copied — asserted), a merge into the clone
    // rewrites copy-on-write under the clone while the source stays
    // byte-identical, readWithMeta attributes every row to the commit
    // that wrote its current copy, and the pre-merge state resolves
    // back by WALL CLOCK via readAsOf. Emits per-commit row
    // attribution plus the isolation verdicts; the hard laws live in
    // ManifestTableSpec.
    Q.cap("cap_table_clone") { (s, d) =>
      val srcDir = Scratch.wiped("mtable_clone_src")
      val dstDir = Scratch.wiped("mtable_clone_dst") + "/t"
      val b = Tables.supplier(s, d)
        .select(col("s_suppkey").as("k"), col("s_name").as("v"))
      // two RANGE-disjoint files so the later single-key merge provably
      // rewrites one of them (bounds pruning) and provenance shows it
      val half = b.count() / 2
      ManifestTable.create(s, srcDir, b.filter(col("k") < half)
        .coalesce(1), statsCols = Seq("k"))
      ManifestTable.append(s, srcDir,
        b.filter(col("k") >= half).coalesce(1))
      val srcRows = ManifestTable.read(s, srcDir).count()
      ManifestTable.cloneTable(s, srcDir, dstDir)
      val fs = new org.apache.hadoop.fs.Path(dstDir)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      val zeroCopy =
        !fs.exists(new org.apache.hadoop.fs.Path(dstDir, "data"))
      val cloneTs = ManifestTable.snapshot(s, dstDir).ts
      import s.implicits._
      ManifestTable.merge(s, dstDir,
        Seq((1L, "CLONED")).toDF("k", "v"), "k")
      val srcIntact = ManifestTable.read(s, srcDir).count() == srcRows &&
        ManifestTable.read(s, srcDir).where(col("v") === "CLONED").count() == 0
      val preMergeRows = ManifestTable.readAsOf(s, dstDir, cloneTs).count()
      ManifestTable.readWithMeta(s, dstDir)
        .groupBy(col("_commit_version")).agg(count(lit(1)).as("n_rows"))
        .withColumn("src_rows", lit(srcRows))
        .withColumn("as_of_clone_rows", lit(preMergeRows))
        .withColumn("zero_copy", lit(zeroCopy))
        .withColumn("src_intact", lit(srcIntact))
        .orderBy("_commit_version")
    },

    // Partition-spec evolution without a rewrite: generation 1 is
    // unpartitioned (stats on the key only), one metadata commit flips
    // the spec, generation 2 appends day-partitioned files — and a
    // day-filtered read prunes gen-2 by partition value while
    // conservatively keeping gen-1, exact either way (per-FILE pruning
    // makes mixed layouts sound; ManifestTableSpec pins the kept-file
    // sets). Emits per-generation file counts, the pruned read's file
    // count, and the filtered row count under both read paths — the
    // 100 TB answer to "the query pattern changed" that costs one JSON
    // rename instead of a table rewrite.
    Q.cap("cap_table_layout") { (s, d) =>
      val dir = Scratch.wiped("mtable_layout")
      val o = Tables.orders(s, d)
        .select(col("o_orderkey").as("k"),
          substring(col("o_orderpriority"), 1, 1).as("pri"),
          col("o_custkey").as("c"))
      ManifestTable.create(s, dir, o.filter(col("k") % 2 === 0)
        .coalesce(2), statsCols = Seq("k"))
      ManifestTable.alterLayout(s, dir, partitionCols = Some(Seq("pri")))
      ManifestTable.append(s, dir, o.filter(col("k") % 2 === 1))
      val head = ManifestTable.snapshot(s, dir)
      val (g2, g1) = head.files.partition(_.partitions.contains("pri"))
      val f = col("pri") === "1"
      val kept = ManifestTable.pruneFiles(head, f)
      val pruned = ManifestTable.read(s, dir, f).count()
      val full = ManifestTable.read(s, dir).where(f).count()
      require(pruned == full, "pruned read must equal full scan + filter")
      import s.implicits._
      Seq((g1.size.toLong, g2.size.toLong, kept.size.toLong,
          head.files.size.toLong, pruned, full))
        .toDF("gen1_files", "gen2_files", "kept_files", "total_files",
          "rows_pruned_read", "rows_full_read")
    },

    // Parquet-native BLOOM file skipping (round-16 verdict #3) on an
    // UNSORTED layout: orders hashed into files so every file's
    // o_orderkey [min,max] spans the domain — interval pruning keeps
    // everything, the opt-in bloom keeps ~1 file for a needle point
    // probe, and the pruned read equals full-scan + filter exactly
    // (BloomSkipSpec pins the DV/update legs and mixed generations).
    Q.cap("cap_table_bloom") { (s, d) =>
      val dir = Scratch.wiped("mtable_bloom")
      val o = Tables.orders(s, d)
        .select(col("o_orderkey").as("k"), col("o_totalprice").as("p"))
      ManifestTable.create(s, dir,
        o.repartitionByRange(16, col("k") % 16),
        statsCols = Seq("k"), bloomCols = Seq("k"))
      val head = ManifestTable.snapshot(s, dir)
      val needle = o.select(max("k")).head().getLong(0) - 7
      val f = col("k") === needle
      val interval = ManifestTable.pruneFiles(head, f)
      val bloomed = ManifestTable.pruneFilesBloom(s, dir, head, f)
      val pruned = ManifestTable.read(s, dir, f).count()
      val full = ManifestTable.read(s, dir).where(f).count()
      require(pruned == full, "bloom pruning must never change results")
      require(bloomed.size < interval.size,
        "the bloom must skip interval-admitted files on this layout")
      import s.implicits._
      Seq((head.files.size.toLong, interval.size.toLong,
          bloomed.size.toLong, pruned, full))
        .toDF("total_files", "interval_kept", "bloom_kept",
          "rows_pruned_read", "rows_full_read")
    }
  )
}
