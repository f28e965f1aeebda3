package graft.sources

import graft.SparkSuite
import graft.table.{ManifestTable, MergeInto}
import org.apache.spark.sql.functions._

/** Laws of SQL row-level DML on graft tables (round-15 verdict #2):
  * `UPDATE` and `MERGE INTO` statements resolve through
  * [[GraftSqlDmlRule]] into the SAME engine operations the Scala
  * facade exposes — equivalence is asserted content-for-content
  * against facade twins on identical tables, and the commit trail
  * shows the same operations. */
class GraftSqlDmlSpec extends SparkSuite {

  private lazy val wh: String = {
    val p = java.nio.file.Files.createTempDirectory("gdml_wh")
    p.toFile.deleteOnExit()
    spark.conf.set("spark.sql.catalog.dml", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.dml.warehouse", p.toString)
    p.toString
  }

  private def freshDir(tag: String): String = {
    val p = java.nio.file.Files.createTempDirectory(s"gdml_$tag")
    p.toFile.deleteOnExit()
    p.toString
  }

  private def rows(dir: String): Set[(Long, String, Long)] =
    ManifestTable.read(spark, dir).select("k", "v", "n").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet

  private def seed(dir: String): Unit = {
    import spark.implicits._
    ManifestTable.create(spark, dir,
      (1L to 20L).map(i => (i, s"v$i", i * 10)).toDF("k", "v", "n")
        .repartitionByRange(4, col("k")),
      statsCols = Seq("k"))
  }

  test("SQL UPDATE ≡ facade update: same rows, same commit operation, " +
    "touched-files pruning intact") {
    wh
    spark.sql("CREATE NAMESPACE IF NOT EXISTS dml.u")
    val sqlDir = s"$wh/u/t"
    val facDir = freshDir("upd_facade")
    import spark.implicits._
    val base = (1L to 20L).map(i => (i, s"v$i", i * 10)).toDF("k", "v", "n")
      .repartitionByRange(4, col("k"))
    spark.sql("CREATE TABLE dml.u.t (k BIGINT, v STRING, n BIGINT) " +
      "TBLPROPERTIES ('option.statsCols' = 'k')")
    base.createOrReplaceTempView("dml_u_base")
    spark.sql("INSERT INTO dml.u.t SELECT * FROM dml_u_base")
    ManifestTable.create(spark, facDir, base, statsCols = Seq("k"))

    spark.sql("UPDATE dml.u.t SET v = concat(v, '!'), n = n + 1 " +
      "WHERE k BETWEEN 3 AND 5")
    ManifestTable.update(spark, facDir, col("k").between(3, 5),
      Map("v" -> concat(col("v"), lit("!")), "n" -> (col("n") + 1)))
    assert(rows(sqlDir) == rows(facDir),
      "SQL UPDATE and facade update must produce identical tables")
    assert(ManifestTable.snapshot(spark, sqlDir).operation == "update",
      "the SQL statement must ride the engine's update commit")

    // unconditional UPDATE (no WHERE) touches every row
    spark.sql("UPDATE dml.u.t SET n = 0")
    assert(ManifestTable.read(spark, sqlDir)
      .agg(sum("n")).head().getLong(0) == 0L)
  }

  test("SQL MERGE INTO ≡ facade MergeInto across the full WHEN matrix " +
    "(conditional update, delete, insert, not-matched-by-source)") {
    wh
    spark.sql("CREATE NAMESPACE IF NOT EXISTS dml.m")
    val sqlDir = s"$wh/m/t"
    val facDir = freshDir("mrg_facade")
    import spark.implicits._
    val base = (1L to 20L).map(i => (i, s"v$i", i * 10)).toDF("k", "v", "n")
      .repartitionByRange(4, col("k"))
    spark.sql("CREATE TABLE dml.m.t (k BIGINT, v STRING, n BIGINT) " +
      "TBLPROPERTIES ('option.statsCols' = 'k')")
    base.createOrReplaceTempView("dml_m_base")
    spark.sql("INSERT INTO dml.m.t SELECT * FROM dml_m_base")
    ManifestTable.create(spark, facDir, base, statsCols = Seq("k"))

    // source: updates 2 & 3 (3 flagged for delete), inserts 21 & 22;
    // note the source key is named DIFFERENTLY (sk) to exercise the
    // ON-clause rename path
    val src = Seq(
      (2L, "two", 200L, "U"),
      (3L, "", 0L, "D"),
      (21L, "new21", 210L, "U"),
      (22L, "new22", 220L, "U"))
      .toDF("sk", "sv", "sn", "op")
    src.createOrReplaceTempView("dml_src")

    spark.sql(
      """MERGE INTO dml.m.t AS t USING dml_src AS s ON t.k = s.sk
        |WHEN MATCHED AND s.op = 'D' THEN DELETE
        |WHEN MATCHED THEN UPDATE SET v = s.sv, n = s.sn + t.n
        |WHEN NOT MATCHED AND s.op <> 'D' THEN
        |  INSERT (k, v, n) VALUES (s.sk, s.sv, s.sn)
        |WHEN NOT MATCHED BY SOURCE AND t.k > 18 THEN UPDATE SET v = 'old'
        |""".stripMargin)

    MergeInto(spark, facDir, src.withColumnRenamed("sk", "k"),
      keys = Seq("k"),
      matched = Seq(
        MergeInto.WhenMatched(MergeInto.Delete,
          Some(MergeInto.src("op") === "D")),
        MergeInto.WhenMatched(MergeInto.Update(Map(
          "v" -> MergeInto.src("sv"),
          "n" -> (MergeInto.src("sn") + col("n")))))),
      notMatched = Seq(
        MergeInto.WhenNotMatched(MergeInto.Insert(Map(
          "k" -> col("k"), "v" -> col("sv"), "n" -> col("sn"))),
          Some(col("op") =!= "D"))),
      notMatchedBySource = Seq(
        MergeInto.WhenNotMatchedBySource(
          MergeInto.Update(Map("v" -> lit("old"))),
          Some(col("k") > 18))))

    assert(rows(sqlDir) == rows(facDir),
      "SQL MERGE INTO and facade MergeInto must produce identical tables")
    assert(ManifestTable.snapshot(spark, sqlDir).operation == "merge-into")
    // spot semantics: delete applied, conditional update composed
    // target+source, inserts landed, by-source clause scoped
    val got = rows(sqlDir)
    assert(!got.exists(_._1 == 3L), "k=3 deleted")
    assert(got.contains((2L, "two", 220L)), "update sees s.sn + t.n")
    assert(got.contains((21L, "new21", 210L)) &&
      got.contains((22L, "new22", 220L)), "inserts landed")
    assert(got.contains((19L, "old", 190L)) &&
      got.contains((20L, "old", 200L)), "by-source clause applied")
    assert(got.contains((18L, "v18", 180L)), "by-source condition scoped")
  }

  test("MERGE INTO rejects non-equi ON clauses loudly; UPDATE of an " +
    "unknown column fails before any commit") {
    wh
    spark.sql("CREATE NAMESPACE IF NOT EXISTS dml.e")
    spark.sql("CREATE TABLE dml.e.t (k BIGINT, v STRING)")
    spark.sql("INSERT INTO dml.e.t VALUES (1, 'a')")
    import spark.implicits._
    Seq((1L, "x")).toDF("k", "v").createOrReplaceTempView("dml_esrc")
    val e = intercept[Exception] {
      spark.sql("MERGE INTO dml.e.t AS t USING dml_esrc AS s " +
        "ON t.k < s.k WHEN MATCHED THEN DELETE")
    }
    assert(e.getMessage.contains("conjunction") ||
      String.valueOf(e.getCause).contains("conjunction"),
      s"expected a loud equi-key error, got: ${e.getMessage}")
    val v = ManifestTable.latestVersion(spark, s"$wh/e/t")
    assert(v.contains(1L), "no commit may land for a rejected statement")
  }

  test("MERGE INTO … WITH SCHEMA EVOLUTION: an additive source column " +
    "lands through the catalog's metadata commit, pre-merge rows answer " +
    "NULL under it, and the facade twin is content-identical") {
    wh
    spark.sql("CREATE NAMESPACE IF NOT EXISTS dml.se")
    val sqlDir = s"$wh/se/t"
    val facDir = freshDir("se_facade")
    import spark.implicits._
    val base = (1L to 10L).map(i => (i, s"v$i")).toDF("k", "v")
    base.createOrReplaceTempView("dml_se_base")
    spark.sql("CREATE TABLE dml.se.t (k BIGINT, v STRING) " +
      "TBLPROPERTIES ('option.statsCols' = 'k')")
    spark.sql("INSERT INTO dml.se.t SELECT * FROM dml_se_base")
    ManifestTable.create(spark, facDir, base, statsCols = Seq("k"))
    // the source carries a NEW column `extra`
    val src = Seq((2L, "two", 20L), (11L, "new11", 110L))
      .toDF("k", "v", "extra")
    src.createOrReplaceTempView("dml_se_src")
    spark.sql("""MERGE WITH SCHEMA EVOLUTION INTO dml.se.t AS t
      USING dml_se_src AS s
      ON t.k = s.k
      WHEN MATCHED THEN UPDATE SET *
      WHEN NOT MATCHED THEN INSERT *""")
    MergeInto(spark, facDir, src, keys = Seq("k"),
      matched = Seq(MergeInto.WhenMatched(MergeInto.UpdateAll)),
      notMatched = Seq(MergeInto.WhenNotMatched(MergeInto.InsertAll)),
      schemaEvolution = true)
    def all(dir: String): Set[(Long, String, Option[Long])] =
      ManifestTable.read(spark, dir).select("k", "v", "extra").collect()
        .map(r => (r.getLong(0), r.getString(1),
          if (r.isNullAt(2)) None else Some(r.getLong(2)))).toSet
    val got = all(sqlDir)
    assert(got == all(facDir),
      "SQL WITH SCHEMA EVOLUTION and facade schemaEvolution diverged")
    assert(got.contains((2L, "two", Some(20L))), "matched row updated")
    assert(got.contains((11L, "new11", Some(110L))), "insert landed")
    assert(got.contains((1L, "v1", None)),
      "pre-merge rows must answer NULL under the evolved column")
    assert(ManifestTable.snapshot(spark, sqlDir).schema.fieldNames
      .contains("extra"))
    // facade: the widened schema rides ONE commit (create + merge = v1)
    assert(ManifestTable.latestVersion(spark, facDir).contains(1L),
      "facade evolution must ride the merge commit itself")
  }

  test("schema evolution guards stay loud: a tombstoned (dropped) name " +
    "cannot return through MERGE evolution, and a type conflict on an " +
    "existing column refuses before anything commits") {
    val dir = freshDir("se_guards")
    import spark.implicits._
    ManifestTable.create(spark, dir,
      (1L to 5L).map(i => (i, s"v$i", i * 1.0)).toDF("k", "v", "gone"))
    ManifestTable.dropColumn(spark, dir, "gone")
    val v0 = ManifestTable.latestVersion(spark, dir).get
    val resurrect = Seq((1L, "x", 9.9)).toDF("k", "v", "gone")
    val e1 = intercept[IllegalArgumentException] {
      MergeInto(spark, dir, resurrect, keys = Seq("k"),
        matched = Seq(MergeInto.WhenMatched(MergeInto.UpdateAll)),
        schemaEvolution = true)
    }
    assert(e1.getMessage.contains("dropped or renamed away"))
    val conflict = Seq((1L, 42L)).toDF("k", "v") // v: long vs table string
    val e2 = intercept[IllegalArgumentException] {
      MergeInto(spark, dir, conflict, keys = Seq("k"),
        matched = Seq(MergeInto.WhenMatched(MergeInto.Update(
          Map("v" -> lit("z"))))),
        schemaEvolution = true)
    }
    assert(e2.getMessage.contains("additive only"))
    assert(ManifestTable.latestVersion(spark, dir).contains(v0),
      "rejected evolution must not commit")
  }

  test("crossed ON clause (t.a = s.b AND t.b = s.a) renames " +
    "simultaneously — no clobbered key column") {
    wh
    spark.sql("CREATE NAMESPACE IF NOT EXISTS dml.x")
    spark.sql("CREATE TABLE dml.x.t (a BIGINT, b BIGINT, v STRING)")
    spark.sql("INSERT INTO dml.x.t VALUES (1, 2, 'old'), (5, 6, 'keep')")
    import spark.implicits._
    // source columns CROSSED: s.b matches t.a, s.a matches t.b
    Seq((2L, 1L, "hit")).toDF("a", "b", "nv")
      .createOrReplaceTempView("dml_x_src")
    spark.sql("""MERGE INTO dml.x.t AS t USING dml_x_src AS s
      ON t.a = s.b AND t.b = s.a
      WHEN MATCHED THEN UPDATE SET v = s.nv""")
    val got = spark.sql("SELECT * FROM dml.x.t ORDER BY a").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
    assert(got == Seq((1L, 2L, "hit"), (5L, 6L, "keep")),
      s"crossed ON clause mis-joined: $got")
  }
}
