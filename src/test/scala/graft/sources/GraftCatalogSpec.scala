package graft.sources

import graft.SparkSuite
import graft.table.ManifestTable
import org.apache.spark.sql.functions._

/** Laws of the graft TABLE CATALOG: the plain-SQL lifecycle (CREATE
  * NAMESPACE/TABLE/CTAS, INSERT, SELECT, VERSION/TIMESTAMP AS OF,
  * ALTER DROP COLUMN, RENAME, DROP) against a warehouse directory,
  * interoperating with the Scala facade on the same dirs. */
class GraftCatalogSpec extends SparkSuite {

  private lazy val wh: String = {
    val p = java.nio.file.Files.createTempDirectory("gcat_wh")
    p.toFile.deleteOnExit()
    spark.conf.set("spark.sql.catalog.lake", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.lake.warehouse", p.toString)
    p.toString
  }

  test("CREATE NAMESPACE / CREATE TABLE / INSERT / SELECT / SHOW; the " +
    "table is a plain manifest table the facade reads too") {
    wh
    spark.sql("CREATE NAMESPACE lake.bronze")
    spark.sql("CREATE TABLE lake.bronze.kv (k BIGINT, v STRING) " +
      "TBLPROPERTIES ('option.statsCols' = 'k')")
    spark.sql("INSERT INTO lake.bronze.kv VALUES (1, 'a'), (2, 'b')")
    spark.sql("INSERT INTO lake.bronze.kv VALUES (3, 'c')")
    assert(spark.sql("SELECT count(*) AS n FROM lake.bronze.kv")
      .head().getLong(0) == 3L)
    assert(spark.sql("SHOW TABLES IN lake.bronze").collect()
      .map(_.getString(1)).contains("kv"))
    // interop: the SQL-created table is a plain manifest table
    val dir = s"$wh/bronze/kv"
    val snap = ManifestTable.snapshot(spark, dir)
    assert(snap.statsCols == Seq("k"), "TBLPROPERTIES option applied")
    assert(snap.version == 2L, "CREATE + two INSERT commits")
    assert(ManifestTable.read(spark, dir).count() == 3L)
    // facade write is visible to SQL immediately (no metastore cache)
    ManifestTable.append(spark, dir,
      spark.sql("SELECT CAST(9 AS BIGINT) AS k, 'z' AS v"))
    assert(spark.sql("SELECT count(*) FROM lake.bronze.kv")
      .head().getLong(0) == 4L)
  }

  test("SQL time travel: VERSION AS OF and TIMESTAMP AS OF resolve " +
    "through the manifest log") {
    wh
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lake.tt")
    spark.sql("CREATE TABLE lake.tt.t (k BIGINT) " +
      "TBLPROPERTIES ('option.statsCols' = 'k')")
    spark.sql("INSERT INTO lake.tt.t VALUES (1), (2)") // v1
    val ts1 = ManifestTable.snapshot(spark, s"$wh/tt/t").ts
    spark.sql("INSERT INTO lake.tt.t VALUES (3)") // v2
    assert(spark.sql("SELECT count(*) FROM lake.tt.t").head().getLong(0) == 3L)
    assert(spark.sql("SELECT count(*) FROM lake.tt.t VERSION AS OF 1")
      .head().getLong(0) == 2L)
    assert(spark.sql("SELECT count(*) FROM lake.tt.t VERSION AS OF 0")
      .head().getLong(0) == 0L)
    val tsLit = java.time.Instant.ofEpochMilli(ts1).toString
    assert(spark.sql(
      s"SELECT count(*) FROM lake.tt.t TIMESTAMP AS OF '$tsLit'")
      .head().getLong(0) == 2L)
  }

  test("CTAS, partitioned create, ALTER DROP COLUMN, RENAME, DROP") {
    wh
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lake.silver")
    spark.sql("CREATE TABLE lake.silver.src AS " +
      "SELECT id AS k, id % 3 AS g, CAST(id * 10 AS STRING) AS v " +
      "FROM range(30)")
    assert(spark.sql("SELECT count(*) FROM lake.silver.src")
      .head().getLong(0) == 30L)
    // partitioned create: partition values recorded per file
    spark.sql("CREATE TABLE lake.silver.byg (k BIGINT, g BIGINT) " +
      "PARTITIONED BY (g)")
    spark.sql("INSERT INTO lake.silver.byg SELECT id, id % 2 FROM range(10)")
    val snap = ManifestTable.snapshot(spark, s"$wh/silver/byg")
    assert(snap.partitionCols == Seq("g"))
    assert(snap.files.forall(_.partitions.contains("g")))
    // partition-pruned SQL read
    assert(spark.sql("SELECT count(*) FROM lake.silver.byg WHERE g = 0")
      .head().getLong(0) == 5L)
    // ALTER DROP COLUMN rides the metadata commit
    spark.sql("ALTER TABLE lake.silver.src DROP COLUMN v")
    assert(spark.sql("SELECT * FROM lake.silver.src").columns.toSeq ==
      Seq("k", "g"))
    // RENAME moves the directory
    spark.sql("ALTER TABLE lake.silver.src RENAME TO lake.silver.src2")
    assert(spark.sql("SELECT count(*) FROM lake.silver.src2")
      .head().getLong(0) == 30L)
    intercept[Exception](spark.sql("SELECT * FROM lake.silver.src").collect())
    // DROP deletes the table
    spark.sql("DROP TABLE lake.silver.src2")
    assert(!spark.sql("SHOW TABLES IN lake.silver").collect()
      .map(_.getString(1)).contains("src2"))
  }

  test("SQL DML on catalog tables: DELETE FROM (touched-files rewrite " +
    "commit), TRUNCATE (atomic, history preserved), ALTER ADD COLUMN " +
    "(metadata commit, old rows read NULL)") {
    wh
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lake.dml")
    spark.sql("CREATE TABLE lake.dml.t TBLPROPERTIES " +
      "('option.statsCols' = 'k') AS SELECT id AS k, id % 7 AS g " +
      "FROM range(1000)")
    val dir = s"$wh/dml/t"
    val before = ManifestTable.snapshot(spark, dir)
    // DELETE with a compound predicate (strict conversion required)
    spark.sql("DELETE FROM lake.dml.t WHERE k < 100 AND g = 3")
    val expect = (0L until 1000L).count(i => !(i < 100 && i % 7 == 3))
    assert(spark.sql("SELECT count(*) FROM lake.dml.t").head().getLong(0)
      == expect)
    assert(ManifestTable.snapshot(spark, dir).operation == "delete")
    // ALTER ADD COLUMN: metadata commit; existing rows read NULL
    spark.sql("ALTER TABLE lake.dml.t ADD COLUMN note STRING")
    val snap2 = ManifestTable.snapshot(spark, dir)
    assert(snap2.operation.startsWith("add@") &&
      snap2.files == ManifestTable.snapshot(spark, dir,
        Some(snap2.version - 1)).files, "ADD COLUMN must move no data")
    assert(spark.sql(
      "SELECT count(*) FROM lake.dml.t WHERE note IS NULL")
      .head().getLong(0) == expect)
    spark.sql("INSERT INTO lake.dml.t VALUES (5000, 1, 'tagged')")
    assert(spark.sql(
      "SELECT note FROM lake.dml.t WHERE k = 5000").head().getString(0)
      == "tagged")
    // TRUNCATE: empty head, time travel intact
    spark.sql("TRUNCATE TABLE lake.dml.t")
    assert(spark.sql("SELECT count(*) FROM lake.dml.t").head().getLong(0)
      == 0L)
    assert(spark.sql(
      s"SELECT count(*) FROM lake.dml.t VERSION AS OF ${before.version}")
      .head().getLong(0) == 1000L, "history must survive TRUNCATE")
  }
}
