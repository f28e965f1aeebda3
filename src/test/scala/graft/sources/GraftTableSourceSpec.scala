package graft.sources

import scala.jdk.CollectionConverters._

import graft.SparkSuite
import graft.table.ManifestTable
import org.apache.spark.sql.connector.catalog.SupportsRead
import org.apache.spark.sql.connector.read.SupportsPushDownFilters
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{sources => f}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Laws of the `format("graft")` DataSourceV2 connector: SQL-surface
  * reads ≡ facade reads, pushdown prunes the SAME file set as
  * `read(dir, filter)`, writes ride the commit protocol, time travel
  * via reader options, and the session-catalog `CREATE TABLE … USING
  * graft` + `SELECT`/`INSERT INTO` round trip. */
class GraftTableSourceSpec extends SparkSuite {

  private def freshDir(tag: String): String = {
    val p = java.nio.file.Files.createTempDirectory(s"gsrc_$tag")
    p.toFile.deleteOnExit()
    p.toString
  }

  private def seed(dir: String, n: Long = 100L, files: Int = 4): Unit = {
    import spark.implicits._
    val df = (1L to n).map(i => (i, s"v$i")).toDF("k", "v")
    ManifestTable.create(spark, dir,
      df.repartitionByRange(files, col("k")), statsCols = Seq("k"))
  }

  test("format(graft) read ≡ facade read; filter pushdown prunes the " +
    "SAME file set as read(dir, filter); results agree post-filter") {
    val dir = freshDir("read")
    seed(dir)
    val viaSql = spark.read.format("graft").load(dir)
    val viaFacade = ManifestTable.read(spark, dir)
    assert(viaSql.collect().map(r => (r.getLong(0), r.getString(1))).toSet ==
      viaFacade.collect().map(r => (r.getLong(0), r.getString(1))).toSet)
    // pruning parity, directly against the ScanBuilder contract
    val opts = new CaseInsensitiveStringMap(Map("path" -> dir).asJava)
    val provider = new GraftTableProvider
    val table = provider.getTable(provider.inferSchema(opts),
      Array.empty, opts.asCaseSensitiveMap())
    val sb = table.asInstanceOf[SupportsRead].newScanBuilder(opts)
    val residual = sb.asInstanceOf[SupportsPushDownFilters]
      .pushFilters(Array[f.Filter](f.GreaterThan("k", 80L)))
    assert(residual.length == 1, "all filters stay residual (re-applied)")
    val scan = sb.build().asInstanceOf[GraftScan]
    val snap = ManifestTable.snapshot(spark, dir)
    val expected = ManifestTable.pruneFiles(snap, col("k") > 80L).map(_.path)
    assert(scan.prunedFilePaths == expected)
    assert(expected.size < snap.files.size,
      "the range filter must actually prune on a range-partitioned table")
    // end-to-end: the pushed read returns exactly the filtered rows
    assert(spark.read.format("graft").load(dir).where(col("k") > 80L)
      .count() == 20L)
    // column pruning survives the V1 seam
    assert(spark.read.format("graft").load(dir).select("v").columns
      .toSeq == Seq("v"))
  }

  test("write modes ride the commit protocol: default save creates " +
    "(with layout options), append appends, overwrite overwrites — " +
    "all atomic commits visible to the facade") {
    import spark.implicits._
    val dir = freshDir("write")
    (1L to 10L).map(i => (i, s"a$i")).toDF("k", "v")
      .write.format("graft").option("statsCols", "k").save(dir)
    val s0 = ManifestTable.snapshot(spark, dir)
    assert(s0.version == 0L && s0.statsCols == Seq("k"))
    (11L to 15L).map(i => (i, s"b$i")).toDF("k", "v")
      .write.format("graft").mode("append").save(dir)
    assert(ManifestTable.read(spark, dir).count() == 15L)
    assert(ManifestTable.snapshot(spark, dir).operation == "append")
    (1L to 3L).map(i => (i, s"c$i")).toDF("k", "v")
      .write.format("graft").mode("overwrite").save(dir)
    assert(ManifestTable.read(spark, dir).count() == 3L)
    assert(ManifestTable.snapshot(spark, dir).operation == "overwrite")
  }

  test("time travel via reader options; DV subtraction rides the SQL " +
    "read; session-catalog CREATE/SELECT/INSERT round-trips") {
    val dir = freshDir("tt")
    seed(dir, n = 50L, files = 2)
    ManifestTable.deleteVector(spark, dir, col("k") <= 10L)
    // head read subtracts the vector; versionAsOf 0 shows everything
    assert(spark.read.format("graft").load(dir).count() == 40L)
    assert(spark.read.format("graft").option("versionAsOf", "0")
      .load(dir).count() == 50L)
    val ts0 = ManifestTable.snapshot(spark, dir, Some(0L)).ts
    assert(spark.read.format("graft").option("timestampAsOf", ts0.toString)
      .load(dir).count() == 50L)
    // SQL catalog surface
    spark.sql("DROP TABLE IF EXISTS graft_tt")
    spark.sql(s"CREATE TABLE graft_tt USING graft OPTIONS (path '$dir')")
    try {
      assert(spark.sql("SELECT count(*) AS n FROM graft_tt").head().getLong(0)
        == 40L)
      assert(spark.sql(
        "SELECT sum(k) AS s FROM graft_tt WHERE k > 40").head().getLong(0)
        == (41L to 50L).sum)
      spark.sql("INSERT INTO graft_tt VALUES (999, 'ins')")
      assert(spark.sql("SELECT count(*) AS n FROM graft_tt").head()
        .getLong(0) == 41L)
      // the INSERT is a real commit the facade sees
      assert(ManifestTable.snapshot(spark, dir).operation == "append")
      assert(ManifestTable.read(spark, dir)
        .where(col("k") === 999L).count() == 1L)
    } finally spark.sql("DROP TABLE IF EXISTS graft_tt")
  }
}
