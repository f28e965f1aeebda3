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

  test("DSv2 plan-time statistics: the scan reports the snapshot's " +
    "EXACT rows/bytes (post-prune, and the HISTORICAL size under time " +
    "travel), so a small catalog table joined through SQL plans a " +
    "BroadcastHashJoin WITHOUT a hint, AQE off") {
    val dir = freshDir("stats")
    seed(dir, n = 200L)
    val snap = ManifestTable.snapshot(spark, dir)
    def scanOf(extra: Map[String, String],
        filters: Array[f.Filter] = Array.empty): GraftScan = {
      val opts = new CaseInsensitiveStringMap(
        (Map("path" -> dir) ++ extra).asJava)
      val provider = new GraftTableProvider
      val table = provider.getTable(provider.inferSchema(opts),
        Array.empty, opts.asCaseSensitiveMap())
      val sb = table.asInstanceOf[SupportsRead].newScanBuilder(opts)
      if (filters.nonEmpty)
        sb.asInstanceOf[SupportsPushDownFilters].pushFilters(filters)
      sb.build().asInstanceOf[GraftScan]
    }
    // head scan: exact totals from the manifest (zero IO)
    val st = scanOf(Map.empty).estimateStatistics()
    assert(st.numRows().getAsLong == snap.totalRows)
    assert(st.sizeInBytes().getAsLong == snap.totalBytes,
      "default fileCompressionFactor 1.0 => manifest bytes verbatim")
    // a pruned scan reports the SURVIVORS' stats, not the table's
    val pruned = scanOf(Map.empty, Array(f.GreaterThan("k", 150L)))
    assert(pruned.estimateStatistics().numRows().getAsLong
      < snap.totalRows)
    // time travel reports the HISTORICAL snapshot's size
    ManifestTable.append(spark, dir, spark.range(1000)
      .selectExpr("id + 1000 AS k", "CAST(id AS STRING) AS v"))
    val head = ManifestTable.snapshot(spark, dir)
    val v0 = scanOf(Map("versionAsOf" -> "0")).estimateStatistics()
    assert(v0.numRows().getAsLong == snap.totalRows &&
      v0.numRows().getAsLong < head.totalRows)
    // the plan-quality law (round-16 verdict #1): a dim-sized catalog
    // table joined through the SQL front door broadcasts at PLAN time —
    // no hint, AQE off (so no runtime rescue can fake the pass); the
    // big probe side is over the auto-broadcast threshold by estimate
    val wh = freshDir("statswh")
    spark.conf.set("spark.sql.catalog.gstat", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gstat.warehouse", wh)
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      spark.sql("CREATE NAMESPACE IF NOT EXISTS gstat.m")
      spark.sql("""CREATE TABLE gstat.m.dim AS
        SELECT id AS k, CAST(id % 7 AS STRING) AS v FROM range(50)""")
      spark.range(10L * 1000 * 1000).selectExpr("id % 1000 AS k")
        .createOrReplaceTempView("gstat_big")
      val plan = spark.sql(
        "SELECT b.k, d.v FROM gstat_big b JOIN gstat.m.dim d ON b.k = d.k")
        .queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastHashJoin"),
        s"dim-sized graft table must broadcast at plan time, got:\n$plan")
      assert(!plan.contains("SortMergeJoin"),
        "the default-size estimate would have forced a sort-merge join")
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", aqe)
      spark.sql("DROP TABLE IF EXISTS gstat.m.dim")
      spark.conf.unset("spark.sql.catalog.gstat")
      spark.conf.unset("spark.sql.catalog.gstat.warehouse")
    }
  }
}
