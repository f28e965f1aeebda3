package graft

import graft.core.Tables
import graft.operators.ZOrderLayout
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

/** Z-order layout: a filter on the SECOND dimension must skip most row
  * groups via plain parquet min/max stats — measured from the scan
  * node's own metrics, not inferred.
  */
class ZOrderSpec extends SparkSuite {

  /** Rows the parquet scan actually emitted (post row-group pruning).
    * Executes the dataset's OWN cached QueryExecution (collect, not
    * count — count() builds a separate QueryExecution and the metrics
    * would land on that plan instead of the one inspected here). */
  private def scannedRows(df: org.apache.spark.sql.DataFrame): Long = {
    df.collect()
    def leaves(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => leaves(a.executedPlan)
      case s => s.collectLeaves().flatMap {
        case a: AdaptiveSparkPlanExec => leaves(a.executedPlan)
        case l => Seq(l)
      }
    }
    leaves(df.queryExecution.executedPlan)
      .collect { case s: FileSourceScanExec => s.metrics("numOutputRows").value }
      .sum
  }

  test("second-dimension filter scans >=4x fewer rows than the linear layout") {
    val li = Tables.lineitem(spark, sf("0.01"))
      .select("l_orderkey", "l_partkey", "l_extendedprice")
    val total = li.count()
    val zDir = java.nio.file.Files.createTempDirectory("graft_z").toString
    val linDir = java.nio.file.Files.createTempDirectory("graft_lin").toString
    ZOrderLayout.writeZOrdered(li, zDir, "l_orderkey", "l_partkey", files = 64)
    // control: the classic single-key sort layout (tight stats on
    // l_orderkey only)
    li.repartitionByRange(64, col("l_orderkey"))
      .sortWithinPartitions("l_orderkey")
      .write.mode("overwrite").parquet(linDir)
    val pred = col("l_partkey") < 100
    val zScan = scannedRows(spark.read.parquet(zDir).filter(pred))
    val linScan = scannedRows(spark.read.parquet(linDir).filter(pred))
    val matches = li.filter(pred).count()
    info(s"total $total rows, $matches match; scanned z=$zScan linear=$linScan " +
      f"(${linScan.toDouble / zScan}%.1fx fewer with z-order)")
    // same answer from both layouts
    assert(spark.read.parquet(zDir).filter(pred).count() == matches)
    assert(spark.read.parquet(linDir).filter(pred).count() == matches)
    // metric sanity: a scan can never emit fewer rows than the matches,
    // and zero means the metric plumbing broke (the vacuous-pass trap)
    assert(zScan >= matches && linScan >= matches,
      s"scan metrics broken: z=$zScan linear=$linScan matches=$matches")
    // the linear layout cannot skip on the second dimension; z-order must
    assert(zScan * 4 <= linScan,
      s"z-order scanned $zScan vs linear $linScan - no pruning win")
    // and the leading dimension still prunes on the z layout: the curve
    // trades a little leading-key locality for both-key locality
    val zLead = scannedRows(spark.read.parquet(zDir)
      .filter(col("l_orderkey") < 1000))
    assert(zLead < total / 2,
      s"z layout lost leading-key pruning entirely: $zLead of $total")
  }
}
