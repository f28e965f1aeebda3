package graft.tools

import graft.core.Scratch
import graft.table.ManifestTable
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only A/B of the distributed metadata routes (guide §5): the
  * bloom probe and the commit footer sweep, driver pool vs one Spark
  * job, over a MANY-file table. Remote-storage footer latency is
  * modeled with the existing fault-injection seam
  * (`bloomProbeDelayMs` — applied per file on BOTH routes), because
  * local footer opens are ~1 ms and the routing exists for the
  * object-store case where each open is an RPC. */
object ProfMetaRoute {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    def t[A](what: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] ${(System.nanoTime() - t0) / 1e9}%7.3f s  $what"); r
    }
    val nFiles = 320
    // striped ids: every file's [min,max] overlaps every other's, so
    // interval pruning admits all files and the bloom probe sees the
    // full file count — the worst (and motivating) case
    def frame = (0L until (nFiles * 100L)).toDF("id")
      .withColumn("v", concat(lit("v"), col("id")))
      .repartitionByRange(nFiles, col("id") % nFiles)

    // ---- commit footer sweep: driver pool vs distributed ----
    (1 to 2).foreach { round =>
      println(s"--- sweep round $round (local footers, n=$nFiles)")
      spark.conf.set("spark.graft.commit.sweepDistributeThreshold", "0")
      t(s"create $nFiles files, sweep on DRIVER pool")(
        ManifestTable.create(spark, Scratch.wiped("prof_sweep_drv"), frame,
          statsCols = Seq("id"), bloomCols = Seq("id")))
      spark.conf.set("spark.graft.commit.sweepDistributeThreshold", "64")
      t(s"create $nFiles files, sweep DISTRIBUTED")(
        ManifestTable.create(spark, Scratch.wiped("prof_sweep_job"), frame,
          statsCols = Seq("id"), bloomCols = Seq("id")))
      spark.conf.unset("spark.graft.commit.sweepDistributeThreshold")
    }

    // ---- bloom probe: driver pool vs distributed, 20 ms/footer ----
    val dir = Scratch.wiped("prof_bloom_route")
    val snap = ManifestTable.create(spark, dir, frame,
      statsCols = Seq("id"), bloomCols = Seq("id"))
    println(s"--- bloom probe over ${snap.files.size} admitted files, " +
      "injected 20 ms/footer (object-store RPC model)")
    val probe = col("id") === 12345L
    ManifestTable.bloomProbeDelayMs = 20
    try (1 to 2).foreach { round =>
      ManifestTable.clearBloomCache()
      ManifestTable.bloomDistributeThreshold = 100000
      val a = t(s"round $round: probe on DRIVER pool (8 threads)")(
        ManifestTable.pruneFilesBloom(spark, dir, snap, probe))
      ManifestTable.clearBloomCache()
      ManifestTable.bloomDistributeThreshold = 256
      val b = t(s"round $round: probe DISTRIBUTED (local[32])")(
        ManifestTable.pruneFilesBloom(spark, dir, snap, probe))
      require(a.map(_.path) == b.map(_.path), "routes must agree")
      println(s"[prof] survivors ${b.size} of ${snap.files.size}")
    } finally {
      ManifestTable.bloomProbeDelayMs = 0
      ManifestTable.bloomDistributeThreshold = 256
    }
    spark.stop()
  }
}
