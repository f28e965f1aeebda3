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

  test("3-column z-order: a filter on the THIRD dimension skips most " +
    "rows where the linear layout scans everything; n-way interleave " +
    "matches a reference") {
    val li = Tables.lineitem(spark, sf("0.01"))
      .select("l_orderkey", "l_partkey", "l_suppkey")
    val zDir = java.nio.file.Files.createTempDirectory("graft_z3").toString
    val linDir = java.nio.file.Files.createTempDirectory("graft_lin3").toString
    ZOrderLayout.withZN(li, Seq("l_orderkey", "l_partkey", "l_suppkey"))
      .repartitionByRange(64, col("__z")).sortWithinPartitions("__z")
      .drop("__z").write.mode("overwrite").parquet(zDir)
    li.repartitionByRange(64, col("l_orderkey"))
      .sortWithinPartitions("l_orderkey")
      .write.mode("overwrite").parquet(linDir)
    val pred = col("l_suppkey") < 8
    val matches = li.filter(pred).count()
    val zScan = scannedRows(spark.read.parquet(zDir).filter(pred))
    val linScan = scannedRows(spark.read.parquet(linDir).filter(pred))
    info(s"third-dim filter: $matches match; scanned z3=$zScan " +
      s"linear=$linScan")
    assert(spark.read.parquet(zDir).filter(pred).count() == matches)
    assert(zScan >= matches && linScan >= matches)
    // three dimensions share the bit budget, so the win is smaller
    // than the 2-col 4x law but must still be real
    assert(zScan * 2 <= linScan,
      s"3-col z-order scanned $zScan vs linear $linScan - no win")
    // reference interleave law for n=3 (20 bits each): col j's bit i
    // lands at 3i + j — checked on a value grid via the identity
    // normalization (domain spans exactly [0, 2^20-1])
    import spark.implicits._
    def ref3(a: Long, b: Long, c: Long): Long =
      (0 until 20).map(i => (((a >> i) & 1L) << (3 * i)) |
        (((b >> i) & 1L) << (3 * i + 1)) |
        (((c >> i) & 1L) << (3 * i + 2))).reduce(_ | _)
    val top = (1L << 20) - 1 // 1048575 = 3·5²·11·31·41: use divisor stride
    val step = top / 33 // 31785, divides exactly
    val grid = for (a <- 0L to top by step; b <- 0L to top by step;
      c <- Seq(0L, top / 3 * 3)) yield (a, b, c)
    // c must also end exactly at a grid point covering the max
    val grid2 = grid.filter(_._3 <= top) :+ ((top, top, top))
    val df = grid2.toDF("a", "b", "c")
    val got = ZOrderLayout.withZN(df, Seq("a", "b", "c"))
      .select("a", "b", "c", "__z").collect()
      .map(r => ((r.getLong(0), r.getLong(1), r.getLong(2)), r.getLong(3)))
      .toMap
    // identity normalization needs the domain max present per column —
    // guaranteed by the appended (top, top, top) corner — and every
    // sampled value to be an exact multiple of domain/(2^20-1) = 1
    grid2.foreach { case (a, b, c) =>
      assert(got((a, b, c)) == ref3(a, b, c),
        s"morton3($a,$b,$c) = ${got((a, b, c))} != ${ref3(a, b, c)}")
    }
  }

  test("Morton code matches a reference bit-interleave on the full rank grid") {
    import spark.implicits._
    // withZ on a frame whose columns span exactly [0, 65535] makes the
    // normalized rank the identity, so __z must equal the reference
    // interleave of the raw values — pins the 32 unrolled expressions
    // against an independent Scala implementation over a 129x129 grid
    // (all bit patterns of both bytes at the corners + interior)
    def ref(a: Long, b: Long): Long =
      (0 until 16).map(i => (((a >> i) & 1L) << (2 * i)) |
        (((b >> i) & 1L) << (2 * i + 1))).reduce(_ | _)
    // stride must DIVIDE 65535 (= 3·5·17·257) so the grid max IS the
    // domain max — otherwise the min/max normalization rescales every
    // rank and the identity assumption breaks (found by this test's
    // first run with a non-divisor stride)
    val step = 255
    val grid = for (a <- 0L to 65535L by step; b <- 0L to 65535L by step)
      yield (a, b)
    val df = grid.toDF("a", "b")
    val got = graft.operators.ZOrderLayout.withZ(df, "a", "b")
      .select("a", "b", "__z").collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    grid.foreach { case (a, b) =>
      assert(got((a, b)) == ref(a, b),
        s"morton($a, $b) = ${got((a, b))} != reference ${ref(a, b)}")
    }
  }

  test("parquet bloom filters prune point lookups where dictionaries cannot") {
    // the complement to z-order: min/max stats are useless for equality
    // probes on a high-cardinality UNSORTED column (every row group spans
    // the domain). At fixture scale parquet's DICTIONARY filtering covers
    // that gap for free (measured: the no-bloom control scanned 3 963 of
    // 60 000 rows with dictionaries on) — but at 100 TB a billions-range
    // key overflows the dictionary page and falls back to plain encoding,
    // where only a written BLOOM filter can reject row groups. This test
    // models that regime by writing both layouts dictionary-free and
    // measures the bloom filter alone, from scan metrics.
    val li = Tables.lineitem(spark, sf("0.01"))
      .select("l_orderkey", "l_partkey", "l_extendedprice")
    val total = li.count()
    val probeKey = li.select("l_orderkey").head().getLong(0)
    val plainDir = java.nio.file.Files.createTempDirectory("graft_nb").toString
    val bloomDir = java.nio.file.Files.createTempDirectory("graft_bf").toString
    // scatter BY the probe key: one order's rows land in one file while
    // every file still spans the full key domain (scattering by an
    // unrelated column spreads the 7 matching rows over 7 files and the
    // bloom filter correctly keeps all 7 — measured)
    val scattered = li.repartition(16, col("l_orderkey"))
    scattered.write.mode("overwrite")
      .option("parquet.enable.dictionary", "false")
      .parquet(plainDir)
    scattered.write.mode("overwrite")
      .option("parquet.enable.dictionary", "false")
      .option("parquet.bloom.filter.enabled#l_orderkey", "true")
      .option("parquet.bloom.filter.expected.ndv#l_orderkey", "20000")
      .parquet(bloomDir)
    val pred = col("l_orderkey") === probeKey
    val matches = li.filter(pred).count()
    val plainScan = scannedRows(spark.read.parquet(plainDir).filter(pred))
    val bloomScan = scannedRows(spark.read.parquet(bloomDir).filter(pred))
    info(s"point lookup key=$probeKey ($matches rows of $total): " +
      s"scanned plain=$plainScan bloom=$bloomScan")
    assert(spark.read.parquet(bloomDir).filter(pred).count() == matches)
    assert(plainScan >= total / 2,
      s"control broken: nothing should prune a dictionary-free scattered layout ($plainScan)")
    assert(bloomScan * 4 <= plainScan,
      s"bloom pruned nothing: $bloomScan vs $plainScan")
  }
}
