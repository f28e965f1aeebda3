package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core.{Scratch, Tables}
import graft.table.{IncrementalView, ManifestTable}

/** Dev tool: phase-level wall breakdown of the q_table_ivm lifecycle
  * (round-14 verdict #4 — find where the 4.4 s guard median goes). */
object IvmProfile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def timed[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"IVM_PHASE $tag ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    // warmup parquet/codegen
    Tables.orders(spark, d).count()
    (1 to 3).foreach { round =>
      println(s"--- round $round ---")
      val t0 = System.nanoTime()
      val factDir = Scratch.wiped("ivmprof_fact")
      val mvDir = Scratch.wiped("ivmprof_view")
      val base = Tables.orders(spark, d)
        .select(col("o_orderkey").as("k"), (col("o_orderkey") % 10).as("b"),
          (col("o_totalprice").cast(org.apache.spark.sql.types
            .DecimalType(12, 2)) * 100).cast("long").as("c"))
      timed("create")(ManifestTable.create(spark, factDir,
        base.repartitionByRange(4, col("k")), statsCols = Seq("k", "b")))
      timed("init")(IncrementalView.init(spark, factDir, mvDir, "b",
        sums = Seq("c", "k"), numFiles = 4))
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
      timed("merge")(ManifestTable.merge(spark, factDir,
        upd.union(del).union(ins), "k",
        opCol = Some("_op"), seqCol = Some("seq")))
      timed("delete")(ManifestTable.delete(spark, factDir, col("b") === 7L))
      timed("refresh1")(IncrementalView.refresh(spark, factDir, mvDir, "b",
        sums = Seq("c", "k")))
      timed("append")(ManifestTable.append(spark, factDir,
        base.filter(col("k") % 13 === 5)
          .select((col("k") + 10000000L).as("k"), col("b"),
            ((col("k") % 500) * 100 + 125).as("c"))))
      timed("refresh2")(IncrementalView.refresh(spark, factDir, mvDir, "b",
        sums = Seq("c", "k")))
      timed("readback")(ManifestTable.read(spark, mvDir).count())
      println(f"IVM_TOTAL ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
