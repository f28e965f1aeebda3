package graft.tools

import graft.core.{Dsl, Scratch, Tables}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only micro-bench of the commit-path building blocks: parquet
  * write fan-out (32 vs 4 vs 1 part files), the footer sweep, and the
  * read-back cost per file count — isolates what a narrower commit
  * layout would actually save. */
object ProfStage {
  private val P = org.apache.spark.sql.types.DataTypes.createDecimalType(14, 4)

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"
    val base = Tables.orders(spark, d)
      .groupBy(col("o_orderkey").as("k"))
      .agg(sum(col("o_totalprice").cast(Dsl.DFac)).cast(P).as("p"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    println(s"[prof] base rows=${base.count()}")
    def t[A](what: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] ${(System.nanoTime() - t0) / 1e9}%7.3f s  $what"); r
    }
    (1 to 3).foreach { round =>
      println(s"--- round $round")
      val w32 = Scratch.wiped("prof_w32"); val w4 = Scratch.wiped("prof_w4")
      val w1 = Scratch.wiped("prof_w1")
      t("write 32 parts")(base.write.mode("overwrite").parquet(w32))
      t("write coalesce(4)")(base.coalesce(4).write.mode("overwrite").parquet(w4))
      t("write coalesce(1)")(base.coalesce(1).write.mode("overwrite").parquet(w1))
      t("read-back count 32")(spark.read.parquet(w32).count())
      t("read-back count 4")(spark.read.parquet(w4).count())
      t("read-back count 1")(spark.read.parquet(w1).count())
      t("groupBy fingerprint over 32") {
        spark.read.parquet(w32).groupBy((col("k") % 10).as("b"))
          .agg(count(lit(1)), sum(col("k"))).count()
      }
      t("groupBy fingerprint over 1") {
        spark.read.parquet(w1).groupBy((col("k") % 10).as("b"))
          .agg(count(lit(1)), sum(col("k"))).count()
      }
      // footer sweep cost per file count
      val c = spark.sparkContext.hadoopConfiguration
      def sweep(dir: String, what: String): Unit = t(s"footer sweep $what") {
        val p = new org.apache.hadoop.fs.Path(dir)
        val fs = p.getFileSystem(c)
        val it = fs.listFiles(p, true)
        var n = 0
        while (it.hasNext) {
          val st = it.next()
          if (st.getPath.getName.endsWith(".parquet")) {
            val r = org.apache.parquet.hadoop.ParquetFileReader.open(
              org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(st.getPath, c))
            try { r.getFooter.getBlocks.size(); n += 1 } finally r.close()
          }
        }
        print(s"(n=$n) ")
      }
      sweep(w32, "32"); sweep(w1, "1")
    }
    spark.stop()
  }
}
