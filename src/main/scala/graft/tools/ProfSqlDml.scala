package graft.tools

import graft.core.{Dsl, Scratch, Tables}
import graft.table.ManifestTable
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only phase timer for q_table_sqldml: the SAME lifecycle with a
  * stopwatch around every statement, to attribute the query's wall time
  * to phases (CTAS vs UPDATE vs MERGE vs reads vs fingerprint). */
object ProfSqlDml {
  private val P = org.apache.spark.sql.types.DataTypes.createDecimalType(14, 4)

  def main(args: Array[String]): Unit = {
    var b = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
    // A/B seam: GRAFT_PROF_CONF="k=v;k=v" overlays session conf
    sys.env.get("GRAFT_PROF_CONF").foreach(_.split(';').filter(_.nonEmpty)
      .foreach { kv =>
        val Array(k, v) = kv.split("=", 2); b = b.config(k, v) })
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"
    val runs = if (args.nonEmpty) args(0).toInt else 3
    (1 to runs).foreach { r =>
      val marks = scala.collection.mutable.ArrayBuffer.empty[(String, Double)]
      var last = System.nanoTime()
      def mark(what: String): Unit = {
        val now = System.nanoTime()
        marks += what -> (now - last) / 1e9
        last = now
      }
      import graft.table.MergeInto
      val s = spark
      val wh = Scratch.wiped("mtable_sqldml")
      val facDir = Scratch.wiped("mtable_sqldml_facade")
      mark("scratch wipe")
      s.conf.set("spark.sql.catalog.gqdml", "graft.sources.GraftCatalog")
      s.conf.set("spark.sql.catalog.gqdml.warehouse", wh)
      val base = Tables.orders(s, d)
        .groupBy(col("o_orderkey").as("k"))
        .agg(sum(col("o_totalprice").cast(Dsl.DFac)).cast(P).as("p"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      base.createOrReplaceTempView("gqdml_base")
      val src = base.where(col("k") % 13 === 5 || col("k") % 11 === 2)
        .select(col("k"),
          when(col("k") % 13 === 5, lit("D")).otherwise(lit("U")).as("op"),
          (col("k") % 97).cast(Dsl.DFac).as("dp"))
        .unionByName(base.where(col("k") % 17 === 1)
          .select((-col("k")).as("k"), lit("U").as("op"),
            (col("k") % 53).cast(Dsl.DFac).as("dp")))
      src.createOrReplaceTempView("gqdml_src")
      mark("frame setup")
      s.sql("CREATE NAMESPACE IF NOT EXISTS gqdml.m")
      mark("create namespace")
      s.sql("""CREATE TABLE gqdml.m.t
        TBLPROPERTIES ('option.statsCols' = 'k')
        AS SELECT k, p FROM gqdml_base""")
      mark("SQL CTAS")
      s.sql("""UPDATE gqdml.m.t
        SET p = CAST(p + CAST(2.5 AS DECIMAL(12,4)) AS DECIMAL(14,4))
        WHERE k % 7 = 3""")
      mark("SQL UPDATE")
      s.sql("""MERGE INTO gqdml.m.t AS t USING gqdml_src AS s
        ON t.k = s.k
        WHEN MATCHED AND s.op = 'D' THEN DELETE
        WHEN MATCHED THEN UPDATE SET p = CAST(t.p + s.dp AS DECIMAL(14,4))
        WHEN NOT MATCHED THEN INSERT (k, p) VALUES (s.k,
          CAST(s.dp AS DECIMAL(14,4)))
        WHEN NOT MATCHED BY SOURCE AND t.k % 19 = 7 THEN
          UPDATE SET p = CAST(0 AS DECIMAL(14,4))""")
      mark("SQL MERGE")
      ManifestTable.create(s, facDir, base, statsCols = Seq("k"))
      mark("facade create")
      ManifestTable.update(s, facDir, col("k") % 7 === 3,
        Map("p" -> (col("p") + lit(2.5).cast(Dsl.DFac))))
      mark("facade update")
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
      mark("facade MERGE")
      def fp(df: org.apache.spark.sql.DataFrame, tag: String) = df
        .groupBy((col("k") % 10).cast("long").as("bucket"))
        .agg(count(lit(1)).as("n_rows"),
          sum(col("k")).cast("long").as("key_sum"),
          Dsl.d2d(Dsl.dsum(col("p"))).as("price_sum"))
        .select(lit(tag).as("api"), col("bucket"), col("n_rows"),
          col("key_sum"), col("price_sum"))
      base.unpersist()
      val n = fp(s.sql("SELECT * FROM gqdml.m.t"), "sql")
        .unionByName(fp(ManifestTable.read(s, facDir), "facade"))
        .orderBy("api", "bucket").count()
      mark("fingerprint count")
      val total = marks.map(_._2).sum
      println(f"[prof] run$r total=$total%6.2f s rows=$n")
      marks.foreach { case (w, sec) => println(f"    $sec%7.3f s  $w") }
    }
    spark.stop()
  }
}
