package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev check: graft.GraftExtensions registers graft_dot AND the as-of
  * join planner strategy via the spark.sql.extensions config path (run in
  * a fresh JVM — the zero-code-change deployment story). */
object ExtensionsDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val r = spark.sql(
      "SELECT graft_dot(array(cast(1.0 as float), cast(2.0 as float)), " +
        "array(cast(3.0 as float), cast(4.0 as float))) AS d").collect()(0).getDouble(0)
    println(s"EXTENSIONS_DEMO graft_dot=(1,2)x(3,4)=$r expected=11.0 ok=${r == 11.0}")
    val norm = spark.sql("SELECT graft_normalize('  Héllo\\tWORLD  ') AS n")
      .collect()(0).getString(0)
    println(s"EXTENSIONS_DEMO graft_normalize='$norm' ok=${norm == "hello world"}")
    // as-of node planned by the INJECTED strategy (no addStrategy call):
    // build the logical node directly and check the physical operator.
    import org.apache.spark.sql.functions._
    val ev = graft.core.Tables.events(spark, "/root/testdata/sf0.001")
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts").as("pts"))
    val v = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts").as("vts"))
    val asof = graft.operators.AsOfJoin
      .leftAsOfMerge(p, v, Seq("user_id"), "pts", "vts")
    val planned = asof.queryExecution.executedPlan.toString.contains("AsOfJoin")
    val rows = asof.count()
    println(s"EXTENSIONS_DEMO asof planned=$planned rows=$rows ok=${planned && rows > 0}")
    // injected check rule: strict mode rejects unpartitioned ordered windows
    val globalWindow = "SELECT event_id, row_number() OVER (ORDER BY ts) AS rn " +
      "FROM ev_view ORDER BY rn LIMIT 1"
    ev.createOrReplaceTempView("ev_view")
    val okOff = scala.util.Try(spark.sql(globalWindow).count()).isSuccess
    spark.conf.set("spark.graft.failUnpartitionedWindow", "true")
    val failedStrict = scala.util.Try(spark.sql(globalWindow).count()).isFailure
    val okPartitioned = scala.util.Try(spark.sql(
      "SELECT event_id, row_number() OVER (PARTITION BY user_id ORDER BY ts) AS rn " +
        "FROM ev_view ORDER BY rn LIMIT 1").count()).isSuccess
    spark.conf.unset("spark.graft.failUnpartitionedWindow")
    println(s"EXTENSIONS_DEMO lint off=$okOff strictFails=$failedStrict " +
      s"partitionedOk=$okPartitioned ok=${okOff && failedStrict && okPartitioned}")
    // injected OPTIMIZER rule: with a stated bin width, the bare BETWEEN
    // theta join plans as a bin-keyed hash join instead of a nested loop
    import spark.implicits._
    val pts = Seq((1L, 5.0), (2L, 42.0)).toDF("p_id", "x")
    val ivs = Seq((10L, 0.0, 10.0), (11L, 40.0, 50.0)).toDF("iv_id", "lo", "hi")
    val theta = () => pts.join(ivs,
      col("x") >= col("lo") && col("x") <= col("hi"))
    val before = theta().queryExecution.optimizedPlan.toString
    spark.conf.set("spark.graft.rangeJoin.binWidth", "10")
    val after = theta().queryExecution.optimizedPlan.toString
    val pairs = theta().select("p_id", "iv_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    spark.conf.unset("spark.graft.rangeJoin.binWidth")
    val rewrote = !before.contains("__bin") && after.contains("__bin")
    println(s"EXTENSIONS_DEMO rangeRewrite fired=$rewrote " +
      s"pairs=$pairs ok=${rewrote && pairs == Set((1L, 10L), (2L, 11L))}")
    // injected bloom primitives: build a filter over 0..99 (as a scalar
    // subquery — might_contain requires a constant-foldable filter),
    // probe 7 (in) and 12345 (out — fp-improbable at 8 bits/key)
    val bloomOk = spark.sql(
      """SELECT
        |  graft_bloom_contains(
        |    (SELECT graft_bloom_agg(CAST(id AS LONG), CAST(100 AS LONG),
        |                            CAST(800 AS LONG)) FROM range(100)),
        |    CAST(7 AS LONG)) AS hit,
        |  graft_bloom_contains(
        |    (SELECT graft_bloom_agg(CAST(id AS LONG), CAST(100 AS LONG),
        |                            CAST(800 AS LONG)) FROM range(100)),
        |    CAST(12345 AS LONG)) AS miss""".stripMargin).collect()(0)
    println(s"EXTENSIONS_DEMO bloom hit=${bloomOk.getBoolean(0)} " +
      s"miss=${bloomOk.getBoolean(1)} ok=${bloomOk.getBoolean(0) && !bloomOk.getBoolean(1)}")
    spark.stop()
  }
}
