package graft.queries

import graft.core.{Q, Tables}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}

/** SQL-text entry point (round-10 verdict item 3).
  *
  * SECDB-style users write SQL, not DataFrames. This capability proves the
  * engine's SQL mode end-to-end on Spark's own parser: the fixture tables
  * are registered as temp views and a representative subset of the oracle
  * SQL strings — the exact ANSI text the driver runs in DuckDB — is executed
  * by `spark.sql`, then compared frame-for-frame against the DataFrame
  * implementation of the same contract query.
  *
  * Because each oracle already hash-matches its DataFrame twin through the
  * driver's DuckDB gate, a Spark-side parse + equality pass closes the
  * triangle: the SAME SQL text yields the SAME frame on both engines, so a
  * user can hand this engine their SQL unchanged.
  *
  * Scale: the parity set's member queries are the contract queries
  * themselves (bounded ordered outputs); the collect here touches only
  * final result frames, never data-sized intermediates.
  */
object SqlParityQueries {

  /** Representative oracle subset: every category with an ANSI-expressible
    * oracle (scan, filter, join family, agg family, rollup/cube, having,
    * set ops, window, sort/topk, TPC-H shapes). Members must parse in BOTH
    * dialects — SqlParitySpec asserts the whole list round-trips. */
  val paritySet: Seq[String] = Seq(
    "q_scan_project", "q_scan_filter_pushdown", "q_filter_complex",
    "q_case_conditional",
    "q_join_inner", "q_join_broadcast", "q_join_left_outer",
    "q_join_semi", "q_join_anti", "q_join_multiway",
    "q_agg_pricing_summary", "q_agg_count_distinct", "q_agg_rollup",
    "q_agg_cube", "q_having",
    "q_union_all", "q_intersect", "q_except",
    "q_topk_global", "q_sort_multi",
    "q_window_rank",
    "q_tpch_q3", "q_tpch_q6",
    // round-10 third session: IS NOT DISTINCT FROM parses in both
    // dialects (the <=> corner), as does the degree-profile double agg
    "q_join_null_safe", "q_graph_degree",
    // round-11: members whose Spark-side SQL is a SparkDialect TWIN (the
    // oracle is DuckDB-only) — the driver-gated cap now exercises the
    // translated dialect path too: array ops, 1-based indexing, the
    // as-of rewrite, a sorted-struct FP fold, and a recursive CTE
    "q_array_funcs", "q_join_asof", "q_time_ewma", "q_hierarchy_flatten",
    "q_text_quality")

  /** Register every fixture parquet as a temp view so oracle SQL table
    * names resolve. Uses the same readers as the DataFrame path (events
    * gets its nanos→micros rebuild, so `CAST(ts AS TIMESTAMP)` twins see
    * identical values). */
  def registerViews(s: SparkSession, dir: String): Unit = {
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "documents", "embeddings")
      .foreach(t => Tables.table(s, dir, t).createOrReplaceTempView(t))
    Tables.events(s, dir).createOrReplaceTempView("events")
    // The engine's SQL dialect includes its registered codegen functions
    // (graft_normalize et al.) — exactly what a deployment gets from
    // spark.sql.extensions=graft.GraftExtensions.
    graft.functions.GraftFunctions.register(s)
  }

  /** Value equality matching the driver's hash compare: exact for
    * everything, NaN==NaN for doubles, elementwise for arrays. */
  private def valueEq(a: Any, b: Any): Boolean = (a, b) match {
    case (null, null) => true
    case (null, _) | (_, null) => false
    case (x: Double, y: Double) => (x.isNaN && y.isNaN) || x == y
    case (x: Float, y: Float) => (x.isNaN && y.isNaN) || x == y
    case (x: Seq[_], y: Seq[_]) =>
      x.length == y.length && x.zip(y).forall { case (u, v) => valueEq(u, v) }
    case (x: Row, y: Row) =>
      x.length == y.length && (0 until x.length).forall(i => valueEq(x(i), y(i)))
    case (x, y) => x == y
  }

  /** Spark's `CAST(x AS TIMESTAMP)` yields session-local (LTZ) timestamps
    * while the engine's canonical event time is TIMESTAMP_NTZ; under the
    * UTC sessions every entry point pins, the two carry the same wall
    * clock. Normalize LTZ → NTZ so the comparison is value-level, not
    * representation-level (DuckDB's naive TIMESTAMP equals both). */
  private def normTs(df: DataFrame): DataFrame =
    df.select(df.schema.fields.map { f =>
      f.dataType match {
        case org.apache.spark.sql.types.TimestampType =>
          org.apache.spark.sql.functions.col(f.name)
            .cast("timestamp_ntz").as(f.name)
        case _ => org.apache.spark.sql.functions.col(f.name)
      }
    }.toSeq: _*)

  /** Run one contract query both ways — the DataFrame implementation vs
    * the Spark-dialect SQL text ([[graft.SparkEntry.sparkSql]]: the oracle
    * string where Spark parses it, the SparkDialect twin otherwise); None
    * = frames identical, Some = first divergence description. */
  def diff(s: SparkSession, dir: String, name: String): Option[String] = {
    val df = normTs(graft.SparkEntry.queries(name)(s, dir))
    val sql = normTs(s.sql(graft.SparkEntry.sparkSql(name)))
    val (dc, sc) = (df.columns.sorted.toSeq, sql.columns.sorted.toSeq)
    if (dc != sc) return Some(s"columns df=$dc sql=$sc")
    val (a, b) = (df.select(dc.map(df.col): _*).collect(),
      sql.select(dc.map(sql.col): _*).collect())
    if (a.length != b.length) return Some(s"rows df=${a.length} sql=${b.length}")
    a.zip(b).zipWithIndex.collectFirst {
      case ((ra, rb), i) if !valueEq(ra, rb) => s"row $i: df=$ra sql=$rb"
    }
  }

  val all: Seq[Q] = Seq(
    // One row per parity-set member: (query_name, status, detail). The
    // ScalaTest gate (SqlParitySpec) asserts every status == "ok"; the
    // driver's rows-only check sees |paritySet| rows.
    Q.cap("cap_sql_parity") { (s, d) =>
      registerViews(s, d)
      val rows = paritySet.map { name =>
        try diff(s, d, name) match {
          case None => (name, "ok", "")
          case Some(why) => (name, "mismatch", why.take(200))
        } catch {
          case e: Exception =>
            (name, "error", s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(200)}")
        }
      }
      import s.implicits._
      rows.toDF("query_name", "status", "detail").orderBy("query_name")
    })
}
