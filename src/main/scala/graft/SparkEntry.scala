package graft

import graft.core.Q
import graft.queries._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every SURVEY §2 operator is one [[graft.core.Q]] in a category module
  * under [[graft.queries]]; `q_*` entries carry a DuckDB oracle twin,
  * `cap_*` entries are capability-only (rows-only check + ScalaTest).
  */
object SparkEntry {
  /** Registry of all implemented contract queries, in SURVEY §2 order. */
  lazy val registry: Seq[Q] =
    ScanQueries.all ++
      JoinQueries.all ++
      PartsuppQueries.all ++
      AggQueries.all ++
      WindowQueries.all ++
      SetQueries.all ++
      ScalarQueries.all ++
      TextQueries.all ++
      CleanseQueries.all ++
      PipelineQueries.all ++
      EventQueries.all ++
      UdfQueries.all ++
      TypedQueries.all ++
      MaintenanceQueries.all ++
      StatQueries.all ++
      NonparamQueries.all ++
      TokenizerQueries.all ++
      GraphQueries.all ++
      SqlParityQueries.all ++
      EntropyQueries.all ++
      InsightQueries.all ++
      GovernanceQueries.all ++
      TableQueries.all ++
      ResampleQueries.all

  /** Flagship query (TPC-H Q1 shape) on sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    AggQueries.all.find(_.name == "q_agg_pricing_summary").get
      .fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(q.name -> _)).toMap

  /** For each oracle, SQL that PARSES through `spark.sql` and yields a
    * frame identical to the DataFrame implementation: the oracle string
    * itself where Spark's dialect accepts it, the
    * [[graft.queries.SparkDialect]] twin where DuckDB-only syntax needs
    * translation. SqlParitySpec's census gates all entries. */
  def sparkSql: Map[String, String] =
    oracleSql ++ graft.queries.SparkDialect.twins
}
