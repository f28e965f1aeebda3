package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet fixture readers (TESTDATA.md). Schema-on-read; at 100 TB these
  * would be partitioned-table scans, but the access pattern is identical:
  * `spark.read.parquet` with pushdown + pruning left to the data source.
  */
object Tables {
  def table(s: SparkSession, dir: String, name: String): DataFrame = {
    // Pin timestamp writes to INT64 micros: the nanosAsLong legacy conf
    // (needed for events.ts) otherwise flips the writer to INT96, which the
    // oracle compare reads back as nanos.
    s.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    s.read.parquet(s"$dir/$name.parquet")
  }

  def region(s: SparkSession, d: String): DataFrame = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")

  /** events.ts is parquet TIMESTAMP(NANOS) which Spark's TimestampType
    * (micros) cannot read natively: read nanos as long and rebuild micros
    * (integer div — the fixture is micro-aligned, verified ns%1000==0).
    * Oracle twins must CAST(ts AS TIMESTAMP) for the same truncation. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // timestamp_ntz: the fixtures' naive parquet timestamps read as NTZ in
    // Spark 4, and the oracle compare needs isAdjustedToUTC=false on write.
    table(s, d, "events").withColumn("ts",
      org.apache.spark.sql.functions.expr(
        "cast(timestamp_micros(ts div 1000) as timestamp_ntz)"))
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
