package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet fixture readers (TESTDATA.md). Schema-on-read; at 100 TB these
  * would be partitioned-table scans, but the access pattern is identical:
  * `spark.read.parquet` with pushdown + pruning left to the data source.
  */
object Tables {
  /** Resolved schema per (sf dir, table): the fixtures are immutable,
    * so paying parquet footer schema inference ONCE per table per
    * process (instead of once per query plan — hundreds of re-reads
    * across a bench session) is pure metadata savings; at 100 TB this
    * is what a catalog table's pinned schema gives every reader. Keyed
    * per path, so different SF dirs never cross. */
  private val schemaCache =
    new java.util.concurrent.ConcurrentHashMap[String,
      org.apache.spark.sql.types.StructType]

  def table(s: SparkSession, dir: String, name: String): DataFrame = {
    // Pin timestamp writes to INT64 micros: the nanosAsLong legacy conf
    // (needed for events.ts) otherwise flips the writer to INT96, which the
    // oracle compare reads back as nanos.
    s.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    val path = s"$dir/$name.parquet"
    val schema = schemaCache.computeIfAbsent(path,
      _ => s.read.parquet(path).schema)
    s.read.schema(schema).parquet(path)
  }

  def region(s: SparkSession, d: String): DataFrame = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")

  /** events.ts has shipped as BOTH parquet TIMESTAMP(NANOS) (rounds ≤9 —
    * unreadable by Spark's micros TimestampType without the nanosAsLong
    * legacy conf) and TIMESTAMP(MICROS, naive) (round 10 regenerated the
    * fixtures). Sniff the resolved type and normalize either form to
    * timestamp_ntz micros: the rest of the engine — and every oracle twin's
    * CAST(ts AS TIMESTAMP) — sees identical values regardless of vintage. */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = table(s, d, "events")
    raw.schema("ts").dataType match {
      // NANOS vintage, read as raw long via the conf: rebuild micros
      // (integer div — the fixture is micro-aligned, verified ns%1000==0)
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts",
          expr("cast(timestamp_micros(ts div 1000) as timestamp_ntz)"))
      // MICROS naive vintage: already timestamp_ntz, nothing to rebuild
      case org.apache.spark.sql.types.TimestampNTZType => raw
      // any other vintage (e.g. UTC-adjusted micros): align representation
      case _ => raw.withColumn("ts", col("ts").cast("timestamp_ntz"))
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
