package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** EDGAR-shaped filings pipeline — the BASELINE north star ("parses XBRL
  * filings into a DB") composed end-to-end from the library's own seams:
  *
  *   XML filing batches on disk
  *     → native XML ingest            (q_source_xml shape)
  *     → from_xml fact extraction     (q_xml_extract shape)
  *     → accession-keyed upsert       ([[IncrementalLoad]] — amendments win)
  *     → exact fact dedup             (keep-best window, q_dedup_keep_best shape)
  *     → narrative near-dup dedup     ([[SimHashBanding]] 60-bit + [[DedupGroups]])
  *     → decimal-exact period rollup  (the flagship agg discipline)
  *
  * Every stage is one lazy DataFrame; the only eager steps are the two
  * batch writes (the ingest seam is real files, as in production). The
  * 100 TB story is inherited from the parts: the upsert and both dedups
  * shuffle only on their natural keys (accession / fact key / banded
  * fingerprint), the rollup is a combinable decimal agg, and nothing
  * ever materializes on the driver. EtlSpec gates idempotence (replaying
  * a batch changes nothing bit-for-bit), amendment semantics, retention
  * monotonicity and rollup exactness; the registry exposes the composed
  * run as cap_pipeline_xbrl.
  */
object FilingsPipeline {

  /** On-disk filing shape: business key `accession`, numeric `filing_id`
    * (dedup vertex id), reporting `entity`, `period` (yyyy-MM), the
    * free-text `narrative`, and the XBRL-fact payload as nested XML. */
  val filingSchema: StructType = StructType(Seq(
    StructField("accession", StringType),
    StructField("filing_id", LongType),
    StructField("entity", LongType),
    StructField("period", StringType),
    StructField("narrative", StringType),
    StructField("factxml", StringType)))

  /** Typed numeric fact: concept + DECIMAL(18,2) value — parsed exactly
    * from the XML text, never through a float. */
  private val factSchema = StructType(Seq(
    StructField("concept", StringType),
    StructField("value", DecimalType(18, 2))))

  /** Orders-derived filing batch (the fixture side of the seam): one
    * filing per order — accession from the order key, entity = customer,
    * period = order month, a deterministic narrative, and the fact
    * payload rendered as nested XML with a decimal-exact value.
    * `valueShift` + `amended` produce a re-filed amendment batch: same
    * accession (the upsert key), revised value, annotated narrative. */
  def ordersAsFilings(orders: DataFrame, valueShift: String = "0.00",
                      amended: Boolean = false): DataFrame = {
    val period = date_format(col("o_orderdate"), "yyyy-MM")
    val value = (col("o_totalprice").cast(DecimalType(18, 2)) +
      lit(valueShift).cast(DecimalType(18, 2))).cast(DecimalType(18, 2))
    val note = if (amended) lit(" amended filing") else lit("")
    orders.select(
      concat(lit("A"), lpad(col("o_orderkey").cast("string"), 12, "0"))
        .as("accession"),
      col("o_orderkey").as("filing_id"),
      col("o_custkey").as("entity"),
      period.as("period"),
      concat(lit("entity "), col("o_custkey"), lit(" files a "),
        col("o_orderpriority"), lit(" "), col("o_orderstatus"),
        lit(" revenue report for period "), period, note).as("narrative"),
      concat(lit("<fact><concept>Revenue</concept><value>"),
        value.cast("string"), lit("</value></fact>")).as("factxml"))
  }

  /** Writer side of the ingest seam (eager; deterministic overwrite). */
  def writeBatch(filings: DataFrame, dir: String): Unit =
    filings.write.mode("overwrite").format("xml")
      .option("rootTag", "filings").option("rowTag", "filing").save(dir)

  /** Native XML ingest of a batch directory. */
  def ingest(spark: SparkSession, dir: String): DataFrame =
    spark.read.format("xml").schema(filingSchema)
      .option("rowTag", "filing").load(dir)

  /** Typed facts via from_xml — per-row parse, no shuffle. */
  def extractFacts(filings: DataFrame): DataFrame =
    filings
      .select(col("accession"), col("filing_id"), col("entity"),
        col("period"), col("narrative"),
        from_xml(col("factxml"), factSchema).as("f"))
      .select(col("accession"), col("filing_id"), col("entity"),
        col("period"), col("narrative"),
        col("f.concept").as("concept"), col("f.value").as("value"))

  /** Exact fact dedup: one survivor per (entity, period, concept, value),
    * lowest accession wins — the same keep-best window as
    * q_dedup_keep_best, hash-partitioned on the fact key. */
  def dedupExact(facts: DataFrame): DataFrame =
    facts.withColumn("__rn", row_number().over(
        Window.partitionBy("entity", "period", "concept", "value")
          .orderBy("accession")))
      .filter(col("__rn") === 1).drop("__rn")

  /** Near-dup dedup on the narrative: 60-bit SimHash fingerprints within
    * entity buckets → banded pairs → connected components → keep the
    * min filing_id per component. Facts with unique narratives survive
    * untouched. */
  def dedupNear(facts: DataFrame): DataFrame = {
    val fp = SimHashBanding.fingerprints64(
      facts.select(col("filing_id").as("doc_id"), col("entity"),
        col("narrative").as("text")),
      bucketCols = Seq("entity"))
    val pairs = SimHashBanding.pairs(fp, maxHamming = 4,
      bucketCols = Seq("entity"), bands = 5, bandBits = 12)
    DedupGroups.dropDuplicates(
      facts.withColumn("doc_id", col("filing_id")), pairs).drop("doc_id")
  }

  /** Decimal-exact per-period rollup: the analytic product of the DB. */
  def rollup(facts: DataFrame): DataFrame =
    facts.groupBy("period")
      .agg(count(lit(1)).as("n_facts"),
        sum(col("value")).cast(DecimalType(18, 2)).as("total_value"))
      .orderBy("period")
}
