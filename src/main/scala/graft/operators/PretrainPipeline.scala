package graft.operators

import graft.functions.GraftFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Composed pre-training corpus pipeline — the cleansing family
  * ([[graft.queries.CleanseQueries]]) chained the way a real corpus run
  * chains it, with retention accounting per stage:
  *
  *   raw → cleanse (PII redact, then canonicalize) → span-dup drop →
  *   quality floor
  *
  * Stage order matters for idempotence: redaction runs BEFORE
  * normalization, so the placeholder tokens are themselves normalized and
  * a second pass finds nothing to scrub and nothing to re-case —
  * `cleanse(cleanse(x)) == cleanse(x)` (CleanseSpec gates it). Every
  * stage is row-local except the span-dup join (two hash exchanges,
  * [[SpanDedup]] scaladoc); retention() emits four scalar aggregates as
  * ONE lazy unioned frame — no driver-side actions.
  */
object PretrainPipeline {

  /** Shared with the gated queries: java/RE2-common classes only. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "\\+1-555-[0-9]{4}"

  /** Scrub + canonicalize: adds `clean_text` and `n_scrubbed` (emails +
    * phones replaced). Pure row-local projection. */
  def cleanse(docs: DataFrame, textCol: String = "text"): DataFrame = {
    GraftFunctions.register(docs.sparkSession)
    val scrubbed = regexp_replace(
      regexp_replace(col(textCol), EmailRe, "<email>"), PhoneRe, "<phone>")
    docs
      .withColumn("n_scrubbed",
        (regexp_count(col(textCol), lit(EmailRe)) +
          regexp_count(col(textCol), lit(PhoneRe))).cast("long"))
      .withColumn("clean_text", GraftFunctions.normalize(scrubbed))
  }

  /** Drop documents whose span-duplication coverage reaches `maxDupFrac`
    * (computed on `clean_text`, so near-identical dirty variants that
    * canonicalize to the same spans are caught). Left-anti join against
    * the flagged doc set — the set is small, the join key a long. */
  def dropSpanDups(
      cleansed: DataFrame,
      idCol: String = "doc_id",
      maxDupFrac: Double = 0.5,
      w: Int = 8,
      stride: Int = 4): DataFrame = {
    val flagged = SpanDedup
      .coverage(cleansed, idCol = idCol, textCol = "clean_text",
        w = w, stride = stride)
      .filter(col("dup_frac") >= maxDupFrac)
      .select(col("doc_id").as("__dup_id"))
    cleansed.join(flagged, col(idCol) === col("__dup_id"), "left_anti")
  }

  /** Keep documents with at least `minTokens` tokens of cleaned text. */
  def qualityFloor(df: DataFrame, minTokens: Int = 5): DataFrame =
    df.filter(size(split(col("clean_text"), " ")) >= minTokens)

  /** Per-stage retention: (stage, n_docs, n_tokens, n_scrubbed) for
    * raw / cleansed / span_dedup / quality as one lazy frame. The stage
    * column carries an ordinal prefix so a plain ORDER BY shows the
    * funnel in pipeline order. */
  def retention(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val toks = (c: String) => sum(size(split(col(c), " ")).cast("long"))
    val raw = docs.agg(
      count(lit(1)).as("n_docs"), toks(textCol).as("n_tokens"),
      lit(0L).as("n_scrubbed"))
      .select(lit("1_raw").as("stage"), col("*"))
    val cleansed = cleanse(docs, textCol)
    val c = cleansed.agg(
      count(lit(1)).as("n_docs"), toks("clean_text").as("n_tokens"),
      sum(col("n_scrubbed")).as("n_scrubbed"))
      .select(lit("2_cleansed").as("stage"), col("*"))
    val deduped = dropSpanDups(cleansed)
    val dd = deduped.agg(
      count(lit(1)).as("n_docs"), toks("clean_text").as("n_tokens"),
      sum(col("n_scrubbed")).as("n_scrubbed"))
      .select(lit("3_span_dedup").as("stage"), col("*"))
    val q = qualityFloor(deduped).agg(
      count(lit(1)).as("n_docs"), toks("clean_text").as("n_tokens"),
      sum(col("n_scrubbed")).as("n_scrubbed"))
      .select(lit("4_quality").as("stage"), col("*"))
    raw.unionByName(c).unionByName(dd).unionByName(q).orderBy("stage")
  }
}
