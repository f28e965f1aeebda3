package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Span-level (substring) duplication analysis: how much of each document
  * is made of token spans that ALSO appear in other documents.
  *
  * Doc-level dedup (exact / MinHash / SimHash) misses the dominant
  * real-corpus failure mode: boilerplate and quoted passages duplicated
  * ACROSS otherwise-distinct pages. The remedy used for LLM training
  * corpora is span-level: slide a window of `w` tokens with stride
  * `stride` over each document, and flag spans whose text recurs in at
  * least one OTHER document. A document's `dup_frac` (duplicated spans /
  * total spans) is then the retention/trimming signal.
  *
  * Scale shape (100 TB): strictly linear —
  *  1. tokenize + window-slide is row-local (one `explode`, no shuffle);
  *  2. spans travel the wire as an 8-byte xxhash64 key (`hashed = true`),
  *     not the ~60-byte span text — the only data-sized exchange is this
  *     hash-partitioned one;
  *  3. "appears in ≥2 distinct docs" is `min(doc_id) ≠ max(doc_id)` over
  *     an UNORDERED window on the span key — two frame-less window
  *     aggregates in one WindowExec pass, no self-join, no count-distinct;
  *  4. the per-doc rollup re-shuffles only (doc_id, flag) pairs.
  * No driver state, no collect, no quadratic candidate set: corpus-wide
  * span multiplicity is exactly one hash partition per span.
  *
  * `hashed = false` keys on the raw span text (collision-free by
  * construction) — the oracle twin and the ScalaTest ground truth for the
  * hashed path. xxhash64 collisions at corpus scale (~10¹¹ spans) are
  * birthday-bounded at ~10⁻³ per corpus and only ever MERGE two span
  * groups (over-flagging a span as duplicated), never lose one.
  */
object SpanDedup {

  /** (doc_id, span-key) pairs, one row per span position. Documents with
    * fewer than `w` tokens yield no rows (no span of width `w` exists). */
  def spans(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      w: Int = 8,
      stride: Int = 4,
      hashed: Boolean = true): DataFrame = {
    val spanText = explode(expr(
      s"transform(sequence(1, size(t) - ${w - 1}, $stride), " +
        s"p -> concat_ws(' ', slice(t, p, $w)))")).as("span")
    val raw = docs
      .select(col(idCol).as("doc_id"), split(col(textCol), " ").as("t"))
      .filter(size(col("t")) >= w)
      .select(col("doc_id"), spanText)
    if (hashed) raw.select(col("doc_id"), xxhash64(col("span")).as("k"))
    else raw.select(col("doc_id"), col("span").as("k"))
  }

  /** Per-document span-duplication coverage:
    * (doc_id, n_spans, dup_spans, dup_frac), documents with no duplicated
    * span omitted. `dup_frac` is the raw IEEE division dup/total. */
  def coverage(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      w: Int = 8,
      stride: Int = 4,
      hashed: Boolean = true): DataFrame = {
    val byKey = Window.partitionBy("k")
    val isDup: Column =
      when(min(col("doc_id")).over(byKey) =!= max(col("doc_id")).over(byKey), 1L)
        .otherwise(0L)
    spans(docs, idCol, textCol, w, stride, hashed)
      .withColumn("is_dup", isDup)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_spans"), sum(col("is_dup")).as("dup_spans"))
      .filter(col("dup_spans") > 0)
      .withColumn("dup_frac", col("dup_spans").cast("double") / col("n_spans"))
  }
}
