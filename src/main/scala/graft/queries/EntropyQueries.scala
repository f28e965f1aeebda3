package graft.queries

import graft.core.{Q, Tables}
import org.apache.spark.sql.functions._

/** Log-based text scoring (round-10 verdict item 4).
  *
  * `ln`/`log2` are banned from the DuckDB oracle surface (libm results
  * differ across engines at the last ulp — SURVEY Appendix B), so the exact
  * stand-ins (Simpson diversity, rational LM score) carry the oracle gate
  * and the REAL log-domain scorers live here as a capability with a
  * bounded-tolerance ScalaTest gate (EntropySpec) against an in-JVM
  * reference — same libm, so the only divergence is summation order.
  *
  * Scale shape:
  *  - token entropy is one groupBy(doc_id, term) + one groupBy(doc_id) —
  *    map-side combinable, linear, no model state.
  *  - bigram perplexity trains the corpus MLE model with two aggregations
  *    (bigram counts, context counts) and scores docs via shuffle joins on
  *    the bigram key. The model is DATA, never a broadcast or driver
  *    structure — vocab² at 100 TB stays distributed; every join key is
  *    hash-partitioned.
  */
object EntropyQueries {

  /** Per-doc Shannon token entropy (bits/token) + corpus-model bigram
    * perplexity over any (doc_id, text) frame. MLE (unsmoothed) is exact
    * here because the model is trained on the same corpus being scored —
    * every document bigram has model count ≥ 1, so P > 0 always. */
  def entropyFrame(docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    {
      val tok = docs.select(col("doc_id"),
        explode(split(col("text"), " ")).as("term"))
      val tf = tok.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      // H = log2(N) − (1/N)·Σ tf·log2(tf): single aggregate, no self-join.
      val ent = tf.groupBy("doc_id").agg(
        sum(col("tf").cast("double") * log2(col("tf"))).as("s"),
        sum(col("tf")).as("n_tokens"))
        .select(col("doc_id"), col("n_tokens"),
          (log2(col("n_tokens")) - col("s") / col("n_tokens")).as("entropy"))

      // Adjacent-token bigrams, row-local via a higher-order transform (no
      // positional self-join).
      val toks = docs.select(col("doc_id"), split(col("text"), " ").as("ts"))
      // lineage barrier (the repo's HOF-barrier idiom): the exploded bigram
      // frame feeds THREE aggregations (doc counts, model bigram counts,
      // model context counts) — without it the tokenize+explode subtree
      // re-runs once per consumer
      val big = toks
        .filter(size(col("ts")) >= 2)
        .select(col("doc_id"), explode(expr(
          "transform(sequence(0, size(ts)-2), i -> struct(ts[i] AS w1, ts[i+1] AS w2))")).as("b"))
        .select(col("doc_id"), col("b.w1"), col("b.w2"))
        .localCheckpoint(eager = false)
      val docBig = big.groupBy("doc_id", "w1", "w2").agg(count(lit(1)).as("c"))
      val modelBig = big.groupBy("w1", "w2").agg(count(lit(1)).as("bc"))
      val modelCtx = big.groupBy("w1").agg(count(lit(1)).as("cc"))
      val model = modelBig.join(modelCtx, "w1")
        .select(col("w1"), col("w2"),
          (col("bc").cast("double") / col("cc")).as("p"))
      // logPP = −(1/N)·Σ c·log2(p); PP = 2^logPP ∈ [1, vocab].
      val ppl = docBig.join(model, Seq("w1", "w2"))
        .groupBy("doc_id").agg(
          sum(col("c")).as("n_bigrams"),
          sum(col("c").cast("double") * log2(col("p"))).as("lp"))
        .select(col("doc_id"), col("n_bigrams"),
          pow(lit(2.0), -col("lp") / col("n_bigrams")).as("bigram_ppl"))

      ent.join(ppl, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_tokens"), col("entropy"),
          coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
          col("bigram_ppl"))
        .orderBy("doc_id")
    }
  }

  val all: Seq[Q] = Seq(
    Q.cap("cap_text_entropy") { (s, d) =>
      entropyFrame(Tables.documents(s, d))
    })
}
