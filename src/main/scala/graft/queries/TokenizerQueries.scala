package graft.queries

import graft.core.{Q, Tables}
import graft.operators.BpeTrain
import org.apache.spark.sql.functions._

/** Tokenizer training — the pipeline stage that has to run over the corpus
  * BEFORE token counting/packing/budgeting mean anything. ScalaTest-gated
  * (BpeSpec) against an in-JVM reference trainer: the distributed and
  * reference merge sequences must be identical, not just similar.
  */
object TokenizerQueries {

  private val merges = 40
  // Verify/bench/spec runs hit both caps in one session; train once per
  // fixture dir (the model is deterministic, so memoization is safe).
  private val cache =
    scala.collection.concurrent.TrieMap.empty[String, Seq[BpeTrain.Merge]]
  private[graft] def model(s: org.apache.spark.sql.SparkSession,
                           d: String): Seq[BpeTrain.Merge] =
    cache.getOrElseUpdate(d,
      BpeTrain.train(BpeTrain.wordDict(Tables.documents(s, d)), merges))

  val all: Seq[Q] = Seq(
    // The learned merge table itself — rank-ordered, with the weighted
    // pair count each merge won on. This IS the tokenizer artifact a
    // training run ships.
    Q.cap("cap_bpe_train") { (s, d) =>
      BpeTrain.modelFrame(s, model(s, d)).orderBy("merge_rank")
    },

    // Apply the learned model to the corpus: per-language token budget —
    // the number every packing/mixing stage downstream consumes. The
    // compression column is the argument for training BPE at all (chars
    // per BPE token > 1 means the merges actually bit).
    Q.cap("cap_bpe_encode") { (s, d) =>
      BpeTrain.encode(Tables.documents(s, d), model(s, d))
        .groupBy("lang")
        .agg(
          count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("sum_chars"),
          sum(col("bpe_tokens").cast("long")).as("sum_bpe_tokens"))
        .withColumn("chars_per_token",
          col("sum_chars").cast("double") / col("sum_bpe_tokens"))
        .orderBy("lang")
    }
  )
}
