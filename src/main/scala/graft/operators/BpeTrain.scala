package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed BPE (byte-pair-encoding) tokenizer TRAINING — the step a
  * training-data pipeline runs before it can tokenize anything: learn the
  * merge table from the corpus itself.
  *
  * Classic BPE trains on the aggregated word-frequency dictionary, not the
  * raw corpus — that is exactly the right distributed shape: the dict is
  * corpus-vocabulary-sized (sub-linear in corpus bytes, map-side-combinable
  * to build), stays a DataFrame end to end, and each merge iteration is
  *
  *   1. adjacent-pair counts: one explode + map-side-combinable groupBy
  *      over the dict, weighted by word frequency;
  *   2. argmax pair: a TakeOrdered(1) — a one-row metadata probe (the
  *      documented SizeProbe idiom), never a data-sized collect;
  *   3. dict rewrite: a row-local `aggregate` HOF fold that merges the
  *      winning pair leftmost-first inside each symbol array.
  *
  * Lineage is truncated with localCheckpoint every `checkpointEvery`
  * merges, so N merges cost N bounded jobs over a dict frame — at 100 TB
  * the corpus is touched ONCE (the dict build); every iteration after that
  * touches only the vocabulary.
  *
  * The learned model (ordered merge list) is metadata-sized; [[encode]]
  * applies it per-row via mapPartitions with the rank map built once per
  * partition — genuine imperative per-row logic, the documented last-resort
  * tier, because iterative leftmost-merge is not expressible as a bounded
  * Catalyst expression tree for an unbounded merge count.
  */
object BpeTrain {

  /** One learned merge: rank i means "the i-th best pair over the corpus
    * dict at the time it was chosen". */
  final case class Merge(rank: Int, left: String, right: String, weight: Long)

  /** Aggregated word-frequency dictionary: the ONE pass over the corpus.
    * Words ride as symbol arrays (single characters initially) plus an
    * end-of-word marker so merges cannot cross word boundaries when the
    * model is later applied to running text. */
  def wordDict(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs
      .select(explode(split(col(textCol), " ")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word")
      .agg(count(lit(1)).as("wt"))
      .select(
        // split(w, "") can emit a trailing "" under limit=-1 semantics;
        // drop empties so symbols are exactly the characters
        concat(filter(split(col("word"), ""), x => length(x) > 0),
          array(lit("</w>"))).as("syms"),
        col("wt"))

  /** Merge the (l, r) pair leftmost-first inside every symbol array: a
    * row-local fold — codegen'd HOF, no UDF. After a merge the new symbol
    * becomes the fold's tail, so overlapping runs (e.g. "aaa" under a+a)
    * merge exactly like reference BPE: [aa, a], not [aa, aa]. */
  private def mergePair(l: String, r: String) = {
    val lLit = lit(l)
    val rLit = lit(r)
    aggregate(
      col("syms"),
      array().cast("array<string>"),
      (acc, x) =>
        when(size(acc) > 0 &&
          element_at(acc, -1) === lLit && x === rLit,
          concat(slice(acc, lit(1), size(acc) - 1), array(concat(lLit, rLit))))
          .otherwise(concat(acc, array(x))))
  }

  /** Learn `numMerges` merges from the dict. Deterministic tie-break:
    * highest weighted count, then lexicographically smallest (left,
    * right) — the same total order the in-JVM reference uses, so the two
    * implementations must produce the identical merge sequence. */
  def train(words: DataFrame, numMerges: Int,
            checkpointEvery: Int = 8): Seq[Merge] = {
    var dict = words.localCheckpoint(true)
    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var i = 0
    var exhausted = false
    while (i < numMerges && !exhausted) {
      // Adjacent pairs: zip syms with its own tail (index-based transform
      // — no posexplode/self-join), then a weighted groupBy.
      val best = dict
        .select(col("wt"), explode(expr(
          "transform(slice(syms, 1, size(syms) - 1), " +
            "(x, i) -> struct(x as l, syms[i + 1] as r))")).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("wt")).as("cnt"))
        .orderBy(desc("cnt"), asc("l"), asc("r"))
        .limit(1)
        .collect() // one-row argmax probe per iteration (metadata-sized)
      if (best.isEmpty) exhausted = true
      else {
        val (l, r, cnt) =
          (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        merges += Merge(i, l, r, cnt)
        dict = dict.withColumn("syms", mergePair(l, r))
        if ((i + 1) % checkpointEvery == 0)
          dict = dict.localCheckpoint(true)
        i += 1
      }
    }
    merges.toSeq
  }

  /** The learned model as a frame (flat schema — harness-safe). */
  def modelFrame(s: SparkSession, merges: Seq[Merge]): DataFrame = {
    import s.implicits._
    merges.toDF("merge_rank", "left", "right", "pair_weight")
      .withColumn("token", concat(col("left"), col("right")))
  }

  /** Reference in-JVM BPE trainer over a collected word dict — the spec's
    * ground truth (same tie-break). Test-scale only by design. */
  def referenceTrain(dict: Seq[(String, Long)],
                     numMerges: Int): Seq[Merge] = {
    var words: Seq[(Vector[String], Long)] =
      dict.map { case (w, n) => (w.map(_.toString).toVector :+ "</w>", n) }
    val out = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var i = 0
    var done = false
    while (i < numMerges && !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((syms, wt) <- words; j <- 0 until syms.length - 1)
        counts((syms(j), syms(j + 1))) =
          counts.getOrElse((syms(j), syms(j + 1)), 0L) + wt
      if (counts.isEmpty) done = true
      else {
        val ((l, r), cnt) = counts.minBy { case ((a, b), c) => (-c, a, b) }
        out += Merge(i, l, r, cnt)
        words = words.map { case (syms, wt) =>
          val buf = scala.collection.mutable.ArrayBuffer.empty[String]
          for (x <- syms) {
            if (buf.nonEmpty && buf.last == l && x == r)
              buf(buf.length - 1) = l + r
            else buf += x
          }
          (buf.toVector, wt)
        }
        i += 1
      }
    }
    out.toSeq
  }

  /** Encode: apply the learned merges to a text column, emitting the BPE
    * token count per row (the number a packing/budgeting stage consumes).
    * The merge-rank map is metadata broadcast implicitly via closure; the
    * per-word encode is the standard lowest-rank-first merge loop. */
  def encode(docs: DataFrame, merges: Seq[Merge],
             textCol: String = "text"): DataFrame = {
    val ranks: Map[(String, String), Int] =
      merges.map(m => (m.left, m.right) -> m.rank).toMap
    val enc = udf { (text: String) =>
      if (text == null) 0
      else text.split(" ").filter(_.nonEmpty).map { w =>
        var syms: Vector[String] = w.map(_.toString).toVector :+ "</w>"
        var go = true
        while (go && syms.length > 1) {
          var bestRank = Int.MaxValue
          var bestIdx = -1
          for (j <- 0 until syms.length - 1) {
            val rk = ranks.getOrElse((syms(j), syms(j + 1)), Int.MaxValue)
            if (rk < bestRank) { bestRank = rk; bestIdx = j }
          }
          if (bestIdx < 0) go = false
          else syms = (syms.take(bestIdx) :+
            (syms(bestIdx) + syms(bestIdx + 1))) ++ syms.drop(bestIdx + 2)
        }
        syms.length
      }.sum
    }
    docs.withColumn("bpe_tokens", enc(col(textCol)))
  }
}
