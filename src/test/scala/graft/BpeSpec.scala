package graft

import graft.core.Tables
import graft.operators.BpeTrain
import org.apache.spark.sql.functions._

/** BPE trainer gates: the distributed merge sequence must be IDENTICAL to
  * the in-JVM reference (same corpus dict, same tie-break — exact integer
  * counts, so no tolerance), and the encoder must segment words into
  * tokens that reassemble to the original word.
  */
class BpeSpec extends SparkSuite {

  private val nMerges = 30

  private lazy val dict: Seq[(String, Long)] =
    Tables.documents(spark, sf("0.001"))
      .select(explode(split(col("text"), " ")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("wt"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq

  private lazy val refMerges =
    BpeTrain.referenceTrain(dict, nMerges)
  private lazy val sparkMerges =
    BpeTrain.train(
      BpeTrain.wordDict(Tables.documents(spark, sf("0.001"))), nMerges)

  test("distributed merge sequence == reference (ranks, pairs, counts)") {
    assert(sparkMerges.size == refMerges.size)
    sparkMerges.zip(refMerges).foreach { case (s, r) =>
      assert(s == r, s"diverged at rank ${r.rank}: spark=$s ref=$r")
    }
  }

  test("merges actually compress: learned pairs carry weight > 1") {
    assert(sparkMerges.nonEmpty)
    assert(sparkMerges.forall(_.weight > 1),
      "a merge chosen on weight 1 means the corpus dict was exhausted")
    // weights are non-increasing in rank ONLY per-iteration-argmax sense;
    // the first merge must be the global best pair
    assert(sparkMerges.head.weight == sparkMerges.map(_.weight).max)
  }

  test("encode token counts: fewer tokens than characters, none lost") {
    val enc = BpeTrain.encode(
      Tables.documents(spark, sf("0.001")), sparkMerges)
      .agg(sum(col("bpe_tokens").cast("long")).as("toks"),
        sum(col("n_chars")).as("chars"),
        sum(size(split(col("text"), " ")).cast("long")).as("words"))
      .collect().head
    val (toks, chars, words) = (enc.getLong(0), enc.getLong(1), enc.getLong(2))
    // every word emits ≥ 1 token; tokens never exceed chars+words (the
    // unmerged upper bound: one symbol per char plus one </w> per word)
    assert(toks >= words)
    assert(toks <= chars + words)
    // and the 30 merges must have actually reduced the token count below
    // the unmerged bound
    assert(toks < chars + words,
      s"encoding never merged anything: toks=$toks chars=$chars words=$words")
  }

  test("sequential-rewrite encoding agrees with lowest-rank-first encoding") {
    // Two classic formulations of BPE application: (a) replay the merges
    // in rank order over the whole symbol string (training's rewrite),
    // (b) repeatedly merge the lowest-rank adjacent pair (the runtime
    // encoder). For a consistent merge table they are equivalent; this
    // pins the encoder's loop against the trainer's rewrite.
    val ranks = sparkMerges.map(m => (m.left, m.right) -> m.rank).toMap
    def replay(w: String): Vector[String] = {
      var syms: Vector[String] = w.map(_.toString).toVector :+ "</w>"
      sparkMerges.foreach { m =>
        val buf = scala.collection.mutable.ArrayBuffer.empty[String]
        for (x <- syms) {
          if (buf.nonEmpty && buf.last == m.left && x == m.right)
            buf(buf.length - 1) = m.left + m.right
          else buf += x
        }
        syms = buf.toVector
      }
      syms
    }
    def lowestFirst(w: String): Vector[String] = {
      var syms: Vector[String] = w.map(_.toString).toVector :+ "</w>"
      var go = true
      while (go && syms.length > 1) {
        var bestRank = Int.MaxValue; var bestIdx = -1
        for (j <- 0 until syms.length - 1) {
          val rk = ranks.getOrElse((syms(j), syms(j + 1)), Int.MaxValue)
          if (rk < bestRank) { bestRank = rk; bestIdx = j }
        }
        if (bestIdx < 0) go = false
        else syms = (syms.take(bestIdx) :+
          (syms(bestIdx) + syms(bestIdx + 1))) ++ syms.drop(bestIdx + 2)
      }
      syms
    }
    dict.map(_._1).distinct.foreach { w =>
      val a = replay(w); val b = lowestFirst(w)
      assert(a == b, s"word '$w': replay=$a lowestFirst=$b")
      assert(a.mkString("") == w + "</w>", s"tokens of '$w' lost characters: $a")
    }
  }
}
