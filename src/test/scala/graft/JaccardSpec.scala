package graft

import graft.core.Tables
import graft.operators.InvertedJaccard

/** The inverted-index Jaccard must agree exactly with the pairwise form. */
class JaccardSpec extends SparkSuite {

  test("inverted-index pairs == pairwise pairs (values bit-equal)") {
    val d = sf("0.01")
    val pairwise = SparkEntry.queries("q_text_jaccard_pairs")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val inverted = InvertedJaccard.pairs(Tables.documents(spark, d), 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(inverted == pairwise)
  }

  test("hot-token salted join is bit-equal to the unsalted index") {
    val d = sf("0.01")
    val plain = InvertedJaccard.pairs(Tables.documents(spark, d), 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val salted = InvertedJaccard.pairsSalted(Tables.documents(spark, d), 0.5, salt = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(salted == plain)
  }

  test("batch x corpus crossPairs == bucketed all-pairs cross join") {
    // q_dedup_incremental's near stage at scale: the postings route must
    // find EXACTLY the pairs the oracle's bucket join spells out, on the
    // same parity split the query uses. J >= 0.5 via the integer
    // predicate (3|∩| >= |A|+|B|) on the brute side, double jac on the
    // postings side — same threshold, so the PAIR SETS must match.
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, sf("0.01"))
    val half = substring(md5(col("doc_id").cast("string")), 1, 1)
    val corpus = docs.filter(half < "8")
    val batch = docs.filter(half >= "8")
    val tok = (df: org.apache.spark.sql.DataFrame, p: String) =>
      df.select(col("lang").as(p + "lang"), col("source").as(p + "src"),
        col("doc_id").as(p + "id"),
        array_distinct(split(col("text"), " ")).as(p + "toks"))
    val brute = tok(batch, "b").join(tok(corpus, "c"),
        col("blang") === col("clang") && col("bsrc") === col("csrc") &&
          lit(3) * size(array_intersect(col("btoks"), col("ctoks"))) >=
            size(col("btoks")) + size(col("ctoks")))
      .select("bid", "cid")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val postings = InvertedJaccard.crossPairs(batch, corpus, 0.5)
      .select("d1", "d2")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(postings == brute)
    assert(postings.nonEmpty, "fixture must engage the near stage")
  }
}
