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
}
