package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Blocked fuzzy self-join (record linkage): an EQUI blocking key bounds
  * the candidate space, then a row-local edit distance filters pairs.
  * Expressed as a join — never a UDF cross-score — so the planner gets a
  * plain shuffle/broadcast hash join on the block key: NO cartesian
  * product, and the quadratic blow-up is confined inside a block.
  *
  * The blocker must keep block cardinality growing with the data (e.g.
  * (nation, name-prefix) or a q-gram signature); a fixed-cardinality key
  * turns blocks quadratic at scale — same plan shape, wrong block design.
  */
object FuzzyBlockJoin {

  /** Pairs (block, key_a, key_b, dist) with key_a < key_b and
    * levenshtein(str_a, str_b) <= maxDist, blocked on `block`. */
  def selfPairs(df: DataFrame, block: String, key: String, str: String,
      maxDist: Int): DataFrame = {
    val s = df.select(col(block).as("__b"), col(key).as("__k"),
      col(str).as("__s"))
    s.as("a")
      .join(s.as("b"),
        col("a.__b") === col("b.__b") && col("a.__k") < col("b.__k"))
      .withColumn("dist", levenshtein(col("a.__s"), col("b.__s")))
      .filter(col("dist") <= maxDist)
      .select(col("a.__b").as("block"), col("a.__k").as("key_a"),
        col("b.__k").as("key_b"), col("dist"))
  }
}
