package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-mitigated equi-join by key salting (SURVEY §7.5).
  *
  * AQE's skew-join split handles sort-merge skew at runtime, but salting is
  * the layout-level fix when one hot key dominates a shuffle (the classic
  * 100 TB failure mode: one user/entity with 10⁸ fact rows lands on one
  * reducer). The big side gets a row-local salt (any assignment is
  * join-result-invariant), the small side is replicated across all salt
  * values, and the join key becomes (key, salt) — spreading the hot key
  * over `salt` reducers. SkewSpec asserts result parity with the unsalted
  * join.
  */
object SaltedJoin {

  /** Equi-join `big ⨝ small` on bigKey = smallKey with `salt`-way key
    * spreading. `small` is replicated `salt`× — keep it dimension-sized. */
  def join(big: DataFrame, small: DataFrame,
           bigKey: String, smallKey: String, salt: Int): DataFrame = {
    val salted = big.withColumn("_salt",
      pmod(monotonically_increasing_id(), lit(salt.toLong)).cast("int"))
    val replicated = small.withColumn("_salt",
      explode(sequence(lit(0), lit(salt - 1))))
    salted.join(replicated,
        salted("_salt") === replicated("_salt") &&
          salted(bigKey) === replicated(smallKey))
      .drop("_salt")
  }
}
