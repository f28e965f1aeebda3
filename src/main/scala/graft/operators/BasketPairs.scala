package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Market-basket pair mining (k = 2 frequent itemsets): the top-k item
  * pairs that co-occur in the most baskets, with a total tie-break so the
  * cut is deterministic.
  *
  * Scale shape: the distinct (basket, item) frame is the only row-scale
  * shuffle and is materialized ONCE (both self-join sides would otherwise
  * rebuild it); the pair generator is a SELF-join on the basket key —
  * co-partitioned, never cartesian — with fan-out bounded by
  * C(items-per-basket, 2); the pair rollup is |items|²-bounded and the
  * top-k fuses to TakeOrderedAndProject.
  */
object BasketPairs {

  def topPairs(df: DataFrame, basket: String, item: String,
      k: Int): DataFrame = {
    val b = df.select(col(basket).as("__k"), col(item).as("__i"))
      .distinct()
      .localCheckpoint(true)
    b.as("a")
      .join(b.as("b2"),
        col("a.__k") === col("b2.__k") && col("a.__i") < col("b2.__i"))
      .groupBy(col("a.__i").as("item_a"), col("b2.__i").as("item_b"))
      .agg(count(lit(1)).as("n_baskets"))
      .orderBy(desc("n_baskets"), col("item_a"), col("item_b"))
      .limit(k)
  }
}
