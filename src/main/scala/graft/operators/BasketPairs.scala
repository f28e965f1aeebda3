package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Market-basket pair mining (k = 2 frequent itemsets): the top-k item
  * pairs that co-occur in the most baskets, with a total tie-break so the
  * cut is deterministic.
  *
  * Scale shape: ONE row-scale shuffle — the per-basket distinct item set
  * (partial collect_set combines map-side). Pair expansion is ROW-LOCAL
  * (a higher-order transform over the sorted set, exactly
  * C(items-per-basket, 2) structs — never a second shuffle of the
  * distinct frame, never a sort; the earlier self-join shape paid both),
  * and the pair rollup is |items|²-bounded with the top-k fused to
  * TakeOrderedAndProject. array_sort uses the same ordering as SQL `<`,
  * so pairs come out (item_a < item_b) like the join formulation.
  */
object BasketPairs {

  def topPairs(df: DataFrame, basket: String, item: String,
      k: Int): DataFrame = {
    val sets = df.groupBy(col(basket).as("__k"))
      .agg(array_sort(collect_set(col(item))).as("__is"))
    sets
      .select(explode(flatten(expr(
        """transform(__is, (x, i) ->
          |  transform(slice(__is, i + 2, size(__is) - i - 1),
          |    y -> struct(x AS item_a, y AS item_b)))""".stripMargin)))
        .as("p"))
      .groupBy(col("p.item_a").as("item_a"), col("p.item_b").as("item_b"))
      .agg(count(lit(1)).as("n_baskets"))
      .orderBy(desc("n_baskets"), col("item_a"), col("item_b"))
      .limit(k)
  }
}
