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
    pairExpand(sets)
      .groupBy(col("item_a"), col("item_b"))
      .agg(count(lit(1)).as("n_baskets"))
      .orderBy(desc("n_baskets"), col("item_a"), col("item_b"))
      .limit(k)
  }

  /** Row-local ordered-pair expansion over the sorted per-basket set:
    * posexplode + a plain explode of each element's strictly-greater
    * tail slice — two GENERATE operators Spark runs inside whole-stage
    * codegen, where the earlier flatten∘transform∘struct lambda chain
    * took the interpreted higher-order-function path (the same rewrite
    * CoTradeGraph.edges measured 35 % faster warm). `__is` is a sorted
    * SET, so the tail slice is exactly the strictly-greater partner
    * set — the emitted pair multiset is identical. */
  private def pairExpand(sets: DataFrame): DataFrame = sets
    .select(posexplode(col("__is")).as(Seq("__i", "__a")), col("__is"))
    .select(col("__a").as("item_a"),
      explode(slice(col("__is"), col("__i") + lit(2), size(col("__is"))))
        .as("item_b"))

  /** Association rules (a → b) from the same basket frame: per directed
    * pair the co-occurrence count, antecedent support, confidence
    * = P(b|a) and lift = P(ab)/(P(a)P(b)), top-k by confidence under a
    * total tie-break. Both ratios are single IEEE divides on exact
    * < 2⁵³ integers (n_both·n_baskets bounds the claim to ~10⁸ baskets
    * per count; loud past that).
    *
    * Scale shape: ONE row-scale shuffle (the per-basket distinct set,
    * localCheckpointed because three consumers — pair expansion, item
    * supports, basket count — would otherwise re-scan and re-shuffle
    * the fact). Pair expansion is row-local as in [[topPairs]]; the
    * support/total frames are item-domain-bounded and BROADCAST into
    * the rule assembly; the top-k fuses to TakeOrderedAndProject. */
  def rules(df: DataFrame, basket: String, item: String,
      k: Int): DataFrame = {
    val sets = df.groupBy(col(basket).as("__k"))
      .agg(array_sort(collect_set(col(item))).as("__is"))
      .localCheckpoint()
    val pairs = pairExpand(sets)
      .groupBy(col("item_a").as("ia"), col("item_b").as("ib"))
      .agg(count(lit(1)).as("n_both"))
    val supp = sets.select(explode(col("__is")).as("it"))
      .groupBy("it").agg(count(lit(1)).as("supp"))
    val nb = sets.agg(count(lit(1)).as("nb"))
    val dir = pairs
      .select(col("ia").as("antecedent"), col("ib").as("consequent"),
        col("n_both"))
      .unionAll(pairs.select(col("ib").as("antecedent"),
        col("ia").as("consequent"), col("n_both")))
    dir
      .join(broadcast(supp.toDF("ita", "supp_a")),
        col("antecedent") === col("ita"))
      .join(broadcast(supp.toDF("itc", "supp_c")),
        col("consequent") === col("itc"))
      .crossJoin(broadcast(nb))
      .selectExpr("antecedent", "consequent",
        "CAST(n_both AS BIGINT) AS n_both",
        "CAST(supp_a AS BIGINT) AS n_ante",
        "CAST(n_both AS DOUBLE) / CAST(supp_a AS DOUBLE) AS confidence",
        "CAST(n_both * nb AS DOUBLE) / CAST(supp_a * supp_c AS DOUBLE)" +
          " AS lift")
      .orderBy(desc("confidence"), col("antecedent"), col("consequent"))
      .limit(k)
  }
}
