package graft.operators

import org.apache.spark.ml.feature.BucketedRandomProjectionLSH
import org.apache.spark.ml.linalg.Vectors
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Approximate nearest neighbours by cosine via random-hyperplane bucketing
  * (SURVEY §2.9 similarity-search scale path).
  *
  * Cosine reduces to euclidean on L2-normalized vectors
  * (‖a−b‖² = 2 − 2·cos), so BucketedRandomProjectionLSH buckets give
  * cosine-ANN candidates; exact cosine re-ranks within candidates only.
  * At 100 TB: candidate generation is an equi-join on bucket ids (shuffle
  * on bucket id, linear-ish) instead of the O(n²) cross join of the exact
  * baseline (q_sim_cosine_topk / q_sim_embed_neardup), and the re-rank is
  * the codegen'd [[graft.functions.DotProduct]]. AnnSpec gates recall
  * against the exact top-k.
  */
object AnnCosine {

  /** Deterministic (fixed seed) top-k cosine candidates per anchor. */
  def topK(embeddings: DataFrame, k: Int, anchorPred: Column): DataFrame = {
    val spark = embeddings.sparkSession
    graft.functions.GraftFunctions.register(spark)
    val toVec = udf { (a: Seq[Float]) =>
      val n = math.sqrt(a.map(x => x.toDouble * x).sum)
      Vectors.dense(a.map(x => if (n == 0) 0.0 else x / n).toArray)
    }
    val parts = spark.sparkContext.defaultParallelism
    val base = embeddings.repartition(parts)
      .select(col("vec_id"), col("embedding"), toVec(col("embedding")).as("nv"))
    val lsh = new BucketedRandomProjectionLSH()
      .setInputCol("nv").setOutputCol("buckets")
      .setBucketLength(0.5).setNumHashTables(6).setSeed(42L)
    val model = lsh.fit(base)
    val anchors = base.filter(anchorPred)
    // ‖a−b‖ ≤ 1.2 on the unit sphere ⇔ cos ≥ 0.28 — generous candidate radius
    val cand = model.approxSimilarityJoin(anchors, base, 1.2, "dist")
      .select(col("datasetA.vec_id").as("a_id"),
        col("datasetB.vec_id").as("b_id"),
        col("datasetA.embedding").as("ea"),
        col("datasetB.embedding").as("eb"))
      .filter(col("a_id") =!= col("b_id"))
    import graft.functions.GraftFunctions.dot
    val sim = (dot(col("ea"), col("eb")) /
      (sqrt(dot(col("ea"), col("ea"))) * sqrt(dot(col("eb"), col("eb"))))).as("sim")
    val w = Window.partitionBy("a_id").orderBy(col("sim").desc, col("b_id"))
    cand.select(col("a_id"), col("b_id"), sim)
      .withColumn("rnk", row_number().over(w).cast("bigint"))
      .filter(col("rnk") <= k)
      .orderBy("a_id", "rnk")
  }
}
