package graft.operators

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.linalg.Vectors
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** IVF (inverted-file) cosine ANN: k-means coarse quantizer + per-cell
  * candidate lists + exact re-rank (the second scale path next to the LSH
  * of [[AnnCosine]]; SURVEY §2.9 "IVF or LSH-bucketed variant").
  *
  * Full index LIFECYCLE, the production shape — build once, persist,
  * query many:
  *  - [[buildIndex]]: k-means over L2-normalized vectors (deterministic
  *    seed) assigns every vector to a cell — a linear pass;
  *  - [[save]]/[[load]]: assignments + centroids round-trip as parquet
  *    (the 100 TB index is data, not driver state);
  *  - [[query]]: each anchor probes its own cell plus the `nprobe−1`
  *    next-nearest centroids (broadcast centroid table), candidates
  *    re-rank with the codegen'd exact cosine — an equi-join on cell id.
  * Recall/latency trades on (cells, nprobe) — the standard IVF knobs.
  */
object IvfCosine {

  /** assignments: (vec_id, embedding, cell); centroids: (pcell, cvec). */
  final case class IvfIndex(assignments: DataFrame, centroids: DataFrame)

  // Defaults tuned for the near-uniform random fixture: i.i.d. N(0,σ)
  // vectors have weak cluster structure, so recall needs a large probe
  // fraction (8 cells × 4 probes ≈ half the index). Real embedding
  // corpora cluster, letting cells grow and nprobe/cells shrink.
  def buildIndex(embeddings: DataFrame, cells: Int = 8): IvfIndex = {
    val spark = embeddings.sparkSession
    val toVec = udf { (a: Seq[Float]) =>
      val n = math.sqrt(a.map(x => x.toDouble * x).sum)
      Vectors.dense(a.map(x => if (n == 0) 0.0 else x / n).toArray)
    }
    val parts = spark.sparkContext.defaultParallelism
    val base = embeddings.repartition(parts)
      .select(col("vec_id"), col("embedding"), toVec(col("embedding")).as("nv"))
    val km = new KMeans().setK(cells).setSeed(42L)
      .setFeaturesCol("nv").setPredictionCol("cell")
    val model = km.fit(base)
    val centroids = model.clusterCenters.zipWithIndex.map { case (c, i) =>
      (i, c.toArray.map(_.toFloat).toSeq)
    }.toSeq
    IvfIndex(
      model.transform(base).select("vec_id", "embedding", "cell"),
      spark.createDataFrame(centroids).toDF("pcell", "cvec"))
  }

  def save(index: IvfIndex, dir: String): Unit = {
    index.assignments.write.mode("overwrite").parquet(s"$dir/assignments")
    index.centroids.write.mode("overwrite").parquet(s"$dir/centroids")
  }

  def load(spark: org.apache.spark.sql.SparkSession, dir: String): IvfIndex =
    IvfIndex(spark.read.parquet(s"$dir/assignments"),
      spark.read.parquet(s"$dir/centroids"))

  /** Probe + exact re-rank against a (possibly re-loaded) index. */
  def query(index: IvfIndex, k: Int, anchorPred: Column,
            nprobe: Int = 4): DataFrame = {
    val spark = index.assignments.sparkSession
    graft.functions.GraftFunctions.register(spark)
    import graft.functions.GraftFunctions.dot
    val assigned = index.assignments
    // anchors probe their nprobe nearest centroids (euclidean on the unit
    // sphere ≙ cosine order)
    val anchors = assigned.filter(anchorPred)
      .select(col("vec_id").as("a_id"), col("embedding").as("ea"))
    val wProbe = Window.partitionBy("a_id").orderBy(col("cdist").desc, col("pcell"))
    val probes = anchors.crossJoin(broadcast(index.centroids))
      .withColumn("cdist", dot(col("ea"), col("cvec")))
      .withColumn("pr", row_number().over(wProbe))
      .filter(col("pr") <= nprobe)
      .select("a_id", "ea", "pcell")
    val cand = probes.join(assigned, col("pcell") === col("cell"))
      .filter(col("vec_id") =!= col("a_id"))
      .select(col("a_id"), col("ea"), col("vec_id").as("b_id"),
        col("embedding").as("eb"))
    val sim = (dot(col("ea"), col("eb")) /
      (sqrt(dot(col("ea"), col("ea"))) * sqrt(dot(col("eb"), col("eb"))))).as("sim")
    val w = Window.partitionBy("a_id").orderBy(col("sim").desc, col("b_id"))
    cand.select(col("a_id"), col("b_id"), sim)
      .withColumn("rnk", row_number().over(w).cast("bigint"))
      .filter(col("rnk") <= k)
      .orderBy("a_id", "rnk")
  }

  /** One-shot build + query (cap_sim_ivf). */
  def topK(embeddings: DataFrame, k: Int, anchorPred: Column,
           cells: Int = 8, nprobe: Int = 4): DataFrame =
    query(buildIndex(embeddings, cells), k, anchorPred, nprobe)
}
