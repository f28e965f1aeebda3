package graft.operators

import org.apache.spark.ml.feature.{HashingTF, MinHashLSH}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Near-duplicate detection via MinHash-LSH over token sets — the
  * linear-scale replacement for exact pairwise Jaccard (SURVEY §2.9
  * `cap_dedup_minhash`).
  *
  * Pipeline: tokenize → distinct-token binary term-frequency vectors
  * (HashingTF, binary ⇒ set semantics) → MinHash signatures →
  * `approxSimilarityJoin` banding. At 100 TB this is the only viable dedup
  * shape: candidate generation is a bucket-equi-join on band signatures
  * (shuffle on bucket id) instead of an O(n²) bucket cross-join; recall vs
  * the exact method is asserted in TextSpec.
  */
object MinHashDedup {

  /** Candidate near-dup pairs (d1 < d2) with estimated Jaccard ≥ minJaccard.
    * Deterministic given the fixed seed. */
  def candidatePairs(documents: DataFrame, minJaccard: Double): DataFrame = {
    // Small single-file inputs arrive as one partition; the LSH join's cost
    // is in the exploded band-bucket join, so spread rows first.
    val parts = documents.sparkSession.sparkContext.defaultParallelism
    val toks = documents.repartition(parts)
      .select(col("doc_id"), array_distinct(split(col("text"), " ")).as("toks"))
    val tf = new HashingTF()
      .setInputCol("toks").setOutputCol("features")
      .setNumFeatures(1 << 18).setBinary(true)
    val vecs = tf.transform(toks).filter(size(col("toks")) > 0)
    val mh = new MinHashLSH()
      .setInputCol("features").setOutputCol("sig")
      .setNumHashTables(20).setSeed(42L)
    val model = mh.fit(vecs)
    // radius slack 0.2: approxSimilarityJoin prunes on *estimated* distance,
    // so borderline true-J pairs need head-room to stay in the candidate set
    model.approxSimilarityJoin(vecs, vecs, math.min(1.0, 1.0 - minJaccard + 0.2), "dist")
      .select(col("datasetA.doc_id").as("d1"), col("datasetB.doc_id").as("d2"),
        (lit(1.0) - col("dist")).as("est_jaccard"))
      .filter(col("d1") < col("d2"))
      .orderBy("d1", "d2")
  }
}
