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

  /** Estimator accuracy: the LSH join prunes on estimated Jaccard =
    * matching-minhash fraction over [[NumHashTables]] tables; σ at J=0.5
    * is √(J(1−J)/48) ≈ 0.072, so [[RadiusSlack]] = 0.15 ≈ 2σ of head-room
    * keeps borderline true-J pairs in the candidate set (a better recall
    * margin than round 1's h=20/slack=0.2 ≈ 1.8σ) while pruning pairs
    * whose estimate falls materially below the threshold.
    *
    * Candidate-ratio reality check: on the sf fixtures the candidate set
    * is necessarily near-all-pairs — the corpus is near-dup-dense BY
    * CONSTRUCTION (74% of all doc pairs at sf0.01 have TRUE Jaccard
    * ≥ 0.5, measured exactly), so any full-recall candidate generator
    * must emit ≥74% of pairs; that is a property of the data, not a
    * degenerate prune. TextSpec proves both directions: full recall on
    * the dense fixture AND a <2% candidate ratio on a sparse corpus with
    * planted dups (the 100 TB-realistic shape). */
  val NumHashTables = 48
  val RadiusSlack = 0.15

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
      .setNumHashTables(NumHashTables).setSeed(42L)
    val model = mh.fit(vecs)
    model.approxSimilarityJoin(vecs, vecs,
        math.min(1.0, 1.0 - minJaccard + RadiusSlack), "dist")
      .select(col("datasetA.doc_id").as("d1"), col("datasetB.doc_id").as("d2"),
        (lit(1.0) - col("dist")).as("est_jaccard"))
      .filter(col("d1") < col("d2"))
      .orderBy("d1", "d2")
  }
}
