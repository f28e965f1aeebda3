package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Top principal direction of an embedding column by distributed power
  * iteration — the "what single axis explains this corpus" probe that
  * seeds PCA whitening, outlier scoring, and debiasing pipelines.
  *
  * Each round computes w = Σᵢ xᵢ·(xᵢ·v) in ONE distributed pass: the
  * per-row dot xᵢ·v is a codegen'd fold against the broadcast-literal v,
  * each row's contribution xᵢ·(xᵢ·v) is a row-local `transform`, and the
  * elementwise Σ is a posexplode → groupBy(pos) aggregate whose shuffle
  * carries only D·partitions partial sums (map-side combine) — never a
  * matrix, never the data. Driver state is the D-vector v alone
  * (metadata-scale by definition); rounds are independent jobs, so the
  * pattern survives any corpus size that one scan survives.
  *
  * Determinism note: the Σ is FP addition in partition order, so results
  * are tolerance-stable, not bit-stable — this is a ScalaTest-gated
  * capability (AnnSpec gates against an in-JVM reference Gram build at
  * fixture scale), not an oracle query.
  */
object PowerIteration {

  /** Result: unit eigenvector estimate + per-round Rayleigh quotients
    * (non-decreasing to FP tolerance; the last is the eigenvalue
    * estimate λ₁ of the Gram matrix Σ xxᵀ). */
  final case class TopComponent(vector: Array[Double], rayleigh: Seq[Double])

  def topComponent(embeddings: DataFrame, vecCol: String = "embedding",
                   iters: Int = 8): TopComponent = {
    require(iters >= 1, s"need >= 1 iterations, got $iters")
    val xd = embeddings
      .select(transform(col(vecCol), e => e.cast("double")).as("x"))
      .where(size(col("x")) > 0)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val d = xd.select(size(col("x"))).head().getInt(0)
      // deterministic seed: e₀ + a small uniform tail so a corpus whose
      // top component is orthogonal to e₀ still converges
      var v = Array.tabulate(d)(i => if (i == 0) 1.0 else 1e-3)
      val vn0 = math.sqrt(v.map(x => x * x).sum)
      v = v.map(_ / vn0)
      val lambdas = Seq.newBuilder[Double]
      for (_ <- 1 to iters) {
        val vLit = array(v.map(lit).toSeq: _*)
        val dot = aggregate(
          zip_with(col("x"), vLit, (a, b) => a * b),
          lit(0.0), (s: Column, t: Column) => s + t)
        val w = xd
          .select(posexplode(transform(col("x"), e => e * dot))
            .as(Seq("pos", "contrib")))
          .groupBy("pos").agg(sum(col("contrib")).as("s"))
          .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
        val wArr = Array.tabulate(d)(w.getOrElse(_, 0.0))
        // v is unit ⇒ Rayleigh quotient vᵀ(Gv) = v·w
        lambdas += v.zip(wArr).map { case (a, b) => a * b }.sum
        val n = math.sqrt(wArr.map(x => x * x).sum)
        require(n > 0, "power iteration collapsed: zero Gram product")
        v = wArr.map(_ / n)
      }
      TopComponent(v, lambdas.result())
    } finally xd.unpersist(false)
  }

  /** Frame form for the capability registry (scalar-only schema):
    * one row per dimension (pos, loading) + the λ₁ estimate repeated. */
  def topComponentFrame(embeddings: DataFrame, vecCol: String = "embedding",
                        iters: Int = 8): DataFrame = {
    val tc = topComponent(embeddings, vecCol, iters)
    val spark = embeddings.sparkSession
    import spark.implicits._
    tc.vector.zipWithIndex
      .map { case (l, i) => (i, l, tc.rayleigh.last) }.toSeq
      .toDF("pos", "loading", "lambda1")
      .orderBy("pos")
  }
}
