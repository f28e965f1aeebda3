package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** EXACT global top-k most-similar vector pairs with centroid
  * triangle-inequality pruning — the scale-honest form of
  * q_sim_embed_neardup's all-pairs nested loop.
  *
  * Why not LSH banding: the fixture's global top-20 sims were MEASURED at
  * only ~0.44–0.60 (both sf0.01 and sf0.1) — at those angles a random
  * hyperplane agrees with probability ~0.65/bit, so any banding scheme
  * either misses top-20 pairs (breaking the exact oracle) or generates
  * more candidates than the n²/2 it replaces. Banding is the right tool
  * for near-dup sims (≥0.9, see [[SimHashBanding]]); for exact moderate-sim
  * top-k the provable accelerator is geometric:
  *
  *  1. cells from `planes` pseudo-random hyperplane signs against LITERAL
  *     component arrays baked into the plan from a seeded Scala PRNG
  *     (deterministic, no driver probe — cheaper than a k-means fit, and
  *     the bound below is valid for ANY cell assignment);
  *  2. per-cell mean centroid + angular radius r_c = max angle(v, c) —
  *     both fully lazy aggregations;
  *  3. lower bound s_lb = k-th best sim among SAME-CELL pairs (a subset of
  *     all pairs ⇒ s_lb ≤ true k-th best) — a one-row frame broadcast into
  *     the survivor filter, so the whole operator is ONE lazy plan;
  *  4. spherical triangle inequality: for a∈Ci, b∈Cj,
  *     angle(a,b) ≥ θ(Ci,Cj) − r_i − r_j, so
  *     cos(a,b) ≤ cos(max(0, θ_ij − r_i − r_j)). Cell pairs whose bound
  *     falls below s_lb (minus an FP guard margin) cannot contain a top-k
  *     pair and are dropped BEFORE any per-vector work;
  *  5. surviving cell pairs drive an equi-join on (cell_i, cell_j); exact
  *     sims (codegen [[graft.functions.DotProduct]], bit-identical to the
  *     brute-force twin) re-rank and the global top-k is taken.
  *
  * Exactness does not depend on the data: pruning only ever removes pairs
  * provably below the k-th best (AnnSpec asserts equality with brute force
  * and prune-safety on a planted clustered corpus; degenerate centroids
  * fall back to no-prune via NaN guards). Scale story: on real embedding
  * corpora (clustered; near-dup tails ≥0.9) s_lb lands high and the bound
  * kills almost every cell pair — work approaches Σ|survivor cells|²,
  * linear-ish in practice. On this deliberately diffuse fixture the radii
  * are wide, little prunes, and the operator degrades gracefully to a
  * blocked, evenly-distributed all-pairs equi-join — the
  * information-theoretic floor for exact top-k on structure-free data.
  */
object ExactPairsTopK {

  /** (v1, v2, sim) — the exact global top-k pairs, v1 < v2, ordered by
    * (sim DESC, v1, v2). `planes` sign bits ⇒ 2^planes cells.
    *
    * Size-routed like [[HistogramRank]]: corpora at or below `directMax`
    * rows take a plain blocked all-pairs plan (one broadcast nested-loop
    * join + TakeOrdered — ≤ directMax²/2 ≈ 33.5 M candidate dots at the
    * default, spread over defaultParallelism partitions), because at that
    * size the centroid/radius/s_lb machinery is pure plan overhead: the
    * pruned form runs ~12 codegen stages whose one-shot compile cost
    * exceeds the entire brute-force runtime. Above `directMax` the
    * centroid triangle-inequality pruning is the only exact shape that
    * survives — tests pin `directMax = 0` to force it. The routing probe
    * is one [[graft.core.SizeProbe]] count: metadata-scale over a bare
    * parquet scan, and a shared (checkpointed) single execution over a
    * derived frame — the probe never doubles the input's lineage. Both
    * branches share the same codegen'd sim expression, so routing cannot
    * change a single output bit (AnnSpec asserts route equality). */
  def topPairs(embeddings: DataFrame, k: Int, planes: Int = 3,
               directMax: Long = 8192): DataFrame = {
    require(directMax <= 65536,
      s"directMax $directMax exceeds the blocked all-pairs ceiling 2^16")
    val (n, shared) = graft.core.SizeProbe.count(embeddings)
    if (n <= directMax) bruteTopK(shared, k)
    else build(shared, k, planes)._1
  }

  /** The small-route plan: normed self-join on v1 < v2 (broadcast
    * nested-loop — the build side is bounded ≤ directMax rows by the
    * routing), exact codegen dot, global TakeOrdered(k). The streamed
    * side is spread to defaultParallelism because a small parquet file
    * arrives as one split and would otherwise dot every pair on one
    * core. */
  private def bruteTopK(embeddings: DataFrame, k: Int): DataFrame = {
    val spark = embeddings.sparkSession
    graft.functions.GraftFunctions.register(spark)
    import graft.functions.GraftFunctions.dot
    val normed = embeddings.select(col("vec_id"), col("embedding"),
      dot(col("embedding"), col("embedding")).as("nrm"))
    val a = normed.select(col("vec_id").as("v1"), col("embedding").as("ea"),
        col("nrm").as("na"))
      .repartition(spark.sparkContext.defaultParallelism)
    val b = normed.select(col("vec_id").as("v2"), col("embedding").as("eb"),
      col("nrm").as("nb"))
    a.join(broadcast(b), col("v1") < col("v2"))
      .select(col("v1"), col("v2"), (dot(col("ea"), col("eb")) /
        (sqrt(col("na")) * sqrt(col("nb")))).as("sim"))
      .orderBy(col("sim").desc, col("v1"), col("v2"))
      .limit(k)
  }

  /** Test/diagnostic variant: (result, surviving cell pairs, total cell
    * pairs) — AnnSpec asserts both exactness and that the bound actually
    * prunes on a clustered corpus. */
  def topPairsWithStats(embeddings: DataFrame, k: Int,
                        planes: Int = 3): (DataFrame, Long, Long) = {
    val (res, surv) = build(embeddings, k, planes)
    val cells = 1L << planes
    (res, surv.count(), cells * cells)
  }

  /** Hyperplane components are LITERAL float arrays baked into the plan:
    * a seeded PRNG on the Scala side (deterministic, no data probe, no
    * driver action) — the round-4 in-expression `hash(p, i)` form
    * recomputed 3×64 hash-derived values per row per plane and regressed
    * the bench 1.81 → 2.99 s; here the sign projection is one codegen'd
    * [[graft.functions.DotProduct]] against the literal (it iterates the
    * SHORTER length, so only the first `size(embedding)` components
    * matter). Dims past `MaxDim` contribute zero to the projection —
    * still a valid cell assignment (the bound holds for ANY assignment;
    * only pruning rate could suffer, and real embedding models are far
    * below 1024 dims here). */
  private val MaxDim = 1024

  private def planeComponents(plane: Int): Array[Float] = {
    val rng = new scala.util.Random(0x9e3779b9L + plane)
    Array.fill(MaxDim)(rng.nextFloat() * 2 - 1)
  }

  /** The shared cell geometry: (normed rows with cell ids, per-cell
    * centroids, per-cell angular radii) — the inputs to any spherical
    * triangle-inequality bound (top-k via s_lb in [[build]]; a fixed
    * threshold in [[thresholdPairs]]). */
  private def geometry(embeddings: DataFrame,
                       planes: Int): (DataFrame, DataFrame, DataFrame) = {
    graft.functions.GraftFunctions.register(embeddings.sparkSession)
    import graft.functions.GraftFunctions.dot

    // Sign bit per hyperplane: one codegen'd dot against a literal
    // component array. The triangle-inequality bound is valid for ANY cell
    // assignment, so hyperplane quality only affects pruning rate, and
    // uniform[-1,1] components partition as well as gaussians here.
    val cellExpr = (0 until planes).map { i =>
      val proj = dot(col("embedding"), typedLit(planeComponents(i)))
      when(proj > 0, lit(1 << i)).otherwise(lit(0))
    }.reduce(_ + _)

    // lineage barrier: normed feeds four subtrees (a/b sides, centroids,
    // radii) that execute as separate broadcast exchanges — without the
    // barrier each would re-scan and re-project the corpus
    val normed = embeddings.select(col("vec_id"), col("embedding"),
        dot(col("embedding"), col("embedding")).as("nrm"))
      .withColumn("cell", cellExpr)
      .localCheckpoint(eager = false)

    // per-cell mean centroid, rebuilt as array<float> — lazy, no driver state
    val centroids = normed
      .select(col("cell"), posexplode(col("embedding")).as(Seq("p", "x")))
      .groupBy("cell", "p").agg(avg(col("x").cast("double")).as("m"))
      .groupBy("cell").agg(
        transform(array_sort(collect_list(struct(col("p"), col("m")))),
          s => s.getField("m").cast("float")).as("cvec"))
      .select(col("cell").as("pcell"), col("cvec"))

    // per-cell angular radius; NaN (zero-norm centroid) ⇒ π = never prune
    val cosVC = dot(col("embedding"), col("cvec")) /
      (sqrt(col("nrm")) * sqrt(dot(col("cvec"), col("cvec"))))
    val ang = acos(least(lit(1.0), greatest(lit(-1.0), cosVC)))
    val radii = normed.join(broadcast(centroids), col("cell") === col("pcell"))
      .select(col("cell"),
        when(isnan(ang), lit(math.Pi)).otherwise(ang).as("ang"))
      .groupBy("cell").agg(max("ang").as("r"))
    (normed, centroids, radii)
  }

  /** EXACT (d1, d2) pairs with cosine ≥ `tau`, d1 < d2 — the
    * threshold-join sibling of [[topPairs]]. Same cell geometry, but the
    * pruning bound is `tau` itself (no s_lb probe, so the whole operator
    * is one lazy plan with no driver action at all): a cell pair (Ci, Cj)
    * with cos(max(0, θij − ri − rj)) < tau cannot contain a pair at or
    * above tau and is dropped before any per-vector work. Complete at
    * ANY tau — unlike signature banding, whose recall collapses below the
    * near-dup regime (see [[SemanticDedup]], which routes its moderate-tau
    * scale branch here for exactly that reason). Same-cell pairs always
    * survive (θ = 0 ⇒ bound = 1), so no pair can be lost to its own cell;
    * cross-cell pairs appear under exactly one (cell(d1), cell(d2))
    * orientation, so no duplicates are emitted either. */
  def thresholdPairs(embeddings: DataFrame, tau: Double,
                     planes: Int = 5): DataFrame = {
    import graft.functions.GraftFunctions.dot
    val (normed, centroids, radii) = geometry(embeddings, planes)
    val ci = centroids.select(col("pcell").as("ci"), col("cvec").as("cva"))
    val cj = centroids.select(col("pcell").as("cj"), col("cvec").as("cvb"))
    val cosCC = dot(col("cva"), col("cvb")) /
      (sqrt(dot(col("cva"), col("cva"))) * sqrt(dot(col("cvb"), col("cvb"))))
    val thetaRaw = acos(least(lit(1.0), greatest(lit(-1.0), cosCC)))
    // FP guard margin keeps the bound conservative only — never the output
    val survivors = ci.crossJoin(cj)
      .select(col("ci"), col("cj"),
        when(isnan(thetaRaw), lit(0.0)).otherwise(thetaRaw).as("theta"))
      .join(radii.select(col("cell").as("ci"), col("r").as("ri")), "ci")
      .join(radii.select(col("cell").as("cj"), col("r").as("rj")), "cj")
      .filter(cos(greatest(lit(0.0), col("theta") - col("ri") - col("rj")))
        >= tau - 1e-9)
      .select("ci", "cj")
    val a = normed.select(col("cell").as("ca"), col("vec_id").as("d1"),
      col("embedding").as("ea"), col("nrm").as("na"))
    val b = normed.select(col("cell").as("cb"), col("vec_id").as("d2"),
      col("embedding").as("eb"), col("nrm").as("nb"))
    a.join(broadcast(survivors), col("ca") === col("ci"))
      .join(b, col("cb") === col("cj") && col("d1") < col("d2"))
      .filter(dot(col("ea"), col("eb")) /
        (sqrt(col("na")) * sqrt(col("nb"))) >= tau)
      .select("d1", "d2")
  }

  private def build(embeddings: DataFrame, k: Int,
                    planes: Int): (DataFrame, DataFrame) = {
    graft.functions.GraftFunctions.register(embeddings.sparkSession)
    import graft.functions.GraftFunctions.dot
    val (normed, centroids, radii) = geometry(embeddings, planes)

    // s_lb: k-th best same-cell sim (subset of all pairs ⇒ valid lower
    // bound). A one-row frame folded into the plan as a broadcast cross
    // join — plan construction fires NO driver action (the round-5 k-row
    // `.collect()` forced an eager multi-job probe before the real work).
    // Fewer than k same-cell pairs ⇒ -2.0 = no pruning (still exact).
    val a = normed.select(col("cell").as("ca"), col("vec_id").as("v1"),
      col("embedding").as("ea"), col("nrm").as("na"))
    val b = normed.select(col("cell").as("cb"), col("vec_id").as("v2"),
      col("embedding").as("eb"), col("nrm").as("nb"))
    val simExpr = (dot(col("ea"), col("eb")) /
      (sqrt(col("na")) * sqrt(col("nb")))).as("sim")
    val sLb = a.join(b, col("ca") === col("cb") && col("v1") < col("v2"))
      .select(simExpr).orderBy(col("sim").desc).limit(k)
      .agg(count(lit(1)).as("__c"), min(col("sim")).as("__m"))
      .select(when(col("__c") < k || col("__m").isNull, lit(-2.0))
        .otherwise(col("__m")).as("__slb"))

    // cell-pair bounds over C² metadata rows; FP guard margin on the
    // internal double math (conservative direction only — the bound is
    // never part of the output). NaN θ ⇒ 0 = keep the pair.
    val ci = centroids.select(col("pcell").as("ci"), col("cvec").as("cva"))
    val cj = centroids.select(col("pcell").as("cj"), col("cvec").as("cvb"))
    val cosCC = dot(col("cva"), col("cvb")) /
      (sqrt(dot(col("cva"), col("cva"))) * sqrt(dot(col("cvb"), col("cvb"))))
    val thetaRaw = acos(least(lit(1.0), greatest(lit(-1.0), cosCC)))
    val survivors = ci.crossJoin(cj)
      .select(col("ci"), col("cj"),
        when(isnan(thetaRaw), lit(0.0)).otherwise(thetaRaw).as("theta"))
      .join(radii.select(col("cell").as("ci"), col("r").as("ri")), "ci")
      .join(radii.select(col("cell").as("cj"), col("r").as("rj")), "cj")
      .crossJoin(broadcast(sLb))
      .filter(cos(greatest(lit(0.0), col("theta") - col("ri") - col("rj")))
        >= col("__slb") - 1e-9)
      .select("ci", "cj")

    val result = a.join(broadcast(survivors), col("ca") === col("ci"))
      .join(b, col("cb") === col("cj") && col("v1") < col("v2"))
      .select(col("v1"), col("v2"), simExpr)
      .orderBy(col("sim").desc, col("v1"), col("v2"))
      .limit(k)
    (result, survivors)
  }
}
