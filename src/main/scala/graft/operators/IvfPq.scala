package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** IVF-PQ cosine ANN: the [[IvfCosine]] inverted file with PRODUCT
  * QUANTIZATION on the candidate scan — the real memory story for ANN at
  * 100 TB. IVF alone re-ranks candidates against full float vectors
  * (D × 4 bytes each); PQ stores each database vector as `m` one-byte
  * codeword ids (64-dim float32 → 8 bytes = 32× smaller scan set) and
  * scores candidates with ADC (asymmetric distance computation) — only
  * the top-`shortlist` survivors per anchor ever touch the full float
  * vectors again, in one final exact re-rank join.
  *
  * Pipeline (all lazy DataFrames; codebooks are model metadata, the one
  * legitimate piece of driver state — exactly like KMeans clusterCenters):
  *  1. [[buildIndex]]: coarse quantizer = [[IvfCosine.buildIndex]]
  *     (k-means cells over L2-normalized vectors); then per-subspace
  *     k-means (deterministic seed) over the normalized subvectors →
  *     `m` codebooks of `ksub` codewords; every vector encodes as the
  *     arg-min codeword per subspace via a LITERAL codebook baked into
  *     one codegen'd projection (no per-row UDF, no shuffle).
  *  2. [[save]]/[[load]]: codes + centroids + codebooks round-trip as
  *     parquet — the index is data, not driver state.
  *  3. [[query]]: anchors probe `nprobe` nearest cells (broadcast
  *     centroid table, as IVF). ADC: per-anchor lookup table
  *     lut(a, m, code) = <anchor subvector, codeword> — anchors ×
  *     (m·ksub) rows, broadcast; candidates explode their `m` codes and
  *     sum matching lut entries — approximate dot without touching any
  *     candidate float. Top-`shortlist` per anchor by ADC, then ONE
  *     equi-join back to the full vectors for the exact cosine re-rank
  *     and the final top-k.
  *
  * Quantization error trades on (m, ksub); recall/latency on (cells,
  * nprobe, shortlist). Training fits `m` k-means models over the corpus
  * — at real scale you fit on a bounded sample; the fit input is already
  * one distributed pass. AnnSpec gates recall ≥ 0.6 against the exact
  * top-k (the cap_sim_ann / cap_sim_ivf gate) and round-trips the index;
  * StressSpec carries the scale claim with candidate-volume work
  * metrics.
  */
object IvfPq {

  /** codes: (vec_id, cell, codes array<int>); centroids: (pcell, cvec);
    * codebooks: (m, code, cw array<float>). */
  final case class IvfPqIndex(codes: DataFrame, centroids: DataFrame,
                              codebooks: DataFrame)

  /** L2-normalized copy of the embedding column (cosine ≙ dot on the
    * unit sphere; the zero vector maps to zero, never NaN). */
  private def normalized(embeddings: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.register(embeddings.sparkSession)
    import graft.functions.GraftFunctions.dot
    embeddings.select(col("vec_id"), col("embedding"),
      sqrt(dot(col("embedding"), col("embedding"))).as("__n"))
      .select(col("vec_id"), col("embedding"),
        transform(col("embedding"), x =>
          when(col("__n") > 0, x.cast("double") / col("__n"))
            .otherwise(lit(0.0)).cast("float")).as("nv"))
  }

  def buildIndex(embeddings: DataFrame, cells: Int = 8, m: Int = 8,
                 ksub: Int = 16): IvfPqIndex = {
    val spark = embeddings.sparkSession
    val ivf = IvfCosine.buildIndex(embeddings, cells)
    val nv = normalized(embeddings).localCheckpoint(eager = false)

    // per-subspace k-means over the normalized subvectors (deterministic
    // seed per subspace, shared [[PqCodec]] fit); codebooks become
    // literals in the codegen'd encode plan
    val codec = PqCodec.fit(nv, "nv", m, ksub)
    val codesCol = array((0 until m).map(mi =>
      PqCodec.codeCol(codec, mi, "nv")): _*).as("codes")
    val codes = nv.select(col("vec_id"), codesCol)
      .join(ivf.assignments.select("vec_id", "cell"), "vec_id")
      .select("vec_id", "cell", "codes")

    val bookRows = for (mi <- 0 until m; c <- 0 until ksub)
      yield (mi, c, codec.books(mi)(c).toSeq)
    val codebooks = spark.createDataFrame(bookRows.toSeq)
      .toDF("m", "code", "cw")
    IvfPqIndex(codes, ivf.centroids, codebooks)
  }

  def save(index: IvfPqIndex, dir: String): Unit = {
    index.codes.write.mode("overwrite").parquet(s"$dir/codes")
    index.centroids.write.mode("overwrite").parquet(s"$dir/centroids")
    index.codebooks.write.mode("overwrite").parquet(s"$dir/codebooks")
  }

  def load(spark: SparkSession, dir: String): IvfPqIndex =
    IvfPqIndex(spark.read.parquet(s"$dir/codes"),
      spark.read.parquet(s"$dir/centroids"),
      spark.read.parquet(s"$dir/codebooks"))

  /** Encode a batch of NEW vectors against an EXISTING index's centroids
    * and codebooks — the incremental-ingest path: a daily embedding batch
    * joins the index with one distributed pass (nearest-centroid assign +
    * literal-codebook encode), no k-means refit, no touch of the base
    * codes. Returns (vec_id, cell, codes), the [[IvfPqIndex.codes]]
    * schema.
    *
    * Honesty contract: appended vectors are quantized with codebooks
    * fitted on the ORIGINAL corpus. ADC stays a valid approximate score
    * and the exact re-rank is unaffected, but if the new data drifts from
    * the training distribution, its quantization error — and with it the
    * chance of missing the shortlist — grows. Maintenance: watch
    * [[assignmentQuality]] per batch and apply ITS measured policy
    * (shortlist first, cell-scaled rebuild for query cost —
    * r14_ann_drift.md). */
  def encode(index: IvfPqIndex, embeddings: DataFrame): DataFrame = {
    val spark = index.codes.sparkSession
    graft.functions.GraftFunctions.register(spark)
    import graft.functions.GraftFunctions.dot
    val codec = PqCodec.fromRows(
      index.codebooks.select("m", "code", "cw").collect(), "index.codebooks")
    val nv = normalized(embeddings).localCheckpoint(eager = false)
    val wCell = Window.partitionBy("vec_id")
      .orderBy(col("cd").desc, col("pcell"))
    val assign = nv.crossJoin(broadcast(index.centroids))
      .withColumn("cd", dot(col("nv"), col("cvec")))
      .withColumn("r", row_number().over(wCell))
      .filter(col("r") === 1)
      .select(col("vec_id"), col("pcell").as("cell"))
    val codesCol = array((0 until codec.m).map(mi =>
      PqCodec.codeCol(codec, mi, "nv")): _*).as("codes")
    nv.select(col("vec_id"), codesCol)
      .join(assign, "vec_id")
      .select("vec_id", "cell", "codes")
  }

  /** In-memory incremental append: same centroids + codebooks, codes
    * unioned. Caller owns vec_id uniqueness across batches. */
  def append(index: IvfPqIndex, embeddings: DataFrame): IvfPqIndex =
    index.copy(codes = index.codes.unionByName(encode(index, embeddings)))

  /** Persistent incremental append: encodes against the SAVED index and
    * appends only the new code files under `dir`/codes — the base codes,
    * centroids and codebooks are never rewritten, so a 100 TB index
    * grows by one batch-sized parquet append per ingest. For drift-aware
    * ingest use [[initMaintenance]] + [[appendToDirManaged]], which runs
    * the measured r14 policy on every batch. */
  def appendToDir(spark: SparkSession, dir: String,
                  embeddings: DataFrame): Unit =
    encode(load(spark, dir), embeddings)
      .write.mode("append").parquet(s"$dir/codes")

  /** The persisted maintenance ledger of a managed index dir: the
    * held-out baseline quality, corpus accounting, and the policy's
    * CURRENT recommendations — `shortlistFactor` (multiply the query
    * shortlist by it: the measured first lever, r14_ann_drift.md) and
    * `rebuildRecommended` (query-cost drift: appended volume crossed
    * the fraction where frozen-cell imbalance starts taxing nprobe). */
  final case class MaintenanceState(baseline: Double, indexedRows: Long,
      appendedRows: Long, shortlistFactor: Int, rebuildRecommended: Boolean,
      lastRatio: Double) {
    def recommendedShortlist(base: Int = 256): Int = base * shortlistFactor
  }

  private def maintPath(dir: String) =
    new org.apache.hadoop.fs.Path(dir, "_maintenance.json")

  private def writeMaintenance(spark: SparkSession, dir: String,
      st: MaintenanceState): Unit = {
    // a NaN/Inf baseline or ratio (e.g. an empty held-out sample)
    // would serialize as bare NaN — invalid JSON that permanently
    // wedges every later parse; refuse it before any byte lands
    require(java.lang.Double.isFinite(st.baseline) &&
      java.lang.Double.isFinite(st.lastRatio),
      s"maintenance ledger: non-finite baseline/ratio (baseline=" +
        s"${st.baseline}, lastRatio=${st.lastRatio}) — score a " +
        "non-empty held-out sample")
    val p = maintPath(dir)
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = p.getFileSystem(conf)
    // dot-tmp + rename-over: a crash mid-write must never leave a
    // truncated ledger in place (that would wedge appendToDirManaged)
    val tmp = new org.apache.hadoop.fs.Path(dir,
      s"._maintenance.json.tmp-${java.util.UUID.randomUUID()}")
    val out = fs.create(tmp, true)
    try out.write(
      s"""{"baseline":${st.baseline},"indexedRows":${st.indexedRows},
         |"appendedRows":${st.appendedRows},
         |"shortlistFactor":${st.shortlistFactor},
         |"rebuildRecommended":${st.rebuildRecommended},
         |"lastRatio":${st.lastRatio}}""".stripMargin
        .replace("\n", "").getBytes("UTF-8"))
    finally out.close()
    // LocalFs is a ChecksumFs: the raw FileContext rename below moves
    // only the data file, so drop both .crc sidecars or a stale dst
    // sidecar fails every later open with ChecksumException
    fs.delete(new org.apache.hadoop.fs.Path(dir,
      s".${tmp.getName}.crc"), false)
    fs.delete(new org.apache.hadoop.fs.Path(dir,
      s".${p.getName}.crc"), false)
    val fc = org.apache.hadoop.fs.FileContext.getFileContext(p.toUri, conf)
    fc.rename(tmp, p, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
  }

  /** The managed dir's current ledger, if [[initMaintenance]] ran. */
  def maintenanceState(spark: SparkSession, dir: String)
      : Option[MaintenanceState] = {
    val p = maintPath(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      val j = org.json4s.jackson.JsonMethods.parse(text)
      import org.json4s._
      def d(f: String): Double = (j \ f).values.toString.toDouble
      def l(f: String): Long = (j \ f).values.toString.toLong
      Some(MaintenanceState(d("baseline"), l("indexedRows"),
        l("appendedRows"), l("shortlistFactor").toInt,
        (j \ "rebuildRecommended") == JBool(true), d("lastRatio")))
    }
  }

  /** Arm the r14-measured maintenance policy on a saved index: the
    * baseline is [[assignmentQuality]] of a HELD-OUT in-distribution
    * sample (never the training corpus — it scores its own fit and
    * would flag healthy ingest). One-time, after [[save]]. */
  def initMaintenance(spark: SparkSession, dir: String,
      heldOut: DataFrame): MaintenanceState = {
    val index = load(spark, dir)
    val st = MaintenanceState(
      baseline = assignmentQuality(index, heldOut),
      indexedRows = index.codes.count(),
      appendedRows = 0L, shortlistFactor = 1,
      rebuildRecommended = false, lastRatio = 1.0)
    writeMaintenance(spark, dir, st)
    st
  }

  /** [[appendToDir]] with the measured maintenance policy IN the loop
    * (round-15 verdict #6): every batch is scored against the armed
    * baseline before its codes land, and the ledger's recommendations
    * update so the policy fires BEFORE query-time recall decays:
    *
    *  - |quality/baseline − 1| > `driftRatio` (0.08 — fires two batches
    *    before the 0.6 recall breach on the measured curve) ⇒ bump
    *    `shortlistFactor` to 4: queries run with shortlist×4, the lever
    *    that recovered recall 0.559 → 0.800 at zero index mutation;
    *  - appended rows exceed `appendFraction` of the indexed corpus ⇒
    *    `rebuildRecommended` (the query-COST lever: frozen-cell
    *    imbalance taxes nprobe; re-run buildIndex with cells ∝ corpus).
    *
    * The policy only ever ADDS recommendations — nothing is rebuilt or
    * mutated implicitly; the caller reads the ledger and acts. */
  def appendToDirManaged(spark: SparkSession, dir: String,
      embeddings: DataFrame, driftRatio: Double = 0.08,
      appendFraction: Double = 0.5): MaintenanceState = {
    val st = maintenanceState(spark, dir).getOrElse(sys.error(
      s"appendToDirManaged: no maintenance ledger at $dir — run " +
        "initMaintenance(dir, heldOutSample) once after save()"))
    val index = load(spark, dir)
    val q = assignmentQuality(index, embeddings)
    val batchRows = embeddings.count()
    encode(index, embeddings).write.mode("append").parquet(s"$dir/codes")
    val ratio = q / st.baseline
    val appended = st.appendedRows + batchRows
    val next = st.copy(
      appendedRows = appended,
      shortlistFactor =
        if (math.abs(ratio - 1) > driftRatio) math.max(st.shortlistFactor, 4)
        else st.shortlistFactor,
      rebuildRecommended = st.rebuildRecommended ||
        appended > appendFraction * st.indexedRows,
      lastRatio = ratio)
    writeMaintenance(spark, dir, next)
    next
  }

  /** Mean best-centroid cosine of `embeddings` against the FROZEN
    * coarse quantizer — the online DRIFT signal for the append path:
    * vectors from the trained distribution score near the index's own
    * build-time quality; a drifted batch (new domain, new embedding
    * model, topic shift) scores measurably lower BEFORE recall decays
    * at query time. One broadcast centroid pass over the batch, no
    * index mutation.
    *
    * Maintenance policy, measured (r14_ann_drift.md, progressive-drift
    * appends to 4× the indexed corpus):
    *  - TRIGGER: flag a batch when |quality/baseline − 1| > 0.08,
    *    where the baseline is a HELD-OUT in-distribution sample scored
    *    at build time — the training corpus scores its own fit (the
    *    generalization gap is ~0.2 on the fixture), so it would flag
    *    healthy ingest
    *    (the curve: ratio 1.08 at the first drifted batch, 1.16 when
    *    appended-anchor recall breached the 0.6 gate) or when appended
    *    rows since build exceed ~50 % of the indexed corpus.
    *  - FIRST LEVER — widen `shortlist`, not rebuild: drifted batches
    *    concentrate in few cells, and the binding constraint there is
    *    the ADC shortlist separating near-identical candidates, not
    *    the coarse quantizer. Measured: recall 0.559 → 0.800 by
    *    raising shortlist 256 → 1024 on the FROZEN index — better
    *    than every rebuild variant tried, at zero index mutation.
    *  - REBUILD (re-run [[buildIndex]] with cells ∝ corpus, holding
    *    per-cell list size) when QUERY COST drifts: stacked drifted
    *    appends imbalance the frozen cells — the rebuild cut probed
    *    candidates 3.4× at equal nprobe in the r14 run. Re-tune
    *    (nprobe, shortlist) after — a same-params rebuild measured
    *    WORSE recall than the frozen index (0.433 vs 0.559).
    * Between rebuilds, appends stay one-batch-priced; the rebuild is
    * the same one-shot distributed fit as the original build. */
  def assignmentQuality(index: IvfPqIndex, embeddings: DataFrame): Double = {
    val spark = index.codes.sparkSession
    graft.functions.GraftFunctions.register(spark)
    import graft.functions.GraftFunctions.dot
    val cents = index.centroids.select(col("pcell"), col("cvec"))
    normalized(embeddings).select(col("vec_id"), col("nv"))
      .crossJoin(broadcast(cents))
      .groupBy("vec_id").agg(max(dot(col("nv"), col("cvec"))).as("best"))
      .agg(avg("best")).head().getDouble(0)
  }

  /** ADC-scored probe + exact shortlist re-rank. `embeddings` supplies
    * the anchor vectors and the full floats for the final re-rank —
    * candidates are scored from their `m`-byte codes alone. Returns
    * (a_id, b_id, sim, rnk), the [[IvfCosine.query]] shape. */
  def query(index: IvfPqIndex, embeddings: DataFrame, k: Int,
            anchorPred: Column, nprobe: Int = 4,
            shortlist: Int = 256): DataFrame = {
    val spark = index.codes.sparkSession
    graft.functions.GraftFunctions.register(spark)
    import graft.functions.GraftFunctions.dot

    val sub = index.codebooks.select(size(col("cw"))).head().getInt(0)
    val anchors = normalized(embeddings.filter(anchorPred))
      .select(col("vec_id").as("a_id"), col("embedding").as("ea"),
        col("nv").as("na"))
      .localCheckpoint(eager = false)

    // coarse probe: nprobe nearest centroids per anchor (cosine order)
    val wProbe = Window.partitionBy("a_id")
      .orderBy(col("cdist").desc, col("pcell"))
    val probes = anchors.crossJoin(broadcast(index.centroids))
      .withColumn("cdist", dot(col("na"), col("cvec")))
      .withColumn("pr", row_number().over(wProbe))
      .filter(col("pr") <= nprobe)
      .select("a_id", "pcell")

    // ADC lookup table: <anchor subvector, codeword> per (anchor, m,
    // code) — anchors × m × ksub rows, broadcast into the candidate scan
    val lut = anchors.crossJoin(broadcast(index.codebooks))
      .select(col("a_id").as("l_a"), col("m"), col("code").as("l_code"),
        dot(slice(col("na"), col("m") * sub + 1, lit(sub)), col("cw")).as("pd"))

    // candidates carry ONLY their codes; ADC = Σ_m lut(a, m, codes[m])
    val cand = probes.join(index.codes, col("pcell") === col("cell"))
      .filter(col("vec_id") =!= col("a_id"))
      .select(col("a_id"), col("vec_id").as("b_id"), col("codes"))
    val adc = cand
      .select(col("a_id"), col("b_id"),
        posexplode(col("codes")).as(Seq("pm", "pcode")))
      .join(broadcast(lut), col("a_id") === col("l_a") &&
        col("pm") === col("m") && col("pcode") === col("l_code"))
      .groupBy("a_id", "b_id").agg(sum("pd").as("adc"))
    val wShort = Window.partitionBy("a_id").orderBy(col("adc").desc, col("b_id"))
    val short = adc.withColumn("sr", row_number().over(wShort))
      .filter(col("sr") <= shortlist)
      .select("a_id", "b_id")

    // exact re-rank: only the shortlist touches full float vectors
    val full = embeddings.select(col("vec_id").as("b_id"),
      col("embedding").as("eb"))
    // zero-norm guard (round-7 advice): an unguarded x/0 yields NaN, and
    // NaN sorts as the LARGEST double descending — a degenerate vector
    // would occupy top-k slots ahead of real neighbors. Score it 0, the
    // same convention as `normalized`.
    val denom = sqrt(dot(col("ea"), col("ea"))) * sqrt(dot(col("eb"), col("eb")))
    val sim = when(denom > 0, dot(col("ea"), col("eb")) / denom)
      .otherwise(lit(0.0)).as("sim")
    val w = Window.partitionBy("a_id").orderBy(col("sim").desc, col("b_id"))
    short.join(full, "b_id")
      .join(anchors.select(col("a_id"), col("ea")), "a_id")
      .select(col("a_id"), col("b_id"), sim)
      .withColumn("rnk", row_number().over(w).cast("bigint"))
      .filter(col("rnk") <= k)
      .orderBy("a_id", "rnk")
  }

  /** Diagnostic (StressSpec): ADC-scored candidate volume for a probe
    * set — the work metric the IVF pruning claim lives in. */
  private[graft] def candidateCount(index: IvfPqIndex, embeddings: DataFrame,
                                    anchorPred: Column,
                                    nprobe: Int = 4): Long = {
    val spark = index.codes.sparkSession
    graft.functions.GraftFunctions.register(spark)
    import graft.functions.GraftFunctions.dot
    val anchors = normalized(embeddings.filter(anchorPred))
      .select(col("vec_id").as("a_id"), col("nv").as("na"))
    val wProbe = Window.partitionBy("a_id")
      .orderBy(col("cdist").desc, col("pcell"))
    anchors.crossJoin(broadcast(index.centroids))
      .withColumn("cdist", dot(col("na"), col("cvec")))
      .withColumn("pr", row_number().over(wProbe))
      .filter(col("pr") <= nprobe)
      .select("a_id", "pcell")
      .join(index.codes, col("pcell") === col("cell"))
      .filter(col("vec_id") =!= col("a_id"))
      .count()
  }

  /** One-shot build + query (cap_sim_ivfpq).
    *
    * Default `shortlist` = 256 (round 13): the measured recall ceiling
    * is SHORTLIST-bound, not probe- or code-bound — at full probe,
    * widening the exact re-rank 64→256 moves recall@5 0.814→0.996,
    * while at the default half-corpus probe it moves 0.678→0.748
    * (tools/bench_evidence/r13_ann_recall.md). The re-rank is
    * `shortlist` exact dot products per anchor — noise at any scale —
    * so the wider shortlist is the cheapest recall lever, ahead of
    * nprobe (linear candidate cost) and m (ADC precision). */
  def topK(embeddings: DataFrame, k: Int, anchorPred: Column,
           cells: Int = 8, m: Int = 8, ksub: Int = 16, nprobe: Int = 4,
           shortlist: Int = 256): DataFrame =
    query(buildIndex(embeddings, cells, m, ksub), embeddings, k,
      anchorPred, nprobe, shortlist)
}
