package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.operators.IvfPq

/** Dev tool (round-14 verdict #7): ANN recall under SUSTAINED APPENDS
  * with progressive distribution drift — where is the re-cluster knee?
  *
  * Batches are the base corpus pushed along a fixed random direction
  * by an increasing factor and re-normalized: batch b's vectors are
  * normalize(v + b·step·u). The frozen coarse quantizer and PQ
  * codebooks never saw that region, so this is the controlled worst
  * case for append-without-rebuild (new domain / embedding-model
  * switch). For each step: appended-anchor recall@5 vs exact brute
  * force over the full union, plus [[IvfPq.assignmentQuality]] — the
  * online drift signal the rebuild policy keys on. */
object AnnDrift {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(spark)
    import graft.functions.GraftFunctions.dot
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val base = Tables.embeddings(spark, d).select("vec_id", "embedding")
      .cache()
    val n = base.count()
    val dim = base.select(size(col("embedding"))).head().getInt(0)
    // fixed unit drift direction from a hash — deterministic
    val u = Array.tabulate(dim)(i =>
      math.sin(i * 2654435761.0 % 1e6).toFloat)
    val un = math.sqrt(u.map(x => x.toDouble * x).sum).toFloat
    val uLit = typedLit(u.map(x => x / un).toSeq)

    def drifted(b: Int, step: Double): DataFrame = base.select(
      (col("vec_id") + lit(b * 1000000L)).as("vec_id"),
      zip_with(col("embedding"), uLit,
        (x, y) => (x + lit(b * step) * y).cast("float")).as("e0"))
      .select(col("vec_id"), col("e0"))
      .withColumn("nrm", sqrt(dot(col("e0"), col("e0"))))
      .select(col("vec_id"), transform(col("e0"),
        x => (x / col("nrm")).cast("float")).as("embedding"))

    def recallAt5(index: IvfPq.IvfPqIndex, corpus: DataFrame,
        anchorPred: org.apache.spark.sql.Column, nprobe: Int = 4,
        shortlist: Int = 256): Double = {
      val got = IvfPq.query(index, corpus, k = 5, anchorPred = anchorPred,
        nprobe = nprobe, shortlist = shortlist)
        .select("a_id", "b_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val nn = corpus.select(col("vec_id"), col("embedding"),
        dot(col("embedding"), col("embedding")).as("nrm"))
      val a = nn.filter(anchorPred).select(col("vec_id").as("a_id"),
        col("embedding").as("ea"), col("nrm").as("na"))
      val bb = nn.select(col("vec_id").as("b_id"),
        col("embedding").as("eb"), col("nrm").as("nb"))
      val w = Window.partitionBy("a_id").orderBy(col("sim").desc, col("b_id"))
      val exact = a.join(bb, col("a_id") =!= col("b_id"))
        .select(col("a_id"), col("b_id"),
          (dot(col("ea"), col("eb")) /
            (sqrt(col("na")) * sqrt(col("nb")))).as("sim"))
        .withColumn("rnk", row_number().over(w)).filter(col("rnk") <= 5)
        .select("a_id", "b_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      if (exact.isEmpty) 1.0 else (exact & got).size.toDouble / exact.size
    }

    val step = args.headOption.map(_.toDouble).getOrElse(0.35)
    val index0 = IvfPq.buildIndex(base, cells = 16)
    val baseQ = IvfPq.assignmentQuality(index0, base)
    println(f"ANN_DRIFT base n=$n dim=$dim baseQuality=$baseQ%.4f")
    var index = index0
    var corpus = base
    (1 to 4).foreach { b =>
      val batch = drifted(b, step).cache()
      val q = IvfPq.assignmentQuality(index0, batch)
      index = IvfPq.append(index, batch)
      corpus = corpus.unionByName(batch).cache()
      val anchors = col("vec_id") > lit(b * 1000000L) &&
        col("vec_id") % 25 === 0
      val rec = recallAt5(index, corpus, anchors)
      println(f"ANN_DRIFT batch=$b driftFactor=${b * step}%.2f " +
        f"quality=$q%.4f qualityRatio=${q / baseQ}%.3f recall=$rec%.3f")
    }
    // rebuild on the full union: recall + probed-candidate volume for
    // the SAME drifted anchors (the cell-imbalance story — drifted
    // appends pile into few frozen cells, so each probe scans them)
    val anchors4 = col("vec_id") > lit(4000000L) && col("vec_id") % 25 === 0
    val candFrozen = IvfPq.candidateCount(index, corpus, anchors4)
    // same-params rebuild vs CELL-SCALED rebuild (cells ∝ corpus size,
    // holding the per-cell list at the base build's size)
    val scaledCells = math.max(16,
      (corpus.count() / math.max(1L, n / 16)).toInt)
    val frozenSl = recallAt5(index, corpus, anchors4, shortlist = 1024)
    println(f"ANN_DRIFT frozen[shortlist=1024] recall=$frozenSl%.3f")
    Seq(("fixed", 16, 4, 256), ("fixed+shortlist", 16, 4, 1024),
      ("scaled", scaledCells, 4, 256),
      ("scaled+nprobe", scaledCells, 4 * scaledCells / 16, 256),
      ("scaled+nprobe+shortlist", scaledCells, 4 * scaledCells / 16, 1024))
      .foreach { case (tag, cells, nprobe, shortlist) =>
        val rebuilt = IvfPq.buildIndex(corpus, cells = cells)
        val candRebuilt = IvfPq.candidateCount(rebuilt, corpus, anchors4,
          nprobe = nprobe)
        val recR = recallAt5(rebuilt, corpus, anchors4, nprobe = nprobe,
          shortlist = shortlist)
        val qR = IvfPq.assignmentQuality(rebuilt, corpus)
        println(f"ANN_DRIFT rebuilt[$tag cells=$cells nprobe=$nprobe " +
          f"shortlist=$shortlist] recall=$recR%.3f quality=$qR%.4f " +
          f"candidatesFrozen=$candFrozen candidatesRebuilt=$candRebuilt")
    }
    spark.stop()
  }
}
