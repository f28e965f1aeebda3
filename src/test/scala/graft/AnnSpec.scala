package graft

import graft.core.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, FloatType, LongType}

/** Recall gate for the ANN scale path + multimodal plumbing checks. */
class AnnSpec extends SparkSuite {

  test("LSH-bucketed ANN recalls >=60% of exact top-5 neighbors") {
    val d = sf("0.01")
    val exact = SparkEntry.queries("q_sim_cosine_topk")(spark, d)
      .select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ann = SparkEntry.queries("cap_sim_ann")(spark, d)
      .select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & ann).size.toDouble / exact.size
    info(f"ANN recall vs exact top-5: $recall%.3f")
    assert(recall >= 0.6, f"recall $recall%.3f below 0.6")
  }

  test("IVF ANN recalls >=60% of exact top-5 neighbors") {
    val d = sf("0.01")
    val exact = SparkEntry.queries("q_sim_cosine_topk")(spark, d)
      .select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = SparkEntry.queries("cap_sim_ivf")(spark, d)
      .select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & ivf).size.toDouble / exact.size
    info(f"IVF recall vs exact top-5: $recall%.3f")
    assert(recall >= 0.6, f"recall $recall%.3f below 0.6")
  }

  test("IVF index survives a parquet save/load round-trip (query-equal)") {
    val d = sf("0.01")
    val emb = Tables.embeddings(spark, d)
    val built = graft.operators.IvfCosine.buildIndex(emb)
    val direct = graft.operators.IvfCosine
      .query(built, k = 5, anchorPred = col("vec_id") < 100)
      .collect().map(_.toString).sorted.toSeq
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf").toString
    graft.operators.IvfCosine.save(built, dir)
    val loaded = graft.operators.IvfCosine.load(spark, dir)
    val reloaded = graft.operators.IvfCosine
      .query(loaded, k = 5, anchorPred = col("vec_id") < 100)
      .collect().map(_.toString).sorted.toSeq
    assert(direct.nonEmpty && direct == reloaded)
  }

  test("centroid-pruned exact top-pairs is bitwise-equal to brute force") {
    graft.functions.GraftFunctions.register(spark)
    import graft.functions.GraftFunctions.dot
    val emb = Tables.embeddings(spark, sf("0.01"))
    val n = emb.select(col("vec_id"), col("embedding"),
      dot(col("embedding"), col("embedding")).as("nrm"))
    val a = n.select(col("vec_id").as("v1"), col("embedding").as("ea"), col("nrm").as("na"))
    val b = n.select(col("vec_id").as("v2"), col("embedding").as("eb"), col("nrm").as("nb"))
    val brute = a.join(b, col("v1") < col("v2"))
      .select(col("v1"), col("v2"),
        (dot(col("ea"), col("eb")) / (sqrt(col("na")) * sqrt(col("nb")))).as("sim"))
      .orderBy(col("sim").desc, col("v1"), col("v2")).limit(20)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val pruned = graft.operators.ExactPairsTopK.topPairs(emb, k = 20)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(pruned == brute) // includes bitwise sim equality
  }

  test("centroid pruning drops most cell pairs on a clustered corpus, exactly") {
    graft.functions.GraftFunctions.register(spark)
    import graft.functions.GraftFunctions.dot
    // planted corpus: 16 tight clusters of 12 vectors in R^16 — the shape
    // of a real near-dup-bearing embedding table. Deterministic PRNG.
    val rnd = new scala.util.Random(7)
    val centers = Array.fill(16)(Array.fill(16)(rnd.nextGaussian().toFloat))
    val rows = for (c <- 0 until 16; i <- 0 until 12) yield {
      val v = centers(c).map(x => x + 0.03f * rnd.nextGaussian().toFloat)
      (c * 12L + i, v.toSeq)
    }
    val emb = spark.createDataFrame(rows).toDF("vec_id", "embedding")
    val (res, surv, total) =
      graft.operators.ExactPairsTopK.topPairsWithStats(emb, k = 20, planes = 5)
    val n = emb.select(col("vec_id"), col("embedding"),
      dot(col("embedding"), col("embedding")).as("nrm"))
    val a = n.select(col("vec_id").as("v1"), col("embedding").as("ea"), col("nrm").as("na"))
    val b = n.select(col("vec_id").as("v2"), col("embedding").as("eb"), col("nrm").as("nb"))
    val brute = a.join(b, col("v1") < col("v2"))
      .select(col("v1"), col("v2"),
        (dot(col("ea"), col("eb")) / (sqrt(col("na")) * sqrt(col("nb")))).as("sim"))
      .orderBy(col("sim").desc, col("v1"), col("v2")).limit(20)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val pruned = res.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    info(s"surviving cell pairs: $surv of $total")
    assert(pruned == brute)
    assert(surv < total / 2, s"bound pruned nothing: $surv of $total survive")
  }

  test("binaryFile source ingests opaque payloads deterministically") {
    val out = SparkEntry.queries("cap_source_binaryfile")(spark, sf("0.001"))
    val rows = out.collect()
    assert(rows.length == 1 && rows(0).getLong(0) > 0)
    val again = SparkEntry.queries("cap_source_binaryfile")(spark, sf("0.001"))
      .collect()
    assert(rows.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }

  test("multimodal decode keeps schema, count, and determinism") {
    // Operator level: the typed array column is real…
    val op = graft.operators.Multimodal.decodeFeatures(
      graft.operators.Multimodal.attachBinary(
        Tables.documents(spark, sf("0.001"))), dims = 8)
    assert(op.schema("doc_id").dataType == LongType)
    assert(op.schema("features").dataType ==
      ArrayType(FloatType, containsNull = false))
    val opRows = op.collect()
    assert(opRows.length == Tables.documents(spark, sf("0.001")).count())
    // stub decode is deterministic: first feature = first utf-8 byte / 255
    val r0 = opRows.find(_.getLong(0) == 0L).get
    val text0 = Tables.documents(spark, sf("0.001"))
      .filter(col("doc_id") === 0).select("text").collect()(0).getString(0)
    assert(r0.getSeq[Float](r0.fieldIndex("features")).head ==
      (text0.getBytes("UTF-8")(0) & 0xff) / 255.0f)
    // …query level: the harness-facing frame is scalar-only.
    val out = SparkEntry.queries("cap_multimodal_decode")(spark, sf("0.001"))
    assert(out.schema("features_q").dataType == org.apache.spark.sql.types.StringType)
    assert(out.count() == opRows.length)
  }
}
