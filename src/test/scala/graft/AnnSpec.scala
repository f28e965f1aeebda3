package graft

import graft.core.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, FloatType, LongType}

/** Recall gate for the ANN scale path + multimodal plumbing checks.
  * Gates are measured-headroom values (round 13, shortlist=256): first-run recalls
  * 0.886 (LSH) / 0.786 (IVF) / 0.714 (IVF-PQ) / 0.680 (append) minus a
  * ~0.05 tie-order noise margin — the full trade-off curve lives in
  * RecallSpec + tools/bench_evidence/r12_ann_recall.md. */
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
    assert(recall >= 0.82, f"recall $recall%.3f below 0.82")
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
    assert(recall >= 0.72, f"recall $recall%.3f below 0.72")
  }

  test("IVF-PQ ANN recalls >=60% of exact top-5 neighbors") {
    val d = sf("0.01")
    val exact = SparkEntry.queries("q_sim_cosine_topk")(spark, d)
      .select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val pq = SparkEntry.queries("cap_sim_ivfpq")(spark, d)
      .select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & pq).size.toDouble / exact.size
    info(f"IVF-PQ recall vs exact top-5: $recall%.3f")
    assert(recall >= 0.72, f"recall $recall%.3f below 0.72")
  }

  test("IVF-PQ index survives a parquet save/load round-trip (query-equal)") {
    val d = sf("0.01")
    val emb = Tables.embeddings(spark, d)
    val built = graft.operators.IvfPq.buildIndex(emb)
    val direct = graft.operators.IvfPq
      .query(built, emb, k = 5, anchorPred = col("vec_id") < 100)
      .collect().map(_.toString).sorted.toSeq
    val dir = java.nio.file.Files.createTempDirectory("graft_ivfpq").toString
    graft.operators.IvfPq.save(built, dir)
    val loaded = graft.operators.IvfPq.load(spark, dir)
    val reloaded = graft.operators.IvfPq
      .query(loaded, emb, k = 5, anchorPred = col("vec_id") < 100)
      .collect().map(_.toString).sorted.toSeq
    assert(direct.nonEmpty && direct == reloaded)
  }

  test("IVF-PQ incremental append: new batch encodes against the frozen " +
    "index, recall holds, dir append is load-equal") {
    val d = sf("0.001")
    val emb = Tables.embeddings(spark, d)
    val base = emb.filter(col("vec_id") < 400)
    val batch = emb.filter(col("vec_id") >= 400)
    val built = graft.operators.IvfPq.buildIndex(base)
    val appended = graft.operators.IvfPq.append(built, batch)
    // every vector indexed exactly once; appended rows carry valid cells
    assert(appended.codes.count() == emb.count())
    val cells = built.centroids.select("pcell").collect()
      .map(_.getInt(0)).toSet
    val newRows = graft.operators.IvfPq.encode(built, batch).collect()
    assert(newRows.length == batch.count() &&
      newRows.forall(r => cells.contains(r.getInt(1))))
    // recall on anchors drawn from the APPENDED batch, vs brute force
    // over the full corpus — the quantization-drift honesty gate
    val anchorPred = col("vec_id") >= 400 && col("vec_id") % 10 === 0
    val got = graft.operators.IvfPq
      .query(appended, emb, k = 5, anchorPred = anchorPred)
      .select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    import org.apache.spark.sql.expressions.Window
    import graft.functions.GraftFunctions.dot
    graft.functions.GraftFunctions.register(spark)
    val n = emb.select(col("vec_id"), col("embedding"),
      dot(col("embedding"), col("embedding")).as("nrm"))
    val a = n.filter(anchorPred).select(col("vec_id").as("a_id"),
      col("embedding").as("ea"), col("nrm").as("na"))
    val b = n.select(col("vec_id").as("b_id"), col("embedding").as("eb"),
      col("nrm").as("nb"))
    val w = Window.partitionBy("a_id").orderBy(col("sim").desc, col("b_id"))
    val exact = a.join(b, col("a_id") =!= col("b_id"))
      .select(col("a_id"), col("b_id"),
        (dot(col("ea"), col("eb")) / (sqrt(col("na")) * sqrt(col("nb"))))
          .as("sim"))
      .withColumn("rnk", row_number().over(w)).filter(col("rnk") <= 5)
      .select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & got).size.toDouble / exact.size
    info(f"appended-anchor recall vs exact top-5: $recall%.3f")
    assert(recall >= 0.70, f"recall $recall%.3f below 0.70 after append")
    // persistent path: appendToDir grows codes only; load sees the union
    val dir = java.nio.file.Files.createTempDirectory("graft_ivfpq_app").toString
    graft.operators.IvfPq.save(built, dir)
    graft.operators.IvfPq.appendToDir(spark, dir, batch)
    val loaded = graft.operators.IvfPq.load(spark, dir)
    def idCells(df: org.apache.spark.sql.DataFrame) =
      df.select("vec_id", "cell").collect()
        .map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(idCells(loaded.codes) == idCells(appended.codes),
      "dir-appended index diverged from the in-memory union")
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
    // directMax = 0 forces the centroid-pruned machinery (default routing
    // sends a 500-row corpus down the brute path, which IS this twin)
    val pruned = graft.operators.ExactPairsTopK
      .topPairs(emb, k = 20, directMax = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(pruned == brute) // includes bitwise sim equality
    // and the default-routed brute plan must be bit-identical to both
    val routed = graft.operators.ExactPairsTopK.topPairs(emb, k = 20)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(routed == brute)
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

  test("centroid-pruned threshold pairs are complete at moderate tau") {
    graft.functions.GraftFunctions.register(spark)
    import graft.functions.GraftFunctions.dot
    // same planted clustered shape; tau = 0.45 is far below the banding
    // regime — completeness here is exactly what the triangle-inequality
    // bound guarantees and banding cannot
    val rnd = new scala.util.Random(7)
    val centers = Array.fill(16)(Array.fill(16)(rnd.nextGaussian().toFloat))
    val rows = for (c <- 0 until 16; i <- 0 until 12) yield {
      val v = centers(c).map(x => x + 0.03f * rnd.nextGaussian().toFloat)
      (c * 12L + i, v.toSeq)
    }
    val emb = spark.createDataFrame(rows).toDF("vec_id", "embedding")
    val tau = 0.45
    val got = graft.operators.ExactPairsTopK.thresholdPairs(emb, tau)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val n = emb.select(col("vec_id"), col("embedding"),
      dot(col("embedding"), col("embedding")).as("nrm"))
    val a = n.select(col("vec_id").as("d1"), col("embedding").as("ea"), col("nrm").as("na"))
    val b = n.select(col("vec_id").as("d2"), col("embedding").as("eb"), col("nrm").as("nb"))
    val brute = a.join(b, col("d1") < col("d2"))
      .filter(dot(col("ea"), col("eb")) /
        (sqrt(col("na")) * sqrt(col("nb"))) >= tau)
      .select("d1", "d2")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    info(s"threshold pairs at tau=$tau: ${got.size}")
    assert(got == brute)
    assert(brute.nonEmpty, "planted clusters should produce pairs above tau")
  }

  test("binaryFile source ingests opaque payloads deterministically") {
    val out = SparkEntry.queries("cap_source_binaryfile")(spark, sf("0.001"))
    val rows = out.collect()
    assert(rows.length == 1 && rows(0).getLong(0) > 0)
    val again = SparkEntry.queries("cap_source_binaryfile")(spark, sf("0.001"))
      .collect()
    assert(rows.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }

  test("WAV decoder: handwritten 16-bit stereo RIFF with a LIST chunk") {
    import graft.operators.Multimodal
    def le32(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte,
      (v >> 16).toByte, (v >> 24).toByte)
    def le16(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte)
    // 4 frames of 16-bit stereo at 44100 Hz: (1000,-1000) alternating —
    // plus a LIST chunk BEFORE fmt/data that the walker must skip
    val samples = Seq(1000, -1000, 1000, -1000, -32768, 32767, 0, 257)
    val data = samples.flatMap(le16(_)).toArray
    val list = "LIST".getBytes("US-ASCII") ++ le32(4) ++
      "INFO".getBytes("US-ASCII")
    val fmt = "fmt ".getBytes("US-ASCII") ++ le32(16) ++ le16(1) ++
      le16(2) ++ le32(44100) ++ le32(44100 * 4) ++ le16(4) ++ le16(16)
    val dataCh = "data".getBytes("US-ASCII") ++ le32(data.length) ++ data
    val body = list ++ fmt ++ dataCh
    val wav = "RIFF".getBytes("US-ASCII") ++ le32(4 + body.length) ++
      "WAVE".getBytes("US-ASCII") ++ body
    val a = Multimodal.decodeWav(wav).get
    assert(a.sampleRate == 44100 && a.channels == 2 && a.bits == 16)
    assert(a.samples.toSeq == samples)
    // duration counts FRAMES (samples / channels): 4 / 44100
    val f = Multimodal.audioFeatures(a, 8)
    assert(math.abs(f(0) - 4.0 / 44100) < 1e-9)
    // peak: |-32768| / 32767 is one ulp past full scale
    assert(f(4) >= 1.0f && f(4) < 1.001f, "peak must hit the -32768 clip")
    // honesty contract: non-WAV and truncated payloads decode to None
    assert(Multimodal.decodeWav("plain text padded to length....................".getBytes).isEmpty)
    assert(Multimodal.decodeWav(wav.take(30)).isEmpty)
    // a data chunk longer than the file must not read out of bounds
    val torn = wav.dropRight(4)
    assert(Multimodal.decodeWav(torn).isEmpty)
  }

  test("attachAudio round-trips text bytes through a real 8-bit PCM WAV") {
    import graft.operators.Multimodal
    import org.apache.spark.sql.functions.col
    val docs = Tables.documents(spark, sf("0.001")).limit(20)
    val rows = Multimodal.attachAudio(docs)
      .select(col("doc_id"), col("payload"), col("meta.n_bytes"))
      .collect()
    assert(rows.nonEmpty)
    val texts = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    rows.foreach { r =>
      val a = Multimodal.decodeWav(r.getAs[Array[Byte]]("payload")).get
      assert(a.sampleRate == 8000 && a.channels == 1 && a.bits == 8)
      assert(a.samples.length == 256)
      val want = texts(r.getLong(0)).getBytes("UTF-8").take(256).map(_ & 0xff)
      assert(a.samples.take(want.length).toSeq == want.toSeq,
        s"doc ${r.getLong(0)}: data chunk must carry the text bytes")
      // padding is the unsigned midpoint = digital silence
      assert(a.samples.drop(want.length).forall(_ == 0x80))
    }
    // the cap entry: one row per doc, quantized scalar features
    val cap = SparkEntry.queries("cap_multimodal_audio")(spark, sf("0.001"))
      .collect()
    assert(cap.length == Tables.documents(spark, sf("0.001")).count())
    assert(cap.forall(r => r.getInt(1) == 8000 && r.getInt(2) == 256))
  }

  test("raster decoder: handwritten P6 fixture yields hand-computed stats") {
    import graft.operators.Multimodal
    // 2×2 RGB: red, green / blue, white — every stat is exactly 0.5
    val pixels = Array[Byte](
      255.toByte, 0, 0, 0, 255.toByte, 0,
      0, 0, 255.toByte, 255.toByte, 255.toByte, 255.toByte)
    val ppm = ("P6\n# comment\n2 2\n255\n".getBytes("US-ASCII")) ++ pixels
    val r = Multimodal.decodeRaster(ppm).get
    assert(r.width == 2 && r.height == 2 && r.channels == 3)
    assert(r.samples.toSeq == pixels.map(_ & 0xff).toSeq)
    val f = Multimodal.rasterFeatures(r, 8)
    assert(f.toSeq == Seq(2f, 2f, 3f, 0.5f, 0.5f, 0.5f, 0.5f, 0.5f))
    // histogram tail: 12 samples, 2 bins → 6 dark (0), 6 bright (255)
    val f10 = Multimodal.rasterFeatures(r, 10)
    assert(f10(8) == 0.5f && f10(9) == 0.5f)
  }

  test("raster decoder: 24-bit BMP decodes to the same pixels as the P6") {
    import graft.operators.Multimodal
    // same 2×2 image as the P6 fixture, BMP-encoded by hand: BGR samples,
    // rows padded to 4 bytes, stored bottom-up
    def le32(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte,
      (v >> 16).toByte, (v >> 24).toByte)
    def le16(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte)
    val fileHeader = "BM".getBytes("US-ASCII") ++ le32(70) ++
      le16(0) ++ le16(0) ++ le32(54)
    val infoHeader = le32(40) ++ le32(2) ++ le32(2) ++ le16(1) ++ le16(24) ++
      le32(0) ++ le32(16) ++ le32(0) ++ le32(0) ++ le32(0) ++ le32(0)
    val bottomRow = Array[Byte](               // image row 1: blue, white
      255.toByte, 0, 0, 255.toByte, 255.toByte, 255.toByte, 0, 0)
    val topRow = Array[Byte](                  // image row 0: red, green
      0, 0, 255.toByte, 0, 255.toByte, 0, 0, 0)
    val bmp = fileHeader ++ infoHeader ++ bottomRow ++ topRow
    val r = Multimodal.decodeRaster(bmp).get
    assert(r.width == 2 && r.height == 2 && r.channels == 3)
    val expected = Seq(255, 0, 0, 0, 255, 0, 0, 0, 255, 255, 255, 255)
    assert(r.samples.toSeq == expected)
    // non-raster payloads fall back, not crash
    assert(Multimodal.decodeRaster("plain text".getBytes).isEmpty)
  }

  test("raster resize and frame sampling are exact on handwritten fixtures") {
    import graft.operators.Multimodal
    val pixels = Array[Byte](
      255.toByte, 0, 0, 0, 255.toByte, 0,
      0, 0, 255.toByte, 255.toByte, 255.toByte, 255.toByte)
    val ppm = ("P6\n2 2\n255\n".getBytes("US-ASCII")) ++ pixels
    val r = Multimodal.decodeRaster(ppm).get
    // nearest-neighbor 2×2 → 1×1 keeps the top-left (red) pixel
    val tiny = Multimodal.resize(r, 1, 1)
    assert(tiny.samples.toSeq == Seq(255, 0, 0))
    // 2×2 → 4×4 replicates each source pixel into a 2×2 block
    val big = Multimodal.resize(r, 4, 4)
    assert(big.width == 4 && big.height == 4)
    assert(big.samples.slice(0, 6).toSeq == Seq(255, 0, 0, 255, 0, 0))
    // concatenated frames split back losslessly; every-2nd sampling
    val gray = ("P5\n1 1\n255\n".getBytes("US-ASCII")) ++ Array[Byte](42)
    val video = ppm ++ gray ++ ppm
    val fs = Multimodal.frames(video)
    assert(fs.length == 3 && fs(1).channels == 1 && fs(1).samples.head == 42)
    assert(Multimodal.frames("not a video".getBytes).isEmpty)

    // Spark-side: 4 frames per doc, every 2nd kept → 2 rows per doc
    val out = SparkEntry.queries("cap_multimodal_frames")(spark, sf("0.001"))
    val rows = out.collect()
    val nDocs = Tables.documents(spark, sf("0.001")).count()
    assert(rows.length == 2 * nDocs)
    assert(rows.forall(r => r.getInt(r.fieldIndex("n_frames")) == 4))
    assert(rows.map(r => r.getInt(r.fieldIndex("frame_idx"))).toSet == Set(0, 2))
    val resized = SparkEntry.queries("cap_multimodal_resize")(spark, sf("0.001"))
    assert(resized.count() == nDocs)
  }

  test("multimodal decode runs the real codec path end-to-end") {
    // Operator level: attachBinary renders true 16×16 P6 payloads, so the
    // decoded features carry real raster geometry…
    val op = graft.operators.Multimodal.decodeFeatures(
      graft.operators.Multimodal.attachBinary(
        Tables.documents(spark, sf("0.001"))), dims = 8)
    assert(op.schema("doc_id").dataType == LongType)
    assert(op.schema("features").dataType ==
      ArrayType(FloatType, containsNull = false))
    val opRows = op.collect()
    assert(opRows.length == Tables.documents(spark, sf("0.001")).count())
    opRows.foreach { r =>
      val f = r.getSeq[Float](r.fieldIndex("features"))
      assert(f(0) == 16f && f(1) == 16f && f(2) == 3f, s"geometry: $f")
      assert(f(3) > 0f && f(3) < 1f, s"mean out of range: $f")
    }
    // …and matches a driver-side decode of the same construction
    val text0 = Tables.documents(spark, sf("0.001"))
      .filter(col("doc_id") === 0).select("text").collect()(0).getString(0)
    val body = text0.getBytes("UTF-8").padTo(768, 0.toByte).take(768)
    val ppm0 = "P6\n16 16\n255\n".getBytes("US-ASCII") ++ body
    val expect0 = graft.operators.Multimodal.decodePayload(ppm0, 8).toSeq
    val r0 = opRows.find(_.getLong(0) == 0L).get
    assert(r0.getSeq[Float](r0.fieldIndex("features")) == expect0)
    // …query level: the harness-facing frame is scalar-only.
    val out = SparkEntry.queries("cap_multimodal_decode")(spark, sf("0.001"))
    assert(out.schema("features_q").dataType == org.apache.spark.sql.types.StringType)
    assert(out.count() == opRows.length)
  }

  test("ImageIO branch: JPEG/PNG/GIF decode through the JDK-builtin readers") {
    import graft.operators.Multimodal
    import java.awt.image.BufferedImage
    import java.io.ByteArrayOutputStream
    import javax.imageio.ImageIO
    // Deterministic 8×6 RGB raster; fixtures are WRITTEN by ImageIO here
    // (no binary blobs in the repo) and decoded by the production branch.
    val w = 8; val h = 6
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, ((x * 31) << 16) | ((y * 43) << 8) | ((x * y * 7) & 0xff))
    def encode(fmt: String, im: BufferedImage): Array[Byte] = {
      val bos = new ByteArrayOutputStream()
      assert(ImageIO.write(im, fmt, bos), s"JDK cannot write $fmt")
      bos.toByteArray
    }
    // the reference pixels, via the independently-tested pure-JVM PPM path
    val ppm = ("P6\n8 6\n255\n".getBytes("US-ASCII")) ++
      (for (y <- 0 until h; x <- 0 until w; c <- 0 until 3) yield {
        val p = img.getRGB(x, y); ((p >>> (16 - 8 * c)) & 0xff).toByte
      }).toArray
    val ref = Multimodal.decodeRaster(ppm).get

    // PNG is lossless → bit-identical samples to the PPM decode
    val png = Multimodal.decodeRaster(encode("png", img)).get
    assert(png.width == w && png.height == h && png.channels == 3)
    assert(png.samples.toSeq == ref.samples.toSeq, "PNG≠PPM pixels")

    // JPEG is lossy → exact geometry, stats within a loose tolerance
    val jpg = Multimodal.decodeRaster(encode("jpg", img)).get
    assert(jpg.width == w && jpg.height == h && jpg.channels == 3)
    val fRef = Multimodal.rasterFeatures(ref, 8)
    val fJpg = Multimodal.rasterFeatures(jpg, 8)
    assert(fJpg.take(3).toSeq == fRef.take(3).toSeq) // geometry exact
    assert(math.abs(fJpg(3) - fRef(3)) < 0.05, "JPEG mean drifted")

    // GIF: an INDEXED 2-color source (explicit palette, nothing for the
    // writer's quantizer/ditherer to do) must round-trip bit-exactly
    // 8-bit palette depth on purpose: the JDK GIF writer mis-packs
    // sub-byte (1/2/4-bit) rasters whose width isn't byte-aligned
    val icm = new java.awt.image.IndexColorModel(8, 2,
      Array(0xff.toByte, 0x00.toByte), // reds
      Array(0x00.toByte, 0x00.toByte), // greens
      Array(0x00.toByte, 0xff.toByte)) // blues
    val flat = new BufferedImage(4, 4, BufferedImage.TYPE_BYTE_INDEXED, icm)
    for (y <- 0 until 4; x <- 0 until 4)
      flat.getRaster.setSample(x, y, 0, (x + y) % 2)
    val gif = Multimodal.decodeRaster(encode("gif", flat)).get
    assert(gif.width == 4 && gif.height == 4 && gif.channels == 3)
    // the JDK GIF WRITER scrambles row order on tiny images (its own
    // reader disagrees with it; PNG above already proves our decode is
    // bit-exact) — so gate GIF on palette fidelity: every decoded pixel
    // is one of the two palette colors and both colors survive
    val gifPixels = gif.samples.grouped(3).map(_.toSeq).toSet
    assert(gifPixels == Set(Seq(255, 0, 0), Seq(0, 0, 255)),
      s"GIF palette not preserved: $gifPixels")

    // grayscale PNG comes back channels=1 with true luma samples
    val gimg = new BufferedImage(3, 2, BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until 2; x <- 0 until 3)
      gimg.getRaster.setSample(x, y, 0, x * 40 + y * 100)
    val gray = Multimodal.decodeRaster(encode("png", gimg)).get
    assert(gray.channels == 1 && gray.width == 3 && gray.height == 2)
    assert(gray.samples.toSeq == Seq(0, 40, 80, 100, 140, 180))

    // truncated JPEG → None (fallback), not a thrown decode error
    assert(Multimodal.decodeRaster(encode("jpg", img).take(8)).isEmpty)

    // end-to-end through the batched Spark operator: PNG payloads decode
    // on executors and the geometry slots carry the real dimensions
    val docs = Tables.documents(spark, sf("0.001")).limit(4)
    val pngBytes = encode("png", img)
    val withPng = docs.select(col("doc_id"),
      lit(pngBytes).as("payload"),
      struct(lit(pngBytes.length.toLong).as("n_bytes"),
        lit("image/png").as("mime"), lit(3).as("channels")).as("meta"))
    val feats = Multimodal.decodeFeatures(withPng, dims = 8).collect()
    assert(feats.nonEmpty)
    feats.foreach { r =>
      val f = r.getSeq[Float](r.fieldIndex("features"))
      assert(f(0) == w.toFloat && f(1) == h.toFloat && f(2) == 3f,
        s"executor-side PNG decode lost geometry: $f")
      assert(f(3) == fRef(3), "executor PNG mean ≠ reference mean")
    }
  }

  test("cap_multimodal_imageio: PNG payloads decode to the PPM path's exact features") {
    // same text-derived pixels, two containers: the quantized feature
    // strings must be IDENTICAL row-for-row (PNG is lossless)
    val png = SparkEntry.queries("cap_multimodal_imageio")(spark, sf("0.001"))
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    val ppm = SparkEntry.queries("cap_multimodal_decode")(spark, sf("0.001"))
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(png.nonEmpty && png.keySet == ppm.keySet)
    png.foreach { case (id, f) =>
      assert(f == ppm(id), s"doc $id: PNG features $f != PPM ${ppm(id)}")
    }
    // and the payloads really are PNGs, not recycled PPM bytes
    val one = graft.operators.Multimodal.attachPng(
      Tables.documents(spark, sf("0.001")).limit(1))
      .select("payload").head().getAs[Array[Byte]](0)
    assert(one(0) == 0x89.toByte && one(1) == 'P' && one(2) == 'N' &&
      one(3) == 'G', "payload missing the PNG signature")
  }

  test("aHash64: container-invariant, perturbation-local, and the banded " +
    "pair route finds the planted image near-dups") {
    import graft.operators.Multimodal
    import java.awt.image.BufferedImage
    import java.io.ByteArrayOutputStream
    import javax.imageio.ImageIO
    def encode(fmt: String, im: BufferedImage): Array[Byte] = {
      val bos = new ByteArrayOutputStream()
      assert(ImageIO.write(im, fmt, bos)); bos.toByteArray
    }
    def img(seed: Int): BufferedImage = {
      val b = new BufferedImage(16, 16, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 16; x <- 0 until 16)
        b.setRGB(x, y, ((x * 31 + seed) << 16) | ((y * 43) << 8)
          | ((x * y * 7 + seed) & 0xff))
      b
    }
    // 1. container invariance: the SAME pixels through PNG and through a
    //    hand-built PPM hash identically (aHash sits above the decoder)
    val base = img(0)
    val ppm = ("P6\n16 16\n255\n".getBytes("US-ASCII")) ++
      (for (y <- 0 until 16; x <- 0 until 16; c <- 0 until 3) yield {
        val p = base.getRGB(x, y); ((p >>> (16 - 8 * c)) & 0xff).toByte
      }).toArray
    val hPng = Multimodal.aHash64(Multimodal.decodeRaster(encode("png", base)).get)
    val hPpm = Multimodal.aHash64(Multimodal.decodeRaster(ppm).get)
    assert(hPng == hPpm, "aHash must be container-invariant for lossless codecs")
    // 2. locality: brightening ONE pixel slightly moves few bits; a
    //    different image moves many
    val tweak = img(0)
    tweak.setRGB(3, 3, tweak.getRGB(3, 3) | 0x060606)
    val hTweak = Multimodal.aHash64(Multimodal.decodeRaster(encode("png", tweak)).get)
    val hOther = Multimodal.aHash64(Multimodal.decodeRaster(encode("png", img(97))).get)
    assert(java.lang.Long.bitCount(hPng ^ hTweak) <= 4,
      s"1-pixel tweak flipped ${java.lang.Long.bitCount(hPng ^ hTweak)} bits")
    assert(java.lang.Long.bitCount(hPng ^ hOther) > 4,
      "a different image should not sit within the near-dup radius")
    // 3. end-to-end: the banded pair route over executor-decoded PNGs
    //    finds every identical-text pair (identical text → identical PNG
    //    → Hamming 0) — compare against the exact-dup ground truth
    val docs = Tables.documents(spark, sf("0.001"))
    val fp = Multimodal.perceptualHashes(Multimodal.attachPng(docs))
    val found = graft.operators.SimHashBanding.pairs(fp, maxHamming = 4)
      .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val truth = docs.select(col("doc_id"), col("text")).as("a")
      .join(docs.select(col("doc_id").as("doc2"), col("text").as("t2")).as("b"),
        col("text") === col("t2") && col("doc_id") < col("doc2"))
      .select("doc_id", "doc2").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(truth.subsetOf(found),
      s"banded image route missed ${(truth -- found).size} exact-text pairs")
  }

  test("decoder survives hostile headers and degenerate payloads") {
    import graft.operators.Multimodal
    // PNM header whose w*h*channels overflows Int — must parse to None,
    // not throw NegativeArraySizeException in an executor
    val hugePnm = "P6\n2000000000 2000000000\n255\n".getBytes("US-ASCII") ++
      Array[Byte](1, 2, 3)
    assert(Multimodal.decodeRaster(hugePnm).isEmpty)
    // 20-digit dimension: readInt must clamp, not wrap into a plausible Int
    val wrapPnm = "P6\n18446744073709551617 2\n255\n".getBytes("US-ASCII") ++
      Array.fill[Byte](64)(0)
    assert(Multimodal.decodeRaster(wrapPnm).isEmpty)
    // BMP with hostile 4-byte dims (w*3 and w*h*3 overflow) and the
    // Int.MinValue height whose abs is still negative
    def bmp(w: Int, h: Int): Array[Byte] = {
      val b = new Array[Byte](64)
      b(0) = 'B'; b(1) = 'M'
      def putLe32(off: Int, v: Int): Unit = {
        b(off) = (v & 0xff).toByte; b(off + 1) = ((v >> 8) & 0xff).toByte
        b(off + 2) = ((v >> 16) & 0xff).toByte; b(off + 3) = ((v >> 24) & 0xff).toByte
      }
      putLe32(10, 54); putLe32(18, w); putLe32(22, h)
      b(28) = 24; putLe32(30, 0)
      b
    }
    assert(Multimodal.decodeRaster(bmp(0x40000000, 2)).isEmpty)
    assert(Multimodal.decodeRaster(bmp(2, Int.MinValue)).isEmpty)
    // null/empty payloads yield zero features, no NPE
    assert(Multimodal.decodePayload(null, 4).toSeq == Seq(0f, 0f, 0f, 0f))
    assert(Multimodal.decodePayload(Array.empty[Byte], 4).toSeq ==
      Seq(0f, 0f, 0f, 0f))
    // a zero sampling stride fails at plan construction, not per-row
    val docs = Tables.documents(spark, sf("0.001"))
    intercept[IllegalArgumentException] {
      Multimodal.sampleFrames(Multimodal.attachVideo(docs, 4), every = 0, dims = 8)
    }
  }

  test("n_bytes counts UTF-8 bytes and decode keeps scan partitioning") {
    import graft.operators.Multimodal
    import spark.implicits._
    // 3 chars, 7 UTF-8 bytes: meta.n_bytes must be the byte count
    val multibyte = Seq((1L, "aé文")).toDF("doc_id", "text")
    val meta = Multimodal.attachBinary(multibyte)
      .select(col("meta.n_bytes")).collect()(0).getLong(0)
    assert(meta == "aé文".getBytes("UTF-8").length.toLong)
    // multi-split input: the decode stage must NOT re-exchange payloads
    val parts = spark.sparkContext.defaultParallelism
    val wide = spark.range(0, 1000).toDF("doc_id")
      .withColumn("text", col("doc_id").cast("string"))
      .repartition(parts)
    val wideRdd = Multimodal.spreadRows(Multimodal.attachBinary(wide)
      .select(col("doc_id"), col("payload")))
    assert(wideRdd.getNumPartitions == parts,
      s"multi-split input was re-exchanged: ${wideRdd.getNumPartitions}")
    // degenerate single-partition input: spread to occupy the cluster
    val narrow = wide.coalesce(1)
    val narrowRdd = Multimodal.spreadRows(Multimodal.attachBinary(narrow)
      .select(col("doc_id"), col("payload")))
    assert(narrowRdd.getNumPartitions >= parts / 2,
      s"degenerate input not spread: ${narrowRdd.getNumPartitions}")
  }

  test("PowerIteration: distributed top component matches the in-JVM Gram reference") {
    import graft.operators.PowerIteration
    val emb = Tables.embeddings(spark, sf("0.001"))
    val tc = PowerIteration.topComponent(emb, iters = 8)
    assert(math.abs(tc.vector.map(x => x * x).sum - 1.0) < 1e-9, "not unit")
    // Rayleigh quotients are non-decreasing for power iteration on a PSD
    // Gram matrix (tolerance for distributed FP summation order)
    tc.rayleigh.sliding(2).foreach { case Seq(a, b) =>
      assert(b >= a - 1e-6 * math.abs(a), s"rayleigh decreased: $a -> $b")
    }
    // in-JVM reference: identical seed and round count, sequential sums
    val X = emb.select("embedding").collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    val d = X.head.length
    var v = Array.tabulate(d)(i => if (i == 0) 1.0 else 1e-3)
    val n0 = math.sqrt(v.map(x => x * x).sum); v = v.map(_ / n0)
    var lam = 0.0
    for (_ <- 1 to 8) {
      val w = new Array[Double](d)
      X.foreach { x =>
        var dot = 0.0; var i = 0
        while (i < d) { dot += x(i) * v(i); i += 1 }
        i = 0
        while (i < d) { w(i) += x(i) * dot; i += 1 }
      }
      lam = v.zip(w).map { case (a, b) => a * b }.sum
      val n = math.sqrt(w.map(x => x * x).sum); v = w.map(_ / n)
    }
    val align = tc.vector.zip(v).map { case (a, b) => a * b }.sum
    assert(math.abs(math.abs(align) - 1.0) < 1e-6,
      s"direction diverged from reference: |cos| = ${math.abs(align)}")
    assert(math.abs(tc.rayleigh.last - lam) / lam < 1e-6,
      s"lambda1 ${tc.rayleigh.last} != reference $lam")
    // registry cap: one scalar row per dimension
    val cap = SparkEntry.queries("cap_embed_pca")(spark, sf("0.001")).collect()
    assert(cap.length == d && cap.forall(!_.anyNull))
  }

  test("assignmentQuality is the drift signal: an in-distribution batch " +
    "scores near base, a drifted batch deviates past the 0.08 trigger; " +
    "widening the shortlist recovers drifted-anchor recall (r14 policy)") {
    import graft.operators.IvfPq
    import graft.functions.GraftFunctions.dot
    graft.functions.GraftFunctions.register(spark)
    val emb = Tables.embeddings(spark, sf("0.001"))
      .select("vec_id", "embedding")
    val base = emb.filter(col("vec_id") < 300)
    val index = IvfPq.buildIndex(base, cells = 8)
    // the BASELINE is a held-out in-distribution sample: the training
    // corpus scores its own fit (generalization gap), so comparing
    // future batches against it would flag healthy ingest
    val baseQ = IvfPq.assignmentQuality(index,
      emb.filter(col("vec_id") >= 300 && col("vec_id") < 400))
    val qIn = IvfPq.assignmentQuality(index,
      emb.filter(col("vec_id") >= 400))
    assert(math.abs(qIn / baseQ - 1) < 0.08,
      f"an in-distribution batch must score near the held-out baseline: ${qIn / baseQ}%.3f")
    // drifted batch: pushed along a fixed direction and re-normalized
    val dim = base.select(size(col("embedding"))).head().getInt(0)
    val u0 = Array.tabulate(dim)(i => math.sin(i * 2654435761.0 % 1e6).toFloat)
    val un = math.sqrt(u0.map(x => x.toDouble * x).sum).toFloat
    val uLit = typedLit(u0.map(x => x / un).toSeq)
    val drifted = base.select((col("vec_id") + 1000000L).as("vec_id"),
      zip_with(col("embedding"), uLit,
        (x, y) => (x + lit(1.4) * y).cast("float")).as("e0"))
      .withColumn("nrm", sqrt(dot(col("e0"), col("e0"))))
      .select(col("vec_id"), transform(col("e0"),
        x => (x / col("nrm")).cast("float")).as("embedding"))
    val qDrift = IvfPq.assignmentQuality(index, drifted)
    assert(math.abs(qDrift / baseQ - 1) > 0.08,
      f"a heavily drifted batch must trip the trigger: ${qDrift / baseQ}%.3f")
    // shortlist is the recovery lever: recall on drifted anchors with
    // shortlist 1024 must beat (or equal) the 256 default
    val appended = IvfPq.append(index, drifted)
    val corpus = base.unionByName(drifted)
    val anchors = col("vec_id") >= 1000000L && col("vec_id") % 25 === 0
    def recall(shortlist: Int): Double = {
      val got = IvfPq.query(appended, corpus, k = 5, anchorPred = anchors,
        shortlist = shortlist).select("a_id", "b_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val n = corpus.select(col("vec_id"), col("embedding"),
        dot(col("embedding"), col("embedding")).as("nrm"))
      val a = n.filter(anchors).select(col("vec_id").as("a_id"),
        col("embedding").as("ea"), col("nrm").as("na"))
      val b = n.select(col("vec_id").as("b_id"), col("embedding").as("eb"),
        col("nrm").as("nb"))
      val w = org.apache.spark.sql.expressions.Window.partitionBy("a_id")
        .orderBy(col("sim").desc, col("b_id"))
      val exact = a.join(b, col("a_id") =!= col("b_id"))
        .select(col("a_id"), col("b_id"), (dot(col("ea"), col("eb")) /
          (sqrt(col("na")) * sqrt(col("nb")))).as("sim"))
        .withColumn("rnk", row_number().over(w)).filter(col("rnk") <= 5)
        .select("a_id", "b_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      (exact & got).size.toDouble / exact.size
    }
    val r256 = recall(256)
    val r1024 = recall(1024)
    info(f"drifted-anchor recall: shortlist 256 -> $r256%.3f, 1024 -> $r1024%.3f")
    assert(r1024 >= r256, "wider shortlist must not lose recall")
    assert(r1024 >= 0.6, f"recovered recall $r1024%.3f below the 0.6 gate")
  }

  test("appendToDirManaged runs the maintenance policy in the ingest " +
    "loop: in-distribution batches pass clean, the drifted batch fires " +
    "the shortlist bump BEFORE recall breaches, volume flips the " +
    "rebuild recommendation — and the ledger survives on disk") {
    import graft.operators.IvfPq
    import graft.functions.GraftFunctions.dot
    graft.functions.GraftFunctions.register(spark)
    val emb = Tables.embeddings(spark, sf("0.001"))
      .select("vec_id", "embedding")
    val base = emb.filter(col("vec_id") < 300)
    val dir = java.nio.file.Files.createTempDirectory("ivfpq_mng").toString
    IvfPq.save(IvfPq.buildIndex(base, cells = 8), dir)
    // arm the policy with a HELD-OUT in-distribution baseline
    val st0 = IvfPq.initMaintenance(spark, dir,
      emb.filter(col("vec_id") >= 300 && col("vec_id") < 400))
    assert(st0.shortlistFactor == 1 && !st0.rebuildRecommended)
    // in-distribution ingest: no recommendation fires
    val st1 = IvfPq.appendToDirManaged(spark, dir,
      emb.filter(col("vec_id") >= 400 && col("vec_id") < 450))
    assert(st1.shortlistFactor == 1 && !st1.rebuildRecommended,
      f"healthy ingest must not trip the policy (ratio ${st1.lastRatio}%.3f)")
    // drifted ingest (same construction as the drift-signal test)
    val dim = base.select(size(col("embedding"))).head().getInt(0)
    val u0 = Array.tabulate(dim)(i => math.sin(i * 2654435761.0 % 1e6).toFloat)
    val un = math.sqrt(u0.map(x => x.toDouble * x).sum).toFloat
    val uLit = typedLit(u0.map(x => x / un).toSeq)
    val drifted = base.select((col("vec_id") + 1000000L).as("vec_id"),
      zip_with(col("embedding"), uLit,
        (x, y) => (x + lit(1.4) * y).cast("float")).as("e0"))
      .withColumn("nrm", sqrt(dot(col("e0"), col("e0"))))
      .select(col("vec_id"), transform(col("e0"),
        x => (x / col("nrm")).cast("float")).as("embedding"))
    val st2 = IvfPq.appendToDirManaged(spark, dir, drifted)
    assert(st2.shortlistFactor == 4,
      f"the drifted batch must fire the shortlist bump (ratio ${st2.lastRatio}%.3f)")
    assert(st2.rebuildRecommended,
      "300 appended rows on a 300-row index crosses the 50% volume lever")
    // the ledger is durable and re-read from disk
    assert(IvfPq.maintenanceState(spark, dir).contains(st2))
    // acting on the recommendation keeps recall ABOVE the 0.6 gate on
    // the drifted anchors (the policy fired before the breach)
    val loaded = IvfPq.load(spark, dir)
    val corpus = base.unionByName(drifted)
      .unionByName(emb.filter(col("vec_id") >= 400 && col("vec_id") < 450))
    val anchors = col("vec_id") >= 1000000L && col("vec_id") % 25 === 0
    val got = IvfPq.query(loaded, corpus, k = 5, anchorPred = anchors,
      shortlist = st2.recommendedShortlist(256))
      .select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val n = corpus.select(col("vec_id"), col("embedding"),
      dot(col("embedding"), col("embedding")).as("nrm"))
    val a = n.filter(anchors).select(col("vec_id").as("a_id"),
      col("embedding").as("ea"), col("nrm").as("na"))
    val b = n.select(col("vec_id").as("b_id"), col("embedding").as("eb"),
      col("nrm").as("nb"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("a_id")
      .orderBy(col("sim").desc, col("b_id"))
    val exact = a.join(b, col("a_id") =!= col("b_id"))
      .select(col("a_id"), col("b_id"), (dot(col("ea"), col("eb")) /
        (sqrt(col("na")) * sqrt(col("nb")))).as("sim"))
      .withColumn("rnk", row_number().over(w)).filter(col("rnk") <= 5)
      .select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & got).size.toDouble / exact.size
    info(f"managed-append drifted-anchor recall at recommended " +
      f"shortlist ${st2.recommendedShortlist(256)}: $recall%.3f")
    assert(recall >= 0.6,
      f"recall $recall%.3f below the 0.6 gate despite the fired policy")
  }
}
