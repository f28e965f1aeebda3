package graft.operators

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.linalg.Vectors
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Shared product-quantization codec: per-subspace k-means codebooks
  * fitted once (driver model state, like KMeans clusterCenters), then
  * pure-codegen encode / distance expressions over DataFrame columns.
  *
  * Used by [[IvfPq]] (ADC against anchor floats) and by
  * [[SemanticDedup]]'s banded route (SDC between two code words, round-8:
  * band candidates shuffle 8-byte packed codes instead of full float
  * embeddings). Codes pack into ONE long — `bitsPerCode` = ⌈log2 ksub⌉
  * bits per subspace — so the candidate join payload is a single column.
  *
  * The quantization-error bound that keeps pruning exact lives here too:
  * for unit vectors a, b with codes qa, qb and residuals ra = |a − qa|,
  * rb = |b − qb|:
  *   |⟨a,b⟩ − ⟨qa,qb⟩| ≤ ra·|b| + rb·|qa| ≤ ra + rb + ra·rb
  * so `sdc + ra + rb + ra·rb ≥ tau` is a CONSERVATIVE candidate keep —
  * no pair that truly clears tau can be dropped (SemanticDedup re-ranks
  * survivors with exact floats). On clustered corpora residuals are
  * small and the bound prunes; on diffuse data it degrades to keeping
  * everything rather than dropping duplicates — the same honesty
  * contract as ExactPairsTopK's centroid bound.
  */
object PqCodec {

  /** Fitted codec: `m` codebooks of `ksub` centroids over `sub`-dim
    * subvectors. Pure driver metadata (a few KB). */
  final case class Codec(m: Int, ksub: Int, sub: Int,
                         books: Array[Array[Array[Float]]]) {
    val bitsPerCode: Int = math.max(1,
      32 - Integer.numberOfLeadingZeros(ksub - 1))
    require(m * bitsPerCode <= 63,
      s"$m codes x $bitsPerCode bits overflow a packed long")
    /** Whether [[sdcSim]] (SemanticDedup's SDC route) may be used: the SDC
      * table is an m·ksub² codegen literal, capped at 2¹⁶ doubles. NOT a
      * construction requirement (round-9 advice): ADC-only codecs — e.g.
      * IvfPq at m=4, ksub=256, which passes the packed-long guard but
      * whose 262144-double table would be unplannable — never build the
      * table and stay valid. The cap is enforced where the table
      * materializes ([[sdcFlat]]). */
    def sdcCapable: Boolean = m.toLong * ksub * ksub <= 65536
    /** Flat m×ksub×ksub SDC table: ⟨cw[mi][i], cw[mi][j]⟩. Forcing this
      * on an ADC-only-sized codec fails here, at the materialization
      * site, with the sizing rule in the message. */
    lazy val sdcFlat: Seq[Double] = {
      require(sdcCapable,
        s"SDC table $m x $ksub^2 = ${m.toLong * ksub * ksub} doubles " +
          "exceeds the 2^16 codegen-literal cap; use ADC (anchor floats) " +
          "or reduce m*ksub^2")
      for (mi <- 0 until m; i <- 0 until ksub; j <- 0 until ksub) yield
        books(mi)(i).zip(books(mi)(j)).map { case (x, y) =>
          x.toDouble * y.toDouble }.sum
    }
  }

  /** Per-subspace k-means over `vecCol` (an Array[Float] column of
    * uniform dimension divisible by `m`). Seeds are deterministic per
    * subspace — the IvfPq discipline, bit-stable across runs. */
  def fit(vectors: DataFrame, vecCol: String, m: Int, ksub: Int,
          seedBase: Long = 42L): Codec = {
    val dim = vectors.select(size(col(vecCol))).head().getInt(0)
    require(dim % m == 0, s"dim $dim not divisible by $m subspaces")
    val sub = dim / m
    val toVec = udf { (a: Seq[Float]) =>
      Vectors.dense(a.map(_.toDouble).toArray) }
    val books = (0 until m).map { mi =>
      val subDf = vectors.select(
        toVec(slice(col(vecCol), mi * sub + 1, sub)).as("sv"))
      new KMeans().setK(ksub).setSeed(seedBase + mi)
        .setFeaturesCol("sv").setPredictionCol("c")
        .fit(subDf).clusterCenters
        .map(_.toArray.map(_.toFloat))
    }.toArray
    Codec(m, ksub, sub, books)
  }

  /** Persist a fitted codec as parquet (m, code, cw) rows — the
    * [[IvfPq.save]] pattern: the codec is data, not driver state, so a
    * corpus pays its ~30 s codebook fit ONCE and every later
    * [[SemanticDedup.flags]] call (or another session) reloads it in
    * milliseconds. A few KB; coalesced to one file. */
  def save(c: Codec, dir: String): Unit = {
    val spark = org.apache.spark.sql.SparkSession.active
    val rows = for (mi <- 0 until c.m; k <- 0 until c.ksub)
      yield (mi, k, c.books(mi)(k).toSeq)
    spark.createDataFrame(rows).toDF("m", "code", "cw")
      .coalesce(1).write.mode("overwrite").parquet(dir)
  }

  /** Inverse of [[save]]; (m, ksub, sub) are recovered from the rows. */
  def load(spark: org.apache.spark.sql.SparkSession, dir: String): Codec =
    fromRows(spark.read.parquet(dir).select("m", "code", "cw").collect(), dir)

  /** Rebuild a codec from collected (m, code, cw) rows — the codebook
    * frame is bounded driver metadata (m·ksub rows ≈ a few KB), the same
    * class of collect as KMeans clusterCenters. Shared by [[load]] and
    * [[IvfPq.encode]]'s incremental ingest. */
  def fromRows(rows: Array[org.apache.spark.sql.Row], what: String): Codec = {
    require(rows.nonEmpty, s"no codec rows under $what")
    val dir = what
    val m = rows.map(_.getInt(0)).max + 1
    val ksub = rows.map(_.getInt(1)).max + 1
    // fail fast on a partially-written / foreign parquet dir (round-9
    // advice): a hole in the (m, code) grid or a ragged codeword length
    // would otherwise surface as an opaque NPE inside generated code
    require(rows.length == m * ksub,
      s"codec at $dir has ${rows.length} rows, expected $m x $ksub — " +
        "torn or foreign write; delete the dir to refit")
    val sub = rows.head.getSeq[Float](2).length
    require(rows.forall(_.getSeq[Float](2).length == sub),
      s"codec at $dir has ragged codeword lengths (expected $sub)")
    val books = Array.ofDim[Array[Float]](m, ksub)
    rows.foreach(r => books(r.getInt(0))(r.getInt(1)) =
      r.getSeq[Float](2).toArray)
    require(books.forall(_.forall(_ != null)),
      s"codec at $dir duplicates some (m, code) cell and misses another")
    Codec(m, ksub, sub, books.map(_.toArray))
  }

  /** Whether a saved codec exists under `dir` (committed write only —
    * keys off parquet's _SUCCESS marker, so a torn save refits). */
  def exists(spark: org.apache.spark.sql.SparkSession, dir: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(dir, "_SUCCESS")
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** (squared-distance, code) arg-min struct for one subspace against the
    * LITERAL codebook — array_min over codegen'd expressions, no UDF. */
  private def encodeStruct(c: Codec, mIdx: Int, vecCol: String): Column = {
    val subvec = slice(col(vecCol), mIdx * c.sub + 1, c.sub)
    val dists = c.books(mIdx).zipWithIndex.map { case (cw, code) =>
      val d2 = aggregate(
        zip_with(subvec, typedLit(cw.toSeq), (x, cwv) => {
          val diff = x.cast("double") - cwv.cast("double")
          diff * diff
        }),
        lit(0.0), (acc, x) => acc + x)
      struct(d2.as("d2"), lit(code).as("code"))
    }
    array_min(array(dists: _*))
  }

  /** Arg-min code id for one subspace ([[IvfPq]]'s per-element encode). */
  def codeCol(c: Codec, mIdx: Int, vecCol: String): Column =
    encodeStruct(c, mIdx, vecCol).getField("code")

  /** All `m` codes packed into one long: code_mi occupies bits
    * [mi·bitsPerCode, (mi+1)·bitsPerCode). */
  def packedCol(c: Codec, vecCol: String): Column =
    (0 until c.m).map { mi =>
      shiftleft(encodeStruct(c, mi, vecCol).getField("code")
        .cast("long"), mi * c.bitsPerCode)
    }.reduce(_ + _)

  /** Σ per-subspace min squared distance = |v − q(v)|² exactly. */
  def residual2Col(c: Codec, vecCol: String): Column =
    (0 until c.m).map(mi =>
      encodeStruct(c, mi, vecCol).getField("d2")).reduce(_ + _)

  private def unpack(c: Codec, packed: Column, mIdx: Int): Column =
    shiftright(packed, mIdx * c.bitsPerCode)
      .bitwiseAND(lit((1L << c.bitsPerCode) - 1))

  /** Symmetric distance computation: ⟨q(a), q(b)⟩ from two packed code
    * longs via the broadcast-literal SDC table — 8 lookups, no floats.
    * The table literal is shared codegen state; inputs should come from
    * a materialized (checkpointed) frame so the packed columns are plain
    * reads, not re-evaluated encode trees (HOF-CSE discipline). */
  def sdcSim(c: Codec, packedA: Column, packedB: Column): Column = {
    val flat = typedLit(c.sdcFlat)
    (0 until c.m).map { mi =>
      element_at(flat,
        (lit(mi * c.ksub * c.ksub) + unpack(c, packedA, mi) * c.ksub +
          unpack(c, packedB, mi) + 1).cast("int"))
    }.reduce(_ + _)
  }
}
