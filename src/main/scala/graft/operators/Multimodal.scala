package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** Multimodal-column plumbing (SURVEY §2.9 / BASELINE.json "multimodal
  * columns"): opaque binary payloads + typed metadata, decoded per
  * partition in batches.
  *
  * The actual codec step is a clearly-marked STUB — this container ships
  * no image/audio libraries — but everything Spark-side is real: the
  * binary column schema, the metadata struct, the repartitioning, and the
  * mapPartitions batch shape (the Scala twin of Python's mapInPandas: one
  * iterator of rows per partition, features emitted columnar-ready). A
  * real deployment swaps `stubDecode` for a JNI/ONNX call with the same
  * signature.
  */
object Multimodal {

  /** Attach an opaque binary payload + metadata struct. The fixture has no
    * true media blobs, so the utf-8 text bytes stand in as the payload —
    * the schema and IO path are what matters. */
  def attachBinary(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(
        length(col("text")).cast("long").as("n_bytes"),
        lit("application/octet-stream").as("mime"),
        (col("doc_id") % 4 + 1).cast("int").as("channels")).as("meta"))

  /** STUB decoder: deterministic fake features from the first bytes of the
    * payload. ??? -> replace with the real codec (e.g. JNI image decode +
    * model forward) keeping this exact batch shape. */
  private def stubDecode(payload: Array[Byte], dims: Int): Array[Float] = {
    val out = new Array[Float](dims)
    var i = 0
    while (i < dims) {
      out(i) = if (i < payload.length) (payload(i) & 0xff) / 255.0f else 0.0f
      i += 1
    }
    out
  }

  /** Per-partition batched feature extraction over the binary column. */
  def decodeFeatures(withBinary: DataFrame, dims: Int): DataFrame = {
    val spark = withBinary.sparkSession
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("n_bytes", LongType),
      StructField("features", ArrayType(FloatType, containsNull = false))))
    val parts = spark.sparkContext.defaultParallelism
    val rdd = withBinary.select(col("doc_id"), col("payload"), col("meta.n_bytes"))
      .repartition(parts)
      .rdd.mapPartitions { it =>
        // batch shape: whole-partition iterator, rows processed in order —
        // a real decoder would buffer N payloads and run a vectorized call
        it.map { r =>
          val feats = stubDecode(r.getAs[Array[Byte]]("payload"), dims)
          Row(r.getLong(0), r.getLong(2), feats.toSeq)
        }
      }
    spark.createDataFrame(rdd, schema).orderBy("doc_id")
  }
}
