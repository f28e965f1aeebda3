package graft.sources


import scala.jdk.CollectionConverters._

import org.apache.avro.{Schema, SchemaBuilder, LogicalTypes}
import org.apache.avro.file.{DataFileReader, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.mapred.FsInput
import org.apache.avro.util.Utf8
import org.apache.hadoop.fs.Path

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Avro container-file source/sink built directly on the avro core jars
  * that SHIP with Spark (`avro-1.12.1.jar`, `avro-mapred-1.12.1.jar` for
  * [[FsInput]]) — the `spark-avro` DataSource connector jar does not, so
  * `.format("avro")` cannot load in this offline image and the format
  * was the one genuinely environment-blocked source left. This closes
  * it with the same public container-file protocol the connector uses.
  *
  * Scale shape — the parts that matter at 100 TB:
  *
  *   - '''Reads are BLOCK-SPLITTABLE''', not file-parallel-only: Avro
  *     container files carry a 16-byte sync marker between blocks, and
  *     [[DataFileReader]] exposes `sync(pos)` (seek to the first block
  *     after pos) + `pastSync(end)` — exactly the protocol
  *     avro-mapred's input format splits on. Each task claims a byte
  *     range `[start, end)` of one file and reads blocks whose sync
  *     precedes `end`, so one 10 GB file fans out across tasks instead
  *     of pinning one (the classic whole-file-reader bottleneck).
  *   - Writes are one container file per partition (append-friendly,
  *     deflate codec — JDK-builtin, no native lib dependence), schema
  *     derived once on the driver; the data path never touches the
  *     driver.
  *   - The row↔record bridge is RDD-level `mapPartitions` — the
  *     documented last-resort tier, justified here because this IS
  *     per-partition imperative IO (a third-party file protocol), the
  *     same tier the JDBC sink rides.
  *
  * Type bridge (both directions): BOOLEAN/INT/LONG/FLOAT/DOUBLE/STRING/
  * BINARY, TIMESTAMP ↔ long + `timestamp-micros` logical type, and
  * ARRAY of any supported element. Everything is written nullable
  * (union [null, T]) matching Spark's default; unsupported Catalyst
  * types throw at schema-derivation time, not mid-job.
  */
object AvroSource {

  /** Spark → Avro schema (record "row" in namespace "graft"). */
  def toAvroSchema(st: StructType): Schema = {
    val fields = SchemaBuilder.record("row").namespace("graft").fields()
    st.fields.foldLeft(fields) { (fs, f) =>
      fs.name(f.name).`type`(nullable(fieldSchema(f.dataType, f.name)))
        .withDefault(null)
    }.endRecord()
  }

  private def nullable(s: Schema): Schema =
    Schema.createUnion(java.util.List.of(Schema.create(Schema.Type.NULL), s))

  private def fieldSchema(dt: DataType, at: String): Schema = dt match {
    case BooleanType => Schema.create(Schema.Type.BOOLEAN)
    case IntegerType => Schema.create(Schema.Type.INT)
    case LongType => Schema.create(Schema.Type.LONG)
    case FloatType => Schema.create(Schema.Type.FLOAT)
    case DoubleType => Schema.create(Schema.Type.DOUBLE)
    case StringType => Schema.create(Schema.Type.STRING)
    case BinaryType => Schema.create(Schema.Type.BYTES)
    case TimestampType =>
      LogicalTypes.timestampMicros()
        .addToSchema(Schema.create(Schema.Type.LONG))
    case ArrayType(e, _) =>
      // timestamp elements would need per-element logical-type tracking
      // on the read bridge; exclude rather than silently round-trip as
      // longs
      require(e != TimestampType, s"avro bridge: array<timestamp> at $at")
      Schema.createArray(nullable(fieldSchema(e, s"$at[]")))
    case other =>
      throw new IllegalArgumentException(
        s"avro bridge: unsupported type $other at $at")
  }

  /** Avro → Spark schema (the inverse, for schema-on-read). */
  def toSparkSchema(s: Schema): StructType =
    StructType(s.getFields.asScala.toSeq.map { f =>
      StructField(f.name(), sparkType(unwrap(f.schema())), nullable = true)
    })

  private def unwrap(s: Schema): Schema =
    if (s.getType == Schema.Type.UNION)
      s.getTypes.asScala.find(_.getType != Schema.Type.NULL).getOrElse(s)
    else s

  private def sparkType(s: Schema): DataType = s.getType match {
    case Schema.Type.BOOLEAN => BooleanType
    case Schema.Type.INT => IntegerType
    case Schema.Type.LONG =>
      if (s.getLogicalType.isInstanceOf[LogicalTypes.TimestampMicros])
        TimestampType
      else LongType
    case Schema.Type.FLOAT => FloatType
    case Schema.Type.DOUBLE => DoubleType
    case Schema.Type.STRING => StringType
    case Schema.Type.BYTES => BinaryType
    case Schema.Type.ARRAY => ArrayType(sparkType(unwrap(s.getElementType)))
    case other =>
      throw new IllegalArgumentException(s"avro bridge: unsupported $other")
  }

  // ------------------------------------------------------------ write

  /** Write `df` as Avro container files under `dir` (one file per
    * partition, deflate-compressed). Returns the number of files
    * COMMITTED.
    *
    * Task-commit protocol — a failed-then-retried or speculative task
    * attempt must never corrupt or duplicate data: every attempt
    * writes to a dot-prefixed in-progress name (which [[read]] never
    * lists) and publishes by renaming onto the DETERMINISTIC final
    * name `part-<pid>.avro`. The first successful attempt wins the
    * rename; a later attempt finding the final name taken discards
    * its temp and reports 0. A crashed attempt leaves only dot-temp
    * litter that the retry overwrites and readers ignore. */
  def write(df: DataFrame, dir: String): Long = {
    val spark = df.sparkSession
    val st = df.schema
    val avroJson = toAvroSchema(st).toString // Schema is not serializable
    val hconf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    val micros = st.fields.map(_.dataType == TimestampType)
    val written = df.rdd.mapPartitionsWithIndex { (pid, it) =>
      if (it.isEmpty) Iterator.empty
      else {
        val schema = new Schema.Parser().parse(avroJson)
        val fin = new Path(dir, f"part-$pid%05d.avro")
        val tmp = new Path(dir, f".part-$pid%05d.avro.inprogress")
        val fs = fin.getFileSystem(hconf.value)
        val w = new DataFileWriter(new GenericDatumWriter[GenericRecord](schema))
        w.setCodec(org.apache.avro.file.CodecFactory.deflateCodec(6))
        w.create(schema, fs.create(tmp, true))
        try {
          it.foreach { row =>
            val rec = new GenericData.Record(schema)
            var i = 0
            while (i < row.length) {
              rec.put(i, toAvro(if (row.isNullAt(i)) null else row.get(i),
                micros(i)))
              i += 1
            }
            w.append(rec)
          }
        } finally w.close()
        val committed =
          if (fs.rename(tmp, fin)) 1L
          else {
            fs.delete(tmp, false)
            if (fs.exists(fin)) 0L // sibling attempt already published
            else throw new java.io.IOException(s"avro commit failed: $fin")
          }
        Iterator.single(committed)
      }
    }.fold(0L)(_ + _)
    written
  }

  private def toAvro(v: Any, micros: Boolean): Any = v match {
    case null => null
    case t: java.sql.Timestamp =>
      t.getTime * 1000L + (t.getNanos / 1000L) % 1000L
    case t: java.time.Instant =>
      t.getEpochSecond * 1000000L + t.getNano / 1000L
    case b: Array[Byte] => java.nio.ByteBuffer.wrap(b)
    case seq: scala.collection.Seq[_] =>
      seq.map(toAvro(_, micros)).asJava
    case other => other
  }

  // ------------------------------------------------------------- read

  /** Read every container file under `dir`, fanned out as BYTE-RANGE
    * splits of at most `splitBytes` each (sync-marker aligned — see the
    * class doc). The schema comes from one driver-side footer probe of
    * the first file. */
  def read(spark: SparkSession, dir: String,
      splitBytes: Long = 32L << 20): DataFrame = {
    require(splitBytes > 0, s"splitBytes must be positive: $splitBytes")
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = fs.listStatus(root).toSeq
      .filter(_.getPath.getName.endsWith(".avro"))
      .sortBy(_.getPath.getName)
    require(files.nonEmpty, s"no .avro files under $dir")

    val hconf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    val probe = new DataFileReader(
      new FsInput(files.head.getPath, hconf.value),
      new GenericDatumReader[GenericRecord]())
    val avroSchema = try probe.getSchema finally probe.close()
    val st = toSparkSchema(avroSchema)
    val avroJson = avroSchema.toString
    val isTs = st.fields.map(_.dataType == TimestampType)

    val splits = files.flatMap { f =>
      val n = math.max(1L, (f.getLen + splitBytes - 1) / splitBytes)
      (0L until n).map(i => (f.getPath.toString, i * splitBytes,
        math.min((i + 1) * splitBytes, f.getLen)))
    }
    val rows = spark.sparkContext
      .parallelize(splits, splits.size)
      .flatMap { case (file, start, end) =>
        val schema = new Schema.Parser().parse(avroJson)
        val r = new DataFileReader(
          new FsInput(new Path(file), hconf.value),
          new GenericDatumReader[GenericRecord](schema))
        // claim blocks whose sync marker lies in [start, end): after
        // sync(start) the reader sits on the first block PAST start, so
        // ranges partition the file's blocks exactly once across tasks
        // (the block containing byte `start` belongs to the PREVIOUS
        // range — the avro-mapred convention)
        r.sync(start)
        new Iterator[Row] {
          private var open = true
          def hasNext: Boolean = {
            val h = open && r.hasNext && !r.pastSync(end)
            if (!h && open) { r.close(); open = false }
            h
          }
          def next(): Row = {
            val rec = r.next()
            Row.fromSeq(st.fields.indices.map(i =>
              fromAvro(rec.get(i), isTs(i))))
          }
        }
      }
    spark.createDataFrame(rows, st)
  }

  private def fromAvro(v: Any, micros: Boolean): Any = v match {
    case null => null
    case u: Utf8 => u.toString
    case l: java.lang.Long if micros =>
      java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(
        Math.floorDiv(l.longValue(), 1000000L),
        Math.floorMod(l.longValue(), 1000000L) * 1000L))
    case bb: java.nio.ByteBuffer =>
      val a = new Array[Byte](bb.remaining()); bb.duplicate().get(a); a
    case arr: java.util.Collection[_] =>
      arr.asScala.toSeq.map(fromAvro(_, micros = false))
    case other => other
  }
}
