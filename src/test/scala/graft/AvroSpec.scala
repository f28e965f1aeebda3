package graft

import graft.sources.AvroSource
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Laws of the hand-rolled Avro container source/sink: full type-bridge
  * round-trip (nulls included), sync-marker split reads partitioning the
  * blocks exactly once, and loud rejection of unbridgeable types. */
class AvroSpec extends SparkSuite {

  private def freshDir(tag: String): String = {
    val p = java.nio.file.Files.createTempDirectory(s"avro_$tag")
    p.toFile.deleteOnExit()
    p.toString
  }

  test("every bridged type round-trips, including nulls, binary, " +
    "timestamps (micros) and arrays") {
    val schema = StructType(Seq(
      StructField("b", BooleanType), StructField("i", IntegerType),
      StructField("l", LongType), StructField("f", FloatType),
      StructField("d", DoubleType), StructField("s", StringType),
      StructField("bin", BinaryType), StructField("ts", TimestampType),
      StructField("al", ArrayType(LongType)),
      StructField("as", ArrayType(StringType))))
    val ts = java.sql.Timestamp.valueOf("2024-03-01 10:20:30.123456")
    val rows = Seq(
      Row(true, 1, 10L, 1.5f, 2.5, "x", Array[Byte](1, 2, 3), ts,
        Seq(1L, 2L), Seq("a", "b")),
      Row(false, -2, -20L, Float.NaN, Double.MinPositiveValue, "",
        Array.empty[Byte], ts, Seq.empty[Long], Seq("c")),
      Row(null, null, null, null, null, null, null, null, null, null))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
    val dir = freshDir("types")
    AvroSource.write(df, dir)
    val back = AvroSource.read(spark, dir)
    assert(back.schema == StructType(schema.map(_.copy(nullable = true))))
    def canon(r: Row): Seq[Any] = r.toSeq.map {
      case a: Array[Byte] => a.toSeq
      // scala == unboxes java.lang.Float/Double, so NaN != NaN; compare
      // bit patterns the way the engines do
      case f: java.lang.Float => java.lang.Float.floatToIntBits(f)
      case d: java.lang.Double => java.lang.Double.doubleToLongBits(d)
      case x => x
    }
    val a = df.collect().map(canon).toSet
    val b = back.collect().map(canon).toSet
    assert(b.map(_.take(7)) == a.map(_.take(7)), "non-temporal fields diverged")
    // timestamp survives at micros precision exactly
    val gotTs = back.collect().flatMap(r => Option(r.getAs[java.sql.Timestamp]("ts")))
    assert(gotTs.forall(_ == ts), s"timestamps diverged: ${gotTs.toSeq}")
    assert(b.map(_.drop(8)) == a.map(_.drop(8)), "array fields diverged")
  }

  test("split reads partition blocks exactly once: tiny splitBytes == " +
    "one-split read, with genuinely more tasks than files") {
    import spark.implicits._
    val df = (1L to 20000L).map(i => (i, s"payload-$i" * 3)).toDF("k", "v")
    val dir = freshDir("split")
    val nFiles = AvroSource.write(df.repartition(2), dir)
    assert(nFiles == 2L)
    val whole = AvroSource.read(spark, dir, splitBytes = 1L << 30)
    val split = AvroSource.read(spark, dir, splitBytes = 16L << 10)
    assert(split.rdd.getNumPartitions > whole.rdd.getNumPartitions,
      s"expected multi-split fan-out, got ${split.rdd.getNumPartitions}")
    assert(split.count() == 20000L, "split read lost or duplicated blocks")
    assert(split.agg(org.apache.spark.sql.functions.sum("k")).head.getLong(0)
      == 20000L * 20001L / 2)
    assert(whole.collect().map(_.getLong(0)).sorted.toSeq ==
      split.collect().map(_.getLong(0)).sorted.toSeq)
  }

  test("unbridgeable types are rejected at schema time, not mid-job") {
    import spark.implicits._
    val dec = Seq(BigDecimal(1)).toDF("d")
    intercept[IllegalArgumentException] {
      AvroSource.write(dec, freshDir("dec"))
    }
    val ats = StructType(Seq(StructField("a", ArrayType(TimestampType))))
    intercept[IllegalArgumentException] {
      AvroSource.toAvroSchema(ats)
    }
  }
}
