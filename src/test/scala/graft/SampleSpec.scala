package graft

import org.apache.spark.sql.functions._

/** A-ES weighted-sampling gates: the distributed top-k must equal the
  * in-JVM reference computing the identical md5-uniform and priority on
  * the same rows (same JVM ⇒ same libm ⇒ exact equality, no tolerance),
  * and the sample must actually tilt toward heavy rows.
  */
class SampleSpec extends SparkSuite {

  private def md5u(id: Long): Double = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(id.toString.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 13), 16) / 4503599627370496.0
  }

  private lazy val docs: Seq[(Long, Long)] =
    graft.core.Tables.documents(spark, sf("0.001"))
      .select(col("doc_id"), col("n_chars"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq

  test("distributed A-ES top-100 == in-JVM reference (exact)") {
    val want = docs
      .map { case (id, w) => (id, math.log(md5u(id)) / w) }
      .sortBy { case (id, p) => (-p, id) }
      .take(100).map(_._1)
    val got = SparkEntry.queries("cap_sample_weighted")(spark, sf("0.001"))
      .collect().map(_.getLong(0)).toSeq
    assert(got == want)
  }

  test("the sample tilts toward heavy rows (weight = n_chars)") {
    val selected = SparkEntry.queries("cap_sample_weighted")(spark, sf("0.001"))
      .agg(avg(col("n_chars"))).collect().head.getDouble(0)
    val corpus = docs.map(_._2).sum.toDouble / docs.size
    assert(selected > corpus,
      s"selected avg n_chars $selected should exceed corpus avg $corpus")
  }

  test("priorities are deterministic across partitionings") {
    val a = SparkEntry.queries("cap_sample_weighted")(spark, sf("0.001"))
      .collect().map(_.toString).toSeq
    spark.conf.set("spark.sql.shuffle.partitions", "1")
    val b = try SparkEntry.queries("cap_sample_weighted")(spark, sf("0.001"))
      .collect().map(_.toString).toSeq
    finally spark.conf.set("spark.sql.shuffle.partitions", "4")
    assert(a == b)
  }
}
