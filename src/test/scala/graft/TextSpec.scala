package graft

import graft.core.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, FloatType}

/** SURVEY §5.2.5: LSH recall vs the exact method + multimodal column. */
class TextSpec extends SparkSuite {

  test("MinHash-LSH candidates cover all exact J>=0.5 pairs (recall gate)") {
    val d = sf("0.01")
    val exact = SparkEntry.queries("q_text_jaccard_pairs")(spark, d)
      .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = graft.operators.MinHashDedup
      .candidatePairs(Tables.documents(spark, d), minJaccard = 0.5)
      .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val missed = exact -- lsh
    assert(missed.isEmpty, s"LSH missed ${missed.size} of ${exact.size} exact pairs")
  }

  test("embedding column survives a parquet round-trip intact") {
    val out = SparkEntry.queries("cap_embed_column")(spark, sf("0.001"))
    assert(out.schema("embedding").dataType
      .asInstanceOf[ArrayType].elementType == FloatType)
    val row = out.filter(col("doc_id") === 0).collect()(0)
    val orig = Tables.embeddings(spark, sf("0.001"))
      .filter(col("vec_id") === 0).collect()(0)
    assert(row.getSeq[Float](row.fieldIndex("embedding")) ==
      orig.getSeq[Float](orig.fieldIndex("embedding")))
  }
}
