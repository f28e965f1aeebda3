package graft

import graft.core.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.ArrayType

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

  test("MinHash-LSH prune: <2% candidates on a sparse corpus, full planted recall") {
    // The sf fixtures are near-dup-dense by construction (74% of all doc
    // pairs at sf0.01 have true J ≥ 0.5 — asserted below), so a full-recall
    // candidate set there is necessarily near-all-pairs. Prune quality must
    // therefore be proven on a SPARSE corpus — the realistic 100 TB shape:
    // disjoint vocabularies + planted near-dup pairs.
    import spark.implicits._
    val nDocs = 400
    val planted = (0 until 20).map(i => (i.toLong, (i + 200).toLong))
    val docs = (0 until nDocs).map { i =>
      val base =
        if (i >= 200 && i < 220)
          // near-dup of doc i-200: share 24 of its 30 tokens + 6 own → J = 24/36 ≈ 0.67
          (0 until 24).map(t => s"t${i - 200}_$t") ++ (24 until 30).map(t => s"t${i}_$t")
        else (0 until 30).map(t => s"t${i}_$t")
      (i.toLong, base.mkString(" "))
    }.toDF("doc_id", "text")
    val cands = graft.operators.MinHashDedup.candidatePairs(docs, minJaccard = 0.5)
      .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val allPairs = nDocs.toLong * (nDocs - 1) / 2
    assert(planted.forall(cands.contains),
      s"planted dups missed: ${planted.filterNot(cands.contains)}")
    assert(cands.size <= allPairs * 0.02,
      s"sparse-corpus candidate ratio ${cands.size.toDouble / allPairs} exceeds 2%")
  }

  test("fixture density: ≥70% of all pairs are true near-dups (J >= 0.5)") {
    // Documents (not an LSH property): the ground-truth reason the fixture
    // candidate ratio cannot be small. Corpus-wide exact Jaccard via the
    // inverted-index operator.
    val docs = Tables.documents(spark, sf("0.01"))
    val n = docs.count()
    val dense = graft.operators.InvertedJaccard.globalPairs(docs, 0.5).count()
    val ratio = dense.toDouble / (n * (n - 1) / 2)
    info(f"true J>=0.5 pair density at sf0.01: $ratio%.3f")
    assert(ratio >= 0.70)
  }

  test("embedding column survives a parquet round-trip intact") {
    val out = SparkEntry.queries("cap_embed_column")(spark, sf("0.001"))
    // Harness-facing frame is scalar-only; round-trip fidelity is proven
    // by the exact integer checksum over the re-read array.
    assert(!out.schema.exists(_.dataType.isInstanceOf[ArrayType]))
    val row = out.filter(col("doc_id") === 0).collect()(0)
    val orig = Tables.embeddings(spark, sf("0.001"))
      .filter(col("vec_id") === 0).collect()(0)
    val vec = orig.getSeq[Float](orig.fieldIndex("embedding"))
    val expected = vec.map(x => math.floor(x.toDouble * 1000000).toLong).sum
    assert(row.getAs[Int]("dim") == vec.length)
    assert(row.getAs[Long]("checksum") == expected)
  }

  test("diversity run-length stats equal the explode+groupBy brute force") {
    // q_text_diversity derives per-doc token counts from run lengths of
    // the SORTED token array (shuffle-free); the brute force shuffles
    // every token. Σc², max c, distinct count and N must agree exactly.
    val d = sf("0.001")
    val got = SparkEntry.queries("q_text_diversity")(spark, d)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    val brute = Tables.documents(spark, d)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .groupBy("doc_id", "w").agg(count(lit(1)).as("c"))
      .groupBy("doc_id")
      .agg(sum("c").as("n"), count(lit(1)).as("types"),
        max("c").as("top"), sum(col("c") * col("c")).as("sumsq"))
      .collect().map { r =>
        val n = r.getLong(1)
        r.getLong(0) -> (n, r.getLong(2), r.getLong(3),
          1.0 - r.getLong(4).toDouble / (n.toDouble * n.toDouble))
      }.toMap
    assert(got == brute)
  }

  test("funnel stages are non-increasing; retention day-0 equals cohort size") {
    val d = sf("0.001")
    val funnel = SparkEntry.queries("q_event_funnel")(spark, d)
      .orderBy("stage_idx").collect().map(_.getAs[Long]("users"))
    assert(funnel.length == 3)
    assert(funnel.sliding(2).forall(p => p(0) >= p(1)),
      s"funnel must narrow monotonically: ${funnel.mkString(",")}")
    // every user is active on their own cohort day, so Σ(day-0 counts)
    // across cohorts = total distinct users
    val ret = SparkEntry.queries("q_event_retention")(spark, d)
    val day0 = ret.filter(col("day_offset") === 0)
      .agg(sum("active_users")).collect()(0).getLong(0)
    val users = Tables.events(spark, d).select("user_id").distinct().count()
    assert(day0 == users, s"day-0 total $day0 != distinct users $users")
  }
}
