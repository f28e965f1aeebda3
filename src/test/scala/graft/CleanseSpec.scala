package graft

import graft.functions.{GraftFunctions, NormalizeText}
import graft.operators.SpanDedup
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** Cleansing operators: graft_normalize semantics (interpreted + codegen),
  * redaction regex behavior, and SpanDedup ground truth incl. the
  * hashed-vs-string key parity that backs q_dedup_span's oracle. */
class CleanseSpec extends SparkSuite {

  private def norm(s: String): String =
    NormalizeText.compute(UTF8String.fromString(s)).toString

  test("graft_normalize: accents stripped, casefolded, whitespace collapsed") {
    assert(norm("Café MÜNCHEN  straße") == "cafe munchen straße")
    assert(norm("  a\t\tB\nc  ") == "a b c")
    assert(norm("noël, naïve, élève") == "noel, naive, eleve")
    assert(norm("") == "")
    assert(norm(" \t\n ") == "")
  }

  test("graft_normalize: idempotent; non-Latin passthrough; VT is NOT ws (RE2 parity)") {
    val samples = Seq("Café  X", "already clean", "ÁÉÍ  Ç", "日本語 テスト x")
    samples.foreach(s => assert(norm(norm(s)) == norm(s), s))
    assert(norm("日本語 テスト") == "日本語 テスト")
    // RE2 \s excludes vertical tab — it must survive as a regular char,
    // exactly as the DuckDB oracle's regexp_replace leaves it.
    assert(norm("a\u000bb") == "a\u000bb")
  }

  test("graft_normalize: ASCII fast path allocates nothing when clean") {
    val in = UTF8String.fromString("already clean text")
    assert(NormalizeText.compute(in) eq in)
  }

  test("graft_normalize: codegen path equals interpreted compute()") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val rows = Seq("Café MÜNCHEN", "  a\tb ", "plain", "Ünïcödé  mix", null)
    val out = rows.toDF("s")
      .select(GraftFunctions.normalize(col("s")).as("n"))
      .collect().map(r => Option(r.getString(0)))
    val expect = rows.map(Option(_).map(norm))
    assert(out.toSeq == expect)
  }

  test("redaction regexes: counts and replacements on a hand corpus") {
    import spark.implicits._
    val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    val phone = "\\+1-555-[0-9]{4}"
    val df = Seq(
      "mail a@b.co and c.d+x@e.fg now",
      "call +1-555-0042 or +1-555-9999",
      "nothing here").toDF("s")
      .select(
        regexp_count(col("s"), lit(email)).as("ne"),
        regexp_count(col("s"), lit(phone)).as("np"),
        regexp_replace(regexp_replace(col("s"), email, "<EMAIL>"),
          phone, "<PHONE>").as("r"))
      .collect()
    assert(df(0).getInt(0) == 2 && df(0).getString(2) == "mail <EMAIL> and <EMAIL> now")
    assert(df(1).getInt(1) == 2 && df(1).getString(2) == "call <PHONE> or <PHONE>")
    assert(df(2).getInt(0) == 0 && df(2).getInt(1) == 0 && df(2).getString(2) == "nothing here")
  }

  test("SpanDedup: hand-computed coverage; within-doc repeats don't count") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d e f g h"),   // spans@p=1,3,5; shares "e f g h" with doc 2
      (2L, "x y e f g h q r"),
      (3L, "p p p p p p p p"),   // one span text, three positions, ONE doc
      (4L, "u v w")              // too short for w=4
    ).toDF("doc_id", "text")
    val got = SpanDedup.coverage(docs, w = 4, stride = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sortBy(_._1)
    assert(got.toSeq == Seq(
      (1L, 3L, 1L, 1.0 / 3),
      (2L, 3L, 1L, 1.0 / 3)))
  }

  test("PretrainPipeline: cleanse is idempotent and redaction is complete") {
    import graft.operators.PretrainPipeline
    val docs = graft.core.Tables.documents(spark, "/root/testdata/sf0.001")
      .withColumn("text", concat(col("text"),
        lit(" mail me: User"), col("doc_id").cast("string"),
        lit("@Example.COM or +1-555-0042  NOW")))
    val once = PretrainPipeline.cleanse(docs)
    // completeness: nothing matching either pattern survives
    val leftovers = once.select(
      sum(regexp_count(col("clean_text"), lit(PretrainPipeline.EmailRe))) +
        sum(regexp_count(col("clean_text"), lit(PretrainPipeline.PhoneRe))))
      .head().getLong(0)
    assert(leftovers == 0L, s"$leftovers PII matches survived redaction")
    // scrubbing actually happened (2 per doc injected)
    assert(once.agg(sum("n_scrubbed")).head().getLong(0) == 2 * docs.count())
    // idempotence: a second pass over clean_text changes nothing
    val twice = PretrainPipeline.cleanse(
      once.select(col("doc_id"), col("clean_text").as("text")))
    val diff = twice.filter(col("clean_text") =!= col("text")).count()
    assert(diff == 0L, s"cleanse not idempotent on $diff docs")
  }

  test("PretrainPipeline: retention funnel is monotone; span drop hits planted dups") {
    import spark.implicits._
    import graft.operators.PretrainPipeline
    val boiler = (1 to 20).map(i => s"tok$i").mkString(" ")
    val docs = (
      // two distinct docs sharing ALL their spans (pure boilerplate) …
      Seq((1L, boiler), (2L, boiler)) ++
        // … and clean unique docs that must survive every stage
        (10L to 19L).map(i => (i, (1 to 20).map(j => s"u${i}_$j").mkString(" ")))
      ).toDF("doc_id", "text")
    val r = PretrainPipeline.retention(docs)
      .collect().map(x => x.getString(0) -> (x.getLong(1), x.getLong(2))).toMap
    assert(r("1_raw")._1 == 12 && r("2_cleansed")._1 == 12)
    // C4-style rule: ALL docs at/above the dup threshold drop (keep-one
    // exact dedup is a separate upstream stage)
    assert(r("3_span_dedup")._1 == 10, s"span stage kept ${r("3_span_dedup")._1}")
    assert(r("4_quality")._1 == 10)
    val counts = Seq("1_raw", "2_cleansed", "3_span_dedup", "4_quality").map(r(_)._1)
    assert(counts == counts.sorted.reverse, s"funnel not monotone: $counts")
  }

  test("SpanDedup: hashed keys reproduce raw-text keys on the fixture") {
    val docs = graft.core.Tables.documents(spark, "/root/testdata/sf0.001")
    def rows(hashed: Boolean) =
      SpanDedup.coverage(docs, hashed = hashed)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val h = rows(hashed = true)
    assert(h.nonEmpty, "fixture has no span-level duplication — gate is vacuous")
    assert(h == rows(hashed = false))
  }
}
