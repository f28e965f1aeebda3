package graft

import graft.functions.GraftFunctions
import org.apache.spark.sql.functions._

/** graft_ngrams (codegen'd char n-grams) — semantics + hot-path guarantees. */
class NGramsSpec extends SparkSuite {

  test("graft_ngrams(text, 3) == substring-per-index builtin form (sf0.001 corpus)") {
    GraftFunctions.register(spark)
    val docs = graft.core.Tables.documents(spark, sf("0.001"))
    val mismatch = docs.select(
        GraftFunctions.ngrams(col("text"), 3).as("fast"),
        expr("transform(sequence(1, length(text) - 2), i -> substring(text, i, 3))").as("slow"))
      .filter(col("fast") =!= col("slow"))
      .count()
    assert(mismatch == 0)
  }

  test("multi-byte code points slice on character boundaries") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val got = Seq("añoß€x").toDF("t")
      .select(GraftFunctions.ngrams(col("t"), 3).as("g"))
      .as[Seq[String]].head()
    assert(got == Seq("año", "ñoß", "oß€", "ß€x"))
  }

  test("edge cases: short strings, n=1, empty") {
    GraftFunctions.register(spark)
    import spark.implicits._
    def ngrams(s: String, n: Int): Seq[String] =
      Seq(s).toDF("t").select(GraftFunctions.ngrams(col("t"), n).as("g"))
        .as[Seq[String]].head()
    assert(ngrams("ab", 3).isEmpty)
    assert(ngrams("", 3).isEmpty)
    assert(ngrams("abc", 3) == Seq("abc"))
    assert(ngrams("abc", 1) == Seq("a", "b", "c"))
    assert(ngrams("abcd", 2) == Seq("ab", "bc", "cd"))
  }

  test("stays inside WholeStageCodegen (no interpreted fallback marker)") {
    GraftFunctions.register(spark)
    val docs = graft.core.Tables.documents(spark, sf("0.001"))
    val plan = docs.select(explode(GraftFunctions.ngrams(col("text"), 3)))
      .queryExecution.executedPlan.toString
    // `*(n)` is executedPlan.toString's whole-stage-codegen stage marker
    assert(plan.contains("*(1) Generate explode(graft_ngrams"))
  }
}
