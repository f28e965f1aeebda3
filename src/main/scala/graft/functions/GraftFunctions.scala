package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions.call_function

/** Session registration for graft's custom Catalyst expressions. */
object GraftFunctions {

  /** Idempotent: register graft_* functions in the session's registry. */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_dot", children => DotProduct(children(0), children(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_ngrams", children => CharNGrams(children(0), children(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_normalize", children => NormalizeText(children(0)), "built-in")
  }

  /** Codegen'd dot product; requires register(spark) in the session. */
  def dot(a: Column, b: Column): Column = call_function("graft_dot", a, b)

  /** Codegen'd character n-grams; requires register(spark) in the session. */
  def ngrams(s: Column, n: Int): Column =
    call_function("graft_ngrams", s, org.apache.spark.sql.functions.lit(n))

  /** Codegen'd Unicode canonicalizer (accent-strip + casefold + ws
    * collapse); requires register(spark) in the session. */
  def normalize(s: Column): Column = call_function("graft_normalize", s)
}
