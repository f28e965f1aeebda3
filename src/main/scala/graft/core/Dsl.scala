package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Cross-engine determinism helpers (SURVEY Appendix A).
  *
  * Numeric discipline, validated by live DuckDB 1.0.0 probes:
  *  - SUM/AVG over DOUBLE money columns is order-dependent FP → always cast
  *    to DECIMAL first (decimal addition is associative ⇒ partition-order
  *    independent, and exact in both engines).
  *  - DuckDB decimal÷anything returns DOUBLE, so ratios are defined as
  *    `CAST(exact-decimal AS DOUBLE) / count` on BOTH engines: identical
  *    IEEE-754 expression trees on identical operands are bit-identical.
  *  - `round()` on DOUBLE is NOT cross-engine safe (Spark rounds the
  *    shortest decimal repr via BigDecimal.valueOf; DuckDB rounds the
  *    binary value) → never round derived doubles; emit them raw.
  *  - Never cast a decimal down below its true scale (ties at the dropped
  *    digit round differently) — pick output scale ≥ true scale so casts
  *    only ever drop trailing zeros.
  */
object Dsl {
  /** Factor type for decimal products: small enough that a three-way
    * product stays under precision 38 in both engines. Money fixtures are
    * ≤ 7 integer digits with ≤ 2 true decimals (FIXTURES.md) — (12,4) is
    * lossless. */
  val DFac: DecimalType = DecimalType(12, 4)
  /** Accumulator/result type for plain sums. */
  val D18: DecimalType = DecimalType(18, 4)
  val D186: DecimalType = DecimalType(18, 6)

  def dec(c: Column): Column = c.cast(DFac)

  /** Dual-parsable hex→int over the first 6 hex digits of a lowercase
    * hex STRING column named `h` (e.g. a prior CTE's md5): positional
    * ascii arithmetic, because the engines' native converters don't
    * cross-parse (Spark `conv` / DuckDB `'0x'||` casts). 0 ≤ v < 16⁶ —
    * the seeded-uniform primitive for resampling oracles. The Spark
    * DataFrame side uses [[hex6]] (conv-based, same value). */
  def hex6Sql(h: String): String =
    (1 to 6).map { i =>
      s"(ascii(substr($h, $i, 1)) - CASE WHEN substr($h, $i, 1) >= 'a' " +
        s"THEN 87 ELSE 48 END) * ${1L << (4 * (6 - i))}"
    }.mkString("(", " + ", ")")

  /** DataFrame twin of [[hex6Sql]]. */
  def hex6(h: Column): Column =
    org.apache.spark.sql.functions.conv(
      org.apache.spark.sql.functions.substring(h, 1, 6), 16, 10).cast("long")

  /** Exact order-independent sum of a ≤2-decimal DOUBLE column, pinned to
    * DECIMAL(18,4) so the Spark and DuckDB output schemas agree. */
  def dsum(c: Column): Column = sum(c.cast(D18)).cast(D18)
  def dsumSql(x: String): String =
    s"CAST(SUM(CAST($x AS DECIMAL(18,4))) AS DECIMAL(18,4))"

  /** Exact mean as DOUBLE: exact decimal sum → double → ÷ count. The same
    * two IEEE ops run in DuckDB ⇒ bit-identical. */
  def davg(c: Column): Column =
    sum(c.cast(D18)).cast(D18).cast(DoubleType) / count(lit(1))
  def davgSql(x: String): String =
    s"CAST(CAST(SUM(CAST($x AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS DOUBLE) / COUNT(*)"

  /** DECIMAL→DOUBLE for values whose unscaled form may exceed 2^53: a plain
    * cast double-rounds differently in DuckDB (int128→fp÷10^s) vs the JVM
    * (correctly-rounded BigDecimal). Split |x| into an exact integer part
    * (< 2^53 ⇒ bit-exact long→double in both engines) plus an exact small
    * fraction, one shared IEEE add, then an exact ±1 multiply. The
    * sign-split matters: the fraction of a NEGATIVE value (c − floor(c) =
    * 1 − |frac|) is inexact in binary, and adding it to the inexact
    * integer part lands ~1 ulp off the correctly-rounded conversion
    * (caught by PropertySpec's 1000-random d2d == BigDecimal.doubleValue
    * guard — d2d(-0.0001) was -9.9999999999989e-5 in the unsplit form).
    * Requires true scale ≤ 4, |x| < 2^53·10⁻⁴.
    *
    * This is also the mandatory OUTPUT representation for every decimal
    * result: the driver's harness compares via pandas, where DuckDB
    * renders DECIMAL as float64 but Spark parquet reads back as Decimal
    * objects — equal values, different representations, guaranteed hash
    * mismatch. Internal arithmetic stays exact DECIMAL; only the final
    * select converts (guarded by OutputContractSpec). */
  private def d2dAbs(c: Column, fracType: DecimalType): Column = {
    val a = abs(c)
    val pos = floor(a).cast(LongType).cast(DoubleType) +
      (a - floor(a)).cast(fracType).cast(DoubleType)
    when(c < 0, lit(-1.0)).otherwise(lit(1.0)) * pos
  }
  private def d2dAbsSql(x: String, frac: String): String =
    s"((CASE WHEN ($x) < 0 THEN -1.0e0 ELSE 1.0e0 END) * " +
      s"(CAST(CAST(FLOOR(ABS($x)) AS BIGINT) AS DOUBLE) + " +
      s"CAST(CAST(ABS($x) - FLOOR(ABS($x)) AS $frac) AS DOUBLE)))"

  def d2d(c: Column): Column = d2dAbs(c, DecimalType(5, 4))
  def d2dSql(x: String): String = d2dAbsSql(x, "DECIMAL(5,4)")

  /** d2d for true scale ≤ 6 (e.g. the flagship's price·(1−disc)·(1+tax)
    * charge sums) — same split, fraction kept at DECIMAL(7,6). */
  def d2d6(c: Column): Column = d2dAbs(c, DecimalType(7, 6))
  def d2dSql6(x: String): String = d2dAbsSql(x, "DECIMAL(7,6)")

  /** d2d for true scale ≤ 8 (fourth powers of 2-decimal inputs —
    * q_agg_moments' Σx⁴). */
  def d2d8(c: Column): Column = d2dAbs(c, DecimalType(9, 8))
  def d2dSql8(x: String): String = d2dAbsSql(x, "DECIMAL(9,8)")
}
