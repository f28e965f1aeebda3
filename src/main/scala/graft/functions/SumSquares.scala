package graft.functions

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

/** Typed UDAF (SURVEY §2.11 q_udaf_l2): Σx² with an exact java.math
  * BigDecimal buffer. Decimal addition is associative/commutative, so the
  * partial+final merge is partition-order independent — the property that
  * makes a custom aggregate hash-safe at any parallelism (Appendix A).
  *
  * Per-row quantization mirrors Spark's double→DECIMAL(12,4) cast
  * (BigDecimal.valueOf = shortest-repr, then HALF_UP at scale 4) so the
  * result is bit-equal to SUM(CAST(x AS DECIMAL)*CAST(x AS DECIMAL)).
  */
object SumSquares extends Aggregator[Double, java.math.BigDecimal, java.math.BigDecimal] {
  private def q(x: Double): java.math.BigDecimal =
    java.math.BigDecimal.valueOf(x).setScale(4, java.math.RoundingMode.HALF_UP)

  def zero: java.math.BigDecimal = java.math.BigDecimal.ZERO
  def reduce(b: java.math.BigDecimal, x: Double): java.math.BigDecimal = {
    val d = q(x); b.add(d.multiply(d))
  }
  def merge(a: java.math.BigDecimal, b: java.math.BigDecimal): java.math.BigDecimal =
    a.add(b)
  def finish(b: java.math.BigDecimal): java.math.BigDecimal =
    b.setScale(4, java.math.RoundingMode.HALF_UP) // exact: true scale ≤ 4
  def bufferEncoder: Encoder[java.math.BigDecimal] = Encoders.DECIMAL
  def outputEncoder: Encoder[java.math.BigDecimal] = Encoders.DECIMAL
}
