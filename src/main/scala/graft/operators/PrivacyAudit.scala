package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Re-identification-risk primitives behind the governance queries
  * (q_privacy_kanon / q_privacy_ldiversity): group a table by its
  * quasi-identifier columns and measure group size k (k-anonymity) and
  * the sensitive-attribute diversity l within each group (l-diversity).
  * Banding/presentation stays with the caller — these return the
  * per-group frames the reports aggregate.
  *
  * Scale shape: ONE partial+final hash aggregate keyed by the QI tuple —
  * the output is domain-bounded (the QI value cross-product), not
  * row-bounded, so the reduce side is metadata whenever the QI domain
  * is. l rides the same exchange via Spark's two-phase COUNT(DISTINCT)
  * expand (≤ sensitive-domain × groups intermediate rows).
  */
object PrivacyAudit {

  /** Per-QI-group size: (qiCols..., k). */
  def groupSizes(df: DataFrame, qiCols: Seq[String]): DataFrame =
    df.groupBy(qiCols.map(col): _*).agg(count(lit(1)).as("k"))

  /** Per-QI-group size and sensitive diversity: (qiCols..., k, l).
    * Groups with l == 1 are homogeneous — k-anonymity alone does not
    * prevent attribute disclosure there. */
  def groupDiversity(df: DataFrame, qiCols: Seq[String],
      sensitive: String): DataFrame =
    df.groupBy(qiCols.map(col): _*)
      .agg(count(lit(1)).as("k"), countDistinct(col(sensitive)).as("l"))
}
