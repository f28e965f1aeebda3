package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Rule-based data-quality audit: evaluate every rule in ONE pass over the
  * frame (a single map-side-combinable aggregate — adding a rule costs a
  * column, not a scan) and emit (rule, n_checked, n_violations) rows,
  * zero-violation rules included: an audit that only reports failures
  * cannot prove it ran. Cross-table rules (referential integrity, key
  * uniqueness) are joins, not row predicates — compose them around this
  * op the way q_quality_rules does.
  */
object QualityAudit {

  /** `rules` are (name, violation predicate) pairs; names must be unique. */
  def audit(df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty, "at least one rule")
    require(rules.map(_._1).distinct.size == rules.size, "duplicate rule names")
    val aggs = count(lit(1)).as("__n") +: rules.zipWithIndex.map {
      case ((_, p), i) => sum(when(p, 1L).otherwise(0L)).as(s"__v$i")
    }
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(rules.zipWithIndex.map { case ((n, _), i) =>
        struct(lit(n).as("rule"), col("__n").as("n_checked"),
          col(s"__v$i").as("n_violations"))
      }: _*)).as("r"))
      .select(col("r.rule").as("rule"), col("r.n_checked").as("n_checked"),
        col("r.n_violations").as("n_violations"))
  }
}
