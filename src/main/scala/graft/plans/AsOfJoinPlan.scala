package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, AttributeSet, Expression}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy}

/** Logical as-of join: for every left row, the greatest right `time`
  * strictly before the left row's time among rows with equal keys —
  * emitted as one extra column `asofAttr` on top of the unchanged left
  * output (LEFT semantics: unmatched rows get null).
  *
  * This is the whole-operator form of [[graft.operators.AsOfJoin]]'s
  * join+aggregate composition: one custom node, planned by
  * [[GraftStrategy]] into the single-pass partitioned merge
  * [[AsOfJoinExec]] — no pair blow-up, no re-aggregation. Registered per
  * session via GraftSqlBridge.addStrategy or globally via
  * `spark.sql.extensions=graft.GraftExtensions`.
  */
case class AsOfJoinNode(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    asofAttr: AttributeReference) extends BinaryNode {

  override def output: Seq[Attribute] = left.output :+ asofAttr

  override def producedAttributes: AttributeSet = AttributeSet(asofAttr)

  // Every left column is emitted, so none may be pruned from the child.
  override def references: AttributeSet =
    AttributeSet(left.output) ++
      AttributeSet((leftKeys ++ rightKeys :+ leftTime :+ rightTime)
        .flatMap(_.references))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinNode =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsOfJoinNode]] into [[AsOfJoinExec]]. */
object GraftStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinNode(l, r, lk, rk, lt, rt, attr) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, attr) :: Nil
    case _ => Nil
  }
}
