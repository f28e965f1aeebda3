package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, AttributeSet, Expression}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy}

/** Logical as-of join: for every left row, the single right row with the
  * greatest `rightTime` strictly before the left row's `leftTime` among
  * rows with equal keys. Emits the unchanged left output plus
  * `rightMirror` — fresh nullable attributes mirroring the matched right
  * row's columns (null when no right row qualifies; LEFT semantics).
  *
  * This is the whole-operator form of [[graft.operators.AsOfJoin]]'s
  * join+aggregate composition: one custom node, planned by
  * [[GraftStrategy]] into the single-pass partitioned merge
  * [[AsOfJoinExec]] — no pair blow-up, no re-aggregation, and the full
  * right payload rides along (the composition needs a second join for
  * that). Registered per session via GraftSqlBridge.addStrategy or
  * globally via `spark.sql.extensions=graft.GraftExtensions`.
  */
case class AsOfJoinNode(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    rightMirror: Seq[AttributeReference]) extends BinaryNode {

  require(rightMirror.length == right.output.length,
    "rightMirror must mirror right.output one-to-one")

  override def output: Seq[Attribute] = left.output ++ rightMirror

  override def producedAttributes: AttributeSet = AttributeSet(rightMirror)

  // Every left column and every right column is emitted/read, so none may
  // be pruned from the children.
  override def references: AttributeSet =
    AttributeSet(left.output) ++ AttributeSet(right.output) ++
      AttributeSet((leftKeys ++ rightKeys :+ leftTime :+ rightTime)
        .flatMap(_.references))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinNode =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsOfJoinNode]] into [[AsOfJoinExec]]. */
object GraftStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinNode(l, r, lk, rk, lt, rt, mirror) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, mirror) :: Nil
    case _ => Nil
  }
}
