package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeReference, AttributeSet, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}

/** Single-pass partitioned-merge as-of join.
  *
  * Physical contract: both sides hash-clustered on the join keys (ONE
  * shuffle each — reused when inputs are already bucketed/pre-partitioned
  * on the keys) and sorted within partitions by (keys..., time). One
  * synchronized forward scan per partition then yields, for each left
  * row, the full right row with the greatest time strictly before the
  * left time among equal keys — O(|L|+|R|) per partition with O(1) state
  * (the last matching right row seen), versus the composition's
  * candidate-pair join + re-aggregation + payload re-join. This is the
  * shape that survives 100 TB: the dominant cost is the two key
  * shuffles, which any formulation needs.
  */
case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    rightMirror: Seq[AttributeReference]) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ rightMirror

  override def producedAttributes: AttributeSet = AttributeSet(rightMirror)

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending)),
    (rightKeys :+ rightTime).map(SortOrder(_, Ascending)))

  override def outputOrdering: Seq[SortOrder] =
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending))

  override protected def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val lk = leftKeys
    val rk = rightKeys
    val lt = leftTime
    val rt = rightTime
    val mirror = rightMirror
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lk, lOut)
      val rKeyProj = UnsafeProjection.create(rk, rOut)
      val lTimeProj = UnsafeProjection.create(Seq(lt), lOut)
      val rTimeProj = UnsafeProjection.create(Seq(rt), rOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(lk.map(_.dataType))
      val timeOrd = RowOrdering.createNaturalAscendingOrdering(Seq(lt.dataType))
      val resultProj = UnsafeProjection.create(lOut ++ mirror, lOut ++ mirror)
      val joiner = new JoinedRow
      val nullRight = new GenericInternalRow(rOut.length)

      // SQL join semantics for NULLs: a null key or null time never
      // matches anything (the composition's `l.key = r.key AND rt < lt`
      // predicate is false on NULL) — such right rows are skipped, such
      // left rows emit the null payload without consuming the right side.
      var rRow: InternalRow = null
      def advance(): Unit = {
        rRow = null
        var search = rIter.hasNext
        while (search) {
          val cand = rIter.next()
          if (!rKeyProj(cand).anyNull && !rTimeProj(cand).isNullAt(0)) {
            rRow = cand; search = false
          } else search = rIter.hasNext
        }
      }
      advance()
      // Last right row consumed with key equal to some left key — O(1)
      // merge state; copies because iterator/projection buffers are reused.
      var bestKey: InternalRow = null
      var bestRow: InternalRow = null

      lIter.map { l =>
        val lKey = lKeyProj(l)
        val lTimeRow = lTimeProj(l)
        if (lKey.anyNull || lTimeRow.isNullAt(0)) {
          resultProj(joiner(l, nullRight))
        } else {
          var cont = rRow != null
          while (cont) {
            val c = keyOrd.compare(rKeyProj(rRow), lKey)
            if (c < 0 || (c == 0 && timeOrd.compare(rTimeProj(rRow), lTimeRow) < 0)) {
              if (c == 0) {
                bestKey = rKeyProj(rRow).copy()
                bestRow = rRow.copy()
              }
              advance()
              cont = rRow != null
            } else cont = false
          }
          val matched = bestKey != null && keyOrd.compare(bestKey, lKey) == 0
          resultProj(joiner(l, if (matched) bestRow else nullRight))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}
