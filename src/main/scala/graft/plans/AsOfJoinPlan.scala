package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Native sorted-merge AS-OF join — the custom-SparkPlan rung of the
  * extension ladder (SURVEY §7.3), taken because the compositional
  * form (union + last-value window, operators.AsOfJoin) has a
  * MEASURED structural overhead: it null-pads every left column
  * through the union, runs window state over |L|+|R| rows, and then
  * filters half of them back out. The merge exec consumes the two
  * sorted sides directly — per partition it is one linear scan with a
  * single one-row register per key (how DuckDB's ASOF JOIN and
  * Flink's temporal join execute).
  *
  * Plan shape: EnsureRequirements gives each side one hash exchange
  * on the key plus a per-partition sort — the SAME shuffle count as
  * the union form — but no union, no null-padding, no window
  * buffering, and the output is exactly |L| rows.
  *
  * Semantics (identical to operators.AsOfJoin, differentially tested):
  * latest right row with rTime <= lTime per key attached whole;
  * ties on (key, time) resolved to the greatest tiebreak; left rows
  * with no visible right row (or a NULL key) get nulls.
  */
case class AsOfJoinNode(
    leftKey: Attribute,
    rightKey: Attribute,
    leftTime: Attribute,
    rightTime: Attribute,
    rightTiebreak: Attribute,
    rightValues: Seq[Attribute],
    left: LogicalPlan,
    right: LogicalPlan) extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ rightValues.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinNode =
    copy(left = newLeft, right = newRight)
}

class AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case n: AsOfJoinNode =>
      AsOfJoinExec(n.leftKey, n.rightKey, n.leftTime, n.rightTime,
        n.rightTiebreak, n.rightValues, planLater(n.left), planLater(n.right)) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    leftKey: Attribute,
    rightKey: Attribute,
    leftTime: Attribute,
    rightTime: Attribute,
    rightTiebreak: Attribute,
    rightValues: Seq[Attribute],
    left: SparkPlan,
    right: SparkPlan) extends SparkPlan with BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ rightValues.map(_.withNullability(true))

  // both sides cluster on the key (co-partitioned like a sort-merge
  // join) ...
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  // ... and arrive (key, time[, tiebreak])-sorted, so the merge is a
  // single forward scan. Later rows at an equal (key, time) overwrite
  // the register => greatest tiebreak wins, deterministically.
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending),
      SortOrder(rightTiebreak, Ascending)))

  // left rows pass through in order, partitioned as delivered
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val keyDt = leftKey.dataType
    val timeDt = leftTime.dataType
    val lOut = left.output
    val rOut = right.output
    val lKeyExpr: Expression = leftKey
    val rKeyExpr: Expression = rightKey
    val lTimeExpr: Expression = leftTime
    val rTimeExpr: Expression = rightTime
    val rValueExprs: Seq[Expression] = rightValues
    val outAttrs = output
    val nValues = rightValues.length

    val rKeyIdx = rOut.indexWhere(_.exprId == rightKey.exprId)

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val ktProjL = UnsafeProjection.create(Seq(lKeyExpr, lTimeExpr), lOut)
      val ktProjR = UnsafeProjection.create(Seq(rKeyExpr, rTimeExpr), rOut)
      val keyProjL = UnsafeProjection.create(Seq(lKeyExpr), lOut)
      val keyProjR = UnsafeProjection.create(Seq(rKeyExpr), rOut)
      val valueProjR = UnsafeProjection.create(rValueExprs, rOut)
      // lexicographic (key, time): advancing while rKT <= lKT walks
      // right past smaller keys AND admits the tie at rTime == lTime
      val ktOrd = RowOrdering.createNaturalAscendingOrdering(Seq(keyDt, timeDt))
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(Seq(keyDt))
      val resultProj = UnsafeProjection.create(outAttrs, outAttrs)
      val joiner = new JoinedRow
      val nullValues = new GenericInternalRow(nValues)
      val rBuf = rIter.buffered

      var regKey: UnsafeRow = null // key of the registered right row
      var regVal: UnsafeRow = null // its projected value columns

      new Iterator[InternalRow] {
        override def hasNext: Boolean = lIter.hasNext
        override def next(): InternalRow = {
          val l = lIter.next()
          val lkt = ktProjL(l).copy() // survives the right-side scans below
          while (rBuf.hasNext && ktOrd.compare(ktProjR(rBuf.head), lkt) <= 0) {
            val r = rBuf.next()
            // a NULL right key can never match any left key
            if (!r.isNullAt(rKeyIdx)) {
              regKey = keyProjR(r).copy()
              regVal = valueProjR(r).copy()
            }
          }
          val lKeyRow = keyProjL(l)
          val attach =
            if (regVal != null && !lKeyRow.isNullAt(0) &&
              keyOrd.compare(regKey, lKeyRow) == 0) regVal
            else nullValues
          resultProj(joiner(l, attach))
        }
      }
    }
  }
}
