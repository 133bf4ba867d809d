package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Native point-in-time join — the one operator where composing built-ins
  * costs a real constant factor (the union+window formulation carries every
  * left row through `last(..., ignoreNulls)` state), so it is ALSO
  * implemented as a first-class Catalyst operator: a logical node, a
  * planner strategy (injected by [[graft.GraftExtensions]]), and a
  * sorted-merge physical exec.
  *
  * Physical contract: both children hash-clustered on the join keys
  * (`ClusteredDistribution` pair — EnsureRequirements co-partitions them)
  * and sorted by (keys…, time). Execution is a single forward merge per
  * partition: the right iterator advances while its (key, time) ≤ the
  * current left row's, remembering the latest same-key values — O(|L|+|R|)
  * per partition, zero buffering beyond one row, identical semantics to
  * [[graft.ops.AsofJoin.asofBackward]] (inclusive backward as-of), which
  * AsofNativeSpec pins by equivalence on random data.
  */
final case class AsofJoinNode(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Attribute],
    rightKeys: Seq[Attribute],
    leftTime: Attribute,
    rightTime: Attribute,
    rightVals: Seq[Attribute]) extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ rightVals.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsofJoinNode =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsofJoinNode]] into [[AsofJoinExec]]. */
object AsofJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsofJoinNode(l, r, lk, rk, lt, rt, rv) =>
      AsofJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, rv) :: Nil
    case _ => Nil
  }
}

final case class AsofJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKeys: Seq[Attribute],
    rightKeys: Seq[Attribute],
    leftTime: Attribute,
    rightTime: Attribute,
    rightVals: Seq[Attribute]) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ rightVals.map(_.withNullability(true))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending)),
    (rightKeys :+ rightTime).map(SortOrder(_, Ascending)))

  override def outputOrdering: Seq[SortOrder] =
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending))

  override protected def doExecute(): RDD[InternalRow] = {
    val keyTypes = leftKeys.map(_.dataType)
    val ktTypes = keyTypes :+ leftTime.dataType
    val outAttrs = output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lktProj = UnsafeProjection.create(leftKeys :+ leftTime, left.output)
      val rktProj = UnsafeProjection.create(rightKeys :+ rightTime, right.output)
      val lkProj = UnsafeProjection.create(leftKeys, left.output)
      val rkProj = UnsafeProjection.create(rightKeys, right.output)
      val valsProj = UnsafeProjection.create(rightVals, right.output)
      val outProj = UnsafeProjection.create(outAttrs, outAttrs)
      val ktOrd = RowOrdering.createNaturalAscendingOrdering(ktTypes)
      val kOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      val nullVals = new GenericInternalRow(rightVals.length)
      val joined = new JoinedRow
      val rBuf = rIter.buffered
      var lastKey: InternalRow = null
      var lastVals: InternalRow = null
      lIter.map { lrow =>
        val lkt = lktProj(lrow)
        while (rBuf.hasNext && ktOrd.compare(rktProj(rBuf.head), lkt) <= 0) {
          val r = rBuf.next()
          lastKey = rkProj(r).copy()
          lastVals = valsProj(r).copy()
        }
        val lk = lkProj(lrow)
        val vals =
          if (lastKey != null && kOrd.compare(lastKey, lk) == 0) lastVals
          else nullVals
        outProj(joined(lrow, vals))
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsofJoinExec =
    copy(left = newLeft, right = newRight)
}
