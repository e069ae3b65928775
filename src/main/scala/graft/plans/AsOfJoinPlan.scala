package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}

/** The full custom-operator stack (SURVEY §4.3 path (c)): a dedicated
  * as-of join — logical node, planner strategy, physical merge operator.
  *
  * graft.operators.AsOf.asofJoin is the COMPOSED form (union + window);
  * this is the physical form a dedicated engine would run: both sides
  * hash-clustered on the key and sorted (key, ts), then a single
  * streaming two-pointer merge per partition emits each left row joined
  * to the most recent qualifying right row. Same exchange+sort lower
  * bound as the composition, but no union row-widening, no window
  * buffering — the merge is O(1) memory per key.
  *
  * Semantics: LEFT OUTER; `strict` excludes ties (right.ts < left.ts),
  * else right.ts <= left.ts. The held match among equal right (key, ts)
  * rows is the last in sort order, so determinism requires `rightTie`:
  * tiebreak expressions appended after rightTs in the right child's
  * required ordering (unique per (key, ts) group).
  */
case class AsOfJoinNode(
    left: LogicalPlan, right: LogicalPlan,
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTs: Expression, rightTs: Expression,
    strict: Boolean,
    rightTie: Seq[Expression] = Seq.empty) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      l: LogicalPlan, r: LogicalPlan): AsOfJoinNode = copy(left = l, right = r)
}

object AsOfStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinNode(l, r, lk, rk, lts, rts, strict, rTie) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lts, rts, strict, rTie) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTs: Expression, rightTs: Expression,
    strict: Boolean,
    rightTie: Seq[Expression] = Seq.empty) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTs).map(SortOrder(_, org.apache.spark.sql.catalyst.expressions.Ascending)),
    (rightKeys ++ (rightTs +: rightTie)).map(SortOrder(_, org.apache.spark.sql.catalyst.expressions.Ascending)))

  override protected def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val lk = leftKeys; val rk = rightKeys
    val lt = leftTs; val rt = rightTs
    val strictLocal = strict
    val rWidth = rOut.size

    val keyTypes = lk.map(_.dataType)

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val keyOrd = org.apache.spark.sql.catalyst.expressions.RowOrdering
        .createNaturalAscendingOrdering(keyTypes)
      val lKeyProj = UnsafeProjection.create(lk, lOut)
      val rKeyProj = UnsafeProjection.create(rk, rOut)
      val lTsProj = UnsafeProjection.create(Seq(lt), lOut)
      val rTsProj = UnsafeProjection.create(Seq(rt), rOut)
      val nullRight = new GenericInternalRow(rWidth)
      val joined = new JoinedRow

      // buffered right stream
      var rRow: InternalRow = null
      var rKey: InternalRow = null
      var rTsVal: Long = 0L
      def advanceRight(): Boolean = {
        if (rIter.hasNext) {
          rRow = rIter.next()
          rKey = rKeyProj(rRow).copy()
          rTsVal = rTsProj(rRow).getLong(0)
          true
        } else { rRow = null; false }
      }
      advanceRight()

      // most recent qualifying right row for the CURRENT left key
      var heldKey: InternalRow = null
      var held: InternalRow = null

      lIter.map { lRow =>
        val lKey = lKeyProj(lRow)
        val lTsVal = lTsProj(lRow).getLong(0)
        if (heldKey == null || keyOrd.compare(heldKey, lKey) != 0) {
          held = null; heldKey = lKey.copy()
        }
        // consume right rows with key < lKey (drop) or key == lKey and
        // ts qualifying (hold the latest)
        var continue = rRow != null
        while (continue) {
          val c = keyOrd.compare(rKey, lKey)
          if (c < 0) continue = advanceRight()
          else if (c == 0 && (if (strictLocal) rTsVal < lTsVal else rTsVal <= lTsVal)) {
            held = rRow.copy(); continue = advanceRight()
          } else continue = false
        }
        joined(lRow, if (held != null) held else nullRight)
      }
    }
  }

  override protected def withNewChildrenInternal(
      l: SparkPlan, r: SparkPlan): AsOfJoinExec = copy(left = l, right = r)
}
