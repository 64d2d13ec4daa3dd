package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}
import org.apache.spark.sql.execution.SparkStrategy

/** Native AS-OF join — the whole-operator extension point exercised end to
  * end: a custom [[LogicalPlan]] node, a [[Strategy]] that plans it, and a
  * [[SparkPlan]] that executes it, registered through
  * [[GraftExtensions]]. Each left row matches the LAST right row of the
  * same key with rightTime <= leftTime (left-outer: no candidate → right
  * columns null).
  *
  * Execution shape (the one that survives 100 TB): both children are
  * hash-CO-PARTITIONED on the key (requiredChildDistribution) and sorted
  * by (key, time) (requiredChildOrdering) — Catalyst's EnsureRequirements
  * inserts the exchanges/sorts exactly as it does for a sort-merge join —
  * then ONE forward merge pass per partition. No inequality join, no
  * per-probe scan, O(|L| + |R|) per partition, and the right candidate is
  * a single buffered row at a time, so memory stays constant regardless
  * of history length.
  *
  * Keys and times must be LongType on both sides (the wrapper projects
  * user ids and unix_micros — at the engine level any orderable key can
  * be mapped to longs first).
  */
case class AsOfJoin(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: Expression, leftTime: Expression,
    rightKey: Expression, rightTime: Expression) extends BinaryNode {
  // Fail at plan construction, not silently at runtime: a non-long key
  // would unbox garbage in the merge loop. (Null VALUES are handled by the
  // exec — a null key/time never matches, SQL equality semantics.)
  for ((e, role) <- Seq(leftKey -> "leftKey", leftTime -> "leftTime",
      rightKey -> "rightKey", rightTime -> "rightTime"))
    require(e.dataType == org.apache.spark.sql.types.LongType,
      s"AsOfJoin $role must be LongType, got ${e.dataType} — map orderable keys to longs first")
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoin =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoin(l, r, lk, lt, rk, rt) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, lt, rk, rt) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftKey: Expression, leftTime: Expression,
    rightKey: Expression, rightTime: Expression) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  // co-partition both sides on the join key (EnsureRequirements makes the
  // two hash partitionings compatible, as for SMJ)
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  // per-partition (key, time) sort on both sides
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override protected def doExecute(): RDD[InternalRow] = {
    val lk = BindReferences.bindReference(leftKey, left.output)
    val lt = BindReferences.bindReference(leftTime, left.output)
    val rk = BindReferences.bindReference(rightKey, right.output)
    val rt = BindReferences.bindReference(rightTime, right.output)
    val rightWidth = right.output.length
    val outAttrs = output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val rBuf = rIter.buffered
      val nullRight = new GenericInternalRow(rightWidth)
      val joined = new JoinedRow()
      val toUnsafe = UnsafeProjection.create(outAttrs.map(_.dataType).toArray)
      var lastRight: InternalRow = null
      var lastRightKey: Long = 0L
      lIter.map { l =>
        val keyB = lk.eval(l)
        val timeB = lt.eval(l)
        if (keyB == null || timeB == null) {
          // SQL equality semantics: a null key/time matches nothing.
          // Nulls sort first, so not advancing rBuf here is safe.
          toUnsafe(joined(l, nullRight))
        } else {
          val key = keyB.asInstanceOf[Long]
          val time = timeB.asInstanceOf[Long]
          var advance = true
          while (advance && rBuf.hasNext) {
            val h = rBuf.head
            val hkB = rk.eval(h)
            if (hkB == null) rBuf.next() // null-key build rows: never candidates
            else {
              val hk = hkB.asInstanceOf[Long]
              if (hk < key) {
                // stale earlier-key row: remember (filtered by key at match)
                lastRight = h.copy(); lastRightKey = hk; rBuf.next()
              } else if (hk == key) {
                val htB = rt.eval(h)
                if (htB == null) rBuf.next() // null-time: never a candidate
                else if (htB.asInstanceOf[Long] <= time) {
                  lastRight = h.copy(); lastRightKey = hk; rBuf.next()
                } else advance = false
              } else advance = false
            }
          }
          val matched = lastRight != null && lastRightKey == key &&
            rt.eval(lastRight).asInstanceOf[Long] <= time
          toUnsafe(joined(l, if (matched) lastRight else nullRight))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}
