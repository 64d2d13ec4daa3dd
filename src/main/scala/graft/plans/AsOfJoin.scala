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
    val lkt = Seq(BindReferences.bindReference(leftKey, left.output),
      BindReferences.bindReference(leftTime, left.output))
    val rkt = Seq(BindReferences.bindReference(rightKey, right.output),
      BindReferences.bindReference(rightTime, right.output))
    val rightWidth = right.output.length
    val outAttrs = output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      // key/time are evaluated through GENERATED projections (Janino-
      // compiled, same machinery as whole-stage codegen's expression eval;
      // UnsafeProjection.create falls back to interpreted mode only if
      // compilation fails) — no per-row interpreted Expression.eval in the
      // merge loop. Each projection reuses one UnsafeRow buffer, so the
      // scalars are extracted before the next call.
      val lProj = UnsafeProjection.create(lkt)
      val rProj = UnsafeProjection.create(rkt)
      val rBuf = rIter.buffered
      val nullRight = new GenericInternalRow(rightWidth)
      val joined = new JoinedRow()
      val toUnsafe = UnsafeProjection.create(outAttrs.map(_.dataType).toArray)
      var lastRight: InternalRow = null
      var lastRightKey: Long = 0L
      var lastRightTime: Long = 0L
      lIter.map { l =>
        val lr = lProj(l)
        if (lr.isNullAt(0) || lr.isNullAt(1)) {
          // SQL equality semantics: a null key/time matches nothing.
          // Nulls sort first, so not advancing rBuf here is safe.
          toUnsafe(joined(l, nullRight))
        } else {
          val key = lr.getLong(0)
          val time = lr.getLong(1)
          var advance = true
          while (advance && rBuf.hasNext) {
            val rr = rProj(rBuf.head)
            if (rr.isNullAt(0)) rBuf.next() // null-key build rows: never candidates
            else {
              val hk = rr.getLong(0)
              if (hk < key) rBuf.next() // stale earlier-key row: can never match again
              else if (hk == key) {
                if (rr.isNullAt(1)) rBuf.next() // null-time: never a candidate
                else {
                  val ht = rr.getLong(1)
                  if (ht <= time) {
                    // candidate: the buffered row object is reused by the
                    // shuffle reader, so the remembered one must be copied
                    lastRight = rBuf.head.copy(); lastRightKey = hk; lastRightTime = ht
                    rBuf.next()
                  } else advance = false
                }
              } else advance = false
            }
          }
          val matched = lastRight != null && lastRightKey == key && lastRightTime <= time
          toUnsafe(joined(l, if (matched) lastRight else nullRight))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}
