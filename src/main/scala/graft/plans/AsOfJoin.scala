package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodeGenerator, CodegenContext, ExprCode, FalseLiteral, JavaCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, CodegenSupport, SparkPlan}
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
    rightKey: Expression, rightTime: Expression)
  extends BinaryExecNode with CodegenSupport {

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

  // ------------------------------------------------ whole-stage codegen
  // The merge loop as a generated produce loop (the SortMergeJoin shape:
  // two input iterators zipped by WholeStageCodegenExec, downstream
  // operators fused into this loop via consume()). doExecute above stays
  // as the codegen-disabled / fallback path with identical semantics.

  override def inputRDDs(): Seq[RDD[InternalRow]] =
    left.execute() :: right.execute() :: Nil

  // one output row can alias the latched build row across iterations
  override def needCopyResult: Boolean = true

  /** Column extraction var: value/isNull locals read from `row`, with an
    * optional extra null condition short-circuiting BEFORE any row access
    * (guards the null-extended right side). */
  private def genRowVar(ctx: CodegenContext, row: String, a: Attribute, i: Int,
      extraNullCond: Option[String]): ExprCode = {
    val javaType = CodeGenerator.javaType(a.dataType)
    val value = ctx.freshName("value")
    val getter = CodeGenerator.getValue(row, a.dataType, i.toString)
    if (extraNullCond.isEmpty && !a.nullable) {
      ExprCode(code"$javaType $value = $getter;",
        FalseLiteral, JavaCode.variable(value, a.dataType))
    } else {
      val isNull = ctx.freshName("isNull")
      val rowNull = if (a.nullable) s"$row.isNullAt($i)" else "false"
      val cond = extraNullCond.map(c => s"$c || $rowNull").getOrElse(rowNull)
      ExprCode(
        code"""boolean $isNull = $cond;
           $javaType $value = $isNull ? ${CodeGenerator.defaultValue(a.dataType)} : ($getter);""",
        JavaCode.isNullVariable(isNull), JavaCode.variable(value, a.dataType))
    }
  }

  override protected def doProduce(ctx: CodegenContext): String = {
    val leftInput = ctx.addMutableState("scala.collection.Iterator", "asofLeftInput",
      v => s"$v = inputs[0];")
    val rightInput = ctx.addMutableState("scala.collection.Iterator", "asofRightInput",
      v => s"$v = inputs[1];")
    val rightHead = ctx.addMutableState("InternalRow", "asofRightHead")
    val lastRight = ctx.addMutableState("InternalRow", "asofLastRight")
    val lastKey = ctx.addMutableState("long", "asofLastKey")
    val lastTime = ctx.addMutableState("long", "asofLastTime")

    val leftRow = ctx.freshName("asofLeftRow")
    ctx.currentVars = null
    ctx.INPUT_ROW = leftRow
    val lkEv = BindReferences.bindReference(leftKey, left.output).genCode(ctx)
    val ltEv = BindReferences.bindReference(leftTime, left.output).genCode(ctx)
    ctx.INPUT_ROW = rightHead
    val rkEv = BindReferences.bindReference(rightKey, right.output).genCode(ctx)
    val rtEv = BindReferences.bindReference(rightTime, right.output).genCode(ctx)

    val matched = ctx.freshName("asofMatched")
    val key = ctx.freshName("asofKey")
    val time = ctx.freshName("asofTime")
    val hk = ctx.freshName("asofHk")
    val ht = ctx.freshName("asofHt")
    val advance = ctx.freshName("asofAdvance")

    val leftVars = left.output.zipWithIndex.map { case (a, i) =>
      genRowVar(ctx, leftRow, a, i, None)
    }
    val rightVars = right.output.zipWithIndex.map { case (a, i) =>
      genRowVar(ctx, lastRight, a, i, Some(s"!$matched"))
    }
    // matched implies lastRight != null and lastKey == key, so the right
    // vars never touch a null or stale row.
    s"""
       |while ($leftInput.hasNext()) {
       |  InternalRow $leftRow = (InternalRow) $leftInput.next();
       |  ${lkEv.code}
       |  ${ltEv.code}
       |  boolean $matched = false;
       |  if (!(${lkEv.isNull} || ${ltEv.isNull})) {
       |    long $key = ${lkEv.value};
       |    long $time = ${ltEv.value};
       |    boolean $advance = true;
       |    while ($advance) {
       |      if ($rightHead == null) {
       |        if ($rightInput.hasNext()) { $rightHead = (InternalRow) $rightInput.next(); }
       |        else { break; }
       |      }
       |      ${rkEv.code}
       |      if (${rkEv.isNull}) { $rightHead = null; continue; }
       |      long $hk = ${rkEv.value};
       |      if ($hk < $key) { $rightHead = null; continue; }
       |      if ($hk == $key) {
       |        ${rtEv.code}
       |        if (${rtEv.isNull}) { $rightHead = null; continue; }
       |        long $ht = ${rtEv.value};
       |        if ($ht <= $time) {
       |          $lastRight = $rightHead.copy();
       |          $lastKey = $hk;
       |          $lastTime = $ht;
       |          $rightHead = null;
       |        } else { $advance = false; }
       |      } else { $advance = false; }
       |    }
       |    $matched = $lastRight != null && $lastKey == $key && $lastTime <= $time;
       |  }
       |  ${consume(ctx, leftVars ++ rightVars)}
       |  if (shouldStop()) return;
       |}
     """.stripMargin
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}
