package graft.functions

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.tdigest.TDigestDouble
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** t-digest mergeable quantile sketch as a native column aggregate — the
  * quantile member completing the mergeable-sketch family (HLL distinct,
  * KMV set algebra, CMS frequency, Bloom membership, bitmap exact
  * distinct): the ONE statistic 100 TB pipelines query most
  * (latency/length percentiles) with the ONE algebraic property the
  * exact and GK paths lack. Spark's own percentile_approx keeps a
  * Greenwald–Khanna summary per group, but that summary is not a
  * first-class VALUE: it cannot be stored per day and unioned per month.
  * Here the sketch IS the column (BinaryType, wire format =
  * DataSketches' TDigestDouble, Dunning & Ertl's merging digest with the
  * K_2 scale function): build per fine partition with [[TDigestAgg]],
  * roll up coarser with [[TDigestMergeAgg]], read with
  * [[TDigestSummary]] — the materialized-rollup algebra of q_incr_agg
  * applied to quantiles.
  *
  * Contract honesty (why the gated surface is the certificate, not the
  * estimate): a merged t-digest's interpolated quantile depends on the
  * merge ORDER of partial buffers, which shuffle arrival makes
  * nondeterministic — so raw estimates never sit on a hash-gated
  * surface; q_tdigest_audit gates what IS exact (total weight, min,
  * max) plus the rank-error envelope as guarantee booleans, the
  * q_cms_audit shape. Accuracy at the default k=200 is ~0.1–0.5% rank
  * error at the median and tighter toward the tails (the t-digest
  * design point); the audit's envelope is 2%·n + 1 — comfortable under
  * any merge order, still far below what a broken sketch could pass. */
abstract class TDigestAggBase extends TypedImperativeAggregate[TDigestDouble]
    with UnaryLike[Expression] {
  /** Compression: number of centroids retained scales with k. */
  def k: Int

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): TDigestDouble = new TDigestDouble(k.toShort)

  override def merge(buffer: TDigestDouble, other: TDigestDouble): TDigestDouble = {
    buffer.merge(other)
    buffer
  }

  override def eval(buffer: TDigestDouble): Any = buffer.toByteArray

  override def serialize(buffer: TDigestDouble): Array[Byte] = buffer.toByteArray

  override def deserialize(bytes: Array[Byte]): TDigestDouble =
    TDigestDouble.heapify(Memory.wrap(bytes))
}

/** Build leg: doubles in, serialized sketch out. */
case class TDigestAgg(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0) extends TDigestAggBase {

  override def prettyName: String = "tdigest_agg"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case DoubleType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a double column, got $t (cast upstream)")
  }

  override def update(buffer: TDigestDouble, input: InternalRow): TDigestDouble = {
    val v = child.eval(input)
    if (v != null) buffer.update(v.asInstanceOf[Double])
    buffer
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TDigestAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TDigestAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): TDigestAgg =
    copy(child = newChild)
}

/** Roll-up leg: serialized sketches in, merged serialized sketch out —
  * the algebra that lets a per-day sketch table answer per-month (or
  * global) percentiles without re-touching the raw rows. */
case class TDigestMergeAgg(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0) extends TDigestAggBase {

  override def prettyName: String = "tdigest_merge_agg"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a serialized t-digest (binary) column, got $t")
  }

  override def update(buffer: TDigestDouble, input: InternalRow): TDigestDouble = {
    val v = child.eval(input)
    if (v != null)
      buffer.merge(TDigestDouble.heapify(Memory.wrap(v.asInstanceOf[Array[Byte]])))
    buffer
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TDigestMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TDigestMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): TDigestMergeAgg =
    copy(child = newChild)
}

/** Read leg: struct(n, vmin, vmax, qs) from a serialized sketch — n,
  * vmin, vmax are EXACT (total weight is a counter, min/max are tracked
  * outside the centroids), qs are the interpolated quantile estimates at
  * the requested ranks. One row per group post-aggregation, so
  * interpreted eval (CodegenFallback) costs nothing measurable. */
case class TDigestSummary(child: Expression, ranks: Seq[Double])
    extends UnaryExpression with CodegenFallback {

  override def prettyName: String = "tdigest_summary"
  override def nullable: Boolean = true

  override def dataType: DataType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("vmin", DoubleType, nullable = false),
    StructField("vmax", DoubleType, nullable = false),
    StructField("qs", ArrayType(DoubleType, containsNull = false), nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType if ranks.nonEmpty && ranks.forall(r => r >= 0.0 && r <= 1.0) =>
      TypeCheckResult.TypeCheckSuccess
    case BinaryType => TypeCheckResult.TypeCheckFailure(
      s"$prettyName ranks must be non-empty and within [0, 1], got $ranks")
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a serialized t-digest (binary) column, got $t")
  }

  override def nullSafeEval(input: Any): Any = {
    val td = TDigestDouble.heapify(Memory.wrap(input.asInstanceOf[Array[Byte]]))
    if (td.isEmpty) null
    else InternalRow(td.getTotalWeight, td.getMinValue, td.getMaxValue,
      new GenericArrayData(ranks.map(td.getQuantile).toArray))
  }

  override protected def withNewChildInternal(newChild: Expression): TDigestSummary =
    copy(child = newChild)
}

object TDigestSketch {
  /** DataSketches' default compression — ~100–200 retained centroids. */
  val DefaultK = 200

  /** `df.groupBy(...).agg(tdigestAgg(col("latency")))` → binary sketch. */
  def tdigestAgg(v: Column, k: Int = DefaultK): Column =
    ColumnBridge.column(
      TDigestAgg(ColumnBridge.expression(v), k).toAggregateExpression())

  /** `daily.groupBy(...).agg(tdigestMergeAgg(col("sk")))` → merged sketch. */
  def tdigestMergeAgg(sk: Column, k: Int = DefaultK): Column =
    ColumnBridge.column(
      TDigestMergeAgg(ColumnBridge.expression(sk), k).toAggregateExpression())

  /** struct(n, vmin, vmax, qs) at the requested ranks. */
  def tdigestSummary(sk: Column, ranks: Seq[Double]): Column =
    ColumnBridge.column(TDigestSummary(ColumnBridge.expression(sk), ranks))
}
