package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}
import org.roaringbitmap.RoaringBitmap

/** Exact distinct counting over bounded integer id spaces as a native
  * TypedImperativeAggregate — the custom-AGGREGATE extension surface
  * (beside the typed Aggregator of TopKAggregator, which lives at the
  * Dataset layer; this one is a Catalyst aggregate usable from SQL).
  *
  * State is a RoaringBitmap (the compressed bitmap Spark itself uses for
  * shuffle tracking): update sets a bit, merge is bitmap OR — fully
  * combiner-friendly, so the shuffle carries one compressed bitmap per
  * group instead of the exact-distinct hash sets Spark's
  * count(DISTINCT x) plans as an Expand + second aggregate. This is the
  * ClickHouse/Doris groupBitmap posture: EXACT (unlike HLL — q_hll_merge
  * covers the sketch path) at a fraction of count-distinct's shuffle,
  * valid whenever ids fit a bounded non-negative 32-bit space (row
  * numbers, user ids, doc ids). Ids outside [0, 2³¹) fail loudly —
  * silent truncation would corrupt the count. */
case class BitmapDistinct(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[RoaringBitmap] with UnaryLike[Expression] {

  override def prettyName: String = "bitmap_distinct"
  override def dataType: DataType = LongType
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | IntegerType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an integral id column, got $t")
  }

  override def createAggregationBuffer(): RoaringBitmap = new RoaringBitmap()

  override def update(buffer: RoaringBitmap, input: InternalRow): RoaringBitmap = {
    val v = child.eval(input)
    if (v != null) {
      val id = v match {
        case l: java.lang.Long => l.longValue()
        case i: java.lang.Integer => i.longValue()
      }
      if (id < 0 || id > Int.MaxValue)
        throw new IllegalArgumentException(
          s"$prettyName: id $id outside the 32-bit bitmap domain [0, 2^31) — " +
            "use hll sketches (q_hll_merge) for unbounded key spaces")
      buffer.add(id.toInt)
    }
    buffer
  }

  override def merge(buffer: RoaringBitmap, other: RoaringBitmap): RoaringBitmap = {
    buffer.or(other)
    buffer
  }

  override def eval(buffer: RoaringBitmap): Any = buffer.getLongCardinality

  override def serialize(buffer: RoaringBitmap): Array[Byte] = {
    buffer.runOptimize()
    val out = new Array[Byte](buffer.serializedSizeInBytes())
    buffer.serialize(java.nio.ByteBuffer.wrap(out))
    out
  }

  override def deserialize(bytes: Array[Byte]): RoaringBitmap = {
    val bm = new RoaringBitmap()
    bm.deserialize(java.nio.ByteBuffer.wrap(bytes))
    bm
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BitmapDistinct =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BitmapDistinct =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BitmapDistinct =
    copy(child = newChild)
}

object BitmapDistinct {
  /** Column-API entry: `df.groupBy(...).agg(bitmapDistinct(col("id")))`. */
  def bitmapDistinct(id: Column): Column =
    ColumnBridge.column(
      BitmapDistinct(ColumnBridge.expression(id)).toAggregateExpression())
}
