package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native one-pass signature kernels for near-dup detection.
  *
  * The aggregate formulations they replace are correct but
  * interpreter-heavy: SimHash as 64 `sum(when(...))` aggregate columns
  * over an exploded token stream (64 buffer updates per token occurrence
  * PLUS the explode shuffle), MinHash as 128 `min(xxhash64(i, h))`
  * aggregates over exploded shingles. Each kernel computes the identical
  * signature in one compiled pass over the document's token/shingle array
  * — a pure projection, NO explode and NO shuffle at all — which is the
  * difference between a map-only scan and an aggregation exchange over a
  * 100 TB corpus.
  *
  * Token hashing uses XXH64 with Spark's fixed seed 42, bit-identical to
  * the builtin `xxhash64(tok)` (MlSpec proves the SimHash equivalence
  * against the aggregate formulation).
  */
object HashKernels {

  /** Spark's xxhash64 seed (XxHash64.DEFAULT_SEED). */
  val XxSeed = 42L

  def hashUtf8(t: UTF8String): Long =
    XXH64.hashUnsafeBytes(t.getBaseObject, t.getBaseOffset, t.numBytes, XxSeed)

  /** 64-bit SimHash over token OCCURRENCES (duplicates count, like the
    * exploded-aggregate formulation): per-bit signed sums of xxhash64(tok),
    * sign → bit. Null tokens are skipped. */
  def simhash64(toks: ArrayData): Long = {
    val counts = new Array[Int](64)
    val n = toks.numElements()
    var i = 0
    while (i < n) {
      if (!toks.isNullAt(i)) {
        val h = hashUtf8(toks.getUTF8String(i))
        var j = 0
        while (j < 64) {
          if (((h >> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
          j += 1
        }
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < 64) {
      if (counts(j) >= 0) out |= (1L << j)
      j += 1
    }
    out
  }

  /** `width` independent min-hashes over the shingle SET (min is blind to
    * duplicates, so the distinct() of the aggregate formulation is free):
    * permutation i of shingle t is XXH64.hashLong(xxhash64(t), i) — the
    * variable-length string is hashed once, each permutation re-mixes the
    * fixed 8-byte result. Empty input yields Long.MaxValue sentinels
    * (callers filter docs with no shingles). */
  def minhash(shingles: ArrayData, width: Int): ArrayData = {
    val sig = Array.fill(width)(Long.MaxValue)
    val n = shingles.numElements()
    var i = 0
    while (i < n) {
      if (!shingles.isNullAt(i)) {
        val h = hashUtf8(shingles.getUTF8String(i))
        var j = 0
        while (j < width) {
          val v = XXH64.hashLong(h, j.toLong)
          if (v < sig(j)) sig(j) = v
          j += 1
        }
      }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(sig)
  }
}

abstract class TokenArrayExpression extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName requires array<string>, got $t")
  }
}

case class SimHash64(child: Expression) extends TokenArrayExpression {
  override def prettyName: String = "simhash64"
  override def dataType: DataType = LongType
  override def nullSafeEval(a: Any): Any =
    HashKernels.simhash64(a.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashKernels.simhash64($c)")
  override protected def withNewChildInternal(c: Expression): SimHash64 = copy(child = c)
}

case class MinHashSignature(child: Expression, width: Int) extends TokenArrayExpression {
  override def prettyName: String = "minhash_signature"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(a: Any): Any =
    HashKernels.minhash(a.asInstanceOf[ArrayData], width)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashKernels.minhash($c, $width)")
  override protected def withNewChildInternal(c: Expression): MinHashSignature =
    copy(child = c)
}

object HashKernelCols {
  def simhash64(tokens: Column): Column =
    ColumnBridge.column(SimHash64(ColumnBridge.expression(tokens)))
  def minhash(shingles: Column, width: Int): Column =
    ColumnBridge.column(MinHashSignature(ColumnBridge.expression(shingles), width))
}
