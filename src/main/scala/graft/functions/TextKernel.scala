package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native one-pass text kernels.
  *
  * The Column formulation of the cleaning chain stacks higher-order
  * functions (filter → filter → transform), all CodegenFallback —
  * interpreted element by element with boxed lambdas. These kernels do the
  * identical steps in one compiled pass per document: UTF8String.toLowerCase
  * (the exact code path of Spark's Lower), the same java.util.regex
  * patterns Spark's regexp_replace would compile, the same split(-1)
  * semantics, the same filter and suffix-lemma rules — so every SQL-oracle
  * hash is unchanged, at a fraction of the cost.
  */
object TextKernel {
  private val NonAlnum = java.util.regex.Pattern.compile("[^a-z0-9 ]")
  private val Digits = java.util.regex.Pattern.compile("[0-9]")
  private val Stop: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    TextFns.Stopwords.foreach(s.add)
    s
  }

  private def splitTokens(cleaned: String): Array[String] =
    cleaned.split(" +", -1).filter(_.nonEmpty)

  def lemma(t: String): String =
    if (t.endsWith("ies") && t.length > 4) t.substring(0, t.length - 3) + "y"
    else if (t.endsWith("sses")) t.substring(0, t.length - 2)
    else if (t.endsWith("s") && !t.endsWith("ss") && !t.endsWith("us") &&
      !t.endsWith("is") && t.length > 3) t.substring(0, t.length - 1)
    else t

  /** lower → strip non-alnum to space → split → drop empties. */
  def rawTokens(s: UTF8String): ArrayData = {
    val lowered = s.toLowerCase.toString
    val cleaned = NonAlnum.matcher(lowered).replaceAll(" ")
    new GenericArrayData(
      splitTokens(cleaned).map(UTF8String.fromString).toArray[Any])
  }

  /** rawTokens + document-level digit strip + len>2 + stopword + lemma. */
  def cleanTokens(s: UTF8String): ArrayData = {
    val lowered = s.toLowerCase.toString
    val spaced = NonAlnum.matcher(lowered).replaceAll(" ")
    val deDigit = Digits.matcher(spaced).replaceAll("")
    val kept = splitTokens(deDigit).filter(t => t.length > 2 && !Stop.contains(t))
    new GenericArrayData(
      kept.map(t => UTF8String.fromString(lemma(t))).toArray[Any])
  }

  /** Word n-gram shingles over a token array (space-joined). Null
    * elements are SKIPPED (the window runs over the non-null tokens):
    * inputs typed ArrayType(StringType, containsNull=true) — e.g. from
    * Spark's split() — are accepted without NPE-ing at runtime. */
  def shingles(toks: ArrayData, n: Int): ArrayData = {
    val raw = toks.numElements()
    var m = 0
    val dense = new Array[UTF8String](raw)
    var r = 0
    while (r < raw) {
      if (!toks.isNullAt(r)) { dense(m) = toks.getUTF8String(r); m += 1 }
      r += 1
    }
    if (m < n) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](m - n + 1)
    var i = 0
    while (i <= m - n) {
      val sb = new java.lang.StringBuilder()
      var k = 0
      while (k < n) {
        if (k > 0) sb.append(' ')
        sb.append(dense(i + k).toString)
        k += 1
      }
      out(i) = UTF8String.fromString(sb.toString)
      i += 1
    }
    new GenericArrayData(out)
  }
}

object TextKernelPhash {
  private val Md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** TLSH-style locality-sensitive digest of an opaque payload in ONE
    * pass: bucket every sliding TRIGRAM into n counters (md5 of the
    * trigram, first 3 digest bytes, mod n), then set bit i iff
    * count_i > median(counts) — the quartile-threshold recipe of the
    * TLSH/ssdeep similarity-digest family reduced to a single median
    * split. A bag-of-trigrams profile is ORDER-INVARIANT at the block
    * level (reordered segments keep their interior trigrams), which is
    * what makes it a usable near-dup signature for payloads where a
    * positional sample grid scrambles under any local edit — measured on
    * the driver corpus: positional median-hash had NO pair under hamming
    * 15 at sf0.01 (a vacuous gate), the trigram profile has pairs at
    * hamming 0. Pure integer; the lower median of the n counts keeps the
    * bit split balanced on skewed profiles.
    *
    * Trigram positions are Unicode CODE POINTS and the hashed bytes are
    * the trigram's UTF-8 encoding — exactly DuckDB's
    * md5(substr(text, i, 3)) semantics, so the SQL oracle computes the
    * identical signature on non-ASCII payloads too (UTF-16 charAt would
    * diverge on any surrogate pair). */
  def sig(s: UTF8String, n: Int): Long = {
    // A code-point trigram's UTF-8 encoding IS a contiguous slice of the
    // document's UTF-8 bytes, so hash slices in place: one getBytes per
    // row, md.update(bytes, off, len) per trigram, digest into a reused
    // buffer — no per-trigram String/array allocation in the corpus's
    // hottest new kernel. `offs` holds the byte offset of each code
    // point's first byte (UTF-8 start bytes are everything except
    // 10xxxxxx continuations), plus the end sentinel.
    val bytes = s.getBytes
    val len = bytes.length
    val offs = new Array[Int](len + 1)
    var m = 0
    var b = 0
    while (b < len) {
      if ((bytes(b) & 0xc0) != 0x80) { offs(m) = b; m += 1 }
      b += 1
    }
    offs(m) = len
    val counts = new Array[Int](n)
    val md = Md5.get()
    val digest = new Array[Byte](16)
    var i = 0
    while (i + 2 < m) {
      md.update(bytes, offs(i), offs(i + 3) - offs(i))
      md.digest(digest, 0, 16)
      val v = ((digest(0) & 0xff) << 16) | ((digest(1) & 0xff) << 8) | (digest(2) & 0xff)
      counts(v % n) += 1
      i += 1
    }
    val sorted = counts.clone()
    java.util.Arrays.sort(sorted)
    val med = sorted(n / 2)
    var out = 0L
    i = 0
    while (i < n) {
      if (counts(i) > med) out |= (1L << i)
      i += 1
    }
    out
  }
}

/** The median-hash signature as a native codegen expression. */
case class PhashSig(child: Expression, n: Int) extends UnaryExpression {
  override def prettyName: String = "phash_sig"
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName requires string, got $t")
  }
  override def nullSafeEval(s: Any): Any =
    TextKernelPhash.sig(s.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextKernelPhash.sig($c, $n)")
  override protected def withNewChildInternal(c: Expression): PhashSig = copy(child = c)
}

object TextKernelNorm {
  /** Unicode NFC canonicalization — the dedup/fingerprint pre-step a real
    * text pipeline needs (composed vs decomposed accents hash differently
    * while rendering identically). Fast path: already-normalized input
    * (all ASCII, the overwhelming case) returns the SAME UTF8String with
    * no allocation; only genuinely decomposed rows pay the normalize. */
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}

/** NFC normalization as a native codegen expression (matches DuckDB's
  * nfc_normalize — both implement Unicode TR-15 canonical composition). */
case class NfcNormalize(child: Expression) extends UnaryExpression {
  override def prettyName: String = "nfc_normalize"
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName requires string, got $t")
  }
  override def nullSafeEval(s: Any): Any =
    TextKernelNorm.nfc(s.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextKernelNorm.nfc($c)")
  override protected def withNewChildInternal(c: Expression): NfcNormalize = copy(child = c)
}

abstract class TextKernelExpression extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName requires string, got $t")
  }
}

case class RawTokens(child: Expression) extends TextKernelExpression {
  override def prettyName: String = "raw_tokens"
  override def nullSafeEval(s: Any): Any =
    TextKernel.rawTokens(s.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextKernel.rawTokens($c)")
  override protected def withNewChildInternal(c: Expression): RawTokens = copy(child = c)
}

case class CleanTokens(child: Expression) extends TextKernelExpression {
  override def prettyName: String = "clean_tokens"
  override def nullSafeEval(s: Any): Any =
    TextKernel.cleanTokens(s.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextKernel.cleanTokens($c)")
  override protected def withNewChildInternal(c: Expression): CleanTokens = copy(child = c)
}

case class WordShingles(child: Expression, n: Int) extends UnaryExpression {
  override def prettyName: String = "word_shingles"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName requires array<string>, got $t")
  }
  override def nullSafeEval(a: Any): Any =
    TextKernel.shingles(a.asInstanceOf[ArrayData], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextKernel.shingles($c, $n)")
  override protected def withNewChildInternal(c: Expression): WordShingles = copy(child = c)
}

object TextKernelCols {
  def phashSig(text: Column, n: Int): Column =
    ColumnBridge.column(PhashSig(ColumnBridge.expression(text), n))
  def nfcNormalize(text: Column): Column =
    ColumnBridge.column(NfcNormalize(ColumnBridge.expression(text)))
  def rawTokens(text: Column): Column =
    ColumnBridge.column(RawTokens(ColumnBridge.expression(text)))
  def cleanTokens(text: Column): Column =
    ColumnBridge.column(CleanTokens(ColumnBridge.expression(text)))
  def shingles(tokens: Column, n: Int): Column =
    ColumnBridge.column(WordShingles(ColumnBridge.expression(tokens), n))
}
