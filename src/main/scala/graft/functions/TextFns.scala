package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The reference's text-cleaning chain (Read_And_Clean.py:53-86) re-expressed
  * as pure Column expressions: lowercase → punctuation strip → tokenize →
  * digit removal → length filter → stopword removal → lemmatizer-lite.
  *
  * Everything stays inside whole-stage codegen (array higher-order functions,
  * no UDFs), so the chain runs at scan speed over arbitrarily large corpora.
  * The `*Sql` methods emit the EXACT same logic as DuckDB SQL for the
  * correctness oracle — keep both sides in lock-step when editing.
  *
  * Divergences from the reference, by design (not a port):
  *  - wordnet `morphy` lemmatization → deterministic suffix rules (the
  *    reference's call is per-token Python; ours is a codegen'd CASE);
  *  - spellcheck/dictionary-English filters (Read_And_Clean.py:19-29):
  *    the chain here stops at stopword + length + lemma; the dictionary
  *    step is its own operator — a vocabulary semi-join, see
  *    TextPrep.englishFilterOf (q_clean_english).
  */
object TextFns {

  /** Compact english stopword list (reference uses nltk's; ours is explicit
    * so the SQL oracle can inline it verbatim). */
  val Stopwords: Seq[String] = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "are", "was",
    "were", "be", "been", "for", "on", "with", "as", "by", "at", "from",
    "it", "this", "that", "these", "those", "not", "no", "but", "if")

  /** lowercase, strip non-alphanumerics to spaces, split, drop empties.
    * Backed by the one-pass native kernel (TextKernel.rawTokens) — same
    * steps, same regexes, inside whole-stage codegen instead of stacked
    * CodegenFallback HOFs. */
  def rawTokens(text: Column): Column = TextKernelCols.rawTokens(text)

  /** Unicode NFC canonicalization (native codegen expression; matches
    * DuckDB's nfc_normalize — both implement TR-15 canonical composition). */
  def nfcNormalize(text: Column): Column = TextKernelCols.nfcNormalize(text)

  /** Deterministic suffix-rule lemmatizer (≈ wn.morphy for plural nouns). */
  def lemma(t: Column): Column =
    when(t.endsWith("ies") && length(t) > 4,
      concat(t.substr(lit(1), length(t) - 3), lit("y")))
      .when(t.endsWith("sses"), t.substr(lit(1), length(t) - 2))
      .when(t.endsWith("s") && !t.endsWith("ss") && !t.endsWith("us") &&
        !t.endsWith("is") && length(t) > 3, t.substr(lit(1), length(t) - 1))
      .otherwise(t)

  /** Full cleaning chain → array of clean tokens.
    *
    * Digit stripping runs at the DOCUMENT level (one regex pass per doc)
    * rather than per token — semantically identical: digits never create
    * token boundaries (deleted, not spaced), and tokens that were all
    * digits are dropped either way (split drops the empty / len>2 filter
    * dropped the ""). One pass per doc vs one per token is the difference
    * between scan-speed and 2× scan cost on a 100 TB corpus. */
  def cleanTokens(text: Column): Column = TextKernelCols.cleanTokens(text)

  /** Polynomial rolling hash over a token array (streaming fingerprint use:
    * h(a ++ b) = (h(a)·B^|b| + h(b)) mod M, so a running hash extends
    * incrementally without re-reading the prefix). One codegen fold; the
    * per-token term is reduced mod M BEFORE the multiply-add so every
    * intermediate stays < 2³⁸ — no Long overflow under ANSI mode.
    * Not SQL-portable (DuckDB lacks xxhash64) → spec-tested, rows-only. */
  val RollMod = 1000000007L
  val RollBase = 131L
  def rollingHash(tokens: Column): Column =
    aggregate(tokens, lit(0L), (acc, t) =>
      pmod(acc * RollBase + pmod(xxhash64(t), lit(RollMod)), lit(RollMod)))

  /** Word n-gram shingles over a token array (for Jaccard/MinHash dedup). */
  def shingles(tokens: Column, n: Int): Column = TextKernelCols.shingles(tokens, n)

  // ------------------------------------------------------------------
  // DuckDB oracle fragments — MUST mirror the Column logic above.
  // ------------------------------------------------------------------

  def stopListSql: String = Stopwords.map(s => s"'$s'").mkString("(", ",", ")")

  def rawTokensSql(textExpr: String): String =
    s"list_filter(regexp_split_to_array(regexp_replace(lower($textExpr), " +
      s"'[^a-z0-9 ]', ' ', 'g'), ' +'), t -> t <> '')"

  def cleanTokensSql(textExpr: String): String =
    s"""list_transform(list_filter(list_filter(regexp_split_to_array(regexp_replace(regexp_replace(lower($textExpr), '[^a-z0-9 ]', ' ', 'g'), '[0-9]', '', 'g'), ' +'), t -> t <> ''), t -> len(t) > 2 AND t NOT IN $stopListSql), t -> CASE WHEN t LIKE '%ies' AND len(t) > 4 THEN substr(t, 1, len(t)-3) || 'y' WHEN t LIKE '%sses' THEN substr(t, 1, len(t)-2) WHEN t LIKE '%s' AND t NOT LIKE '%ss' AND t NOT LIKE '%us' AND t NOT LIKE '%is' AND len(t) > 3 THEN substr(t, 1, len(t)-1) ELSE t END)"""

  /** `toksCol` must be a bound list column name (bind via CTE at call site).
    * range(1, k+1) yields 1..k and is empty for k<=0, matching the guard in
    * `shingles`. */
  def shinglesSql(toksCol: String, n: Int): String = {
    val parts = (0 until n).map {
      case 0 => s"$toksCol[i]"
      case k => s"$toksCol[i+$k]"
    }.mkString(" || ' ' || ")
    s"list_transform(range(1, len($toksCol) - ${n - 1} + 1), i -> $parts)"
  }
}
