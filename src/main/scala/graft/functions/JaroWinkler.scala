package graft.functions

import org.apache.spark.sql.Column

/** Jaro-Winkler string similarity (evaluate.py:100-106 uses strsimpy's with
  * a 0.95 match threshold). Standard definition: Jaro similarity boosted by
  * common-prefix length (≤4) · 0.1 when jaro exceeds the 0.7 boost
  * threshold — matches DuckDB's jaro_winkler_similarity so the oracle can
  * use the builtin.
  *
  * Column surface is the native Catalyst [[JaroWinklerSimilarity]]
  * expression (codegen'd static call — no UDF codegen break), so the op is
  * fact-table-safe, not just dim-safe.
  */
object JaroWinkler {

  def jaro(s1: String, s2: String): Double = {
    val len1 = s1.length
    val len2 = s2.length
    if (len1 == 0 && len2 == 0) return 1.0
    if (len1 == 0 || len2 == 0) return 0.0
    val window = math.max(math.max(len1, len2) / 2 - 1, 0)
    val matched1 = new Array[Boolean](len1)
    val matched2 = new Array[Boolean](len2)
    var m = 0
    var i = 0
    while (i < len1) {
      val lo = math.max(0, i - window)
      val hi = math.min(len2 - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!matched2(j) && s1.charAt(i) == s2.charAt(j)) {
          matched1(i) = true; matched2(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var t = 0
    var k = 0
    i = 0
    while (i < len1) {
      if (matched1(i)) {
        while (!matched2(k)) k += 1
        if (s1.charAt(i) != s2.charAt(k)) t += 1
        k += 1
      }
      i += 1
    }
    // integer half-count of transposed positions (matches DuckDB/RapidFuzz)
    val tr = t / 2
    (m.toDouble / len1 + m.toDouble / len2 + (m - tr).toDouble / m) / 3.0
  }

  def jaroWinkler(s1: String, s2: String): Double = {
    val j = jaro(s1, s2)
    if (j <= 0.7) return j
    var l = 0
    val max = math.min(4, math.min(s1.length, s2.length))
    while (l < max && s1.charAt(l) == s2.charAt(l)) l += 1
    j + l * 0.1 * (1.0 - j)
  }

  def similarity(a: Column, b: Column): Column = JaroWinklerSimilarity(a, b)
}
