package graft

import graft.functions.JaroWinkler
import org.scalatest.funsuite.AnyFunSuite

class JaroWinklerSpec extends AnyFunSuite {
  test("identical and empty strings") {
    assert(JaroWinkler.jaroWinkler("spark", "spark") === 1.0)
    assert(JaroWinkler.jaroWinkler("", "") === 1.0)
    assert(JaroWinkler.jaroWinkler("a", "") === 0.0)
  }

  test("classic MARTHA/MARHTA value") {
    // jaro 0.9444..., prefix 3 → 0.9611...
    assert(math.abs(JaroWinkler.jaroWinkler("MARTHA", "MARHTA") - 0.9611111111) < 1e-9)
  }

  test("no boost below 0.7 jaro") {
    val j = JaroWinkler.jaro("abcdef", "fedcba")
    assert(j <= 0.7)
    assert(JaroWinkler.jaroWinkler("abcdef", "fedcba") === j)
  }

  test("transpositions use integer half-count (DuckDB compatible)") {
    // 'new widget' vs 'red widget': m=8 of 10, 3 mismatched positions → t=1
    val expected = (0.8 + 0.8 + 7.0 / 8) / 3
    assert(math.abs(JaroWinkler.jaro("new widget", "red widget") - expected) < 1e-12)
  }
}
