package graft

import graft.functions.TextFns
import org.apache.spark.sql.functions._

class TextFnsSpec extends SparkSpec {

  test("rolling hash: deterministic, order-sensitive, incremental extension law") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, split}
    val rows = Seq("one two three", "four five", "one two three four five",
      "three two one").toDF("s")
      .select(TextFns.rollingHash(split(col("s"), " ")).as("h"))
      .collect().map(_.getLong(0))
    val Array(ha, hb, hab, hrev) = rows
    // h(a ++ b) = (h(a) * B^|b| + h(b)) mod M — the incremental property
    val bPow = (0 until 2).foldLeft(1L)((p, _) => p * TextFns.RollBase % TextFns.RollMod)
    assert(hab === (ha * bPow + hb) % TextFns.RollMod)
    assert(ha !== hrev) // order matters
  }
  import spark.implicits._

  private def clean(s: String): Seq[String] =
    Seq(s).toDF("text").select(TextFns.cleanTokens(col("text")).as("t"))
      .as[Seq[String]].head()

  test("cleaning chain: lowercase, punctuation, digits, stopwords, length") {
    assert(clean("The QUICK-brown fox123 jumped, a bit!") ===
      Seq("quick", "brown", "fox", "jumped", "bit"))
  }

  test("lemmatizer-lite plural rules") {
    // -is endings are protected (basis), as are -ss and -us
    assert(clean("tables queries classes buses bus basis") ===
      Seq("table", "query", "class", "buse", "bus", "basis"))
  }

  test("stopwords and short tokens dropped") {
    assert(clean("it is an ox on the mat") === Seq("mat"))
  }

  test("shingles: 3-grams and short-doc guard") {
    val df = Seq("a b c d", "a b").toDF("text")
      .select(TextFns.shingles(split(col("text"), " "), 3).as("s"))
      .as[Seq[String]].collect()
    assert(df(0) === Seq("a b c", "b c d"))
    assert(df(1) === Seq.empty)
  }
}
