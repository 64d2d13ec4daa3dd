package graft

import graft.functions.TextFns
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Generative invariants for the text chain: 200 seeded random strings
  * (letters/digits/punctuation) evaluated in ONE Spark job, laws checked
  * per row on the driver. */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private val samples: Seq[String] = {
    val charGen = Gen.frequency(
      6 -> Gen.alphaChar, 2 -> Gen.numChar,
      2 -> Gen.oneOf(' ', '.', ',', '!', '-', '\'', '"', '\t'))
    val strGen = Gen.listOf(charGen).map(_.mkString)
    Gen.listOfN(200, strGen).apply(Gen.Parameters.default, Seed(42L)).get
  }

  test("cleaning-chain laws hold on generated text") {
    val rows = samples.toDF("text")
      .select(col("text"), TextFns.rawTokens(col("text")).as("rt"))
      .select(col("text"), col("rt"),
        TextFns.cleanTokens(col("text")).as("ct"),
        TextFns.shingles(col("rt"), 3).as("sh"),
        TextFns.rollingHash(col("rt")).as("rh"))
      .collect()
    rows.foreach { r =>
      val rt = r.getSeq[String](r.fieldIndex("rt"))
      val ct = r.getSeq[String](r.fieldIndex("ct"))
      val sh = r.getSeq[String](r.fieldIndex("sh"))
      val rh = r.getLong(r.fieldIndex("rh"))
      // raw tokens: non-empty, lowercase alphanumeric only
      assert(rt.forall(t => t.nonEmpty && t.forall(c => c.isDigit || (c >= 'a' && c <= 'z'))))
      // shingle count law: max(0, n - 2) word-3-grams
      assert(sh.length === math.max(0, rt.length - 2))
      // clean tokens: no digits, never a raw stopword, length >= 2
      // (lemmatization may shorten a kept token by at most one net char)
      assert(ct.forall(t => t.length >= 2 && !t.exists(_.isDigit)))
      // rolling hash stays in [0, Mod)
      assert(rh >= 0L && rh < TextFns.RollMod)
    }
  }
}
