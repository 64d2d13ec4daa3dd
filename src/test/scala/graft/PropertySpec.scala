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

  test("signature-kernel laws hold on generated token lists") {
    import graft.functions.HashKernelCols
    // pairs of token lists (a, b) — compare kernel outputs on a, b, a++b,
    // and a permutation of a, all evaluated in one Spark job
    val tokGen = Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.take(6).mkString)
    val listGen = Gen.nonEmptyListOf(tokGen).map(_.take(20))
    val pairs = Gen.listOfN(60, Gen.zip(listGen, listGen))
      .apply(Gen.Parameters.default, Seed(7L)).get
    val rows = pairs.toDF("a", "b")
      .select(
        HashKernelCols.minhash(col("a"), 16).as("ma"),
        HashKernelCols.minhash(col("b"), 16).as("mb"),
        HashKernelCols.minhash(concat(col("a"), col("b")), 16).as("mab"),
        HashKernelCols.simhash64(col("a")).as("sa"),
        HashKernelCols.simhash64(reverse(col("a"))).as("sa_rev"),
        HashKernelCols.simhash64(concat(col("a"), col("a"))).as("saa"))
      .collect()
    rows.foreach { r =>
      val ma = r.getSeq[Long](0)
      val mb = r.getSeq[Long](1)
      val mab = r.getSeq[Long](2)
      // minhash union law: sig(a ++ b) is the elementwise min of the sigs
      assert(mab === ma.zip(mb).map { case (x, y) => math.min(x, y) })
      // simhash is order-independent (sum over occurrences)
      assert(r.getLong(3) === r.getLong(4))
      // duplicating every token preserves every bit's SIGN (each per-bit
      // sum doubles), so the signature is unchanged
      assert(r.getLong(3) === r.getLong(5))
    }
  }

  test("omnibus-test laws hold on generated group samples") {
    import graft.operators.{RobustStats, Stats}
    // seeded 3-group integer samples
    val g = for {
      gs <- Gen.listOfN(3, Gen.listOfN(60, Gen.chooseNum(0L, 40L)))
    } yield gs
    val gs = g.apply(Gen.Parameters.default, Seed(7L)).get
    val rows = gs.zipWithIndex.flatMap { case (xs, i) => xs.map(x => (s"g$i", x)) }
    // LAW 1: Kruskal–Wallis is RANK-based → invariant under any strictly
    // monotone transform of x (here x -> 3x + 5, and x -> x³ which is
    // monotone on non-negatives)
    val h0 = RobustStats.kruskalWallis(rows.toDF("g", "x"))
      .collect().head.getAs[Double]("h_tie_corrected")
    val hAffine = RobustStats.kruskalWallis(
      rows.map { case (g, x) => (g, 3 * x + 5) }.toDF("g", "x"))
      .collect().head.getAs[Double]("h_tie_corrected")
    val hCube = RobustStats.kruskalWallis(
      rows.map { case (g, x) => (g, x * x * x) }.toDF("g", "x"))
      .collect().head.getAs[Double]("h_tie_corrected")
    assert(h0 === hAffine, "KW must be invariant under affine maps")
    assert(h0 === hCube, "KW must be invariant under monotone maps")
    // LAW 2: ANOVA F is invariant under affine maps a·x+b (a ≠ 0): both
    // SSB and SSW scale by a², so F and η² are unchanged (up to the 6-dp
    // round both engines share)
    val f0 = Stats.anovaOf(rows.toDF("g", "x")).collect().head
    val fA = Stats.anovaOf(rows.map { case (g, x) => (g, 2 * x + 7) }
      .toDF("g", "x")).collect().head
    assert(math.abs(f0.getAs[Double]("f") - fA.getAs[Double]("f")) <= 2e-6)
    assert(math.abs(f0.getAs[Double]("eta_sq") - fA.getAs[Double]("eta_sq")) <= 2e-6)
    // LAW 3: Brown–Forsythe W is invariant under SHIFTS (deviations from
    // the median are unchanged) — and under sign flip (|x−med| preserved
    // when both negate, up to nearest-rank median asymmetry on ties we
    // avoid by shifting only)
    val base = rows.toDF("g", "x")
      .select(col("g"), col("x").cast("decimal(18,2)").as("x")).persist()
    val shifted = rows.map { case (g, x) => (g, x + 100) }.toDF("g", "x")
      .select(col("g"), col("x").cast("decimal(18,2)").as("x")).persist()
    val w0 = Stats.leveneOf(spark, base).collect().head.getAs[Double]("w")
    val wS = Stats.leveneOf(spark, shifted).collect().head.getAs[Double]("w")
    base.unpersist(); shifted.unpersist()
    assert(w0 === wS, "BF-W must be shift-invariant")
  }

  test("unigram lattice laws on generated words and vocabularies") {
    import graft.operators.Unigram
    val wordGen = Gen.nonEmptyListOf(Gen.oneOf('a', 'b', 'c')).map(_.take(12).mkString)
    val words = Gen.listOfN(120, wordGen).apply(Gen.Parameters.default, Seed(7L)).get
    // vocab: the three chars (coverage) + a few multi-char pieces, random
    // positive weights normalized to a sub-simplex
    val pieceGen = Gen.nonEmptyListOf(Gen.oneOf('a', 'b', 'c')).map(_.take(3).mkString)
    val extra = Gen.listOfN(12, pieceGen).apply(Gen.Parameters.default, Seed(8L)).get
    val raw = (Seq("a", "b", "c") ++ extra).distinct.zipWithIndex
      .map { case (p, i) => p -> (1.0 + (i % 5)) }
    val tot = raw.map(_._2).sum
    val theta = raw.map { case (p, wgt) => p -> wgt / tot }.toMap
    words.foreach { w =>
      // Viterbi is lossless: pieces concatenate back to the word, every
      // piece is in the vocabulary, and 1 ≤ |pieces| ≤ |w|
      val seg = Unigram.viterbi(w, theta)
      assert(seg.mkString("") == w, s"roundtrip broke on '$w'")
      assert(seg.forall(theta.contains) && seg.nonEmpty && seg.length <= w.length)
      // forward-backward: Z is a true marginal (0 < Z ≤ 1 for a
      // sub-simplex vocab → lnZ ≤ 0), Viterbi's path mass never exceeds
      // it, and the expected piece count per position band holds:
      // 1 ≤ Σ E[piece] ≤ |w|
      val (counts, lnZ) = Unigram.forwardBackward(w, theta)
      assert(lnZ <= 1e-12, s"lnZ $lnZ > 0 on sub-simplex vocab")
      val viterbiMass = seg.map(p => math.log(theta(p))).sum
      assert(viterbiMass <= lnZ + 1e-9, "best path exceeded the marginal")
      val mass = counts.values.sum
      assert(mass >= 1.0 - 1e-9 && mass <= w.length + 1e-9,
        s"expected piece mass $mass outside [1, ${w.length}] for '$w'")
    }
  }
}
