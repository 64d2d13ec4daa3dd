package graft

import graft.operators.{Dedup, Relational, TextAnalysis}
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Round-7 operators: repeated-span detection semantics on a hand-built
  * corpus (shared phrases yield maximal spans; unique text yields none;
  * within-doc repetition counts as duplication). */
class Round7Spec extends SparkSpec {
  import spark.implicits._

  private val shared = "the quick brown fox jumps over the lazy dog tonight"

  test("cross-doc shared phrase produces one maximal span per doc covering it") {
    val docs = Seq(
      (1L, s"alpha beta $shared gamma delta epsilon"),
      (2L, s"one two three four five six $shared"),
      (3L, "totally unique text with no repetition at all whatsoever today")
    ).toDF("doc_id", "text")
    val spans = Dedup.repeatedSpans(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).groupBy(_._1)
    // doc 1: shared phrase = tokens 2..11 (10 tokens); windows 2..7 dup
    // -> span [2, 11]
    assert(spans(1L).map(_._2).toSeq === Seq((2L, 11L)))
    // doc 2: phrase at tokens 6..15 -> span [6, 15]
    assert(spans(2L).map(_._2).toSeq === Seq((6L, 15L)))
    assert(!spans.contains(3L))
  }

  test("within-doc repetition is duplication too") {
    val docs = Seq(
      (1L, s"$shared and then again $shared"),
      (2L, "filler text that shares nothing with anything else here now")
    ).toDF("doc_id", "text")
    val spans = Dedup.repeatedSpans(docs).collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // both copies inside doc 1 are marked (10 tokens each, 3-token gap)
    assert(spans.count(_._1 == 1L) === 2)
    assert(!spans.exists(_._1 == 2L))
  }

  test("span scrub drops exactly the repeated-span tokens, keeps the rest in order") {
    val docs = Seq(
      (1L, s"alpha beta $shared gamma delta epsilon"),
      (2L, s"one two three four five six $shared"),
      (3L, "totally unique text with no repetition at all whatsoever today")
    ).toDF("doc_id", "text")
    val got = graft.operators.Dedup.qSpanScrubOf(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    // doc 1: 15 tokens, span [2,11] dropped -> kept = alpha beta gamma delta epsilon
    assert(got(1L)._1 === 15L && got(1L)._2 === 5L)
    assert(got(1L)._3 === org.apache.commons.codec.digest.DigestUtils.md5Hex(
      "alpha beta gamma delta epsilon"))
    // doc 3 untouched: kept == all, md5 over its own tokens
    assert(got(3L)._1 === got(3L)._2)
  }

  test("leakfree split: whole near-dup clusters land on one side, both sides populated") {
    val split = Dedup.qSplitLeakfree(spark, sfDir)
    val mixed = split.groupBy("group_id")
      .agg(countDistinct(col("split")).as("sides"))
      .filter(col("sides") > 1).count()
    assert(mixed === 0L, "a cluster straddles the split")
    val sides = split.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sides.contains("train") && sides.contains("test"))
    // every doc appears exactly once
    assert(split.count() === split.select("doc_id").distinct().count())
  }

  test("media phash: identical payloads collide at hamming 0, dissimilar ones don't pair") {
    val base = "the quick brown fox jumps over the lazy dog while seventeen astronauts assemble"
    val docs = Seq(
      (1L, base),
      (2L, base), // exact copy -> hamming 0
      (3L, "entirely different content with other characters and numbers 0123456789 repeated here")
    ).toDF("doc_id", "text")
    val pairs = graft.operators.Multimodal.mediaPhashOf(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(pairs.contains((1L, 2L, 0)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("media phash: block-reordered payload pairs with the original (trigram profile is order-robust)") {
    // the corpus's actual near-dup shape: same word multiset, reordered —
    // at realistic payload length (~600 chars; an 80-char toy has too few
    // trigrams per bucket and boundary noise dominates the median split)
    val words = ("filter hash row line join query window data customer slow merge fast " +
      "column vector agg batch big value order sort scan part stream key table small spark the").split(" ")
    val base = Array.fill(4)(words).flatten.mkString(" ")
    val rotated = Array.fill(4)(words.drop(13) ++ words.take(13)).flatten.mkString(" ")
    val other = Array.fill(3)(("completely different vocabulary about astronomy telescopes " +
      "galaxies nebulae quasars pulsars comets asteroids meteors planets moons orbits").split(" ")).flatten.mkString(" ")
    val docs = Seq((1L, base), (2L, rotated), (3L, other)).toDF("doc_id", "text")
    val pairs = graft.operators.Multimodal.mediaPhashOf(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(pairs.exists(p => p._1 == 1L && p._2 == 2L &&
      p._3 <= graft.operators.Multimodal.SigMaxHamming))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("media phash gate is non-vacuous on the driver corpus") {
    // ADVICE r7: the sf0.01 hash gate matched on EMPTY output for three
    // rounds. Pin non-emptiness on the fixture so a signature change that
    // re-vacates the gate fails HERE, not silently at the driver.
    val pairs = graft.operators.Multimodal.qMediaPhash(spark, sfDir)
    assert(pairs.limit(1).count() === 1L, "q_media_phash found no pairs on the fixture corpus")
  }

  test("PhashSig hashes code-point trigrams (UTF-8 bytes), matching the oracle on non-ASCII") {
    // reference model iterating CODE POINTS — charAt/UTF-16 units would
    // diverge on the astral characters below (each is a surrogate pair)
    def model(s: String): Long = {
      val n = graft.operators.Multimodal.SigBits
      val cps = s.codePoints().toArray
      val counts = new Array[Int](n)
      val md = java.security.MessageDigest.getInstance("MD5")
      for (i <- 0 until cps.length - 2) {
        val tri = new String(cps, i, 3)
        val d = md.digest(tri.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        counts(((d(0) & 0xff) << 16 | (d(1) & 0xff) << 8 | (d(2) & 0xff)) % n) += 1
      }
      val sorted = counts.clone(); java.util.Arrays.sort(sorted)
      val med = sorted(n / 2)
      (0 until n).foldLeft(0L)((acc, i) => if (counts(i) > med) acc | (1L << i) else acc)
    }
    val texts = Seq(
      "café naïve résumé " + ("😀 astral plane words here " * 4),
      "plain ascii payload with nothing exotic about it at all repeated " * 2)
    val got = texts.toDF("text")
      .select(graft.functions.TextKernelCols.phashSig(col("text"),
        graft.operators.Multimodal.SigBits).as("sig"))
      .collect().map(_.getLong(0)).toSeq
    assert(got === texts.map(model))
  }

  test("NFC normalization composes decomposed accents; ASCII passes through unchanged") {
    val composed = "caf\u00e9"           // e-acute precomposed
    val decomposed = "cafe\u0301"        // e + combining acute
    val rows = Seq((1L, decomposed), (2L, composed), (3L, "plain ascii"))
      .toDF("doc_id", "text")
      .select(col("doc_id"), graft.functions.TextFns.nfcNormalize(col("text")).as("n"),
        (graft.functions.TextFns.nfcNormalize(col("text")) =!= col("text")).as("changed"))
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getBoolean(2)))).toMap
    assert(rows(1L)._1 === composed && rows(1L)._2) // decomposed -> composed
    assert(rows(2L)._1 === composed && !rows(2L)._2)
    assert(rows(3L)._1 === "plain ascii" && !rows(3L)._2)
  }

  test("entropy: templated text scores below diverse text and trips the gate") {
    val docs = Seq(
      (1L, "spam spam spam spam spam spam spam spam spam spam"),
      (2L, "a genuinely varied longer sentence where every single token differs completely from its neighbors and nothing repeats anywhere")
    ).toDF("doc_id", "text")
    // route through the same op via a temp dir? qEntropy reads the table;
    // exercise the expression path directly instead
    val got = TextAnalysis.entropyOf(docs).collect()
      .map(r => r.getLong(0) -> ((r.getDouble(2), r.getBoolean(3)))).toMap
    assert(got(1L)._1 === 0.0) // all-identical tokens: zero entropy
    assert(!got(1L)._2)
    assert(got(2L)._1 > 2.5 && got(2L)._2) // ln(19) ≈ 2.944 for 19 distinct
  }

  test("merge upsert: action counts reconcile with the change-feed rules") {
    val cust = Tables.customer(spark, sfDir)
    val n = cust.count()
    val nUpd = cust.filter(col("c_custkey") % 3 === 0).count()
    val nIns = cust.filter(col("c_custkey") % 5 === 0 && col("c_custkey") =!= 0).count()
    val merged = Relational.qMergeUpsert(spark, sfDir)
    val byAction = merged.groupBy("action").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byAction("update") === nUpd)
    assert(byAction("insert") === nIns)
    assert(byAction.getOrElse("keep", 0L) === n - nUpd)
    assert(merged.count() === n + nIns)
    // updates really moved the balance by +10.00
    val probe = cust.filter(col("c_custkey") % 3 === 0).limit(1)
      .select(col("c_custkey"), round(col("c_acctbal").cast("decimal(12,2)").cast("double") + 10.0, 2).as("want"))
      .collect().head
    val got = merged.filter(col("c_custkey") === probe.getLong(0)).collect().head
    assert(got.getDouble(2) === probe.getDouble(1))
  }

  test("pipeline capstone: shard totals reconcile with its component stages") {
    import graft.operators.{ScaleOps, TextAnalysis => TA}
    val shards = ScaleOps.qPipeline(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(shards.nonEmpty)
    // shard ids start at 0, strictly increase, and each is distinct — a
    // doc straddling a whole capacity window legitimately SKIPS a shard
    // id, so contiguity must not be asserted
    val ids = shards.map(_._1).sorted
    assert(ids.head === 0L)
    assert(ids.toSeq === ids.distinct.toSeq.sorted)
    // totals equal the curated ∩ train ∩ scrubbed token mass
    // the capstone rides the TRUE ExactSubstr scrub since r18
    val expected = TA.qCurationFull(spark, sfDir).select("doc_id")
      .join(Dedup.qSpanScrubExact(spark, sfDir).select(col("doc_id"), col("n_kept")), Seq("doc_id"))
      .join(Dedup.qSplitLeakfree(spark, sfDir).select(col("doc_id"), col("split")), Seq("doc_id"))
      .filter(col("split") === "train" && col("n_kept") > 0)
      .agg(count(lit(1)), sum(col("n_kept"))).collect().head
    assert(shards.map(_._2).sum === expected.getLong(0))
    assert(shards.map(_._3).sum === expected.getLong(1))
  }

  test("span_toks is end - start + 1 and spans never overlap within a doc") {
    val spans = Dedup.qDupSpans(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(spans.nonEmpty)
    spans.foreach { case (_, s, e, n) => assert(n === e - s + 1) }
    spans.groupBy(_._1).values.foreach { ds =>
      ds.sortBy(_._2).sliding(2).foreach {
        case Array((_, _, e1, _), (_, s2, _, _)) => assert(s2 > e1, "overlapping spans")
        case _ =>
      }
    }
  }
}
