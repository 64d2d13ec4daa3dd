package graft

import graft.operators.{Inference, RobustStats, Stats, TextAnalysis}
import org.apache.spark.sql.functions._

/** Round-13 widening pins: the classical-inference additions
  * (Bartlett, Cochran's Q, McNemar) each checked against an
  * INDEPENDENT driver-side re-derivation — a different arithmetic
  * path than the operator's SQL-shaped plan.
  */
class Round13bSpec extends SparkSpec {

  private def bartlettRef(groups: Map[String, Seq[Double]]): (Double, Boolean) = {
    // textbook formula, straight Scala over sorted groups
    val ks = groups.keys.toSeq.sorted
    val nj = ks.map(g => groups(g).size.toDouble)
    val vj = ks.map { g =>
      val xs = groups(g); val n = xs.size.toDouble
      val m = xs.sum / n
      xs.map(x => (x - m) * (x - m)).sum / (n - 1)
    }
    val n = nj.sum; val k = ks.size.toDouble
    val sp2 = ks.indices.map(i => (nj(i) - 1) * vj(i)).sum / (n - k)
    val t = (n - k) * math.log(sp2) -
      ks.indices.map(i => (nj(i) - 1) * math.log(vj(i))).sum
    val c = 1.0 + (ks.indices.map(i => 1.0 / (nj(i) - 1)).sum - 1.0 / (n - k)) /
      (3.0 * (k - 1))
    (t / c, t / c > RobustStats.KruskalChiCrit(ks.size - 1))
  }

  test("q_bartlett core: hand-computed two-group fixture (equal-ish variances " +
    "→ not significant; 30x variance ratio → significant)") {
    import spark.implicits._
    // v_a = 1, v_b = 4: T = 4·ln 2.5 − 2·ln 4, C = 1.25
    val calm = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0),
      ("b", 2.0), ("b", 4.0), ("b", 6.0))
    val got = Stats.bartlettOf(calm.toDF("g", "x")).collect()(0)
    val (refT, refSig) = bartlettRef(calm.groupBy(_._1).map {
      case (g, xs) => g -> xs.map(_._2)
    })
    assert(got.getAs[Long]("k") == 2L && got.getAs[Long]("n") == 6L)
    assert(math.abs(got.getAs[Double]("stat") - refT) < 1e-6,
      s"stat ${got.getAs[Double]("stat")} vs ref $refT")
    assert(got.getAs[Boolean]("significant") == refSig && !refSig)
    // wildly heteroskedastic fixture must trip the gate
    val wild = (1 to 12).map(i => ("a", 10.0 + (i % 2))) ++
      (1 to 12).map(i => ("b", if (i % 2 == 0) 0.0 else 30.0))
    val got2 = Stats.bartlettOf(wild.toDF("g", "x")).collect()(0)
    val (refT2, refSig2) = bartlettRef(wild.groupBy(_._1).map {
      case (g, xs) => g -> xs.map(_._2)
    })
    assert(math.abs(got2.getAs[Double]("stat") - refT2) < 1e-6)
    assert(got2.getAs[Boolean]("significant") && refSig2)
  }

  test("q_cochran_q matches a full panel re-derivation from the documents table") {
    val m = RobustStats.FleissRaters
    val docs = graft.sources.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("n_chars")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val md = java.security.MessageDigest.getInstance("MD5")
    def vote(docId: Long, r: Int, base: Boolean): Int = {
      val h = md.digest(s"$docId:$r".getBytes("UTF-8"))
      val nib = (h(0) & 0xff) >> 4
      val v = if (nib < 3) !base else base
      if (v) 1 else 0
    }
    val votes = for {
      (id, nc) <- docs; r <- 0 until m
    } yield (id, r, vote(id, r, nc >= RobustStats.FleissLenThreshold))
    val gj = votes.groupBy(_._2).view.mapValues(_.map(_._3).sum).values.toSeq
    val li = votes.groupBy(_._1).view.mapValues(_.map(_._3).sum).values.toSeq
    val sg = gj.sum.toLong; val sg2 = gj.map(g => g.toLong * g).sum
    val sl = li.sum.toLong; val sl2 = li.map(l => l.toLong * l).sum
    val refQ = ((m - 1) * (m * sg2 - sg * sg)).toDouble / (m * sl - sl2).toDouble
    val got = RobustStats.qCochranQ(spark, sfDir).collect()(0)
    assert(got.getAs[Long]("n_docs") == docs.length.toLong)
    assert(got.getAs[Int]("m") == m)
    assert(math.abs(got.getAs[Double]("q") -
      math.floor(refQ * 1e6 + 0.5) / 1e6) < 1e-12,
      s"q ${got.getAs[Double]("q")} vs ref $refQ")
    assert(got.getAs[Boolean]("significant") ==
      (refQ > RobustStats.KruskalChiCrit(m - 1)))
  }

  test("q_yule_k: hand-computed spectrum on a two-doc fixture; corpus values in range") {
    val dir = java.nio.file.Files.createTempDirectory("graft-yule13").toString
    import spark.implicits._
    Seq(
      (1L, "alpha alpha beta", "en", "t", 16L),
      (2L, "alpha beta gamma", "en", "t", 16L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    // spectrum: f = (3, 2, 1) → N = 6, Σf² = 14
    // K = 10⁴(14−6)/36, D = (14−6)/(6·5)
    val r = TextAnalysis.qYuleK(spark, dir).collect()
    assert(r.length == 1)
    assert(r(0).getAs[Long]("n_types") == 3L && r(0).getAs[Long]("n_tokens") == 6L)
    assert(math.abs(r(0).getAs[Double]("yule_k") - 2222.222222) < 1e-6)
    assert(math.abs(r(0).getAs[Double]("simpson_d") - 0.266667) < 1e-6)
    // corpus: D ∈ [0, 1], K ≥ 0 for every language
    TextAnalysis.qYuleK(spark, sfDir).collect().foreach { row =>
      assert(row.getAs[Double]("yule_k") >= 0.0)
      val d = row.getAs[Double]("simpson_d")
      assert(d >= 0.0 && d <= 1.0)
    }
  }

  test("q_theil: two-language fixture decomposes exactly (within 0, between " +
    "carries all inequality, terms sum to the undecomposed total)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-theil13").toString
    import spark.implicits._
    Seq(
      (1L, "x", "aa", "t", 10L), (2L, "x", "aa", "t", 10L),
      (3L, "x", "bb", "t", 40L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = Stats.qTheil(spark, dir).collect()
      .map(r => r.getAs[String]("lang") ->
        (r.getAs[Double]("theil_within"), r.getAs[Double]("between_term"))).toMap
    // equal lengths inside each language → zero within-inequality
    assert(math.abs(rows("aa")._1) < 1e-6 && math.abs(rows("bb")._1) < 1e-6)
    assert(math.abs(rows("aa")._2 - (1.0 / 3) * math.log(0.5)) < 1e-6)
    assert(math.abs(rows("bb")._2 - (2.0 / 3) * math.log(2.0)) < 1e-6)
    // decomposition identity: Σ between (within = 0) equals the direct
    // one-group Theil of (10, 10, 40): (1/3)[ln(1/2) + 2·ln 2]
    val direct = (0.5 * math.log(0.5) * 2 + 2.0 * math.log(2.0)) / 3
    assert(math.abs(rows.values.map(_._2).sum - direct) < 1e-6)
  }

  test("q_page_trend: Page L on a monotone fixture recovers the textbook " +
    "statistic and trips; a constant-order fixture sits at the null mean") {
    import spark.implicits._
    // 10 blocks, 3 treatments ordered a<b<c with a strictly monotone
    // effect in every block: within-block ranks are always (1,2,3), so
    // R = (10, 20, 30) and L = 1·10 + 2·20 + 3·30 = 140, the maximum.
    // E = b·k(k+1)²/4 = 120, Var = b·k²(k+1)(k²−1)/144 = 20
    val mono = for (b <- 1 to 10; (g, v) <- Seq(("a", 1.0), ("b", 2.0), ("c", 3.0)))
      yield (s"b$b", g, v + b)
    val got = Stats.pageOf(mono.toDF("b", "g", "y")).collect()(0)
    assert(got.getAs[Long]("k") == 3L && got.getAs[Long]("n_blocks") == 10L)
    assert(math.abs(got.getAs[Double]("l") - 140.0) < 1e-12)
    assert(math.abs(got.getAs[Double]("z") -
      (140.0 - 120.0) / math.sqrt(20.0)) < 1e-6)
    assert(got.getAs[Boolean]("significant"))
    // anti-monotone assignment in half the blocks cancels the trend
    val flat = for (b <- 1 to 10; (g, i) <- Seq("a", "b", "c").zipWithIndex)
      yield (s"b$b", g, if (b % 2 == 0) i.toDouble else -i.toDouble)
    val got2 = Stats.pageOf(flat.toDF("b", "g", "y")).collect()(0)
    assert(math.abs(got2.getAs[Double]("l") - 120.0) < 1e-12,
      "balanced up/down blocks must land exactly on the null mean")
    assert(!got2.getAs[Boolean]("significant"))
  }

  test("q_jonckheere: hand-computed tied three-group fixture (JT = 11, " +
    "tie-corrected z) and directional sanity") {
    import spark.implicits._
    // groups 1:{1,2} 2:{2,3} 3:{3,4}: 2U = 7+8+7 = 22 → JT = 11, E = 6,
    // Var = 420/72 + 0 + 24/240 = 5.9333…
    val fx = Seq((1, 1L), (1, 2L), (2, 2L), (2, 3L), (3, 3L), (3, 4L))
    val got = RobustStats.jonckheereOf(fx.toDF("g", "x")).collect()(0)
    assert(got.getAs[Long]("k") == 3L && got.getAs[Long]("n") == 6L)
    assert(math.abs(got.getAs[Double]("jt") - 11.0) < 1e-12)
    val refZ = (11.0 - 6.0) / math.sqrt(420.0 / 72 + 24.0 / 240)
    assert(math.abs(got.getAs[Double]("z") - refZ) < 1e-6)
    assert(got.getAs[Boolean]("significant"))
    // reversing the group order must flip the sign exactly
    val rev = RobustStats.jonckheereOf(
      fx.map { case (g, x) => (4 - g, x) }.toDF("g", "x")).collect()(0)
    assert(math.abs(rev.getAs[Double]("z") + got.getAs[Double]("z")) < 1e-9)
  }

  test("q_kcore: triangle survives the 2-core peel, pendant chain peels in " +
    "round order; corpus core is a subgraph of the dup graph") {
    import spark.implicits._
    // triangle {1,2,3} + pendant 4–1 + chain tail 5–4: round 1 removes 5
    // (deg 1), round 2 removes 4 (only neighbor 1 left), {1,2,3} stable
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (1L, 4L), (4L, 5L))
      .toDF("a", "b")
    val got = graft.operators.Dedup.kcoreOf(edges).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("degree"), r.getAs[Boolean]("in_core"))).toMap
    assert(got == Map(
      1L -> (3L, true), 2L -> (2L, true), 3L -> (2L, true),
      4L -> (2L, false), 5L -> (1L, false)))
  }

  test("q_runs_test: perfect oscillation maxes the run count and trips; a " +
    "monotone series is one-sided -> NULL; corpus matches a local re-derivation") {
    import spark.implicits._
    // 21 days alternating 10, 20 → 20 nonzero diffs of alternating sign
    // → n = 20, R = 20 (every step breaks), n1 = n2 = 10
    val osc = (1 to 21).map(i =>
      ("a", f"d$i%02d", BigDecimal(if (i % 2 == 0) 20 else 10)))
    val got = Stats.runsOf(osc.toDF("g", "d", "y")).collect()(0)
    assert(got.getAs[Long]("n") == 20L && got.getAs[Long]("runs") == 20L)
    val e = 2.0 * 10 * 10 / 20 + 1
    val v = (2.0 * 10 * 10) * (2.0 * 10 * 10 - 20) / (20.0 * 20 * 19)
    assert(math.abs(got.getAs[Double]("z") - (20.0 - e) / math.sqrt(v)) < 1e-6)
    assert(got.getAs[Boolean]("significant"))
    // strictly increasing → n_down = 0 → NULL verdict
    val mono = (1 to 10).map(i => ("b", f"d$i%02d", BigDecimal(i)))
    val got2 = Stats.runsOf(mono.toDF("g", "d", "y")).collect()(0)
    assert(got2.isNullAt(got2.fieldIndex("z")))
    assert(got2.isNullAt(got2.fieldIndex("significant")))
  }

  test("q_cronbach matches a driver-side alpha over the re-derived panel") {
    val m = RobustStats.FleissRaters
    val docs = graft.sources.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("n_chars")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val md = java.security.MessageDigest.getInstance("MD5")
    def vote(docId: Long, r: Int, base: Boolean): Int = {
      val h = md.digest(s"$docId:$r".getBytes("UTF-8"))
      val v = if (((h(0) & 0xff) >> 4) < 3) !base else base
      if (v) 1 else 0
    }
    val votes = docs.map { case (id, nc) =>
      (0 until m).map(r =>
        vote(id, r, nc >= RobustStats.FleissLenThreshold)).toArray
    }
    val n = votes.length.toDouble
    def sampleVar(xs: Seq[Double]): Double = {
      val mu = xs.sum / xs.size
      xs.map(x => (x - mu) * (x - mu)).sum / (xs.size - 1)
    }
    val sumVj = (0 until m).map(r => sampleVar(votes.map(_(r).toDouble))).sum
    val varL = sampleVar(votes.map(_.sum.toDouble))
    val refAlpha = m.toDouble / (m - 1) * (1.0 - sumVj / varL)
    val got = RobustStats.qCronbach(spark, sfDir).collect()(0)
    assert(got.getAs[Long]("n_docs") == votes.length.toLong)
    assert(math.abs(got.getAs[Double]("alpha") - refAlpha) < 1e-4,
      s"alpha ${got.getAs[Double]("alpha")} vs ref $refAlpha")
  }

  test("q_mcc matches a driver-side MCC/OR over the two collected gates") {
    val g = TextAnalysis.qQualityRules(spark, sfDir)
      .select(col("doc_id"), col("passes")).collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val e = TextAnalysis.qEntropy(spark, sfDir)
      .select(col("doc_id"), col("entropy_ok")).collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val keys = g.keySet intersect e.keySet
    val a = keys.count(k => g(k) && e(k)).toDouble
    val b = keys.count(k => g(k) && !e(k)).toDouble
    val c = keys.count(k => !g(k) && e(k)).toDouble
    val d = keys.count(k => !g(k) && !e(k)).toDouble
    val row = Inference.qMcc(spark, sfDir).collect()(0)
    val den = math.sqrt((a + b) * (c + d) * (a + c) * (b + d))
    if (den != 0) {
      assert(math.abs(row.getAs[Double]("mcc") - (a * d - b * c) / den) < 1e-6)
    }
    if (a > 0 && b > 0 && c > 0 && d > 0) {
      assert(math.abs(row.getAs[Double]("odds_ratio") - a * d / (b * c)) < 1e-4)
      val se = math.sqrt(1 / a + 1 / b + 1 / c + 1 / d)
      assert(math.abs(row.getAs[Double]("log_or_lo") -
        (math.log(a * d / (b * c)) - 1.959964 * se)) < 1e-4)
    }
  }

  test("q_bleu_pairs: hand-traced BLEU-2 on the two-doc near-dup fixture " +
    "(equal lengths -> BP = 1, directional symmetry)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-bleu13").toString
    import spark.implicits._
    Seq(
      (1L, "aa bb cc dd ee aa", "en", "t", 17L),
      (2L, "aa bb cc dd ee ff", "en", "t", 17L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = graft.operators.Dedup.qBleuPairs(spark, dir).collect()
    assert(r.length == 1)
    val p = r(0)
    // m1 = 5, m2 = 4; lengths 6/6 → BP = 1 both ways;
    // bleu = √(5/6 · 4/5) = √(2/3)
    assert(p.getAs[Long]("m1") == 5L && p.getAs[Long]("m2") == 4L)
    val want = math.floor(math.sqrt(2.0 / 3.0) * 1e6 + 0.5) / 1e6
    assert(math.abs(p.getAs[Double]("bleu2_ab") - want) < 1e-9)
    assert(math.abs(p.getAs[Double]("bleu2_ba") - want) < 1e-9)
  }

  test("q_splice_pairs: tail-of-A = head-of-B fixture yields exactly the " +
    "spliced pair with the boundary window") {
    val dir = java.nio.file.Files.createTempDirectory("graft-splice13").toString
    import spark.implicits._
    Seq(
      (1L, "aa bb cc dd ee ff gg hh", "en", "t", 23L),
      (2L, "ee ff gg hh xx yy zz ww", "en", "t", 23L),
      (3L, "qq rr ss tt uu vv", "en", "t", 17L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = graft.operators.Dedup.qSplicePairs(spark, dir).collect()
    assert(r.length == 1)
    assert(r(0).getAs[Long]("doc_a") == 1L && r(0).getAs[Long]("doc_b") == 2L)
    assert(r(0).getAs[String]("window") == "ee ff gg hh")
  }

  test("q_ljung_box: period-2 oscillation trips the portmanteau and matches a " +
    "driver-side reference; a too-short series is NULL") {
    import spark.implicits._
    val n = 30
    val osc = (1 to n).map(i =>
      ("a", f"d$i%02d", BigDecimal(if (i % 2 == 0) 30 else 10)))
    val got = Stats.ljungBoxOf(osc.toDF("event_type", "day", "tot")).collect()(0)
    // independent reference: plain double autocorrelations
    val xs = (1 to n).map(i => if (i % 2 == 0) 30.0 else 10.0)
    val mu = xs.sum / n
    val d = xs.map(_ - mu)
    val den = d.map(x => x * x).sum
    val q = (1 to Stats.LjungBoxLags).map { k =>
      val rk = d.dropRight(k).zip(d.drop(k)).map { case (x, y) => x * y }.sum / den
      rk * rk / (n - k)
    }.sum * n * (n + 2)
    assert(math.abs(got.getAs[Double]("q_lb") - q) < 1e-4,
      s"q ${got.getAs[Double]("q_lb")} vs ref $q")
    assert(got.getAs[Boolean]("significant"))
    // n = 7 = h → NULL (degenerate depth)
    val short7 = (1 to 7).map(i => ("b", f"d$i%02d", BigDecimal(i)))
    val g2 = Stats.ljungBoxOf(short7.toDF("event_type", "day", "tot")).collect()(0)
    assert(g2.isNullAt(g2.fieldIndex("q_lb")))
  }

  test("q_median_test: disjoint-length two-language fixture scores the " +
    "textbook chi-square 20 and trips; corpus runs clean") {
    val dir = java.nio.file.Files.createTempDirectory("graft-mood13").toString
    import spark.implicits._
    val rows = (1 to 10).map(i => (i.toLong, "x", "aa", "t", i.toLong)) ++
      (11 to 20).map(i => (i.toLong, "x", "bb", "t", i.toLong))
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    // pooled median = 10 (nearest-rank at ceil(20/2)); aa entirely ≤,
    // bb entirely > → each group term (5²/5 + 5²/5) = 10, χ² = 20
    val got = RobustStats.qMedianTest(spark, dir).collect()(0)
    assert(got.getAs[Long]("median") == 10L)
    assert(math.abs(got.getAs[Double]("chi2") - 20.0) < 1e-9)
    assert(got.getAs[Boolean]("significant"))
    // corpus: honest result with valid margins
    val c = RobustStats.qMedianTest(spark, sfDir).collect()(0)
    assert(c.getAs[Long]("k") == 5L && c.getAs[Double]("chi2") >= 0.0)
  }

  test("q_burrows: hand-computed delta on a three-source fixture (identical " +
    "styles at 0, flipped style at sqrt(3))") {
    val dir = java.nio.file.Files.createTempDirectory("graft-burrows13").toString
    import spark.implicits._
    Seq(
      (1L, "aa aa bb", "en", "s1", 8L),
      (2L, "aa aa bb", "en", "s2", 8L),
      (3L, "bb bb aa", "en", "s3", 8L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    // f(aa) = (2/3, 2/3, 1/3): z = (0.577, 0.577, −1.155); bb mirrors →
    // Δ(s1,s2) = 0, Δ(s1,s3) = Δ(s2,s3) = √3
    val got = TextAnalysis.qBurrows(spark, dir).collect()
      .map(r => (r.getAs[String]("source_a"), r.getAs[String]("source_b")) ->
        (r.getAs[Long]("m_used"), r.getAs[Double]("delta"))).toMap
    assert(got.size == 3)
    assert(got(("s1", "s2"))._1 == 2L && got(("s1", "s2"))._2 == 0.0)
    val rt3 = math.floor(math.sqrt(3.0) * 1e6 + 0.5) / 1e6
    assert(math.abs(got(("s1", "s3"))._2 - rt3) < 1e-6)
    assert(math.abs(got(("s2", "s3"))._2 - rt3) < 1e-6)
  }

  test("q_token_budget: hand-traced water-filling on a (10,20,70) fixture; " +
    "allocations sum exactly to the budget when capping engages") {
    val dir = java.nio.file.Files.createTempDirectory("graft-wf13").toString
    import spark.implicits._
    def words(n: Int) = (1 to n).map(i => s"w$i").mkString(" ")
    Seq((1L, words(10), "en", "sa", 30L),
      (2L, words(20), "en", "sb", 60L),
      (3L, words(70), "en", "sc", 200L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    // B = 50; first feasible index i=2: C = (50−10)/2 = 20
    val got = TextAnalysis.qTokenBudget(spark, dir).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Double]("alloc"), r.getAs[Boolean]("capped"))).toMap
    assert(got("sa") == (10.0, false))
    assert(got("sb") == (20.0, false), "at-cap source keeps its mass, uncapped")
    assert(got("sc") == (20.0, true))
    assert(math.abs(got.values.map(_._1).sum - 50.0) < 1e-9)
    // corpus invariant: total allocation never exceeds the budget
    val rows = TextAnalysis.qTokenBudget(spark, sfDir).collect()
    val totM = rows.map(_.getAs[Long]("n_tokens")).sum.toDouble
    assert(rows.map(_.getAs[Double]("alloc")).sum <= totM * 0.5 + 1e-6)
  }

  test("q_cohens_h matches a driver-side arcsine recomputation from the rates") {
    val rows = TextAnalysis.qCohensH(spark, sfDir).collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      val h = 2.0 * (math.asin(math.sqrt(r.getAs[Double]("p_a"))) -
        math.asin(math.sqrt(r.getAs[Double]("p_b"))))
      // p_a/p_b are 6dp-rounded copies, so allow the rounding slack
      assert(math.abs(r.getAs[Double]("h") - h) < 1e-4)
      val mag = r.getAs[String]("magnitude")
      val ah = math.abs(r.getAs[Double]("h"))
      val want =
        if (ah < 0.2 - 1e-4) "negligible"
        else if (ah < 0.5 - 1e-4) "small"
        else if (ah < 0.8 - 1e-4) "medium" else "large"
      if (math.abs(ah - 0.2) > 1e-3 && math.abs(ah - 0.5) > 1e-3 &&
        math.abs(ah - 0.8) > 1e-3) assert(mag == want)
    }
  }

  test("q_seasonal_strength: a pure weekly pattern scores exactly 1, a " +
    "constant series is NULL, corpus values stay in [0,1]") {
    import spark.implicits._
    // 21 days, y = weekday value → residual ≡ 0 → strength = SSB/SST = 1
    val weekly = (0 until 21).map(i =>
      ("a", i % 7, BigDecimal(10 + (i % 7) * 5)))
    val got = Stats.seasonalStrengthOf(
      weekly.toDF("event_type", "weekday", "y")).collect()(0)
    assert(got.getAs[Long]("n_days") == 21L)
    assert(math.abs(got.getAs[Double]("strength") - 1.0) < 1e-9)
    assert(got.getAs[Boolean]("strongly_seasonal"))
    val const = (0 until 21).map(i => ("b", i % 7, BigDecimal(10)))
    val g2 = Stats.seasonalStrengthOf(
      const.toDF("event_type", "weekday", "y")).collect()(0)
    assert(g2.isNullAt(g2.fieldIndex("strength")))
    Stats.qSeasonalStrength(spark, sfDir).collect().foreach { r =>
      val v = r.getAs[Double]("strength")
      assert(v >= -1e-9 && v <= 1.0 + 1e-9)
    }
  }

  test("q_simpson: the textbook reversal fixture flags a strict paradox; " +
    "aligned groups do not") {
    import spark.implicits._
    def df(rows: Seq[(String, Long, BigDecimal)]) =
      rows.toDF("lang", "xx", "y")
        .select(col("lang"), col("xx").cast("decimal(18,0)").as("x"),
          col("y").cast("decimal(18,6)").as("y"))
    // within both groups y falls with x; pooled rises (group b sits
    // higher on both axes)
    val rev = Seq(
      ("a", 1L, BigDecimal(10)), ("a", 2L, BigDecimal(9)),
      ("b", 11L, BigDecimal(20)), ("b", 12L, BigDecimal(19)))
    val got = Stats.simpsonOf(df(rev)).collect()
    assert(got.forall(!_.getAs[Boolean]("slope_up")))
    assert(got.forall(_.getAs[Boolean]("pooled_up")))
    assert(got.forall(_.getAs[Boolean]("paradox")))
    // aligned: everything rises → no paradox
    val ali = Seq(
      ("a", 1L, BigDecimal(9)), ("a", 2L, BigDecimal(10)),
      ("b", 11L, BigDecimal(19)), ("b", 12L, BigDecimal(20)))
    val got2 = Stats.simpsonOf(df(ali)).collect()
    assert(got2.forall(_.getAs[Boolean]("slope_up")))
    assert(got2.forall(!_.getAs[Boolean]("paradox")))
  }

  test("q_trimmed_mean equals a local sort-and-drop per flag; trimming moves " +
    "the estimate toward the median on the skewed price tail") {
    val prices = graft.sources.Tables.lineitem(spark, sfDir)
      .select(col("l_returnflag"),
        col("l_extendedprice").cast("decimal(12,2)")).collect()
      .map(r => r.getString(0) -> r.getDecimal(1))
      .groupBy(_._1).map { case (f, xs) => f -> xs.map(_._2).sorted }
    val got = RobustStats.qTrimmedMean(spark, sfDir).collect()
      .map(r => r.getAs[String]("flag") ->
        (r.getAs[Long]("n"), r.getAs[Long]("k"),
          r.getAs[Double]("trimmed_mean"))).toMap
    prices.foreach { case (f, xs) =>
      val n = xs.length; val k = n / 10
      val kept = xs.slice(k, n - k)
      val ref = kept.map(BigDecimal(_)).sum / kept.length
      val (gn, gk, gt) = got(f)
      assert(gn == n.toLong && gk == k.toLong)
      assert(math.abs(gt - ref.toDouble) < 1e-4, s"$f: $gt vs $ref")
    }
  }

  test("q_iqr_outliers matches a local Tukey-fence count per flag") {
    val prices = graft.sources.Tables.lineitem(spark, sfDir)
      .select(col("l_returnflag"),
        col("l_extendedprice").cast("decimal(12,2)")).collect()
      .map(r => r.getString(0) -> BigDecimal(r.getDecimal(1)))
      .groupBy(_._1).map { case (f, xs) => f -> xs.map(_._2).sorted }
    val got = RobustStats.qIqrOutliers(spark, sfDir).collect()
      .map(r => r.getAs[String]("flag") ->
        (r.getAs[Long]("n_low"), r.getAs[Long]("n_high"))).toMap
    prices.foreach { case (f, xs) =>
      val n = xs.length
      def pick(p: Int) = xs(((n.toLong * p + 99) / 100).toInt - 1)
      val q1 = pick(25); val q3 = pick(75); val iqr = q3 - q1
      val lo = q1 - BigDecimal("1.5") * iqr
      val hi = q3 + BigDecimal("1.5") * iqr
      assert(got(f) == (xs.count(_ < lo).toLong, xs.count(_ > hi).toLong),
        s"fence counts diverge for $f")
    }
  }

  test("q_dedup_rate_curve: monotone in the threshold and exact against the " +
    "collected pair relation at every rung") {
    import graft.operators.Dedup
    val pairs = Dedup.qDedupJaccard(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
        r.getAs[Double]("jaccard")))
    val got = Dedup.qDedupRateCurve(spark, sfDir).collect()
      .map(r => r.getAs[Double]("threshold") ->
        (r.getAs[Long]("n_pairs"), r.getAs[Long]("n_docs"))).toMap
    assert(got.keySet == Dedup.DedupThresholds.toSet)
    Dedup.DedupThresholds.foreach { t =>
      val hit = pairs.filter(_._3 >= t)
      val docs = hit.flatMap(p => Seq(p._1, p._2)).distinct.length
      assert(got(t) == (hit.length.toLong, docs.toLong), s"rung $t diverges")
    }
    val sorted = Dedup.DedupThresholds.map(got)
    assert(sorted.sliding(2).forall {
      case Seq(a, b) => b._1 <= a._1 && b._2 <= a._2
      case _ => true
    }, "curve must be nonincreasing in the threshold")
  }

  test("q_ess matches a driver-side Kish recomputation from the sampling design") {
    import graft.operators.TextScoring
    val rows = TextScoring.qTempSampling(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("n_docs"), r.getAs[Double]("boost")))
    val sw = rows.sortBy(_._2).map { case (n, b) => n * b }.sum
    val sw2 = rows.sortBy(_._2).map { case (n, b) => n * b * b }.sum
    val got = TextScoring.qEss(spark, sfDir).collect()(0)
    assert(got.getAs[Long]("n") == rows.map(_._1).sum)
    assert(math.abs(got.getAs[Double]("ess") - sw * sw / sw2) < 1e-3)
    val frac = got.getAs[Double]("ess_frac")
    assert(frac > 0.0 && frac <= 1.0 + 1e-9,
      "Kish ESS can never exceed the sample size")
  }

  test("round-13b plans: no CartesianProduct in any fact-scanning operator; " +
    "the bounded cross joins are broadcast scalars/grids") {
    import graft.operators.{Dedup, Inference, Stats, TextAnalysis, TextScoring}
    def plan(df: org.apache.spark.sql.DataFrame): String =
      df.queryExecution.executedPlan.toString
    val plans = Map(
      "q_bartlett" -> plan(Stats.qBartlett(spark, sfDir)),
      "q_jonckheere" -> plan(RobustStats.qJonckheere(spark, sfDir)),
      "q_burrows" -> plan(TextAnalysis.qBurrows(spark, sfDir)),
      "q_yule_k" -> plan(TextAnalysis.qYuleK(spark, sfDir)),
      "q_mcnemar" -> plan(Inference.qMcnemar(spark, sfDir)),
      "q_bleu_pairs" -> plan(Dedup.qBleuPairs(spark, sfDir)),
      "q_splice_pairs" -> plan(Dedup.qSplicePairs(spark, sfDir)),
      "q_kcore" -> plan(Dedup.qKcore(spark, sfDir)),
      "q_runs_test" -> plan(Stats.qRunsTest(spark, sfDir)),
      "q_ljung_box" -> plan(Stats.qLjungBox(spark, sfDir)),
      "q_trimmed_mean" -> plan(RobustStats.qTrimmedMean(spark, sfDir)),
      "q_iqr_outliers" -> plan(RobustStats.qIqrOutliers(spark, sfDir)),
      "q_dedup_rate_curve" -> plan(Dedup.qDedupRateCurve(spark, sfDir)),
      "q_ess" -> plan(TextScoring.qEss(spark, sfDir)),
      "q_token_budget" -> plan(TextAnalysis.qTokenBudget(spark, sfDir)))
    plans.foreach { case (q, p) =>
      assert(!p.contains("CartesianProduct"), s"$q: ${p.take(800)}")
    }
    // the splice candidate generation must be an equi-join on the window
    // string (a theta formulation would plan as BroadcastNestedLoopJoin)
    assert(!plans("q_splice_pairs").contains("BroadcastNestedLoopJoin"),
      plans("q_splice_pairs").take(800))
    // jonckheere's cell-pair join is value-keyed (an equi hash/merge
    // join on x somewhere in the plan); the BroadcastNestedLoopJoins it
    // ALSO contains are the 1-row scalar assembly (jt × gm × tm), the
    // repo's adjudicated-benign broadcast(one-row-agg) pattern
    assert(plans("q_jonckheere").contains("HashJoin") ||
      plans("q_jonckheere").contains("SortMergeJoin"),
      plans("q_jonckheere").take(800))
  }

  test("q_chao1: hand-traced (1,1,2)-spectrum fixture gives 3.5; estimate " +
    "never falls below the observed vocabulary") {
    val dir = java.nio.file.Files.createTempDirectory("graft-chao13").toString
    import spark.implicits._
    // ≥3-char tokens: the cleaning chain drops 2-char words
    Seq((1L, "alpha beta gamma gamma", "en", "t", 22L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    // V = 3, f1 = 2, f2 = 1 → chao1 = 3 + 2·1/(2·2) = 3.5
    val r = TextAnalysis.qChao1(spark, dir).collect()(0)
    assert(r.getAs[Long]("n_types") == 3L && r.getAs[Long]("f1") == 2L &&
      r.getAs[Long]("f2") == 1L)
    assert(math.abs(r.getAs[Double]("chao1") - 3.5) < 1e-9)
    TextAnalysis.qChao1(spark, sfDir).collect().foreach { row =>
      assert(row.getAs[Double]("chao1") >=
        row.getAs[Long]("n_types").toDouble - 1e-9,
        "Chao1 is a lower-bound richness estimate ≥ observed types")
    }
  }

  test("q_sampler_audit matches a driver-side KS recomputation and the md5 " +
    "uniforms clear the 95% band on the corpus") {
    val md = java.security.MessageDigest.getInstance("MD5")
    val us = graft.sources.Tables.documents(spark, sfDir)
      .select("doc_id").collect().map(_.getLong(0)).map { id =>
        val hex = md.digest(id.toString.getBytes("UTF-8"))
          .map(b => f"$b%02x").mkString.take(13)
        java.lang.Long.parseLong(hex, 16).toDouble / 4503599627370496.0
      }.sorted
    val n = us.length
    val ref = us.zipWithIndex.map { case (u, i) =>
      math.max((i + 1).toDouble / n - u, u - i.toDouble / n)
    }.max
    val got = TextAnalysis.qSamplerAudit(spark, sfDir).collect()(0)
    assert(got.getAs[Long]("n") == n.toLong)
    assert(math.abs(got.getAs[Double]("d_stat") -
      math.floor(ref * 1e6 + 0.5) / 1e6) < 1e-12)
    assert(got.getAs[Boolean]("uniform_ok"),
      "the md5 sampler must clear its own uniformity band")
  }

  test("q_trimmed_mean_approx: contract flags hold and the sketch value " +
    "tracks the exact twin within 1%") {
    val approx = RobustStats.qTrimmedMeanApprox(spark, sfDir).collect()
    approx.foreach { r =>
      for (c <- Seq("bounds_ok", "trim_lo_ok", "trim_hi_ok", "mean_ok"))
        assert(r.getAs[Boolean](c), s"$c failed for ${r.getAs[String]("flag")}")
    }
    // value closeness is a SPEC bound, not a gate (the sketch value
    // isn't cross-engine reproducible): recompute the approx mean the
    // operator computes and compare against the exact twin
    val exact = RobustStats.qTrimmedMean(spark, sfDir).collect()
      .map(r => r.getAs[String]("flag") -> r.getAs[Double]("trimmed_mean")).toMap
    val prices = graft.sources.Tables.lineitem(spark, sfDir)
      .select(col("l_returnflag"), col("l_extendedprice").cast("double"))
      .collect().map(r => r.getString(0) -> r.getDouble(1))
      .groupBy(_._1).map { case (f, xs) => f -> xs.map(_._2).sorted }
    prices.foreach { case (f, xs) =>
      val n = xs.length
      val lo = xs((n * 0.1).toInt.min(n - 1))
      val hi = xs((n * 0.9).toInt.min(n - 1))
      val kept = xs.filter(x => x > lo && x < hi)
      val approxRef = kept.sum / kept.length
      assert(math.abs(approxRef - exact(f)) / exact(f) < 0.01,
        s"$f: sketch-shaped mean $approxRef vs exact ${exact(f)}")
    }
  }

  test("q_mcnemar cells and statistic match a driver-side join of the two gates") {
    val g = TextAnalysis.qQualityRules(spark, sfDir)
      .select(col("doc_id"), col("passes")).collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val e = TextAnalysis.qEntropy(spark, sfDir)
      .select(col("doc_id"), col("entropy_ok")).collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val keys = g.keySet intersect e.keySet
    val b = keys.count(k => g(k) && !e(k)).toLong
    val c = keys.count(k => !g(k) && e(k)).toLong
    val row = Inference.qMcnemar(spark, sfDir).collect()(0)
    assert(row.getAs[Long]("n_gopher_only") == b)
    assert(row.getAs[Long]("n_entropy_only") == c)
    assert(row.getAs[Long]("n_both") == keys.count(k => g(k) && e(k)).toLong)
    assert(row.getAs[Long]("n_neither") == keys.count(k => !g(k) && !e(k)).toLong)
    if (b + c == 0) {
      assert(row.isNullAt(row.fieldIndex("chi2")))
    } else {
      val num = math.max(math.abs(b - c) - 1, 0L)
      val ref = (num * num).toDouble / (b + c).toDouble
      assert(math.abs(row.getAs[Double]("chi2") -
        math.floor(ref * 1e6 + 0.5) / 1e6) < 1e-12)
      assert(row.getAs[Boolean]("significant") ==
        (ref > RobustStats.KruskalChiCrit(1)))
    }
  }
}
