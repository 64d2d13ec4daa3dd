package graft

import graft.operators.{Relational, Tpch}
import org.apache.spark.sql.functions._

/** Round-9 hardening: the distributed prefix-max primitive, non-vacuity
  * pins for the de-vacuated TPC-H gates, and engine-divergence clamps —
  * invariants a hash-compare alone doesn't pin down. */
class Round9Spec extends SparkSpec {

  // ---------------- Ranks.globalPrefixMax ----------------

  test("globalPrefixMax matches the one-task window reference, ties and duplicates included") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // values deliberately non-monotone with duplicates and a tie on the
    // sort key so partition boundaries and tie order are both exercised
    val rows = Seq(
      (1L, 5L), (2L, 3L), (3L, 9L), (4L, 9L), (5L, 1L),
      (6L, 12L), (7L, 2L), (8L, 12L), (9L, 7L), (10L, 0L))
    val df = rows.toDF("k", "v").repartition(4)
    val got = graft.functions.Ranks.globalPrefixMax(df, "v", col("k").asc)
      .select("k", "max_before").as[(Long, Option[Long])].collect().toMap
    val w = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, -1)
    val ref = df.withColumn("mb", max(col("v")).over(w))
      .select(col("k"), col("mb")).as[(Long, Option[Long])].collect().toMap
    assert(got === ref)
    assert(got(1L).isEmpty, "global first row has no strict predecessor")
  }

  test("globalPrefixMax survives more partitions than rows (empty partitions)") {
    import spark.implicits._
    val df = Seq((1L, 4L), (2L, 2L)).toDF("k", "v")
    val got = graft.functions.Ranks.globalPrefixMax(df, "v", col("k").asc)
      .select("k", "max_before").as[(Long, Option[Long])].collect().toMap
    assert(got === Map(1L -> None, 2L -> Some(4L)))
  }

  // ---------------- de-vacuated gates stay non-vacuous ----------------

  test("formerly vacuous gates return real rows on the driver corpus") {
    assert(Tpch.q20Excess(spark, sfDir).count() > 0, "q20_excess vacuous again")
    assert(Tpch.q22Idle(spark, sfDir).count() > 0, "q22_idle vacuous again")
    assert(Relational.qAntijoin(spark, sfDir).count() > 0, "q_antijoin vacuous again")
  }

  test("antijoin keeps exactly the customers with no post-cutoff order") {
    val lapsed = Relational.qAntijoin(spark, sfDir)
      .select("c_custkey").collect().map(_.getLong(0)).toSet
    val recent = graft.sources.Tables.orders(spark, sfDir)
      .filter(col("o_orderdate") >= lit("2001-01-01").cast("timestamp"))
      .select("o_custkey").collect().map(_.getLong(0)).toSet
    val all = graft.sources.Tables.customer(spark, sfDir)
      .select("c_custkey").collect().map(_.getLong(0)).toSet
    assert(lapsed === all.diff(recent))
    assert(lapsed.nonEmpty && recent.nonEmpty, "both sides must bite")
  }

  // ---------------- sketch accuracy certificates ----------------

  test("simhash audit: every exact pair respects its banded hamming ceiling") {
    val a = graft.operators.Dedup.qSimhashAudit(spark, sfDir)
    val n = a.count()
    assert(n === graft.operators.Dedup.qDedupJaccard(spark, sfDir).count(),
      "audit must cover exactly the exact-Jaccard pair set")
    assert(a.filter(!col("hamming_ok")).count() === 0L)
    assert(n > 0L, "no exact pairs on the fixture: vacuous audit")
  }

  test("simhash audit: identical token streams collide exactly (hamming 0)") {
    import spark.implicits._
    val docs = Seq((1L, "alpha beta gamma delta"), (2L, "alpha beta gamma delta"),
      (3L, "omega psi chi phi")).toDF("doc_id", "text")
    val sh = docs.select(col("doc_id"),
      graft.functions.HashKernelCols.simhash64(
        graft.functions.TextFns.rawTokens(col("text"))).as("h"))
    val hs = sh.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hs(1L) === hs(2L), "identical docs must have identical simhash")
    assert(hs(1L) !== hs(3L), "distinct docs should differ on this fixture")
  }

  test("cosine LSH audit: one row, recall floor holds, ground truth non-empty") {
    val rows = graft.operators.Dedup.qCosineLshAudit(spark, sfDir).collect()
    assert(rows.length === 1)
    assert(rows(0).getAs[Long]("n_pairs") > 0L, "vacuous audit: no exact pairs")
    assert(rows(0).getAs[Boolean]("recall_ok"), "LSH recall fell below the floor")
  }

  // ---------------- robust stats additions ----------------

  test("mad matches a local nearest-rank reference computation per group") {
    import graft.operators.RobustStats
    val got = RobustStats.qMad(spark, sfDir).collect()
      .map(r => r.getString(0) -> r).toMap
    val local = graft.sources.Tables.lineitem(spark, sfDir)
      .select(col("l_returnflag"),
        col("l_extendedprice").cast("decimal(12,2)").as("p"))
      .collect().map(r => (r.getString(0), r.getDecimal(1)))
      .groupBy(_._1).map { case (f, rows) => f -> rows.map(_._2).sorted }
    assert(got.keySet === local.keySet)
    local.foreach { case (f, sortedPrices) =>
      val n = sortedPrices.length
      val k = (n * 50 + 99) / 100
      val med = sortedPrices(k - 1)
      val devs = sortedPrices.map(p => p.subtract(med).abs).sorted
      val mad = devs(k - 1)
      // r10: med/mad leave as round(double, 6) — exact 2-decimal values,
      // so the comparison against the local BigDecimal reference is an
      // exact double equality, not a tolerance
      assert(got(f).getAs[Double]("med") === med.doubleValue,
        s"median mismatch for $f")
      assert(got(f).getAs[Double]("mad") === mad.doubleValue,
        s"mad mismatch for $f")
      assert(got(f).getAs[Long]("n") === n.toLong)
    }
  }

  test("wasserstein-1 of a shifted copy equals the shift exactly") {
    import spark.implicits._
    val a = (1 to 40).map(i => ("a", (i % 7) * 3L))
    val b = a.map { case (_, x) => ("b", x + 7L) } // pure translation
    val out = graft.operators.RobustStats
      .w1Pairs((a ++ b).toDF("g", "x")).collect()
    assert(out.length === 1)
    assert(out(0).getAs[Double]("w1") === 7.0,
      "W1 between a distribution and its c-shift is exactly c")
  }

  test("wasserstein matrix: every language pair, non-negative, n columns consistent") {
    val rows = graft.operators.RobustStats.qWasserstein(spark, sfDir).collect()
    val langs = graft.sources.Tables.documents(spark, sfDir)
      .select("lang").distinct().count()
    assert(rows.length === (langs * (langs - 1) / 2).toInt)
    rows.foreach(r => assert(r.getAs[Double]("w1") >= 0.0))
  }

  test("js divergence terms: pointwise non-negative (log-sum inequality), full grid") {
    val rows = graft.operators.RobustStats.qJsTerms(spark, sfDir).collect()
    assert(rows.nonEmpty)
    // every term contribution respects the log-sum lower bound of 0 and
    // the ln 2 mixture ceiling
    rows.foreach { r =>
      val t = r.getAs[Double]("js_term")
      assert(t >= -1e-9 && t < math.log(2.0))
      assert(r.getAs[Long]("ca") >= 1 && r.getAs[Long]("cb") >= 1,
        "add-one smoothing floors every cell at 1")
    }
    val pairs = rows.map(r => (r.getAs[String]("lang_a"), r.getAs[String]("lang_b")))
      .distinct
    val langs = graft.sources.Tables.documents(spark, sfDir)
      .select("lang").distinct().count().toInt
    assert(pairs.length === langs * (langs - 1) / 2, "every language pair present")
    val perPair = rows.groupBy(r => (r.getAs[String]("lang_a"), r.getAs[String]("lang_b")))
      .values.map(_.length).toSet
    assert(perPair.size === 1, "identical term grid per pair")
  }

  test("krippendorff: alpha is a valid agreement coefficient on the panel") {
    val r = graft.operators.RobustStats.qKrippendorff(spark, sfDir).head()
    val (dO, dE, alpha) = (r.getAs[Double]("d_o"), r.getAs[Double]("d_e"),
      r.getAs[Double]("alpha"))
    assert(dO >= 0.0 && dE > 0.0)
    assert(alpha <= 1.0 && alpha >= -1.0)
    assert(math.abs(alpha - (1.0 - dO / dE)) < 2e-6, "alpha ties to its parts")
    // flip probability 3/16 per rater => substantial but imperfect agreement
    assert(alpha > 0.2 && alpha < 0.99)
  }

  test("auc: the quality score is a genuinely discriminative ranker for the gate") {
    val r = graft.operators.Evaluation.qAuc(spark, sfDir).head()
    val (auc, gini) = (r.getAs[Double]("auc"), r.getAs[Double]("gini"))
    assert(auc > 0.5 && auc < 1.0,
      "AUC at chance or perfect would make the gate vacuous")
    assert(math.abs(gini - (2 * auc - 1)) < 2e-6)
    assert(r.getAs[Long]("n_pos") > 0 && r.getAs[Long]("n_neg") > 0,
      "both classes must be present")
  }

  test("changepoint: localization lands inside the observed range, stat non-negative") {
    val rows = graft.operators.Stats.qChangepoint(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Double]("cp_stat") >= 0.0)
      assert(r.getAs[Long]("n_days") > 1)
      val d = r.getAs[String]("cp_day")
      assert(d >= "2020-01-01" && d <= "2030-12-31")
    }
    // the argmax tie-break makes the result a pure function of the data
    val again = graft.operators.Stats.qChangepoint(spark, sfDir).collect()
    assert(rows.map(_.toString).sorted.sameElements(again.map(_.toString).sorted))
  }

  test("oov: rates in [0,1], token totals partition by language, vocab coverage real") {
    val rows = graft.operators.TextPrep.qOov(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, oov) = (r.getAs[Long]("n_toks"), r.getAs[Long]("n_oov"))
      assert(oov >= 0 && oov <= n)
      val rate = r.getAs[Double]("oov_rate")
      assert(rate >= 0.0 && rate <= 1.0)
      assert(rate < 1.0, "a fully-OOV language would mean a broken vocab join")
    }
  }

  test("ctfidf: k terms per source, deterministic rank order, weights finite") {
    val rows = graft.operators.TextAnalysis.qCtfidf(spark, sfDir).collect()
    val bySrc = rows.groupBy(_.getAs[String]("source"))
    bySrc.foreach { case (_, rs) =>
      assert(rs.length <= graft.operators.TextAnalysis.CtfidfTopK)
      val ranks = rs.map(_.getAs[Int]("rank")).sorted
      assert(ranks.sameElements(1 to rs.length), "dense ranks from 1")
      val ws = rs.sortBy(_.getAs[Int]("rank")).map(_.getAs[Double]("ctfidf"))
      assert(ws.zip(ws.tail).forall { case (a, b) => a >= b }, "ranked by weight desc")
      ws.foreach(w => assert(!w.isNaN && !w.isInfinite))
    }
  }

  test("isotonic: the fitted calibration map is monotone with probabilities in range") {
    val rows = graft.operators.Classification.qIsotonic(spark, sfDir).collect()
      .sortBy(_.getAs[Int]("idx"))
    assert(rows.length >= 2, "a constant map would make the gate vacuous")
    val bs = rows.map(_.getAs[Double]("boundary"))
    val ps = rows.map(_.getAs[Double]("calibrated"))
    assert(bs.zip(bs.tail).forall { case (a, b) => a <= b }, "boundaries sorted")
    assert(ps.zip(ps.tail).forall { case (a, b) => a <= b }, "isotonic: non-decreasing")
    ps.foreach(p => assert(p >= 0.0 && p <= 1.0))
  }

  test("poisson bootstrap: B resamples, effective sizes near n, means spread around the truth") {
    val rows = graft.operators.Stats.qBootstrap(spark, sfDir).collect()
    assert(rows.length === graft.operators.Stats.BootstrapB)
    val n = graft.sources.Tables.events(spark, sfDir).count()
    rows.foreach { r =>
      val nEff = r.getAs[Long]("n_eff")
      // Poisson(1) multiplicities: E[n_eff] = n, sd ~ sqrt(n) — 6 sigma box
      assert(math.abs(nEff - n) <= 6 * math.sqrt(n.toDouble) + 6,
        s"n_eff $nEff implausible for n $n")
    }
    val means = rows.map(_.getAs[Double]("mean"))
    assert(means.distinct.length > 1, "resamples must actually differ")
  }

  test("hill terms: non-negative, non-increasing in rank, k-1 rows") {
    val rows = graft.operators.Stats.qHill(spark, sfDir).collect()
      .sortBy(_.getAs[Int]("rank"))
    assert(rows.length === graft.operators.Stats.HillK - 1)
    val terms = rows.map(_.getAs[Double]("hill_term"))
    assert(terms.forall(_ >= 0.0), "x_(i) >= x_(k) for i < k")
    assert(terms.zip(terms.tail).forall { case (a, b) => a >= b - 1e-9 },
      "order statistics decrease, so do the log ratios")
  }

  test("l-diversity: flag trips on a skewed fixture and clears on a diverse one") {
    import spark.implicits._
    val skewed = (1 to 40).map(i => ("xx", "s1", if (i <= 38) 100 else i * 200)) // one band dominates
    val diverse = (1 to 40).map(i => ("yy", "s2", (i % 8) * 250)) // 8 distinct bands, none >half
    val out = graft.operators.RobustStats
      .ldiversityOf(skewed.union(diverse).toDF("lang", "source", "n_chars"))
      .collect().map(r => r.getString(0) -> r.getAs[Boolean]("at_risk")).toMap
    assert(out("xx"), "dominant-band class must be flagged")
    assert(!out("yy"), "diverse class must be safe")
  }

  test("gini: per-language coefficients in [0,1), counts partition the corpus") {
    val rows = graft.operators.Stats.qGini(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val n = rows.map(_.getAs[Long]("n")).sum
    assert(n === graft.sources.Tables.documents(spark, sfDir).count())
    rows.foreach { r =>
      val g = r.getAs[Double]("gini")
      assert(g >= 0.0 && g < 1.0, s"gini $g out of range")
    }
  }

  test("kendall: tau_b in [-1,1], pair counts bounded by n0") {
    val rows = graft.operators.Stats.qKendall(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val nd = r.getAs[Long]("n_days")
      val n0 = nd * (nd - 1) / 2
      assert(r.getAs[Long]("nc") + r.getAs[Long]("nd") <= n0)
      val t = r.getAs[Double]("tau_b")
      assert(t >= -1.0 && t <= 1.0, s"tau_b $t out of range")
    }
  }

  test("dispersion: fano positive and the flag is exactly fano > 1") {
    val rows = graft.operators.Stats.qDispersion(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val f = r.getAs[Double]("fano")
      assert(f > 0.0)
      // the flag is computed in exact integers; rounded fano must agree
      // except exactly at the boundary
      if (math.abs(f - 1.0) > 1e-6)
        assert(r.getAs[Boolean]("overdispersed") === (f > 1.0))
    }
  }

  test("kaplan-meier: at-risk counts telescope and factors stay in [0,1]") {
    val rows = graft.operators.Stats.qKaplanMeier(spark, sfDir).collect()
      .sortBy(_.getAs[Int]("t_days"))
    assert(rows.nonEmpty)
    val users = graft.sources.Tables.events(spark, sfDir)
      .select("user_id").distinct().count()
    assert(rows.head.getAs[Long]("n_at_risk") === users)
    rows.sliding(2).foreach {
      case Array(a, b) =>
        // r_{t+1} = r_t - d_t over the distinct observed lifetimes
        assert(b.getAs[Long]("n_at_risk") ===
          a.getAs[Long]("n_at_risk") - a.getAs[Long]("n_deaths"))
      case _ =>
    }
    rows.foreach { r =>
      val s = r.getAs[Double]("surv_factor")
      assert(s >= 0.0 && s <= 1.0)
    }
  }

  test("good-turing: N_r table internally consistent, r* recomputes exactly") {
    val rows = graft.operators.TextScoring.qGoodTuring(spark, sfDir).collect()
    assert(rows.nonEmpty && rows.length <= graft.operators.TextScoring.GoodTuringMaxR)
    rows.foreach { r =>
      val (rr, nr, nr1) = (r.getAs[Int]("r"), r.getAs[Long]("n_r"), r.getAs[Long]("n_r1"))
      assert(nr > 0)
      val expect = math.floor(((rr + 1) * nr1).toDouble / nr * 1e6 + 0.5) / 1e6
      assert(math.abs(r.getAs[Double]("r_star") - expect) < 1e-9)
    }
  }

  test("llr: top-k positive G2 scores with deterministic ordering") {
    val rows = graft.operators.TextAnalysis.qLlr(spark, sfDir).collect()
    assert(rows.length === graft.operators.TextAnalysis.LlrTopK)
    val scores = rows.map(_.getAs[Double]("g2"))
    assert(scores.forall(_ >= 0.0), "G2 is a deviance — non-negative")
    assert(scores.sorted.reverse.sameElements(scores) ||
      scores.sorted(Ordering[Double].reverse).sameElements(scores))
  }

  test("q11: every important part exceeds 1.5x the mean regional part value") {
    import org.apache.spark.sql.functions._
    val rows = graft.operators.Tpch.q11Value(spark, sfDir).collect()
    assert(rows.nonEmpty)
    // recompute the regional per-part mean independently of the operator
    val eurNat = graft.sources.Tables.nation(spark, sfDir)
      .join(graft.sources.Tables.region(spark, sfDir).filter(col("r_name") === "EUROPE"),
        col("n_regionkey") === col("r_regionkey"))
      .select("n_nationkey")
    val sup = graft.sources.Tables.supplier(spark, sfDir)
      .join(eurNat, col("s_nationkey") === col("n_nationkey")).select("s_suppkey")
    val v = graft.sources.Tables.lineitem(spark, sfDir)
      .join(sup, col("l_suppkey") === col("s_suppkey"))
      .groupBy("l_partkey")
      .agg(sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double").as("value"))
      .agg(sum(col("value")).as("tot"), count(lit(1)).as("nparts")).collect().head
    val mean = v.getAs[Double]("tot") / v.getAs[Long]("nparts")
    rows.foreach(r => assert(r.getAs[Double]("value") > 1.5 * mean - 0.01,
      s"${r.getAs[Double]("value")} not above 1.5x mean $mean"))
  }

  test("novelty: every shingle counts itself, so mean df >= 1") {
    val rows = graft.operators.Dedup.qNovelty(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_tri") > 0)
      assert(r.getAs[Double]("mean_df") >= 1.0)
    }
  }

  test("dq checks: planted orphan trips the FK core; real FKs hold, coverage fails") {
    import spark.implicits._
    val child = Seq((1, "a"), (2, "b"), (99, "orphan")).toDF("k", "v")
    val parent = Seq((1, "x"), (2, "y"), (3, "z")).toDF("pk", "w")
    val f = graft.operators.Stats.fkCheck("t", child, "k", parent, "pk").collect().head
    assert(f.getAs[Long]("n_violations") === 1L && !f.getAs[Boolean]("pass"))
    val out = graft.operators.Stats.qDqChecks(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getAs[Boolean]("pass")).toMap
    assert(out("lineitem_fk_orders") && out("orders_fk_customer"))
    assert(!out("orders_have_lineitems"), "driver corpus has childless orders")
  }

  test("embed outliers: every flagged vector is below tau") {
    val rows = graft.operators.SimilaritySearch.qEmbedOutliers(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getAs[Double]("cos") <
      graft.operators.SimilaritySearch.EmbedOutlierTau + 1e-6))
  }

  test("ttr: types bounded by tokens, ratio in (0,1]") {
    val rows = graft.operators.TextAnalysis.qTtr(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Int]("n_types") <= r.getAs[Int]("n_tokens"))
      val t = r.getAs[Double]("ttr")
      assert(t > 0.0 && t <= 1.0)
    }
  }

  test("burstiness: cf >= df so burst >= 1, ranked descending") {
    val rows = graft.operators.TextAnalysis.qBurstiness(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val bs = rows.map(_.getAs[Double]("burst"))
    assert(bs.forall(_ >= 1.0))
    assert(bs.zip(bs.tail).forall { case (a, b) => a >= b })
  }

  test("bfs depth: one depth-0 node per cluster, all graph nodes reached") {
    val depths = graft.operators.Dedup.qBfsDepth(spark, sfDir).collect()
    assert(depths.nonEmpty)
    val clusters = graft.operators.Dedup.qDedupClusters(spark, sfDir)
    val nClusters = clusters.select("cluster_id").distinct().count()
    val nNodes = clusters.count()
    assert(depths.count(_.getAs[Int]("depth") == 0) === nClusters)
    assert(depths.length === nNodes)
    depths.foreach(r => assert(r.getAs[Int]("depth") >= 0))
  }

  test("lorenz: shares sum to 1, cumulative curve is convex-increasing") {
    val rows = graft.operators.Stats.qLorenz(spark, sfDir).collect()
      .sortBy(_.getAs[Int]("decile"))
    assert(rows.length === 10)
    val cum = rows.map(_.getAs[Double]("cum_share"))
    assert(math.abs(cum.last - 1.0) < 1e-5)
    assert(cum.zip(cum.tail).forall { case (a, b) => b >= a })
    // NOTE: per-decile SHARES need not be monotone — ntile hands its
    // remainder rows to the FIRST tiles, so with near-constant lengths an
    // early decile can out-mass a later one; only the cumulative curve
    // and the mass partition are operator invariants.
    val mass = rows.map(_.getAs[Long]("mass")).sum
    val n = rows.map(_.getAs[Long]("n")).sum
    assert(n === graft.sources.Tables.documents(spark, sfDir).count())
    assert(mass > 0)
  }

  test("cramers v: effect size in [0,1] with consistent dimensions") {
    val r = graft.operators.RobustStats.qCramersV(spark, sfDir).collect().head
    val v = r.getAs[Double]("cramers_v")
    assert(v >= 0.0 && v <= 1.0)
    assert(r.getAs[Double]("chi2") >= 0.0)
    assert(r.getAs[Long]("r") > 1 && r.getAs[Long]("c") > 1)
  }

  test("concordance: contexts bounded by the window, hits are real positions") {
    val rows = graft.operators.TextAnalysis.qConcordance(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Int]("pos") >= 1)
      val ctx = graft.operators.TextAnalysis.ConcordanceCtx
      assert(r.getAs[String]("left_ctx").split(" ").count(_.nonEmpty) <= ctx)
      assert(r.getAs[String]("right_ctx").split(" ").count(_.nonEmpty) <= ctx)
    }
  }

  test("jackknife: pseudo-values average back to the full-sample mean") {
    val rows = graft.operators.Stats.qJackknife(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val n = rows.map(_.getAs[Long]("n_i")).sum
    val sx = rows.map(_.getAs[Long]("sx_i")).sum
    val theta = sx.toDouble / n
    // mean of pseudo-values ~= g*theta - (g-1)*mean(loo) which recenters on theta
    val ps = rows.map(_.getAs[Double]("pseudo_value"))
    val loo = rows.map(_.getAs[Double]("loo_mean"))
    assert(loo.forall(m => m > 0))
    assert(math.abs(ps.sum / ps.length - theta) < theta * 0.5,
      "pseudo-values must recenter near the full-sample mean")
  }

  test("salted join: salt column in the plan, result identical to the plain join") {
    val salted = graft.operators.Relational.qSaltedJoin(spark, sfDir)
    val plan = salted.queryExecution.optimizedPlan.toString
    assert(plan.contains("salt"), "the salt key must survive into the join")
    val plain = {
      import org.apache.spark.sql.functions._
      val ev = graft.sources.Tables.events(spark, sfDir)
        .select(col("user_id"), col("event_type"))
      val dim = graft.sources.Tables.events(spark, sfDir)
        .groupBy("user_id")
        .agg(date_format(min(col("ts")), "yyyy-MM-dd").as("first_day"))
      ev.join(dim, Seq("user_id"))
        .groupBy("event_type", "first_day")
        .agg(count(lit(1)).as("n"), countDistinct(col("user_id")).as("n_users"))
    }
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty,
      "salting must be semantics-preserving")
  }

  test("holt: level tracks the daily series, trend finite, one row per day") {
    val rows = graft.operators.Stats.qHolt(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val byType = rows.groupBy(_.getString(0))
    byType.foreach { case (_, rs) =>
      assert(rs.map(_.getString(1)).distinct.length === rs.length, "one row per day")
      rs.foreach { r =>
        assert(!r.getAs[Double]("level").isNaN && !r.getAs[Double]("trend").isNaN)
      }
    }
  }

  test("seasonal: weekday residuals center near zero per weekday group") {
    val rows = graft.operators.Stats.qSeasonal(spark, sfDir).collect()
    assert(rows.nonEmpty)
    // residual = y - weekday mean, so per (type, weekday) they sum to ~0
    rows.groupBy(r => (r.getString(0), r.getAs[Int]("weekday"))).foreach {
      case (_, rs) =>
        val s = rs.map(_.getAs[Double]("residual")).sum
        assert(math.abs(s) < 0.01 * rs.length + 0.01, s"residual sum $s not centered")
    }
  }

  test("mrl audit: one row per query, ranks positive, overlap bounded by 5") {
    val rows = graft.operators.SimilaritySearch.qMrlAudit(spark, sfDir).collect()
    assert(rows.length === 10)
    rows.foreach { r =>
      assert(r.getAs[Int]("trunc_rank_of_top1") >= 1)
      val o = r.getAs[Long]("overlap5")
      assert(o >= 0 && o <= 5)
    }
  }

  test("ab sequential: one look per day, warn flag is exactly |z| > 1") {
    val rows = graft.operators.Stats.qAbSequential(spark, sfDir).collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getString(0)).distinct.length === rows.length)
    rows.foreach { r =>
      val z = r.getAs[Double]("z")
      assert(!z.isNaN)
      if (math.abs(math.abs(z) - 1.0) > 1e-6)
        assert(r.getAs[Boolean]("warn") === (math.abs(z) > 1.0))
    }
    // cumulative looks: arm sizes are non-decreasing over days
    val sorted = rows.sortBy(_.getString(0))
    sorted.sliding(2).foreach {
      case Array(a, b) =>
        assert(b.getAs[Long]("na") >= a.getAs[Long]("na"))
        assert(b.getAs[Long]("nb") >= a.getAs[Long]("nb"))
      case _ =>
    }
  }

  // ---------------- truncated stick-breaking HDP ----------------

  test("hdp: stick posterior is a valid truncated stick-breaking measure") {
    val t = graft.operators.TopicModeling.HdpTruncation
    val rows = graft.operators.TopicModeling.qHdp(spark, sfDir).collect()
    assert(rows.length === t, "one row per truncation stick")
    val betas = rows.map(_.getAs[Double]("beta"))
    assert(betas.sum <= 1.0 + 1e-6, "stick weights must sum below one")
    assert(betas.forall(_ >= 0.0))
    rows.foreach { r =>
      assert(r.getAs[Double]("stick_a") >= 1.0 - 1e-6, "Beta prior a=1 floor")
      assert(r.getAs[Double]("stick_b") >=
        graft.operators.TopicModeling.HdpGamma - 1e-6, "Beta prior b=gamma floor")
    }
    val kept = rows.filter(_.getAs[Boolean]("kept"))
    assert(kept.nonEmpty, "the posterior must keep at least one topic")
    kept.foreach(r => assert(r.getAs[Double]("beta") >=
      graft.operators.TopicModeling.HdpBetaThreshold - 1e-6))
    // sticks are usage-ordered: stick_a (1 + corpus mass) is non-increasing
    val as = rows.sortBy(_.getAs[Int]("stick")).map(_.getAs[Double]("stick_a"))
    assert(as.zip(as.tail).forall { case (x, y) => x >= y - 1e-6 })
  }

  // ---------------- engine-divergence clamps ----------------

  test("benford digit clamp pins boundary values into 1..9") {
    import spark.implicits._
    // the exact expression qBenford applies, on values where a 1-ulp
    // log10 difference could shift the exponent floor
    val vals = Seq(1.0, 10.0, 100.0, 1000.0, 9.999999999999998, 0.1, 0.01)
    val d = vals.toDF("value")
      .select(least(greatest(
        floor(col("value") / pow(lit(10.0), floor(log10(col("value"))))), lit(1)), lit(9))
        .cast("int").as("d"))
      .as[Int].collect()
    assert(d.forall(x => x >= 1 && x <= 9))
    assert(d.take(4).forall(_ === 1), "powers of ten lead with digit 1")
  }

  test("dp_counts uniform clamp keeps the log argument strictly positive") {
    import spark.implicits._
    val u = Seq(0.0, 2.220446049250313e-16, 0.5, 1.0 - 2.220446049250313e-16)
      .toDF("u0")
      .select(greatest(col("u0"), lit(2.220446049250313e-16)).as("u"))
      .select(
        when(col("u") >= 0.5, -log(lit(2.0) * (lit(1.0) - col("u"))))
          .otherwise(log(lit(2.0) * col("u"))).as("noise"))
      .as[Double].collect()
    assert(u.forall(v => !v.isNaN && !v.isInfinite))
  }

  // ---------------- effect sizes & sequential inference ----------------

  test("cliffs delta: full dominance hits ±1, identical samples sit at 0") {
    import spark.implicits._
    val dom = Seq(("a", 10), ("a", 20), ("a", 30), ("b", 1), ("b", 2), ("b", 3))
      .toDF("g", "x")
    val r = graft.operators.Inference.cliffsDeltaPairs(dom).collect().head
    assert(r.getAs[Long]("wins") === 9L && r.getAs[Long]("losses") === 0L)
    assert(r.getAs[Double]("delta") === 1.0)
    assert(r.getAs[String]("magnitude") === "large")
    val same = Seq(("a", 5), ("a", 7), ("b", 5), ("b", 7)).toDF("g", "x")
    val r2 = graft.operators.Inference.cliffsDeltaPairs(same).collect().head
    assert(r2.getAs[Double]("delta") === 0.0)
    assert(r2.getAs[String]("magnitude") === "negligible")
  }

  test("cliffs delta agrees with mann-whitney U: d = 2U/(n_a n_b) − 1") {
    val vals = graft.sources.Tables.documents(spark, sfDir)
      .select(col("lang").as("g"), col("n_chars").as("x"))
    val d = graft.operators.Inference.cliffsDeltaPairs(vals)
      .select("g_a", "g_b", "n_a", "n_b", "delta").collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    val u = graft.operators.RobustStats.mannWhitneyPairs(vals)
      .select("g_a", "g_b", "u1").collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(d.keySet === u.keySet)
    d.foreach { case (k, (na, nb, delta)) =>
      // U1 counts b-over-a wins (+ half-ties): delta = 1 − 2U1/(na·nb)
      val viaU = 1.0 - 2.0 * u(k) / (na * nb)
      assert(math.abs(delta - viaU) < 1e-5, s"$k: $delta vs $viaU")
    }
  }

  test("cohens d: a one-sd shift lands near d=1 and hedges shrinks toward zero") {
    import spark.implicits._
    // two spread-out groups, b shifted by exactly one pooled sd ≈ 10
    val a = (1 to 50).map(i => ("a", 100 + (i % 21 - 10) * 3))
    val b = (1 to 50).map(i => ("b", 110 + (i % 21 - 10) * 3))
    val r = graft.operators.Inference.cohensDPairs((a ++ b).toDF("g", "x"))
      .collect().head
    val d = r.getAs[Double]("d")
    val g = r.getAs[Double]("g_hedges")
    assert(d < 0.0, "mean_a < mean_b ⇒ negative d")
    assert(math.abs(d) > 0.3, "a visible shift must not read as negligible")
    assert(math.abs(g) < math.abs(d), "hedges correction shrinks |d|")
    // d and g_hedges are independently round(…,6)ed, so the identity
    // holds to the rounding grain, not machine epsilon
    assert(math.abs(g - d * (1.0 - 3.0 / (4.0 * 100 - 9))) < 2e-6)
  }

  test("theil-sen: recovers a clean slope through one wild outlier day, OLS does not") {
    import spark.implicits._
    // y = 7 + 2t except the LAST day spikes to 1000 (max OLS leverage —
    // a mid-series spike barely moves the fit): the pairwise-slope
    // median holds 2.0 while the OLS fit is dragged off by the outlier
    val daily = (1 to 20).map { t =>
      val y = if (t == 20) BigDecimal(1000) else BigDecimal(7 + 2 * t)
      ("purchase", f"2024-02-$t%02d", y)
    }.toDF("event_type", "day", "tot")
      .select(col("event_type"), col("day"), col("tot").cast("decimal(18,6)").as("tot"))
    val r = graft.operators.Inference.theilSenOf(daily).collect().head
    assert(r.getAs[Long]("n_pairs") === 190L)
    assert(math.abs(r.getAs[Double]("ts_slope") - 2.0) < 1e-9, "median slope is robust")
    assert(math.abs(r.getAs[Double]("ols_slope") - 2.0) > 1.0, "OLS is not")
  }

  test("bh fdr: p-values calibrate, adjustment is monotone and never below raw p") {
    import spark.implicits._
    // the A-S erfc tail at the textbook z values
    val p = Seq(0.0, 1.959963985, 2.575829304).toDF("z")
      .select(col("z"),
        graft.operators.Inference.pForSpec(col("z")).as("p"))
      .as[(Double, Double)].collect().toMap
    assert(math.abs(p(0.0) - 1.0) < 1e-6)
    assert(math.abs(p(1.959963985) - 0.05) < 1e-4)
    assert(math.abs(p(2.575829304) - 0.01) < 1e-4)
    val rows = graft.operators.Inference.qBhFdr(spark, sfDir)
      .orderBy("rank").collect()
    assert(rows.length === 10, "ten language pairs")
    rows.foreach { r =>
      assert(r.getAs[Double]("adj_p") >= r.getAs[Double]("p") - 1e-12)
      assert(r.getAs[Double]("adj_p") <= 1.0)
    }
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(b.getAs[Double]("adj_p") >= a.getAs[Double]("adj_p") - 1e-12,
          "BH adjusted p is monotone in rank")
      case _ =>
    }
    // rejections, if any, form a prefix of the rank order
    val rej = rows.map(_.getAs[Boolean]("rejected"))
    assert(!rej.dropWhile(identity).contains(true), "rejection set is a rank prefix")
  }

  test("page-hinkley: stationary series stays quiet, a level shift trips the alarm") {
    import spark.implicits._
    def series(shiftFrom: Int, shiftTo: BigDecimal): Seq[(String, String, BigDecimal)] =
      (1 to 30).map { t =>
        val base = BigDecimal(100 + (t % 3))   // mild stationary wiggle
        ("view", f"2024-03-$t%02d", if (t >= shiftFrom) shiftTo else base)
      }
    def run(s: Seq[(String, String, BigDecimal)]) =
      graft.operators.Inference.pageHinkleyOf(
        s.toDF("event_type", "day", "tot")
          .select(col("event_type"), col("day"),
            col("tot").cast("decimal(18,6)").as("tot"))).collect()
    val quiet = run(series(99, 0))
    assert(quiet.length === 30 - graft.operators.Inference.PhWarmupDays)
    assert(quiet.forall(!_.getAs[Boolean]("alarm")), "no alarm on stationary data")
    assert(quiet.forall(_.getAs[Double]("ph") >= 0.0), "ph is a running excess, ≥ 0")
    val shifted = run(series(15, BigDecimal(220)))   // +120% level shift
    assert(shifted.exists(_.getAs[Boolean]("alarm")), "a 2.2× shift must alarm")
    // once tripped the cumulative excess keeps the alarm latched
    val alarms = shifted.sortBy(_.getAs[String]("day")).map(_.getAs[Boolean]("alarm"))
    assert(!alarms.dropWhile(!_).contains(false), "alarm is monotone after the shift")
  }

  // ---------------- retrieval quality, ER blocking, CUPED ----------------

  test("ndcg matches a local brute-force recomputation exactly") {
    val k = graft.operators.SimilaritySearch.NdcgK
    val all = graft.sources.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("label"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1),
        r.getSeq[Double](2).toArray))
    val queries = all.filter(_._1 < 10)
    val corpus = all.filter(_._1 >= 10)
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    def log2(x: Double) = math.log(x) / math.log(2.0)
    val expected = queries.map { case (qid, qlab, qv) =>
      val ranked = corpus.map { case (id, lab, v) => (id, lab, cos(qv, v)) }
        .sortBy { case (id, _, c) => (-c, id) }.take(k)
      val dcg = ranked.zipWithIndex.map { case ((_, lab, _), i) =>
        (if (lab == qlab) 1.0 else 0.0) / log2(i + 2.0) }.sum
      val nRel = corpus.count(_._2 == qlab)
      val idcg = (1 to math.min(k, nRel)).map(i => 1.0 / log2(i + 1.0)).sum
      qid -> (dcg / idcg)
    }.toMap
    val got = graft.operators.SimilaritySearch.qNdcg(spark, sfDir)
      .select("q_id", "ndcg").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got.keySet === expected.keySet)
    got.foreach { case (q, n) =>
      assert(math.abs(n - expected(q)) < 1e-5, s"query $q: $n vs ${expected(q)}")
      assert(n >= 0.0 && n <= 1.0)
    }
  }

  test("er blocking: multiplicity-weighted counts equal the record-level brute force") {
    val parts = graft.sources.Tables.part(spark, sfDir)
      .select(col("p_partkey"), col("p_size"),
        split(col("p_name"), " ").getItem(0).as("blk"), col("p_name"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getString(3)))
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0 }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val brute = parts.groupBy(p => (p._3, p._2)).map { case (blockKey, rs) =>
      val pairs = for {
        x <- rs; y <- rs if x._1 < y._1
      } yield (x._4, y._4)
      val exact = pairs.count { case (na, nb) => na == nb }
      val fuzzy = pairs.count { case (na, nb) =>
        na != nb && lev(na, nb) <= graft.operators.Evaluation.ErMaxDist }
      blockKey -> (rs.length.toLong, exact.toLong, fuzzy.toLong)
    }
    val got = graft.operators.Evaluation.qErBlocking(spark, sfDir)
      .select("blk", "p_size", "block_n", "exact_pairs", "fuzzy_pairs").collect()
      .map(r => (r.getString(0), r.getInt(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got.keySet === brute.keySet)
    got.foreach { case (k2, v) => assert(v === brute(k2), s"block $k2") }
  }

  test("cuped: mean is preserved in the weighted aggregate, identities hold per arm") {
    val rows = graft.operators.Stats.qCuped(spark, sfDir).collect()
    assert(rows.length === 2, "both md5-split arms present")
    val users = graft.sources.Tables.events(spark, sfDir)
      .select("user_id").distinct().count()
    assert(rows.map(_.getAs[Long]("n_users")).sum === users)
    val thetas = rows.map(_.getAs[Double]("theta")).distinct
    assert(thetas.length === 1, "theta is fit pooled — identical across arms")
    // CUPED is mean-preserving in aggregate: Σ n·adj == Σ n·raw (the
    // per-arm shifts are ± the same covariate imbalance)
    val raw = rows.map(r => r.getAs[Long]("n_users") * r.getAs[Double]("mean_y")).sum
    val adj = rows.map(r => r.getAs[Long]("n_users") * r.getAs[Double]("mean_y_adj")).sum
    assert(math.abs(raw - adj) / math.abs(raw) < 1e-6)
    rows.foreach { r =>
      assert(r.getAs[Double]("var_y_adj") >= 0.0, "a variance cannot be negative")
      val red = r.getAs[Double]("var_reduction")
      val viaVar = 1.0 - r.getAs[Double]("var_y_adj") / r.getAs[Double]("var_y")
      assert(math.abs(red - viaVar) < 1e-4, "reduction consistent with the variances")
    }
  }

  // ---------------- kneser-ney, quantile norm, conformal ----------------

  test("kneser-ney: hand-computed fixture score and the continuation-diversity property") {
    import spark.implicits._
    // corpus: "a b", "a b", "a c", "d c" — c(a·)=3, N1+(a·)=2;
    // continuation counts: b follows {a} (1 context), c follows {a,d} (2)
    val bgDocs = Seq((1L, "a b"), (2L, "a b"), (3L, "a c"), (4L, "d c"))
      .toDF("doc_id", "bg")
    val got = graft.operators.TextScoring.kneserNeyOf(bgDocs)
      .select("doc_id", "n_bigrams", "avg_nll_kn").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got.keySet === Set(1L, 2L, 3L, 4L))
    assert(got.values.forall(_._1 === 1L))
    // P(b|a) = (2−.75)/3 + .75·(2/3)·(1/3) = 0.75/0.75... compute exactly:
    val nAll = 3.0 // distinct bigram types: (a,b), (a,c), (d,c)
    def p(c2: Double, c1dot: Double, n1w1: Double, n1w2: Double) =
      (c2 - 0.75) / c1dot + 0.75 * n1w1 / c1dot * (n1w2 / nAll)
    val pBgivenA = p(2, 3, 2, 1)
    val pCgivenA = p(1, 3, 2, 2)
    val pCgivenD = p(1, 1, 1, 2)
    assert(math.abs(got(1L)._2 - (-math.log(pBgivenA))) < 1e-5)
    assert(math.abs(got(3L)._2 - (-math.log(pCgivenA))) < 1e-5)
    assert(math.abs(got(4L)._2 - (-math.log(pCgivenD))) < 1e-5)
    // the KN signature: "c" has MORE distinct left contexts than "b", so
    // despite equal unigram frequency (2 each) its backoff mass is larger
    assert(pCgivenA > p(1, 3, 2, 1), "continuation diversity raises the backoff")
    // interpolated KN is a proper distribution: the continuation vocab is
    // {b, c} and Σ Pcont = 1, so Σ_{w2∈{b,c}} P(w2|a) =
    // (2−D + 1−D)/3 + D·(2/3)·(1/3 + 2/3) = 1 exactly
    assert(math.abs(pBgivenA + pCgivenA - 1.0) < 1e-12)
  }

  test("kneser-ney on the corpus: same bigram table as bigram_lm, positive NLLs") {
    val kn = graft.operators.TextScoring.qKneserNey(spark, sfDir)
      .select("doc_id", "n_bigrams", "avg_nll_kn", "max_nll_kn").collect()
    val jm = graft.operators.TextScoring.qBigramLm(spark, sfDir)
      .select("doc_id", "n_bigrams").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(kn.nonEmpty)
    kn.foreach { r =>
      assert(r.getLong(1) === jm(r.getLong(0)), "identical bigram decomposition")
      assert(r.getDouble(2) > 0.0 && r.getDouble(3) >= r.getDouble(2),
        "probabilities in (0,1): NLL positive, max ≥ avg")
    }
  }

  test("quantile normalization equalizes group distributions on a fixture") {
    import spark.implicits._
    val vals = (Seq(1, 2, 3).map(("a", _)) ++ Seq(10, 20, 30).map(("b", _)))
      .toDF("g", "x")
    val got = graft.operators.RobustStats.quantileNormalizeOf(vals)
      .orderBy("g", "x").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(3), r.getInt(4)))
    // both groups occupy ranks 2,4,6 of the pooled 6 and map to the SAME
    // pooled values — the definition of quantile normalization
    assert(got.filter(_._1 == "a").map(_._4).toSeq === Seq(2, 10, 30))
    assert(got.filter(_._1 == "b").map(_._4).toSeq === Seq(2, 10, 30))
    assert(got.map(_._3).toSeq === Seq(2L, 4L, 6L, 2L, 4L, 6L))
  }

  test("quantile normalization on the corpus: monotone, rank-bounded, max maps to max") {
    val rows = graft.operators.RobustStats.qQuantileNorm(spark, sfDir).collect()
    val n = graft.sources.Tables.documents(spark, sfDir).count()
    val pooledMax = graft.sources.Tables.documents(spark, sfDir)
      .agg(max("n_chars")).collect().head.getLong(0)
    rows.groupBy(_.getString(0)).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getAs[Long]("x"))
      val mapped = sorted.map(_.getAs[Long]("mapped"))
      assert(mapped.zip(mapped.tail).forall { case (a, b) => a <= b },
        "mapping preserves within-group order")
      assert(sorted.last.getAs[Long]("mapped") === pooledMax,
        "each group's max lands on the pooled max")
      rs.foreach { r =>
        val k = r.getAs[Long]("pooled_rank")
        assert(k >= 1 && k <= n)
      }
    }
  }

  test("rrf: fused score is exactly the reciprocal-rank identity, top-5 per query in order") {
    val rows = graft.operators.SimilaritySearch.qRrf(spark, sfDir).collect()
    val byQ = rows.groupBy(_.getLong(0))
    assert(byQ.keySet === (0L until 10L).toSet)
    byQ.values.foreach { rs =>
      val sorted = rs.sortBy(_.getAs[Int]("fused_rank"))
      assert(sorted.map(_.getAs[Int]("fused_rank")).toSeq === (1 to 5))
      sorted.foreach { r =>
        val c = graft.operators.SimilaritySearch.RrfC
        val expect = 1.0 / (c + r.getAs[Int]("rf")) + 1.0 / (c + r.getAs[Int]("rt"))
        assert(math.abs(r.getAs[Double]("rrf_score") - expect) < 1e-6)
      }
      val scores = sorted.map(_.getAs[Double]("rrf_score"))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b },
        "fused order follows the fused score")
    }
  }

  test("cms: estimates never underestimate and the head stays inside the e/w envelope") {
    val rows = graft.operators.ScaleOps.qCmsAudit(spark, sfDir).collect()
    val vocab = graft.operators.TextPrep.tokenStats(spark, sfDir).count()
    assert(rows.length === math.min(graft.operators.ScaleOps.CmsTopK, vocab).toInt,
      "one audit row per head token (sf0.001's cleaned vocab is sub-K)")
    rows.foreach { r =>
      assert(r.getAs[Long]("est") >= r.getAs[Long]("cf"),
        "count-min is one-sided: est >= true, always")
      assert(r.getAs[Long]("slack") === r.getAs[Long]("est") - r.getAs[Long]("cf"))
    }
    // the envelope is probabilistic per row but with d=4 rows the whole
    // head exceeding it would mean the sketch is broken
    assert(rows.count(_.getAs[Boolean]("within_bound")) >= rows.length - 2)
  }

  test("sprt: llr walks the exact per-look identity and decisions match the boundaries") {
    val rows = graft.operators.Inference.qSprt(spark, sfDir)
      .orderBy("day").collect()
    assert(rows.nonEmpty)
    val l1 = math.log(graft.operators.Inference.SprtP1 / graft.operators.Inference.SprtP0)
    val l0 = math.log((1 - graft.operators.Inference.SprtP1) /
      (1 - graft.operators.Inference.SprtP0))
    val ub = math.log((1 - graft.operators.Inference.SprtBeta) /
      graft.operators.Inference.SprtAlpha)
    val lb = math.log(graft.operators.Inference.SprtBeta /
      (1 - graft.operators.Inference.SprtAlpha))
    val ns = rows.map(_.getAs[Long]("n_t"))
    assert(ns.zip(ns.tail).forall { case (a, b) => b > a }, "cumulative trials grow")
    rows.foreach { r =>
      val k = r.getAs[Long]("k_t"); val n = r.getAs[Long]("n_t")
      val llr = k * l1 + (n - k) * l0
      assert(math.abs(r.getAs[Double]("llr") - llr) < 1e-5)
      val want = if (llr >= ub) "accept_h1" else if (llr <= lb) "accept_h0" else "continue"
      assert(r.getAs[String]("decision") === want)
    }
  }

  // ---------------- scale-posture plan probes for the new operators ----------------

  test("new operators keep their scale posture: broadcasts where claimed, no cartesian fact joins") {
    // er_blocking: the name-pair similarity join must run on the DISTINCT
    // name relation; the fact table never appears in a pair join, and the
    // bounded sides broadcast
    val er = graft.operators.Evaluation.qErBlocking(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!er.contains("CartesianProduct"),
      "blocked ER must never degrade to a cartesian pair join")
    // rrf / ndcg: query side broadcast against one corpus scan
    Seq(graft.operators.SimilaritySearch.qRrf(spark, sfDir),
      graft.operators.SimilaritySearch.qNdcg(spark, sfDir)).foreach { df =>
      val p = df.queryExecution.executedPlan.toString
      assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
        "retrieval fan-out keeps the query side broadcast")
    }
    // conformal: the calibration rank pick happens in the distributed
    // selector, so the FINAL plan carries no rank window at all
    val conf = graft.operators.Inference.qConformal(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!conf.toLowerCase.contains("window"),
      "conformal q-hat must come from the pick-only selector, not a window sort")
    // quantile_norm: windows exist but ONLY over distinct-value relations
    // (the per-group and pooled cumulative tables), never the fact table —
    // the aggregate runs before every window
    // (logical plan: the physical tree hides inside the AQE wrapper)
    val qn = graft.operators.RobustStats.qQuantileNorm(spark, sfDir)
      .queryExecution.optimizedPlan
    val windows = qn.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w }
    assert(windows.nonEmpty)
    windows.foreach { w =>
      val aggBelow = w.child.collectFirst {
        case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a }
      assert(aggBelow.isDefined,
        "every quantile-norm window ranks an aggregated distinct-value table")
    }
  }

  test("lang confusion: cells partition the corpus, shares sum to one per true language") {
    val rows = graft.operators.TextAnalysis.qLangConfusion(spark, sfDir).collect()
    val docs = graft.sources.Tables.documents(spark, sfDir).count()
    assert(rows.map(_.getAs[Long]("n")).sum === docs, "every doc lands in one cell")
    rows.groupBy(_.getString(0)).foreach { case (_, cells) =>
      val nTrue = cells.head.getAs[Long]("n_true")
      assert(cells.map(_.getAs[Long]("n")).sum === nTrue)
      assert(math.abs(cells.map(_.getAs[Double]("share_of_true")).sum - 1.0) < 1e-4)
      cells.foreach { c =>
        assert(c.getAs[Boolean]("correct") ===
          (c.getString(0) == c.getString(1)))
      }
    }
  }

  test("four-fifths audit: reference group is never impacted, flag matches the exact ratio") {
    val rows = graft.operators.TextScoring.qFourFifths(spark, sfDir).collect()
    assert(rows.length === 5, "one row per language")
    val refLang = rows.head.getAs[String]("ref_lang")
    assert(rows.forall(_.getAs[String]("ref_lang") === refLang))
    rows.foreach { r =>
      val ratio = r.getAs[Double]("impact_ratio")
      assert(ratio >= 0.0 && ratio <= 1.0 + 1e-9,
        "no group can out-select the reference group")
      if (r.getAs[String]("lang") == refLang) {
        assert(math.abs(ratio - 1.0) < 1e-9)
        assert(!r.getAs[Boolean]("adverse_impact"))
      }
      // the flag agrees with the exact cross-multiplied comparison
      val exact = r.getAs[Long]("p") * 5 *
        rows.find(_.getAs[String]("lang") == refLang).get.getAs[Long]("n") <
        rows.find(_.getAs[String]("lang") == refLang).get.getAs[Long]("p") * 4 *
          r.getAs[Long]("n")
      assert(r.getAs[Boolean]("adverse_impact") === exact)
    }
  }

  test("lift table: structural identities and full-corpus closure at decile 10") {
    val rows = graft.operators.TextScoring.qLift(spark, sfDir).orderBy("decile").collect()
    assert(rows.map(_.getInt(0)).toSeq === (1 to 10))
    val n = rows.map(_.getAs[Long]("n")).sum
    val last = rows.last
    assert(last.getAs[Long]("cum_n") === n, "deciles partition the corpus")
    assert(math.abs(last.getAs[Double]("gain") - 1.0) < 1e-9, "all positives by decile 10")
    assert(math.abs(last.getAs[Double]("lift") - 1.0) < 1e-9, "lift closes at 1")
    val gains = rows.map(_.getAs[Double]("gain"))
    assert(gains.zip(gains.tail).forall { case (a, b) => b >= a - 1e-12 },
      "cumulative gain is monotone")
    rows.foreach { r =>
      val g = r.getAs[Double]("gain"); val l = r.getAs[Double]("lift")
      val popShare = r.getAs[Long]("cum_n").toDouble / n
      assert(math.abs(l * popShare - g) < 1e-4, "lift × population share = gain")
    }
  }

  test("heaps curve: cumulative closure and sublinear vocabulary growth") {
    val rows = graft.operators.TextAnalysis.qHeaps(spark, sfDir).orderBy("bucket").collect()
    assert(rows.length === graft.operators.TextAnalysis.HeapsBuckets)
    val vocab = graft.operators.TextPrep.tokenStats(spark, sfDir).count()
    val last = rows.last
    assert(last.getAs[Long]("n_types") === vocab, "final prefix sees the whole vocabulary")
    Seq("n_docs", "n_tokens", "n_types").foreach { c =>
      val xs = rows.map(_.getAs[Long](c))
      assert(xs.zip(xs.tail).forall { case (a, b) => b >= a }, s"$c cumulates")
    }
    // sublinearity (Heaps β < 1): the log-log slope across the curve
    val pts = rows.filter(_.getAs[Long]("n_types") > 0)
      .map(r => (math.log(r.getAs[Long]("n_tokens").toDouble),
        math.log(r.getAs[Long]("n_types").toDouble)))
    val nn = pts.length
    val (sx, sy) = (pts.map(_._1).sum, pts.map(_._2).sum)
    val sxy = pts.map(p => p._1 * p._2).sum
    val sxx = pts.map(p => p._1 * p._1).sum
    val beta = (nn * sxy - sx * sy) / (nn * sxx - sx * sx)
    assert(beta < 1.0, s"vocabulary must grow sublinearly in tokens (beta=$beta)")
  }

  test("partial corr: matches the textbook identity against the marginal matrix") {
    val marg = graft.operators.Stats.qCorrMatrix(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    val part = graft.operators.Stats.qPartialCorr(spark, sfDir).collect()
    assert(part.length === 3)
    val r = Map(
      ("q", "p") -> marg(("l_quantity", "l_extendedprice")),
      ("q", "d") -> marg(("l_quantity", "l_discount")),
      ("p", "d") -> marg(("l_extendedprice", "l_discount")))
    def expect(rxy: Double, rxz: Double, ryz: Double) =
      (rxy - rxz * ryz) / math.sqrt((1 - rxz * rxz) * (1 - ryz * ryz))
    part.foreach { row =>
      assert(math.abs(row.getAs[Double]("corr") -
        marg((row.getString(0), row.getString(1)))) < 1e-5,
        "marginal column replays q_corr_matrix")
      val p = row.getAs[Double]("partial")
      assert(p >= -1.0 - 1e-9 && p <= 1.0 + 1e-9)
    }
    val qp = part.find(_.getString(0) == "l_quantity")
      .filter(_.getString(1) == "l_extendedprice").get
    assert(math.abs(qp.getAs[Double]("partial") -
      expect(r(("q", "p")), r(("q", "d")), r(("p", "d")))) < 1e-5)
  }

  test("forecast eval: metric identities hold and rmse dominates mae") {
    val rows = graft.operators.Stats.qForecastEval(spark, sfDir).collect()
    assert(rows.length === 5, "one scoreboard row per event type")
    rows.foreach { r =>
      assert(r.getAs[Long]("n_eval") > 0)
      Seq("naive", "snaive").foreach { m =>
        val mae = r.getAs[Double](s"mae_$m"); val rmse = r.getAs[Double](s"rmse_$m")
        assert(mae >= 0.0 && rmse >= mae - 1e-9,
          "RMSE >= MAE (Jensen) for any error sample")
      }
      val mase = r.getAs[Double]("mase_snaive")
      val viaMae = r.getAs[Double]("mae_snaive") / r.getAs[Double]("mae_naive")
      assert(math.abs(mase - viaMae) < 1e-4, "MASE is the MAE ratio on the shared window")
    }
  }

  test("did: the estimator is exactly the four-cell mean identity") {
    val r = graft.operators.Stats.qDid(spark, sfDir).collect().head
    val did = (r.getAs[Double]("mean_t_post") - r.getAs[Double]("mean_t_pre")) -
      (r.getAs[Double]("mean_c_post") - r.getAs[Double]("mean_c_pre"))
    assert(math.abs(r.getAs[Double]("did") - did) < 1e-5)
    assert(r.getAs[Double]("se") > 0.0)
    assert(math.abs(r.getAs[Double]("z") -
      r.getAs[Double]("did") / r.getAs[Double]("se")) < 1e-4)
    // same generating process on both arms → the null is true; a huge z
    // would mean the md5 split or the cell moments are broken
    assert(math.abs(r.getAs[Double]("z")) < 6.0, "honest null on a synthetic corpus")
  }

  test("logrank: risk sets account for every user and shrink monotonically") {
    val rows = graft.operators.Stats.qLogrank(spark, sfDir).orderBy("t").collect()
    assert(rows.nonEmpty)
    val users = graft.sources.Tables.events(spark, sfDir)
      .select("user_id").distinct().count()
    val first = rows.head
    assert(first.getAs[Long]("n1t") + first.getAs[Long]("n2t") === users,
      "everyone is at risk at the first event time")
    val risks = rows.map(r => r.getAs[Long]("n1t") + r.getAs[Long]("n2t"))
    assert(risks.zip(risks.tail).forall { case (a, b) => b < a },
      "the combined risk set strictly shrinks at every event time")
    rows.foreach { r =>
      assert(r.getAs[Long]("d1") <= r.getAs[Long]("n1t"))
      assert(r.getAs[Long]("d2") <= r.getAs[Long]("n2t"))
      val dt = r.getAs[Long]("d1") + r.getAs[Long]("d2")
      assert(r.getAs[Double]("e1") >= 0.0 && r.getAs[Double]("e1") <= dt.toDouble)
      assert(r.getAs[Double]("var_t") >= 0.0)
    }
    // assemble the test statistic the way a consumer would
    val o1 = rows.map(_.getAs[Long]("d1")).sum.toDouble
    val e1 = rows.map(_.getAs[Double]("e1")).sum
    val v = rows.map(_.getAs[Double]("var_t")).sum
    val z = (o1 - e1) / math.sqrt(v)
    assert(!z.isNaN && math.abs(z) < 6.0, "honest null between md5 arms")
  }

  test("grouping sets over the 2-column full lattice equals CUBE row-for-row") {
    def norm(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (Option(r.getString(0)), Option(r.getString(1)),
        r.getLong(2), r.getLong(3), r.getDouble(4))).toSet
    val gs = norm(graft.operators.Relational.qGroupingSets(spark, sfDir))
    val cube = norm(graft.sources.Tables.lineitem(spark, sfDir)
      .cube("l_returnflag", "l_linestatus")
      .agg(grouping_id().as("gid"), count(lit(1)).as("n"),
        sum(col("l_quantity").cast("decimal(12,2)")).cast("double").as("sum_qty"))
      .select("l_returnflag", "l_linestatus", "gid", "n", "sum_qty"))
    assert(gs === cube, "explicit sets {(a,b),(a),(b),()} ARE the 2-col cube")
  }

  test("range frame scales with date gaps: matches a brute-force per-customer recompute") {
    val rows = graft.operators.Relational.qRangeFrame(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getAs[Long]("trail_n"), r.getAs[Double]("trail_sum")))
    val byCust = rows.groupBy(_._1)
    assert(byCust.nonEmpty)
    val d = graft.operators.Relational.RangeFrameDays
    byCust.values.foreach { os =>
      os.foreach { case (_, _, day, tn, ts) =>
        val inFrame = os.filter(o => o._3 >= day - d && o._3 <= day)
        assert(tn === inFrame.length.toLong, "RANGE frame counts by VALUE distance")
      }
    }
    // the semantic point: somewhere a customer has a gap > frame, so the
    // trailing count RESETS below its row position (ROWS could not do this)
    val resets = byCust.values.exists { os =>
      val sorted = os.sortBy(_._3).zipWithIndex
      sorted.exists { case ((_, _, _, tn, _), i) => tn < i + 1 }
    }
    assert(resets, "at least one sparse customer exercises the gap semantics")
  }

  test("mrr agrees with ndcg on where the first relevant item lands") {
    val mrr = graft.operators.SimilaritySearch.qMrr(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getAs[Long]("first_rel_rank")).toMap
    val ndcg = graft.operators.SimilaritySearch.qNdcg(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getAs[Long]("n_rel_topk")).toMap
    val k = graft.operators.SimilaritySearch.NdcgK
    assert(mrr.keySet === ndcg.keySet)
    mrr.foreach { case (q, rank) =>
      assert(rank >= 1)
      if (ndcg(q) > 0) assert(rank <= k, s"query $q has top-$k relevance, MRR must see it")
      else assert(rank > k, s"query $q has NO top-$k relevance, MRR must agree")
    }
  }

  test("shapley attribution satisfies the efficiency axiom exactly") {
    import org.apache.spark.sql.expressions.Window
    val rows = graft.operators.Stats.qShapleyAttrib(spark, sfDir).collect()
    assert(rows.length === 4, "one row per channel")
    // recompute v(full) − v(∅) from the raw events: total premium
    // converters minus converters whose early journey touched NO channel
    val ev = graft.sources.Tables.events(spark, sfDir)
    val wU = Window.partitionBy("user_id").orderBy(col("ts").asc, col("event_id").asc)
    val chanBit = graft.operators.Stats.ShapChannels.foldLeft(lit(0)) {
      case (acc, (ch, bit)) => when(col("event_type") === ch, lit(bit)).otherwise(acc) }
    val perUser = ev.withColumn("rn", row_number().over(wU))
      .filter(col("rn") <= graft.operators.Stats.ShapEarlyK)
      .select(col("user_id"), chanBit.as("b"))
      .groupBy("user_id").agg(expr("bit_or(b)").as("mask"))
    val conv = ev.groupBy("user_id")
      .agg(max(when(col("event_type") === "purchase" &&
        col("value") > graft.operators.Stats.TwoPropValueCut, 1L)
        .otherwise(0L)).as("converted"))
    val joined = perUser.join(conv, Seq("user_id")).collect()
    val nUsers = joined.length
    val vFull = joined.map(_.getAs[Long]("converted")).sum
    val vEmpty = joined.filter(_.getAs[Int]("mask") == 0).map(_.getAs[Long]("converted")).sum
    val sumScaled = rows.map(_.getAs[Long]("shap_scaled")).sum
    // Σφᵢ·4! = (v(full) − v(∅))·4! exactly, in integers
    assert(sumScaled === (vFull - vEmpty) * 24L,
      s"efficiency: $sumScaled vs ${(vFull - vEmpty) * 24L}")
    val sumShap = rows.map(_.getAs[Double]("shapley")).sum
    assert(math.abs(sumShap - (vFull - vEmpty).toDouble / nUsers) < 1e-4)
  }

  test("slo burn: ratios recompute from the window counts, page needs BOTH windows hot") {
    val rows = graft.operators.Stats.qSloBurn(spark, sfDir).orderBy("day").collect()
    assert(rows.length === 30, "one row per calendar day")
    val inv = math.round(1.0 / (1.0 - graft.operators.Stats.SloTarget))
    val thr = graft.operators.Stats.SloBurnThresholdX1000
    rows.foreach { r =>
      val (ns, es) = (r.getAs[Long]("n_s"), r.getAs[Long]("e_s"))
      val (nl, el) = (r.getAs[Long]("n_l"), r.getAs[Long]("e_l"))
      assert(nl >= ns, "the long window contains the short one")
      assert(math.abs(r.getAs[Double]("burn_short") - es.toDouble * inv / ns) < 1e-6)
      assert(math.abs(r.getAs[Double]("burn_long") - el.toDouble * inv / nl) < 1e-6)
      val hot = es * inv * 1000 > ns * thr && el * inv * 1000 > nl * thr
      assert(r.getAs[Boolean]("page") === hot, "page iff both windows burn hot")
    }
  }

  test("holm dominates bh pointwise and stays a monotone rank prefix") {
    val holm = graft.operators.Inference.qHolm(spark, sfDir)
      .orderBy("rank").collect()
    val bh = graft.operators.Inference.qBhFdr(spark, sfDir)
      .select("g_a", "g_b", "adj_p").collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(holm.length === 10)
    holm.foreach { r =>
      val hp = r.getAs[Double]("adj_p")
      assert(hp >= r.getAs[Double]("p") - 1e-12)
      // FWER control is never looser than FDR control on the same p's
      assert(hp >= bh((r.getString(0), r.getString(1))) - 1e-9,
        "Holm adjusted p dominates BH")
    }
    val seq2 = holm.map(_.getAs[Double]("adj_p"))
    assert(seq2.zip(seq2.tail).forall { case (a, b) => b >= a - 1e-12 })
    val rej = holm.map(_.getAs[Boolean]("rejected"))
    assert(!rej.dropWhile(identity).contains(true), "rejections form a rank prefix")
  }

  test("eb shrinkage: lambda in [0,1], shrunk means stay between group and grand mean") {
    val rows = graft.operators.RobustStats.qEbShrink(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val n = rows.map(_.getAs[Long]("n")).sum
    val grand = rows.map(r => r.getAs[Long]("n") * r.getAs[Double]("mean")).sum / n
    rows.foreach { r =>
      val lam = r.getAs[Double]("lambda")
      assert(lam >= 0.0 && lam <= 1.0)
      val m = r.getAs[Double]("mean"); val sh = r.getAs[Double]("shrunk")
      assert(math.abs(sh - grand) <= math.abs(m - grand) + 1e-6,
        "shrinkage moves every source TOWARD the grand mean")
      // the convex-combination identity: shrunk = grand + λ(mean − grand)
      assert(math.abs(sh - (grand + lam * (m - grand))) < 1e-3)
    }
    // larger sources shrink less (λ monotone in n) whenever τ² > 0
    val byN = rows.sortBy(_.getAs[Long]("n")).map(_.getAs[Double]("lambda"))
    if (byN.exists(_ > 0.0))
      assert(byN.zip(byN.tail).forall { case (a, b) => b >= a - 1e-9 })
  }

  test("two-prop: wilson intervals contain the point estimates and arms partition users") {
    val r = graft.operators.Stats.qTwoProp(spark, sfDir).collect().head
    val users = graft.sources.Tables.events(spark, sfDir)
      .select("user_id").distinct().count()
    assert(r.getAs[Long]("n_a") + r.getAs[Long]("n_b") === users)
    Seq(("a", "p_a"), ("b", "p_b")).foreach { case (arm, pc) =>
      val p = r.getAs[Double](pc)
      val lo = r.getAs[Double](s"wilson_lo_$arm")
      val hi = r.getAs[Double](s"wilson_hi_$arm")
      assert(lo <= p && p <= hi, s"wilson interval covers p̂ for arm $arm")
      assert(lo >= -1e-9 && hi <= 1.0 + 1e-9, "wilson never leaves [0,1]")
    }
    assert(r.getAs[Long]("k_a") <= r.getAs[Long]("n_a"))
    assert(r.getAs[Long]("k_b") <= r.getAs[Long]("n_b"))
  }

  test("conformal: splits partition the facts, coverage lands near the 90% target") {
    val rows = graft.operators.Inference.qConformal(spark, sfDir).collect()
    val totals = graft.sources.Tables.events(spark, sfDir)
      .groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.map(_.getString(0)).toSet === totals.keySet)
    rows.foreach { r =>
      val parts = r.getAs[Long]("n_train") + r.getAs[Long]("n_cal") + r.getAs[Long]("n_test")
      assert(parts === totals(r.getString(0)), "md5 splits partition every event")
      assert(r.getAs[Double]("qhat") > 0.0)
      val cov = r.getAs[Double]("coverage")
      // finite-sample: E[cov] ≥ 0.9 but a small test split fluctuates
      assert(cov >= 0.7 && cov <= 1.0, s"coverage $cov out of plausible band")
    }
  }
}
