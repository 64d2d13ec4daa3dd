package graft

import graft.operators.{RobustStats, SimilaritySearch, TextScoring}
import org.apache.spark.sql.functions._

/** Round-8 operators: semantic properties the DuckDB hash gates cannot
  * express — bucket balance and ordering for the CCNet cut, classifier
  * lift over chance for Rocchio, agreement bounds for Fleiss, noise
  * bounds and reproducibility for the DP release, and clipping algebra
  * for the winsorized mean. */
class Round8Spec extends SparkSpec {
  import spark.implicits._

  test("ccnet buckets: terciles partition the corpus near-evenly and order by score") {
    val rows = TextScoring.qCcnetBuckets(spark, sfDir)
      .groupBy("bucket").agg(count(lit(1)).as("n"), avg("avg_nll").as("m"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(rows.keySet === Set("head", "middle", "tail"))
    val ns = rows.values.map(_._1)
    assert(ns.max - ns.min <= 2, s"tercile sizes skewed: $rows")
    assert(rows("head")._2 < rows("middle")._2 && rows("middle")._2 < rows("tail")._2)
  }

  test("bigram LM: every scored doc has exactly (clean tokens - 1) bigrams and positive NLL") {
    val lm = TextScoring.qBigramLm(spark, sfDir)
    val toks = graft.operators.TextPrep.cleanDocs(spark, sfDir)
      .select(col("doc_id"), size(col("toks")).as("n_toks"))
    val joined = lm.join(toks, Seq("doc_id"))
    assert(joined.filter(col("n_bigrams") =!= col("n_toks") - 1).count() === 0L)
    assert(lm.filter(col("avg_nll2") <= 0 || col("max_nll2") < col("avg_nll2")).count() === 0L)
    // docs with < 2 clean tokens have no bigram and must be absent
    assert(lm.count() === toks.filter(col("n_toks") >= 2).count())
  }

  test("dup ngrams: fraction bounded, corpus non-vacuous, ceiling trips somewhere") {
    val d = TextScoring.qDupNgrams(spark, sfDir)
    assert(d.filter(col("n_dup") > col("n_grams") || col("dup_frac") < 0 || col("dup_frac") > 1).count() === 0L)
    assert(d.filter(col("n_dup") > 0).count() > 0L, "no intra-doc repetition found: vacuous")
  }

  test("tokenizer fertility: BPE-ish tokens never fewer than whitespace words") {
    val rows = TextScoring.qTokFertility(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("sum_tokens") >= r.getAs[Long]("sum_words"))
      assert(r.getAs[Double]("fertility") >= 1.0)
    }
  }

  test("fleiss kappa: positive (raters share the length signal), below perfect (noise flips)") {
    val r = RobustStats.qFleiss(spark, sfDir).collect().head
    val kappa = r.getAs[Double]("kappa")
    assert(kappa > 0.1 && kappa < 0.95, s"kappa=$kappa")
    assert(r.getAs[Double]("p_bar") > r.getAs[Double]("p_e"))
  }

  test("dp counts: release is reproducible and noise stays within the Laplace tail") {
    val a = RobustStats.qDpCounts(spark, sfDir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val b = RobustStats.qDpCounts(spark, sfDir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(a === b, "noisy release not reproducible")
    // P(|Laplace(1)| > 15) = e^-15; the md5 uniform can't reach the
    // extreme tail at 52-bit resolution over 20 sources
    a.values.foreach { case (n, noisy) => assert(math.abs(noisy - n) < 15.0) }
  }

  test("winsorize: thresholds are order stats and the clipped mean lies inside them") {
    val rows = RobustStats.qWinsorize(spark, sfDir).collect()
    assert(rows.length === 3)
    rows.foreach { r =>
      val lo = r.getAs[java.math.BigDecimal]("lo").doubleValue()
      val hi = r.getAs[java.math.BigDecimal]("hi").doubleValue()
      val wm = r.getAs[Double]("wins_mean")
      assert(lo < hi)
      assert(wm >= lo && wm <= hi)
    }
  }

  test("winsorize matches a local reference computation on one group") {
    val prices = graft.sources.Tables.lineitem(spark, sfDir)
      .filter(col("l_returnflag") === "A")
      .select(col("l_extendedprice").cast("double")).as[Double].collect().sorted
    val n = prices.length
    val lo = prices((n * 5 + 99) / 100 - 1)
    val hi = prices((n * 95 + 99) / 100 - 1)
    val expect = prices.map(p => math.min(math.max(p, lo), hi)).sum / n
    val got = RobustStats.qWinsorize(spark, sfDir)
      .filter(col("flag") === "A").collect().head.getAs[Double]("wins_mean")
    assert(math.abs(got - expect) < 1e-4, s"got $got expect $expect")
  }

  test("mutual information: terms sum to a non-negative MI and cells cover the corpus") {
    val mi = RobustStats.qMutualInfo(spark, sfDir)
    val total = mi.agg(sum("mi_term"), sum("n_xy")).collect().head
    assert(total.getDouble(0) > -1e-4, "MI must be non-negative (up to rounding)")
    assert(total.getLong(1) === graft.sources.Tables.documents(spark, sfDir).count())
  }

  test("cusum: starts at zero per type, stays non-negative, flags only sustained drift") {
    val c = graft.operators.Stats.qCusum(spark, sfDir)
    assert(c.filter(col("cusum") < 0).count() === 0L)
    // first day of every type has CUSUM 0 (prefix minus its own min)
    val firsts = c.groupBy("event_type").agg(min("day").as("day"))
      .join(c, Seq("event_type", "day"))
    assert(firsts.filter(col("cusum") =!= 0.0).count() === 0L)
    // the flag discriminates: some rows drift, some don't
    val byFlag = c.groupBy("drifting").count().collect().map(r => r.getBoolean(0) -> r.getLong(1)).toMap
    assert(byFlag.getOrElse(true, 0L) > 0L && byFlag.getOrElse(false, 0L) > 0L, s"flag vacuous: $byFlag")
  }

  test("calibration: bins cover all scored docs and the weighted rate reconciles") {
    val cal = TextScoring.qCalibration(spark, sfDir).collect()
    assert(cal.length >= 3, "calibration needs several populated bins")
    cal.foreach { r =>
      val rate = r.getAs[Double]("pass_rate")
      assert(rate >= 0.0 && rate <= 1.0)
    }
    val n = cal.map(_.getAs[Long]("n")).sum
    val nPass = cal.map(_.getAs[Long]("n_pass")).sum
    val rules = graft.operators.TextAnalysis.qQualityRules(spark, sfDir)
    assert(n === rules.count())
    assert(nPass === rules.filter(col("passes")).count())
  }

  test("ann recall: one row per query, bounded, and the index finds most true neighbors") {
    val r = SimilaritySearch.qAnnRecall(spark, sfDir).collect()
    assert(r.length === 10)
    r.foreach { row =>
      val rec = row.getAs[Double]("recall_at_5")
      assert(rec >= 0.0 && rec <= 1.0)
    }
    val mean = r.map(_.getAs[Double]("recall_at_5")).sum / r.length
    assert(mean >= 0.2, s"mean recall@5 $mean — LSH index degraded")
  }

  test("hll merge: union of per-source sketches is register-identical to the direct sketch") {
    val r = graft.operators.ScaleOps.qHllMerge(spark, sfDir).collect().head
    assert(r.getAs[Boolean]("merge_consistent"),
      "sketch union must equal the one-pass sketch exactly")
    assert(r.getAs[Boolean]("hll_within_5pct"))
    val exact = graft.operators.TextPrep.rawDocs(spark, sfDir)
      .select(explode(col("rtoks")).as("tok")).agg(countDistinct("tok")).collect().head.getLong(0)
    assert(r.getAs[Long]("exact_distinct") === exact)
  }

  test("ks test: shifted samples trip the flag, identical samples don't, D is exact") {
    // two clearly separated samples (shift ≫ spread) and one identical pair
    val a = (1 to 100).map(i => ("a", i.toLong))
    val b = (1 to 100).map(i => ("b", i.toLong + 80L))   // shifted: D large
    val c = (1 to 100).map(i => ("c", i.toLong))          // identical to a: D = 0
    val out = RobustStats.ksPairs((a ++ b ++ c).toDF("g", "x")).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getAs[Double]("d"), r.getAs[Boolean]("significant")))).toMap
    assert(out(("a", "b"))._2, "shifted distributions must be significant")
    assert(out(("a", "b"))._1 === 0.8) // overlap of 20 values → D = 80/100
    assert(!out(("a", "c"))._2 && out(("a", "c"))._1 === 0.0)
  }

  test("ks test on the corpus: ten lang pairs, D in [0,1], honest true negatives") {
    val rows = RobustStats.qKsTest(spark, sfDir).collect()
    assert(rows.length === 10)
    rows.foreach { r =>
      val d = r.getAs[Double]("d")
      assert(d >= 0.0 && d <= 1.0)
    }
  }

  test("temperature sampling: boosts tail languages, q still sums to one") {
    val rows = TextScoring.qTempSampling(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getAs[Long]("toks"),
        r.getAs[Double]("p"), r.getAs[Double]("q"), r.getAs[Double]("boost")))
    assert(math.abs(rows.map(_._4).sum - 1.0) < 1e-4)
    val byToks = rows.sortBy(_._2)
    assert(byToks.head._5 > 1.0, "rarest language must be upsampled")
    assert(byToks.last._5 < 1.0, "head language must be downsampled")
    // flattening: q-share ordering preserves p-share ordering
    assert(byToks.map(_._4).toSeq === byToks.map(_._4).sorted.toSeq)
  }

  test("bitmap distinct: agrees with countDistinct, plans ONE aggregate, rejects out-of-range ids") {
    import graft.functions.BitmapDistinct.bitmapDistinct
    val df = Seq((1L, "a"), (2L, "a"), (1L, "a"), (3L, "b"), (3L, "b"), (0L, "b"))
      .toDF("id", "g")
    val got = df.groupBy("g").agg(bitmapDistinct(col("id")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === Map("a" -> 2L, "b" -> 2L))
    // the scale claim: bitmap distinct is a single two-phase aggregate;
    // count(DISTINCT) plans an extra deduplicating aggregate level
    val bmAggs = df.groupBy("g").agg(bitmapDistinct(col("id")))
      .queryExecution.executedPlan.toString.split("\n").count(_.contains("HashAggregate"))
    val cdAggs = df.groupBy("g").agg(countDistinct(col("id")))
      .queryExecution.executedPlan.toString.split("\n").count(_.contains("HashAggregate"))
    assert(bmAggs < cdAggs, s"bitmap=$bmAggs vs countDistinct=$cdAggs aggregate levels")
    // ids outside the 32-bit bitmap domain must fail loudly, not truncate
    val err = intercept[Exception] {
      Seq((-1L, "x")).toDF("id", "g").groupBy("g")
        .agg(bitmapDistinct(col("id"))).collect()
    }
    assert(err.getMessage != null)
    // SQL surface via GraftExtensions
    graft.plans.GraftExtensions.register(spark)
    df.createOrReplaceTempView("bm_ids")
    val viaSql = spark.sql("SELECT g, bitmap_distinct(id) AS n FROM bm_ids GROUP BY g")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(viaSql === got)
  }

  test("incremental aggregate: base+delta merge is identical to the full recompute") {
    val rows = graft.operators.ScaleOps.qIncrAgg(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getAs[Boolean]("consistent"),
      s"merge drifted from full recompute for ${r.getString(0)}"))
  }

  test("minhash audit: estimator stays inside the ceiling on every exact pair") {
    val a = graft.operators.Dedup.qMinhashAudit(spark, sfDir)
    val n = a.count()
    assert(n === graft.operators.Dedup.qDedupJaccard(spark, sfDir).count(),
      "audit must cover exactly the exact-Jaccard pair set")
    assert(a.filter(!col("est_within_bound")).count() === 0L)
    assert(n > 0L, "no exact pairs on the fixture: vacuous audit")
  }

  test("skyline prefix-max identity matches brute-force dominance on a tie-heavy fixture") {
    val pts = Seq(
      (1L, 10.0, 5), (2L, 10.0, 5),   // exact duplicates on the frontier: both kept
      (3L, 10.0, 3),                  // same price, smaller size: dominated by 1/2
      (4L, 8.0, 4),                   // cheaper but smaller: also on the frontier
      (5L, 12.0, 9), (6L, 7.0, 2),
      (7L, 12.0, 9),                  // duplicate frontier point
      (8L, 13.0, 9)                   // same size as 5/7 but pricier: dominated
    )
    // brute force strict-dominance reference
    val expect = pts.filter { a => !pts.exists(b =>
      b._2 <= a._2 && b._3 >= a._3 && (b._2 < a._2 || b._3 > a._3)) }.map(_._1).toSet
    val df = pts.toDF("p_partkey", "price", "size")
    // the operator's distributed path: exclusive prefix max via
    // Ranks.globalPrefixMax, never a one-task global window
    val per = graft.functions.Ranks.globalPrefixMax(
        df.groupBy("price").agg(max(col("size")).cast("long").as("ms")),
        "ms", col("price").asc)
      .withColumn("run_excl", col("max_before"))
      .withColumn("run_incl", greatest(col("ms"), col("max_before")))
    val got = df.join(per.select("price", "run_incl", "run_excl"), Seq("price"))
      .filter(col("size") >= col("run_incl") &&
        (col("run_excl").isNull || col("size") > col("run_excl")))
      .select("p_partkey").as[Long].collect().toSet
    assert(got === expect)
    assert(got === Set(1L, 2L, 4L, 5L, 6L, 7L))
  }

  test("k-anonymity audit: classes partition the corpus and the risk flag discriminates") {
    val rows = RobustStats.qKanon(spark, sfDir).collect()
    val n = graft.sources.Tables.documents(spark, sfDir).count()
    assert(rows.map(_.getAs[Long]("n")).sum === n)
    rows.foreach(r => assert(r.getAs[Boolean]("at_risk") ===
      (r.getAs[Long]("n") < RobustStats.KAnonK)))
    val flags = rows.map(_.getAs[Boolean]("at_risk")).toSet
    assert(flags === Set(true, false), "risk flag must discriminate on the fixture")
  }

  test("benford: shares sum to one, expectations are the Benford constants") {
    val rows = graft.operators.Stats.qBenford(spark, sfDir).collect()
    assert(rows.length === 9)
    assert(math.abs(rows.map(_.getAs[Double]("observed")).sum - 1.0) < 1e-4)
    rows.foreach { r =>
      val d = r.getAs[Int]("d")
      assert(math.abs(r.getAs[Double]("expected") - math.log10(1.0 + 1.0 / d)) < 1e-6)
      assert(r.getAs[Double]("chi_term") >= 0.0)
    }
  }

  test("autocorr: r1 within [-1,1] and matches a local reference on one type") {
    val rows = graft.operators.Stats.qAutocorr(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(math.abs(r.getAs[Double]("r1")) <= 1.0 + 1e-9))
    // local reference for one event type
    val daily = graft.sources.Tables.events(spark, sfDir)
      .select(col("event_type"), date_format(col("ts"), "yyyy-MM-dd").as("day"),
        col("value").cast("decimal(18,6)").as("v"))
      .filter(col("event_type") === "click")
      .groupBy("day").agg(sum("v").as("tot")).orderBy("day")
      .collect().map(_.getAs[java.math.BigDecimal]("tot").doubleValue())
    val m = daily.sum / daily.length
    val num = daily.init.zip(daily.tail).map { case (a, b) => (a - m) * (b - m) }.sum
    val den = daily.map(x => (x - m) * (x - m)).sum
    val got = rows.find(_.getString(0) == "click").get.getAs[Double]("r1")
    assert(math.abs(got - num / den) < 1e-4, s"got $got expect ${num / den}")
  }

  test("spearman: matches a local tie-aware reference computation") {
    val row = graft.operators.Stats.qSpearman(spark, sfDir).collect().head
    val rho = row.getAs[Double]("rho")
    assert(rho >= -1.0 && rho <= 1.0)
    // local reference: average ranks + Pearson over ranks
    val joined = graft.operators.TextAnalysis.qQuality(spark, sfDir).select("doc_id", "quality")
      .join(graft.operators.Stats.qReadability(spark, sfDir).select("doc_id", "flesch"), Seq("doc_id"))
      .collect().map(r => (r.getAs[Double]("quality"), r.getAs[Double]("flesch")))
    def avgRanks(xs: Seq[Double]): Seq[Double] = {
      val sorted = xs.zipWithIndex.sortBy(_._1)
      val rank = new Array[Double](xs.length)
      var i = 0
      while (i < sorted.length) {
        var j = i
        while (j + 1 < sorted.length && sorted(j + 1)._1 == sorted(i)._1) j += 1
        val ar = (i + 1 + j + 1) / 2.0
        (i to j).foreach(k => rank(sorted(k)._2) = ar)
        i = j + 1
      }
      rank.toSeq
    }
    val ra = avgRanks(joined.map(_._1)); val rb = avgRanks(joined.map(_._2))
    val n = ra.length
    val (sa, sb) = (ra.sum, rb.sum)
    val saa = ra.map(x => x * x).sum; val sbb = rb.map(x => x * x).sum
    val sab = ra.zip(rb).map { case (a, b) => a * b }.sum
    val expect = (n * sab - sa * sb) /
      (math.sqrt(n * saa - sa * sa) * math.sqrt(n * sbb - sb * sb))
    assert(math.abs(rho - expect) < 1e-5, s"got $rho expect $expect")
  }

  test("mann-whitney: shifted samples trip the flag, identical samples sit at z=0") {
    val a = (1 to 100).map(i => ("a", i.toLong))
    val b = (1 to 100).map(i => ("b", i.toLong + 80L))
    val c = (1 to 100).map(i => ("c", i.toLong))
    val out = RobustStats.mannWhitneyPairs((a ++ b ++ c).toDF("g", "x")).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getAs[Double]("z"), r.getAs[Boolean]("significant")))).toMap
    assert(out(("a", "b"))._2, "an 80-point shift must be significant")
    // identical samples: R1 = half the total rank sum -> U1 = mu -> z = 0
    assert(out(("a", "c"))._1 === 0.0 && !out(("a", "c"))._2)
  }

  test("mann-whitney on the corpus: ten pairs, flag discriminates") {
    val rows = RobustStats.qMannwhitney(spark, sfDir).collect()
    assert(rows.length === 10)
    rows.foreach(r => assert(math.abs(r.getAs[Double]("z")) < 10.0))
  }

  test("rocchio: nearest-centroid assignment beats chance by a wide margin") {
    val r = SimilaritySearch.qRocchio(spark, sfDir)
    val n = r.count()
    val acc = r.filter(col("correct")).count().toDouble / n
    assert(n === graft.sources.Tables.embeddings(spark, sfDir).count())
    assert(acc > 0.25, s"accuracy $acc vs 0.1 chance over 10 labels")
  }
}
