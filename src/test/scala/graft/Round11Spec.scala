package graft

import graft.operators.ScaleOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.types.BinaryType

/** Round-11 hardening pins:
  *   - q_bloom_audit's bitmap must travel as a BROADCAST VARIABLE, not a
  *     foldable binary literal baked into every task closure (r10 logged
  *     "broadcasting large task binary 4.9 MiB": the ~2.5 MiB filter was
  *     inlined at both probe sites). The probe walks every expression of
  *     the optimized plan and caps the largest binary literal — the
  *     exact source of task-binary bloat — at 1 KiB.
  *   - the broadcast probe is bit-identical to the literal/codegen path:
  *     same xxhash64 longs, same bitmap, same verdicts.
  */
class Round11Spec extends SparkSpec {

  private def maxBinaryLiteralBytes(df: DataFrame): Int = {
    var mx = 0
    df.queryExecution.optimizedPlan.foreach { node =>
      node.expressions.foreach(_.foreach {
        case Literal(v: Array[Byte], BinaryType) if v != null =>
          mx = math.max(mx, v.length)
        case _ => ()
      })
    }
    mx
  }

  test("q_bloom_audit plans with no MiB-sized binary literal (bitmap is broadcast)") {
    val df = ScaleOps.qBloomAudit(spark, sfDir)
    val mx = maxBinaryLiteralBytes(df)
    assert(mx <= 1024,
      s"a $mx-byte binary literal is back in the q_bloom_audit plan — " +
        "the bloom bitmap must ship as a broadcast variable, not task binary")
    // and the certificate itself still holds
    val r = df.collect()(0)
    assert(r.getAs[Boolean]("no_false_negatives"))
    assert(r.getAs[Boolean]("fpr_ok"))
  }

  test("broadcast probe is bit-identical to the literal BloomFilterMightContain path") {
    import org.apache.spark.sql.functions._
    val orderKeys = graft.sources.Tables.orders(spark, sfDir).select(col("o_custkey"))
    val bloom = orderKeys.select(xxhash64(col("o_custkey")).as("h"))
      .stat.bloomFilter("h", 1L << 21, 0.01)
    val bos = new java.io.ByteArrayOutputStream(); bloom.writeTo(bos)
    val bc = spark.sparkContext.broadcast(bloom)
    val probeBc = udf((h: Long) => bc.value.mightContainLong(h))
    // probe members AND the alien range through both paths
    val probes = orderKeys.distinct()
      .union(spark.range(1, ScaleOps.BloomAlienProbes + 1)
        .select((col("id") + ScaleOps.BloomAlienOffset).as("o_custkey")))
    val both = probes.select(
        ScaleOps.bloomMightContain(bos.toByteArray, col("o_custkey")).as("lit_path"),
        probeBc(xxhash64(col("o_custkey"))).as("bc_path"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("lit_path") === col("bc_path"), 0).otherwise(1)).as("diffs"))
      .collect()(0)
    assert(both.getAs[Long]("n") > 0)
    assert(both.getAs[Long]("diffs") === 0L, "broadcast and literal probes diverged")
  }

  // ---------------- RFF kernel-SVC ----------------

  test("q_rbf_audit: kernel approximation, dims and norm bound all hold") {
    val r = graft.operators.Classification.qRbfAudit(spark, sfDir).collect()(0)
    assert(r.getAs[Boolean]("dims_ok"), "projected dimensionality broken")
    assert(r.getAs[Boolean]("norm_ok"), "‖z‖² > 2 — RFF scale broken")
    assert(r.getAs[Boolean]("kernel_mae_ok"), "kernel MAE above 0.1")
    assert(r.getAs[Boolean]("kernel_max_ok"), "kernel max error above 0.4")
    assert(r.getAs[Long]("n_pairs") > 0, "vacuous probe set")
    assert(r.getAs[Long]("rff_dim") === graft.operators.Classification.RffDim.toLong)
    assert(r.getAs[Long]("n_train") + r.getAs[Long]("n_test") > 0)
  }

  test("q_classify_rbf: one metrics row accounting for exactly the test split") {
    import org.apache.spark.sql.functions._
    val r = graft.operators.Classification.qClassifyRbf(spark, sfDir).collect()
    assert(r.length === 1)
    val row = r(0)
    assert(row.getString(0) === "svc_rbf")
    val cells = row.getAs[Long]("tp") + row.getAs[Long]("fp") +
      row.getAs[Long]("tn") + row.getAs[Long]("fn")
    val nTest = TestSplit.size(spark, sfDir)
    assert(cells === nTest, "RBF predictions must cover exactly the test partition")
  }

  test("q_classify_rbf is deterministic run to run (fixed-seed projection)") {
    val a = graft.operators.Classification.qClassifyRbf(spark, sfDir).collect()(0)
    val b = graft.operators.Classification.qClassifyRbf(spark, sfDir).collect()(0)
    assert(a === b, "two fits of the seeded RFF+LinearSVC diverged")
  }

  // ---------------- adaptive LSH sizing ----------------

  test("adaptivePlanes: floor keeps test-SF postings identical, then grows with log2(n)") {
    import graft.operators.SimilaritySearch.{adaptivePlanes, NPlanes, TargetBucketLoad}
    // every test-SF corpus stays at the historical floor → hash-gated
    // audits and rows-only fixtures are unchanged
    for (n <- Seq(1L, 100L, 500L, 2000L)) assert(adaptivePlanes(n) === NPlanes)
    // beyond the floor: ceil(log2(n/load)), so bucket load stays bounded
    assert(adaptivePlanes(18000L) === 10)
    assert(adaptivePlanes(TargetBucketLoad << 20) === 20)
    // monotone nondecreasing, and load n/2^planes stays ≤ target above the floor
    var prev = 0
    for (e <- 5 to 40) {
      val n = 1L << e
      val p = adaptivePlanes(n)
      assert(p >= prev); prev = p
      if (p > NPlanes) assert((n >> p) <= TargetBucketLoad)
    }
  }

  // ---------------- post-hoc tests ----------------

  test("tukey: hand-computed fixture, flags exactly the separated pair") {
    import spark.implicits._
    // groups a={1,2,3}, b={1.5,2.5,3.5} (near a), c={11,12,13} (far)
    val vals = (Seq(1.0, 2.0, 3.0).map(("a", _)) ++
      Seq(1.5, 2.5, 3.5).map(("b", _)) ++
      Seq(11.0, 12.0, 13.0).map(("c", _))).toDF("g", "x")
    val rows = graft.operators.Stats.tukeyOf(vals).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r).toMap
    assert(rows.keySet === Set(("a", "b"), ("a", "c"), ("b", "c")))
    // hand: means 2, 2.5, 12; SSW = 2+2+2 = 6; MSW = 6/(9-3) = 1
    // q(a,c) = 10/sqrt(1/2*(2/3)) = 10/sqrt(1/3) = 17.3205
    assert(math.abs(rows(("a", "c")).getAs[Double]("q") - 17.320508) < 1e-5)
    assert(math.abs(rows(("a", "b")).getAs[Double]("q") - 0.866025) < 1e-5)
    assert(rows(("a", "c")).getAs[Boolean]("significant"))
    assert(rows(("b", "c")).getAs[Boolean]("significant"))
    assert(!rows(("a", "b")).getAs[Boolean]("significant"))
  }

  test("tukey on the corpus: all pairs, honest true negatives, q >= 0") {
    val rows = graft.operators.Stats.qTukey(spark, sfDir).collect()
    assert(rows.length === 3) // 3 returnflag groups -> 3 pairs
    rows.foreach { r =>
      assert(r.getAs[Double]("q") >= 0.0)
      assert(!r.getAs[Boolean]("significant"),
        "uniform quantities must not separate any pair")
    }
  }

  test("tukey: out-of-table k yields NULL significance, never false") {
    import spark.implicits._
    val vals = (1 to 12).flatMap(g => Seq(1.0, 2.0).map((s"g$g", _))).toDF("g", "x")
    val sig = graft.operators.Stats.tukeyOf(vals).select("significant").collect()
    assert(sig.forall(_.isNullAt(0)), "k=12 is outside TukeyQCrit")
  }

  test("dunn: separated fixture trips exactly the far pairs; ranks are tie-averaged") {
    import spark.implicits._
    // two overlapping groups + one far group, heavy ties; 40 rows/group
    val vals = ((1 to 40).map(i => ("a", (i % 4).toLong)) ++
      (1 to 40).map(i => ("b", (i % 4).toLong)) ++
      (1 to 40).map(i => ("c", 100L + (i % 4)))).toDF("g", "x")
    val rows = graft.operators.RobustStats.dunnOf(vals).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r).toMap
    assert(rows.keySet === Set(("a", "b"), ("a", "c"), ("b", "c")))
    // a and b are identical distributions -> mean ranks equal, z = 0
    assert(rows(("a", "b")).getAs[Double]("z") === 0.0)
    assert(!rows(("a", "b")).getAs[Boolean]("significant"))
    assert(rows(("a", "c")).getAs[Boolean]("significant"))
    assert(rows(("b", "c")).getAs[Boolean]("significant"))
    // mean ranks: a/b split ranks 1..80 -> 40.5; c holds 81..120 -> 100.5
    assert(math.abs(rows(("a", "c")).getAs[Double]("mean_rank_a") - 40.5) < 1e-9)
    assert(math.abs(rows(("a", "c")).getAs[Double]("mean_rank_b") - 100.5) < 1e-9)
  }

  test("dunn on the corpus: ten language pairs, no false positives") {
    val rows = graft.operators.RobustStats.qDunn(spark, sfDir).collect()
    assert(rows.length === 10) // 5 langs -> 10 pairs
    rows.foreach { r =>
      assert(!r.getAs[Boolean]("significant"),
        "one generating distribution per language - honest true negative")
    }
  }

  // ---------------- plan probes for the round-11 operators ----------------

  test("post-hoc and friedman plans: no CartesianProduct, bounded sides broadcast") {
    def plan(df: org.apache.spark.sql.DataFrame): String =
      df.queryExecution.executedPlan.toString
    val tukey = plan(graft.operators.Stats.qTukey(spark, sfDir))
    assert(!tukey.contains("CartesianProduct"))
    // the k-row group relation pairs via a broadcast join, never a shuffle
    assert(tukey.contains("Broadcast"), tukey.take(1500))
    val dunn = plan(graft.operators.RobustStats.qDunn(spark, sfDir))
    assert(!dunn.contains("CartesianProduct"))
    assert(dunn.contains("Broadcast"), dunn.take(1500))
    val fried = plan(graft.operators.Stats.qFriedman(spark, sfDir))
    assert(!fried.contains("CartesianProduct"))
    // ranks window is PARTITIONED by block — a global un-partitioned
    // window over the daily relation would be a one-task sort
    assert(!fried.contains("Window [")
      || !fried.contains("windowspecdefinition()"), fried.take(1500))
  }

  test("c_v coherence plan: top-term side broadcasts into the posting join") {
    val (_, _, cv) = {
      // re-derive through the public query (cvParts is private): the
      // physical plan of the final c_v relation carries the whole chain
      val df = graft.operators.TopicModeling.qCoherenceCv(spark, sfDir)
      (0, 0, df)
    }
    val p = cv.queryExecution.executedPlan.toString
    assert(p.contains("Broadcast"), p.take(1500))
    assert(!p.contains("CartesianProduct"))
  }

  // ---------------- semantic decontamination ----------------

  test("q_decon_semantic: benchmark side broadcasts; hits agree with a local check") {
    val df = graft.operators.Dedup.qDeconSemantic(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin"), plan.take(1500))
    assert(!plan.contains("CartesianProduct"))
    val rows = df.collect()
      .map(r => r.getAs[Long]("vec_id") ->
        ((r.getAs[Long]("bench_id"), r.getAs[Long]("n_hits")))).toMap
    // local brute-force reference over the same embeddings
    val all = graft.sources.Tables.embeddings(spark, sfDir).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val bench = all.filter(_._1 < graft.operators.Dedup.DeconBenchMax)
    val expect = all.filter(_._1 >= graft.operators.Dedup.DeconBenchMax)
      .flatMap { case (vid, v) =>
        val hits = bench.toSeq
          .map { case (bid, bv) => (bid, cos(v, bv)) }
          .filter(_._2 >= graft.operators.Dedup.DeconSemTau)
        if (hits.isEmpty) None
        else Some(vid -> ((hits.minBy { case (bid, c) => (-c, bid) }._1,
          hits.size.toLong)))
      }
    assert(rows === expect, "flagged set / argmax / counts diverged from brute force")
    assert(rows.nonEmpty, "vacuous decontamination fixture")
  }

  // ---------------- GK winsorize ----------------

  test("q_winsorize_approx: GK thresholds track the exact rank picks") {
    val apx = graft.operators.RobustStats.qWinsorizeApprox(spark, sfDir).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(apx.keySet.size === 3)
    apx.values.foreach { r =>
      assert(r.getAs[Boolean]("bounds_ok"))
      assert(r.getAs[Boolean]("clip_lo_ok"), "clipped-below fraction off the GK bound")
      assert(r.getAs[Boolean]("clip_hi_ok"), "clipped-above fraction off the GK bound")
      assert(r.getAs[Boolean]("mean_ok"))
    }
    // and the sketch-clipped mean lands within 1% of the exact twin's
    val exact = graft.operators.RobustStats.qWinsorize(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getAs[Double]("wins_mean")).toMap
    val apxMeans = {
      import org.apache.spark.sql.functions._
      val base = graft.sources.Tables.lineitem(spark, sfDir)
        .select(col("l_returnflag").as("flag"),
          col("l_extendedprice").cast("double").as("price"))
      val cuts = base.groupBy("flag")
        .agg(expr("approx_percentile(price, array(0.05, 0.95), 10000)").as("c"))
        .select(col("flag"), col("c")(0).as("lo"), col("c")(1).as("hi"))
      base.join(broadcast(cuts), Seq("flag")).groupBy("flag")
        .agg(avg(least(greatest(col("price"), col("lo")), col("hi"))).as("wm"))
        .collect().map(r => r.getString(0) -> r.getAs[Double]("wm")).toMap
    }
    exact.foreach { case (flag, em) =>
      assert(math.abs(apxMeans(flag) - em) <= 0.01 * math.abs(em),
        s"$flag: sketch-winsorized mean drifted >1% from the exact twin")
    }
  }

  test("q_mad_approx: GK medians split their populations and track the exact twin") {
    val apx = graft.operators.RobustStats.qMadApprox(spark, sfDir).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(apx.keySet.size === 3)
    apx.values.foreach { r =>
      assert(r.getAs[Boolean]("bounds_ok"))
      assert(r.getAs[Boolean]("med_split_ok"), "median split off the GK bound")
      assert(r.getAs[Boolean]("mad_split_ok"), "MAD split off the GK bound")
    }
    // sketch med/mad within 1% of the exact twin's values
    val exact = graft.operators.RobustStats.qMad(spark, sfDir).collect()
      .map(r => r.getString(0) -> ((r.getAs[Double]("med"), r.getAs[Double]("mad")))).toMap
    val apxVals = {
      import org.apache.spark.sql.functions._
      val base = graft.sources.Tables.lineitem(spark, sfDir)
        .select(col("l_returnflag").as("flag"),
          col("l_extendedprice").cast("double").as("price"))
      val med = base.groupBy("flag")
        .agg(expr("approx_percentile(price, 0.5, 10000)").as("med"))
      base.join(broadcast(med), Seq("flag"))
        .select(col("flag"), col("med"), abs(col("price") - col("med")).as("dev"))
        .groupBy("flag")
        .agg(first(col("med")).as("med"),
          expr("approx_percentile(dev, 0.5, 10000)").as("mad"))
        .collect().map(r => r.getString(0) ->
          ((r.getAs[Double]("med"), r.getAs[Double]("mad")))).toMap
    }
    exact.foreach { case (flag, (em, ed)) =>
      val (am, ad) = apxVals(flag)
      assert(math.abs(am - em) <= 0.01 * math.abs(em), s"$flag median drift >1%")
      assert(math.abs(ad - ed) <= 0.01 * math.abs(ed), s"$flag MAD drift >1%")
    }
  }

  // ---------------- Friedman blocked ranks ----------------

  test("friedman: consistently-ordered fixture trips, exchangeable one doesn't") {
    import spark.implicits._
    import graft.operators.Stats
    // 12 blocks where treatment order is IDENTICAL every block: Q maximal
    val ordered = (1 to 12).flatMap(b =>
      Seq(("a", 1.0), ("b", 2.0), ("c", 3.0)).map { case (g, y) =>
        (s"b$b", g, java.math.BigDecimal.valueOf(y)) })
      .toDF("b", "g", "y")
    val r1 = Stats.friedmanOf(ordered).collect()(0)
    // hand: rank sums 12,24,36 -> Q = 12*(144+576+1296)/(12*3*4) - 3*12*4 = 24
    assert(r1.getAs[Double]("q") === 24.0)
    assert(r1.getAs[Boolean]("significant"), "perfect ordering must trip df=2")
    // rotating the order per block cancels: rank sums equal -> Q = 0
    val rotated = (1 to 12).flatMap { b =>
      val gs = Seq("a", "b", "c")
      gs.zipWithIndex.map { case (g, i) =>
        (s"b$b", g, java.math.BigDecimal.valueOf(((i + b) % 3) + 1.0)) }
    }.toDF("b", "g", "y")
    val r0 = Stats.friedmanOf(rotated).collect()(0)
    assert(r0.getAs[Double]("q") === 0.0)
    assert(!r0.getAs[Boolean]("significant"))
    // an incomplete block must be dropped, not poison the ranking
    val withPartial = ordered.unionByName(
      Seq(("bx", "a", java.math.BigDecimal.valueOf(9.0))).toDF("b", "g", "y"))
    val r2 = Stats.friedmanOf(withPartial).collect()(0)
    assert(r2.getAs[Long]("n_blocks") === 12L, "partial block must drop")
    assert(r2.getAs[Double]("q") === 24.0)
  }

  test("friedman on the corpus: complete 30-day blocks, honest true negative") {
    val r = graft.operators.Stats.qFriedman(spark, sfDir).collect()(0)
    assert(r.getAs[Long]("k") === 5L)
    assert(r.getAs[Long]("n_blocks") > 0L)
    assert(!r.getAs[Boolean]("significant"),
      "exchangeable within-day orderings must not trip")
  }

  // ---------------- c_v coherence ----------------

  test("windowUnionCount matches a brute-force sliding-window count") {
    import org.apache.spark.sql.functions._
    import graft.operators.TopicModeling
    val L = TopicModeling.CvWindow
    // docs longer AND shorter than the window, clustered + spread positions
    val cases: Seq[(Long, Seq[Long])] = Seq(
      (400L, Seq(0L)), (400L, Seq(399L)), (400L, Seq(5L, 6L, 7L)),
      (400L, Seq(10L, 250L, 399L)), (400L, Seq(100L, 150L, 200L, 205L)),
      (50L, Seq(3L)), (50L, Seq(0L, 49L)), (110L, Seq(54L)),
      (111L, Seq(0L)), (111L, Seq(110L)), (2000L, (0L until 2000L by 97L).toSeq)
    )
    def brute(n: Long, ps: Seq[Long]): Long = {
      val cap = math.max(n - L, 0L)
      (0L to cap).count(s => ps.exists(p => p >= s && p < s + L)).toLong
    }
    import spark.implicits._
    val df = cases.zipWithIndex
      .map { case ((n, ps), i) => (i, math.max(n - L, 0L), ps) }
      .toDF("i", "cap", "ps")
      .select(col("i"), TopicModeling.windowUnionCount(col("ps"), col("cap")).as("w"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    cases.zipWithIndex.foreach { case ((n, ps), i) =>
      assert(df(i) === brute(n, ps), s"case $i: n=$n ps=$ps")
    }
  }

  test("q_coherence_cv: one row per topic, c_v in [-1,1]; audit guarantees hold") {
    import graft.operators.TopicModeling
    val cv = TopicModeling.qCoherenceCv(spark, sfDir).collect()
    assert(cv.length === TopicModeling.DefaultK)
    cv.foreach { r =>
      val v = r.getAs[Double]("c_v")
      assert(v >= -1.0 && v <= 1.0, s"c_v out of range: $v")
      assert(r.getAs[Long]("n_terms") === 10L)
    }
    val a = TopicModeling.qCoherenceCvAudit(spark, sfDir).collect()(0)
    assert(a.getAs[Boolean]("terms_ok"))
    assert(a.getAs[Boolean]("pair_bound_ok"), "inclusion-exclusion bound violated")
    assert(a.getAs[Boolean]("npmi_range_ok"))
    assert(a.getAs[Boolean]("cv_range_ok"))
    assert(a.getAs[Long]("n_windows") >= a.getAs[Long]("n_docs"))
  }
}
