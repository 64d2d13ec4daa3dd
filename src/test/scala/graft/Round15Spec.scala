package graft

import graft.operators.{RobustStats, Stats}
import java.sql.Timestamp

/** Round-15 hardening pins — the r14-advice seam:
  *  - q_bartlett must go NULL (not error, not a silent value) when any
  *    group is a SINGLETON (nj = 1): v = x/0 is NULL in Spark but NaN in
  *    DuckDB, and DuckDB's min() orders NaN greatest, so the old
  *    minv > 0 gate passed there while Spark's NULL-skipping min ignored
  *    the group — the same asymmetric-degeneracy class as the r13
  *    zero-variance fix. The fix pins v to a 0-sentinel for singletons
  *    AND adds min(nj) > 1 to the gate in both engines.
  */
class Round15Spec extends SparkSpec {

  test("q_bartlett goes NULL on a singleton group (nj = 1) instead of " +
    "erroring or emitting a value") {
    import spark.implicits._
    val degen = Seq(("a", 5.0),
      ("b", 2.0), ("b", 4.0), ("b", 6.0),
      ("c", 1.0), ("c", 3.0), ("c", 9.0))
    val got = Stats.bartlettOf(degen.toDF("g", "x")).collect()(0)
    assert(got.getAs[Long]("k") == 3L && got.getAs[Long]("n") == 7L)
    assert(got.isNullAt(got.fieldIndex("stat")), "stat must be NULL")
    assert(got.isNullAt(got.fieldIndex("significant")),
      "significant must be NULL")
    // singleton + zero-variance together (both locks engaged at once)
    val both = Stats.bartlettOf(Seq(("a", 5.0), ("b", 7.0), ("b", 7.0),
      ("c", 1.0), ("c", 2.0)).toDF("g", "x")).collect()(0)
    assert(both.isNullAt(both.fieldIndex("stat")))
    // and the valid path is untouched
    val ok = Stats.bartlettOf(Seq(("a", 1.0), ("a", 2.0), ("a", 3.0),
      ("b", 2.0), ("b", 4.0), ("b", 6.0)).toDF("g", "x")).collect()(0)
    assert(!ok.isNullAt(ok.fieldIndex("stat")))
  }

  private def writeEvents(rows: Seq[(Long, Timestamp, Long, String, Double)])
      : String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-r15").toString
    rows.map { case (id, ts, u, t, v) => (id, ts, u, t, v, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("q_attribution_markov: removal effects match the hand-solved " +
    "absorption chain (useless channel scores 0, shares normalize)") {
    def t(m: Int) = Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")
    // user 10: landing -> view -> PURCHASE   (journey absorbs in __conv)
    // user 20: view -> click                 (never buys -> __null)
    // user 30: purchase only                 (direct START -> __conv)
    val dir = writeEvents(Seq(
      (1L, t(0), 10L, "landing", 0.0), (2L, t(1), 10L, "view", 0.0),
      (3L, t(2), 10L, "purchase", 0.0),
      (4L, t(0), 20L, "view", 0.0), (5L, t(1), 20L, "click", 0.0),
      (6L, t(0), 30L, "purchase", 0.0)))
    // hand solution: a(view)=a(landing)=1/2, a(start)=2/3;
    // removing click changes nothing (it never reaches __conv) -> re=0;
    // removing landing: a(start)=1/2 -> re=1/4;
    // removing view: a(start)=1/3 -> re=1/2; shares 0 : 1/3 : 2/3.
    val got = Stats.qAttributionMarkov(spark, dir).orderBy("channel")
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    assert(got.map(_._1).toSeq == Seq("click", "landing", "view"))
    val expected = Seq(("click", 0.0, 0.0), ("landing", 0.25, 0.333333),
      ("view", 0.5, 0.666667))
    got.zip(expected).foreach { case ((c, re, sh), (ec, ere, esh)) =>
      assert(c == ec)
      assert(math.abs(re - ere) < 1e-6, s"$c removal effect $re vs $ere")
      assert(math.abs(sh - esh) < 1e-6, s"$c share $sh vs $esh")
    }
  }

  test("q_dw: perfect linear trend yields NULL (zero residual variance); " +
    "an oscillating detrended series lands near 4 (negative autocorr)") {
    def t(d: Int) = Timestamp.valueOf(f"2024-01-$d%02d 00:00:00")
    // 'lin': exact trend y=t -> residuals all 0 -> NULL
    // 'osc': y = t + r with r = (1,-1,-2,2,1,-1), chosen ORTHOGONAL to
    // span{1,t} so the OLS fit is exactly (a,b)=(0,1) and the residuals
    // are exactly r: den = 12, num = 4+1+16+1+4 = 26 -> dw = 13/6
    val r = Seq(1.0, -1.0, -2.0, 2.0, 1.0, -1.0)
    val lin = (1 to 6).map(d => ((d + 100).toLong, t(d), 1L, "lin", d.toDouble))
    val osc = (1 to 6).map(d => ((d + 200).toLong, t(d), 2L, "osc",
      d.toDouble + r(d - 1)))
    val dir = writeEvents(lin ++ osc)
    val rows = Stats.qDw(spark, dir).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(rows("lin").isNullAt(rows("lin").fieldIndex("dw")),
      "zero residual variance must gate to NULL")
    val dwOsc = rows("osc").getAs[Double]("dw")
    assert(math.abs(dwOsc - 13.0 / 6) < 1e-6, s"dw=$dwOsc")
    assert(!rows("osc").getAs[Boolean]("positive_autocorr"))
  }

  test("q_bhattacharyya: identical value distributions score 0 distance; " +
    "disjoint buckets score the hand-computed smoothed coefficient") {
    def t(m: Int) = Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")
    // A and B: five values each in bucket 0; C: five values in bucket 9
    val rows = (0 until 5).flatMap { i =>
      Seq(((i * 3 + 1).toLong, t(i), 1L, "a_type", 10.0),
        ((i * 3 + 2).toLong, t(i), 2L, "b_type", 20.0),
        ((i * 3 + 3).toLong, t(i), 3L, "c_type", 470.0))
    }
    val dir = writeEvents(rows)
    val got = RobustStats.qBhattacharyya(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getDouble(2), r.getDouble(3))).toMap
    assert(got.keySet == Set(("a_type", "b_type"), ("a_type", "c_type"),
      ("b_type", "c_type")))
    val (dAb, hAb) = got(("a_type", "b_type"))
    assert(dAb == 0.0 && hAb == 0.0, s"identical dists: $dAb / $hAb")
    // a vs c: p = [0.4, 1/15 x9] vs [1/15 x9, 0.4]:
    // BC = 2*sqrt(0.4/15) + 8/15
    val bcExp = 2 * math.sqrt(0.4 / 15) + 8.0 / 15
    val (dAc, hAc) = got(("a_type", "c_type"))
    assert(math.abs(dAc - (-math.log(bcExp))) < 1e-5, s"$dAc")
    assert(math.abs(hAc - math.sqrt(1 - bcExp)) < 1e-5, s"$hAc")
  }

  test("q_kuiper fires on a symmetric-into-both-tails shift that KS " +
    "under-scores (V = D+ + D-, the rotation-invariant member)") {
    import spark.implicits._
    // b = 1..400; a matches b on 1..344 but moves 7% of its mass below
    // and 7% above the support: D+ = D- = 0.07 exactly, so
    // KS D = 0.07 < 0.0960 (silent) while V = 0.14 > 0.1235 (fires)
    val b = (1 to 400).map(v => ("b", v))
    val a = Seq.fill(28)(("a", 0)) ++ (1 to 344).map(v => ("a", v)) ++
      Seq.fill(28)(("a", 500))
    val vals = (a ++ b).toDF("g", "x")
    val ku = RobustStats.kuiperPairs(vals).collect()(0)
    assert(math.abs(ku.getAs[Double]("v") - 0.14) < 1e-9)
    assert(ku.getAs[Boolean]("significant"), "Kuiper must fire at V=0.14")
    val ks = RobustStats.ksPairs(vals).collect()(0)
    assert(math.abs(ks.getAs[Double]("d") - 0.07) < 1e-9)
    assert(!ks.getAs[Boolean]("significant"), "KS must stay silent at D=0.07")
  }

  test("q_funnel_steps enforces STRICT step order and the per-step window " +
    "(purchase without a click does not count; late click drops out)") {
    def t(m: Int) = Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")
    def lateT = Timestamp.valueOf("2024-01-09 00:00:00") // 8 days later
    val dir = writeEvents(Seq(
      // A: view -> click -> purchase, all inside windows -> all 3 steps
      (1L, t(0), 1L, "view", 0.0), (2L, t(1), 1L, "click", 0.0),
      (3L, t(2), 1L, "purchase", 0.0),
      // B: view -> purchase WITHOUT click -> step 1 only (q_funnel's
      // 2-step shape would credit this conversion; the strict funnel must not)
      (4L, t(0), 2L, "view", 0.0), (5L, t(1), 2L, "purchase", 0.0),
      // C: click -> purchase without a view -> not in the funnel at all
      (6L, t(0), 3L, "click", 0.0), (7L, t(1), 3L, "purchase", 0.0),
      // D: view, then the click lands past the 7-day window -> step 1 only
      (8L, t(0), 4L, "view", 0.0)) :+ ((9L, lateT, 4L, "click", 0.0)))
    val rows = graft.operators.Relational.qFunnelSteps(spark, dir)
      .orderBy("step").collect()
    assert(rows.map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq ==
      Seq((1, "view", 3L), (2, "click", 1L), (3, "purchase", 1L)))
    assert(rows(0).isNullAt(rows(0).fieldIndex("step_conv")))
    assert(rows(0).getDouble(rows(0).fieldIndex("overall_conv")) == 1.0)
    assert(math.abs(rows(1).getAs[Double]("step_conv") - 0.333333) < 1e-9)
    assert(math.abs(rows(2).getAs[Double]("step_conv") - 1.0) < 1e-9)
    assert(math.abs(rows(2).getAs[Double]("overall_conv") - 0.333333) < 1e-9)
  }

  test("q_join_size_sketch: F2 self-join size exact on a tiny key set, " +
    "sketch estimate honors both CMS guarantees") {
    def t(m: Int) = Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")
    // user frequencies 3 / 2 / 1 -> F2 = 9 + 4 + 1 = 14 over n_rows = 6
    val dir = writeEvents(Seq(
      (1L, t(0), 10L, "view", 0.0), (2L, t(1), 10L, "view", 0.0),
      (3L, t(2), 10L, "view", 0.0),
      (4L, t(0), 20L, "view", 0.0), (5L, t(1), 20L, "view", 0.0),
      (6L, t(0), 30L, "view", 0.0)))
    val r = graft.operators.ScaleOps.qJoinSizeSketch(spark, dir).collect()(0)
    assert(r.getAs[Long]("n_keys") == 3L && r.getAs[Long]("n_rows") == 6L)
    // r16: the gated surface is BIGINT now (red-gate hardening — see
    // ADJUDICATIONS.md); decimal stays internal
    assert(r.getAs[Long]("exact_size") == 14L)
    assert(r.getAs[Boolean]("overestimates"),
      "CMS inner product must never underestimate F2")
    assert(r.getAs[Boolean]("within_bound"))
    // 3 keys in 256 buckets: any collision only ADDS cross terms
    assert(r.getAs[Long]("est_size") >= 14L)
  }

  test("q_assoc_rules: confidence/lift/support match the hand counts " +
    "(6 of 10 baskets {click,view}, 4 {view})") {
    def t(d: Int) = Timestamp.valueOf(f"2024-01-$d%02d 10:00:00")
    val rows = (1 to 10).flatMap { u =>
      val base = Seq(((u * 3).toLong, t(1), u.toLong, "view", 0.0))
      if (u <= 6) base :+ ((u * 3 + 1).toLong, t(1), u.toLong, "click", 0.0)
      else base
    }
    val dir = writeEvents(rows)
    val got = graft.operators.PatternMining.qAssocRules(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getDouble(2), r.getDouble(3), r.getDouble(4)))).toMap
    // click -> view: conf 6/6 = 1, lift 1/(10/10) = 1, support 0.6
    assert(got(("click", "view")) == ((1.0, 1.0, 0.6)))
    // view -> click: conf 6/10 = 0.6, lift 0.6/(6/10) = 1, support 0.6
    assert(got(("view", "click")) == ((0.6, 1.0, 0.6)))
    assert(got.size == 2)
  }

  test("q_session_stats: bounce and depth roll up to the session START " +
    "day; the 30-min gap splits sessions") {
    val dir = writeEvents(Seq(
      // user 1, day 1: two events 10 min apart -> ONE session, depth 2,
      // duration 600s, starts on day 1
      (1L, Timestamp.valueOf("2024-01-01 10:00:00"), 1L, "view", 0.0),
      (2L, Timestamp.valueOf("2024-01-01 10:10:00"), 1L, "click", 0.0),
      // user 1, 40 min later -> gap > 30 min -> a SECOND session (bounce)
      (3L, Timestamp.valueOf("2024-01-01 10:50:00"), 1L, "view", 0.0),
      // user 2 straddles midnight: session starts day 1, rolls up to day 1
      (4L, Timestamp.valueOf("2024-01-01 23:55:00"), 2L, "view", 0.0),
      (5L, Timestamp.valueOf("2024-01-02 00:05:00"), 2L, "click", 0.0),
      // user 3, day 2: single event -> bounce on day 2
      (6L, Timestamp.valueOf("2024-01-02 12:00:00"), 3L, "view", 0.0)))
    val rows = graft.operators.Relational.qSessionStats(spark, dir)
      .orderBy("day").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5)))
    // day 1: 3 sessions (u1 s1, u1 s2 bounce, u2 straddler), 1 bounce,
    // depths (2,1,2) -> avg 5/3, durations (600, 0, 600) -> median 600
    assert(rows(0) == (("2024-01-01", 3L, 1L, 0.333333,
      math.floor(5.0 / 3 * 1e6 + 0.5) / 1e6, 600.0)))
    // day 2: 1 session, bounce
    assert(rows(1) == (("2024-01-02", 1L, 1L, 1.0, 1.0, 0.0)))
  }

  test("q_token_budget floors the budget identically in both engines " +
    "(odd token total under frac=0.5 — the truncate-vs-round cast seam)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-tb15").toString
    // sources with 3 / 4 / 4 whitespace tokens -> tm = 11 (odd), so
    // b = floor(5.5) = 5 in BOTH engines; the old Spark bare long cast
    // truncated to 5 while DuckDB's round-half-away cast gave 6
    Seq((1L, "alpha beta gamma", "en", "s1", 16L),
      (2L, "one two three four", "en", "s2", 18L),
      (3L, "w x y z", "en", "s3", 7L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = graft.operators.TextAnalysis.qTokenBudget(spark, dir)
      .orderBy("source").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getBoolean(3)))
    // water-filling with B=5 over masses (3,4,4) sorted: cap found at
    // i=1: p0=0 + 3*3 = 9 >= 5 -> C = 5/3; every source capped at 5/3
    val c = 5.0 / 3
    val exp = math.floor(c * 1e6 + 0.5) / 1e6
    rows.foreach { case (_, _, alloc, capped) =>
      assert(math.abs(alloc - exp) < 1e-9, s"alloc $alloc vs $exp")
      assert(capped)
    }
    // and the allocations sum to the floored budget
    assert(math.abs(rows.map(_._3).sum - 5.0) < 1e-5)
  }

  test("q_dedup_canonical picks the highest-quality member per cluster " +
    "(min doc_id on ties) and q_gain is nonnegative vs the min-id baseline") {
    import graft.operators.{Dedup, TextAnalysis}
    val quality = TextAnalysis.qQuality(spark, sfDir)
      .select("doc_id", "quality").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val clusters = Dedup.qDedupClusters(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    val got = Dedup.qDedupCanonical(spark, sfDir).collect()
      .map(r => r.getAs[Long]("cluster_id") ->
        ((r.getAs[Long]("canonical_doc"), r.getAs[Long]("n_members"),
          r.getAs[Double]("q_canonical"), r.getAs[Double]("q_min_id"),
          r.getAs[Double]("q_gain")))).toMap
    val byCluster = clusters.filter(c => quality.contains(c._1))
      .groupBy(_._2).map { case (cid, ms) => cid -> ms.map(_._1).sorted }
    assert(got.keySet == byCluster.keySet)
    byCluster.foreach { case (cid, members) =>
      val (canon, n, qc, qm, gain) = got(cid)
      assert(n == members.size.toLong)
      // argmax by (quality, -doc_id): best quality, lowest id on ties
      val best = members.map(d => (quality(d), -d)).max
      assert(canon == -best._2, s"cluster $cid canonical")
      assert(math.abs(qc - best._1) < 1e-12)
      assert(math.abs(qm - quality(members.min)) < 1e-12)
      assert(gain >= 0.0 && math.abs(gain - (qc - qm)) < 1e-6)
    }
  }
}
