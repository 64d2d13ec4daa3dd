package graft

import graft.operators.{Relational, RobustStats, ScaleOps, Stats, TextAnalysis}
import java.sql.Timestamp

/** Round-16 pins — the r15-verdict adjudication + ADVICE seams:
  *  - q_oracle_canary's row is a hand-verifiable constant: every
  *    cross-engine idiom the oracle suite relies on (md5 text, the
  *    hex-substring→integer derivation, raw DECIMAL widening, the
  *    ordered double fold) pinned to literal values so a Spark-side
  *    regression is caught here and a DuckDB-side one at the gate.
  *  - hitsOf's long-namespaced key domain (non-negative) must fail
  *    LOUDLY on a negative id instead of silently misclassifying the
  *    hub/auth side (r16 ADVICE).
  *  - q_join_size_sketch's gate-normalized output surface is all
  *    BIGINT/BOOLEAN — no decimal remains for an engine-version seam
  *    to bite (the r15 red-gate adjudication, see ADJUDICATIONS.md).
  */
class Round16Spec extends SparkSpec {

  test("q_oracle_canary: every cross-engine idiom pinned to " +
    "hand-verified constants") {
    val r = ScaleOps.qOracleCanary(spark, "unused").collect()(0)
    // $ echo -n "graft-canary-0" | md5sum
    assert(r.getAs[String]("md5_full") == "313004f7eea38745fae330e8081e401b")
    assert(r.getAs[Long]("hex_cast") == 825230583L)   // 0x313004f7
    assert(r.getAs[Long]("hex_mod") == 247L)          // 825230583 % 256
    assert(r.getAs[Long]("conv_fixed") == 16711935L)  // 0x00ff00ff
    // Σ i² for i=1..24 = 24·25·49/6 = 4900, checked in-engine only:
    // the raw DECIMAL render is off the gated surface since r17 (the
    // r16 driver run confirmed the DuckDB promotion seam; see
    // ADJUDICATIONS.md).
    assert(r.getAs[Boolean]("dec_ok"))
    assert(!r.schema.fieldNames.contains("dec_prod"),
      "raw DECIMAL must stay off the hash-gated canary surface")
    // H(24) = Σ 1/i folded in ascending-i order, round 6
    assert(r.getAs[Double]("fold_sum") == 3.775958)
  }

  test("hitsOf fails loudly on a negative id instead of misclassifying " +
    "the node side") {
    import spark.implicits._
    val edges = Seq((-1L, 2L), (3L, 4L)).toDF("hub", "auth")
    val e = intercept[Exception] {
      Relational.hitsOf(edges).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: messages(x.getCause))
    assert(messages(e).exists(m => m != null && m.contains("negative hub id")),
      s"expected the raise_error message, got: ${e.getMessage}")
  }

  test("q_join_size_sketch emits only BIGINT/BOOLEAN on the gated " +
    "surface (no decimal for a version seam to bite)") {
    val df = ScaleOps.qJoinSizeSketch(spark, "/root/testdata/sf0.001")
    val types = df.schema.fields.map(f => f.name -> f.dataType.typeName).toMap
    for (c <- Seq("n_keys", "n_rows", "exact_size", "est_size", "slack"))
      assert(types(c) == "long", s"$c is ${types(c)}, expected long")
    for (c <- Seq("overestimates", "within_bound"))
      assert(types(c) == "boolean", s"$c is ${types(c)}")
    val r = df.collect()(0)
    assert(r.getAs[Boolean]("overestimates") && r.getAs[Boolean]("within_bound"))
    assert(r.getAs[Long]("est_size") >= r.getAs[Long]("exact_size"))
  }

  // ------------------------------------------------ r16 operator fixtures

  test("cvmPairs: hand-computed T on a 2x2 fixture; identical " +
    "distributions score exactly 0") {
    import spark.implicits._
    // a={1,2}, b={3,4}: per distinct value (d, gap=c1*nb-c2*na):
    // 1:(1,2) 2:(1,4) 3:(1,2) 4:(1,0) -> S = 4+16+4+0 = 24,
    // T = 24/(n_a*n_b*N^2) = 24/64 = 0.375
    val g1 = RobustStats.cvmPairs(
      Seq(("a", 1L), ("a", 2L), ("b", 3L), ("b", 4L)).toDF("g", "x"))
      .collect()(0)
    assert(g1.getAs[Double]("t") == 0.375 && !g1.getAs[Boolean]("significant"))
    val g2 = RobustStats.cvmPairs(
      Seq(("a", 1L), ("a", 2L), ("b", 1L), ("b", 2L)).toDF("g", "x"))
      .collect()(0)
    assert(g2.getAs[Double]("t") == 0.0)
  }

  test("ansariPairs: extremes-vs-middle fixture matches the hand z " +
    "(scores 1,2,2,1; AB=2, E=3, Var=1/3)") {
    import spark.implicits._
    val r = RobustStats.ansariPairs(
      Seq(("a", 10L), ("a", 40L), ("b", 20L), ("b", 30L)).toDF("g", "x"))
      .collect()(0)
    assert(r.getAs[Double]("ab") == 2.0)
    assert(math.abs(r.getAs[Double]("z") - (-1.0 / math.sqrt(1.0 / 3))) < 1e-6)
    assert(!r.getAs[Boolean]("significant"))
  }

  private def writeEvents(rows: Seq[(Long, Timestamp, Long, String, Double)])
      : String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-r16").toString
    rows.map { case (id, ts, u, t, v) => (id, ts, u, t, v, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  private def day(d: Int, m: Int = 0) =
    Timestamp.valueOf(f"2024-01-$d%02d 08:$m%02d:00")

  test("q_pettitt: level shift at day 3 is found with the hand K and " +
    "approximate p (U_N = 0 rank identity built in)") {
    // daily totals 1,2,3 then 10,11,12 -> ranks 1..6,
    // U_t = 2*S_t - t*7 = [-5,-8,-9,-8,-5,0] -> K=9 at day 3
    val dir = writeEvents((1 to 6).map(d =>
      (d.toLong, day(d), d.toLong, "m",
        if (d <= 3) d.toDouble else d + 7.0)))
    val r = Stats.qPettitt(spark, dir).collect()(0)
    assert(r.getAs[Long]("k_stat") == 9L)
    assert(r.getAs[String]("cp_day") == "2024-01-03")
    val pExp = 2.0 * math.exp(-6.0 * 81 / (216.0 + 36.0))
    assert(math.abs(r.getAs[Double]("p_approx") - pExp) < 1e-4)
    assert(!r.getAs[Boolean]("significant"))
  }

  test("q_granger: a count series that leads another is flagged in the " +
    "leading direction (independent scalar recomputation)") {
    // type a daily counts [1,2,3,4,5]; type b [1,1,2,3,4]: b_t tracks
    // a_{t-1} (plus a flat start) -> a->b partial corr ~ 1, b->a weaker
    val rows = scala.collection.mutable.ArrayBuffer.empty[(Long, Timestamp, Long, String, Double)]
    var id = 0L
    for (d <- 1 to 5; _ <- 1 to d) { id += 1; rows += ((id, day(d, (id % 50).toInt), id, "a", 1.0)) }
    for ((d, c) <- Seq((1, 1), (2, 1), (3, 2), (4, 3), (5, 4)); _ <- 1 to c) {
      id += 1; rows += ((id, day(d, (id % 50).toInt), id, "b", 1.0))
    }
    val got = Stats.qGranger(spark, writeEvents(rows.toSeq))
      .collect().map(r => (r.getString(0), r.getString(1),
      Option(r.get(r.fieldIndex("f_stat"))).map(_.toString.toDouble)))
      .toSeq
    // independent recomputation of the a->b F from the raw series
    def corr(u: Seq[Double], v: Seq[Double]): Double = {
      val n = u.size
      val (su, sv) = (u.sum, v.sum)
      val num = n * u.zip(v).map { case (x, y) => x * y }.sum - su * sv
      num / math.sqrt((n * u.map(x => x * x).sum - su * su) *
        (n * v.map(x => x * x).sum - sv * sv))
    }
    val y = Seq(1.0, 2.0, 3.0, 4.0)   // b at t=2..5
    val y1 = Seq(1.0, 1.0, 2.0, 3.0)  // b at t-1
    val x1 = Seq(1.0, 2.0, 3.0, 4.0)  // a at t-1
    val (ryx, ryy1, rxy1) = (corr(y, x1), corr(y, y1), corr(x1, y1))
    val rp = (ryx - ryy1 * rxy1) /
      math.sqrt((1 - ryy1 * ryy1) * (1 - rxy1 * rxy1))
    val fExp = rp * rp * (4 - 3) / (1 - rp * rp)
    val ab = got.find(t => t._1 == "a" && t._2 == "b").get._3
    if (fExp.isInfinite || fExp.isNaN) assert(ab.isEmpty)
    else assert(math.abs(ab.get - fExp) < 1e-4, s"got $ab expected $fExp")
  }

  test("q_mde: p=1/3 over 3 users matches the closed form") {
    val dir = writeEvents(Seq(
      (1L, day(1), 100L, "t", 1.0), (2L, day(1, 10), 100L, "t", 1.0),
      (3L, day(1, 20), 200L, "t", 1.0), (4L, day(1, 30), 300L, "t", 1.0)))
    val r = Stats.qMde(spark, dir).collect()(0)
    assert(r.getAs[Long]("n_users") == 3L && r.getAs[Long]("n_conv") == 1L)
    val p = 1.0 / 3
    val mde = Stats.MdeZ * math.sqrt(2 * p * (1 - p) / 1.5)
    assert(math.abs(r.getAs[Double]("mde_abs") - mde) < 1e-6)
    assert(math.abs(r.getAs[Double]("mde_rel") - mde / p) < 1e-6)
  }

  test("q_concurrency: overlapping sessions peak at 2, the touching " +
    "instant counting start-before-end") {
    val dir = writeEvents(Seq(
      (1L, Timestamp.valueOf("2024-01-01 01:00:00"), 1L, "e", 0.0),
      (2L, Timestamp.valueOf("2024-01-01 01:10:00"), 1L, "e", 0.0),
      (3L, Timestamp.valueOf("2024-01-01 01:05:00"), 2L, "e", 0.0),
      (4L, Timestamp.valueOf("2024-01-01 03:00:00"), 3L, "e", 0.0)))
    val r = Relational.qConcurrency(spark, dir).collect()(0)
    assert(r.getAs[String]("day") == "2024-01-01")
    assert(r.getAs[Long]("peak_concurrent") == 2L)
    assert(r.getAs[Long]("n_started") == 3L)
  }

  test("q_kmv_intersect collapses to EXACT counts when the sets are " +
    "smaller than k (the bottom-k saw everything)") {
    val dir = writeEvents(Seq(
      (1L, day(1), 1L, "A", 0.0), (2L, day(1, 1), 2L, "A", 0.0),
      (3L, day(1, 2), 3L, "A", 0.0),
      (4L, day(1, 3), 2L, "B", 0.0), (5L, day(1, 4), 3L, "B", 0.0),
      (6L, day(1, 5), 4L, "B", 0.0)))
    val r = ScaleOps.qKmvIntersect(spark, dir).collect()(0)
    assert(r.getAs[Long]("exact_union") == 4L)
    assert(r.getAs[Long]("exact_inter") == 2L)
    assert(r.getAs[Double]("est_union") == 4.0)
    assert(r.getAs[Double]("est_inter") == 2.0)
    assert(r.getAs[Boolean]("union_ok"))
  }

  private def writeDocs(rows: Seq[(Long, String, String)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-r16d").toString
    rows.map { case (id, src, text) =>
      (id, src, text, "en", text.length.toLong) }
      .toDF("doc_id", "source", "text", "lang", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("q_mixture_weights: uniform target -> the scarcest source keeps " +
    "rate 1, larger sources subsample to its token mass") {
    val dir = writeDocs(Seq(
      (1L, "s1", "one two three four five six seven eight nine ten"),
      (2L, "s2", "a b c d e f g h i j k l m n o p q r s t")))
    val got = TextAnalysis.qMixtureWeights(spark, dir)
      .orderBy("source").collect()
    assert(got(0).getAs[Long]("n_tokens") == 10L)
    assert(got(1).getAs[Long]("n_tokens") == 20L)
    assert(got(0).getAs[Double]("sampling_rate") == 1.0)
    assert(got(1).getAs[Double]("sampling_rate") == 0.5)
    assert(got(0).getAs[Double]("share") == 0.333333)
    assert(got(0).getAs[Long]("effective_tokens") == 10L)
    assert(got(1).getAs[Long]("effective_tokens") == 10L)
  }

  private def writeLineitem(baskets: Seq[(Long, Long)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-r16l").toString
    baskets.toDF("l_orderkey", "l_partkey")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    dir
  }

  test("q_item_sim: cosine normalizes away the popular-item bias and " +
    "top-k ranks deterministically") {
    // baskets: p1 with p2 twice, p1 with p3 twice -> deg p1=4, p2=p3=2,
    // cosine(p1,p2) = cosine(p1,p3) = 2/sqrt(8)
    val dir = writeLineitem(Seq(
      (1L, 1L), (1L, 2L), (2L, 1L), (2L, 2L),
      (3L, 1L), (3L, 3L), (4L, 1L), (4L, 3L)))
    val got = Relational.qItemSim(spark, dir)
      .orderBy("part_a", "rank").collect()
      .map(r => (r.getAs[Long]("part_a"), r.getAs[Long]("part_b"),
        r.getAs[Double]("cosine"), r.getAs[Int]("rank")))
    val c = math.round(2.0 / math.sqrt(8.0) * 1e6) / 1e6
    assert(got.toSeq == Seq((1L, 2L, c, 1), (1L, 3L, c, 2),
      (2L, 1L, c, 1), (3L, 1L, c, 1)))
  }

  test("q_link_pred: two shared neighbors, no direct edge -> jaccard 1, " +
    "adamic-adar 2/ln(2); direct edges are excluded") {
    // edges (each co-ordered twice): 102-201, 103-201, 102-202, 103-202
    val dir = writeLineitem(Seq(
      (1L, 102L), (1L, 201L), (2L, 102L), (2L, 201L),
      (3L, 103L), (3L, 201L), (4L, 103L), (4L, 201L),
      (5L, 102L), (5L, 202L), (6L, 102L), (6L, 202L),
      (7L, 103L), (7L, 202L), (8L, 103L), (8L, 202L)))
    val got = Relational.qLinkPred(spark, dir).orderBy("part_a").collect()
      .map(r => (r.getAs[Long]("part_a"), r.getAs[Long]("part_b"),
        r.getAs[Long]("cn"), r.getAs[Double]("jaccard"),
        r.getAs[Double]("adamic_adar")))
    val aa = math.round(2.0 / math.log(2.0) * 1e6) / 1e6
    assert(got.toSeq == Seq((102L, 103L, 2L, 1.0, aa),
      (201L, 202L, 2L, 1.0, aa)))
  }

  test("q_mann_kendall: strictly rising series scores S = C(n,2) with " +
    "the hand variance; a constant series goes NULL") {
    // rising: S=10, no ties -> Var = 5*4*15/18, z = 9/sqrt(Var)
    val dir = writeEvents((1 to 5).map(d =>
      (d.toLong, day(d), d.toLong, "up", d.toDouble)) ++
      (1 to 5).map(d => (10L + d, day(d), d.toLong, "flat", 7.0)))
    val got = graft.operators.Inference.qMannKendall(spark, dir)
      .collect().map(r => r.getString(0) -> r).toMap
    val up = got("up")
    assert(up.getAs[Long]("s_stat") == 10L)
    assert(up.getAs[Double]("var_s") == math.floor(300.0 / 18 * 1e6 + 0.5) / 1e6)
    assert(math.abs(up.getAs[Double]("z") - 9.0 / math.sqrt(300.0 / 18)) < 1e-6)
    assert(up.getAs[Boolean]("significant"))
    val flat = got("flat")
    assert(flat.getAs[Long]("s_stat") == 0L)
    assert(flat.isNullAt(flat.fieldIndex("z")), "constant series must be NULL")
  }

  test("q_tost: arm counts recomputed independently from the md5 " +
    "assignment reproduce the z pair") {
    // users 1..40, user u converts iff u % 4 == 0
    val rows = (1 to 40).flatMap { u =>
      val conv = u % 4 == 0
      Seq((u.toLong * 10, day(1, u % 50), u.toLong, "purchase",
        if (conv) 100.0 else 10.0))
    }
    val dir = writeEvents(rows)
    val r = Stats.qTost(spark, dir).collect()(0)
    // independent recomputation: same md5-first-hex-digit assignment
    def treat(u: Long): Boolean = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(u.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      Integer.parseInt(hex.substring(0, 1), 16) < 8
    }
    val users = (1 to 40).map(_.toLong)
    val (ua, ub) = users.partition(treat)
    val (ka, kb) = (ua.count(_ % 4 == 0).toLong, ub.count(_ % 4 == 0).toLong)
    assert(r.getAs[Long]("n_a") == ua.size.toLong &&
      r.getAs[Long]("k_a") == ka)
    assert(r.getAs[Long]("n_b") == ub.size.toLong &&
      r.getAs[Long]("k_b") == kb)
    val (pa, pb) = (ka.toDouble / ua.size, kb.toDouble / ub.size)
    val se = math.sqrt(pa * (1 - pa) / ua.size + pb * (1 - pb) / ub.size)
    assert(math.abs(r.getAs[Double]("z_lower") -
      (pa - pb + Stats.TostMargin) / se) < 1e-5)
    assert(r.getAs[Boolean]("equivalent") ==
      ((pa - pb + Stats.TostMargin) / se > Stats.TostZ &&
        (pa - pb - Stats.TostMargin) / se < -Stats.TostZ))
  }

  test("q_quade: consistent winner with distinct block ranges matches " +
    "the hand F = 12 (high-spread days dominate)") {
    // blocks d1..d3, a beats b every day; ranges 9/4/1 -> q2 = 6/4/2,
    // S4_a = +q2, S4_b = -q2 -> F = 2*288/(3*112-288) = 12
    val dir = writeEvents(Seq(
      (1L, day(1), 1L, "a", 10.0), (2L, day(1, 1), 2L, "b", 1.0),
      (3L, day(2), 3L, "a", 5.0), (4L, day(2, 1), 4L, "b", 1.0),
      (5L, day(3), 5L, "a", 2.0), (6L, day(3, 1), 6L, "b", 1.0)))
    val r = Stats.qQuade(spark, dir).collect()(0)
    assert(r.getAs[Long]("k_groups") == 2L && r.getAs[Long]("n_blocks") == 3L)
    assert(r.getAs[Double]("f_stat") == 12.0)
    assert(r.getAs[Boolean]("significant"))
  }

  test("q_by_fdr: harmonic factor equals H(m) and the min-step is " +
    "reproducible from the emitted p/rank columns") {
    val got = graft.operators.Inference.qByFdr(spark, "/root/testdata/sf0.001")
      .orderBy("rank").collect()
    val m = got.length
    val hm = (1 to m).map(1.0 / _).sum
    assert(math.abs(got(0).getAs[Double]("c_m") -
      math.floor(hm * 1e6 + 0.5) / 1e6) < 1e-9)
    // independent min-step replay: adj_p(r) = min_{j >= r} min(1, p_j*m*H/j)
    val ps = got.map(r => (r.getAs[Int]("rank"), r.getAs[Double]("p")))
    for (row <- got) {
      val r0 = row.getAs[Int]("rank")
      val exp = math.min(1.0,
        ps.filter(_._1 >= r0).map { case (j, p) => p * m * hm / j }.min)
      assert(math.abs(row.getAs[Double]("adj_p") -
        math.floor(exp * 1e6 + 0.5) / 1e6) < 1e-9, s"rank $r0")
    }
  }

  test("q_abc: the 80/15/5 revenue split classes parts A/B/C") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-r16a").toString
    Seq((1L, 1L, 80.0), (2L, 2L, 15.0), (3L, 3L, 5.0))
      .toDF("l_orderkey", "l_partkey", "l_extendedprice")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val got = Relational.qAbc(spark, dir).orderBy("part_key").collect()
      .map(r => (r.getAs[Long]("part_key"), r.getAs[Double]("revenue"),
        r.getAs[Double]("cum_share"), r.getAs[String]("abc_class")))
    assert(got.toSeq == Seq((1L, 80.0, 0.8, "A"), (2L, 15.0, 0.95, "B"),
      (3L, 5.0, 1.0, "C")))
  }

  test("q_sax: a step series symbolizes to a...d, a constant series to " +
    "all-c (sigma = 0 path)") {
    // 20 days: 10 at 1.0 then 10 at 101.0 -> mu=51, sigma=50,
    // balanced PAA (S=10, n=20) -> 2-day segments, z = -1 then +1
    val dir = writeEvents(
      (1 to 20).map(d => (d.toLong, day(d), d.toLong, "step",
        if (d <= 10) 1.0 else 101.0)) ++
      (1 to 20).map(d => (100L + d, day(d), d.toLong, "flat", 7.0)))
    val got = Stats.qSax(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getAs[Long]("n_days"),
        r.getAs[Long]("n_segments"), r.getAs[String]("sax"))).toMap
    assert(got("step") == ((20L, 10L, "aaaaaddddd")))
    assert(got("flat") == ((20L, 10L, "cccccccccc")))
  }

  test("q_new_vs_returning: first-seen day splits actives into " +
    "acquisition vs retention") {
    val dir = writeEvents(Seq(
      (1L, day(1), 1L, "e", 0.0), (2L, day(1, 1), 2L, "e", 0.0),
      (3L, day(2), 1L, "e", 0.0), (4L, day(2, 1), 3L, "e", 0.0)))
    val got = Relational.qNewVsReturning(spark, dir).orderBy("day").collect()
      .map(r => (r.getString(0), r.getAs[Long]("n_active"),
        r.getAs[Long]("n_new"), r.getAs[Long]("n_returning"),
        r.getAs[Double]("pct_new")))
    assert(got.toSeq == Seq(("2024-01-01", 2L, 2L, 0L, 1.0),
      ("2024-01-02", 2L, 1L, 1L, 0.5)))
  }

  test("q_funnel_time: the earliest in-window purchase sets the delay; " +
    "non-converters and viewless purchasers are excluded") {
    val dir = writeEvents(Seq(
      (1L, Timestamp.valueOf("2024-01-01 10:00:00"), 1L, "view", 0.0),
      (2L, Timestamp.valueOf("2024-01-01 10:30:00"), 1L, "purchase", 0.0),
      (3L, Timestamp.valueOf("2024-01-01 11:00:00"), 1L, "purchase", 0.0),
      (4L, Timestamp.valueOf("2024-01-01 10:00:00"), 2L, "view", 0.0),
      (5L, Timestamp.valueOf("2024-01-01 10:05:00"), 3L, "purchase", 0.0)))
    val got = Relational.qFunnelTime(spark, dir).collect()
    assert(got.length == 1)
    val r = got(0)
    assert(r.getAs[String]("day") == "2024-01-01")
    assert(r.getAs[Long]("n_conversions") == 1L)
    assert(r.getAs[Double]("p50_min") == 30.0)
    assert(r.getAs[Double]("p90_min") == 30.0)
  }

  private def writeOrders(rows: Seq[(Long, Long, Timestamp, Double)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-r16o").toString
    rows.toDF("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/orders.parquet")
    dir
  }

  test("q_rfm: monotone recency/frequency/monetary customers land on the " +
    "diagonal segments 111..555") {
    // customer c: c orders on days 1..c, price 10 each -> recency rank,
    // frequency and monetary all order customers identically
    var id = 0L
    val rows = for (c <- 1L to 5L; d <- 1L to c) yield {
      id += 1
      (id, c, Timestamp.valueOf(f"2024-01-$d%02d 10:00:00"), 10.0)
    }
    val got = Relational.qRfm(spark, writeOrders(rows.toSeq))
      .orderBy("rfm_code").collect()
      .map(r => (r.getAs[Int]("rfm_code"), r.getAs[Long]("n_customers")))
    assert(got.toSeq == Seq((111, 1L), (222, 1L), (333, 1L), (444, 1L),
      (555, 1L)))
  }

  test("q_cohort_revenue: first-order month anchors the cohort; month " +
    "index is exact integer month arithmetic") {
    val dir = writeOrders(Seq(
      (1L, 1L, Timestamp.valueOf("2024-01-05 10:00:00"), 10.0),
      (2L, 1L, Timestamp.valueOf("2024-03-20 10:00:00"), 5.0),
      (3L, 2L, Timestamp.valueOf("2024-02-11 10:00:00"), 7.0)))
    val got = Relational.qCohortRevenue(spark, dir)
      .orderBy("cohort_month", "month_index").collect()
      .map(r => (r.getAs[String]("cohort_month"), r.getAs[Int]("month_index"),
        r.getAs[Long]("n_customers"), r.getAs[Long]("n_orders"),
        r.getAs[Double]("revenue")))
    assert(got.toSeq == Seq(("2024-01", 0, 1L, 1L, 10.0),
      ("2024-01", 2, 1L, 1L, 5.0), ("2024-02", 0, 1L, 1L, 7.0)))
  }
}
