package graft

import graft.operators.Recommender
import org.apache.spark.sql.functions._

/** Round-17 fixtures (hand-computed anchors for the r17 additions). */
class Round17Spec extends SparkSpec {

  test("ALS implicit fixture: a taste-sharing user's unseen item ranks " +
    "above an unrelated user's items") {
    import spark.implicits._
    // Users 1 and 2 share items 10, 11; user 2 also bought 12.
    // User 3 lives in a disjoint block (items 20, 21).
    // Collaborative filtering must score (1, 12) above (1, 20)/(1, 21).
    val inter = Seq(
      (1, 10, 3.0), (1, 11, 2.0),
      (2, 10, 2.0), (2, 11, 3.0), (2, 12, 3.0),
      (3, 20, 3.0), (3, 21, 2.0))
      .toDF("user", "item", "strength")
    val m = new org.apache.spark.ml.recommendation.ALS()
      .setUserCol("user").setItemCol("item").setRatingCol("strength")
      .setImplicitPrefs(true).setRank(2).setMaxIter(10)
      .setRegParam(0.1).setAlpha(8.0).setSeed(7L)
      .fit(inter)
    val cand = Seq((1, 12), (1, 20), (1, 21)).toDF("user", "item")
    val scores = m.transform(cand).collect()
      .map(r => r.getAs[Int]("item") -> r.getAs[Float]("prediction").toDouble)
      .toMap
    assert(scores(12) > scores(20) && scores(12) > scores(21),
      s"expected item 12 on top for user 1, got $scores")
  }

  test("q_als emits exactly AlsTopK ranked recs per anchor user at " +
    "sf0.001, scores nonincreasing within a user") {
    val rows = Recommender.qAls(spark, "/root/testdata/sf0.001")
      .orderBy(col("custkey"), col("rank")).collect()
    val byUser = rows.groupBy(_.getAs[Int]("custkey"))
    assert(byUser.nonEmpty)
    byUser.foreach { case (u, rs) =>
      assert(rs.length == Recommender.AlsTopK, s"user $u: ${rs.length} recs")
      assert(rs.map(_.getAs[Int]("rank")).toSeq == Seq(1, 2, 3))
      val sc = rs.sortBy(_.getAs[Int]("rank")).map(_.getAs[Double]("score")).toSeq
      assert(sc.sliding(2).forall(w => w.size < 2 || w(0) >= w(1)),
        s"user $u: scores not nonincreasing: $sc")
    }
  }

  test("q_als_audit: every certificate boolean true at sf0.001") {
    val r = Recommender.qAlsAudit(spark, "/root/testdata/sf0.001").collect()(0)
    for (c <- Seq("factors_ok", "finite_ok", "separation_ok", "coverage_ok"))
      assert(r.getAs[Boolean](c), s"$c false")
    assert(r.getAs[Long]("k") == Recommender.AlsRank.toLong)
    assert(r.getAs[Long]("n_interactions") >= r.getAs[Long]("n_users"))
  }

  test("t-digest aggregate: exact n/min/max, rank-bounded quantiles, and " +
    "the split-build-then-merge path honors the same contract (1..1000)") {
    import graft.functions.TDigestSketch._
    import spark.implicits._
    // deterministic non-sorted arrival: multiplicative shuffle of 1..1000
    val vals = (1 to 1000).map(i => ((i * 467) % 1000 + 1).toDouble)
    assert(vals.distinct.length == 1000)
    val df = vals.zipWithIndex
      .map { case (v, i) => (if (i % 2 == 0) "a" else "b", v) }
      .toDF("half", "v").repartition(7)
    def contract(row: org.apache.spark.sql.Row): Unit = {
      val t = row.getAs[org.apache.spark.sql.Row]("t")
      assert(t.getAs[Long]("n") == 1000L)
      assert(t.getAs[Double]("vmin") == 1.0 && t.getAs[Double]("vmax") == 1000.0)
      val qs = t.getAs[scala.collection.Seq[Double]]("qs")
      // envelope: |rank(est) − q·n| ≤ 0.02·n + 1 ⇒ est within ±21 of q·1000
      for ((q, est) <- Seq(0.5, 0.9, 0.99).zip(qs))
        assert(math.abs(est - q * 1000) <= 21.0, s"q=$q est=$est")
      assert(qs(0) <= qs(1) && qs(1) <= qs(2), "quantiles must be monotone")
    }
    // one-level build
    contract(df.agg(tdigestAgg(col("v")).as("sk"))
      .select(tdigestSummary(col("sk"), Seq(0.5, 0.9, 0.99)).as("t")).collect()(0))
    // two-level build: per-half sketches merged — the rollup algebra
    contract(df.groupBy("half").agg(tdigestAgg(col("v")).as("sk"))
      .agg(tdigestMergeAgg(col("sk")).as("sk"))
      .select(tdigestSummary(col("sk"), Seq(0.5, 0.9, 0.99)).as("t")).collect()(0))
  }

  test("q_tdigest / q_tdigest_audit at sf0.001: per-type percentile panel " +
    "is ordered and the certificate is all-green") {
    val sf = "/root/testdata/sf0.001"
    val panel = operators.ScaleOps.qTdigest(spark, sf).collect()
    assert(panel.nonEmpty)
    panel.foreach { r =>
      assert(r.getAs[Double]("vmin") <= r.getAs[Double]("p50") &&
        r.getAs[Double]("p50") <= r.getAs[Double]("p90") &&
        r.getAs[Double]("p90") <= r.getAs[Double]("p99") &&
        r.getAs[Double]("p99") <= r.getAs[Double]("vmax"),
        s"panel row out of order: $r")
    }
    val audit = operators.ScaleOps.qTdigestAudit(spark, sf).collect()
    assert(audit.length == panel.length * operators.ScaleOps.TDigestRanks.length)
    audit.foreach(r => assert(r.getAs[Boolean]("rank_ok"), s"rank_ok false: $r"))
    // the sketch's total weight IS the exact per-type row count
    val n = panel.map(r => r.getAs[String]("event_type") -> r.getAs[Long]("n")).toMap
    val exact = graft.sources.Tables.events(spark, sf)
      .groupBy("event_type").count().collect()
      .map(r => r.getAs[String]("event_type") -> r.getAs[Long]("count")).toMap
    assert(n == exact, s"sketch weight $n != exact counts $exact")
  }

  private def writeDocs(rows: Seq[(Long, String, String)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-r17d").toString
    rows.map { case (id, src, text) => (id, src, text, "en", text.length.toLong) }
      .toDF("doc_id", "source", "text", "lang", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("q_w2v fixture: vocabulary is exactly the minCount-eligible token " +
    "set, every anchor gets TopK ranked neighbors, cosines in [-1,1]") {
    // 4 words, each cf = 6 >= minCount 5; "rare" appears once -> excluded
    val dir = writeDocs((1L to 6L).map(i =>
      (i, "sa", "alpha beta gamma delta")) :+ (7L, "sb", "rare"))
    try {
      val vocab = operators.Embeddings.vectors(spark, dir).collect()
        .map(_.getAs[String]("word")).toSet
      assert(vocab == Set("alpha", "beta", "gamma", "delta"), vocab.toString)
      val nn = operators.Embeddings.qW2v(spark, dir).collect()
      val byAnchor = nn.groupBy(_.getAs[String]("anchor"))
      assert(byAnchor.keySet == vocab)
      byAnchor.foreach { case (a, rs) =>
        assert(rs.map(_.getAs[Int]("rank")).sorted.toSeq == Seq(1, 2, 3), a)
        rs.foreach { r =>
          val c = r.getAs[Double]("cos")
          assert(c >= -1.0 - 1e-9 && c <= 1.0 + 1e-9, s"$a cos $c")
          assert(r.getAs[String]("neighbor") != a)
        }
      }
      val audit = operators.Embeddings.qW2vAudit(spark, dir).collect()(0)
      assert(audit.getAs[Long]("n_vocab") == 4L)
      assert(audit.getAs[Long]("n_anchors") == 4L)
      for (c <- Seq("vocab_ok", "dims_ok", "finite_ok", "norm_ok", "coverage_ok"))
        assert(audit.getAs[Boolean](c), s"$c false")
    } finally
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }

  test("q_w2v_audit: every certificate boolean true at sf0.001") {
    val r = operators.Embeddings.qW2vAudit(spark, "/root/testdata/sf0.001").collect()(0)
    for (c <- Seq("vocab_ok", "dims_ok", "finite_ok", "norm_ok", "coverage_ok"))
      assert(r.getAs[Boolean](c), s"$c false")
    assert(r.getAs[Long]("k") == operators.Embeddings.W2vDim.toLong)
    assert(r.getAs[Long]("n_anchors") <=
      math.min(operators.Embeddings.W2vAnchors.toLong, r.getAs[Long]("n_vocab")))
  }

  test("q_qte: nine decile rows, q_treat - q_control identity, and a " +
    "plain-Scala interpolated-quantile recomputation on one arm") {
    val sf = "/root/testdata/sf0.001"
    val rows = operators.Stats.qQte(spark, sf).collect()
      .sortBy(_.getAs[Int]("pct"))
    assert(rows.map(_.getAs[Int]("pct")).toSeq == (1 to 9).map(_ * 10))
    rows.foreach { r =>
      assert(math.abs(r.getAs[Double]("qte") -
        BigDecimal(r.getAs[Double]("q_treat") - r.getAs[Double]("q_control"))
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble) <= 1e-4 + 1e-9,
        r.toString)
    }
    // third path: recompute the treatment arm's median in plain Scala
    val vals = graft.sources.Tables.events(spark, sf)
      .groupBy("user_id")
      .agg(sum(col("value").cast("decimal(18,6)")).cast("double").as("v"))
      .collect()
      .filter { x =>
        Integer.parseInt(java.security.MessageDigest.getInstance("MD5")
          .digest(x.getLong(0).toString.getBytes("UTF-8"))
          .take(1).map("%02x".format(_)).mkString.take(1), 16) < 8
      }
      .map(_.getAs[Double]("v")).sorted
    val h = 0.5 * (vals.length - 1)
    val med = vals(h.toInt) + (h - h.toInt) * (vals(h.toInt + 1) - vals(h.toInt))
    val p50 = rows.find(_.getAs[Int]("pct") == 50).get.getAs[Double]("q_treat")
    assert(math.abs(p50 - med) < 1e-3, s"$p50 vs $med")
  }

  test("q_acf: lag-1 row equals q_autocorr's r1 and a plain-Scala " +
    "recomputation across all seven lags on one type") {
    val sf = "/root/testdata/sf0.001"
    val acf = operators.Stats.qAcf(spark, sf).collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Int]("lag")) ->
        (if (r.isNullAt(r.fieldIndex("acf"))) None
         else Some(r.getAs[Double]("acf")))).toMap
    assert(acf.keySet.map(_._2) == (1 to 7).toSet)
    // plain-Scala recomputation on every type
    val byType = graft.sources.Tables.events(spark, sf)
      .select(col("event_type"), date_format(col("ts"), "yyyy-MM-dd").as("day"),
        col("value").cast("decimal(18,6)").as("v"))
      .groupBy("event_type", "day")
      .agg(sum(col("v")).cast("double").as("y"))
      .collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[String]("day"),
        r.getAs[Double]("y")))
      .groupBy(_._1).map { case (et, rs) => et -> rs.sortBy(_._2).map(_._3) }
    for ((et, ys) <- byType; k <- 1 to 7) {
      val ybar = ys.sum / ys.length
      val den = ys.map(y => (y - ybar) * (y - ybar)).sum
      val num = (0 until ys.length - k)
        .map(i => (ys(i) - ybar) * (ys(i + k) - ybar)).sum
      val exp = if (den > 0) Some(num / den) else None
      (acf((et, k)), exp) match {
        case (Some(a), Some(e)) => assert(math.abs(a - e) < 1e-5, s"$et lag $k")
        case (None, None) =>
        case (a, e) => fail(s"$et lag $k: $a vs $e")
      }
    }
  }

  test("q_srm: chi2 identity against plain-Scala recount, no mismatch on " +
    "the md5 half-split") {
    val sf = "/root/testdata/sf0.001"
    val r = operators.Stats.qSrm(spark, sf).collect()(0)
    val users = graft.sources.Tables.events(spark, sf)
      .select("user_id").distinct().collect().map(_.getLong(0))
    def md5n(x: Long) = Integer.parseInt(java.security.MessageDigest
      .getInstance("MD5").digest(x.toString.getBytes("UTF-8"))
      .take(1).map("%02x".format(_)).mkString.take(1), 16)
    val na = users.count(u => md5n(u) < 8).toLong
    val nb = users.length - na
    assert(r.getAs[Long]("n_a") == na && r.getAs[Long]("n_b") == nb)
    val chi = (na - nb).toDouble * (na - nb).toDouble / (na + nb).toDouble
    assert(math.abs(r.getAs[Double]("chi2") - chi) < 1e-6)
    assert(r.getAs[Boolean]("mismatch") == (chi > operators.Stats.SrmChiCrit))
  }

  test("q_pattern_match fixture: quantified browse prefix matches, " +
    "wrong-order and cross-session paths do not") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-r17pm").toString
    def ts(h: Int, m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    // s1 (u1): view,click,view,purchase -> MATCH (browse* prefix)
    // s2 (u2): click,purchase -> no (must start with view)
    // s3 (u3): view,purchase in SEPARATE sessions -> no
    // s4 (u4): view,purchase -> MATCH (empty quantifier)
    val rows = Seq(
      (1L, ts(8, 0), 1L, "view"), (2L, ts(8, 5), 1L, "click"),
      (3L, ts(8, 10), 1L, "view"), (4L, ts(8, 15), 1L, "purchase"),
      (5L, ts(9, 0), 2L, "click"), (6L, ts(9, 5), 2L, "purchase"),
      (7L, ts(10, 0), 3L, "view"), (8L, ts(11, 0), 3L, "purchase"),
      (9L, ts(12, 0), 4L, "view"), (10L, ts(12, 5), 4L, "purchase"))
    try {
      rows.map { case (id, t, u, e) => (id, t, u, e, 1.0, "{}") }
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
      val r = operators.Relational.qPatternMatch(spark, dir).collect()
      assert(r.length == 1)
      assert(r(0).getAs[Long]("n_sessions") == 5L, r(0).toString)
      assert(r(0).getAs[Long]("n_matched") == 2L, r(0).toString)
      assert(r(0).getAs[Double]("match_rate") == 0.4)
    } finally
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }

  test("q_setops_bag fixture: multiplicities preserved (intersect-all = " +
    "min count, except-all = surplus)") {
    import spark.implicits._
    // b = {1,1,1,2}, m = {1,2,2}: both_all 1->1? no: min(3,1)... wait
    // intersectAll keeps min(3,1)=1 copy of 1 and min(1,2)=1 copy of 2;
    // exceptAll keeps 3-1=2 copies of 1.
    val b = Seq(1, 1, 1, 2).toDF("v")
    val m = Seq(1, 2, 2).toDF("v")
    val got = b.intersectAll(m).groupBy("v").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(got == Map(1 -> 1L, 2 -> 1L), got.toString)
    val ex = b.exceptAll(m).groupBy("v").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(ex == Map(1 -> 2L), ex.toString)
    // the corpus query: every surplus multiplicity is consistent with
    // the raw per-nation segment counts
    val rows = operators.Relational.qSetopsBag(spark, "/root/testdata/sf0.001")
      .collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getAs[Long]("n") >= 1L))
  }

  test("q_audience_overlap: identities on a hand fixture (disjoint pair " +
    "absent, nested pair at |A|/|B|)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-r17a").toString
    def ts(h: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:00:00")
    // view audience {1,2,3}; click audience {2,3} (nested); purchase {9}
    val rows = Seq((1L, 1L, "view"), (2L, 2L, "view"), (3L, 3L, "view"),
      (4L, 2L, "click"), (5L, 3L, "click"), (6L, 9L, "purchase"))
    try {
      rows.zipWithIndex.map { case ((id, u, e), i) => (id, ts(8 + i), u, e, 1.0, "{}") }
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
      val got = operators.Relational.qAudienceOverlap(spark, dir).collect()
        .map(r => (r.getAs[String]("type_a"), r.getAs[String]("type_b")) ->
          r.getAs[Double]("jaccard")).toMap
      // click < view alphabetically; nested: |A∩B|=2, |A∪B|=3 -> 0.666667
      assert(got == Map(("click", "view") -> 0.666667), got.toString)
    } finally
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }

  test("q_jaccard_prefix: prefix filter is lossless (same pairs as the " +
    "unfiltered join) and strictly cheaper (fewer candidate pairs)") {
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"
    val sh = operators.Dedup.docShingles(spark, sf)
    // brute force in DataFrame algebra: full posting join, same tau
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    val full = sh.select(col("doc_id").as("doc_a"), col("sh"))
      .join(sh.select(col("doc_id").as("doc_b"), col("sh")), Seq("sh"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("common"))
      .join(sizes.select(col("doc_id").as("doc_a"), col("sz").as("sz_a")), Seq("doc_a"))
      .join(sizes.select(col("doc_id").as("doc_b"), col("sz").as("sz_b")), Seq("doc_b"))
      .filter(col("common").cast("double") /
        (col("sz_a") + col("sz_b") - col("common")).cast("double") >=
        operators.Dedup.PrefixJaccardTau)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val got = operators.Dedup.qJaccardPrefix(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    assert(got == full, s"only-prefix ${got -- full}, only-full ${full -- got}")
    assert(got.nonEmpty, "corpus must contain planted near-dups above tau")
    got.foreach { case (a, b) => assert(a < b) }
  }

  test("cox newton: closed-form root recovered on a one-time risk table " +
    "and all audit booleans true at sf0.001") {
    // one event time: d1=2, d0=1, n1=4, n0=4 -> U(beta)=0 gives
    // 2 = 3*4e^b/(4+4e^b) -> e^b = 2 -> beta = ln 2
    val (beta, uF, iF, u0) = operators.Stats.coxNewton(Seq((1, 2L, 1L, 4L, 4L)))
    assert(math.abs(beta - math.log(2.0)) < 1e-9, s"beta $beta")
    assert(math.abs(uF) < 1e-12 && iF > 0.0)
    // U(0) = d1 - d*n1/n = 2 - 3*0.5 = 0.5
    assert(math.abs(u0 - 0.5) < 1e-12)
    val sf = "/root/testdata/sf0.001"
    val r = operators.Stats.qCox(spark, sf).collect()(0)
    assert(math.abs(r.getAs[Double]("hazard_ratio") -
      math.exp(r.getAs[Double]("beta"))) < 1e-5)
    assert(r.getAs[Long]("n_times") >= 1L)
    val a = operators.Stats.qCoxAudit(spark, sf).collect()(0)
    for (b <- Seq("converged_ok", "info_pos_ok", "finite_ok", "logrank_anchor_ok"))
      assert(a.getAs[Boolean](b), s"$b false")
    assert(a.getAs[Long]("n_events") >= a.getAs[Long]("n_events_treat"))
  }

  test("wordpiece localTrain: hand-computed two rounds including the " +
    "likelihood tie-break (score tie broken by pair count)") {
    val got = operators.Wordpiece.localTrain(Seq("abab" -> 2L, "ab" -> 3L), 2)
    // round 1: (a,##b) n=5 vs (##b,##a) n=2 both score 5/35 = 2/14 =
    // 0.142857...; pair-count tie-break picks (a,##b) -> "ab"
    assert(got(0)._1 == 1 && got(0)._2 == "a" && got(0)._3 == "##b" &&
      got(0)._4 == "ab" && got(0)._5 == 5L, got(0).toString)
    // round 2: (##a,##b) 2/(2*2)=0.5 beats (ab,##a) 2/(5*2)=0.2
    assert(got(1)._1 == 2 && got(1)._2 == "##a" && got(1)._3 == "##b" &&
      got(1)._4 == "##ab" && got(1)._5 == 2L, got(1).toString)
  }

  test("wordpiece longest-match: max-munch can legitimately differ from " +
    "merge replay (hand case), UNK on uncovered positions, and the " +
    "encode audit is green at sf0.001") {
    import operators.Wordpiece._
    // merges (##b,##c)->##bc then (a,##b)->ab. Replay on "abc" gives
    // [a, ##bc]; max-munch against the SAME piece vocab takes the
    // longest word-initial piece first: [ab, ##c].
    val vocab = Set("a", "##b", "##c", "ab", "##bc")
    assert(longestMatch("abc", vocab) == Vector("ab", "##c"))
    // replay: apply (##b,##c) first
    import spark.implicits._
    val replay = encodeWords(Seq("abc").toDF("w"),
      Seq(("##b", "##c", "##bc"), ("a", "##b", "ab")))
      .collect()(0).getSeq[String](1)
    assert(replay == Seq("a", "##bc"), replay.toString)
    assert(longestMatch("axc", vocab) == Vector("[UNK]"))
    val a = qWordpieceEncodeAudit(spark, "/root/testdata/sf0.001").collect()
    assert(a.nonEmpty)
    a.foreach { r =>
      assert(r.getAs[Boolean]("bounds_ok"), r.toString)
      assert(r.getAs[Boolean]("unk_ok"), r.toString)
    }
  }

  test("wordpiece: distributed loop equals localTrain on sf0.001 and " +
    "every audit boolean true") {
    val sf = "/root/testdata/sf0.001"
    val local = operators.Wordpiece.qWordpiece(spark, sf).collect()
      .map(r => (r.getAs[Int]("rank"), r.getAs[String]("left"),
        r.getAs[String]("right"), r.getAs[String]("merged"),
        r.getAs[Long]("pair_count"))).toSeq.sortBy(_._1)
    val dist = operators.Wordpiece.train(spark, sf, localVocabLimit = 0L)
      .collect()
      .map(r => (r.getAs[Int]("rank"), r.getAs[String]("left"),
        r.getAs[String]("right"), r.getAs[String]("merged"),
        r.getAs[Long]("pair_count"))).toSeq.sortBy(_._1)
    assert(local == dist, s"local $local != distributed $dist")
    assert(local.length == operators.Wordpiece.WpMerges)
    val a = operators.Wordpiece.qWordpieceAudit(spark, sf).collect()(0)
    for (b <- Seq("roundtrip_ok", "bounds_ok", "merges_ok", "scores_ok"))
      assert(a.getAs[Boolean](b), s"$b false")
  }

  test("q_embed_drift fixture: opposed sign-buckets give the hand-" +
    "computed PSI, identical populations give 0") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-r17e2").toString
    // label 0: all four leading dims positive (bucket 15); label 1: all
    // negative (bucket 0); label 2: same as label 0 -> psi(0,2) = 0
    val rows = (1 to 4).map(i => (i.toLong, Seq(1f, 1f, 1f, 1f), 0)) ++
      (5 to 8).map(i => (i.toLong, Seq(-1f, -1f, -1f, -1f), 1)) ++
      (9 to 12).map(i => (i.toLong, Seq(2f, 2f, 2f, 2f), 2))
    try {
      rows.toDF("vec_id", "embedding", "label")
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
      val got = operators.SimilaritySearch.qEmbedDrift(spark, dir).collect()
        .map(r => (r.getAs[Int]("label_a"), r.getAs[Int]("label_b")) ->
          r.getAs[Double]("psi")).toMap
      // hand: 2 * 0.2 * ln 5 = 0.643775 for the opposed pairs
      assert(math.abs(got((0, 1)) - 0.643775) < 1e-6, got.toString)
      assert(math.abs(got((1, 2)) - 0.643775) < 1e-6, got.toString)
      assert(got((0, 2)) == 0.0, got.toString)
    } finally
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }

  test("q_growth_accounting: hand-computed classes on a gap fixture and " +
    "both conservation identities at sf0.001") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-r17g").toString
    def ts(d: Int) = java.sql.Timestamp.valueOf(f"2024-01-$d%02d 08:00:00")
    // u1: d1,d2,d4 (retained d2, resurrected d4); u2: d2 only (new);
    // u3: d1 then gone (churned into d2)
    val rows = Seq((1L, ts(1), 1L), (2L, ts(2), 1L), (3L, ts(4), 1L),
      (4L, ts(2), 2L), (5L, ts(1), 3L))
    try {
      rows.map { case (id, t, u) => (id, t, u, "view", 1.0, "{}") }
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
      val got = operators.Relational.qGrowthAccounting(spark, dir).collect()
        .map(r => r.getAs[String]("day") -> r).toMap
      val d1 = got("2024-01-01"); val d2 = got("2024-01-02"); val d4 = got("2024-01-04")
      assert(d1.getAs[Long]("dau") == 2L && d1.getAs[Long]("n_new") == 2L)
      assert(d1.isNullAt(d1.fieldIndex("n_churned")))
      assert(d2.getAs[Long]("dau") == 2L && d2.getAs[Long]("n_new") == 1L &&
        d2.getAs[Long]("n_retained") == 1L && d2.getAs[Long]("n_churned") == 1L)
      assert(d2.getAs[Double]("retention_rate") == 0.5)
      assert(d4.getAs[Long]("n_resurrected") == 1L &&
        d4.isNullAt(d4.fieldIndex("n_churned")), "gap day has no churn baseline")
      // identities on the real corpus
      val sf = operators.Relational.qGrowthAccounting(spark, "/root/testdata/sf0.001")
        .orderBy(col("day")).collect()
      var prevDau = -1L
      var prevDay = ""
      for (r <- sf) {
        assert(r.getAs[Long]("dau") == r.getAs[Long]("n_new") +
          r.getAs[Long]("n_retained") + r.getAs[Long]("n_resurrected"),
          s"identity 1 fails on ${r.getAs[String]("day")}")
        if (!r.isNullAt(r.fieldIndex("n_churned"))) {
          assert(java.time.LocalDate.parse(r.getAs[String]("day")).minusDays(1)
            .toString == prevDay)
          assert(prevDau == r.getAs[Long]("n_retained") + r.getAs[Long]("n_churned"),
            s"identity 2 fails on ${r.getAs[String]("day")}")
        }
        prevDau = r.getAs[Long]("dau"); prevDay = r.getAs[String]("day")
      }
      assert(sf.length >= 2)
    } finally
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }

  test("q_sample_fixed: the bottom-k reservoir equals a plain-Scala md5 " +
    "sort and is a strict subset under k") {
    val sf = "/root/testdata/sf0.001"
    val got = operators.TextAnalysis.qSampleFixed(spark, sf).collect()
      .map(_.getAs[Long]("doc_id"))
    assert(got.length == operators.TextAnalysis.SampleFixedK)
    def md5hex(x: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val exp = graft.sources.Tables.documents(spark, sf)
      .select("doc_id").collect().map(_.getLong(0))
      .sortBy(id => (md5hex(id.toString), id))
      .take(operators.TextAnalysis.SampleFixedK)
    assert(got.toSeq == exp.toSeq, "bottom-k by md5 must match exactly")
  }

  test("q_feature_hash: accounting identities hold and a planted " +
    "collision is counted once per bucket") {
    val sf = "/root/testdata/sf0.001"
    val r = operators.TextAnalysis.qFeatureHash(spark, sf).collect()(0)
    assert(r.getAs[Long]("n_buckets") == 1024L)
    assert(r.getAs[Long]("n_used") <= r.getAs[Long]("n_vocab"))
    assert(r.getAs[Long]("n_collided_tokens") >=
      2L * r.getAs[Long]("n_collided_buckets"))
    // identity: vocab = non-collided (used - collided buckets) + collided tokens
    assert(r.getAs[Long]("n_vocab") ==
      (r.getAs[Long]("n_used") - r.getAs[Long]("n_collided_buckets")) +
        r.getAs[Long]("n_collided_tokens"), r.toString)
    assert(r.getAs[Long]("max_bucket_tokens") >= 1L)
    val share = r.getAs[Double]("collided_token_share")
    assert(share >= 0.0 && share <= 1.0)
  }

  test("q_paths fixture: session-bounded trigrams hand-computed, " +
    "cross-session sequences never stitched") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-r17p").toString
    def ts(h: Int, m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    // user 1 session A: view,click,purchase,view -> trigrams vcp, cpv
    // user 1 session B (gap > 30 min): view,view,click -> vvc
    // user 2: click,view -> too short
    val rows = Seq(
      (1L, ts(8, 0), 1L, "view"), (2L, ts(8, 5), 1L, "click"),
      (3L, ts(8, 10), 1L, "purchase"), (4L, ts(8, 15), 1L, "view"),
      (5L, ts(10, 0), 1L, "view"), (6L, ts(10, 5), 1L, "view"),
      (7L, ts(10, 10), 1L, "click"),
      (8L, ts(9, 0), 2L, "click"), (9L, ts(9, 5), 2L, "view"))
    try {
      rows.map { case (id, t, u, e) => (id, t, u, e, 1.0, "{}") }
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
      val got = operators.Relational.qPaths(spark, dir).collect()
        .map(r => (r.getAs[String]("e1"), r.getAs[String]("e2"),
          r.getAs[String]("e3")) -> ((r.getAs[Long]("n"), r.getAs[Double]("share"))))
        .toMap
      assert(got == Map(
        ("view", "click", "purchase") -> ((1L, 0.333333)),
        ("click", "purchase", "view") -> ((1L, 0.333333)),
        ("view", "view", "click") -> ((1L, 0.333333))), got.toString)
    } finally
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }

  test("q_sppmi fixture: hand-computed pair counts and shifted PMI on a " +
    "planted strong collocation") {
    // doc = "alpha beta alpha beta alpha beta ..." (x8): within +/-2,
    // almost every context of alpha is beta and vice versa -> the
    // (alpha, beta) cell survives the ln(k=5) shift; same-word pairs
    // (alpha, alpha) at offset 2 are diluted and must be dropped.
    val dir = writeDocs(Seq((1L, "sa", Seq.fill(8)("alpha beta").mkString(" "))))
    try {
      // positions: a at 1,3,..,15; b at 2,4,..,16 (16 tokens). Offset-1
      // pairs: 15 (8 ab + 7 ba); offset-2: 14 (7 aa + 7 bb). Both
      // directions double everything: n(a,b) = n(b,a) = 30,
      // n(a,a) = n(b,b) = 14. N = 88, n_a = n(a,b)+n(a,a) = 44 = n_b.
      // sppmi(a,b) = ln((30*88)/(44*44*5)) < 0 ?  (2640/9680 = 0.2727..)
      // -> ln < 0: dropped! sppmi(a,a) = ln(14*88/(44*44*5)) < 0 too.
      // With shift k=5 nothing survives on a 2-word vocab - verify the
      // empty-positive result, then check the UNSHIFTED arithmetic by
      // recomputing from the memoized pair relation.
      val got = operators.TextAnalysis.qSppmi(spark, dir).collect()
      assert(got.isEmpty, s"2-token round-robin has no >ln5 association: " +
        got.mkString(","))
      // third arithmetic path: rebuild the ENTIRE matrix in plain Scala
      // from the collected clean docs and compare cell-for-cell
      val sf = "/root/testdata/sf0.001"
      val m = operators.TextAnalysis.qSppmi(spark, sf).collect()
        .map(r => (r.getAs[String]("w"), r.getAs[String]("c")) ->
          ((r.getAs[Long]("n_wc"), r.getAs[Double]("sppmi")))).toMap
      assert(m.nonEmpty)
      val docs = operators.TextPrep.cleanDocs(spark, sf).select("toks").collect()
        .map(_.getSeq[String](0))
      val pc = scala.collection.mutable.Map.empty[(String, String), Long]
        .withDefaultValue(0L)
      for (t <- docs; k <- 1 to 2; i <- 0 until t.length - k) {
        pc((t(i), t(i + k))) += 1L; pc((t(i + k), t(i))) += 1L
      }
      val nW = pc.toSeq.groupBy(_._1._1).map { case (w, xs) => w -> xs.map(_._2).sum }
      val nn = pc.values.sum.toDouble
      val exp = pc.flatMap { case ((w, c), nwc) =>
        val v = math.log(((nwc.toDouble * nn) / (nW(w).toDouble * nW(c).toDouble)) / 5.0)
        if (v > 0.0) Some((w, c) -> ((nwc, math.floor(v * 1e6 + 0.5) / 1e6))) else None
      }.toMap
      val expR = exp.map { case (k, (n, v)) => k -> ((n, BigDecimal(v).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble)) }
      assert(m.keySet == expR.keySet,
        s"cells differ: only-got ${m.keySet -- expR.keySet}, only-exp ${expR.keySet -- m.keySet}")
      for ((k, (n, v)) <- expR) {
        assert(m(k)._1 == n, s"$k count ${m(k)._1} != $n")
        assert(math.abs(m(k)._2 - v) <= 1e-6, s"$k sppmi ${m(k)._2} != $v")
      }
    } finally
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }

  test("q_gmm: k weight-ordered components at sf0.001, weights a proper " +
    "simplex, and every q_gmm_audit certificate boolean true") {
    val sf = "/root/testdata/sf0.001"
    val comps = operators.SimilaritySearch.qGmm(spark, sf).collect()
    assert(comps.length == operators.SimilaritySearch.GmmK)
    val ws = comps.map(_.getAs[Double]("weight"))
    assert(ws.sliding(2).forall(p => p.size < 2 || p(0) >= p(1)),
      s"weights not ordered: ${ws.toSeq}")
    assert(math.abs(ws.sum - 1.0) < 1e-4, s"weight sum ${ws.sum}")
    comps.foreach { c =>
      assert(c.getAs[Double]("cov_trace") > 0.0, c.toString)
      assert(c.getAs[Double]("mu_norm") >= 0.0, c.toString)
    }
    val a = operators.SimilaritySearch.qGmmAudit(spark, sf).collect()(0)
    for (b <- Seq("weights_ok", "resp_ok", "finite_ok", "cov_diag_ok"))
      assert(a.getAs[Boolean](b), s"$b false")
    assert(a.getAs[Long]("n_points") == 500L)
  }

  test("games-howell core: hand-computed Welch se/df on an unequal-" +
    "variance fixture, NULL significance below the df floor, and the " +
    "shifted high-df fixture trips the flag") {
    import spark.implicits._
    // A: tight around 3 (var 2.5), B: spread around 30 (var 250)
    val small = (Seq.tabulate(5)(i => ("a", (i + 1).toDouble)) ++
      Seq.tabulate(5)(i => ("b", (i + 1) * 10.0))).toDF("g", "x")
    val r = operators.Stats.gamesHowellOf(small).collect()(0)
    val (na, nb) = (5.0, 5.0)
    val (ma, mb) = (3.0, 30.0)
    val (va, vb) = (2.5, 250.0)
    val (sea, seb) = (va / na, vb / nb)
    val qExp = math.abs(ma - mb) / math.sqrt((sea + seb) / 2.0)
    val dfExp = (sea + seb) * (sea + seb) /
      (sea * sea / (na - 1.0) + seb * seb / (nb - 1.0))
    assert(math.abs(r.getAs[Double]("q") - qExp) < 1e-6, r.toString)
    assert(math.abs(r.getAs[Double]("df_welch") - dfExp) < 1e-6, r.toString)
    assert(r.isNullAt(r.fieldIndex("significant")),
      s"df ${r.getAs[Double]("df_welch")} below floor must yield NULL")
    // high-df shifted fixture (two 3-group sets so the k=3 crit row
    // applies): groups c/d/e, d shifted far -> (c,d) and (d,e) flagged
    val big = (Seq.tabulate(200)(i => ("c", (i % 10).toDouble)) ++
      Seq.tabulate(200)(i => ("d", 100.0 + (i % 13).toDouble)) ++
      Seq.tabulate(200)(i => ("e", (i % 11).toDouble))).toDF("g", "x")
    val flags = operators.Stats.gamesHowellOf(big).collect()
      .map(x => (x.getAs[String]("g_a"), x.getAs[String]("g_b")) ->
        x.getAs[Boolean]("significant")).toMap
    assert(flags == Map(("c", "d") -> true, ("d", "e") -> true,
      ("c", "e") -> false), flags.toString)
  }

  test("q_holt_winters: hand-computed two-step recursion and a full " +
    "Scala replay across the period boundary at sf0.001") {
    val sf = "/root/testdata/sf0.001"
    val got = operators.Stats.qHoltWinters(spark, sf).collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[String]("day")) ->
        ((r.getAs[Double]("level"), r.getAs[Double]("trend"),
          r.getAs[Double]("seasonal")))).toMap
    // third arithmetic path: replay the recursion in plain Scala over
    // the exact daily sums
    val daily = graft.sources.Tables.events(spark, sf)
      .select(col("event_type"), date_format(col("ts"), "yyyy-MM-dd").as("day"),
        col("value").cast("decimal(18,6)").as("v"))
      .groupBy("event_type", "day")
      .agg(sum(col("v")).cast("double").as("y"))
      .collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[String]("day"),
        r.getAs[Double]("y")))
      .groupBy(_._1).map { case (et, rs) => et -> rs.sortBy(_._2).map(x => (x._2, x._3)) }
    val rnd = (x: Double) => math.floor(x * 1e6 + 0.5) / 1e6
    for ((et, series) <- daily) {
      var l = 0.0; var b = 0.0; var first = true
      var s = Vector.empty[Double]
      for ((day, y) <- series) {
        val sPrev = if (s.length >= 7) s.head else 0.0
        val nl = if (first) y else 0.5 * (y - sPrev) + 0.5 * (l + b)
        val nb = if (first) 0.0 else 0.25 * (nl - l) + 0.75 * b
        val ns = 0.25 * (y - nl) + 0.75 * sPrev
        s = (if (s.length >= 7) s.tail else s) :+ ns
        l = nl; b = nb; first = false
        val exp = (rnd(nl), rnd(nb), rnd(ns))
        assert(got((et, day)) == exp, s"($et, $day): ${got((et, day))} != $exp")
      }
      assert(series.length >= 8, s"$et: series too short to cross the period")
    }
  }

  test("q_hw_eval: MAE/MASE recomputed through the plain-Scala recursion " +
    "replay, beats_naive consistent with the sums") {
    val sf = "/root/testdata/sf0.001"
    val got = operators.Stats.qHwEval(spark, sf).collect()
      .map(r => r.getAs[String]("event_type") -> r).toMap
    val daily = graft.sources.Tables.events(spark, sf)
      .select(col("event_type"), date_format(col("ts"), "yyyy-MM-dd").as("day"),
        col("value").cast("decimal(18,6)").as("v"))
      .groupBy("event_type", "day")
      .agg(sum(col("v")).cast("double").as("y"))
      .collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[String]("day"),
        r.getAs[Double]("y")))
      .groupBy(_._1).map { case (et, rs) => et -> rs.sortBy(_._2).map(x => x._3) }
    for ((et, ys) <- daily) {
      var l = 0.0; var b = 0.0; var first = true
      var sArr = Vector.empty[Double]
      var eHw = 0.0; var eN1 = 0.0; var n = 0
      var prevY = Double.NaN
      for (y <- ys) {
        val sPrev = if (sArr.length >= 7) sArr.head else 0.0
        if (!first && !prevY.isNaN) {
          val fit = l + b + sPrev
          eHw += math.abs(y - fit); eN1 += math.abs(y - prevY); n += 1
        }
        val nl = if (first) y else 0.5 * (y - sPrev) + 0.5 * (l + b)
        val nb = if (first) 0.0 else 0.25 * (nl - l) + 0.75 * b
        val ns = 0.25 * (y - nl) + 0.75 * sPrev
        sArr = (if (sArr.length >= 7) sArr.tail else sArr) :+ ns
        l = nl; b = nb; first = false; prevY = y
      }
      val r = got(et)
      assert(r.getAs[Long]("n_eval") == n.toLong, s"$et n")
      assert(math.abs(r.getAs[Double]("mae_hw") - eHw / n) < 1e-5, s"$et mae")
      assert(math.abs(r.getAs[Double]("mase_vs_naive") - eHw / eN1) < 1e-4,
        s"$et mase")
      assert(r.getAs[Boolean]("beats_naive") == (eHw < eN1), s"$et beats")
    }
  }

  test("q_brier: doc-level recomputation matches and the Murphy " +
    "decomposition identity brier = rel - res + unc + wbv - 2*wbc holds") {
    val sf = "/root/testdata/sf0.001"
    val r = operators.TextScoring.qBrier(spark, sf).collect()(0)
    // third arithmetic path: collect the 500 doc-level (quality, pass)
    // pairs and recompute every component in plain Scala
    val docs = operators.TextAnalysis.qQuality(spark, sf)
      .select(col("doc_id"), col("quality"))
      .join(operators.TextAnalysis.qQualityRules(spark, sf)
        .select(col("doc_id"), col("passes")), Seq("doc_id"))
      .collect()
      .map(x => (math.floor(x.getAs[Double]("quality") * 1048576.0).toLong,
        if (x.getAs[Boolean]("passes")) 1L else 0L,
        math.min(math.floor(x.getAs[Double]("quality") * 10).toLong, 9L)))
    val n = docs.length.toDouble
    val brier = docs.map(d => { val e = (d._1 - d._2 * 1048576L).toDouble; e * e })
      .sum / (n * 1099511627776.0)
    assert(math.abs(r.getAs[Double]("brier") - brier) < 1e-5,
      s"brier ${r.getAs[Double]("brier")} vs recomputed $brier")
    assert(r.getAs[Long]("n") == docs.length.toLong)
    assert(r.getAs[Long]("n_pass") == docs.map(_._2).sum)
    val identityGap = r.getAs[Double]("brier") -
      (r.getAs[Double]("reliability") - r.getAs[Double]("resolution") +
        r.getAs[Double]("uncertainty") + r.getAs[Double]("within_bin_var") -
        2.0 * r.getAs[Double]("within_bin_cov"))
    assert(math.abs(identityGap) < 5e-6, s"decomposition gap $identityGap")
    assert(r.getAs[Double]("resolution") >= 0 && r.getAs[Double]("reliability") >= 0
      && r.getAs[Double]("within_bin_var") >= 0)
  }

  test("q_streaks fixture: gaps-and-islands longest-run per user, " +
    "distribution hand-computed") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-r17e").toString
    def ts(d: Int, h: Int) = java.sql.Timestamp.valueOf(f"2024-01-$d%02d $h%02d:00:00")
    // user 1: days 1,2,3 then 5,6 (two visits on day 2) -> best 3
    // user 2: days 1, 3 -> best 1;  user 3: days 4..7 -> best 4
    val rows = Seq((1L, ts(1, 8)), (2L, ts(2, 9)), (3L, ts(2, 21)),
      (4L, ts(3, 8)), (5L, ts(5, 8)), (6L, ts(6, 8))).map(r => (r._1, r._2, 1L)) ++
      Seq((7L, ts(1, 8)), (8L, ts(3, 8))).map(r => (r._1, r._2, 2L)) ++
      (4 to 7).map(d => (8L + d, ts(d, 8), 3L))
    try {
      rows.map { case (id, t, u) => (id, t, u, "view", 1.0, "{}") }
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
      val got = operators.Relational.qStreaks(spark, dir).collect()
        .map(r => r.getAs[Long]("streak_days") ->
          ((r.getAs[Long]("n_users"), r.getAs[Double]("share")))).toMap
      assert(got == Map(3L -> ((1L, 0.333333)), 1L -> ((1L, 0.333333)),
        4L -> ((1L, 0.333333))), s"got $got")
    } finally
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }

  test("q_exact_substr fixture: one left-maximal unit per planted repeat, " +
    "exact length/occurrence counts, cap honored, spans cover the full " +
    "repeat extents (hand-computed)") {
    // P = 12 planted tokens shared by docs 1-2 (different neighbors →
    // exactly ONE left-maximal unit of length 12; the two interior
    // 10-gram groups share their preceding token and must be pruned).
    val p = (1 to 12).map(i => s"p$i").mkString(" ")
    // Q = 45 planted tokens (> cap 40) shared by docs 3-4; doc 3 starts
    // with it (no preceding token → left-maximal even though doc 4 has
    // one), so the unit reports at the cap with capped = true.
    val q = (1 to 45).map(i => s"q$i").mkString(" ")
    val dir = writeDocs(Seq(
      (1L, "sa", s"xa xb $p ya yb"),
      (2L, "sb", s"za $p wa"),
      (3L, "sc", s"$q aa bb"),
      (4L, "sd", s"ca da ea $q")))
    try {
      val units = operators.Dedup.qExactSubstr(spark, dir).collect()
        .map(r => (r.getAs[Long]("repeat_toks"), r.getAs[Long]("n_occ"),
          r.getAs[Long]("n_docs"), r.getAs[Boolean]("capped"))).sortBy(_._1)
      assert(units.toSeq == Seq((12L, 2L, 2L, false), (40L, 2L, 2L, true)),
        s"units: ${units.toSeq}")
      val spans = operators.Dedup.qExactSubstrSpans(spark, dir).collect()
        .map(r => r.getAs[Long]("doc_id") ->
          ((r.getAs[Long]("span_start"), r.getAs[Long]("span_end")))).toMap
      // P sits at tokens 2..13 of doc 1 and 1..12 of doc 2; Q fills
      // 0..44 of doc 3 and 3..47 of doc 4 — coverage is cap-immune
      // because interior duplicated suffixes chain to the true extent
      assert(spans == Map(1L -> ((2L, 13L)), 2L -> ((1L, 12L)),
        3L -> ((0L, 44L)), 4L -> ((3L, 47L))), s"spans: $spans")
      // cross-source matrix (hand-computed): P spans (sa, sb) with its
      // 3 duplicated 10-grams and 1 left-maximal unit of 12 tokens;
      // Q spans (sc, sd) with 36 grams, 1 unit, capped max run of 40
      val verb = operators.Dedup.qSourceVerbatim(spark, dir).collect()
        .map(r => (r.getAs[String]("src_a"), r.getAs[String]("src_b")) ->
          ((r.getAs[Long]("n_grams_shared"), r.getAs[Long]("n_units_shared"),
            r.getAs[Long]("max_repeat_toks")))).toMap
      assert(verb == Map(("sa", "sb") -> ((3L, 1L, 12L)),
        ("sc", "sd") -> ((36L, 1L, 40L))), s"verbatim matrix: $verb")
    } finally
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }

  test("q_exact_substr at sf0.001: units are what q_dup_spans cannot " +
    "name — every unit at least MinLen tokens with >=2 occurrences, " +
    "uncapped units' md5 lengths consistent") {
    val rows = operators.Dedup.qExactSubstr(spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("repeat_toks") >= operators.Dedup.ExactSubstrMinLen.toLong)
      assert(r.getAs[Long]("repeat_toks") <= operators.Dedup.ExactSubstrCap.toLong)
      assert(r.getAs[Long]("n_occ") >= 2L)
      assert(r.getAs[Long]("n_docs") >= 1L)
      assert(r.getAs[Boolean]("capped") ==
        (r.getAs[Long]("repeat_toks") == operators.Dedup.ExactSubstrCap.toLong))
    }
  }

  test("q_neg_sampling fixture: wq = floor(2^20 * cf^0.75) through the " +
    "sqrt composition (hand-computed), rare tokens boosted above their " +
    "unigram share, frequent ones flattened") {
    val dir = writeDocs(Seq((1L, "sa", "alpha alpha alpha alpha beta")))
    try {
      val rows = operators.TextScoring.qNegSampling(spark, dir).collect()
        .map(r => r.getAs[String]("tok") ->
          ((r.getAs[Long]("cf"), r.getAs[Long]("wq"), r.getAs[Double]("share"),
            r.getAs[Double]("boost")))).toMap
      // 4^0.75 = sqrt(4*sqrt(4)) = sqrt(8): wq = floor(2.8284271247461903 * 2^20)
      assert(rows("alpha")._1 == 4L && rows("alpha")._2 == 2965820L, rows.toString)
      assert(rows("beta")._1 == 1L && rows("beta")._2 == 1048576L)
      assert(math.abs(rows("alpha")._3 + rows("beta")._3 - 1.0) < 2e-6)
      // the 0.75 exponent flattens: frequent token boost < 1 < rare boost
      assert(rows("alpha")._4 < 1.0 && rows("beta")._4 > 1.0, rows.toString)
    } finally
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }

  test("q_energy_dist: plain-Scala O(n·m) brute force 2E|X-Y|-E|X-X'|-E|Y-Y'| " +
    "matches the ECDF-integral form for one pair, and D(X,X) = 0") {
    val sf = "/root/testdata/sf0.001"
    val docs = graft.sources.Tables.documents(spark, sf)
      .select(col("lang"), col("n_chars")).collect()
      .map(r => r.getAs[String]("lang") -> r.getAs[Long]("n_chars"))
    val langs = docs.map(_._1).distinct.sorted
    val (la, lb) = (langs(0), langs(1))
    val xs = docs.filter(_._1 == la).map(_._2.toDouble)
    val ys = docs.filter(_._1 == lb).map(_._2.toDouble)
    def meanAbs(a: Array[Double], b: Array[Double]): Double =
      a.flatMap(x => b.map(y => math.abs(x - y))).sum / (a.length.toLong * b.length)
    val brute = math.sqrt(2 * meanAbs(xs, ys) - meanAbs(xs, xs) - meanAbs(ys, ys))
    val row = operators.RobustStats.qEnergyDist(spark, sf).collect()
      .find(r => r.getAs[String]("g_a") == la && r.getAs[String]("g_b") == lb).get
    assert(math.abs(row.getAs[Double]("e_dist") - brute) < 1e-5,
      s"${row.getAs[Double]("e_dist")} vs brute $brute")
    assert(row.getAs[Long]("n_a") == xs.length.toLong)
    assert(row.getAs[Long]("n_b") == ys.length.toLong)
    // identical samples → the integral is empty → distance exactly 0
    assert(math.sqrt(2 * meanAbs(xs, xs) - 2 * meanAbs(xs, xs)) == 0.0)
  }

  test("q_quantile_reg: plain-Scala exhaustive 2-point enumeration at " +
    "tau=0.5 reproduces (slope, intercept, loss) for one event type, and " +
    "every fitted line is pinball-optimal vs the flat-median candidate") {
    val sf = "/root/testdata/sf0.001"
    val daily = graft.sources.Tables.events(spark, sf)
      .select(col("event_type"), to_date(col("ts")).as("day"),
        col("value").cast("decimal(18,6)").as("v"))
      .groupBy("event_type", "day")
      .agg(sum(col("v")).cast("decimal(18,6)").as("y"))
      .collect()
      .map(r => (r.getAs[String]("event_type"),
        r.getAs[java.sql.Date]("day").toLocalDate,
        r.getAs[java.math.BigDecimal]("y")))
    val et = daily.map(_._1).distinct.sorted.head
    val d0 = daily.filter(_._1 == et).map(_._2).min
    val pts = daily.filter(_._1 == et)
      .map(p => (java.time.temporal.ChronoUnit.DAYS.between(d0, p._2).toInt,
        BigDecimal(p._3))).sortBy(_._1)
    def pinball(tau: BigDecimal, xi: Int, yi: BigDecimal, xj: Int,
        yj: BigDecimal): BigDecimal =
      pts.map { case (x, y) =>
        val r = (y - yi) * (xj - xi) - (yj - yi) * (x - xi)
        (tau * r).max((tau - 1) * r)
      }.sum
    val tau = BigDecimal("0.50")
    val best = (for {
      (xi, yi) <- pts; (xj, yj) <- pts if xi < xj
    } yield {
      val ls = pinball(tau, xi, yi, xj, yj)
      (ls.toDouble / (xj - xi), xi, yi, xj, yj)
    }).minBy(c => (c._1, c._2, c._4))
    val row = operators.Stats.qQuantileReg(spark, sf).collect()
      .find(r => r.getAs[String]("event_type") == et &&
        r.getAs[Double]("tau") == 0.5).get
    val slope = (best._5 - best._3).toDouble / (best._4 - best._2)
    assert(math.abs(row.getAs[Double]("slope") - slope) < 1e-6, row.toString)
    assert(math.abs(row.getAs[Double]("intercept") -
      (best._3.toDouble - slope * best._2)) < 1e-5, row.toString)
    assert(math.abs(row.getAs[Double]("loss") - best._1) < 1e-5, row.toString)
    // LP-vertex sanity: every fitted line beats the flat-median line
    operators.Stats.qQuantileReg(spark, sf).collect()
      .filter(_.getAs[String]("event_type") == et).foreach { r =>
        val t = BigDecimal(r.getAs[Double]("tau"))
        val ys = pts.map(_._2).sorted
        val med = ys(((ys.length - 1) * t).toInt)
        val flat = pts.map { case (_, y) =>
          val res = y - med
          ((t * res).max((t - 1) * res)).toDouble
        }.sum
        assert(r.getAs[Double]("loss") <= flat + 1e-9,
          s"tau=$t loss=${r.getAs[Double]("loss")} flat=$flat")
      }
  }

  test("q_connected_components: plain-Scala union-find over the collected " +
    "edge set reproduces the full (part, component, size) mapping") {
    val sf = "/root/testdata/sf0.001"
    val edges = operators.Relational.qCopurchase(spark, sf).collect()
      .map(r => (r.getAs[Long]("part_a"), r.getAs[Long]("part_b")))
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expected = parent.keys.map(n => n -> find(n)).toMap
    val sizes = expected.groupBy(_._2).map { case (c, m) => c -> m.size.toLong }
    val rows = operators.Relational.qConnectedComponents(spark, sf).collect()
    assert(rows.length == expected.size, s"${rows.length} vs ${expected.size}")
    rows.foreach { r =>
      val (p, c) = (r.getAs[Long]("part"), r.getAs[Long]("component"))
      assert(expected(p) == c, s"part $p: got $c expected ${expected(p)}")
      assert(r.getAs[Long]("comp_size") == sizes(c), r.toString)
      assert(c <= p, "component id must be the minimum member id")
    }
    assert(rows.map(_.getAs[Long]("component")).distinct.length == sizes.size)
  }

  test("q_boxcox: plain-Scala profile log-likelihood recomputation at two " +
    "lambdas for one language, and best = argmax per language") {
    val sf = "/root/testdata/sf0.001"
    val rows = operators.RobustStats.qBoxCox(spark, sf).collect()
    val langs = rows.map(_.getAs[String]("lang")).distinct
    assert(rows.length == langs.length * operators.RobustStats.BoxCoxLambdas.length)
    // best is the unique argmax of ll within each language
    langs.foreach { l =>
      val g = rows.filter(_.getAs[String]("lang") == l)
      val best = g.filter(_.getAs[Boolean]("best"))
      assert(best.length == 1, s"$l: ${best.length} best rows")
      assert(best.head.getAs[Double]("ll") == g.map(_.getAs[Double]("ll")).max)
    }
    // plain-Scala LL at lambda = 0.5 and 0.0 for one language
    val lang = langs.sorted.head
    val xs = graft.sources.Tables.documents(spark, sf)
      .filter(col("lang") === lang).select("n_chars").collect()
      .map(_.getLong(0).toDouble)
    def ll(y: Array[Double], lam: Double): Double = {
      val n = y.length.toDouble
      val v = y.map(a => a * a).sum / n - math.pow(y.sum / n, 2)
      -0.5 * n * math.log(v) + (lam - 1.0) * xs.map(math.log).sum
    }
    val got = rows.filter(_.getAs[String]("lang") == lang)
      .map(r => r.getAs[Double]("lambda") -> r.getAs[Double]("ll")).toMap
    assert(math.abs(got(0.5) - ll(xs.map(x => (math.sqrt(x) - 1) / 0.5), 0.5)) < 1e-4,
      s"${got(0.5)}")
    assert(math.abs(got(0.0) - ll(xs.map(math.log), 0.0)) < 1e-4, s"${got(0.0)}")
  }

  test("q_matrix_profile: plain-Scala O(n^2 m) brute force over the dense " +
    "hourly series reproduces every (i, nn, dist) row") {
    val sf = "/root/testdata/sf0.001"
    val m = operators.Stats.MpWindow
    val hrs = graft.sources.Tables.events(spark, sf)
      .select(expr("unix_micros(date_trunc('hour', ts)) div 3600000000")
        .as("hr")).groupBy("hr").agg(count(lit(1)).as("c")).collect()
      .map(r => r.getAs[Long]("hr") -> r.getAs[Long]("c")).toMap
    val h0 = hrs.keys.min
    val n = (hrs.keys.max - h0 + 1).toInt
    val c = Array.tabulate(n)(t => hrs.getOrElse(h0 + t, 0L))
    val nw = n - m + 1
    val s = Array.tabulate(nw)(i => (i until i + m).map(c(_)).sum)
    val ss = Array.tabulate(nw)(i => (i until i + m).map(t => c(t) * c(t)).sum)
    def valid(i: Int) = m * ss(i) - s(i) * s(i) > 0
    def d2(i: Int, j: Int): Double = {
      val qt = (0 until m).map(k => c(i + k) * c(j + k)).sum
      2.0 * m * (1.0 - (m * qt - s(i) * s(j)).toDouble /
        math.sqrt(((m * ss(i) - s(i) * s(i)) * (m * ss(j) - s(j) * s(j))).toDouble))
    }
    val expected = (0 until nw).filter(valid).flatMap { i =>
      val js = (0 until nw).filter(j => math.abs(i - j) >=
        operators.Stats.MpExclusion && valid(j))
      if (js.isEmpty) None else {
        val best = js.minBy(j => (d2(i, j), j))
        Some(i -> ((best, BigDecimal(math.sqrt(math.max(d2(i, best), 0.0)))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)))
      }
    }.toMap
    val rows = operators.Stats.qMatrixProfile(spark, sf).collect()
    assert(rows.length == expected.size, s"${rows.length} vs ${expected.size}")
    rows.foreach { r =>
      val i = r.getAs[Int]("i")
      val (nn, dist) = expected(i)
      assert(r.getAs[Int]("nn") == nn, s"i=$i: ${r.getAs[Int]("nn")} vs $nn")
      assert(math.abs(r.getAs[Double]("dist") - dist) <= 1e-6, s"i=$i")
    }
  }

  test("q_herfindahl: shares recomputed in plain Scala for one brand, " +
    "HHI identities (1/n <= hhi <= 1, eff_n <= n_sup, top_share^2 <= hhi)") {
    val sf = "/root/testdata/sf0.001"
    val rows = operators.Stats.qHerfindahl(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, hhi) = (r.getAs[Long]("n_sup"), r.getAs[Double]("hhi"))
      assert(hhi >= 1.0 / n - 1e-9 && hhi <= 1.0 + 1e-9, r.toString)
      assert(r.getAs[Double]("eff_n") <= n + 1e-6, r.toString)
      val ts = r.getAs[Double]("top_share")
      assert(ts * ts <= hhi + 1e-9 && ts <= 1.0 + 1e-9, r.toString)
      if (n > 1) {
        val norm = r.getAs[Double]("hhi_norm")
        assert(norm >= -1e-9 && norm <= 1.0 + 1e-9, r.toString)
      } else assert(r.isNullAt(r.fieldIndex("hhi_norm")))
    }
    // plain-Scala share recomputation for the lexicographically first brand
    val li = graft.sources.Tables.lineitem(spark, sf)
      .join(graft.sources.Tables.part(spark, sf),
        col("l_partkey") === col("p_partkey"))
      .select(col("p_brand"), col("l_suppkey"),
        col("l_extendedprice").cast("decimal(18,2)").as("p")).collect()
    val brand = li.map(_.getAs[String]("p_brand")).min
    val bySupp = li.filter(_.getAs[String]("p_brand") == brand)
      .groupBy(_.getAs[Long]("l_suppkey"))
      .map { case (_, g) => g.map(r =>
        BigDecimal(r.getAs[java.math.BigDecimal]("p"))).sum }
    val tot = bySupp.sum
    val hhiExp = bySupp.map(v => math.pow((v / tot).toDouble, 2)).sum
    val got = rows.find(_.getAs[String]("brand") == brand).get
    assert(math.abs(got.getAs[Double]("hhi") - hhiExp) < 1e-6,
      s"${got.getAs[Double]("hhi")} vs $hhiExp")
    assert(got.getAs[Long]("n_sup") == bySupp.size.toLong)
  }

  test("q_dtw: plain-Scala row-by-row DP over BigDecimal reproduces every " +
    "pair's distance, and DTW <= L1 of the aligned prefix (identity path)") {
    val sf = "/root/testdata/sf0.001"
    val daily = graft.sources.Tables.events(spark, sf)
      .select(col("event_type"), date_format(col("ts"), "yyyy-MM-dd").as("day"),
        col("value").cast("decimal(18,6)").as("v"))
      .groupBy("event_type", "day")
      .agg(sum(col("v")).cast("decimal(18,6)").as("y")).collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[String]("day"),
        BigDecimal(r.getAs[java.math.BigDecimal]("y"))))
    val series = daily.groupBy(_._1).map { case (t, g) =>
      t -> g.sortBy(_._2).map(_._3) }
    def dtw(a: Seq[BigDecimal], b: Seq[BigDecimal]): BigDecimal = {
      val big = BigDecimal("1e30")
      var prev = Array.fill(b.length)(big)
      a.indices.foreach { i =>
        val cur = Array.fill(b.length)(big)
        b.indices.foreach { j =>
          val cost = (a(i) - b(j)).abs
          val best =
            if (i == 0 && j == 0) BigDecimal(0)
            else Seq(if (i > 0) prev(j) else big,
              if (j > 0) cur(j - 1) else big,
              if (i > 0 && j > 0) prev(j - 1) else big).min
          cur(j) = cost + best
        }
        prev = cur
      }
      prev.last
    }
    val rows = operators.Stats.qDtw(spark, sf).collect()
    val types = series.keys.toSeq.sorted
    assert(rows.length == types.combinations(2).length)
    rows.foreach { r =>
      val (ta, tb) = (r.getAs[String]("type_a"), r.getAs[String]("type_b"))
      val exp = dtw(series(ta), series(tb))
      assert(math.abs(r.getAs[Double]("dtw") - exp.toDouble) < 1e-4,
        s"$ta/$tb: ${r.getAs[Double]("dtw")} vs $exp")
      // DTW can never exceed the L1 cost of the identity alignment
      val (sa, sb) = (series(ta), series(tb))
      val ident = sa.zip(sb).map { case (x, y) => (x - y).abs }.sum +
        (if (sa.length > sb.length) sa.drop(sb.length).map(x => (x - sb.last).abs).sum
         else sb.drop(sa.length).map(x => (x - sa.last).abs).sum)
      assert(r.getAs[Double]("dtw") <= ident.toDouble + 1e-6)
      assert(math.abs(r.getAs[Double]("dtw_norm") -
        r.getAs[Double]("dtw") / (r.getAs[Int]("n") + r.getAs[Int]("m"))) < 1e-5)
    }
  }

  test("q_pacf: plain-Scala Durbin-Levinson over the gated ACF values " +
    "reproduces every lag, and pacf(1) == acf(1)") {
    val sf = "/root/testdata/sf0.001"
    val acf = operators.Stats.qAcf(spark, sf).collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Int]("lag")) ->
        r.getAs[Double]("acf")).toMap
    val rows = operators.Stats.qPacf(spark, sf).collect()
    val types = rows.map(_.getAs[String]("event_type")).distinct
    types.foreach { t =>
      // rho re-derived from the rounded ACF panel is only 6-dp accurate;
      // re-derive it exactly the way the operator does
      val rho = (1 to operators.Stats.AcfMaxLag)
        .map(k => acf((t, k))).toArray
      var phi = Array(rho(0))
      var v = 1.0 - rho(0) * rho(0)
      val diag = scala.collection.mutable.ArrayBuffer(rho(0))
      (2 to operators.Stats.AcfMaxLag).foreach { m =>
        val s1 = (1 until m).map(j => phi(j - 1) * rho(m - j - 1)).sum
        val k = (rho(m - 1) - s1) / v
        phi = (1 until m).map(j => phi(j - 1) - k * phi(m - j - 1)).toArray :+ k
        v = v * (1.0 - k * k)
        diag += k
      }
      val got = rows.filter(_.getAs[String]("event_type") == t)
        .map(r => r.getAs[Int]("lag") -> r.getAs[Double]("pacf")).toMap
      assert(got.size == operators.Stats.AcfMaxLag)
      // rounded-input drift stays tiny because |rho| < 1 and v is O(1)
      (1 to operators.Stats.AcfMaxLag).foreach { m =>
        assert(math.abs(got(m) - diag(m - 1)) < 1e-3, s"$t lag $m")
      }
      assert(math.abs(got(1) - acf((t, 1))) < 1e-6, s"$t: pacf1 != acf1")
    }
  }

  test("q_isotonic_curve: plain-Scala PAV reproduces every fitted rate, the fit " +
    "is monotone non-decreasing in bin, and pooled flags match block width") {
    val sf = "/root/testdata/sf0.001"
    val bins = operators.TextScoring.qCalibration(spark, sf).collect()
      .map(r => (r.getAs[Int]("bin"), r.getAs[Long]("n"),
        r.getAs[Long]("n_pass"))).sortBy(_._1)
    // reference PAV over (n_pass, n) blocks
    val st = scala.collection.mutable.ArrayBuffer[(Int, Int, Long, Long)]()
    bins.foreach { case (b, n, np) =>
      st += ((b, b, np, n))
      while (st.length >= 2 &&
        st(st.length - 2)._3 * st.last._4 > st.last._3 * st(st.length - 2)._4) {
        val t = st.remove(st.length - 1); val p = st.remove(st.length - 1)
        st += ((p._1, t._2, p._3 + t._3, p._4 + t._4))
      }
    }
    val expected = st.flatMap { case (lo, hi, s2, c2) =>
      (lo to hi).filter(b => bins.exists(_._1 == b))
        .map(b => b -> ((s2.toDouble / c2, hi > lo))) }.toMap
    val rows = operators.TextScoring.qIsotonicCurve(spark, sf).collect()
    assert(rows.length == bins.length)
    val byBin = rows.map(r => r.getAs[Int]("bin") -> r).toMap
    expected.foreach { case (b, (rate, pooled)) =>
      assert(math.abs(byBin(b).getAs[Double]("iso_rate") - rate) < 1e-6,
        s"bin $b")
      assert(byBin(b).getAs[Boolean]("pooled") == pooled, s"bin $b pooled")
    }
    val sorted = rows.sortBy(_.getAs[Int]("bin")).map(_.getAs[Double]("iso_rate"))
    sorted.sliding(2).foreach { w =>
      if (w.length == 2) assert(w(0) <= w(1) + 1e-9, "fit must be monotone")
    }
  }

  test("q_sinkhorn: plan feasibility re-checked in plain Scala from the " +
    "emitted cells, and the audit's gated booleans are all true") {
    val sf = "/root/testdata/sf0.001"
    val cells = operators.RobustStats.qSinkhorn(spark, sf).collect()
      .map(r => (r.getAs[Int]("bucket_a"), r.getAs[Int]("bucket_b"),
        r.getAs[Double]("mass")))
    assert(cells.length == 100)
    assert(cells.forall(_._3 >= 0.0))
    // mass sums to 1 (up to the 1e-9 output rounding x 100 cells)
    assert(math.abs(cells.map(_._3).sum - 1.0) < 1e-6)
    // marginals are valid add-1-smoothed histograms: every row/col > 0
    val rowSum = cells.groupBy(_._1).map { case (_, g) => g.map(_._3).sum }
    val colSum = cells.groupBy(_._2).map { case (_, g) => g.map(_._3).sum }
    assert(rowSum.size == 10 && colSum.size == 10)
    assert(rowSum.forall(_ > 0.0) && colSum.forall(_ > 0.0))
    val audit = operators.RobustStats.qSinkhornAudit(spark, sf).collect()
    assert(audit.length == 1)
    val a = audit.head
    Seq("row_marginals_ok", "col_marginals_ok", "mass_ok", "cost_sandwich_ok")
      .foreach(cn => assert(a.getAs[Boolean](cn), cn))
    assert(a.getAs[Long]("n_treat") + a.getAs[Long]("n_control") ==
      graft.sources.Tables.events(spark, sf).count())
  }

  test("q_viterbi: plain-Scala Viterbi replay decodes the identical path " +
    "for every type, and the MAP path log-prob beats the all-normal path") {
    val sf = "/root/testdata/sf0.001"
    val lnPi = operators.Stats.HmmPi.map(math.log)
    val lnT = operators.Stats.HmmTrans.map(_.map(math.log))
    val lnE = operators.Stats.HmmEmit.map(_.map(math.log))
    val rows = operators.Stats.qViterbi(spark, sf).collect()
    val byType = rows.groupBy(_.getAs[String]("event_type"))
    byType.foreach { case (t, g) =>
      val seq = g.sortBy(_.getAs[String]("day"))
      val obs = seq.map(_.getAs[Int]("obs"))
      val got = seq.map(_.getAs[Int]("regime"))
      // reference forward DP + backpointer Viterbi
      var dp = Array.tabulate(3)(s => lnPi(s) + lnE(s)(obs(0)))
      val bp = Array.ofDim[Int](obs.length, 3)
      (1 until obs.length).foreach { i =>
        val nd = Array.tabulate(3) { s =>
          val cands = Array.tabulate(3)(p => dp(p) + lnT(p)(s))
          val best = cands.indices.minBy(p => (-cands(p), p))
          bp(i)(s) = best
          lnE(s)(obs(i)) + cands(best)
        }
        dp = nd
      }
      var cur = (0 to 2).minBy(s => (-dp(s), s))
      val path = Array.fill(obs.length)(0)
      path(obs.length - 1) = cur
      ((obs.length - 1) to 1 by -1).foreach { i =>
        cur = bp(i)(cur); path(i - 1) = cur
      }
      assert(got.toSeq == path.toSeq, s"$t: $${got.toSeq} vs $${path.toSeq}")
      // MAP optimality spot check vs the constant 'normal' path
      def lp(states: Seq[Int]): Double =
        lnPi(states.head) + lnE(states.head)(obs(0)) +
          (1 until obs.length).map(i =>
            lnT(states(i - 1))(states(i)) + lnE(states(i))(obs(i))).sum
      assert(lp(got.toSeq) >= lp(Seq.fill(obs.length)(1)) - 1e-9, t)
    }
  }

  test("q_binseg: plain-Scala binary segmentation over BigDecimal daily " +
    "sums reproduces all three levels, and level 1 agrees with " +
    "q_changepoint") {
    val sf = "/root/testdata/sf0.001"
    val daily = graft.sources.Tables.events(spark, sf)
      .select(col("event_type"), date_format(col("ts"), "yyyy-MM-dd").as("day"),
        col("value").cast("decimal(18,6)").as("v"))
      .groupBy("event_type", "day")
      .agg(sum(col("v")).as("tot")).collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[String]("day"),
        BigDecimal(r.getAs[java.math.BigDecimal]("tot"))))
    val rows = operators.Stats.qBinseg(spark, sf).collect()
    val cp = operators.Stats.qChangepoint(spark, sf).collect()
      .map(r => r.getAs[String]("event_type") -> r.getAs[String]("cp_day"))
      .toMap
    daily.groupBy(_._1).foreach { case (et, g) =>
      val ys = g.sortBy(_._2).map(x => (x._2, x._3))
      def split(a: Int, b: Int): Option[(Int, BigDecimal)] = {
        // 1-based inclusive [a, b]; returns (t, stat) maximizing the
        // segment-local scaled CUSUM, earliest t on ties (min-seg
        // filtering is the caller's job, matching the operator)
        val cl = if (a == 1) BigDecimal(0) else ys.take(a - 1).map(_._2).sum
        val sseg = ys.take(b).map(_._2).sum - cl
        val len = b - a + 1
        val cands = (a until b).map { t =>
          val cs = ys.take(t).map(_._2).sum
          t -> ((cs - cl) * len - sseg * (t - a + 1)).abs
        }
        if (cands.isEmpty) None
        else Some(cands.minBy { case (t, st) => (-st, t) })
      }
      val n = ys.length
      val Some((cp1, ms1)) = split(1, n)
      val got = rows.filter(_.getAs[String]("event_type") == et)
        .map(r => r.getAs[String]("level") ->
          ((r.getAs[String]("cp_day"), r.getAs[Long]("seg_len"),
            r.getAs[Double]("cp_stat")))).toMap
      assert(got("1")._1 == ys(cp1 - 1)._1, s"$et level1 day")
      assert(got("1")._1 == cp(et), s"$et level1 must agree with q_changepoint")
      assert(math.abs(got("1")._3 - (ms1 / (n.toLong * n)).toDouble) < 1e-5)
      Seq(("2L", 1, cp1), ("2R", cp1 + 1, n)).foreach { case (lvl, a, b) =>
        if (b - a + 1 >= operators.Stats.BinsegMinSeg) {
          val Some((t2, ms2)) = split(a, b)
          val len = (b - a + 1).toLong
          assert(got.contains(lvl), s"$et $lvl missing")
          assert(got(lvl)._1 == ys(t2 - 1)._1, s"$et $lvl day")
          assert(got(lvl)._2 == len, s"$et $lvl len")
          assert(math.abs(got(lvl)._3 - (ms2 / (len * len)).toDouble) < 1e-5)
        } else assert(!got.contains(lvl), s"$et $lvl should be skipped")
      }
    }
  }

  test("q_rbo: plain-Scala set-intersection replay reproduces the overlap " +
    "curve and cumulative RBO, and RBO identities hold") {
    val sf = "/root/testdata/sf0.001"
    val rows = operators.SimilaritySearch.qRbo(spark, sf).collect()
      .sortBy(_.getAs[Int]("d"))
    assert(rows.length == operators.SimilaritySearch.RboK)
    // rebuild the two rankings in plain Scala
    val li = graft.sources.Tables.lineitem(spark, sf)
      .join(graft.sources.Tables.orders(spark, sf),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("l_partkey"), col("o_orderdate").cast("date").as("od"),
        col("l_extendedprice").cast("decimal(18,2)").as("p")).collect()
      .map(r => (r.getAs[Long]("l_partkey"), r.getAs[java.sql.Date]("od"),
        BigDecimal(r.getAs[java.math.BigDecimal]("p"))))
    val days = li.map(_._2.toLocalDate)
    val d0 = days.min
    val half = (java.time.temporal.ChronoUnit.DAYS.between(d0, days.max) / 2)
      .toInt
    def top(first: Boolean): Map[Long, Int] = li
      .filter(x => (java.time.temporal.ChronoUnit.DAYS
        .between(d0, x._2.toLocalDate) <= half) == first)
      .groupBy(_._1).map { case (p2, g) => p2 -> g.map(_._3).sum }.toSeq
      .sortBy { case (p2, rev) => (-rev, p2) }
      .take(operators.SimilaritySearch.RboK)
      .zipWithIndex.map { case ((p2, _), i) => p2 -> (i + 1) }.toMap
    val (ta, tb) = (top(true), top(false))
    var cum = 0.0
    rows.foreach { r =>
      val d = r.getAs[Int]("d")
      val ov = ta.keySet.filter(p2 => ta(p2) <= d && tb.getOrElse(p2, 99) <= d)
      assert(r.getAs[Long]("overlap") == ov.size.toLong, s"d=$d")
      assert(r.getAs[Long]("overlap") <= d, "overlap can never exceed depth")
      cum += (ov.size.toDouble / d) *
        operators.SimilaritySearch.RboWeights(d - 1)
      assert(math.abs(r.getAs[Double]("rbo") -
        cum * (1 - operators.SimilaritySearch.RboP)) < 1e-5, s"d=$d rbo")
      assert(r.getAs[Double]("rbo") >= 0 && r.getAs[Double]("rbo") <= 1 + 1e-9)
    }
    // rbo is non-decreasing in depth
    rows.map(_.getAs[Double]("rbo")).sliding(2).foreach {
      case Array(x, y) => assert(x <= y + 1e-9); case _ => ()
    }
  }

  test("q_lof: plain-Scala LOF replay reproduces every panel row, scores " +
    "are positive, and the bulk of a homogeneous panel sits near 1") {
    val sf = "/root/testdata/sf0.001"
    val k = operators.SimilaritySearch.LofK
    val vecs = graft.sources.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        r.getSeq[Float](1).map(_.toDouble).toArray)
      .sortBy(_._1).take(operators.SimilaritySearch.LofN)
    val ids = vecs.map(_._1)
    val byId = vecs.toMap
    def d(a: Long, b: Long): Double = {
      val (x, y) = (byId(a), byId(b))
      math.sqrt(math.max(
        x.map(v => v * v).sum + y.map(v => v * v).sum -
          2.0 * x.zip(y).map { case (p, q) => p * q }.sum, 0.0))
    }
    val knn = ids.map(i => i -> ids.filter(_ != i)
      .sortBy(j => (d(i, j), j)).take(k)).toMap
    val kdist = ids.map(i => i -> knn(i).map(d(i, _)).max).toMap
    val lrd = ids.map(i => i -> k /
      knn(i).map(j => math.max(kdist(j), d(i, j))).sum).toMap
    val lof = ids.map(i => i -> knn(i).map(lrd).sum / (k * lrd(i))).toMap
    val rows = operators.SimilaritySearch.qLof(spark, sf).collect()
    assert(rows.length == ids.length)
    rows.foreach { r =>
      val i = r.getAs[Long]("vec_id")
      assert(math.abs(r.getAs[Double]("kdist") - kdist(i)) < 1e-5, s"kdist $i")
      assert(math.abs(r.getAs[Double]("lrd") - lrd(i)) < 1e-5, s"lrd $i")
      assert(math.abs(r.getAs[Double]("lof") - lof(i)) < 1e-4, s"lof $i")
      assert(r.getAs[Double]("lof") > 0)
    }
    // random-ish embeddings are homogeneous: most LOF mass near 1
    val med = rows.map(_.getAs[Double]("lof")).sorted.apply(rows.length / 2)
    assert(med > 0.8 && med < 1.3, s"median LOF $med")
  }

  test("q_l_moments: plain-Scala PWM recomputation for one type, " +
    "lambda2 > 0, and |l_skew|, l_kurt bounds hold") {
    val sf = "/root/testdata/sf0.001"
    val rows = operators.RobustStats.qLMoments(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Double]("l2") > 0, "L-scale must be positive")
      assert(math.abs(r.getAs[Double]("l_skew")) <= 1 + 1e-9)
      // tau4 >= (5*tau3^2 - 1) / 4, and tau4 < 1 (Hosking's bounds)
      val t3 = r.getAs[Double]("l_skew"); val t4 = r.getAs[Double]("l_kurt")
      assert(t4 < 1 + 1e-9 && t4 >= (5 * t3 * t3 - 1) / 4 - 1e-6, r.toString)
    }
    val et = rows.map(_.getAs[String]("event_type")).min
    val xs = graft.sources.Tables.events(spark, sf)
      .filter(col("event_type") === et)
      .groupBy("user_id")
      .agg(sum(col("value").cast("decimal(18,6)")).as("x")).collect()
      .map(r => (r.getAs[Long]("user_id"),
        BigDecimal(r.getAs[java.math.BigDecimal]("x"))))
      .sortBy(x => (x._2, x._1)).map(_._2.toDouble)
    val n = xs.length.toDouble
    def b(r2: Int): Double =
      xs.zipWithIndex.map { case (x, i0) =>
        val i = i0 + 1
        (1 to r2).map(k => (i - k).toDouble).product * x
      }.sum / (1 to r2).map(k => n - k).foldLeft(n)(_ * _)
    val (b0, b1, b2, b3) = (b(0), b(1), b(2), b(3))
    val got = rows.find(_.getAs[String]("event_type") == et).get
    assert(math.abs(got.getAs[Double]("l1") - b0) < 1e-4)
    assert(math.abs(got.getAs[Double]("l2") - (2 * b1 - b0)) < 1e-4)
    assert(math.abs(got.getAs[Double]("l3") - (6 * b2 - 6 * b1 + b0)) < 1e-4)
    assert(math.abs(got.getAs[Double]("l4") -
      (20 * b3 - 30 * b2 + 12 * b1 - b0)) < 1e-4)
  }

  test("q_iv_wald: plain-Scala recomputation of ITT/first-stage/LATE, " +
    "and the Wald identity late = itt / first_stage holds") {
    val sf = "/root/testdata/sf0.001"
    val r = operators.Stats.qIvWald(spark, sf).collect()
    assert(r.length == 1)
    val row = r.head
    val users = graft.sources.Tables.events(spark, sf)
      .groupBy("user_id")
      .agg(sum(col("value").cast("decimal(18,6)")).as("y"),
        max(when(col("event_type") === "purchase" &&
          col("value") > operators.Stats.TwoPropValueCut, 1L).otherwise(0L))
          .as("x")).collect()
      .map { rr =>
        val z = Integer.parseInt(java.security.MessageDigest.getInstance("MD5")
          .digest(rr.getLong(0).toString.getBytes("UTF-8"))
          .take(1).map("%02x".format(_)).mkString.take(1), 16) < 8
        (z, BigDecimal(rr.getAs[java.math.BigDecimal]("y")), rr.getAs[Long]("x"))
      }
    def arm(z: Boolean) = users.filter(_._1 == z)
    val itt = (arm(true).map(_._2).sum / arm(true).length).toDouble -
      (arm(false).map(_._2).sum / arm(false).length).toDouble
    val fs = arm(true).map(_._3).sum.toDouble / arm(true).length -
      arm(false).map(_._3).sum.toDouble / arm(false).length
    assert(row.getAs[Long]("n1") == arm(true).length.toLong)
    assert(math.abs(row.getAs[Double]("itt") - itt) < 1e-4)
    assert(math.abs(row.getAs[Double]("first_stage") - fs) < 1e-6)
    assert(math.abs(row.getAs[Double]("late") - itt / fs) < 1e-2,
      s"${row.getAs[Double]("late")} vs ${itt / fs}")
    assert(row.getAs[Double]("compl_treat") >= 0 &&
      row.getAs[Double]("compl_treat") <= 1)
  }

  test("q_aa_test: 120 pair rows, Welch z recomputed in plain Scala for " +
    "one pair, and the null false-positive rate stays plausible") {
    val sf = "/root/testdata/sf0.001"
    val rows = operators.Stats.qAaTest(spark, sf).collect()
    // arms with a single user are excluded (no variance estimate), so at
    // tiny scales the panel is smaller than the full 120 pairs
    assert(rows.nonEmpty && rows.length <= 16 * 15 / 2)
    assert(rows.forall(r => r.getAs[Long]("n_a") >= 2 &&
      r.getAs[Long]("n_b") >= 2))
    val fpRate = rows.count(_.getAs[Boolean]("false_positive")).toDouble /
      rows.length
    // under the null with correlated pairs, allow a wide band around 5%
    assert(fpRate <= 0.25, s"A/A false-positive rate $fpRate")
    rows.foreach { r =>
      assert(r.getAs[Boolean]("false_positive") ==
        (math.abs(r.getAs[Double]("z")) > operators.Stats.AaZCrit) ||
        math.abs(math.abs(r.getAs[Double]("z")) - operators.Stats.AaZCrit) < 1e-6)
    }
    // plain-Scala Welch z for the (0, 1) pair
    val users = graft.sources.Tables.events(spark, sf)
      .groupBy("user_id")
      .agg(sum(col("value").cast("decimal(18,6)")).as("y")).collect()
      .map { rr =>
        val arm = Integer.parseInt(java.security.MessageDigest
          .getInstance("MD5")
          .digest(rr.getLong(0).toString.getBytes("UTF-8"))
          .take(1).map("%02x".format(_)).mkString.substring(1, 2), 16)
        arm -> BigDecimal(rr.getAs[java.math.BigDecimal]("y"))
      }
    def st(a: Int) = {
      val ys = users.filter(_._1 == a).map(_._2.toDouble)
      val n = ys.length.toDouble
      val m = ys.sum / n
      (n, m, ys.map(v => (v - m) * (v - m)).sum / (n - 1) / n)
    }
    val pair = rows.find(r => r.getAs[Int]("arm_a") == 0 &&
      r.getAs[Int]("arm_b") == 1)
    if (pair.isDefined && st(0)._1 > 1 && st(1)._1 > 1) {
      val ((_, m0, v0), (_, m1, v1)) = (st(0), st(1))
      val zExp = (m0 - m1) / math.sqrt(v0 + v1)
      assert(math.abs(pair.get.getAs[Double]("z") - zExp) < 1e-4,
        s"${pair.get.getAs[Double]("z")} vs $zExp")
    }
  }

  test("q_simpson_flip: plain-Scala channel assignment and rate gaps " +
    "reproduce every row, and the flip flag obeys its sign definition") {
    val sf = "/root/testdata/sf0.001"
    val ev = graft.sources.Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"),
        col("value")).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("event_id"),
        r.getAs[java.sql.Timestamp]("ts"), r.getAs[String]("event_type"),
        r.getAs[Double]("value")))
    def arm(u: Long): Boolean =
      Integer.parseInt(java.security.MessageDigest.getInstance("MD5")
        .digest(u.toString.getBytes("UTF-8"))
        .take(1).map("%02x".format(_)).mkString.take(1), 16) < 8
    val perUser = ev.groupBy(_._1).map { case (u, g) =>
      val first = g.minBy(x => (x._3.getTime, x._3.getNanos, x._2))
      val conv = g.exists(x => x._4 == "purchase" &&
        x._5 > operators.Stats.TwoPropValueCut)
      (u, first._4, conv, arm(u))
    }.toSeq
    val byCh = perUser.groupBy(_._2)
    def rate(g: Seq[(Long, String, Boolean, Boolean)], t: Boolean) = {
      val a = g.filter(_._4 == t)
      if (a.isEmpty) None else Some(a.count(_._3).toDouble / a.length)
    }
    val gAll = rate(perUser, true).get - rate(perUser, false).get
    val rows = operators.Stats.qSimpsonFlip(spark, sf).collect()
    assert(rows.length == byCh.size)
    rows.foreach { r =>
      val g = byCh(r.getAs[String]("channel"))
      assert(r.getAs[Long]("n_t") == g.count(_._4).toLong)
      assert(math.abs(r.getAs[Double]("gap_overall") - gAll) < 1e-5)
      (rate(g, true), rate(g, false)) match {
        case (Some(rt), Some(rc)) =>
          val gap = rt - rc
          assert(math.abs(r.getAs[Double]("gap_channel") - gap) < 1e-5)
          assert(r.getAs[Boolean]("simpson_flip") ==
            ((gap > 0 && gAll < 0) || (gap < 0 && gAll > 0)), r.toString)
        case _ =>
          assert(r.isNullAt(r.fieldIndex("gap_channel")), r.toString)
      }
    }
  }

  test("q_cmh: plain-Scala MH odds ratio and chi2 from the 2x2 strata, " +
    "consistent with q_simpson_flip's channel substrate") {
    val sf = "/root/testdata/sf0.001"
    val r = operators.Stats.qCmh(spark, sf).collect()
    assert(r.length == 1)
    val row = r.head
    // rebuild the strata from q_simpson_flip's per-channel counts plus
    // the conversion splits recomputed here
    val flips = operators.Stats.qSimpsonFlip(spark, sf).collect()
    val nUsers = flips.map(x => x.getAs[Long]("n_t") + x.getAs[Long]("n_c")).sum
    // plain-Scala strata via the same first-event/conv/arm definitions
    val ev = graft.sources.Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"),
        col("value")).collect()
      .map(x => (x.getAs[Long]("user_id"), x.getAs[Long]("event_id"),
        x.getAs[java.sql.Timestamp]("ts"), x.getAs[String]("event_type"),
        x.getAs[Double]("value")))
    def arm(u: Long): Boolean =
      Integer.parseInt(java.security.MessageDigest.getInstance("MD5")
        .digest(u.toString.getBytes("UTF-8"))
        .take(1).map("%02x".format(_)).mkString.take(1), 16) < 8
    val strata = ev.groupBy(_._1).map { case (u, g) =>
      val ch = g.minBy(x => (x._3.getTime, x._3.getNanos, x._2))._4
      val conv = g.exists(x => x._4 == "purchase" &&
        x._5 > operators.Stats.TwoPropValueCut)
      (ch, conv, arm(u))
    }.toSeq.groupBy(_._1).map { case (ch, g) =>
      (ch, g.count(x => x._3 && x._2).toLong,
        g.count(x => !x._3 && x._2).toLong,
        g.count(x => x._3 && !x._2).toLong,
        g.count(x => !x._3 && !x._2).toLong)
    }.filter(s2 => s2._2 + s2._3 + s2._4 + s2._5 >= 2).toSeq.sortBy(_._1)
    assert(row.getAs[Long]("k_strata") == strata.length.toLong)
    assert(row.getAs[Long]("sum_a") == strata.map(_._2).sum)
    assert(strata.map(s2 => s2._2 + s2._3 + s2._4 + s2._5).sum == nUsers)
    def n(s2: (String, Long, Long, Long, Long)) = s2._2 + s2._3 + s2._4 + s2._5
    val num2 = strata.map(s2 => s2._2.toDouble * s2._5 / n(s2)).sum
    val den2 = strata.map(s2 => s2._3.toDouble * s2._4 / n(s2)).sum
    if (den2 == 0)
      assert(row.isNullAt(row.fieldIndex("or_cmh")), "OR must be NULL")
    else
      assert(math.abs(row.getAs[Double]("or_cmh") - num2 / den2) < 1e-4,
        s"${row.getAs[Double]("or_cmh")} vs ${num2 / den2}")
    val se = strata.map(s2 =>
      (s2._2 + s2._3).toDouble * (s2._2 + s2._4) / n(s2)).sum
    val sv = strata.map { s2 =>
      val nn = n(s2).toDouble
      (s2._2 + s2._3).toDouble * (s2._4 + s2._5) * (s2._2 + s2._4) *
        (s2._3 + s2._5) / (nn * nn * (nn - 1.0))
    }.sum
    val chi2 = math.pow(strata.map(_._2).sum - se, 2) / sv
    assert(math.abs(row.getAs[Double]("chi2") - chi2) < 1e-4,
      s"${row.getAs[Double]("chi2")} vs $chi2")
    assert(row.getAs[Boolean]("significant") == (chi2 > 3.841459))
  }

  test("q_weighted_logrank: plain-Scala recomputation of all three tests " +
    "from the q_logrank risk table, and the w=1 member is the log-rank") {
    val sf = "/root/testdata/sf0.001"
    val rt = operators.Stats.qLogrank(spark, sf).collect()
      .map(r => (r.getAs[Int]("t"), r.getAs[Long]("n1t"),
        r.getAs[Long]("n2t"), r.getAs[Long]("d1"), r.getAs[Long]("d2")))
      .sortBy(_._1)
    def test(wf: Double => Double): (Double, Double) = {
      var su = 0.0; var sv = 0.0
      rt.foreach { case (_, n1, n2, dd1, dd2) =>
        val nt = (n1 + n2).toDouble; val dt = (dd1 + dd2).toDouble
        val w = wf(nt)
        su += w * (dd1.toDouble - dt * n1 / nt)
        sv += w * w * (dt * (n1.toDouble / nt) * (n2.toDouble / nt) *
          ((nt - dt) / (nt - 1.0)))
      }
      (su / math.sqrt(sv), su * su / sv)
    }
    val exp = Map("logrank" -> test(_ => 1.0), "gehan" -> test(n => n),
      "tarone_ware" -> test(math.sqrt))
    val rows = operators.Stats.qWeightedLogrank(spark, sf).collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      val (z, chi2) = exp(r.getAs[String]("test"))
      assert(math.abs(r.getAs[Double]("z") - z) < 1e-4, r.toString)
      assert(math.abs(r.getAs[Double]("chi2") - chi2) < 1e-4, r.toString)
      assert(r.getAs[Boolean]("significant") == (math.abs(z) > 1.959964))
    }
  }

  test("q_meta_fixed: plain-Scala inverse-variance pooling reproduces the " +
    "pooled effect, SE, Q and I2, and the one-pass Q identity holds") {
    val sf = "/root/testdata/sf0.001"
    val r = operators.Stats.qMetaFixed(spark, sf).collect()
    assert(r.length == 1)
    val row = r.head
    // rebuild strata effects from q_simpson_flip's substrate recomputation
    val flips = operators.Stats.qSimpsonFlip(spark, sf).collect()
    // channel rates need the conversion splits; recompute via q_cmh's path
    val ev = graft.sources.Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"),
        col("value")).collect()
      .map(x => (x.getAs[Long]("user_id"), x.getAs[Long]("event_id"),
        x.getAs[java.sql.Timestamp]("ts"), x.getAs[String]("event_type"),
        x.getAs[Double]("value")))
    def arm(u: Long): Boolean =
      Integer.parseInt(java.security.MessageDigest.getInstance("MD5")
        .digest(u.toString.getBytes("UTF-8"))
        .take(1).map("%02x".format(_)).mkString.take(1), 16) < 8
    val strata = ev.groupBy(_._1).map { case (u, g) =>
      val chn = g.minBy(x => (x._3.getTime, x._3.getNanos, x._2))._4
      val conv = g.exists(x => x._4 == "purchase" &&
        x._5 > operators.Stats.TwoPropValueCut)
      (chn, conv, arm(u))
    }.toSeq.groupBy(_._1).toSeq.sortBy(_._1).flatMap { case (_, g) =>
      val (t, c) = g.partition(_._3)
      if (t.isEmpty || c.isEmpty) None
      else {
        val ptv = t.count(_._2).toDouble / t.length
        val pcv = c.count(_._2).toDouble / c.length
        val vv = ptv * (1 - ptv) / t.length + pcv * (1 - pcv) / c.length
        if (vv > 0) Some((ptv - pcv, vv)) else None
      }
    }
    assert(row.getAs[Long]("k") == strata.length.toLong)
    val sw = strata.map(1.0 / _._2).sum
    val swt = strata.map(s2 => s2._1 / s2._2).sum
    val swt2 = strata.map(s2 => s2._1 * s2._1 / s2._2).sum
    assert(math.abs(row.getAs[Double]("theta_fixed") - swt / sw) < 1e-4)
    assert(math.abs(row.getAs[Double]("se") - math.sqrt(1.0 / sw)) < 1e-5)
    val q = swt2 - swt * swt / sw
    assert(math.abs(row.getAs[Double]("q_het") - q) < 1e-4)
    // one-pass identity vs the textbook two-pass Q
    val q2 = strata.map { case (th, vv) =>
      (th - swt / sw) * (th - swt / sw) / vv }.sum
    assert(math.abs(q - q2) < 1e-9, "one-pass Q identity")
    val i2 = if (q > 0) math.max((q - (strata.length - 1)) / q, 0.0) else 0.0
    assert(math.abs(row.getAs[Double]("i2") - i2) < 1e-4)
    assert(flips.nonEmpty) // the substrate both queries share is non-trivial
  }

  test("q_tdigest plan: both aggregation levels are ObjectHashAggregate " +
    "partial+final (the shuffle carries sketch buffers, not raw values)") {
    val plan = operators.ScaleOps.qTdigest(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), plan.take(2000))
    assert(!plan.contains("Expand"), "no Expand belongs in this plan")
  }
}
