package graft

import graft.operators._
import org.apache.spark.sql.functions._

/** Round-3 operators: LSH-bucketed embedding dedup, end-to-end polysemy
  * evaluation (JW-matched EVResult), distributed param sweep, real k-fold
  * CV training. */
class Round3Spec extends SparkSpec {
  import spark.implicits._

  test("cosine LSH dedup pairs verify to a subset of exact all-pairs") {
    val exact = Dedup.qDedupCosine(spark, sfDir)
      .select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
    val lsh = Dedup.qDedupCosineLsh(spark, sfDir)
      .filter(col("vec_a") < 500 && col("vec_b") < 500)
      .select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
    assert(lsh.nonEmpty, "LSH dedup found no pairs in the exact block")
    assert(lsh.subsetOf(exact), s"LSH found non-exact pairs: ${lsh -- exact}")
  }

  test("SemDeDup pairs verify to a subset of exact all-pairs") {
    val exact = Dedup.qDedupCosine(spark, sfDir)
      .select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
    val sem = Dedup.qDedupSemantic(spark, sfDir)
      .filter(col("vec_a") < 500 && col("vec_b") < 500)
      .select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
    assert(sem.subsetOf(exact), s"SemDeDup found non-exact pairs: ${sem -- exact}")
    // the SemDeDup premise: near-dups land in the same KMeans cell, so
    // intra-cluster search retains real recall (seeded → deterministic)
    if (exact.nonEmpty) {
      assert(sem.nonEmpty, "clustered dedup lost every exact pair")
    }
  }

  test("pagerank conserves total mass and favors high-degree hubs") {
    val edges = Dedup.jaccardEdges(spark, sfDir)
    val pr = Dedup.pageRank(edges).cache()
    // undirected graph, no dangling nodes: Σ ranks stays 1 every iteration
    val total = pr.agg(sum("r")).head().getDouble(0)
    assert(math.abs(total - 1.0) < 1e-9)
    assert(pr.filter(col("r") <= 0).count() === 0)
    // the max-degree node must outrank the min-degree node
    val deg = edges.select(col("a").as("id"))
      .unionByName(edges.select(col("b").as("id")))
      .groupBy("id").agg(count(lit(1)).as("d"))
    val byDeg = pr.join(deg, Seq("id")).orderBy(col("d").desc, col("id")).collect()
    assert(byDeg.head.getDouble(1) >= byDeg.last.getDouble(1))
  }

  test("IVF ANN: covers every query, never beats brute force, recall >= 0.7") {
    val brute = SimilaritySearch.qKnnSearch(spark, sfDir)
      .filter(col("rank") === 1).collect()
      .map(r => r.getAs[Long]("q_id") -> (r.getAs[Long]("nb_id"), r.getAs[Double]("cos_sim")))
      .toMap
    val ivf = SimilaritySearch.qAnnIvf(spark, sfDir).collect()
      .map(r => r.getAs[Long]("q_id") -> (r.getAs[Long]("nb_id"), r.getAs[Double]("cos_sim")))
      .toMap
    assert(ivf.keySet === brute.keySet) // all 10 queries answered
    ivf.foreach { case (q, (_, cos)) => assert(cos <= brute(q)._2 + 1e-9) }
    val hits = brute.keys.count(q => ivf(q)._1 == brute(q)._1)
    assert(hits >= 7, s"IVF recall@1 too low: $hits/${brute.size}") // seeded: 8/10
  }

  test("name match: exact fast path + prefix-blocked JW fuzzy residual") {
    val pred = Seq(("Alpha Corp", true), ("beta inc", false),
      ("Gamma LLC", true), ("zeta co", true)).toDF("name", "pred")
    val gold = Seq(("alpha-corp!", 1), ("Beta Incc", 2), ("delta", 1))
      .toDF("name", "label")
    val m = PolysemyEval.nameMatch(pred, gold).collect()
    val byName = m.map(r => r.getAs[String]("name") ->
      (r.getAs[Int]("label"), r.getAs[Double]("jw"))).toMap
    // exact: alphacorp == alphacorp (jw 1.0); fuzzy: betainc ~ betaincc
    // (jw 0.975 >= 0.95); gamma/zeta have no gold within their block.
    assert(m.length === 2)
    assert(byName("Alpha Corp") === ((1, 1.0)))
    assert(byName("beta inc")._1 === 2)
    assert(byName("beta inc")._2 >= 0.95)
  }

  test("native jaro-winkler expression: SQL registration + codegen column path") {
    graft.plans.GraftExtensions.register(spark)
    val sql = spark.sql("SELECT jaro_winkler_similarity('martha', 'marhta') AS jw")
      .head().getDouble(0)
    assert(math.abs(sql - functions.JaroWinkler.jaroWinkler("martha", "marhta")) < 1e-12)
    val viaCol = Seq(("dwayne", "duane")).toDF("a", "b")
      .select(functions.JaroWinkler.similarity(col("a"), col("b")).as("jw"))
      .head().getDouble(0)
    assert(math.abs(viaCol - functions.JaroWinkler.jaroWinkler("dwayne", "duane")) < 1e-12)
  }

  test("polysemy eval emits one EVResult row with consistent counts") {
    val r = PolysemyEval.qPolysemyEval(spark, sfDir).collect()
    assert(r.length === 1)
    val row = r.head
    val total = row.getAs[Long]("tp") + row.getAs[Long]("fp") +
      row.getAs[Long]("tn") + row.getAs[Long]("fn")
    assert(total > 0, "no concepts matched the gold standard")
    val acc = row.getAs[Double]("accuracy")
    assert(acc >= 0.0 && acc <= 1.0)
  }

  test("param sweep: full grid, counts bounded, positives shrink as min_prob grows") {
    val rows = PolysemyEval.qParamSweep(spark, sfDir).collect()
    assert(rows.length === 18) // 3 probs x 3 topic-mins x 2 len-mins
    rows.foreach { r =>
      val f1 = r.getAs[Double]("f1")
      assert(f1.isNaN || (f1 >= 0.0 && f1 <= 1.0))
    }
    // predicted-positive count (tp+fp) is monotone non-increasing in
    // min_prob for fixed (min_topics, min_len): a stricter probability
    // gate can only drop topics.
    rows.groupBy(r => (r.getAs[Int]("min_topics"), r.getAs[Int]("min_len")))
      .foreach { case (_, g) =>
        val byProb = g.sortBy(_.getAs[Double]("min_prob"))
          .map(r => r.getAs[Long]("tp") + r.getAs[Long]("fp"))
        assert(byProb === byProb.sorted.reverse, s"not monotone: ${byProb.toSeq}")
      }
  }

  test("undersampled LR covers the whole test split") {
    val m = Classification.qClassifyLrUndersample(spark, sfDir).collect().head
    val total = m.getAs[Long]("tp") + m.getAs[Long]("fp") +
      m.getAs[Long]("tn") + m.getAs[Long]("fn")
    assert(total === TestSplit.size(spark, sfDir))
  }

  test("model select sweeps k with coherence and log-perplexity per k") {
    val ms = TopicModeling.qModelSelect(spark, sfDir).collect()
    assert(ms.length === 6) // r10: default widened, one row per swept k
    assert(ms.count(_.getAs[Boolean]("selected")) === 1)
    ms.foreach { r =>
      assert(r.getAs[Double]("mean_umass") <= 1e-9) // u_mass <= 0
      assert(!r.isNullAt(r.fieldIndex("log_perplexity")))
    }
  }

  test("param sweep agrees with qPolysemy at the reference operating point") {
    // the (0.0575, 2, 0) cell's predicted positives must equal qPolysemy's
    // positives over the gold-matched domain (doc_id % 7 != 0)
    val cell = PolysemyEval.qParamSweep(spark, sfDir)
      .filter(col("min_prob") === TopicModeling.MinimumProbability &&
        col("min_topics") === TopicModeling.MinimumTopicsPolysemous &&
        col("min_len") === 0)
      .collect().head
    val expected = TopicModeling.qPolysemy(spark, sfDir)
      .filter(col("polysemous") && col("doc_id") % 7 =!= 0).count()
    assert(cell.getAs[Long]("tp") + cell.getAs[Long]("fp") === expected)
  }

  test("pii scrub masks emails, urls, and digit runs") {
    val docs = Seq(
      (1L, "Contact me at jane.doe@example.com or visit https://example.com/x now"),
      (2L, "card 4111111111111111 pin 1234"),
      (3L, "nothing sensitive here")).toDF("doc_id", "text")
    val out = TextAnalysis.piiScrub(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Int]("n_emails"), r.getAs[Int]("n_urls"), r.getAs[Int]("n_num_runs")))
      .toMap
    assert(out(1L) === ((1, 1, 0)))
    assert(out(2L) === ((0, 0, 2)))
    assert(out(3L) === ((0, 0, 0)))
    // redaction actually rewrites the text: digests differ from the originals
    val digests = TextAnalysis.piiScrub(docs)
      .join(docs.select(col("doc_id"), md5(lower(col("text"))).as("orig_md5")), Seq("doc_id"))
      .filter(col("scrubbed_md5") === col("orig_md5"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(digests === Set(3L)) // only the clean doc is unchanged
  }

  test("approx distinct stays within 5% of exact per source") {
    val rows = TextAnalysis.qApproxDistinct(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Double]("rel_err") < 0.05,
        s"${r.getAs[String]("source")}: rel_err ${r.getAs[Double]("rel_err")}")
    }
  }

  test("classifier param sweep covers the grid with exactly one argmax") {
    val rows = Classification.qClfParamSweep(spark, sfDir).collect()
    assert(rows.length === 6)
    assert(rows.count(_.getAs[Boolean]("selected")) === 1)
    val bestF1 = rows.filter(_.getAs[Boolean]("selected")).head.getAs[Double]("f1")
    assert(rows.forall(_.getAs[Double]("f1") <= bestF1))
  }

  test("cv train: one row per fold covering the fold, plus mean row") {
    val cv = Classification.qCvTrain(spark, sfDir).collect()
    assert(cv.length === 6)
    val folds = cv.filter(_.getAs[Int]("fold") >= 0)
    assert(folds.length === 5)
    // 389 vectors at sf0.001 (500 minus the ExcludedLabels {4, 9} concept
    // holdout — the CV corpus is the zoo's train∪test corpus), stratified
    // per-class rank mod 5 → y=1: 200 → 40×5, y=0: 189 → 38×4 + 37,
    // fold totals {78, 78, 78, 78, 77}, disjoint and exhaustive
    val totals = folds.map { r =>
      r.getAs[Long]("tp") + r.getAs[Long]("fp") +
        r.getAs[Long]("tn") + r.getAs[Long]("fn")
    }
    assert(totals.sum === 389)
    totals.foreach(t => assert(t >= 77 && t <= 78))
    val mean = cv.find(_.getAs[Int]("fold") === -1).get.getAs[Double]("f1")
    val expected = folds.map(_.getAs[Double]("f1")).sum / 5
    assert(math.abs(mean - expected) < 1e-5)
  }
}
