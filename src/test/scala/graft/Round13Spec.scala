package graft

import graft.operators.{TextPrep, TopicModeling}
import org.apache.spark.sql.functions._

/** Round-13 pins: the r12 advice items that change behavior.
  *
  *  - The u_mass substrate must FAIL LOUDLY (not silently shrink the
  *    pair grid) when a top term has zero document frequency in the
  *    cleaned corpus — the model-select sweep path has no pair-count
  *    certificate, so the guard is the only protection there.
  *  - The CV family runs over the zoo's corpus: ExcludedLabels held out.
  */
class Round13Spec extends SparkSpec {

  private lazy val umassFixtureDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-umass13").toString
    import spark.implicits._
    Seq(
      (1L, "alpha beta alpha", "en", "t", 16L),
      (2L, "alpha", "en", "t", 5L),
      (3L, "beta gamma", "en", "t", 10L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("umass substrate raises on a zero-df (out-of-vocabulary) top term " +
    "instead of silently dropping its pairs") {
    import spark.implicits._
    // "delta" never occurs in the fixture corpus: df(delta) = 0, so every
    // pair involving it has an undefined ln(·/df) — the pre-r13 inner
    // join would shrink the 6-pair grid to 3 and score the topic anyway
    val topTerms = Seq((0, Seq("alpha", "beta", "gamma", "delta")))
      .toDF("topic", "terms")
    val ex = intercept[Exception] {
      TopicModeling.umassCoherence(spark, umassFixtureDir, topTerms).collect()
    }
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: chain(t.getCause)
    assert(chain(ex).exists(t =>
      Option(t.getMessage).exists(_.contains("zero-df top term"))),
      s"expected the zero-df raise_error, got: $ex")
    // and the in-vocabulary grid still scores exactly as before
    val ok = TopicModeling.umassCoherence(spark, umassFixtureDir,
      Seq((0, Seq("alpha", "beta", "gamma"))).toDF("topic", "terms")).collect()
    assert(ok.length == 1 && ok(0).getAs[Long]("n_pairs") == 3L)
  }

  /** 16 points in 8 tight, well-separated groups of 2 (group centers on
    * distinct axes at ±10, members jittered ±0.25): farthest-first
    * seeding must place one seed per group (maximin always prefers an
    * unseeded group at this separation — a plain md5-random draw does
    * NOT, it can seed two centroids in one group and Lloyd then sticks
    * in the split-group local minimum), after which Lloyd lands on the
    * obvious partition. */
  private lazy val kmeansFixtureDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-km13").toString
    import spark.implicits._
    val pts = for (g <- 0 until 8; m <- 0 until 2) yield {
      val v = Array.fill(64)(0.0f)
      v(g * 8) = (if (g % 2 == 0) 10.0f else -10.0f) + (m * 0.5f - 0.25f)
      ((g * 2 + m).toLong, v.toSeq, g)
    }
    pts.toDF("vec_id", "embedding", "label")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir
  }

  test("q_kmeans: deterministic Lloyd separates an 8-group fixture exactly; " +
    "audit certifies accounting, descent and the independent argmin") {
    import graft.operators.SimilaritySearch
    val fin = SimilaritySearch.qKmeans(spark, kmeansFixtureDir)
      .orderBy("cluster").collect()
    assert(fin.length == 8)
    assert(fin.forall(_.getAs[Long]("n") == 2L),
      "every tight group of 2 must land in its own cluster")
    // in-cluster inertia per group: two points at center ±0.25 → centroid
    // at the midpoint, 2 · 0.25² = 0.125 each
    fin.foreach(r => assert(math.abs(r.getAs[Double]("inertia") - 0.125) < 1e-9))
    val a = SimilaritySearch.qKmeansAudit(spark, kmeansFixtureDir).collect()(0)
    assert(a.getAs[Long]("n_points") == 16L)
    for (c <- Seq("accounted_ok", "monotone_ok", "assign_ok"))
      assert(a.getAs[Boolean](c), s"$c failed")
  }

  test("CV family holds out ExcludedLabels exactly like the zoo's dataset()") {
    import graft.operators.{Classification, Evaluation}
    val folds = Evaluation.qCvFolds(spark, sfDir).collect()
    assert(folds.map(_.getAs[Long]("n")).sum ==
      graft.sources.Tables.embeddings(spark, sfDir)
        .filter(!col("label").isin(Classification.ExcludedLabels: _*)).count(),
      "CV base must be the embeddings table minus the concept holdout")
    // no fold may carry an excluded class: n_classes counts the SURVIVING
    // label alphabet (10 − 2 = 8 at every test SF)
    folds.foreach(r => assert(r.getAs[Long]("n_classes") == 8L))
  }
}
