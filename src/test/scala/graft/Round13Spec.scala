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
