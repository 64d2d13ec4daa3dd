package graft

import graft.operators.Classification

/** Every classifier in the zoo emits a well-formed EVResult row that covers
  * the full test split (vec_id % 5 == 0 over the non-excluded concepts —
  * labels 4/9 are the held-out excluded-concepts partition). */
class ClassifierZooSpec extends SparkSpec {

  private lazy val nTest = TestSplit.size(spark, sfDir)

  private val zoo = Seq(
    "q_classify_svc" -> (Classification.qClassifySvc _),
    "q_classify_nb" -> (Classification.qClassifyNb _),
    "q_classify_rf" -> (Classification.qClassifyRf _),
    "q_classify_gbt" -> (Classification.qClassifyGbt _),
    "q_classify_dt" -> (Classification.qClassifyDt _),
    "q_classify_mlp" -> (Classification.qClassifyMlp _))

  zoo.foreach { case (name, q) =>
    test(s"$name: full test-split coverage, metrics in range") {
      val m = q(spark, sfDir).collect().head
      val total = m.getAs[Long]("tp") + m.getAs[Long]("fp") +
        m.getAs[Long]("tn") + m.getAs[Long]("fn")
      assert(total === nTest)
      val acc = m.getAs[Double]("accuracy")
      assert(acc >= 0.0 && acc <= 1.0)
      // a fitted model must beat the trivial all-one-class floor on accuracy
      // being well-formed; we don't assert skill, only shape + determinism
      assert(m.getAs[String]("model").nonEmpty)
    }
  }

  test("q_features: per-dimension profile covers topic vector + length") {
    val f = Classification.qFeatures(spark, sfDir).collect()
    // 10 topic dims + 1 length dim
    assert(f.map(_.getAs[Int]("dim_idx")).sorted.toSeq === (0 to 10))
    assert(f.forall(_.getAs[Long]("n_docs") > 0))
    // the length dimension (last) must have nonzero spread
    val lenStd = f.maxBy(_.getAs[Int]("dim_idx")).getAs[Double]("std")
    assert(lenStd > 0.0)
  }
}
