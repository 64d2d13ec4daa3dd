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
}
