package graft

import graft.operators.{SimilaritySearch, Stats}
import java.sql.Timestamp

/** Round-14 hardening pins — the three r13-advice seams, each driven by
  * a fixture that would have tripped the OLD behavior:
  *  - q_markov_stationary must emit an outgoing-only state (a from_type
  *    never seen as a to_type) with π = 0.0, matching the oracle's
  *    states-left-join row set.
  *  - q_bartlett must go NULL (not error / not a silent value) when any
  *    group has zero variance.
  *  - simplified silhouette must score s = 0 for a point exactly
  *    equidistant from its own and another centroid (b by INDEX, not by
  *    strict value filter).
  */
class Round14Spec extends SparkSpec {

  test("q_markov_stationary emits outgoing-only states with pi = 0.0 " +
    "(row set = all from_types, open chain included)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-markov14").toString
    import spark.implicits._
    def t(m: Int) = Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")
    // 'landing' opens every timeline and never recurs → outgoing-only.
    // view→purchase→view loop: P(view→purchase)=1, P(purchase→view)=1.
    Seq(
      (1L, t(0), 10L, "landing", 0.0, "{}"),
      (2L, t(1), 10L, "view", 0.0, "{}"),
      (3L, t(2), 10L, "purchase", 0.0, "{}"),
      (4L, t(3), 10L, "view", 0.0, "{}"),
      (5L, t(0), 20L, "landing", 0.0, "{}"),
      (6L, t(1), 20L, "view", 0.0, "{}"),
      (7L, t(2), 20L, "purchase", 0.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val pi = Stats.qMarkovStationary(spark, dir).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(pi.keySet == Set("landing", "view", "purchase"),
      s"row set must be ALL from_types, got ${pi.keySet}")
    assert(pi("landing") == 0.0, "outgoing-only state must survive with pi = 0")
    // the 2-cycle lands at (2/3, 1/3) after the even iteration budget
    assert(math.abs(pi("purchase") - 2.0 / 3) < 1e-5 &&
      math.abs(pi("view") - 1.0 / 3) < 1e-5, s"$pi")
  }

  test("q_bartlett goes NULL on a zero-variance group instead of erroring " +
    "or emitting a value") {
    import spark.implicits._
    val degen = Seq(("a", 5.0), ("a", 5.0), ("a", 5.0),
      ("b", 2.0), ("b", 4.0), ("b", 6.0))
    val got = Stats.bartlettOf(degen.toDF("g", "x")).collect()(0)
    assert(got.getAs[Long]("k") == 2L && got.getAs[Long]("n") == 6L)
    assert(got.isNullAt(got.fieldIndex("stat")), "stat must be NULL")
    assert(got.isNullAt(got.fieldIndex("significant")), "significant must be NULL")
    // and the valid path is untouched
    val ok = Stats.bartlettOf(Seq(("a", 1.0), ("a", 2.0), ("a", 3.0),
      ("b", 2.0), ("b", 4.0), ("b", 6.0)).toDF("g", "x")).collect()(0)
    assert(!ok.isNullAt(ok.fieldIndex("stat")))
  }

  test("silhouetteOf scores an exactly equidistant point as s = 0 " +
    "(tied other-centroid taken by index, not skipped by the > filter)") {
    import spark.implicits._
    val cens = Array(Array(0.0), Array(2.0), Array(5.0))
    // vec 1 at x=1: d = (1, 1, 4) → assigned 0, tied with centroid 1 → s = 0
    // (the old strict d > a filter would take b = 4 and score 0.75).
    val e = Seq((1L, Seq(1.0)), (2L, Seq(0.0)), (3L, Seq(2.0)), (4L, Seq(5.0)))
      .toDF("vec_id", "v")
    val r = SimilaritySearch.silhouetteOf(e, cens).orderBy("cluster").collect()
    assert(r.map(_.getAs[Int]("cluster")).toSeq == Seq(0, 1, 2))
    assert(r(0).getAs[Long]("n") == 2L)
    // cluster 0 = {x=1 (s=0 by the tie), x=0 (a=0, b=2 → s=1)} → mean 0.5
    assert(math.abs(r(0).getAs[Double]("mean_sil") - 0.5) < 1e-9,
      s"tie must score 0: ${r(0)}")
    assert(math.abs(r(1).getAs[Double]("mean_sil") - 1.0) < 1e-9)
    assert(math.abs(r(2).getAs[Double]("mean_sil") - 1.0) < 1e-9)
  }
}
