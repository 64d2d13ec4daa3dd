package graft

import graft.operators.Stats

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
}
