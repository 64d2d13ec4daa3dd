package graft

import graft.operators.Relational
import org.apache.spark.sql.functions._

/** The native AsOfJoin whole-operator path: planned via AsOfJoinExec,
  * row-identical to the union+window rewrite, and correct on the edges
  * (no candidate → null, same-instant inclusive, key boundaries across
  * shuffle partitions). */
class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  test("planner strategy places AsOfJoinExec with co-partitioned sorted children") {
    val l = Seq((1L, 10L, "p1")).toDF("k", "t", "tag")
    val r = Seq((1L, 5L)).toDF("rk", "rt")
    val joined = Relational.asofJoinNative(l, r, "k", "t", "rk", "rt")
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin "), plan) // AsOfJoinExec prints without the Exec suffix
    assert(plan.contains("Sort ["), plan) // EnsureRequirements added the sorts
    assert(plan.contains("Exchange hashpartitioning"), plan) // and the co-partitioning
  }

  test("edge semantics: latest-at-or-before wins, no candidate gives null") {
    val purchases = Seq(
      (101L, 1L, 100L), // after two views -> latest (90)
      (102L, 1L, 90L),  // same instant as a view -> inclusive (90)
      (103L, 1L, 10L),  // before every view -> null
      (104L, 2L, 50L),  // user with no views at all -> null
      (105L, 3L, 70L)   // single view long before -> 20
    ).toDF("event_id", "k", "t")
    val views = Seq((1L, 40L), (1L, 90L), (3L, 20L)).toDF("rk", "rt")
    val got = Relational.asofJoinNative(purchases, views, "k", "t", "rk", "rt")
      .select(col("event_id"), col("rt"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(got === Map(101L -> Some(90L), 102L -> Some(90L), 103L -> None,
      104L -> None, 105L -> Some(20L)))
  }

  test("native operator is row-identical to the union+window rewrite at sf0.001") {
    val native = Relational.qAsofNative(spark, sfDir)
    val rewrite = Relational.qAsofJoin(spark, sfDir)
    assert(native.count() === rewrite.count())
    assert(native.except(rewrite).count() === 0 && rewrite.except(native).count() === 0)
  }

  test("operator participates in whole-stage codegen (starred in the final plan)") {
    val l = (1L to 100L).map(i => (i % 7, i, i * 2)).toDF("k", "id", "t")
    val r = (1L to 60L).map(i => (i % 7, i * 3 + 1)).toDF("rk", "rt")
    val j = Relational.asofJoinNative(l, r, "k", "t", "rk", "rt")
    j.collect() // finalize AQE so codegen stages are visible
    val plan = j.queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(ln => ln.contains("AsOfJoin") && ln.contains("*(")),
      plan.linesIterator.take(8).mkString("\n"))
  }

  test("null keys/times never match: left nulls emit null-extended rows, right nulls are skipped") {
    val left = Seq(
      (1L, Some(1L), Some(100L)), // normal probe -> matches rt=90
      (2L, None, Some(100L)),     // null key -> null row
      (3L, Some(1L), None),       // null time -> null row
      (4L, Some(9L), Some(50L))   // key whose only build rows have null key/time -> null
    ).toDF("id", "k", "t")
    val right = Seq(
      (Some(1L), Some(90L)),
      (None, Some(40L)),   // null build key: never a candidate
      (Some(9L), None)     // null build time: never a candidate
    ).toDF("rk", "rt")
    val got = Relational.asofJoinNative(left, right, "k", "t", "rk", "rt")
      .select(col("id"), col("rt")).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(got === Map(1L -> Some(90L), 2L -> None, 3L -> None, 4L -> None))
  }

  test("non-long key/time is rejected at plan construction") {
    val l = Seq((1, 10L)).toDF("k", "t") // k is IntegerType
    val r = Seq((1L, 5L)).toDF("rk", "rt")
    val e = intercept[IllegalArgumentException] {
      Relational.asofJoinNative(l, r, "k", "t", "rk", "rt")
    }
    assert(e.getMessage.contains("must be LongType"))
  }

  test("many keys across partitions: agrees with a window-based recomputation") {
    val left = (1L to 500L).map(i => (i % 37, i, i * 2)).toDF("k", "id", "t")
    val right = (1L to 300L).map(i => (i % 37, i * 3 + 1)).toDF("rk", "rt")
    val got = Relational.asofJoinNative(left, right, "k", "t", "rk", "rt")
      .select(col("id"), col("rt")).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    // reference: max rt <= t per key via a plain (bounded) join + agg
    val want = left.join(right, col("k") === col("rk") && col("rt") <= col("t"), "left_outer")
      .groupBy("id").agg(coalesce(max("rt"), lit(-1L)).as("rt"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === want)
  }
}
