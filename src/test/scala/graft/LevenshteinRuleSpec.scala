package graft

import graft.plans.LevenshteinThresholdRule
import org.apache.spark.sql.functions._

/** The levenshtein-threshold optimizer rule: fires on all four literal
  * comparison spellings, leaves unguarded projections alone, and never
  * changes results (row-identical with the rule on and off). */
class LevenshteinRuleSpec extends SparkSpec {

  import spark.implicits._

  private val words = Seq("fast", "last", "hash", "table", "tables",
    "scan", "span", "spark", "sprk", "a").toDF("w")

  private def withRule[T](body: => T): T = {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ LevenshteinThresholdRule
    try body
    finally spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations.filterNot(_ == LevenshteinThresholdRule)
  }

  test("rewrites lev(a,b) <= k to the banded 3-arg form in the plan") {
    withRule {
      val q = words.as("x").crossJoin(words.as("y"))
        .filter(levenshtein(col("x.w"), col("y.w")) <= 2)
      val opt = q.queryExecution.optimizedPlan.toString
      assert(opt.contains("levenshtein(w#") && opt.contains("Some(2)) >= 0"), opt)
    }
  }

  test("all four spellings produce identical rows with and without the rule") {
    val pairs = words.as("x").crossJoin(words.as("y"))
      .select(col("x.w").as("a"), col("y.w").as("b"))
    val preds = Seq[org.apache.spark.sql.Column => org.apache.spark.sql.Column](
      d => d <= 2, d => lit(2) >= d, d => d < 2, d => lit(2) > d)
    preds.foreach { p =>
      val plain = pairs.filter(p(levenshtein(col("a"), col("b"))))
        .collect().map(r => (r.getString(0), r.getString(1))).toSet
      val ruled = withRule {
        pairs.filter(p(levenshtein(col("a"), col("b"))))
          .collect().map(r => (r.getString(0), r.getString(1))).toSet
      }
      assert(plain === ruled)
    }
  }

  test("unguarded levenshtein projections are untouched") {
    withRule {
      val q = words.select(levenshtein(col("w"), lit("fast")).as("d"))
      val opt = q.queryExecution.optimizedPlan.toString
      assert(!opt.contains(">= 0"), opt)
      // and values are the plain distances
      assert(q.filter(col("d") === 0).count() === 1)
    }
  }
}
