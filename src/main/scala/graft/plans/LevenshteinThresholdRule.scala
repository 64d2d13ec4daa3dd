package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule: rewrite a thresholded edit-distance comparison
  * `levenshtein(a, b) <= k` (any of the four literal-comparison spellings)
  * into `levenshtein(a, b, k) >= 0` — Spark's 3-arg form runs the BANDED
  * dynamic program (O(k·n) with an early bail-out, returning -1 past the
  * threshold) instead of the full O(n·m) table, and short-circuits
  * entirely when |len(a) − len(b)| > k.
  *
  * Semantics-preserving by the function's contract: with a threshold the
  * result is the true distance when ≤ k and -1 otherwise, so `>= 0` holds
  * exactly when the unbounded distance is ≤ k (nulls propagate
  * identically). The rewrite leaves unguarded projections of
  * `levenshtein(a, b)` untouched, and is idempotent because the 3-arg
  * form no longer matches the pattern.
  *
  * At 100 TB this is the difference between a fuzzy-join verify step that
  * does full DP on every candidate pair and one that bails after k+1
  * diagonal bands — the same result, bounded work per row. Registered via
  * [[GraftExtensions]]; q_fuzzy_vocab's DuckDB hash-gate (run under
  * GraftSession, rule active) proves result-identity end-to-end.
  */
object LevenshteinThresholdRule extends Rule[LogicalPlan] {

  private def banded(l: Expression, r: Expression, k: Int): Expression =
    GreaterThanOrEqual(Levenshtein(l, r, Some(Literal(k))), Literal(0))

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case LessThanOrEqual(Levenshtein(l, r, None), Literal(k: Int, IntegerType)) if k >= 0 =>
      banded(l, r, k)
    case GreaterThanOrEqual(Literal(k: Int, IntegerType), Levenshtein(l, r, None)) if k >= 0 =>
      banded(l, r, k)
    case LessThan(Levenshtein(l, r, None), Literal(k: Int, IntegerType)) if k >= 1 =>
      banded(l, r, k - 1)
    case GreaterThan(Literal(k: Int, IntegerType), Levenshtein(l, r, None)) if k >= 1 =>
      banded(l, r, k - 1)
  }
}
