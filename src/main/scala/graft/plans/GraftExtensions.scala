package graft.plans

import graft.functions.JaroWinklerSimilarity
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** graft's SparkSessionExtensions: registers the library's native Catalyst
  * expressions as SQL functions, so `spark.sql("... jaro_winkler_similarity
  * (a, b) ...")` works with the same codegen'd implementation the DataFrame
  * API uses. Enable with
  * `.config("spark.sql.extensions", "graft.plans.GraftExtensions")`, or call
  * [[GraftExtensions.register]] on an already-built session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    ext.injectFunction(GraftExtensions.jaroWinklerFn)
}

object GraftExtensions {
  private val jaroWinklerFn = (
    FunctionIdentifier("jaro_winkler_similarity"),
    new ExpressionInfo(classOf[JaroWinklerSimilarity].getName, "jaro_winkler_similarity"),
    (children: Seq[Expression]) => JaroWinklerSimilarity(children(0), children(1)))

  /** Late registration into an existing session (tests, REPL). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      jaroWinklerFn._1, jaroWinklerFn._2, jaroWinklerFn._3)
}
