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
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach(ext.injectFunction)
    ext.injectOptimizerRule(_ => LevenshteinThresholdRule)
    ext.injectPlannerStrategy(_ => AsOfJoinStrategy)
  }
}

object GraftExtensions {
  import graft.functions.{CosineSimilarity, DotProduct, MinHashSignature, SimHash64}

  private def fn(name: String, clazz: Class[_],
      builder: Seq[Expression] => Expression) =
    (FunctionIdentifier(name), new ExpressionInfo(clazz.getName, name), builder)

  /** Every native kernel, by SQL name: string similarity, the vector
    * kernels, and the signature kernels — SQL users get the same codegen
    * implementations the DataFrame API uses. */
  private val functions = Seq(
    fn("jaro_winkler_similarity", classOf[JaroWinklerSimilarity],
      c => JaroWinklerSimilarity(c(0), c(1))),
    fn("vec_dot", classOf[DotProduct], c => DotProduct(c(0), c(1))),
    fn("vec_cosine", classOf[CosineSimilarity], c => CosineSimilarity(c(0), c(1))),
    fn("simhash64", classOf[SimHash64], c => SimHash64(c(0))),
    fn("minhash_signature", classOf[MinHashSignature], {
      case Seq(child, w: org.apache.spark.sql.catalyst.expressions.Literal) =>
        MinHashSignature(child, w.value.toString.toInt)
      case c => MinHashSignature(c(0), 128)
    }),
    fn("bitmap_distinct", classOf[graft.functions.BitmapDistinct],
      c => graft.functions.BitmapDistinct(c(0))))

  /** Late registration into an existing session (tests, REPL). */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
}
