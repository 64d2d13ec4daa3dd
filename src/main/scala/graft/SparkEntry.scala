package graft

import graft.operators._
import graft.sources.NQuads
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §2 for the operator
  * inventory; each module contributes (queries, DuckDB oracle SQL). */
object SparkEntry {

  val modules: Seq[QueryModule] = Seq(
    Relational, Tpch, TextPrep, TextAnalysis, TextScoring, Dedup,
    SimilaritySearch, Evaluation, NQuads, Multimodal, TopicModeling,
    Classification, PolysemyEval, Stats, RobustStats, Inference, ScaleOps,
    Bpe, Unigram, Wordpiece, PatternMining, Recommender, Embeddings)

  /** Flagship: the polysemy-pipeline front half (clean → dictionary) on
    * sf0.001; driver smoke-checks rows > 0. (The end-to-end headline,
    * qPolysemyEval, is NOT the smoke target on purpose: MLlib's LDA
    * trips the REPL classloader under `sbt console` — "Prohibited package
    * name: java.sql" — and the smoke must stay environment-robust.) */
  def entry(spark: SparkSession): DataFrame =
    TextPrep.qDictionary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.flatMap(_.queries).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys → weaker rows-only check. */
  def oracleSql: Map[String, String] =
    modules.flatMap(_.oracles).toMap
}
