package graft.operators

import graft.QueryModule
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sequential-pattern and itemset mining over the event stream — the
  * behavioral-analytics complement to q_copurchase (which mines pairs with
  * plain SQL): MLlib's parallel FP-growth (frequent event-type baskets per
  * user) and PrefixSpan (frequent ORDERED event-type sequences per user
  * session-day). Both algorithms are the distributed classics (conditional
  * FP-trees / projected prefix databases — no candidate-generation blowup,
  * partition-local mining after one grouping shuffle).
  *
  * Rows-only: tree/projection mining isn't one SQL query. The spec
  * re-verifies every reported support with a direct recount over the same
  * baskets/sequences — the strongest possible gate short of a full oracle
  * reimplementation.
  */
object PatternMining extends QueryModule {

  /** Per-user event-type baskets (distinct types per user-day). */
  private def baskets(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(col("user_id"), date_trunc("day", col("ts")).as("day"))
      .agg(array_sort(collect_set(col("event_type"))).as("items"))

  /** q_freq_itemsets: event-type combinations appearing in ≥ 5% of
    * user-day baskets, with support counts; deterministic ordering. */
  def qFreqItemsets(s: SparkSession, dir: String): DataFrame = {
    val b = baskets(s, dir)
    val model = new org.apache.spark.ml.fpm.FPGrowth()
      .setItemsCol("items").setMinSupport(0.05).setMinConfidence(0.5)
      .fit(b)
    model.freqItemsets
      .select(array_sort(col("items")).as("itemset"), col("freq"))
      .orderBy(col("freq").desc, col("itemset").cast("string").asc)
  }

  /** Per-user-day ordered event-type sequences (each event its own
    * itemset — strict temporal order, ties broken by event_id). */
  private def sequences(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(col("user_id"), date_trunc("day", col("ts")).as("day"))
      .agg(transform(
        array_sort(collect_list(struct(col("ts"), col("event_id"), col("event_type")))),
        e => array(e.getField("event_type"))).as("sequence"))

  /** q_seq_patterns: event-type sequences (length ≤ 3) appearing in ≥ 10%
    * of user-days, in temporal order, with support counts. */
  def qSeqPatterns(s: SparkSession, dir: String): DataFrame = {
    val seqs = sequences(s, dir)
    new org.apache.spark.ml.fpm.PrefixSpan()
      .setSequenceCol("sequence")
      .setMinSupport(0.1).setMaxPatternLength(3)
      .findFrequentSequentialPatterns(seqs)
      .select(flatten(col("sequence")).as("pattern"), col("freq"))
      .orderBy(col("freq").desc, col("pattern").cast("string").asc)
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_freq_itemsets" -> (qFreqItemsets _),
    "q_seq_patterns" -> (qSeqPatterns _))

  override def oracles: Map[String, String] = Map.empty
}
