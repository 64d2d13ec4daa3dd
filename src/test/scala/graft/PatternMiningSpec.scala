package graft

import graft.operators.PatternMining
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Pattern mining vs direct recounts: every reported support is recounted
  * over the same baskets/sequences, and thresholds hold. */
class PatternMiningSpec extends SparkSpec {

  test("every frequent itemset's support recounts exactly, above threshold") {
    val baskets = Tables.events(spark, sfDir)
      .groupBy(col("user_id"), date_trunc("day", col("ts")).as("day"))
      .agg(collect_set(col("event_type")).as("items"))
      .select("items").collect().map(_.getSeq[String](0).toSet)
    val n = baskets.length
    val found = PatternMining.qFreqItemsets(spark, sfDir).collect()
    assert(found.nonEmpty)
    found.foreach { r =>
      val itemset = r.getString(0).split(' ').toSet
      val freq = r.getLong(1)
      val direct = baskets.count(b => itemset.subsetOf(b))
      assert(direct === freq, s"$itemset")
      assert(freq >= math.ceil(0.05 * n).toLong - 1)
    }
  }

  test("every sequential pattern's support recounts exactly (subsequence match)") {
    val seqs = Tables.events(spark, sfDir)
      .groupBy(col("user_id"), date_trunc("day", col("ts")).as("day"))
      .agg(array_sort(collect_list(struct(col("ts"), col("event_id"), col("event_type"))))
        .as("evs"))
      .select(expr("transform(evs, e -> e.event_type)"))
      .collect().map(_.getSeq[String](0))
    def isSubseq(pat: Seq[String], seq: Seq[String]): Boolean = {
      var i = 0
      seq.foreach { x => if (i < pat.length && x == pat(i)) i += 1 }
      i == pat.length
    }
    val found = PatternMining.qSeqPatterns(spark, sfDir).collect()
    assert(found.nonEmpty)
    found.foreach { r =>
      val pat = r.getString(0).split(' ').toSeq
      val freq = r.getLong(1)
      assert(pat.length <= 3)
      val direct = seqs.count(s => isSubseq(pat, s))
      assert(direct === freq, s"$pat direct=$direct freq=$freq")
    }
  }
}
