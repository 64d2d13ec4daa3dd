package graft

import org.apache.spark.sql.functions._

/** Dev probe: candidate counts for q_jaccard_prefix with and without the
  * PPJoin length/position filters. */
object PpjProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("local[32]").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    import org.apache.spark.sql.expressions.Window
    val sh = operators.Dedup.docShingles(spark, dir)
    val df = sh.groupBy("sh").agg(count(lit(1)).as("sdf"))
    val w = Window.partitionBy("doc_id").orderBy(col("sdf").asc, col("sh").asc)
    val tau = operators.Dedup.PrefixJaccardTau
    val prefix = sh.join(df, Seq("sh"))
      .withColumn("pos", row_number().over(w))
      .withColumn("sz", count(lit(1)).over(Window.partitionBy("doc_id")))
      .filter(col("pos") <= col("sz") - ceil(col("sz") * tau).cast("long") + 1)
      .select(col("doc_id"), col("sh"), col("pos"), col("sz"))
      .localCheckpoint(true)
    val joined = prefix.select(col("doc_id").as("doc_a"), col("sh"),
        col("pos").as("pa"), col("sz").as("sz_a"))
      .join(prefix.select(col("doc_id").as("doc_b"), col("sh"),
        col("pos").as("pb"), col("sz").as("sz_b")), Seq("sh"))
      .filter(col("doc_a") < col("doc_b"))
      .localCheckpoint(true)
    println("match_rows=" + joined.count())
    println("cand_old=" + joined.select("doc_a", "doc_b").distinct().count())
    val filtered = joined
      .filter(least(col("sz_a"), col("sz_b")) * 10 >=
        greatest(col("sz_a"), col("sz_b")) * 3)
      .filter((lit(1) + least(col("sz_a") - col("pa"),
        col("sz_b") - col("pb"))) * 13 >= (col("sz_a") + col("sz_b")) * 3)
    println("match_rows_filtered=" + filtered.count())
    println("cand_new=" + filtered.select("doc_a", "doc_b").distinct().count())
    spark.stop()
  }
}
