package graft
object CountProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("local[32]").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    println("docShingles=" + operators.Dedup.docShingles(spark, dir).count)
    println("jaccard_pairs=" + operators.Dedup.qDedupJaccard(spark, dir).count)
    println("base_state=" + operators.Dedup.incrBaseState(spark, dir).count)
    println("dedup_incr=" + operators.Dedup.qDedupIncremental(spark, dir).count)
    println("df_state=" + operators.Dedup.incrDfState(spark, dir).count)
    spark.stop()
  }
}
