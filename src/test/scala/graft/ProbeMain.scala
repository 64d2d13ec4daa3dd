package graft
/** Scratch probe driver (test scope): determinism + cache isolation. */
object ProbeMain {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val a = operators.TopicModeling.qLdaTopics(spark, "/root/testdata/sf0.001").collect.map(_.toString).sorted
    val b = operators.TopicModeling.qLdaTopics(spark, "/root/testdata/sf0.001").collect.map(_.toString).sorted
    println("SAME_DIR_DETERMINISTIC=" + a.sameElements(b))
    val c1 = operators.TopicModeling.docTopics(spark, "/root/testdata/sf0.001").count
    val c2 = operators.TopicModeling.docTopics(spark, "/root/testdata/sf0.1").count
    println("CACHE_ISOLATION doc_counts=" + c1 + "," + c2 + " distinct=" + (c1 != c2))
    spark.stop()
  }
}
