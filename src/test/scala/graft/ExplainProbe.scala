package graft
object ExplainProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    println("===== q3_join =====")
    operators.Relational.q3Join(spark, dir).explain("formatted")
    println("===== q_dedup_jaccard =====")
    operators.Dedup.qDedupJaccard(spark, dir).explain("formatted")
    spark.stop()
  }
}
