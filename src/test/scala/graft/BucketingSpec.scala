package graft

import graft.sources.Bucketing

/** Proves the bucketing claim at the PLAN level: a join of two tables
  * bucketed+sorted by the join key must contain no shuffle exchange. */
class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("partitioned layout prunes non-matching partitions at the scan") {
    val docs = graft.sources.Tables.documents(spark, sfDir)
    val path = "/tmp/graft-test-warehouse/docs_by_lang"
    graft.sources.Bucketing.writePartitioned(docs, "lang", path)
    val en = spark.read.parquet(path).filter($"lang" === "en")
    val expected = docs.filter($"lang" === "en").count()
    assert(en.count() === expected)
    val scan = en.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") && scan.contains("isnotnull(lang"),
      s"scan does not partition-prune:\n$scan")
  }

  test("join over co-bucketed tables runs without a shuffle exchange") {
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
    try {
      val df = (1 to 1000).map(i => (i.toLong, i * 2.0)).toDF("k", "v")
      Bucketing.writeBucketed(df, "k", 8, "bspec_a")
      Bucketing.writeBucketed(df.select($"k", ($"v" * 10).as("w")), "k", 8, "bspec_b")
      val joined = spark.table("bspec_a").join(spark.table("bspec_b"), "k")
      assert(joined.count() === 1000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS bspec_a")
      spark.sql("DROP TABLE IF EXISTS bspec_b")
    }
  }
}
