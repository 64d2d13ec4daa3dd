package graft.sources

import org.apache.spark.sql.DataFrame

/** Bucketed-table support: pre-partition fact tables by their join key so
  * repeated co-located joins skip the shuffle entirely — the standard play
  * for a 100 TB star schema where lineitem ⋈ orders runs continuously.
  * Both sides bucketed+sorted by the same key into the same bucket count →
  * SortMergeJoin with NO Exchange (proven by BucketingSpec on the physical
  * plan, not just asserted in prose). */
object Bucketing {

  def writeBucketed(df: DataFrame, key: String, buckets: Int, table: String): Unit =
    df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, key).sortBy(key)
      .saveAsTable(table)

  /** Hive-style partitioned layout: one directory per key value, so a
    * filter on the partition column prunes whole directories at planning
    * time (PartitionFilters in the scan — proven by BucketingSpec) instead
    * of reading 100 TB to discard most of it. */
  def writePartitioned(df: DataFrame, partitionCol: String, path: String): Unit =
    df.write.mode("overwrite").format("parquet")
      .partitionBy(partitionCol)
      .save(path)
}
