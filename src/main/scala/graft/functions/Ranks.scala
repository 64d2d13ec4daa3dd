package graft.functions

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.types.LongType

/** Distributed exact global ranking.
  *
  * `Window.orderBy(...)` with no partition key collapses the whole relation
  * into ONE task — the canonical scale-killer for global row_number/ntile.
  * The distributed equivalent is the zipWithIndex construction: range-
  * repartition on the sort key (a parallel total sort, the same machinery
  * as orderBy), sort within partitions, then assign each row its global
  * position from per-partition offsets. Spark computes the offsets with
  * one lightweight count pass per partition; only the partition-count
  * array (numPartitions longs) ever reaches the driver.
  */
object Ranks {

  /** Append a 1-based global row number `rn` in the total order given by
    * `sortCols` (make the order total — include a unique tie-break key). */
  def globalRowNumber(df: DataFrame, sortCols: Column*): DataFrame = {
    val spark = df.sparkSession
    val n = spark.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val sorted = df.repartitionByRange(n, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
    val schema = sorted.schema.add("rn", LongType, nullable = false)
    val rdd = sorted.rdd.zipWithIndex().map { case (r, i) =>
      Row.fromSeq(r.toSeq :+ (i + 1L))
    }
    spark.createDataFrame(rdd, schema)
  }

  /** SQL-standard ntile bucket for global position `rn` of `total` rows:
    * with q = total/k and r = total%k, the first r buckets take q+1 rows.
    * Mirrors the builtin ntile() exactly, as a Column over `rn`. */
  def ntileOf(rn: Column, total: Column, k: Int): Column = {
    import org.apache.spark.sql.functions._
    val q = total.cast("long") / k
    val r = total.cast("long") % k
    val qL = floor(q).cast("long")
    val cut = r * (qL + 1L)
    when(rn <= cut, floor((rn - 1L) / (qL + 1L)) + 1L)
      .otherwise(r + floor((rn - cut - 1L) / qL) + 1L)
      .cast("int")
  }
}
