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

  /** Append the EXCLUSIVE global prefix sum of `weightCol` (LongType) in
    * the total order given by `sortCols`, as `cum_before` — the same
    * zipWithIndex construction generalized from counts to weights: range
    * partition (parallel total sort), one lightweight per-partition sum
    * pass (numPartitions longs to the driver), then per-partition running
    * sums started from the partition offsets. The distributed form of
    * `sum(w) OVER (ORDER BY ... ROWS UNBOUNDED PRECEDING AND 1 PRECEDING)`
    * — which as a bare window would collapse to one task. */
  def globalPrefixSum(df: DataFrame, weightCol: String, sortCols: Column*): DataFrame = {
    val spark = df.sparkSession
    val n = spark.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val sorted = df.repartitionByRange(n, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
    val widx = sorted.schema.fieldIndex(weightCol)
    // NO persist: both passes hang off the same RDD lineage, so the range
    // shuffle is written once and the second job reuses its shuffle files
    // (the map stage shows as "skipped") — the only recomputed work is the
    // in-memory partition sort. A persist here would pin the full relation
    // in the block manager for the session lifetime (r6 ADVICE leak).
    val rdd0 = sorted.rdd
    val partSums = rdd0
      .mapPartitions(it => Iterator(it.map(_.getLong(widx)).sum), preservesPartitioning = true)
      .collect()
    val offsets = partSums.scanLeft(0L)(_ + _)
    val schema = sorted.schema.add("cum_before", LongType, nullable = false)
    val rdd = rdd0.mapPartitionsWithIndex { (pid, it) =>
      var acc = offsets(pid)
      it.map { r =>
        val out = Row.fromSeq(r.toSeq :+ acc)
        acc += r.getLong(widx)
        out
      }
    }
    df.sparkSession.createDataFrame(rdd, schema)
  }

  /** Append the EXCLUSIVE global prefix max of `valueCol` (LongType) in
    * the total order given by `sortCols`, as `max_before` (NULL for rows
    * with no strict predecessor) — the distributed form of
    * `max(v) OVER (ORDER BY ... ROWS BETWEEN UNBOUNDED PRECEDING AND 1
    * PRECEDING)`, which as a bare window collapses the relation into one
    * task. Same shape as globalPrefixSum: range partition (parallel total
    * sort), one lightweight per-partition max pass (numPartitions options
    * to the driver), then per-partition running maxima seeded from the
    * preceding partitions' maxima. */
  def globalPrefixMax(df: DataFrame, valueCol: String, sortCols: Column*): DataFrame = {
    val spark = df.sparkSession
    val n = spark.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val sorted = df.repartitionByRange(n, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
    val vidx = sorted.schema.fieldIndex(valueCol)
    // no persist: both jobs share the range shuffle via lineage (see
    // globalPrefixSum's note)
    val rdd0 = sorted.rdd
    val partMax: Array[Option[Long]] = rdd0
      .mapPartitions({ it =>
        var m = Option.empty[Long]
        it.foreach { r =>
          val v = r.getLong(vidx)
          if (m.isEmpty || v > m.get) m = Some(v)
        }
        Iterator(m)
      }, preservesPartitioning = true)
      .collect()
    val offsets = partMax.scanLeft(Option.empty[Long]) {
      case (Some(a), Some(b)) => Some(math.max(a, b))
      case (a, b)             => a.orElse(b)
    }
    val schema = sorted.schema.add("max_before", LongType, nullable = true)
    val rdd = rdd0.mapPartitionsWithIndex { (pid, it) =>
      var acc = offsets(pid)
      it.map { r =>
        val out = Row.fromSeq(r.toSeq :+ acc.map(Long.box).orNull)
        val v = r.getLong(vidx)
        if (acc.isEmpty || v > acc.get) acc = Some(v)
        out
      }
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
