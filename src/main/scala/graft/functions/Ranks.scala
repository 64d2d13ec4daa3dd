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

  /** Exact nearest-rank ORDER-STATISTIC PICK per group, without numbering
    * every row: when a query needs only the value at rank k (median,
    * p05/p95 cuts), materializing a global row number for the whole
    * relation (zipWithIndex: full row copies, one count job per consumer)
    * is wasted work. This runs the selection directly on the range
    * shuffle: (1) one range partition on (group, value) — the parallel
    * total sort; (2) a lightweight per-partition per-group count pass
    * (run lengths in first-appearance order — groups are contiguous
    * after the sort) both fixes the per-group totals (so the target
    * ranks) AND locates each target rank's (partition, local offset), no
    * separate count job; (3) a final pick pass emits ONLY the #groups ×
    * #ranks hit rows. The shuffle is written once and reused by jobs 2
    * and 3 via lineage. Returns (per-group counts, picked values as
    * (group, rank, value)) — both driver-sized.
    *
    * Ties: any consistent order among equal values yields the same value
    * at rank k, so no tie-break key is needed for value picks. */
  def groupedValueAtRanks(df: DataFrame, groupCol: String, valueCol: String,
      ranksFor: Long => Seq[Long]): (Map[Any, Long], Seq[(Any, Long, Any)]) = {
    import org.apache.spark.sql.functions.col
    val spark = df.sparkSession
    val nPart = spark.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val sorted = df.repartitionByRange(nPart, col(groupCol).asc, col(valueCol).asc)
      .sortWithinPartitions(col(groupCol).asc, col(valueCol).asc)
    groupedValueAtRanksSorted(sorted, groupCol, valueCol, ranksFor)
  }

  /** The pick phase of [[groupedValueAtRanks]] over an ALREADY
    * range-partitioned-and-sorted relation (groups contiguous, values
    * ascending within each group; any monotone re-expression of the sort
    * value is a valid `valueCol`). Callers that ask several rank
    * questions of the same ordering — the robust-location family all
    * ranks lineitem prices by return flag — materialize the sorted
    * relation ONCE (localCheckpoint) and skip the per-query range
    * shuffle + sampling pass this way (guide §2.4: share one exchange
    * across consumers). */
  def groupedValueAtRanksSorted(sorted: DataFrame, groupCol: String,
      valueCol: String,
      ranksFor: Long => Seq[Long]): (Map[Any, Long], Seq[(Any, Long, Any)]) = {
    val spark = sorted.sparkSession
    val gidx = sorted.schema.fieldIndex(groupCol)
    val vidx = sorted.schema.fieldIndex(valueCol)
    val rdd0 = sorted.rdd
    val partGroupCounts: Array[Seq[(Any, Long)]] = rdd0.mapPartitions({ it =>
      val buf = scala.collection.mutable.LinkedHashMap.empty[Any, Long]
      it.foreach { r => val g = r.get(gidx); buf(g) = buf.getOrElse(g, 0L) + 1L }
      Iterator(buf.toSeq)
    }, preservesPartitioning = true).collect()
    val counts: Map[Any, Long] = partGroupCounts.flatten
      .groupBy(_._1).map { case (g, s) => g -> s.map(_._2).sum }
    val targets: Map[Any, Seq[Long]] =
      counts.map { case (g, n) => g -> ranksFor(n).distinct.sorted }
    val seen = scala.collection.mutable.Map.empty[Any, Long]
    val wanted: Array[Map[Any, Seq[(Long, Long)]]] = partGroupCounts.map { seq =>
      seq.flatMap { case (g, cnt) =>
        val start = seen.getOrElse(g, 0L)
        seen(g) = start + cnt
        val hits = targets.getOrElse(g, Nil)
          .filter(k => k > start && k <= start + cnt)
          .map(k => (k - start - 1, k)) // (local offset in this run, rank)
        if (hits.isEmpty) Nil else Seq(g -> hits)
      }.toMap
    }
    val bc = spark.sparkContext.broadcast(wanted)
    val picked = rdd0.mapPartitionsWithIndex { (pid, it) =>
      val want = bc.value(pid)
      if (want.isEmpty) Iterator.empty
      else {
        val pos = scala.collection.mutable.Map.empty[Any, Long]
        it.flatMap { r =>
          val g = r.get(gidx)
          want.get(g) match {
            case None => Iterator.empty
            case Some(hs) =>
              val i = pos.getOrElse(g, 0L); pos(g) = i + 1
              hs.collect { case (li, k) if li == i => (g, k, r.get(vidx)) }.iterator
          }
        }
      }
    }.collect().toSeq
    (counts, picked)
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
