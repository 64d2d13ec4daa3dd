package graft

import graft.streaming.EventStream
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import java.sql.Timestamp

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  test("windowed counts: stream result matches the batch twin") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, Double)]
    val events = input.toDF().toDF("ts", "event_type", "value")

    val q = EventStream.windowedCounts(events)
      .writeStream.format("memory").queryName("win_counts")
      .outputMode("complete").start()
    try {
      input.addData(
        (Timestamp.valueOf("2024-01-01 01:00:00"), "click", 1.5),
        (Timestamp.valueOf("2024-01-01 02:00:00"), "click", 2.5),
        (Timestamp.valueOf("2024-01-02 01:00:00"), "view", 1.0))
      q.processAllAvailable()
      val out = spark.table("win_counts").collect()
        .map(r => (r.getAs[String]("day"), r.getAs[String]("event_type"),
          r.getAs[Long]("n"), r.getAs[Double]("sum_value"))).toSet
      assert(out === Set(("2024-01-01", "click", 2L, 4.0), ("2024-01-02", "view", 1L, 1.0)))

      // batch twin over the same rows produces the same aggregate
      val batch = EventStream.windowedCounts(
        Seq((Timestamp.valueOf("2024-01-01 01:00:00"), "click", 1.5),
          (Timestamp.valueOf("2024-01-01 02:00:00"), "click", 2.5),
          (Timestamp.valueOf("2024-01-02 01:00:00"), "view", 1.0))
          .toDF("ts", "event_type", "value"))
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
      assert(batch === out)
    } finally q.stop()
  }

  test("stream-static join enriches each micro-batch from the dim") {
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq(("click", 1.0), ("view", 0.5)).toDF("event_type", "weight")
    val input = MemoryStream[(Long, String)]
    val q = EventStream.enriched(input.toDF().toDF("event_id", "event_type"), dim)
      .writeStream.format("memory").queryName("enriched_ev")
      .outputMode("append").start()
    try {
      input.addData((1L, "click"), (2L, "view"), (3L, "error"))
      q.processAllAvailable()
      val out = spark.table("enriched_ev")
        .collect().map(r => r.getAs[Long]("event_id") ->
          Option(r.getAs[java.lang.Double]("weight"))).toMap
      assert(out === Map(1L -> Some(1.0), 2L -> Some(0.5), 3L -> None))
    } finally q.stop()
  }

  test("streaming dedup drops content duplicates within the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long, String)]
    val q = EventStream.dedupedDocs(input.toDF().toDF("ts", "doc_id", "text"))
      .writeStream.format("memory").queryName("dedup_docs")
      .outputMode("append").start()
    try {
      input.addData(
        (Timestamp.valueOf("2024-01-01 01:00:00"), 1L, "same text"),
        (Timestamp.valueOf("2024-01-01 01:00:01"), 2L, "same text"),
        (Timestamp.valueOf("2024-01-01 01:00:02"), 3L, "other text"))
      q.processAllAvailable()
      val texts = spark.table("dedup_docs").select("text").as[String].collect().sorted
      assert(texts === Array("other text", "same text"))
    } finally q.stop()
  }

  test("streaming CUSUM matches the local fold, accumulates drift across batches") {
    implicit val sqlCtx = spark.sqlContext
    val target = 10.0
    val threshold = 6.0
    val input = MemoryStream[EventStream.TypedValue]
    val q = EventStream.runningCusum(input.toDS(), target, threshold)
      .writeStream.format("memory").queryName("cusum_out")
      .outputMode("update").start()
    def latest(): Map[String, (Long, Double, Boolean)] =
      spark.table("cusum_out").collect()
        .map(r => (r.getString(0), (r.getLong(1), r.getDouble(2), r.getBoolean(3))))
        .groupBy(_._1).map { case (k, vs) => k -> vs.maxBy(_._2._1)._2 }.toMap
    def model(xs: Seq[Double]): Double = {
      var pref = 0.0; var minp = 0.0; var out = 0.0
      xs.foreach { x => pref += x - target; minp = math.min(minp, pref); out = pref - minp }
      out
    }
    try {
      // batch 1: on-target values — no drift
      val b1 = Seq(9.0, 11.0, 10.0)
      input.addData(b1.zipWithIndex.map { case (v, i) =>
        EventStream.TypedValue("click", i.toLong, v) })
      q.processAllAvailable()
      val r1 = latest()("click")
      assert(r1._1 === 3L && math.abs(r1._2 - model(b1)) < 1e-12 && !r1._3)
      // batch 2: sustained upward shift — drift accumulates ACROSS batches
      val b2 = Seq(13.0, 14.0, 13.0)
      input.addData(b2.zipWithIndex.map { case (v, i) =>
        EventStream.TypedValue("click", (3 + i).toLong, v) })
      q.processAllAvailable()
      val r2 = latest()("click")
      assert(r2._1 === 6L && math.abs(r2._2 - model(b1 ++ b2)) < 1e-12)
      assert(r2._3, s"sustained +3 shift over 3 events must trip threshold $threshold: $r2")
    } finally q.stop()
  }

  test("streaming Holt-Winters matches the batch last-day row per type " +
    "across a micro-batch boundary (the rotating seasonal state crosses " +
    "the period)") {
    implicit val sqlCtx = spark.sqlContext
    val sf = "/root/testdata/sf0.001"
    // feed each type's daily totals IN DAY ORDER, split mid-stream
    val daily = graft.operators.Stats.qHoltWinters(spark, sf)
      .orderBy(col("event_type"), col("day")).collect()
    val ys = graft.sources.Tables.events(spark, sf)
      .select(col("event_type"), date_format(col("ts"), "yyyy-MM-dd").as("day"),
        col("value").cast("decimal(18,6)").as("v"))
      .groupBy("event_type", "day")
      .agg(sum(col("v")).cast("double").as("y"))
      .orderBy("event_type", "day").collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[String]("day"),
        r.getAs[Double]("y")))
    val input = MemoryStream[EventStream.TypedValue]
    val q = EventStream.runningHoltWinters(input.toDS())
      .writeStream.format("memory").queryName("hw_out")
      .outputMode("update").start()
    try {
      val feed = ys.groupBy(_._1).values.flatMap(
        _.sortBy(_._2).zipWithIndex.map { case ((et, _, y), i) =>
          EventStream.TypedValue(et, i.toLong, y) }).toSeq
      val (b1, b2) = feed.partition(_.seq < 10) // boundary crosses the period
      input.addData(b1); q.processAllAvailable()
      input.addData(b2); q.processAllAvailable()
      val fin = spark.table("hw_out").collect()
        .map(r => (r.getString(0), (r.getLong(1), r.getDouble(2),
          r.getDouble(3), r.getDouble(4))))
        .groupBy(_._1).map { case (k, vs) => k -> vs.maxBy(_._2._1)._2 }
      val lastBatch = daily.groupBy(_.getAs[String]("event_type"))
        .map { case (et, rs) => et -> rs.maxBy(_.getAs[String]("day")) }
      def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
      for ((et, b) <- lastBatch) {
        val m = fin(et)
        assert(r6(m._2) == b.getAs[Double]("level"), s"$et level")
        assert(r6(m._3) == b.getAs[Double]("trend"), s"$et trend")
        assert(r6(m._4) == b.getAs[Double]("seasonal"), s"$et seasonal")
      }
    } finally q.stop()
  }

  test("streaming Holt matches the batch recursion, state carries across batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EventStream.TypedValue]
    val q = EventStream.runningHolt(input.toDS())
      .writeStream.format("memory").queryName("holt_out")
      .outputMode("update").start()
    def latest(): Map[String, (Long, Double, Double)] =
      spark.table("holt_out").collect()
        .map(r => (r.getString(0), (r.getLong(1), r.getDouble(2), r.getDouble(3))))
        .groupBy(_._1).map { case (k, vs) => k -> vs.maxBy(_._2._1)._2 }.toMap
    // the identical recursion as batch qHolt's ordered fold
    def model(xs: Seq[Double]): (Double, Double) = {
      val a = graft.operators.Stats.HoltAlpha
      val b = graft.operators.Stats.HoltBeta
      var l = 0.0; var t = 0.0; var first = true
      xs.foreach { y =>
        if (first) { l = y; t = 0.0; first = false }
        else {
          val nl = a * y + (1 - a) * (l + t)
          t = b * (nl - l) + (1 - b) * t
          l = nl
        }
      }
      (l, t)
    }
    try {
      val b1 = Seq(10.0, 12.0, 14.0)
      input.addData(b1.zipWithIndex.map { case (v, i) =>
        EventStream.TypedValue("click", i.toLong, v) })
      q.processAllAvailable()
      val r1 = latest()("click")
      val m1 = model(b1)
      assert(r1._1 === 3L && math.abs(r1._2 - m1._1) < 1e-12 &&
        math.abs(r1._3 - m1._2) < 1e-12)
      assert(r1._3 > 0.0, "rising series must show positive trend")
      // second batch continues the recursion from carried state
      val b2 = Seq(16.0, 18.0)
      input.addData(b2.zipWithIndex.map { case (v, i) =>
        EventStream.TypedValue("click", (3 + i).toLong, v) })
      q.processAllAvailable()
      val r2 = latest()("click")
      val m2 = model(b1 ++ b2)
      assert(r2._1 === 5L && math.abs(r2._2 - m2._1) < 1e-12 &&
        math.abs(r2._3 - m2._2) < 1e-12)
    } finally q.stop()
  }

  test("streaming as-of matches the native batch operator, state carries across batches") {
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.EventStream.TaggedEvent
    val input = MemoryStream[TaggedEvent]
    val q = EventStream.streamingAsof(input.toDS())
      .writeStream.format("memory").queryName("stream_asof")
      .outputMode("update").start()
    try {
      // batch 1: a view, then a purchase after it; a purchase with no view
      input.addData(
        TaggedEvent(1L, "view", 10L, 100L),
        TaggedEvent(1L, "purchase", 11L, 150L),
        TaggedEvent(2L, "purchase", 20L, 90L))
      q.processAllAvailable()
      // batch 2: purchase matching the view from batch 1 (cross-batch
      // state), then a newer view that must NOT match it retroactively,
      // a same-instant (view, purchase) tie that must match INCLUSIVELY
      // like the batch operator, and a LATE purchase older than the
      // latest view in state, which must match nothing (never a future
      // view)
      input.addData(
        TaggedEvent(1L, "purchase", 12L, 200L),
        TaggedEvent(1L, "view", 13L, 300L),
        TaggedEvent(1L, "purchase", 14L, 350L),
        TaggedEvent(3L, "purchase", 30L, 400L),
        TaggedEvent(3L, "view", 31L, 400L))
      q.processAllAvailable()
      input.addData(TaggedEvent(1L, "purchase", 15L, 250L)) // late arrival
      q.processAllAvailable()
      val got = spark.table("stream_asof")
        .collect().map(r => r.getAs[Long]("event_id") ->
          Option(r.getAs[java.lang.Long]("view_us")).map(_.longValue)).toMap
      assert(got === Map(11L -> Some(100L), 20L -> None,
        12L -> Some(100L), 14L -> Some(300L),
        30L -> Some(400L), // same-instant tie: inclusive, like batch
        15L -> None)) // late purchase: never matches the future view
      // agrees with the native batch as-of on the same data (minus the
      // late arrival, whose match the bounded single-value state cannot
      // recover — documented divergence)
      val all = Seq((1L, 10L, 100L, "view"), (1L, 11L, 150L, "purchase"),
        (2L, 20L, 90L, "purchase"), (1L, 12L, 200L, "purchase"),
        (1L, 13L, 300L, "view"), (1L, 14L, 350L, "purchase"),
        (3L, 30L, 400L, "purchase"), (3L, 31L, 400L, "view"))
      val l = all.filter(_._4 == "purchase").map(e => (e._1, e._2, e._3))
        .toDF("k", "event_id", "t")
      val r = all.filter(_._4 == "view").map(e => (e._1, e._3)).toDF("rk", "rt")
      val batch = graft.operators.Relational.asofJoinNative(l, r, "k", "t", "rk", "rt")
        .collect().map(x => x.getAs[Long]("event_id") ->
          Option(x.getAs[java.lang.Long]("rt")).map(_.longValue)).toMap
      assert(batch === got - 15L)
    } finally q.stop()
  }

  test("streaming chunking: the batch chunker runs unchanged under readStream") {
    // chunksOf is a pure narrow transform (tokenize -> sequence ->
    // posexplode, no shuffle/state), so the SAME function chunks an
    // unbounded stream micro-batch by micro-batch — the streaming
    // ingestion path of a training-data pipeline.
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val docs = input.toDF().toDF("doc_id", "text")
      .withColumn("rtoks", graft.functions.TextFns.rawTokens(col("text")))
    val q = graft.operators.ScaleOps.chunksOf(docs)
      .writeStream.format("memory").queryName("stream_chunks")
      .outputMode("append").start()
    try {
      val longDoc = (1 to 100).map(i => s"tok$i").mkString(" ")
      input.addData((1L, longDoc), (2L, "short doc"))
      q.processAllAvailable()
      val got = spark.table("stream_chunks")
        .select("doc_id", "chunk_id", "chunk_start", "chunk_len", "first_tok")
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getString(4))).toSet
      val batch = graft.operators.ScaleOps.chunksOf(
        Seq((1L, longDoc), (2L, "short doc")).toDF("doc_id", "text")
          .withColumn("rtoks", graft.functions.TextFns.rawTokens(col("text"))))
        .select("doc_id", "chunk_id", "chunk_start", "chunk_len", "first_tok")
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getString(4))).toSet
      assert(got === batch)
      assert(got.exists(_._1 == 1L) && got.exists(_._1 == 2L))
    } finally q.stop()
  }

  test("session_window sessionizes with the same gap rule as the batch twin") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long)]
    val q = EventStream.sessionCounts(
      input.toDF().toDF("ts", "user_id").withColumn("event_id", col("user_id")))
      .writeStream.format("memory").queryName("sess_counts")
      .outputMode("complete").start()
    try {
      input.addData(
        (Timestamp.valueOf("2024-01-01 01:00:00"), 7L),
        (Timestamp.valueOf("2024-01-01 01:10:00"), 7L), // same session (10 min gap)
        (Timestamp.valueOf("2024-01-01 03:00:00"), 7L), // new session (>30 min)
        (Timestamp.valueOf("2024-01-01 01:05:00"), 8L))
      q.processAllAvailable()
      val out = spark.table("sess_counts").collect()
        .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("n_events")))
        .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
      assert(out(7L) === Seq(1L, 2L)) // two sessions: [2 events], [1 event]
      assert(out(8L) === Seq(1L))
      // batch twin: the lag/sum formulation yields the same session count
      val batch = Seq(
        (Timestamp.valueOf("2024-01-01 01:00:00"), 7L, 1L),
        (Timestamp.valueOf("2024-01-01 01:10:00"), 7L, 2L),
        (Timestamp.valueOf("2024-01-01 03:00:00"), 7L, 3L),
        (Timestamp.valueOf("2024-01-01 01:05:00"), 8L, 4L))
        .toDF("ts", "user_id", "event_id")
      batch.createOrReplaceTempView("sess_fixture")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy(col("ts").asc, col("event_id").asc)
      val batchSessions = batch
        .withColumn("prev", lag(col("ts"), 1).over(w))
        .withColumn("new_sess",
          when(col("prev").isNull ||
            unix_timestamp(col("ts")) - unix_timestamp(col("prev")) > 1800, 1L)
            .otherwise(0L))
        .agg(sum("new_sess")).head().getLong(0)
      assert(batchSessions === 3L) // 2 sessions for user 7 + 1 for user 8
    } finally q.stop()
  }

  test("streaming session dashboard: chained session->day rollup matches " +
    "the batch q_session_stats numbers, sessions merging across a " +
    "micro-batch boundary (r16 verdict task 6)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long)]
    val q = EventStream.sessionDashboard(
      input.toDF().toDF("ts", "user_id"))
      .writeStream.format("memory").queryName("sess_dash")
      .outputMode("append").start()
    try {
      // batch 1: user 7 starts a session; user 8 bounces (1 event)
      input.addData(
        (Timestamp.valueOf("2024-01-01 01:00:00"), 7L),
        (Timestamp.valueOf("2024-01-01 01:10:00"), 7L),
        (Timestamp.valueOf("2024-01-01 02:00:00"), 8L))
      q.processAllAvailable()
      // batch 2: user 7's session CONTINUES across the micro-batch
      // boundary (10-min gap from the last batch-1 event) — the session
      // store must merge, not open a second session
      input.addData((Timestamp.valueOf("2024-01-01 01:20:00"), 7L))
      q.processAllAvailable()
      // nothing final yet: the watermark hasn't passed day end + delay
      assert(spark.table("sess_dash").isEmpty)
      // batch 3: a far-future event pushes the watermark past
      // 2024-01-01 24:00 + 1h, closing every day-1 session AND the day-1
      // window; its own day stays open and must NOT emit
      input.addData((Timestamp.valueOf("2024-01-04 12:00:00"), 9L))
      q.processAllAvailable()
      // the watermark computed from batch 3 takes effect in the NEXT
      // micro-batch; one more batch lets it ripple through both stateful
      // operators (session close -> day close)
      input.addData((Timestamp.valueOf("2024-01-04 12:01:00"), 9L))
      q.processAllAvailable()
      val out = spark.table("sess_dash").collect()
        .map(r => (r.getString(0), (r.getLong(1), r.getLong(2),
          r.getDouble(3), r.getDouble(4)))).toMap
      // exactly the batch q_session_stats numbers for the fixture:
      // 2 sessions (user 7 depth 3, user 8 depth 1), 1 bounce,
      // bounce_rate 0.5, avg_depth 2.0 — and only the CLOSED day emits
      assert(out.keySet === Set("2024-01-01"))
      assert(out("2024-01-01") === ((2L, 1L, 0.5, 2.0)))
    } finally q.stop()
  }

  test("stream-stream interval join matches clicks in the preceding 30 min") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[(Timestamp, Long)]
    val purchases = MemoryStream[(Timestamp, Long, Long)]
    val q = EventStream.clicksBeforePurchase(
      clicks.toDF().toDF("ts", "user_id"),
      purchases.toDF().toDF("ts", "user_id", "event_id"))
      .writeStream.format("memory").queryName("ss_join")
      .outputMode("append").start()
    try {
      clicks.addData(
        (Timestamp.valueOf("2024-01-01 10:00:00"), 1L), // 10 min before: match
        (Timestamp.valueOf("2024-01-01 09:30:00"), 1L), // 40 min before: out of range
        (Timestamp.valueOf("2024-01-01 10:05:00"), 2L)) // other user
      purchases.addData((Timestamp.valueOf("2024-01-01 10:10:00"), 1L, 100L))
      q.processAllAvailable()
      val out = spark.table("ss_join").collect()
        .map(r => (r.getAs[Long]("event_id"), r.getAs[Timestamp]("c_ts"))).toSet
      assert(out === Set((100L, Timestamp.valueOf("2024-01-01 10:00:00"))))
    } finally q.stop()
  }

  test("stream-stream LEFT OUTER interval join: unmatched purchases emit " +
    "a null click exactly at watermark expiry, across a micro-batch " +
    "boundary — never eagerly") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[(Timestamp, Long)]
    val purchases = MemoryStream[(Timestamp, Long, Long)]
    val q = EventStream.clicksBeforePurchaseOuter(
      clicks.toDF().toDF("ts", "user_id"),
      purchases.toDF().toDF("ts", "user_id", "event_id"))
      .writeStream.format("memory").queryName("ss_join_outer")
      .outputMode("append").start()
    try {
      def rows() = spark.table("ss_join_outer").collect()
        .map(r => (r.getAs[Long]("event_id"),
          Option(r.getAs[Timestamp]("c_ts")))).toSet
      // batch 1: one matched purchase, one with NO click in its window
      clicks.addData((Timestamp.valueOf("2024-01-01 10:00:00"), 1L))
      purchases.addData(
        (Timestamp.valueOf("2024-01-01 10:10:00"), 1L, 100L), // matched
        (Timestamp.valueOf("2024-01-01 10:20:00"), 2L, 200L)) // no click
      q.processAllAvailable()
      // the INNER result emits immediately; the outer null must NOT:
      // a matching click could still arrive within the watermark horizon
      assert(rows() === Set(
        (100L, Some(Timestamp.valueOf("2024-01-01 10:00:00")))),
        "the unmatched purchase must not emit before its interval expires")
      // batch 2 (a LATER micro-batch): advance BOTH watermarks past
      // 10:20 + 1 h so the engine can prove no click for 200 will come
      clicks.addData((Timestamp.valueOf("2024-01-01 13:00:00"), 9L))
      purchases.addData((Timestamp.valueOf("2024-01-01 13:00:00"), 9L, 900L))
      q.processAllAvailable()
      // state eviction lands in the batch AFTER the watermark advances —
      // nudge one more micro-batch through
      clicks.addData((Timestamp.valueOf("2024-01-01 13:01:00"), 9L))
      purchases.addData((Timestamp.valueOf("2024-01-01 13:01:00"), 9L, 901L))
      q.processAllAvailable()
      val out = rows()
      assert(out.contains((200L, None)),
        "watermark expiry must emit the unmatched purchase with a null click")
      assert(out.contains((100L, Some(Timestamp.valueOf("2024-01-01 10:00:00")))))
      // and the null row is emitted exactly once
      assert(spark.table("ss_join_outer").collect()
        .count(_.getAs[Long]("event_id") == 200L) === 1)
    } finally q.stop()
  }

  test("foreachBatch parquet sink is idempotent under batch replay") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-sink").toString
    val input = MemoryStream[(Long, String)]
    val q = EventStream.toPartitionedParquet(
      input.toDF().toDF("event_id", "event_type"), s"$dir/data", s"$dir/ckpt")
    try {
      input.addData((1L, "click"), (2L, "view"))
      q.processAllAvailable()
      val once = spark.read.parquet(s"$dir/data")
      assert(once.count() === 2)
      val batchId = once.select(col("batch_id").cast("long")).head().getLong(0)
      // simulate a replay of the SAME batch id: dynamic overwrite must
      // replace the partition, not append a duplicate
      import spark.implicits._
      spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
      Seq((1L, "click"), (2L, "view")).toDF("event_id", "event_type")
        .withColumn("batch_id", lit(batchId))
        .write.mode("overwrite").partitionBy("batch_id").parquet(s"$dir/data")
      assert(spark.read.parquet(s"$dir/data").count() === 2)
    } finally q.stop()
  }

  test("flatMapGroupsWithState keeps running per-user totals") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EventStream.UserEvent]
    val q = EventStream.runningUserTotals(input.toDS())
      .writeStream.format("memory").queryName("user_totals")
      .outputMode("update").start()
    try {
      input.addData(EventStream.UserEvent(7L, "click", 2.0),
        EventStream.UserEvent(7L, "view", 3.0))
      q.processAllAvailable()
      input.addData(EventStream.UserEvent(7L, "click", 5.0))
      q.processAllAvailable()
      val rows = spark.table("user_totals").as[EventStream.UserRunning].collect()
      val last = rows.maxBy(_.n_events)
      assert(last === EventStream.UserRunning(7L, 3L, 10.0))
    } finally q.stop()
  }

  test("stateful streaming EWMA matches the batch closed-form twin") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EventStream.UserEvent]
    val q = EventStream.runningUserEwma(input.toDS())
      .writeStream.format("memory").queryName("user_ewma")
      .outputMode("update").start()
    try {
      // two users, values across two micro-batches (state carries over)
      input.addData(EventStream.UserEvent(1L, "a", 10.0),
        EventStream.UserEvent(1L, "a", 20.0), EventStream.UserEvent(2L, "a", 4.0))
      q.processAllAvailable()
      input.addData(EventStream.UserEvent(1L, "a", 40.0),
        EventStream.UserEvent(2L, "a", 8.0))
      q.processAllAvailable()
      val got = spark.table("user_ewma").as[EventStream.UserEwma].collect()
        .groupBy(_.user_id).map { case (u, rs) => u -> rs.maxBy(_.n_events).ewma }
      // batch closed form: e = sum(2^i x_i)/sum(2^i), i = 1..n
      def closed(xs: Seq[Double]): Double = {
        val w = xs.indices.map(i => math.pow(2.0, i + 1))
        xs.zip(w).map { case (x, wi) => x * wi }.sum / w.sum
      }
      assert(math.abs(got(1L) - closed(Seq(10.0, 20.0, 40.0))) < 1e-9)
      assert(math.abs(got(2L) - closed(Seq(4.0, 8.0))) < 1e-9)
    } finally q.stop()
  }

  test("streaming Page-Hinkley matches the batch detector on the same series") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[EventStream.TypedValue]
    val q = EventStream.runningPageHinkley(input.toDS())
      .writeStream.format("memory").queryName("ph_out")
      .outputMode("update").start()
    // stationary warmup+watch in batch 1, a level shift in batch 2
    val series = (1 to 14).map(i => 100.0 + (i % 3)) ++ (15 to 30).map(_ => 220.0)
    def latest(): EventStream.PhOut =
      spark.table("ph_out").as[EventStream.PhOut].collect().maxBy(_.n)
    try {
      input.addData(series.take(14).zipWithIndex.map { case (v, i) =>
        EventStream.TypedValue("view", i.toLong, v) })
      q.processAllAvailable()
      val mid = latest()
      assert(mid.n === 14L && !mid.alarm, "stationary prefix stays quiet")
      input.addData(series.drop(14).zipWithIndex.map { case (v, i) =>
        EventStream.TypedValue("view", (14 + i).toLong, v) })
      q.processAllAvailable()
      val fin = latest()
      assert(fin.n === 30L)
      assert(fin.alarm, "the 2.2x level shift must alarm across batches")
      // the batch twin on the identical series agrees on the final state
      val daily = series.zipWithIndex.map { case (v, i) =>
        ("view", f"2024-03-${i + 1}%02d", BigDecimal(v)) }
        .toDF("event_type", "day", "tot")
        .select(col("event_type"), col("day"),
          col("tot").cast("decimal(18,6)").as("tot"))
      val batch = graft.operators.Inference.pageHinkleyOf(daily)
        .orderBy(col("day").desc).collect().head
      assert(math.abs(batch.getAs[Double]("ph") - fin.ph) < 1e-6,
        s"stream ph ${fin.ph} == batch ph ${batch.getAs[Double]("ph")}")
      assert(batch.getAs[Boolean]("alarm") === fin.alarm)
    } finally q.stop()
  }

  test("streaming SPRT walks the batch LLR identity and decides across batches") {
    implicit val sqlCtx = spark.sqlContext
    val inf = graft.operators.Inference
    val input = MemoryStream[EventStream.BernoulliObs]
    val q = EventStream.runningSprt(input.toDS())
      .writeStream.format("memory").queryName("sprt_out")
      .outputMode("update").start()
    def latest(): Map[String, EventStream.SprtOut] =
      spark.table("sprt_out").as[EventStream.SprtOut].collect()
        .groupBy(_.key).map { case (k, rs) => k -> rs.maxBy(_.n) }
    try {
      // batch 1: a balanced run — no decision yet
      input.addData((0 until 40).map(i =>
        EventStream.BernoulliObs("exp", i.toLong, i % 2 == 0)))
      q.processAllAvailable()
      val r1 = latest()("exp")
      assert(r1.n === 40L && r1.k === 20L)
      assert(math.abs(r1.llr - (20 * inf.sprtL1 + 20 * inf.sprtL0)) < 1e-12,
        "identical constants to the batch qSprt")
      assert(r1.decision === "continue")
      // batch 2: a long favorable streak — state accumulates ACROSS
      // batches until the H1 boundary is crossed
      input.addData((40 until 2500).map(i =>
        EventStream.BernoulliObs("exp", i.toLong, i % 20 != 0)))
      q.processAllAvailable()
      val r2 = latest()("exp")
      assert(r2.n === 2500L)
      assert(r2.llr >= inf.sprtUpper, s"95% successes must cross Wald's upper bound: $r2")
      assert(r2.decision === "accept_h1")
    } finally q.stop()
  }

  test("streaming space-saving top-k: hand-traced evictions, bounds hold across batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EventStream.TypedUser]
    val q = EventStream.runningTopK(input.toDS())
      .writeStream.format("memory").queryName("topk_out")
      .outputMode("update").start()
    def latest(): Map[Long, (Long, Long, Long)] = {
      val rows = spark.table("topk_out").collect()
        .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      val maxN = rows.map(_._4).max
      rows.filter(_._4 == maxN).map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    }
    try {
      // batch 1: 1×3, 2×2, 3..8 fill the m=8 slots, 9 evicts the
      // (est=1, smallest-id) victim id 3 → 9 carries (2, 1); n = 12
      input.addData(Seq(1L, 1L, 1L, 2L, 2L, 3L, 4L, 5L, 6L, 7L, 8L, 9L)
        .map(EventStream.TypedUser("click", _)))
      q.processAllAvailable()
      val r1 = latest()
      assert(r1.size == EventStream.TopKCapacity)
      assert(r1(1L) == ((3L, 0L, 12L)))
      assert(r1(9L) == ((2L, 1L, 12L)), "space-saving adoption est+err")
      assert(!r1.contains(3L), "deterministic min-est smallest-id eviction")
      // batch 2 (state persists): 9×2 → 4, 1 → 4, 10 evicts id 4 → (2,1); n = 16
      input.addData(Seq(9L, 9L, 1L, 10L).map(EventStream.TypedUser("click", _)))
      q.processAllAvailable()
      val r2 = latest()
      assert(r2(1L)._1 == 4L && r2(9L) == ((4L, 1L, 16L)))
      assert(r2(10L) == ((2L, 1L, 16L)) && !r2.contains(4L))
      // the space-saving contract on every survivor: est−err ≤ true ≤ est
      val truth = Map(1L -> 4L, 2L -> 2L, 5L -> 1L, 6L -> 1L, 7L -> 1L,
        8L -> 1L, 9L -> 3L, 10L -> 1L)
      r2.foreach { case (id, (est, err, _)) =>
        assert(est - err <= truth(id) && truth(id) <= est, s"bounds broken for $id")
      }
    } finally q.stop()
  }

  test("streaming bitmap distinct matches exact counts, dedups across batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EventStream.TypedUser]
    val q = EventStream.runningDistinct(input.toDS())
      .writeStream.format("memory").queryName("distinct_out")
      .outputMode("update").start()
    def latest(): Map[String, Long] =
      spark.table("distinct_out").collect()
        .map(r => r.getString(0) -> r.getLong(1))
        .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).max }.toMap
    try {
      input.addData(Seq(1L, 2L, 2L, 3L).map(EventStream.TypedUser("click", _)) ++
        Seq(7L).map(EventStream.TypedUser("view", _)))
      q.processAllAvailable()
      val r1 = latest()
      assert(r1("click") === 3L && r1("view") === 1L)
      // batch 2: overlap with batch 1 must NOT recount; new ids must
      input.addData(Seq(2L, 3L, 4L, 4L, 5L).map(EventStream.TypedUser("click", _)))
      q.processAllAvailable()
      assert(latest()("click") === 5L, "bitmap state must dedup across batches")
    } finally q.stop()
  }

  test("streaming seasonal monitor: prequential fold, final weekday rows match batch") {
    implicit val sqlCtx = spark.sqlContext
    // daily (type, day, y) totals from the real corpus, exact decimal
    val daily = graft.sources.Tables.events(spark, sfDir)
      .select(col("event_type"), date_format(col("ts"), "yyyy-MM-dd").as("day"),
        col("value").cast("decimal(18,6)").as("v"))
      .groupBy("event_type", "day").agg(sum(col("v")).as("y"))
      .orderBy("event_type", "day").collect()
      .map(r => EventStream.TypedDaily(r.getString(0), r.getString(1),
        scala.math.BigDecimal(r.getDecimal(2))))
    val (b1, b2) = daily.splitAt(daily.length / 2)
    val input = MemoryStream[EventStream.TypedDaily]
    val q = EventStream.runningSeasonal(input.toDS())
      .writeStream.format("memory").queryName("season_out")
      .outputMode("update").start()
    try {
      input.addData(b1.toSeq); q.processAllAvailable()
      input.addData(b2.toSeq); q.processAllAvailable()
      val stream = spark.table("season_out").collect()
        .map(r => (r.getString(0), r.getString(1)) ->
          ((r.getInt(2), r.getLong(3), r.getDouble(4), r.getBoolean(5)))).toMap
      // 1) full trajectory equals a local prequential fold
      val hist = scala.collection.mutable.Map.empty[(String, Int), (Long, BigDecimal)]
      daily.foreach { d =>
        val wd = java.time.LocalDate.parse(d.day).getDayOfWeek.getValue % 7
        val (n0, s0) = hist.getOrElse((d.event_type, wd), (0L, BigDecimal(0)))
        val (n, s) = (n0 + 1, s0 + d.y)
        hist((d.event_type, wd)) = (n, s)
        val resid = d.y * n - s
        val expResid = java.math.BigDecimal.valueOf(resid.toDouble / n)
          .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
        val got = stream((d.event_type, d.day))
        assert(got._1 === wd && got._2 === n)
        assert(got._3 === expResid, s"residual diverged at ${d.event_type}/${d.day}")
        assert(got._4 === (resid.abs * graft.operators.Stats.SeasonalFlagFrac > s))
      }
      // 2) for every (type, weekday) the LAST day saw the complete
      //    weekday history -> its verdict is value-identical to batch
      val batch = graft.operators.Stats.qSeasonal(spark, sfDir).collect()
        .map(r => (r.getString(0), r.getString(1)) ->
          ((r.getInt(2), r.getDouble(3), r.getBoolean(4)))).toMap
      val lastDays = daily.groupBy { d =>
        (d.event_type, java.time.LocalDate.parse(d.day).getDayOfWeek.getValue % 7)
      }.map { case (_, ds) => ds.maxBy(_.day) }
      assert(lastDays.nonEmpty)
      lastDays.foreach { d =>
        val (swd, _, sres, sflag) = stream((d.event_type, d.day))
        val (bwd, bres, bflag) = batch((d.event_type, d.day))
        assert(swd === bwd && sres === bres && sflag === bflag,
          s"final-weekday verdict diverged from batch at ${d.event_type}/${d.day}")
      }
    } finally q.stop()
  }

  test("streaming SLO burn matches the batch two-window rule on the real corpus") {
    implicit val sqlCtx = spark.sqlContext
    // the batch twin's full trajectory over the events table…
    val batch = graft.operators.Stats.qSloBurn(spark, sfDir).collect()
      .map(r => r.getAs[String]("day") ->
        ((r.getAs[Long]("n_s"), r.getAs[Long]("e_s"), r.getAs[Long]("n_l"),
          r.getAs[Long]("e_l"), r.getAs[Double]("burn_short"),
          r.getAs[Double]("burn_long"), r.getAs[Boolean]("page")))).toMap
    assert(batch.nonEmpty)
    // …and the same daily aggregates fed through the stateful monitor,
    // split across two micro-batches to prove the window carries over
    val daily = graft.sources.Tables.events(spark, sfDir)
      .select(date_format(col("ts"), "yyyy-MM-dd").as("day"),
        (col("event_type") === "error").cast("long").as("is_err"))
      .groupBy("day")
      .agg(count(lit(1)).as("n"), sum(col("is_err")).as("err"))
      .orderBy("day").collect()
      .map(r => EventStream.DailyErr("svc", r.getString(0), r.getLong(1), r.getLong(2)))
    val (b1, b2) = daily.splitAt(daily.length / 2)
    val input = MemoryStream[EventStream.DailyErr]
    val q = EventStream.runningSloBurn(input.toDS())
      .writeStream.format("memory").queryName("slo_out")
      .outputMode("update").start()
    try {
      input.addData(b1.toSeq); q.processAllAvailable()
      input.addData(b2.toSeq); q.processAllAvailable()
      val stream = spark.table("slo_out").collect()
        .map(r => r.getAs[String]("day") ->
          ((r.getAs[Long]("n_s"), r.getAs[Long]("e_s"), r.getAs[Long]("n_l"),
            r.getAs[Long]("e_l"), r.getAs[Double]("burn_short"),
            r.getAs[Double]("burn_long"), r.getAs[Boolean]("page")))).toMap
      assert(stream.keySet === batch.keySet)
      stream.foreach { case (day, row) =>
        assert(row === batch(day), s"day $day diverged from the batch twin")
      }
      // the mid-stream boundary day must window over batch-1 days
      if (b2.nonEmpty && b1.length >= graft.operators.Stats.SloLongDays) {
        val firstB2 = b2.head.day
        assert(stream(firstB2)._3 > stream(firstB2)._1 ||
          graft.operators.Stats.SloLongDays == graft.operators.Stats.SloShortDays,
          "long window on the first batch-2 day must include batch-1 days")
      }
    } finally q.stop()
  }

  test("streaming runs monitor walks the identical direction recursion as " +
    "the batch runs test, across batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EventStream.TypedValue]
    val q = EventStream.runningRuns(input.toDS())
      .writeStream.format("memory").queryName("runs_out")
      .outputMode("update").start()
    def latest(): Map[String, (Long, Long, Long, Long, Option[Double], Option[Boolean])] =
      spark.table("runs_out").collect()
        .map(r => (r.getString(0), (r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4),
          if (r.isNullAt(5)) None else Some(r.getDouble(5)),
          if (r.isNullAt(6)) None else Some(r.getBoolean(6)))))
        .groupBy(_._1).map { case (k, vs) => k -> vs.maxBy(_._2._1)._2 }.toMap
    try {
      // batch 1: strictly increasing -> one-sided, z undefined
      input.addData((1 to 5).map(i =>
        EventStream.TypedValue("m", i.toLong, i.toDouble)))
      q.processAllAvailable()
      val r1 = latest()("m")
      assert(r1._1 == 4L && r1._2 == 4L && r1._3 == 0L && r1._4 == 1L)
      assert(r1._5.isEmpty && r1._6.isEmpty)
      // batch 2: oscillation resumes ACROSS the batch boundary (6th value
      // continues from 5.0) -- total n = 20 with 10 up / 10 down as in the
      // batch fixture model
      input.addData((6 to 21).map(i => EventStream.TypedValue("m", i.toLong,
        if (i % 2 == 0) 0.0 else 30.0)))
      q.processAllAvailable()
      val r2 = latest()("m")
      // recompute with a plain local fold over the full value sequence
      val xs = (1 to 5).map(_.toDouble) ++
        (6 to 21).map(i => if (i % 2 == 0) 0.0 else 30.0)
      var n = 0L; var n1 = 0L; var runs = 0L; var prev = xs.head; var ps = 0
      xs.tail.foreach { x =>
        if (x != prev) {
          val s = if (x > prev) 1 else -1
          n += 1; if (s == 1) n1 += 1
          if (ps == 0 || s != ps) runs += 1
          ps = s
        }
        prev = x
      }
      assert(r2._1 == n && r2._2 == n1 && r2._4 == runs)
      val n2 = n - n1
      val p = 2.0 * n1 * n2
      val e = p / n + 1.0
      val v = p * (p - n) / (n.toDouble * n * (n - 1))
      assert(math.abs(r2._5.get - (runs - e) / math.sqrt(v)) < 1e-12)
      assert(r2._6.get, "sustained oscillation must trip the two-sided gate")
    } finally q.stop()
  }

  test("streaming Ljung-Box monitor matches the batch portmanteau across " +
    "a batch boundary, and stays None below the lag depth") {
    implicit val sqlCtx = spark.sqlContext
    val h = graft.operators.Stats.LjungBoxLags
    // a weekly-ish cycle + noise so Q is large and well-conditioned
    val xs = (1 to 21).map(i => 100.0 + 40.0 * (i % 7) + (i % 3))
    val input = MemoryStream[EventStream.TypedValue]
    val q = EventStream.runningLjungBox(input.toDS())
      .writeStream.format("memory").queryName("lb_out")
      .outputMode("update").start()
    def latest(): (Long, Option[Double], Option[Boolean]) =
      spark.table("lb_out").collect()
        .map(r => (r.getLong(1),
          if (r.isNullAt(2)) None else Some(r.getDouble(2)),
          if (r.isNullAt(3)) None else Some(r.getBoolean(3))))
        .maxBy(_._1)
    try {
      // batch 1: only h values -> n <= h, Q undefined
      input.addData(xs.take(h).zipWithIndex.map { case (x, i) =>
        EventStream.TypedValue("m", i.toLong, x) })
      q.processAllAvailable()
      val r1 = latest()
      assert(r1._1 == h.toLong && r1._2.isEmpty && r1._3.isEmpty)
      // batch 2: the rest -> compare against the batch twin on the SAME
      // series (as daily totals with day = zero-padded seq so the window
      // order matches insertion order)
      input.addData(xs.drop(h).zipWithIndex.map { case (x, i) =>
        EventStream.TypedValue("m", (h + i).toLong, x) })
      q.processAllAvailable()
      val r2 = latest()
      assert(r2._1 == xs.size.toLong)
      val daily = xs.zipWithIndex.map { case (x, i) =>
        ("m", f"2024-$i%04d", BigDecimal(x)) }
        .toDF("event_type", "day", "tot")
        .select(col("event_type"), col("day"),
          col("tot").cast("decimal(18,6)").as("tot"))
      val b = graft.operators.Stats.ljungBoxOf(daily).collect()(0)
      assert(!b.isNullAt(b.fieldIndex("q_lb")))
      val batchQ = b.getAs[Double]("q_lb")
      assert(math.abs(r2._2.get - batchQ) < 1e-4,
        s"stream ${r2._2.get} vs batch $batchQ")
      assert(r2._3.get == b.getAs[Boolean]("significant"))
    } finally q.stop()
  }

  test("streaming GK trimmed-mean monitor: cuts within the rank error " +
    "band, trimmed mean inside the cuts and near the exact value, " +
    "across batches") {
    implicit val sqlCtx = spark.sqlContext
    // deterministic shuffled-ish values 1..500 (content-keyed, no RNG)
    val xs = (1 to 500).map(i => ((i * 137) % 500 + 1).toDouble)
    val input = MemoryStream[EventStream.TypedValue]
    val q = EventStream.runningTrimmedMean(input.toDS())
      .writeStream.format("memory").queryName("trim_out")
      .outputMode("update").start()
    def latest(): (Long, Double, Double, Double) =
      spark.table("trim_out").collect()
        .map(r => (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
        .maxBy(_._1)
    try {
      input.addData(xs.take(200).zipWithIndex.map { case (x, i) =>
        EventStream.TypedValue("m", i.toLong, x) })
      q.processAllAvailable()
      input.addData(xs.drop(200).zipWithIndex.map { case (x, i) =>
        EventStream.TypedValue("m", (200 + i).toLong, x) })
      q.processAllAvailable()
      val (n, lo, hi, tm) = latest()
      assert(n == 500L)
      val sorted = xs.sorted
      def rankOf(v: Double): Int = sorted.count(_ <= v)
      val slack = EventStream.GkEps * n + 2
      assert(math.abs(rankOf(lo) - 0.1 * n) <= slack,
        s"lo=$lo rank=${rankOf(lo)} target=${0.1 * n}")
      assert(math.abs(rankOf(hi) - 0.9 * n) <= slack,
        s"hi=$hi rank=${rankOf(hi)} target=${0.9 * n}")
      assert(tm >= lo && tm <= hi)
      // values are 1..500 uniform -> exact 10% trimmed mean is 250.5;
      // the sketch integral must land within the rank-error-scaled band
      val exact = sorted.slice(50, 450).sum / 400
      assert(math.abs(tm - exact) <= 0.05 * exact,
        s"tm=$tm exact=$exact")
    } finally q.stop()
  }

  test("streaming histogram-drift monitor: matched traffic scores ~0 PSI, " +
    "a shifted batch trips the 0.2 alarm, BC tracks the overlap") {
    implicit val sqlCtx = spark.sqlContext
    // baseline: 100 values uniform over buckets 0..3
    val baseline = Map("m" -> Seq(25L, 25L, 25L, 25L, 0L, 0L, 0L, 0L, 0L, 0L))
    val input = MemoryStream[EventStream.TypedValue]
    val q = EventStream.runningPsi(input.toDS(), baseline)
      .writeStream.format("memory").queryName("psi_out")
      .outputMode("update").start()
    def latest(): (Long, Double, Double, Boolean) =
      spark.table("psi_out").collect()
        .map(r => (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getBoolean(4)))
        .maxBy(_._1)
    def expected(live: Seq[Long]): (Double, Double) = {
      val base = baseline("m")
      val (ta, tb) = (base.sum, live.sum)
      val terms = (0 until 10).map { i =>
        val pa = (base(i) + 1).toDouble / (ta + 10)
        val pb = (live(i) + 1).toDouble / (tb + 10)
        ((pb - pa) * math.log(pb / pa), math.sqrt(pa * pb))
      }
      (terms.map(_._1).sum, terms.map(_._2).sum)
    }
    try {
      // batch 1: same distribution as the baseline -> psi ~ 0, no alarm
      val match1 = (0 until 100).map(i =>
        EventStream.TypedValue("m", i.toLong, (i % 4) * 50.0 + 10.0))
      input.addData(match1)
      q.processAllAvailable()
      val r1 = latest()
      val (e1psi, e1bc) = expected(Seq(25L, 25L, 25L, 25L, 0L, 0L, 0L, 0L, 0L, 0L))
      assert(r1._1 == 100L && math.abs(r1._2 - e1psi) < 1e-12 && !r1._4)
      assert(math.abs(r1._3 - e1bc) < 1e-12)
      // batch 2: mass moves to buckets 8-9 -> the CUMULATIVE histogram
      // drifts -> alarm
      input.addData((0 until 200).map(i =>
        EventStream.TypedValue("m", (100 + i).toLong, 430.0 + (i % 2) * 50.0)))
      q.processAllAvailable()
      val r2 = latest()
      val (e2psi, e2bc) = expected(Seq(25L, 25L, 25L, 25L, 0L, 0L, 0L, 0L, 100L, 100L))
      assert(r2._1 == 300L && math.abs(r2._2 - e2psi) < 1e-12)
      assert(math.abs(r2._3 - e2bc) < 1e-12)
      assert(r2._4, s"shifted traffic must trip the alarm, psi=${r2._2}")
      // negative values are DROPPED (r16 ADVICE): the batch twins densify
      // a 0..9 grid, so a negative-bucket row contributes to neither the
      // histogram nor the total — the running scores must not move
      input.addData((0 until 5).map(i =>
        EventStream.TypedValue("m", (300 + i).toLong, -75.0 - i)))
      q.processAllAvailable()
      val r3 = latest()
      assert(r3._1 == 300L, s"negative values must not count, n=${r3._1}")
      assert(math.abs(r3._2 - e2psi) < 1e-12 && math.abs(r3._3 - e2bc) < 1e-12)
      // a key with no baseline emits nothing
      input.addData(Seq(EventStream.TypedValue("unknown", 1L, 10.0)))
      q.processAllAvailable()
      assert(!spark.table("psi_out").collect()
        .exists(_.getString(0) == "unknown"))
    } finally q.stop()
  }

  test("streaming KMV distinct monitor: exact while unsaturated, " +
    "duplicate-idempotent, saturated estimate matches the independent " +
    "recomputation (r16: the q_kmv_intersect stateful twin)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EventStream.TypedUser]
    val q = EventStream.runningKmvDistinct(input.toDS())
      .writeStream.format("memory").queryName("kmv_out")
      .outputMode("update").start()
    def latest(): (Long, Int, Double, Boolean) =
      spark.table("kmv_out").collect()
        .map(r => (r.getLong(1), r.getInt(2), r.getDouble(3), r.getBoolean(4)))
        .maxBy(_._1)
    def hash48(u: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val h = md.digest(s"u:$u".getBytes("UTF-8"))
      ((h(0) & 0xffL) << 40) | ((h(1) & 0xffL) << 32) |
        ((h(2) & 0xffL) << 24) | ((h(3) & 0xffL) << 16) |
        ((h(4) & 0xffL) << 8) | (h(5) & 0xffL)
    }
    try {
      input.addData((1L to 10L).map(u => EventStream.TypedUser("m", u)))
      q.processAllAvailable()
      val r1 = latest()
      assert(r1 == ((10L, 10, 10.0, false)), s"unsaturated must be exact: $r1")
      // duplicates are free: the sketch is a SET of hashes
      input.addData((1L to 10L).map(u => EventStream.TypedUser("m", u)))
      q.processAllAvailable()
      val r2 = latest()
      assert(r2 == ((20L, 10, 10.0, false)), s"duplicates must not move it: $r2")
      // saturate with 200 distinct keys; the estimate is deterministic
      input.addData((11L to 200L).map(u => EventStream.TypedUser("m", u)))
      q.processAllAvailable()
      val r3 = latest()
      val k = graft.operators.ScaleOps.KmvK
      val hk = (1L to 200L).map(hash48).sorted.apply(k - 1)
      val expected = (k - 1).toDouble * 281474976710656.0 / hk
      assert(r3._2 == k && r3._4)
      assert(r3._3 == expected, s"est ${r3._3} vs recomputed $expected")
      // the deterministic estimator should land near the truth too
      assert(math.abs(r3._3 - 200) <= 3.0 * 200 / math.sqrt((k - 2).toDouble),
        s"est ${r3._3} outside the 3-sigma KMV envelope around 200")
    } finally q.stop()
  }

  test("streaming F2 monitor: uniform keys stay quiet, a hot-key burst " +
    "trips the salting alarm; estimate never underestimates") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EventStream.TypedUser]
    val q = EventStream.runningF2(input.toDS())
      .writeStream.format("memory").queryName("f2_out")
      .outputMode("update").start()
    def latest(): (Long, Double, Double, Boolean) =
      spark.table("f2_out").collect()
        .map(r => (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getBoolean(4)))
        .maxBy(_._1)
    try {
      // batch 1: 256 distinct users once each -> exact F2 = 256, near
      // the uniform floor
      input.addData((0 until 256).map(u =>
        EventStream.TypedUser("users", u.toLong)))
      q.processAllAvailable()
      val r1 = latest()
      assert(r1._1 == 256L && r1._2 >= 256.0 && !r1._4,
        s"uniform keys must not alarm: $r1")
      // batch 2: one user floods 744 rows -> exact F2 = 256 + 744^2 =
      // 553792, ratio ~141x the uniform floor -> alarm
      input.addData((0 until 744).map(_ =>
        EventStream.TypedUser("users", 999L)))
      q.processAllAvailable()
      val r2 = latest()
      assert(r2._1 == 1000L)
      assert(r2._2 >= 553792.0, s"CMS F2 must not underestimate: ${r2._2}")
      assert(r2._4, s"hot key must trip the salting alarm: $r2")
    } finally q.stop()
  }

  test("streaming funnel advances strictly in step order across batches " +
    "and matches the batch K-step funnel's per-user stages") {
    implicit val sqlCtx = spark.sqlContext
    val H = 3600L * 1000000L
    val input = MemoryStream[EventStream.FunnelEvent]
    val q = EventStream.runningFunnel(input.toDS())
      .writeStream.format("memory").queryName("funnel_out")
      .outputMode("update").start()
    def latest(): Map[Long, (Int, Long)] =
      spark.table("funnel_out").collect()
        .map(r => (r.getLong(0), (r.getInt(1), r.getLong(2))))
        .groupBy(_._1).map { case (u, vs) => u -> vs.maxBy(_._2._1)._2 }
    try {
      // batch 1: user 1 views+clicks; user 2 purchases FIRST (must not
      // advance - strict order), then views; user 3 nothing qualifying
      input.addData(Seq(
        EventStream.FunnelEvent(1L, "view", H),
        EventStream.FunnelEvent(1L, "click", 2 * H),
        EventStream.FunnelEvent(2L, "purchase", H),
        EventStream.FunnelEvent(2L, "view", 2 * H),
        EventStream.FunnelEvent(3L, "error", H)))
      q.processAllAvailable()
      val r1 = latest()
      assert(r1(1L) == ((2, 2 * H)) && r1(2L) == ((1, 2 * H)))
      assert(!r1.contains(3L), "non-step events must not open a funnel")
      // batch 2: user 1 purchases inside the window -> step 3 (the state
      // carries across the boundary); user 2 clicks PAST the 7-day window
      // -> stays at step 1
      input.addData(Seq(
        EventStream.FunnelEvent(1L, "purchase", 3 * H),
        EventStream.FunnelEvent(2L, "click",
          2 * H + EventStream.FunnelWindowUs + 1L)))
      q.processAllAvailable()
      val r2 = latest()
      assert(r2(1L) == ((3, 3 * H)), "cross-batch advance to step 3")
      assert(r2(2L) == ((1, 2 * H)), "late click must not advance")
    } finally q.stop()
  }

  /** Shared r17 fixture (both monitor twins + their batch queries read
    * it): three users across two days, one session straddling a
    * micro-batch boundary, one user active on both days. Written as a
    * real events.parquet so the BATCH twins run against it verbatim. */
  private def writeR17Fixture(): (String, Seq[(Timestamp, Long, Long)]) = {
    val rows = Seq(
      // day 1: user 1 has one session (2 events, the 2nd arrives in
      // micro-batch 2 within the 30-min gap), user 2 overlaps it
      (Timestamp.valueOf("2024-03-01 10:00:00"), 1L, 100L),
      (Timestamp.valueOf("2024-03-01 10:05:00"), 2L, 101L),
      (Timestamp.valueOf("2024-03-01 10:20:00"), 1L, 102L),
      // day 1 later: user 2 again, a SECOND session (gap > 30 min),
      // non-overlapping — day-1 peak stays 2
      (Timestamp.valueOf("2024-03-01 15:00:00"), 2L, 103L),
      // day 2: user 1 returns (session 09:00–09:15), user 3 is new
      // (single-event point session at 09:10 INSIDE user 1's) → peak 2
      (Timestamp.valueOf("2024-03-02 09:00:00"), 1L, 104L),
      (Timestamp.valueOf("2024-03-02 09:10:00"), 3L, 105L),
      (Timestamp.valueOf("2024-03-02 09:15:00"), 1L, 106L))
    val dir = java.nio.file.Files.createTempDirectory("r17fix").toString
    rows.toDF("ts", "user_id", "event_id")
      .withColumn("event_type", lit("view")).withColumn("value", lit(1.0))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    (dir, rows)
  }

  test("streaming new-vs-returning monitor: per-day rollup of the emitted " +
    "classifications equals the batch q_new_vs_returning twin across a " +
    "micro-batch boundary (r16 verdict task 5)") {
    val (dir, rows) = writeR17Fixture()
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EventStream.DayUser]
    val q = EventStream.runningNewVsReturning(input.toDS())
      .writeStream.format("memory").queryName("nvr_out")
      .outputMode("update").start()
    def day(t: Timestamp) = t.toString.substring(0, 10)
    try {
      val (b1, b2) = rows.splitAt(3)
      input.addData(b1.map(r => EventStream.DayUser(r._2, day(r._1))))
      q.processAllAvailable()
      input.addData(b2.map(r => EventStream.DayUser(r._2, day(r._1))))
      q.processAllAvailable()
      val emitted = spark.table("nvr_out").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getBoolean(2)))
      // exactly-once per (user, day): user 1's second day-1 event and
      // user 2's second day-1 session must not re-emit
      assert(emitted.length == emitted.distinct.length &&
        emitted.length == 4, s"expected 4 distinct emissions, got ${emitted.toSeq}")
      val rollup = emitted.groupBy(_._1).map { case (d, es) =>
        d -> (es.length.toLong, es.count(_._3).toLong)
      }
      val batch = graft.operators.Relational.qNewVsReturning(spark, dir)
        .collect()
        .map(r => r.getAs[String]("day") ->
          (r.getAs[Long]("n_active"), r.getAs[Long]("n_new"))).toMap
      assert(rollup == batch,
        s"monitor rollup $rollup != batch twin $batch")
      assert(batch("2024-03-02") == ((2L, 1L)), "user 1 must be returning on day 2")
    } finally {
      q.stop()
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    }
  }

  test("streaming SRM feed: exactly-once arm emissions roll up to the " +
    "batch q_srm row across a micro-batch boundary") {
    implicit val sqlCtx = spark.sqlContext
    val sf = "/root/testdata/sf0.001"
    val users = graft.sources.Tables.events(spark, sf)
      .select("user_id").collect().map(_.getLong(0)) // with duplicates
    val input = MemoryStream[java.lang.Long]
    val q = EventStream.runningSrmFeed(input.toDS())
      .writeStream.format("memory").queryName("srm_out")
      .outputMode("update").start()
    try {
      val (b1, b2) = users.splitAt(users.length / 2)
      input.addData(b1.map(java.lang.Long.valueOf).toSeq); q.processAllAvailable()
      input.addData(b2.map(java.lang.Long.valueOf).toSeq); q.processAllAvailable()
      val emitted = spark.table("srm_out").collect()
        .map(r => (r.getAs[Long]("user_id"), r.getAs[Boolean]("treat")))
      assert(emitted.length == emitted.map(_._1).distinct.length,
        "exactly-once per user (duplicates within AND across batches)")
      val na = emitted.count(_._2).toLong
      val nb = emitted.length - na
      val chi = (na - nb).toDouble * (na - nb).toDouble / (na + nb).toDouble
      val batch = graft.operators.Stats.qSrm(spark, sf).collect()(0)
      assert(na == batch.getAs[Long]("n_a") && nb == batch.getAs[Long]("n_b"),
        s"arms ($na, $nb) != batch")
      assert(math.abs(chi - batch.getAs[Double]("chi2")) < 1e-6)
    } finally q.stop()
  }

  test("streaming growth-accounting monitor: per-day rollup (with derived " +
    "churn) equals the batch panel across a micro-batch boundary") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("r17ga").toString
    def ts(d: Int) = java.sql.Timestamp.valueOf(f"2024-01-$d%02d 08:00:00")
    // same shape as the batch fixture: u1 d1,d2,d4; u2 d2; u3 d1
    val rows = Seq((1L, ts(1), 1L), (2L, ts(2), 1L), (3L, ts(4), 1L),
      (4L, ts(2), 2L), (5L, ts(1), 3L))
    val input = MemoryStream[EventStream.DayUser]
    val q = EventStream.runningGrowthAccounting(input.toDS())
      .writeStream.format("memory").queryName("ga_out")
      .outputMode("update").start()
    try {
      rows.map { case (id, t, u) => (id, t, u, "view", 1.0, "{}") }
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
      def day(t: java.sql.Timestamp) = t.toString.substring(0, 10)
      val ordered = rows.sortBy(_._2.getTime)
      val (b1, b2) = ordered.splitAt(2)
      input.addData(b1.map(r => EventStream.DayUser(r._3, day(r._2))))
      q.processAllAvailable()
      input.addData(b2.map(r => EventStream.DayUser(r._3, day(r._2))))
      q.processAllAvailable()
      val emitted = spark.table("ga_out").collect()
        .map(r => (r.getAs[String]("day"), r.getAs[Long]("user_id"),
          r.getAs[String]("cls")))
      assert(emitted.length == emitted.distinct.length, "exactly-once per (user, day)")
      val rollup = emitted.groupBy(_._1).map { case (d, es) =>
        d -> ((es.length.toLong, es.count(_._3 == "new").toLong,
          es.count(_._3 == "retained").toLong,
          es.count(_._3 == "resurrected").toLong))
      }
      val batch = graft.operators.Relational.qGrowthAccounting(spark, dir)
        .collect()
        .map(r => r.getAs[String]("day") -> ((r.getAs[Long]("dau"),
          r.getAs[Long]("n_new"), r.getAs[Long]("n_retained"),
          r.getAs[Long]("n_resurrected")))).toMap
      assert(rollup == batch, s"monitor rollup $rollup != batch $batch")
    } finally {
      q.stop()
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    }
  }

  test("streaming path monitor: trigram rollup equals the batch q_paths " +
    "counts across a micro-batch boundary, sessions never stitched") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("r17paths").toString
    def ts(h: Int, m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    val rows = Seq(
      (1L, ts(8, 0), 1L, "view"), (2L, ts(8, 5), 1L, "click"),
      (3L, ts(8, 10), 1L, "purchase"), (4L, ts(8, 15), 1L, "view"),
      (5L, ts(10, 0), 1L, "view"), (6L, ts(10, 5), 1L, "view"),
      (7L, ts(10, 10), 1L, "click"),
      (8L, ts(9, 0), 2L, "click"), (9L, ts(9, 5), 2L, "view"))
    val input = MemoryStream[EventStream.PathEvent]
    val q = EventStream.runningPaths(input.toDS())
      .writeStream.format("memory").queryName("paths_out")
      .outputMode("update").start()
    try {
      rows.map { case (id, t, u, e) => (id, t, u, e, 1.0, "{}") }
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
      def ev(r: (Long, java.sql.Timestamp, Long, String)) =
        EventStream.PathEvent(r._3, r._4, r._2.getTime * 1000L)
      // split MID-SESSION (after the 2nd event of user 1's first session)
      val ordered = rows.sortBy(_._2.getTime)
      val (b1, b2) = ordered.splitAt(3)
      input.addData(b1.map(ev)); q.processAllAvailable()
      input.addData(b2.map(ev)); q.processAllAvailable()
      val rollup = spark.table("paths_out").collect()
        .map(r => (r.getAs[String]("e1"), r.getAs[String]("e2"),
          r.getAs[String]("e3")))
        .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      val batch = graft.operators.Relational.qPaths(spark, dir).collect()
        .map(r => (r.getAs[String]("e1"), r.getAs[String]("e2"),
          r.getAs[String]("e3")) -> r.getAs[Long]("n")).toMap
      assert(rollup == batch, s"monitor rollup $rollup != batch $batch")
    } finally {
      q.stop()
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    }
  }

  test("streaming bottom-k sample monitor: merged per-lang states equal " +
    "the batch q_sample_fixed reservoir across a micro-batch boundary") {
    implicit val sqlCtx = spark.sqlContext
    val sf = "/root/testdata/sf0.001"
    val docs = graft.sources.Tables.documents(spark, sf)
      .select("doc_id", "lang").collect()
      .map(r => EventStream.DocSeen(r.getAs[Long]("doc_id"), r.getAs[String]("lang")))
    val input = MemoryStream[EventStream.DocSeen]
    val q = EventStream.runningSample(input.toDS())
      .writeStream.format("memory").queryName("bk_out")
      .outputMode("update").start()
    try {
      val (b1, b2) = docs.splitAt(docs.length / 2)
      input.addData(b1.toSeq); q.processAllAvailable()
      input.addData(b2.toSeq); q.processAllAvailable()
      // latest emission per lang = that shard's state; exact seen counts
      val latest = spark.table("bk_out").collect()
        .map(r => (r.getAs[String]("lang"), r.getAs[Long]("n_seen"),
          r.getSeq[String](3).zip(r.getSeq[Long](4))))
        .groupBy(_._1).map { case (l, es) => es.maxBy(_._2) }
      assert(latest.map(_._2).sum == docs.length.toLong, "exact seen count")
      // MERGE the per-lang bottom-k states -> global bottom-k
      val mergedIds = latest.flatMap(_._3).toSeq
        .sortBy(e => (e._1, e._2)).take(operators.TextAnalysis.SampleFixedK)
        .map(_._2).toSet
      val batchIds = operators.TextAnalysis.qSampleFixed(spark, sf).collect()
        .map(_.getAs[Long]("doc_id")).toSet
      assert(mergedIds == batchIds,
        s"merged monitor sample != batch reservoir: " +
          s"only-monitor ${mergedIds -- batchIds}, only-batch ${batchIds -- mergedIds}")
    } finally q.stop()
  }

  test("streaming streak monitor: latest per-user best-streak rollup " +
    "equals the batch q_streaks distribution across a micro-batch " +
    "boundary, and a gap resets the current run") {
    val (dir, rows) = writeR17Fixture()
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EventStream.DayUser]
    val q = EventStream.runningStreaks(input.toDS())
      .writeStream.format("memory").queryName("streak_out")
      .outputMode("update").start()
    def day(t: Timestamp) = t.toString.substring(0, 10)
    try {
      val (b1, b2) = rows.splitAt(3)
      input.addData(b1.map(r => EventStream.DayUser(r._2, day(r._1))))
      q.processAllAvailable()
      input.addData(b2.map(r => EventStream.DayUser(r._2, day(r._1))))
      q.processAllAvailable()
      // keep each user's LATEST emission (max last_day, then max streak)
      val latest = spark.table("streak_out").collect()
        .map(r => (r.getAs[Long]("user_id"), r.getAs[String]("last_day"),
          r.getAs[Long]("cur_streak"), r.getAs[Long]("best_streak")))
        .groupBy(_._1).map { case (u, es) => u -> es.maxBy(e => (e._2, e._4)) }
      // user 1: days 1+2 consecutive -> cur 2, best 2
      assert(latest(1L)._3 == 2L && latest(1L)._4 == 2L, latest.toString)
      val rollup = latest.values.groupBy(_._4)
        .map { case (len, es) => len -> es.size.toLong }
      val batch = graft.operators.Relational.qStreaks(spark, dir).collect()
        .map(r => r.getAs[Long]("streak_days") -> r.getAs[Long]("n_users")).toMap
      assert(rollup == batch, s"monitor rollup $rollup != batch twin $batch")
      // gap reset: user 3 re-appears two days later -> cur resets to 1,
      // best stays
      input.addData(Seq(EventStream.DayUser(3L, "2024-03-04")))
      q.processAllAvailable()
      val u3 = spark.table("streak_out").collect()
        .filter(_.getAs[Long]("user_id") == 3L)
        .maxBy(_.getAs[String]("last_day"))
      assert(u3.getAs[Long]("cur_streak") == 1L &&
        u3.getAs[Long]("best_streak") == 1L &&
        u3.getAs[String]("last_day") == "2024-03-04")
    } finally {
      q.stop()
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    }
  }

  test("streaming t-digest monitor: running n/min/max exact across a " +
    "micro-batch boundary, p50/p95 rank-bounded, and the emitted snapshot " +
    "merges with a batch-built sketch through tdigest_merge_agg") {
    implicit val sqlCtx = spark.sqlContext
    import graft.functions.TDigestSketch._
    val input = MemoryStream[EventStream.TdIn]
    val q = EventStream.runningTDigest(input.toDS())
      .writeStream.format("memory").queryName("td_out")
      .outputMode("update").start()
    // deterministic non-sorted arrival, split across two micro-batches
    val all = (1 to 1000).map(i => ((i * 467) % 1000 + 1).toDouble)
    try {
      input.addData(all.take(500).map(v => EventStream.TdIn("lat", v)))
      q.processAllAvailable()
      input.addData(all.drop(500).map(v => EventStream.TdIn("lat", v)))
      q.processAllAvailable()
      val snaps = spark.table("td_out").collect()
      assert(snaps.length == 2, "one emission per micro-batch")
      val fin = snaps.maxBy(_.getAs[Long]("n"))
      assert(fin.getAs[Long]("n") == 1000L, "running weight must be exact")
      assert(fin.getAs[Double]("vmin") == 1.0 && fin.getAs[Double]("vmax") == 1000.0)
      assert(math.abs(fin.getAs[Double]("p50") - 500.0) <= 21.0)
      assert(math.abs(fin.getAs[Double]("p95") - 950.0) <= 21.0)
      // snapshot composability: the monitor's state merges with a
      // batch-built sketch of ANOTHER 1000 values into one 2000-weight
      // digest — streaming state and batch sketch tables share a format
      import spark.implicits._
      val other = (1001 to 2000).map(_.toDouble).toDF("v")
        .agg(tdigestAgg(col("v")).as("sk")).select(col("sk").as("sketch"))
      val merged = other.unionByName(
          spark.table("td_out").filter(col("n") === 1000L).select("sketch"))
        .agg(tdigestMergeAgg(col("sketch")).as("sk"))
        .select(tdigestSummary(col("sk"), Seq(0.5)).as("t")).collect()(0)
        .getAs[org.apache.spark.sql.Row]("t")
      assert(merged.getAs[Long]("n") == 2000L)
      assert(merged.getAs[Double]("vmin") == 1.0 &&
        merged.getAs[Double]("vmax") == 2000.0)
      assert(math.abs(merged.getAs[scala.collection.Seq[Double]]("qs")(0) - 1000.0)
        <= 41.0)
    } finally q.stop()
  }

  test("streaming concurrency refresh: the foreachBatch incremental sweep " +
    "equals the batch q_concurrency twin, with a session merging across " +
    "a micro-batch boundary (r16 verdict task 5)") {
    val (dir, rows) = writeR17Fixture()
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long)]
    val store = scala.collection.concurrent.TrieMap.empty[(Long, Long), Long]
    val peaks = scala.collection.concurrent.TrieMap.empty[String, (Long, Long)]
    val q = EventStream.concurrencyRefresh(
      input.toDF().toDF("ts", "user_id"), store, peaks)
    try {
      val (b1, b2) = rows.splitAt(2)
      input.addData(b1.map(r => (r._1, r._2)))
      q.processAllAvailable()
      // user 1's batch-2 event at 10:20 falls INSIDE the open session
      // from batch 1 — the session store must merge before closing
      input.addData(b2.map(r => (r._1, r._2)))
      q.processAllAvailable()
      // close everything: advance the watermark far past day 2 + gap
      input.addData(Seq((Timestamp.valueOf("2024-03-05 00:00:00"), 99L)))
      q.processAllAvailable()
      input.addData(Seq((Timestamp.valueOf("2024-03-05 00:00:01"), 99L)))
      q.processAllAvailable()
      // merged, not split: user 1 day-1 session is ONE store row
      // spanning 10:00..10:20
      val u1 = store.keys.filter(_._1 == 1L).toSeq.sortBy(_._2)
      assert(u1.length == 2, s"user 1 must close 2 sessions, got $u1")
      assert(store(u1.head) - u1.head._2 == 20L * 60 * 1000000L,
        "day-1 session must span the micro-batch boundary (20 min)")
      val batch = graft.operators.Relational.qConcurrency(spark, dir)
        .collect()
        .map(r => r.getAs[String]("day") ->
          (r.getAs[Long]("peak_concurrent"), r.getAs[Long]("n_started"))).toMap
      val got = peaks.toMap.view.filterKeys(_ < "2024-03-05").toMap
      assert(got == batch, s"refresh peaks $got != batch twin $batch")
      assert(batch("2024-03-01") == ((2L, 3L)) && batch("2024-03-02") == ((2L, 2L)))
    } finally {
      q.stop()
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    }
  }

  test("streaming regime filter: trellis column matches the plain-Scala " +
    "forward recursion bit-for-bit across a micro-batch boundary, and the " +
    "final filtered regime equals the batch Viterbi path's last state") {
    implicit val sqlCtx = spark.sqlContext
    val sf = "/root/testdata/sf0.001"
    // the batch symbolizer: daily exact-decimal sums vs the type mean
    val daily = graft.sources.Tables.events(spark, sf)
      .select(col("event_type"), date_format(col("ts"), "yyyy-MM-dd").as("day"),
        col("value").cast("decimal(18,6)").as("v"))
      .groupBy("event_type", "day")
      .agg(sum(col("v")).cast("double").as("y")).collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[String]("day"),
        r.getAs[Double]("y")))
    val byType = daily.groupBy(_._1).map { case (t, g) =>
      val mu = g.map(_._3).sum / g.length
      t -> g.sortBy(_._2).map(x =>
        if (x._3 < mu * 0.8) 0 else if (x._3 > mu * 1.2) 2 else 1)
    }
    val input = MemoryStream[EventStream.SymObs]
    val q = EventStream.runningRegime(input.toDS())
      .writeStream.format("memory").queryName("regime_out")
      .outputMode("update").start()
    try {
      val feed = byType.toSeq.flatMap { case (t, obs) =>
        obs.zipWithIndex.map { case (o, i) =>
          EventStream.SymObs(t, i.toLong, o) } }
      val (b1, b2) = feed.partition(_.seq < 11) // boundary mid-series
      input.addData(b1); q.processAllAvailable()
      input.addData(b2); q.processAllAvailable()
      val fin = spark.table("regime_out").collect()
        .map(r => (r.getString(0), (r.getLong(1), r.getInt(2), r.getDouble(3))))
        .groupBy(_._1).map { case (k, vs) => k -> vs.maxBy(_._2._1)._2 }
      val lnPi0 = math.log(operators.Stats.HmmPi(0))
      val lnT = operators.Stats.HmmTrans.map(_.map(math.log))
      val lnE = operators.Stats.HmmEmit.map(_.map(math.log))
      val lastViterbi = operators.Stats.qViterbi(spark, sf).collect()
        .groupBy(_.getAs[String]("event_type"))
        .map { case (t, g) =>
          t -> g.maxBy(_.getAs[String]("day")).getAs[Int]("regime") }
      byType.foreach { case (t, obs) =>
        var dp = Array.tabulate(3)(s => lnE(s)(obs.head) + lnPi0)
        obs.tail.foreach { o =>
          dp = Array.tabulate(3)(s => lnE(s)(o) +
            (0 to 2).map(p => dp(p) + lnT(p)(s)).max)
        }
        val (n, regime, lp) = fin(t)
        assert(n == obs.length.toLong, t)
        assert(lp == dp.max, s"$t: lp $lp != ${dp.max} (must be bit-identical)")
        val expReg = if (dp(0) >= dp(1) && dp(0) >= dp(2)) 0
          else if (dp(1) >= dp(2)) 1 else 2
        assert(regime == expReg, t)
        // filtering's last column argmax IS the smoothed path's last state
        assert(regime == lastViterbi(t), s"$t vs batch Viterbi last state")
      }
    } finally q.stop()
  }

  // -------------------- late / out-of-order arrival audit (r18) --------
  // The twins' ordering contract, pinned (SURVEY §5 documents it):
  //  * WATERMARKED operators reorder freely within the watermark and DROP
  //    rows whose window is already finalized — late data inside the
  //    horizon is exact, beyond it is dropped, never mis-aggregated.
  //  * SEQUENCED stateful twins (runningCusum et al.) reorder WITHIN a
  //    micro-batch (explicit seq sort); ACROSS batches arrival order is
  //    the fold order — a cross-batch straggler folds where it lands.
  //  * MONOTONE-EMISSION twins (runningNewVsReturning et al.) never
  //    retract: a late FIRST day re-emits is_new under the corrected
  //    first_day; the earlier emission stands.

  test("late-data: windowed counts reorder within the watermark, drop past it") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, Double)]
    val q = EventStream.windowedCounts(input.toDF().toDF("ts", "event_type", "value"))
      .writeStream.format("memory").queryName("win_late")
      .outputMode("update").start()
    def day1Updates(): Seq[Long] = spark.table("win_late").collect()
      .filter(_.getAs[String]("day") == "2024-01-01").map(_.getAs[Long]("n")).toSeq
    try {
      input.addData((Timestamp.valueOf("2024-01-01 12:00:00"), "click", 1.0))
      q.processAllAvailable() // watermark → 01-01 11:00
      // OUT-OF-ORDER but window [01-01, 01-02) is still open → counted
      input.addData((Timestamp.valueOf("2024-01-01 03:00:00"), "click", 2.0))
      q.processAllAvailable()
      assert(day1Updates().max === 2L, "in-horizon late row must aggregate")
      // advance the watermark past the window end (01-03 01:00 > 01-02)
      input.addData((Timestamp.valueOf("2024-01-03 02:00:00"), "view", 1.0))
      q.processAllAvailable()
      val before = day1Updates()
      // TOO-LATE row: its window is finalized → dropped, no new update
      input.addData((Timestamp.valueOf("2024-01-01 05:00:00"), "click", 4.0))
      q.processAllAvailable()
      assert(day1Updates() === before, "row past the watermark must be dropped")
      assert(day1Updates().max === 2L)
    } finally q.stop()
  }

  test("late-data: CUSUM reorders within a batch by seq; cross-batch " +
    "stragglers fold in arrival order (the documented bound)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EventStream.TypedValue]
    val q = EventStream.runningCusum(input.toDS(), target = 2.0, threshold = 100.0)
      .writeStream.format("memory").queryName("cusum_late")
      .outputMode("update").start()
    def fold(xs: Seq[Double]): Double = {
      var pref = 0.0; var mn = 0.0
      xs.foreach { x => pref += x - 2.0; mn = math.min(mn, pref) }
      pref - mn
    }
    def latest(): (Long, Double) = spark.table("cusum_late")
      .as[EventStream.CusumOut].collect().maxBy(_.n) match {
        case o => (o.n, o.cusum)
      }
    try {
      // one batch, seq SHUFFLED (3, 1, 2) → the explicit seq sort restores
      // event order: result = fold over values in seq order 1, 2, 3
      input.addData(EventStream.TypedValue("a", 3L, 9.0),
        EventStream.TypedValue("a", 1L, 5.0), EventStream.TypedValue("a", 2L, 1.0))
      q.processAllAvailable()
      assert(latest() === ((3L, fold(Seq(5.0, 1.0, 9.0)))),
        "within-batch shuffle must be reordered by seq")
      // a CROSS-BATCH straggler (seq 0) folds where it ARRIVES — after
      // seq 1..3, not before them; no retraction, state is monotone
      input.addData(EventStream.TypedValue("a", 0L, 0.0))
      q.processAllAvailable()
      assert(latest() === ((4L, fold(Seq(5.0, 1.0, 9.0, 0.0)))),
        "cross-batch straggler folds in arrival order")
      assert(latest()._2 !== fold(Seq(0.0, 5.0, 1.0, 9.0)),
        "(and that differs from full event-time order — the bound is real)")
    } finally q.stop()
  }

  test("streaming dedup maintenance: foreachBatch folds micro-batches " +
    "into the pair state (dedupFoldBatch), equal to the one-shot answer") {
    implicit val sqlCtx = spark.sqlContext
    import operators.Dedup
    val emptyPairs = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_a", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("doc_b", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("jaccard", org.apache.spark.sql.types.DoubleType))))
    // near-dups CROSS the micro-batch boundary: 11/21 share a batch,
    // 31 arrives a batch later and must pair with both
    val b1 = Seq(
      (11L, "alpha beta gamma delta epsilon zeta eta theta"),
      (21L, "alpha beta gamma delta epsilon zeta eta iota"),
      (99L, "totally unrelated words about something else entirely"))
    val b2 = Seq(
      (31L, "alpha beta gamma delta epsilon zeta eta kappa"),
      (88L, "another unrelated document with private vocabulary"))
    var postings = Dedup.docShinglesOf(b1.toDF("doc_id", "text")).filter(lit(false))
      .localCheckpoint(true)
    var sizes = postings.groupBy("doc_id").agg(count(lit(1)).as("sz"))
      .localCheckpoint(true)
    var pairs = emptyPairs
    val input = MemoryStream[(Long, String)]
    val q = input.toDS().toDF("doc_id", "text").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val sh = Dedup.docShinglesOf(batch).localCheckpoint(true)
        sizes = sizes.unionByName(
          sh.groupBy("doc_id").agg(count(lit(1)).as("sz"))).localCheckpoint(true)
        pairs = Dedup.dedupFoldBatch(postings, pairs, sh, sizes)
          .localCheckpoint(true)
        postings = postings.unionByName(sh).localCheckpoint(true)
        ()
      }
      .start()
    try {
      input.addData(b1: _*); q.processAllAvailable()
      input.addData(b2: _*); q.processAllAvailable()
    } finally q.stop()
    val got = pairs.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // plain-Scala one-shot recompute with the SAME capped semantics
    val docs = (b1 ++ b2).toMap
    def shingles(t: String): Set[String] =
      t.split("\\s+").sliding(3).map(_.mkString(" ")).toSet
    val sets = docs.map { case (id, t) => id -> shingles(t) }
    val dfCnt = sets.values.flatten.groupBy(identity).map { case (k, v) => k -> v.size }
    val capped = dfCnt.filter { case (_, c) =>
      c >= 2 && c <= Dedup.ShingleDfCap }.keySet
    val expected = (for {
      a <- sets.keys; b <- sets.keys if a < b
      common = (sets(a) intersect sets(b) intersect capped).size if common > 0
      j = common.toDouble / (sets(a).size + sets(b).size - common)
      jr = math.rint(j * 1e6) / 1e6 if jr >= 0.12
    } yield (a, b, jr)).toSet
    assert(got === expected,
      s"missing=${(expected -- got).take(5)} extra=${(got -- expected).take(5)}")
    assert(expected.exists { case (a, b, _) => a == 11L && b == 31L },
      "a cross-batch near-dup pair must exist (fixture is non-vacuous)")
  }

  test("streaming CC maintenance: foreachBatch folds edge micro-batches " +
    "through the quotient contraction (ccFoldBatch), equal to one-shot CC") {
    implicit val sqlCtx = spark.sqlContext
    import operators.{Dedup, Relational}
    // a path 1-2-3-4-5-6 arriving as three batches, plus a separate
    // component {10,11}: batch 2's edge (3,4) MERGES two previously
    // disjoint components — the case the quotient must get right
    val batches = Seq(
      Seq((1L, 2L), (2L, 3L), (10L, 11L)),
      Seq((4L, 5L), (3L, 4L)),
      Seq((5L, 6L)))
    var labels = Seq.empty[(Long, Long)].toDF("id", "label")
      .localCheckpoint(true)
    val input = MemoryStream[(Long, Long)]
    val q = input.toDS().toDF("a", "b").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        labels = Relational.ccFoldBatch(labels, batch).localCheckpoint(true)
        ()
      }
      .start()
    try {
      batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
    } finally q.stop()
    val got = labels.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val full = Dedup.connectedComponents(
      batches.flatten.toDF("a", "b")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === full, s"got=$got full=$full")
    assert(got.contains((6L, 1L)) && got.contains((11L, 10L)),
      "path component labels by its min; the side component stays apart")
  }

  test("streaming LABEL maintenance: foreachBatch folds full pair-state " +
    "snapshots through labelFoldBatch (merges AND deletions), equal to " +
    "one-shot CC over the final state") {
    implicit val sqlCtx = spark.sqlContext
    import operators.Dedup
    // each micro-batch delivers the CURRENT pair relation (the
    // dedupFoldBatch output a production job lands each day): batch 2
    // merges {1,2} with {5,6} via (2,5); batch 3 DELETES (1,2) — a cap
    // exit's re-verification below threshold — so 1 drops out and the
    // survivors re-solve
    val states = Seq(
      Seq((1L, 2L), (5L, 6L), (100L, 101L)),
      Seq((1L, 2L), (5L, 6L), (100L, 101L), (2L, 5L)),
      Seq((5L, 6L), (100L, 101L), (2L, 5L)))
    var pairs = Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")
      .localCheckpoint(true)
    var labels = Seq.empty[(Long, Long)].toDF("doc_id", "cluster_id")
      .localCheckpoint(true)
    val input = MemoryStream[(Long, Long)]
    var batchNo = -1
    val q = input.toDS().toDF("doc_a", "doc_b").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        labels = Dedup.labelFoldBatch(labels, pairs, batch)
          .localCheckpoint(true)
        pairs = batch.localCheckpoint(true)
        batchNo += 1
        ()
      }
      .start()
    try {
      states.foreach { st => input.addData(st: _*); q.processAllAvailable() }
    } finally q.stop()
    val got = labels.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val full = Dedup.connectedComponents(
      states.last.toDF("a", "b")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === full, s"got=$got full=$full")
    assert(!got.exists(_._1 == 1L), "doc 1 lost its last edge and drops out")
    assert(got.contains((6L, 2L)), "survivors re-solve under min id 2")
  }

  test("late-data: new-vs-returning re-emits under a corrected first day, " +
    "never retracts") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EventStream.DayUser]
    val q = EventStream.runningNewVsReturning(input.toDS())
      .writeStream.format("memory").queryName("nvr_late")
      .outputMode("update").start()
    def rows(): Set[(String, Boolean)] = spark.table("nvr_late")
      .as[EventStream.NvrEmit].collect().map(e => (e.day, e.is_new)).toSet
    try {
      input.addData(EventStream.DayUser(5L, "2024-01-05"))
      q.processAllAvailable()
      assert(rows() === Set(("2024-01-05", true)))
      // LATE first day: emitted as new under the corrected first_day;
      // the 01-05 emission stands (no retraction — the documented bound:
      // downstream consumers needing a unique "new" row dedup by min day)
      input.addData(EventStream.DayUser(5L, "2024-01-03"))
      q.processAllAvailable()
      assert(rows() === Set(("2024-01-05", true), ("2024-01-03", true)))
      // subsequent days classify against the CORRECTED first day
      input.addData(EventStream.DayUser(5L, "2024-01-04"))
      q.processAllAvailable()
      assert(rows() === Set(("2024-01-05", true), ("2024-01-03", true),
        ("2024-01-04", false)))
    } finally q.stop()
  }
}
