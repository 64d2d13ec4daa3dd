package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming twins of the batch event operators: the SAME
  * transformations compose over readStream sources (Relational.qEventsWindow
  * is the batch twin of windowedCounts). Watermarks bound state; custom
  * per-user running state uses flatMapGroupsWithState — the scalable
  * replacement for any driver-side accumulation.
  */
object EventStream {

  /** Tumbling 1-day windowed aggregation with a 1-hour watermark. Works on
    * both batch and streaming DataFrames with the events schema. */
  def windowedCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 day").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("value").cast("decimal(18,6)")).cast("double"), 4).as("sum_value"))
      .select(date_format(col("w.start"), "yyyy-MM-dd").as("day"),
        col("event_type"), col("n"), col("sum_value"))

  /** Streaming exact-dedup twin of Dedup.qDedupExact: drop content-hash
    * duplicates within the watermark horizon. State is bounded by the
    * watermark (exact global dedup over an unbounded stream needs unbounded
    * state by definition — the horizon is the streaming trade). */
  def dedupedDocs(docs: DataFrame): DataFrame =
    docs.withWatermark("ts", "1 hour")
      .withColumn("content_md5", md5(col("text")))
      .dropDuplicatesWithinWatermark("content_md5")

  /** Stream-static enrichment join: each micro-batch joins against a static
    * dim snapshot (no state, no watermark needed — the standard pattern for
    * attaching reference data to a stream; the dim broadcasts per batch). */
  def enriched(events: DataFrame, dim: DataFrame): DataFrame =
    events.join(broadcast(dim), Seq("event_type"), "left_outer")

  /** Native session-window sessionization (30-min gap): Spark's
    * session_window merges events into variable-length sessions inside
    * the streaming state store, watermark-bounded — the streaming twin of
    * the batch lag/sum formulation in Relational.qSessionize (same gap
    * semantics; StreamingSpec pins a two-session fixture on both). */
  def sessionCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(session_window(col("ts"), "30 minutes").as("sw"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("sw.start").as("sess_start"),
        col("sw.end").as("sess_end"), col("n_events"))

  /** Streaming per-day session dashboard — the stateful twin of the
    * batch q_session_stats rollup (Relational.qSessionStats, 67n): the
    * session_window sessionization of [[sessionCounts]] CHAINED into a
    * second event-time aggregation that rolls closed sessions up to the
    * day they started — session count, bounce count/rate (single-event
    * sessions) and mean depth, the exact columns the batch dashboard
    * reads (median duration stays batch-only: an order statistic has no
    * bounded-state incremental form). Two stateful operators in one
    * query — Spark's multi-stateful-operator support does the heavy
    * lifting: the session store emits a session only once its window can
    * no longer grow (watermark past end + gap), and the day store emits
    * a day only once the watermark passes midnight + the delay, so every
    * emitted row is FINAL (append mode, no retractions downstream —
    * the property a dashboard sink wants). Sessions merge across
    * micro-batch boundaries before any day sees them; StreamingSpec pins
    * that against the batch twin's numbers on a shared fixture. */
  def sessionDashboard(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(session_window(col("ts"), "30 minutes").as("sw"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      // Chain on the session-window column itself (SPARK-40925): the
      // day window derives its event time from window_time(sw) =
      // sw.end − 1ms, the only representative that keeps the global
      // watermark sound. (Re-watermarking a projected sw.start instead
      // DEADLOCKS: the new watermark node sees no data until operator 1
      // emits, and operator 1 won't emit until the watermark advances —
      // the global watermark stays at epoch forever.) Consequence: a
      // session is keyed to the day of its LAST activity, where the
      // batch twin keys by first event — identical whenever the session
      // doesn't straddle midnight, which the spec pins.
      .groupBy(window(col("sw"), "1 day").as("day_w"))
      .agg(count(lit(1)).as("n_sessions"),
        sum(when(col("n_events") === 1, 1L).otherwise(0L)).as("n_bounce"),
        round(sum(when(col("n_events") === 1, 1L).otherwise(0L))
          .cast("double") / count(lit(1)), 6).as("bounce_rate"),
        round(sum(col("n_events")).cast("double") / count(lit(1)), 6)
          .as("avg_depth"))
      .select(date_format(col("day_w.start"), "yyyy-MM-dd").as("day"),
        col("n_sessions"), col("n_bounce"), col("bounce_rate"),
        col("avg_depth"))

  /** Stream-stream interval join — the streaming twin of the batch range
    * join (Relational.qRangeJoin): purchases matched to the same user's
    * clicks from the preceding 30 minutes. Both sides carry watermarks and
    * the join condition bounds event time on BOTH ends, so the state store
    * retains each side only for the interval plus the watermark delay —
    * bounded state on an unbounded stream. */
  def clicksBeforePurchase(clicks: DataFrame, purchases: DataFrame): DataFrame = {
    val c = clicks.withWatermark("ts", "1 hour")
      .select(col("user_id"), col("ts").as("c_ts"))
    val p = purchases.withWatermark("ts", "1 hour")
      .select(col("user_id"), col("event_id"), col("ts").as("p_ts"))
    p.join(c,
      p("user_id") === c("user_id") &&
        col("c_ts") > col("p_ts") - expr("INTERVAL 30 MINUTES") &&
        col("c_ts") <= col("p_ts"))
      .select(col("event_id"), p("user_id").as("user_id"), col("p_ts"), col("c_ts"))
  }

  /** LEFT OUTER stream-stream interval join — the absence-reporting twin
    * of [[clicksBeforePurchase]]: every purchase emits, with its matching
    * click when one exists in the preceding 30 minutes and with a NULL
    * click otherwise. The semantics users get wrong in production: the
    * null row for an unmatched purchase is NOT emitted when the purchase
    * arrives — it can only be emitted once the engine can PROVE no match
    * will arrive, i.e. when the click-side watermark passes the end of
    * the purchase's match interval (p_ts plus the watermark delay). Until
    * then the purchase sits in the state store; at expiry the store
    * evicts it and the outer row with the null side is emitted — so
    * unmatched results trail the stream by the watermark horizon, and a
    * test (or consumer) must advance event time past the horizon to see
    * them. State stays bounded exactly as in the inner variant: each
    * side is retained for the interval plus the delay, no longer. */
  def clicksBeforePurchaseOuter(clicks: DataFrame,
      purchases: DataFrame): DataFrame = {
    val c = clicks.withWatermark("ts", "1 hour")
      .select(col("user_id"), col("ts").as("c_ts"))
    val p = purchases.withWatermark("ts", "1 hour")
      .select(col("user_id"), col("event_id"), col("ts").as("p_ts"))
    p.join(c,
      p("user_id") === c("user_id") &&
        col("c_ts") > col("p_ts") - expr("INTERVAL 30 MINUTES") &&
        col("c_ts") <= col("p_ts"),
      "left_outer")
      .select(col("event_id"), p("user_id").as("user_id"), col("p_ts"),
        col("c_ts"))
  }

  /** Idempotent micro-batch sink: land each micro-batch in a partitioned
    * parquet table under `batch_id=<id>`, with dynamic partition overwrite
    * so a REPLAYED batch (restart after a failure between sink commit and
    * checkpoint commit) overwrites its own partition instead of
    * duplicating rows — foreachBatch + overwrite-by-batch-id is the
    * standard exactly-once recipe for sinks without transactional commit.
    * Returns the started query. */
  def toPartitionedParquet(df: DataFrame, path: String, checkpoint: String) =
    df.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], id: Long) =>
        batch.sparkSession.conf
          .set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        batch.withColumn("batch_id", lit(id))
          .write.mode("overwrite").partitionBy("batch_id").parquet(path)
      }
      .start()

  case class UserEvent(user_id: Long, event_type: String, value: Double)
  case class UserRunning(user_id: Long, n_events: Long, total_value: Double)
  case class EwmaState(n_events: Long, num: Double, den: Double)
  case class UserEwma(user_id: Long, n_events: Long, ewma: Double)

  /** Streaming EWMA (α=1/2, normalized weights) per user — the stateful
    * twin of the batch closed-form ScaleOps.qEwma. The batch query's
    * weights 2^i/Σ2^j are the "adjust" EWMA, whose streaming recursion is
    * num ← x + num/2, den ← 1 + den/2, e = num/den — so state is ONE
    * (count, num, den) triple per key regardless of stream length.
    * Events must arrive in per-user order within a batch (the caller
    * sorts; a production job would carry event-time and use a timer). */
  def runningUserEwma(events: Dataset[UserEvent]): Dataset[UserEwma] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[EwmaState, UserEwma](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        case (uid, rows, state: GroupState[EwmaState]) =>
          var cur = state.getOption.getOrElse(EwmaState(0L, 0.0, 0.0))
          rows.foreach { e =>
            cur = EwmaState(cur.n_events + 1, e.value + cur.num / 2.0, 1.0 + cur.den / 2.0)
          }
          state.update(cur)
          Iterator(UserEwma(uid, cur.n_events, cur.num / cur.den))
      }
  }

  case class TypedValue(event_type: String, seq: Long, value: Double)
  case class CusumState(n: Long, pref: Double, minPref: Double)
  case class CusumOut(event_type: String, n: Long, cusum: Double, drifting: Boolean)

  /** Streaming CUSUM drift monitor per event type — the stateful twin of
    * the batch Stats.qCusum, against a FIXED reference target (batch
    * CUSUM derives the target from the global mean in a second pass; a
    * monitor watches a known baseline). Same prefix-minus-running-min
    * identity, carried as ONE (count, prefix, minPrefix) triple per key
    * regardless of stream length: pref ← pref + (x − target),
    * CUSUM = pref − min(pref seen so far). Rows are processed in seq
    * order within a batch (the caller orders; a production job carries
    * event-time); state persists across micro-batches so drift
    * accumulates over the whole stream. */
  def runningCusum(values: Dataset[TypedValue], target: Double,
      threshold: Double): Dataset[CusumOut] = {
    import values.sparkSession.implicits._
    values.groupByKey(_.event_type)
      .flatMapGroupsWithState[CusumState, CusumOut](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        case (et, rows, state: GroupState[CusumState]) =>
          var cur = state.getOption.getOrElse(CusumState(0L, 0.0, 0.0))
          rows.toSeq.sortBy(_.seq).foreach { r =>
            val pref = cur.pref + (r.value - target)
            cur = CusumState(cur.n + 1, pref, math.min(cur.minPref, pref))
          }
          state.update(cur)
          val cusum = cur.pref - cur.minPref
          Iterator(CusumOut(et, cur.n, cusum, cusum > threshold))
      }
  }

  case class HoltState(n: Long, level: Double, trend: Double)
  case class HoltOut(event_type: String, n: Long, level: Double, trend: Double)

  /** Streaming Holt level+trend smoothing per event type — the stateful
    * twin of the batch ordered fold (Stats.qHolt): the IDENTICAL
    * recursion (dyadic α = Stats.HoltAlpha, β = Stats.HoltBeta, same
    * term order, seeded l₁ = y₁, b₁ = 0), carried as ONE
    * (count, level, trend) triple per key regardless of stream length —
    * the forecasting monitor a pipeline runs against live metric
    * streams while the batch twin backfills history. Rows are processed
    * in seq order within a batch (caller orders; production carries
    * event-time); state persists across micro-batches. */
  def runningHolt(values: Dataset[TypedValue]): Dataset[HoltOut] = {
    import values.sparkSession.implicits._
    val a = graft.operators.Stats.HoltAlpha
    val b = graft.operators.Stats.HoltBeta
    values.groupByKey(_.event_type)
      .flatMapGroupsWithState[HoltState, HoltOut](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        case (et, rows, state: GroupState[HoltState]) =>
          var cur = state.getOption.getOrElse(HoltState(0L, 0.0, 0.0))
          rows.toSeq.sortBy(_.seq).foreach { r =>
            cur =
              if (cur.n == 0L) HoltState(1L, r.value, 0.0)
              else {
                val nl = a * r.value + (1 - a) * (cur.level + cur.trend)
                val nb = b * (nl - cur.level) + (1 - b) * cur.trend
                HoltState(cur.n + 1, nl, nb)
              }
          }
          state.update(cur)
          Iterator(HoltOut(et, cur.n, cur.level, cur.trend))
      }
  }

  case class HwState(n: Long, level: Double, trend: Double, s: List[Double])
  case class HwOut(event_type: String, n: Long, level: Double, trend: Double,
    seasonal: Double)

  /** Streaming Holt–Winters triple-exponential smoothing per event type
    * — the stateful twin of the batch ordered fold (Stats.qHoltWinters):
    * the IDENTICAL cold-start recursion (dyadic α/β/γ, same term order),
    * state = (count, level, trend) plus the rotating ≤[[graft.operators
    * .Stats.HwPeriod]]-element seasonal list whose head is s_{t−m} —
    * O(m) per key regardless of stream length. The live-seasonal monitor
    * beside runningHolt, whose state cannot see day-of-week structure. */
  def runningHoltWinters(values: Dataset[TypedValue]): Dataset[HwOut] = {
    import values.sparkSession.implicits._
    val a = graft.operators.Stats.HoltAlpha
    val b = graft.operators.Stats.HoltBeta
    val g = graft.operators.Stats.HwGamma
    val m = graft.operators.Stats.HwPeriod
    values.groupByKey(_.event_type)
      .flatMapGroupsWithState[HwState, HwOut](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        case (et, rows, state: GroupState[HwState]) =>
          var cur = state.getOption.getOrElse(HwState(0L, 0.0, 0.0, Nil))
          rows.toSeq.sortBy(_.seq).foreach { r =>
            val sPrev = if (cur.s.length >= m) cur.s.head else 0.0
            val nl =
              if (cur.n == 0L) r.value
              else a * (r.value - sPrev) + (1 - a) * (cur.level + cur.trend)
            val nb =
              if (cur.n == 0L) 0.0
              else b * (nl - cur.level) + (1 - b) * cur.trend
            val ns = g * (r.value - nl) + (1 - g) * sPrev
            val kept = if (cur.s.length >= m) cur.s.tail else cur.s
            cur = HwState(cur.n + 1, nl, nb, kept :+ ns)
          }
          state.update(cur)
          Iterator(HwOut(et, cur.n, cur.level, cur.trend,
            if (cur.s.isEmpty) 0.0 else cur.s.last))
      }
  }

  case class PhState(n: Long, csum: BigDecimal, sK: BigDecimal, minM: BigDecimal)
  case class PhOut(event_type: String, n: Long, ph: Double, alarm: Boolean)

  /** Streaming baseline-calibrated Page–Hinkley per key — the stateful
    * twin of the batch Inference.qPageHinkley: the IDENTICAL
    * cross-multiplied exact-DECIMAL recursion (warmup K, tolerance
    * 21/20, λ as a fraction of baseline mass), carried as ONE
    * (count, cumsum, baseline, running-min) quadruple per key. The
    * first K observations calibrate S_K; afterwards
    * m̂ = 20K(csum−S_K) − (n−K)·S_K·21 and ph = m̂ − min m̂ — every
    * comparison exact, the single division only on emission. Rows are
    * processed in seq order within a batch; state persists across
    * micro-batches. */
  def runningPageHinkley(values: Dataset[TypedValue]): Dataset[PhOut] = {
    import values.sparkSession.implicits._
    val k = graft.operators.Inference.PhWarmupDays
    val num = graft.operators.Inference.PhDeltaNum
    val den = graft.operators.Inference.PhDeltaDen
    val lamFrac = graft.operators.Inference.PhLambdaFrac
    values.groupByKey(_.event_type)
      .flatMapGroupsWithState[PhState, PhOut](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        case (et, rows, state: GroupState[PhState]) =>
          var cur = state.getOption.getOrElse(
            PhState(0L, BigDecimal(0), BigDecimal(0), BigDecimal(0)))
          rows.toSeq.sortBy(_.seq).foreach { r =>
            val n = cur.n + 1
            val csum = cur.csum + BigDecimal(r.value)
            val sK = if (n == k) csum else cur.sK
            val m =
              if (n <= k) BigDecimal(0)
              else (csum - sK) * (den * k) - sK * num * (n - k)
            val minM = if (n <= k + 1) m else cur.minM.min(m)
            cur = PhState(n, csum, sK, minM)
          }
          state.update(cur)
          val mNow =
            if (cur.n <= k) BigDecimal(0)
            else (cur.csum - cur.sK) * (den * k) - cur.sK * num * (cur.n - k)
          val ph = mNow - cur.minM
          val alarm = cur.n > k &&
            ph > cur.sK * BigDecimal(lamFrac) * BigDecimal(den * k)
          Iterator(PhOut(et, cur.n, (ph / BigDecimal(den * k)).toDouble, alarm))
      }
  }

  case class BernoulliObs(key: String, seq: Long, success: Boolean)
  case class SprtState(k: Long, n: Long)
  case class SprtOut(key: String, n: Long, k: Long, llr: Double, decision: String)

  /** Streaming Wald SPRT per key — the stateful twin of the batch
    * Inference.qSprt: the IDENTICAL LLR walk (same inlined log constants,
    * same Wald boundaries) carried as ONE (successes, trials) pair per
    * key regardless of stream length. A sequential test is the native
    * streaming statistic — the batch twin replays history, the stream
    * decides live. Rows are processed in seq order within a batch
    * (caller orders; production carries event-time); state persists
    * across micro-batches so the trajectory is the full-stream one. */
  def runningSprt(obs: Dataset[BernoulliObs]): Dataset[SprtOut] = {
    import obs.sparkSession.implicits._
    // hoist the four constants into closure-local primitives — capturing
    // the Inference module itself would drag a non-serializable object
    // into the state function
    val (l1, l0) = (graft.operators.Inference.sprtL1, graft.operators.Inference.sprtL0)
    val (ub, lb) = (graft.operators.Inference.sprtUpper, graft.operators.Inference.sprtLower)
    obs.groupByKey(_.key)
      .flatMapGroupsWithState[SprtState, SprtOut](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        case (key, rows, state: GroupState[SprtState]) =>
          var cur = state.getOption.getOrElse(SprtState(0L, 0L))
          rows.toSeq.sortBy(_.seq).foreach { r =>
            cur = SprtState(cur.k + (if (r.success) 1L else 0L), cur.n + 1L)
          }
          state.update(cur)
          val llr = cur.k * l1 + (cur.n - cur.k) * l0
          val decision =
            if (llr >= ub) "accept_h1"
            else if (llr <= lb) "accept_h0"
            else "continue"
          Iterator(SprtOut(key, cur.n, cur.k, llr, decision))
      }
  }

  case class TaggedEvent(user_id: Long, kind: String, event_id: Long, ts_us: Long)
  case class AsofState(last_view_us: Long)
  case class AsofMatch(event_id: Long, user_id: Long, view_us: Option[Long], gap_us: Option[Long])

  /** Streaming AS-OF join — the stateful twin of the native batch
    * operator (plans.AsOfJoin): each purchase is matched to the SAME
    * user's latest view at-or-before it. State is ONE long per user (the
    * latest view time) regardless of history length — exactly the
    * single-buffered-row invariant of the batch merge pass, carried in
    * the state store instead of a sort order. Events are processed in
    * event-time order within each micro-batch, VIEWS FIRST on timestamp
    * ties so the at-or-before match is inclusive exactly like the batch
    * operator; state carries the latest view ACROSS batches, so a
    * purchase in batch N matches a view from batch N−1. A purchase
    * arriving LATE (older than the latest view in state) matches nothing
    * rather than a future view — single-value state cannot recover
    * already-superseded views; full late-data handling needs
    * watermark-bounded multi-view state, the streaming trade. In
    * production add an event-time timeout so idle users age out. */
  def streamingAsof(events: Dataset[TaggedEvent]): Dataset[AsofMatch] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[AsofState, AsofMatch](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        case (uid, rows, state: GroupState[AsofState]) =>
          var lastView = state.getOption.map(_.last_view_us).getOrElse(Long.MinValue)
          val ordered = rows.toSeq
            .sortBy(r => (r.ts_us, if (r.kind == "view") 0 else 1, r.event_id))
          val out = ordered.flatMap { e =>
            if (e.kind == "view") { lastView = math.max(lastView, e.ts_us); None }
            else {
              // at-or-BEFORE only: a late purchase must not match a view
              // from its future that happens to sit in state
              val v = if (lastView != Long.MinValue && lastView <= e.ts_us) Some(lastView) else None
              Some(AsofMatch(e.event_id, uid, v, v.map(e.ts_us - _)))
            }
          }
          state.update(AsofState(lastView))
          out.iterator
      }
  }

  case class TypedUser(event_type: String, user_id: Long)
  case class DistinctOut(event_type: String, n_distinct: Long)

  /** Streaming exact-distinct twin of ScaleOps.qBitmapDistinct: running
    * distinct users per event type, with the SAME RoaringBitmap sketch
    * carried as keyed state (serialized bytes in the state store — the
    * store is untyped, and the bitmap's own serialization is far more
    * compact than a JVM-object encoder). Each micro-batch ORs the new
    * ids in and emits the updated exact cardinality; state per key is
    * one compressed bitmap bounded by the id space, not the stream
    * length — the groupBitmap posture carried into Structured
    * Streaming. Ids outside [0, 2³¹) fail loudly, matching the batch
    * aggregate's contract. */
  def runningDistinct(events: Dataset[TypedUser]): Dataset[DistinctOut] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.event_type)
      .flatMapGroupsWithState[Array[Byte], DistinctOut](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        case (t, rows, state: GroupState[Array[Byte]]) =>
          val bm = state.getOption.map { bytes =>
            val m = new org.roaringbitmap.RoaringBitmap()
            m.deserialize(java.nio.ByteBuffer.wrap(bytes))
            m
          }.getOrElse(new org.roaringbitmap.RoaringBitmap())
          rows.foreach { e =>
            require(e.user_id >= 0 && e.user_id <= Int.MaxValue,
              s"id outside the bitmap space: ${e.user_id}")
            bm.add(e.user_id.toInt)
          }
          bm.runOptimize()
          val buf = java.nio.ByteBuffer.allocate(bm.serializedSizeInBytes())
          bm.serialize(buf)
          state.update(buf.array())
          Iterator(DistinctOut(t, bm.getLongCardinality))
      }
  }

  case class DailyErr(service: String, day: String, n: Long, err: Long)
  case class SloCell(day: String, n: Long, err: Long)
  case class SloHist(cells: List[SloCell])
  case class SloBurnOut(service: String, day: String, n_s: Long, e_s: Long,
    n_l: Long, e_l: Long, burn_short: Double, burn_long: Double, page: Boolean)

  /** Streaming multi-window SLO burn-rate monitor per service — the
    * stateful twin of the batch Stats.qSloBurn (the alerting rule a
    * pipeline actually runs CONTINUOUSLY while the batch twin backfills
    * history): identical two-window Google-SRE rule — a page fires only
    * when both the short (1-day) and long (7-day) trailing windows burn
    * error budget above threshold — with the identical exact-integer
    * comparisons (err·budgetInv·1000 > n·threshold, never a rounded
    * double) and the identical HALF-UP 6-dp burn ratios. State is a ring
    * buffer of at most [[graft.operators.Stats.SloLongDays]] (day, n,
    * err) cells per key regardless of stream length. Daily rows are
    * processed in day order within a batch (the caller aggregates a day
    * per row; a production job closes days from watermarked windowed
    * counts); state persists across micro-batches so a day in batch N
    * windows over days from batch N−1. */
  def runningSloBurn(days: Dataset[DailyErr]): Dataset[SloBurnOut] = {
    import days.sparkSession.implicits._
    val budgetInv = math.round(1.0 / (1.0 - graft.operators.Stats.SloTarget))
    val thr = graft.operators.Stats.SloBurnThresholdX1000.toLong
    val shortD = graft.operators.Stats.SloShortDays
    val longD = graft.operators.Stats.SloLongDays
    // Spark round(x, 6) semantics exactly (BigDecimal HALF_UP over the
    // shortest decimal repr), matching batch qSloBurn — floor(x·1e6+0.5)
    // diverges from it on 6-dp tie values (see runningSeasonal).
    def r6(x: Double) =
      java.math.BigDecimal.valueOf(x)
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    days.groupByKey(_.service)
      .flatMapGroupsWithState[SloHist, SloBurnOut](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        case (svc, rows, state: GroupState[SloHist]) =>
          var hist = state.getOption.map(_.cells).getOrElse(Nil)
          val out = rows.toSeq.sortBy(_.day).map { d =>
            hist = (hist :+ SloCell(d.day, d.n, d.err)).takeRight(longD)
            val shortW = hist.takeRight(shortD)
            val (nS, eS) = (shortW.map(_.n).sum, shortW.map(_.err).sum)
            val (nL, eL) = (hist.map(_.n).sum, hist.map(_.err).sum)
            val page = eS * budgetInv * 1000 > nS * thr &&
              eL * budgetInv * 1000 > nL * thr
            SloBurnOut(svc, d.day, nS, eS, nL, eL,
              r6(eS.toDouble * budgetInv / nS),
              r6(eL.toDouble * budgetInv / nL), page)
          }
          state.update(SloHist(hist))
          out.iterator
      }
  }

  case class TypedDaily(event_type: String, day: String, y: scala.math.BigDecimal)
  case class SeasonCell(weekday: Int, n: Long, sum: scala.math.BigDecimal)
  case class SeasonState(cells: List[SeasonCell])
  case class SeasonOut(event_type: String, day: String, weekday: Int,
    n_w: Long, residual: Double, anomalous: Boolean)

  /** Streaming day-of-week seasonal monitor per event type — the
    * stateful twin of the batch Stats.qSeasonal: each day's total is
    * compared against ITS WEEKDAY's running mean (including itself,
    * exactly the batch convention) with the IDENTICAL exact-decimal
    * comparison — resid = y·n_w − Σ_w carried in BigDecimal, the flag
    * the exact-integer test |resid|·SeasonalFlagFrac > Σ_w, only the
    * reported residual divides. State is at most SEVEN (weekday, n,
    * sum) cells per key regardless of stream length. Prequential
    * semantics, stated: early days are judged against the weekday
    * history seen SO FAR (a monitor cannot see the future), so they can
    * differ from the batch backfill, but for every (type, weekday) the
    * LAST day's verdict uses the complete weekday history and is
    * value-identical to the batch row — StreamingSpec pins exactly
    * that, plus the full trajectory against a local fold. */
  def runningSeasonal(days: Dataset[TypedDaily]): Dataset[SeasonOut] = {
    import days.sparkSession.implicits._
    val frac = graft.operators.Stats.SeasonalFlagFrac
    // Spark round(x, 6) semantics exactly (BigDecimal HALF_UP — matters
    // for NEGATIVE residuals, where floor(x·1e6+0.5) would round ties
    // toward +∞ instead of away from zero)
    def r6(x: Double) =
      java.math.BigDecimal.valueOf(x)
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    days.groupByKey(_.event_type)
      .flatMapGroupsWithState[SeasonState, SeasonOut](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        case (et, rows, state: GroupState[SeasonState]) =>
          var cells = state.getOption.map(_.cells).getOrElse(Nil)
          val out = rows.toSeq.sortBy(_.day).map { d =>
            val wd = java.time.LocalDate.parse(d.day).getDayOfWeek.getValue % 7
            val cur = cells.find(_.weekday == wd)
              .getOrElse(SeasonCell(wd, 0L, scala.math.BigDecimal(0)))
            val next = SeasonCell(wd, cur.n + 1, cur.sum + d.y)
            cells = next :: cells.filterNot(_.weekday == wd)
            val resid = d.y * next.n - next.sum // exact decimal
            val anomalous = resid.abs * frac > next.sum
            // double(resid)/double(n), matching the batch cast order
            SeasonOut(et, d.day, wd, next.n,
              r6(resid.toDouble / next.n), anomalous)
          }
          state.update(SeasonState(cells))
          out.iterator
      }
  }

  /** Custom keyed state: running per-user event count/value via
    * flatMapGroupsWithState. In production add a GroupStateTimeout
    * (processing- or event-time) so idle keys age out of the state store. */
  def runningUserTotals(events: Dataset[UserEvent]): Dataset[UserRunning] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[UserRunning, UserRunning](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        case (uid, rows, state: GroupState[UserRunning]) =>
          val prev = state.getOption.getOrElse(UserRunning(uid, 0L, 0.0))
          var n = prev.n_events
          var tot = prev.total_value
          rows.foreach { e => n += 1; tot += e.value }
          val next = UserRunning(uid, n, tot)
          state.update(next)
          Iterator(next)
      }
  }

  /** Space-saving capacity of the streaming heavy-hitter monitor (m
    * counters per key; every item with true frequency > n/m is
    * guaranteed tracked). */
  val TopKCapacity = 8

  case class SsEntry(id: Long, est: Long, err: Long)
  case class TopKOut(event_type: String, user_id: Long, est: Long,
    err: Long, n_seen: Long)

  /** Streaming heavy hitters per key — the space-saving summary (Metwally
    * 2005) run as a monitor, the stateful twin of the batch
    * q_heavy_hitters CMS check: per event_type, at most [[TopKCapacity]]
    * (id, est, err) counters regardless of stream length. Arrival rule:
    * tracked id → est+1; free slot → (1, 0); full → evict the minimum-est
    * entry e (smallest id on ties — deterministic) and adopt (e.est+1,
    * e.est). Invariants (the algorithm's guarantee, spec-pinned):
    * est − err ≤ true count ≤ est per tracked id, and any id with true
    * frequency > n/m is tracked. Emits the full ranked summary plus the
    * exact stream length after every batch; state persists across
    * micro-batches. */
  def runningTopK(events: Dataset[TypedUser]): Dataset[TopKOut] = {
    import events.sparkSession.implicits._
    val m = TopKCapacity
    events.groupByKey(_.event_type)
      .flatMapGroupsWithState[(List[SsEntry], Long), TopKOut](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        case (t, rows, state: GroupState[(List[SsEntry], Long)]) =>
          var (entries, n) = state.getOption.getOrElse((Nil: List[SsEntry], 0L))
          var map = entries.map(e => e.id -> e).toMap
          rows.foreach { e =>
            n += 1L
            map.get(e.user_id) match {
              case Some(cur) =>
                map = map.updated(e.user_id, cur.copy(est = cur.est + 1L))
              case None if map.size < m =>
                map = map.updated(e.user_id, SsEntry(e.user_id, 1L, 0L))
              case None =>
                val victim = map.values.minBy(v => (v.est, v.id))
                map = (map - victim.id)
                  .updated(e.user_id, SsEntry(e.user_id, victim.est + 1L, victim.est))
            }
          }
          val ranked = map.values.toList.sortBy(v => (-v.est, v.id))
          state.update((ranked, n))
          ranked.iterator.map(v => TopKOut(t, v.id, v.est, v.err, n))
      }
  }

  case class LbState(n: Long, s: Double, ss: Double,
      first: List[Double], last: List[Double], c: List[Double])
  case class LbOut(event_type: String, n: Long,
      q_lb: Option[Double], significant: Option[Boolean])

  /** Streaming Ljung–Box whiteness monitor per event type — the stateful
    * twin of the batch Stats.qLjungBox (r13 verdict task 6): the same
    * portmanteau Q = n(n+2)·Σ_{k≤h} r_k²/(n−k) over the first
    * h = LjungBoxLags autocorrelations, carried as O(h) state per key
    * regardless of stream length: running (n, Σx, Σx²), the raw lag
    * cross-products C_k = Σ_t x_t·x_{t−k} (each new value multiplies
    * into the ≤h most recent), and the FIRST h and LAST h values — the
    * only order statistics the centered expansion needs, since
    * Σ(x_t−m)(x_{t−k}−m) = C_k − m·(A_k+B_k) + (n−k)m² with
    * A_k = Σx minus the first k values and B_k = Σx minus the last k.
    * The batch twin centers through exact decimals; the monitor carries
    * doubles (state must be bounded), so StreamingSpec pins equality to
    * the batch within 1e-6 of the rounded statistic. Degenerate
    * (n ≤ h or zero-variance) prefixes emit None, never a fabricated Q.
    * Rows are processed in seq order within a batch (caller orders;
    * production carries event-time); state persists across batches. */
  def runningLjungBox(values: Dataset[TypedValue]): Dataset[LbOut] = {
    import values.sparkSession.implicits._
    val h = graft.operators.Stats.LjungBoxLags
    val crit = graft.operators.RobustStats.KruskalChiCrit(h)
    values.groupByKey(_.event_type)
      .flatMapGroupsWithState[LbState, LbOut](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        case (et, rows, state: GroupState[LbState]) =>
          var cur = state.getOption.getOrElse(
            LbState(0L, 0.0, 0.0, Nil, Nil, List.fill(h)(0.0)))
          rows.toSeq.sortBy(_.seq).foreach { r =>
            val x = r.value
            val c2 = cur.c.zipWithIndex.map { case (ck, i) =>
              if (i < cur.last.size) ck + x * cur.last(i) else ck
            }
            cur = LbState(cur.n + 1, cur.s + x, cur.ss + x * x,
              if (cur.first.size < h) cur.first :+ x else cur.first,
              (x :: cur.last).take(h), c2)
          }
          state.update(cur)
          val n = cur.n
          val m = if (n > 0) cur.s / n else 0.0
          val den = cur.ss - n * m * m
          val qOpt =
            if (n > h && den > 0) {
              val nD = n.toDouble
              val q = (1 to h).map { k =>
                val ak = cur.s - cur.first.take(k).sum
                val bk = cur.s - cur.last.take(k).sum
                val num = cur.c(k - 1) - m * (ak + bk) + (n - k) * m * m
                val rk = num / den
                rk * rk / (nD - k)
              }.sum * (nD * (nD + 2))
              Some(q)
            } else None
          Iterator(LbOut(et, n, qOpt, qOpt.map(_ > crit)))
      }
  }

  case class PsiState(counts: List[Long])
  case class PsiOut(event_type: String, n: Long, psi: Double,
      bc: Double, drifting: Boolean)

  /** PSI drift alarm threshold (the standard ≳0.2 rule q_psi documents). */
  val PsiDriftMin = 0.2

  /** Streaming histogram-drift monitor per event type — the stateful
    * twin of the batch q_psi / q_bhattacharyya binned-drift pair: state
    * is the live 10-bucket value histogram per key (ten counters,
    * O(1) regardless of stream length; same bucket rule
    * min(⌊value/50⌋, 9) as the batch grid), scored each batch against a
    * static BASELINE histogram (the reference snapshot ops would pin at
    * deploy time) with the identical add-1-smoothed formulas: PSI =
    * Σ(p_b−p_a)·ln(p_b/p_a) and the Bhattacharyya coefficient
    * BC = Σ√(p_a·p_b), both folded in bucket order (the r15 q_psi
    * discipline). Emits the running PSI + BC and the standard ≥0.2
    * drift alarm — the monitor a pipeline runs against live traffic
    * while the batch twin scores history. Keys with no baseline emit
    * nothing (no reference to drift FROM). Negative values are DROPPED,
    * matching the batch twins exactly: q_psi/q_bhattacharyya densify a
    * 0..9 grid, so a negative-bucket row falls outside it and
    * contributes to neither histogram mass nor the total (r16 ADVICE —
    * the old clamp-into-bucket-0 diverged from the batch on any
    * negative value). */
  def runningPsi(values: Dataset[TypedValue],
      baseline: Map[String, Seq[Long]]): Dataset[PsiOut] = {
    import values.sparkSession.implicits._
    values.groupByKey(_.event_type)
      .flatMapGroupsWithState[PsiState, PsiOut](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        case (et, rows, state: GroupState[PsiState]) =>
          var counts = state.getOption
            .map(_.counts.toArray).getOrElse(Array.fill(10)(0L))
          rows.foreach { r =>
            val b = math.min(math.floor(r.value / 50.0).toLong, 9L).toInt
            if (b >= 0) counts(b) += 1L
          }
          state.update(PsiState(counts.toList))
          baseline.get(et) match {
            case Some(base) =>
              val ta = base.sum
              val tb = counts.sum
              var psi = 0.0
              var bc = 0.0
              var i = 0
              while (i < 10) {
                val pa = (base(i) + 1).toDouble / (ta + 10)
                val pb = (counts(i) + 1).toDouble / (tb + 10)
                psi += (pb - pa) * math.log(pb / pa)
                bc += math.sqrt(pa * pb)
                i += 1
              }
              Iterator(PsiOut(et, tb, psi, bc, psi >= PsiDriftMin))
            case None => Iterator.empty
          }
      }
  }

  case class CmsF2State(cells: List[Long], n: Long)
  case class F2Out(stream: String, n_rows: Long, est_f2: Double,
      skew_ratio: Double, needs_salting: Boolean)

  /** CMS geometry of the streaming F₂ monitor (mirrors the batch
    * q_join_size_sketch / q_cms_audit constants). */
  val F2Depth = 4
  val F2Width = 256

  /** Salting alarm: est F₂ ≥ this multiple of the uniform floor n²/w…
    * — a key distribution this far above uniform will hot-spot a
    * shuffle partition. */
  val F2SkewAlarm = 16.0

  /** Streaming join-size / F₂ monitor — the stateful twin of the batch
    * q_join_size_sketch: the SAME d×w count-min sketch carried as
    * flatMapGroupsWithState state (d·w long counters per monitored
    * stream, O(1) regardless of stream length; cell-wise addition IS the
    * merge, so micro-batches fold in exactly), keyed here by a stream
    * tag so several key-spaces can be watched by one query. Each batch
    * hashes the new keys into the cells (identical md5 row-hash family
    * as the batch sketch) and emits the running F₂ estimate (min over
    * rows of Σ cell²), the skew ratio est/(n²/w) — 1.0 = perfectly
    * uniform keys — and the ≥[[F2SkewAlarm]] salting alarm: the live
    * early warning that a user-keyed join downstream of this stream is
    * about to hot-spot, while the batch twin scores history. */
  case class KmvState(hashes: List[Long], n_rows: Long)
  case class KmvOut(stream: String, n_rows: Long, n_sketch: Int,
      est_distinct: Double, saturated: Boolean)

  /** Streaming KMV distinct-cardinality monitor — the stateful twin of
    * the batch q_kmv_intersect sketch (ScaleOps), the APPROXIMATE
    * sibling of [[runningDistinct]]'s exact bitmap (the bitmap is exact
    * but id-space-bounded; KMV is k longs for ANY key domain and
    * supports cross-set algebra): state is the k
    * smallest DISTINCT 48-bit md5 hashes of the keys seen so far (≤ k
    * longs per stream, O(1) in stream length; insertion is idempotent,
    * so replays and duplicates are free), emitting the running distinct
    * estimate (k−1)·2⁴⁸/h₍ₖ₎ — or the EXACT count while the sketch is
    * unsaturated, the same collapse rule as the batch twin. The hash is
    * bit-identical to the batch derivation (first 12 hex chars of
    * md5("u:"+id)), so a snapshot of this state IS a batch-compatible
    * KMV sketch: union/intersection algebra against batch sketches
    * works by construction. StreamingSpec pins exact-collapse,
    * duplicate-idempotence, and the saturated estimate against an
    * independent recomputation. */
  def runningKmvDistinct(keys: Dataset[TypedUser]): Dataset[KmvOut] = {
    import keys.sparkSession.implicits._
    val k = graft.operators.ScaleOps.KmvK
    keys.groupByKey(_.event_type)
      .flatMapGroupsWithState[KmvState, KmvOut](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        case (tag, rows, state: GroupState[KmvState]) =>
          var st = state.getOption.getOrElse(KmvState(Nil, 0L))
          val set = scala.collection.mutable.TreeSet.empty[Long] ++ st.hashes
          var n = st.n_rows
          val md = java.security.MessageDigest.getInstance("MD5")
          rows.foreach { r =>
            md.reset()
            val h = md.digest(s"u:${r.user_id}".getBytes("UTF-8"))
            val v = ((h(0) & 0xffL) << 40) | ((h(1) & 0xffL) << 32) |
              ((h(2) & 0xffL) << 24) | ((h(3) & 0xffL) << 16) |
              ((h(4) & 0xffL) << 8) | (h(5) & 0xffL)
            if (set.size < k) set += v
            else if (v < set.max && !set.contains(v)) { set -= set.max; set += v }
            n += 1L
          }
          state.update(KmvState(set.toList, n))
          if (n == 0) Iterator.empty
          else {
            val sat = set.size >= k
            val est = if (!sat) set.size.toDouble
              else (k - 1).toDouble * 281474976710656.0 / set.max
            Iterator(KmvOut(tag, n, set.size, est, sat))
          }
      }
  }

  def runningF2(keys: Dataset[TypedUser]): Dataset[F2Out] = {
    import keys.sparkSession.implicits._
    val (d, w) = (F2Depth, F2Width)
    keys.groupByKey(_.event_type)
      .flatMapGroupsWithState[CmsF2State, F2Out](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        case (tag, rows, state: GroupState[CmsF2State]) =>
          var st = state.getOption.getOrElse(
            CmsF2State(List.fill(d * w)(0L), 0L))
          val cells = st.cells.toArray
          var n = st.n
          val md = java.security.MessageDigest.getInstance("MD5")
          rows.foreach { r =>
            var j = 0
            while (j < d) {
              md.reset()
              val h = md.digest(s"$j:${r.user_id}".getBytes("UTF-8"))
              // first 4 md5 bytes as an unsigned int — the same
              // hex-prefix row hash the batch sketch keys on
              val b = (((h(0) & 0xffL) << 24) | ((h(1) & 0xffL) << 16) |
                ((h(2) & 0xffL) << 8) | (h(3) & 0xffL)) % w
              cells(j * w + b.toInt) += 1L
              j += 1
            }
            n += 1L
          }
          state.update(CmsF2State(cells.toList, n))
          if (n == 0) Iterator.empty
          else {
            val est = (0 until d).map { j =>
              (0 until w).map { b =>
                val c = cells(j * w + b).toDouble; c * c
              }.sum
            }.min
            val uniformFloor = n.toDouble * n / w
            val ratio = if (n > 0) est / uniformFloor else 0.0
            Iterator(F2Out(tag, n, est, ratio, ratio >= F2SkewAlarm))
          }
      }
  }

  /** One Greenwald–Khanna tuple: value, rank mass g, rank slack Δ. */
  case class GkEntry(v: Double, g: Long, d: Long)
  case class GkState(entries: List[GkEntry], n: Long)
  case class TrimOut(event_type: String, n: Long,
      lo: Double, hi: Double, trimmed_mean: Double)

  /** GK accuracy of the streaming quantile monitor (rank error ≤ ε·n). */
  val GkEps = 0.01

  /** Streaming GK-quantile / trimmed-mean monitor per event type — the
    * stateful twin of the batch RobustStats.qTrimmedMeanApprox (r13
    * verdict task 6): the SAME mergeable-sketch idea (bounded-memory
    * quantiles in one pass), here carried as flatMapGroupsWithState
    * state — a Greenwald–Khanna summary of (v, g, Δ) tuples, O(1/ε·log
    * εn) per key regardless of stream length. Each batch inserts its
    * values in seq order and compresses; the emission reads the p10/p90
    * cuts and a sketch-integrated 10%-trimmed mean (entry masses g
    * overlapped with the interior rank window [0.1n, 0.9n] — the
    * t-digest trimmed-mean construction). Guarantees (pinned by
    * StreamingSpec): reported cuts sit within rank ε·n + 2 of the exact
    * order statistics, and the trimmed mean lies inside [lo, hi]. */
  def runningTrimmedMean(values: Dataset[TypedValue]): Dataset[TrimOut] = {
    import values.sparkSession.implicits._
    val eps = GkEps
    def insert(st: GkState, x: Double): GkState = {
      val (before, after) = st.entries.span(_.v < x)
      val d = if (before.isEmpty || after.isEmpty) 0L
        else math.floor(2 * eps * st.n).toLong
      GkState(before ::: GkEntry(x, 1L, d) :: after, st.n + 1)
    }
    def compress(st: GkState): GkState = {
      // Standard GK keeps BOTH extremes exact: i > 0 protects the head
      // (minimum) entry from being merged away, len > 1 protects the
      // last (maximum) entry's slot. `len` tracks the built-list length
      // as a counter — List.size inside the fold was O(n) per element,
      // making each compress O(n²) in sketch size (r16 ADVICE).
      val cap = math.max(1L, math.floor(2 * eps * st.n).toLong)
      val (merged, _) = st.entries.zipWithIndex
        .foldRight((List.empty[GkEntry], 0)) { case ((e, i), (acc, len)) =>
          acc match {
            case next :: rest if i > 0 && len > 1 &&
                e.g + next.g + next.d < cap =>
              (GkEntry(next.v, e.g + next.g, next.d) :: rest, len)
            case _ => (e :: acc, len + 1)
          }
        }
      GkState(merged, st.n)
    }
    def cut(st: GkState, q: Double): Double = {
      // standard GK query: first entry whose rank envelope [rmin, rmax]
      // covers the target within ±εn on BOTH sides
      val r = math.max(1L, math.ceil(q * st.n).toLong)
      val e = eps * st.n
      var rmin = 0L
      var res = st.entries.last.v
      var found = false
      st.entries.foreach { en =>
        rmin += en.g
        if (!found && rmin + en.d - e <= r && r <= rmin + e) {
          res = en.v; found = true
        }
      }
      res
    }
    def trimmedMean(st: GkState, trim: Double): Double = {
      val loR = trim * st.n
      val hiR = (1 - trim) * st.n
      var rmin = 0L
      var wsum = 0.0
      var vsum = 0.0
      st.entries.foreach { en =>
        val a = rmin.toDouble
        val b = (rmin + en.g).toDouble
        val w = math.max(0.0, math.min(b, hiR) - math.max(a, loR))
        wsum += w; vsum += w * en.v
        rmin += en.g
      }
      if (wsum > 0) vsum / wsum else st.entries.head.v
    }
    values.groupByKey(_.event_type)
      .flatMapGroupsWithState[GkState, TrimOut](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        case (et, rows, state: GroupState[GkState]) =>
          var cur = state.getOption.getOrElse(GkState(Nil, 0L))
          var sinceCompress = 0
          rows.toSeq.sortBy(_.seq).foreach { r =>
            cur = insert(cur, r.value)
            sinceCompress += 1
            if (sinceCompress >= math.max(8, (1 / (2 * eps)).toInt)) {
              cur = compress(cur); sinceCompress = 0
            }
          }
          cur = compress(cur)
          state.update(cur)
          if (cur.n == 0) Iterator.empty
          else Iterator(TrimOut(et, cur.n,
            cut(cur, 0.1), cut(cur, 0.9), trimmedMean(cur, 0.1)))
      }
  }

  case class FunnelEvent(user_id: Long, event_type: String, us: Long)
  case class FunnelState(stepReached: Int, tStep: Long)
  case class FunnelUser(user_id: Long, step_reached: Int, t_step: Long)

  /** Per-step window of the streaming funnel (the batch twin's 7 days). */
  val FunnelWindowUs: Long = 7L * 24 * 3600 * 1000000L

  /** Streaming strict-order funnel — the stateful twin of the batch
    * Relational.qFunnelSteps: per user ONE (stepReached, tStep) pair
    * regardless of stream length, advanced greedily in event-time order
    * (rows sorted by us within a batch; the greedy first-qualifying
    * advance equals the batch's chained conditional mins — both take the
    * EARLIEST event of the next step inside the window). A step-k event
    * advances only when step k−1 is complete and the event lands in
    * (tStep, tStep + 7d]; everything else is ignored, so a purchase
    * without a click never advances — the strictness q_funnel's 2-step
    * shape can't express. Emits the user's current (step_reached,
    * t_step); the per-step counts the batch twin reports are one
    * grouped count over this output (kept OUT of the stream — stacking
    * a second stateful aggregate behind fMGWS is the multi-stateful-op
    * seam Structured Streaming restricts). */
  def runningFunnel(events: Dataset[FunnelEvent]): Dataset[FunnelUser] = {
    import events.sparkSession.implicits._
    val steps = graft.operators.Relational.FunnelSteps
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, FunnelUser](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        case (uid, rows, state: GroupState[FunnelState]) =>
          var cur = state.getOption.getOrElse(FunnelState(0, 0L))
          rows.toSeq.sortBy(_.us).foreach { e =>
            if (cur.stepReached < steps.size &&
              e.event_type == steps(cur.stepReached) &&
              (cur.stepReached == 0 ||
                (e.us > cur.tStep && e.us <= cur.tStep + FunnelWindowUs)))
              cur = FunnelState(cur.stepReached + 1, e.us)
          }
          state.update(cur)
          if (cur.stepReached == 0) Iterator.empty
          else Iterator(FunnelUser(uid, cur.stepReached, cur.tStep))
      }
  }

  case class RunsState(n: Long, nUp: Long, runs: Long,
      prevVal: Double, hasVal: Boolean, prevSign: Int)
  case class RunsOut(event_type: String, n: Long, n_up: Long, n_down: Long,
      runs: Long, z: Option[Double], significant: Option[Boolean])

  /** Streaming Wald–Wolfowitz runs monitor per event type — the stateful
    * twin of the batch Stats.qRunsTest: the IDENTICAL direction
    * recursion (zero changes excluded by exact equality, runs counted
    * at sign breaks, first retained sign opens run one), carried as ONE
    * (n, nUp, runs, prevVal, prevSign) tuple per key regardless of
    * stream length — the exchangeability alarm a pipeline runs against
    * a live metric while the batch twin scores history. The same
    * moments and DunnZCrit(1) gate as the batch; degenerate (one-sided
    * or too-short) sequences emit None, never a fabricated z. Rows are
    * processed in seq order within a batch (caller orders; production
    * carries event-time); state persists across micro-batches. */
  def runningRuns(values: Dataset[TypedValue]): Dataset[RunsOut] = {
    import values.sparkSession.implicits._
    values.groupByKey(_.event_type)
      .flatMapGroupsWithState[RunsState, RunsOut](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        case (et, rows, state: GroupState[RunsState]) =>
          var cur = state.getOption.getOrElse(
            RunsState(0L, 0L, 0L, 0.0, hasVal = false, 0))
          rows.toSeq.sortBy(_.seq).foreach { r =>
            if (cur.hasVal && r.value != cur.prevVal) {
              val sgn = if (r.value > cur.prevVal) 1 else -1
              cur = RunsState(cur.n + 1,
                cur.nUp + (if (sgn == 1) 1L else 0L),
                cur.runs + (if (cur.prevSign == 0 || sgn != cur.prevSign) 1L else 0L),
                r.value, hasVal = true, sgn)
            } else cur = cur.copy(prevVal = r.value, hasVal = true)
          }
          state.update(cur)
          val n = cur.n; val n1 = cur.nUp; val n2 = n - n1
          val zOpt =
            if (n1 > 0 && n2 > 0 && n > 1) {
              val p = 2.0 * n1 * n2
              val e = p / n + 1.0
              val v = p * (p - n) / (n.toDouble * n * (n - 1))
              if (v > 0) Some((cur.runs - e) / math.sqrt(v)) else None
            } else None
          Iterator(RunsOut(et, n, n1, n2, cur.runs, zOpt,
            zOpt.map(z => math.abs(z) > graft.operators.RobustStats.DunnZCrit(1))))
      }
  }

  case class TdIn(key: String, v: Double)
  case class TdEmit(key: String, n: Long, vmin: Double, vmax: Double,
      p50: Double, p95: Double, sketch: Array[Byte])

  /** Streaming t-digest percentile monitor — the stateful twin of the
    * batch q_tdigest panel and the quantile member of the
    * streaming-sketch monitor family (KMV distinct 68s, space-saving
    * heavy hitters 65k, histogram drift 67j): state per key is ONE
    * serialized [[graft.functions.TDigestAgg]] wire-format sketch —
    * O(compression) bytes regardless of stream length — updated in
    * place each micro-batch; emits the running exact n/min/max, the
    * p50/p95 estimates, and the snapshot ITSELF. Because the state is
    * the batch aggregate's own wire format, a snapshot composes with
    * batch-built sketches through tdigest_merge_agg — a day's stream
    * monitor state IS that day's sketch-table row, so the streaming and
    * batch rollup worlds share one artifact (the same property 68s
    * pins for KMV). Same per-key event-time convention as the other
    * monitors; replay of an unacknowledged batch double-counts, the
    * documented flatMapGroupsWithState seam (36c's idempotent sink is
    * the production answer). */
  def runningTDigest(events: Dataset[TdIn], k: Int = graft.functions.TDigestSketch.DefaultK): Dataset[TdEmit] = {
    import events.sparkSession.implicits._
    import org.apache.datasketches.memory.Memory
    import org.apache.datasketches.tdigest.TDigestDouble
    events.groupByKey(_.key)
      .flatMapGroupsWithState[Array[Byte], TdEmit](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        case (key, rows, state: GroupState[Array[Byte]]) =>
          val td = state.getOption
            .map(b => TDigestDouble.heapify(Memory.wrap(b)))
            .getOrElse(new TDigestDouble(k.toShort))
          rows.foreach(r => td.update(r.v))
          val bytes = td.toByteArray
          state.update(bytes)
          Iterator.single(TdEmit(key, td.getTotalWeight,
            td.getMinValue, td.getMaxValue,
            td.getQuantile(0.5), td.getQuantile(0.95), bytes))
      }
  }

  case class DayUser(user_id: Long, day: String)
  case class NvrState(first_day: String, emitted: List[String])
  case class NvrEmit(day: String, user_id: Long, is_new: Boolean)

  /** Streaming new-vs-returning monitor — the stateful twin of the batch
    * q_new_vs_returning growth panel (r16 verdict task 5). Keyed by
    * user: state is the user's first-seen day plus the days already
    * emitted, so each (user, day) classification is emitted EXACTLY once
    * — is_new ⇔ the day equals the user's first-seen day. A per-day
    * dashboard is then one stateless rollup of this stream (n_active =
    * rows per day, n_new = is_new rows — the spec pins that rollup to
    * the batch twin across a micro-batch boundary).
    *
    * State bound: first_day is O(1) forever (the actual new/returning
    * decision); the emitted-day dedup list is bounded by the user's
    * active-day horizon and in production would be trimmed by a
    * GroupStateTimeout at the dashboard's retention (the decision needs
    * only first_day, so trimming can never flip a classification).
    * Assumes per-user event-time-ordered arrival across batches (the
    * runningUserEwma convention): a user's FIRST-ever day arriving
    * after a later day would need a retraction to reclassify. */
  def runningNewVsReturning(events: Dataset[DayUser]): Dataset[NvrEmit] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[NvrState, NvrEmit](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        case (uid, rows, state: GroupState[NvrState]) =>
          val days = rows.map(_.day).toSeq.distinct.sorted
          val st = state.getOption.getOrElse(
            NvrState(days.head, Nil))
          val firstDay = if (st.first_day <= days.head) st.first_day else days.head
          val fresh = days.filterNot(st.emitted.contains)
          state.update(NvrState(firstDay, st.emitted ++ fresh))
          fresh.iterator.map(d => NvrEmit(d, uid, d == firstDay))
      }
  }

  case class SrmSeen(seen: Boolean)
  case class SrmEmit(user_id: Long, treat: Boolean)

  /** Streaming sample-ratio-mismatch feed — the stateful twin of batch
    * q_srm run the way an experimentation platform actually watches it:
    * each user's arm assignment (the same md5 rule as the batch gate) is
    * emitted EXACTLY once on first sight (state = one boolean per user),
    * and the SRM panel is a stateless rollup of this stream — running
    * arm counts plus the χ² excess, comparable against the pinned
    * critical value on every refresh. The spec rolls the emissions up
    * across a micro-batch boundary and pins (n_a, n_b, χ²) to the batch
    * q_srm row. */
  def runningSrmFeed(users: Dataset[java.lang.Long]): Dataset[SrmEmit] = {
    import users.sparkSession.implicits._
    def md5n(x: Long): Int = Integer.parseInt(java.security.MessageDigest
      .getInstance("MD5").digest(x.toString.getBytes("UTF-8"))
      .take(1).map("%02x".format(_)).mkString.take(1), 16)
    users.groupByKey(_.longValue())
      .flatMapGroupsWithState[SrmSeen, SrmEmit](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        case (uid, _, state: GroupState[SrmSeen]) =>
          if (state.exists) Iterator.empty
          else {
            state.update(SrmSeen(true))
            Iterator(SrmEmit(uid, md5n(uid) < 8))
          }
      }
  }

  case class GaState(last_epoch_day: Long)
  case class GaEmit(day: String, user_id: Long, cls: String)

  /** Streaming growth-accounting monitor — the stateful twin of batch
    * q_growth_accounting. State per user = ONE long (last active epoch
    * day): each new (user, day) is classified exactly once as
    * new / retained (yesterday) / resurrected (after a gap), and the
    * growth panel is a stateless per-day rollup of this stream (churn is
    * then derived as dau_prev − n_retained, exactly the batch twin's
    * definition — the spec pins the rollup to the batch panel across a
    * micro-batch boundary). Same-day repeats are no-ops; in-batch rows
    * process in day order; ordered arrival across batches per the
    * runningUserEwma convention. */
  def runningGrowthAccounting(events: Dataset[DayUser]): Dataset[GaEmit] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[GaState, GaEmit](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        case (uid, rows, state: GroupState[GaState]) =>
          var last = state.getOption.map(_.last_epoch_day).getOrElse(Long.MinValue)
          val out = scala.collection.mutable.ArrayBuffer.empty[GaEmit]
          rows.map(_.day).toSeq.distinct.sorted.foreach { d =>
            val ed = java.time.LocalDate.parse(d).toEpochDay
            if (ed > last) {
              val cls =
                if (last == Long.MinValue) "new"
                else if (ed == last + 1L) "retained"
                else "resurrected"
              out += GaEmit(d, uid, cls)
              last = ed
            }
          }
          state.update(GaState(last))
          out.iterator
      }
  }

  case class PathEvent(user_id: Long, event_type: String, us: Long)
  case class PathState(e1: String, e2: String, last_us: Long)
  case class PathEmit(user_id: Long, e1: String, e2: String, e3: String)

  /** Streaming session-path monitor — the stateful twin of batch
    * q_paths. State per user = the last TWO event types plus the last
    * event instant (three fields, O(1) forever): on each event, a gap
    * beyond the 30-min session threshold clears the carried pair (paths
    * never stitch across sessions — the batch fixture's invariant), a
    * completed (prev2, prev1, current) trigram is emitted exactly once,
    * then the pair shifts. The journey dashboard is one stateless
    * rollup + top-k of this stream; the spec pins that rollup to the
    * batch twin's pre-limit trigram counts across a micro-batch
    * boundary. In-batch rows are processed in event-time order (the
    * runningUserEwma ordered-arrival convention). */
  def runningPaths(events: Dataset[PathEvent]): Dataset[PathEmit] = {
    import events.sparkSession.implicits._
    val gapUs = 1800L * 1000000L
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[PathState, PathEmit](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        case (uid, rows, state: GroupState[PathState]) =>
          var st = state.getOption.getOrElse(PathState(null, null, Long.MinValue))
          val out = scala.collection.mutable.ArrayBuffer.empty[PathEmit]
          rows.toSeq.sortBy(_.us).foreach { e =>
            val inSession = st.last_us != Long.MinValue && e.us - st.last_us <= gapUs
            val (p1, p2) = if (inSession) (st.e1, st.e2) else (null, null)
            if (p1 != null && p2 != null) out += PathEmit(uid, p1, p2, e.event_type)
            st = PathState(p2, e.event_type, e.us)
          }
          state.update(st)
          out.iterator
      }
  }

  case class DocSeen(doc_id: Long, lang: String)
  case class BkEntry(h: String, doc_id: Long)
  case class BkState(entries: List[BkEntry], n_seen: Long)
  case class BkEmit(lang: String, n_seen: Long, n_kept: Int,
    hashes: Seq[String], doc_ids: Seq[Long])

  /** Streaming deterministic uniform sample — the stateful twin of batch
    * q_sample_fixed's bottom-k-by-md5 reservoir. State per language =
    * the k smallest (md5(doc_id), doc_id) entries plus an exact seen
    * count — O(k) forever, and MERGEABLE: the union's bottom-k is the
    * bottom-k of the per-key states' union, so per-lang monitor shards
    * recombine into the exact global sample (the spec does exactly that
    * merge and pins it to the batch twin). The hash is the same
    * lowercase md5 hex Spark's `md5()` emits, so streaming state and
    * batch sample tables share one keying. */
  def runningSample(docs: Dataset[DocSeen],
      k: Int = graft.operators.TextAnalysis.SampleFixedK): Dataset[BkEmit] = {
    import docs.sparkSession.implicits._
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    docs.groupByKey(_.lang)
      .flatMapGroupsWithState[BkState, BkEmit](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        case (lang, rows, state: GroupState[BkState]) =>
          val st = state.getOption.getOrElse(BkState(Nil, 0L))
          var n = st.n_seen
          val merged = scala.collection.mutable.ArrayBuffer(st.entries: _*)
          rows.foreach { r =>
            n += 1L
            merged += BkEntry(md5hex(r.doc_id.toString), r.doc_id)
          }
          val kept = merged.distinct.sortBy(e => (e.h, e.doc_id)).take(k).toList
          state.update(BkState(kept, n))
          Iterator(BkEmit(lang, n, kept.length,
            kept.map(_.h), kept.map(_.doc_id)))
      }
  }

  case class StreakState(last_epoch_day: Long, cur_len: Long, best_len: Long)
  case class StreakOut(user_id: Long, last_day: String, cur_streak: Long,
    best_streak: Long)

  /** Streaming activity-streak monitor — the stateful twin of the batch
    * q_streaks gaps-and-islands query. State per user = THREE longs
    * (last active epoch day, current run length, best run length) — the
    * O(1) fact the batch query re-derives by sorting each user's whole
    * history; the engagement panel (streak-length distribution) is one
    * stateless rollup of the latest emission per user. Same-day repeats
    * are idempotent; a gap resets the current run; rows within a batch
    * are processed in day order so the micro-batch boundary is
    * immaterial; a late (earlier-day) arrival is ignored — the monitor
    * is forward-watching, matching the runningUserEwma ordered-arrival
    * convention. */
  def runningStreaks(events: Dataset[DayUser]): Dataset[StreakOut] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[StreakState, StreakOut](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        case (uid, rows, state: GroupState[StreakState]) =>
          var cur = state.getOption.getOrElse(StreakState(Long.MinValue, 0L, 0L))
          rows.toSeq.sortBy(_.day).foreach { e =>
            val d = java.time.LocalDate.parse(e.day).toEpochDay
            if (cur.cur_len == 0L)
              cur = StreakState(d, 1L, math.max(1L, cur.best_len))
            else if (d == cur.last_epoch_day + 1L)
              cur = StreakState(d, cur.cur_len + 1L,
                math.max(cur.cur_len + 1L, cur.best_len))
            else if (d > cur.last_epoch_day)
              cur = StreakState(d, 1L, cur.best_len)
            // d <= last_epoch_day: same-day repeat or late arrival — no-op
          }
          state.update(cur)
          Iterator(StreakOut(uid,
            java.time.LocalDate.ofEpochDay(cur.last_epoch_day).toString,
            cur.cur_len, cur.best_len))
      }
  }

  /** Streaming peak-concurrency dashboard refresh — the stateful twin of
    * batch q_concurrency (r16 verdict task 5). Two composed pieces, each
    * already load-bearing elsewhere in the library:
    *
    *  1. session_window sessionization in APPEND mode: a (user, session)
    *     row with its (st_us, en_us) sweep boundaries is emitted exactly
    *     once, only after the watermark passes end + gap — every row
    *     FINAL, sessions merged across micro-batch boundaries first
    *     (en_us = the last EVENT instant via max(us), matching the batch
    *     twin's boundary, not the gap-padded window end);
    *  2. a foreachBatch incremental-MV refresh (the 36c exactly-once
    *     sink + 59n q_incr_agg delta rule): closed sessions MERGE into a
    *     keyed store — replay-idempotent because the key (user, st_us)
    *     makes a re-delivered batch a no-op — and the dashboard re-runs
    *     Relational.concurrencySweep, the IDENTICAL distributed
    *     arithmetic as the batch query, over the store.
    *
    * The in-memory TrieMap store stands in for the production MERGE INTO
    * keyed table (q_merge_upsert) so the spec can observe it; the sweep
    * itself runs distributed either way. Refresh cost: a full sweep per
    * trigger here; production recomputes forward from the earliest
    * touched day only (peaks before it cannot change — cum_before is
    * fixed once its prefix is), the documented q_incr_agg delta. */
  def concurrencyRefresh(events: DataFrame,
      store: scala.collection.concurrent.TrieMap[(Long, Long), Long],
      peaks: scala.collection.concurrent.TrieMap[String, (Long, Long)]) = {
    val sess = events
      .withWatermark("ts", "1 hour")
      .groupBy(session_window(col("ts"), "30 minutes").as("sw"), col("user_id"))
      .agg(max(unix_micros(col("ts"))).as("en_us"))
      .select(col("user_id"), unix_micros(col("sw.start")).as("st_us"),
        col("en_us"))
    sess.writeStream.outputMode("append")
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        val s = batch.sparkSession
        batch.collect().foreach { r =>  // closed sessions only: day-bounded
          store.put((r.getAs[Long]("user_id"), r.getAs[Long]("st_us")),
            r.getAs[Long]("en_us"))
        }
        if (store.nonEmpty) {
          import s.implicits._
          val sessDf = store.toSeq
            .map { case ((u, st), en) => (u, st, en) }
            .toDF("user_id", "st_us", "en_us")
          graft.operators.Relational.concurrencySweep(sessDf).collect()
            .foreach { r =>
              peaks.put(r.getAs[String]("day"),
                (r.getAs[Long]("peak_concurrent"), r.getAs[Long]("n_started")))
            }
        }
      }
      .start()
  }

  case class SymObs(event_type: String, seq: Long, obs: Int)
  case class RegimeState(n: Long, d0: Double, d1: Double, d2: Double)
  case class RegimeOut(event_type: String, n: Long, regime: Int, lp: Double)

  /** Streaming HMM regime FILTER per event type — the stateful twin of
    * the batch Viterbi decoder (Stats.qViterbi): the IDENTICAL
    * log-domain forward recursion over the pinned [[graft.operators
    * .Stats.HmmTrans]]/[[graft.operators.Stats.HmmEmit]] literals, state
    * = exactly the current trellis column (three doubles) — O(1) per key
    * forever. The relationship is the textbook filtering-vs-smoothing
    * split: the stream's day-t column equals the batch trellis's dp[t]
    * BIT-FOR-BIT (StreamingSpec pins it across a micro-batch boundary),
    * and its emitted regime is the causal argmax of that column, while
    * the batch path may later REVISE earlier days with hindsight —
    * that's Viterbi's job, not a monitor's. Symbols arrive pre-bucketed
    * (the batch symbolizer needs the full-window mean; a live monitor
    * feeds its own reference mean). */
  def runningRegime(obs: Dataset[SymObs]): Dataset[RegimeOut] = {
    import obs.sparkSession.implicits._
    val lnPi0 = math.log(graft.operators.Stats.HmmPi(0))
    val lnT = graft.operators.Stats.HmmTrans.map(_.map(math.log))
    val lnE = graft.operators.Stats.HmmEmit.map(_.map(math.log))
    obs.groupByKey(_.event_type)
      .flatMapGroupsWithState[RegimeState, RegimeOut](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        case (et, rows, state: GroupState[RegimeState]) =>
          var cur = state.getOption.getOrElse(RegimeState(0L, 0.0, 0.0, 0.0))
          rows.toSeq.sortBy(_.seq).foreach { r =>
            cur =
              if (cur.n == 0L)
                RegimeState(1L, lnE(0)(r.obs) + lnPi0,
                  lnE(1)(r.obs) + lnPi0, lnE(2)(r.obs) + lnPi0)
              else {
                val prev = Array(cur.d0, cur.d1, cur.d2)
                def nd(s2: Int) = lnE(s2)(r.obs) +
                  math.max(prev(0) + lnT(0)(s2),
                    math.max(prev(1) + lnT(1)(s2), prev(2) + lnT(2)(s2)))
                RegimeState(cur.n + 1, nd(0), nd(1), nd(2))
              }
          }
          state.update(cur)
          val regime =
            if (cur.d0 >= cur.d1 && cur.d0 >= cur.d2) 0
            else if (cur.d1 >= cur.d2) 1 else 2
          val lp = math.max(cur.d0, math.max(cur.d1, cur.d2))
          Iterator(RegimeOut(et, cur.n, regime, lp))
      }
  }
}
