package graft

import graft.streaming.EventStream
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Dataset, Row}

import java.nio.file.{Files, Path, Paths}
import java.sql.Timestamp
import scala.reflect.io.Directory

/** Driver-side emission buffers for the recovery tests: the memory sink
  * deliberately REFUSES checkpoint recovery (it is not fault-tolerant),
  * so the recoverable sink in these specs is foreachBatch — exactly the
  * sink shape production uses — landing each micro-batch's rows in a
  * named buffer the assertions read. */
object RecoverySink {
  private val buf =
    scala.collection.mutable.Map.empty[String, Vector[Row]]
  def add(name: String, rows: Array[Row]): Unit = synchronized {
    buf(name) = buf.getOrElse(name, Vector.empty) ++ rows
  }
  def rows(name: String): Vector[Row] = synchronized {
    buf.getOrElse(name, Vector.empty)
  }
  def clear(name: String): Unit = synchronized { buf.remove(name) }
}

/** Checkpoint-recovery contract (r18 verdict task 3): every
  * StreamingSpec case drives one uninterrupted MemoryStream session, but
  * a real 100 TB monitor dies and RESUMES — the property production
  * actually relies on is that the state store, the source offsets and
  * the watermark all come back from the checkpoint, and that a batch
  * replayed after a failure between sink write and checkpoint commit
  * lands idempotently. This spec stops live queries mid-stream and
  * restarts the SAME plan from the SAME checkpoint dir:
  *
  *  - flatMapGroupsWithState (running totals): state recovered, totals
  *    continue across the restart exactly as the uninterrupted run;
  *  - the exactly-once foreachBatch parquet sink: a forced REPLAY
  *    (the last commit marker is deleted, so the restart re-executes
  *    the batch with the same batch id) overwrites its own partition
  *    instead of duplicating rows;
  *  - the chained session→day dashboard (two stateful operators):
  *    session store, day store and watermark all recover, and the
  *    post-restart emissions equal the uninterrupted run's.
  *
  * Every STATEFUL case runs on BOTH state-store providers (r19 verdict
  * task 2): the default HDFS-backed in-memory provider AND
  * RocksDBStateStoreProvider with changelog checkpointing — the store a
  * 100 TB monitor actually configures first (state larger than executor
  * memory, changelogs instead of full snapshot uploads per batch).
  * Recovery semantics must be provider-independent; the RocksDB leg
  * pins that the checkpoint layout it writes (changelog files + zip
  * snapshots) resumes just like the HDFS-backed one.
  *
  * MemoryStream retains its buffer across query restarts, so the
  * committed-offset log decides exactly what is replayed — the same
  * contract a durable source (Kafka/files) gives a resumed query. */
class CheckpointRecoverySpec extends SparkSpec {
  import spark.implicits._

  private val RocksProvider =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
  private val ProviderKey = "spark.sql.streaming.stateStore.providerClass"
  private val ChangelogKey =
    "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled"

  /** Both legs of the provider matrix: None = session default
    * (HDFS-backed in-memory), Some(cls) = the named provider. */
  private val Providers: Seq[(String, Option[String])] = Seq(
    "HDFS-backed store" -> None,
    "RocksDB store + changelog checkpointing" -> Some(RocksProvider))

  /** Run `body` with the state-store provider pinned for every query
    * started inside (the provider is captured at query START and must
    * stay the same across restarts of one checkpoint — which this
    * wrapper guarantees by scoping both the run and the resume). */
  private def withProvider(provider: Option[String])(body: => Unit): Unit =
    provider match {
      case None => body
      case Some(cls) =>
        spark.conf.set(ProviderKey, cls)
        spark.conf.set(ChangelogKey, "true")
        try body
        finally {
          spark.conf.unset(ProviderKey)
          spark.conf.unset(ChangelogKey)
        }
    }

  private def tmpDir(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private def rmrf(p: String): Unit =
    new Directory(new java.io.File(p)).deleteRecursively()

  /** Crash the query between sink write and checkpoint commit: drop the
    * newest commit marker (and its checksum sibling) so the restarted
    * query re-executes that batch with the SAME batch id. */
  private def dropLatestCommit(ckpt: String): Unit = {
    val commits = Paths.get(ckpt, "commits")
    val listing = Files.list(commits)
    val latest =
      try listing.toArray.map(_.asInstanceOf[Path])
        .filter(p => p.getFileName.toString.forall(_.isDigit))
        .maxBy(_.getFileName.toString.toLong)
      finally listing.close()
    Files.delete(latest)
    val crc = latest.resolveSibling("." + latest.getFileName + ".crc")
    Files.deleteIfExists(crc)
  }

  private def fmgwsRecoveryCase(sink: String): Unit = {
    implicit val sqlCtx = spark.sqlContext
    val ckpt = tmpDir("graft-rec-fmgws")
    RecoverySink.clear(sink)
    try {
      val input = MemoryStream[EventStream.UserEvent]
      def start() = EventStream.runningUserTotals(input.toDS())
        .toDF().writeStream
        .option("checkpointLocation", ckpt)
        .outputMode("update")
        .foreachBatch { (b: Dataset[Row], _: Long) =>
          RecoverySink.add(sink, b.collect())
        }
        .start()

      val q1 = start()
      try {
        input.addData(EventStream.UserEvent(7L, "click", 2.0),
          EventStream.UserEvent(7L, "view", 3.0))
        q1.processAllAvailable()
        val mid = RecoverySink.rows(sink)
          .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
          .maxBy(_._2)
        assert(mid === ((7L, 2L, 5.0)))
      } finally q1.stop()

      // the monitor "dies"; a new incarnation resumes from the checkpoint
      val q2 = start()
      try {
        input.addData(EventStream.UserEvent(7L, "click", 5.0))
        q2.processAllAvailable()
        val fin = RecoverySink.rows(sink)
          .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
          .maxBy(_._2)
        // identical to StreamingSpec's uninterrupted run: 3 events, 10.0
        assert(fin === ((7L, 3L, 10.0)),
          "state store must resume from the checkpoint, not restart at zero")
      } finally q2.stop()
    } finally { rmrf(ckpt); RecoverySink.clear(sink) }
  }

  private def dedupRecoveryCase(sink: String): Unit = {
    implicit val sqlCtx = spark.sqlContext
    val ckpt = tmpDir("graft-rec-dedup")
    RecoverySink.clear(sink)
    try {
      val input = MemoryStream[(Timestamp, Long, String)]
      def start() = EventStream.dedupedDocs(
        input.toDF().toDF("ts", "doc_id", "text"))
        .writeStream
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .foreachBatch { (b: Dataset[Row], _: Long) =>
          RecoverySink.add(sink, b.collect())
        }
        .start()

      val q1 = start()
      try {
        input.addData(
          (Timestamp.valueOf("2024-01-01 01:00:00"), 1L, "same text"),
          (Timestamp.valueOf("2024-01-01 01:00:02"), 3L, "other text"))
        q1.processAllAvailable()
        assert(RecoverySink.rows(sink).size === 2)
      } finally q1.stop()

      val q2 = start()
      try {
        // the duplicate arrives only AFTER the resume, inside the
        // watermark horizon: the recovered dedup store must drop it,
        // while a genuinely new doc still passes
        input.addData(
          (Timestamp.valueOf("2024-01-01 01:00:01"), 2L, "same text"),
          (Timestamp.valueOf("2024-01-01 01:00:03"), 4L, "third text"))
        q2.processAllAvailable()
        val texts = RecoverySink.rows(sink)
          .map(_.getAs[String]("text")).sorted
        assert(texts === Vector("other text", "same text", "third text"),
          "recovered dedup state must drop the re-delivered duplicate")
      } finally q2.stop()
    } finally { rmrf(ckpt); RecoverySink.clear(sink) }
  }

  private def dashboardRecoveryCase(sink: String): Unit = {
    implicit val sqlCtx = spark.sqlContext
    val ckpt = tmpDir("graft-rec-dash")
    RecoverySink.clear(sink)
    try {
      val input = MemoryStream[(Timestamp, Long)]
      def start() = EventStream.sessionDashboard(
        input.toDF().toDF("ts", "user_id"))
        .writeStream
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .foreachBatch { (b: Dataset[Row], _: Long) =>
          RecoverySink.add(sink, b.collect())
        }
        .start()

      val q1 = start()
      try {
        // batch 1: user 7 opens a session; user 8 bounces
        input.addData(
          (Timestamp.valueOf("2024-01-01 01:00:00"), 7L),
          (Timestamp.valueOf("2024-01-01 01:10:00"), 7L),
          (Timestamp.valueOf("2024-01-01 02:00:00"), 8L))
        q1.processAllAvailable()
        assert(RecoverySink.rows(sink).isEmpty) // nothing final yet
      } finally q1.stop()

      // restart: user 7's session must CONTINUE from the recovered
      // session store (10-min gap), not open a second session — and the
      // recovered watermark must still gate emission
      val q2 = start()
      try {
        input.addData((Timestamp.valueOf("2024-01-01 01:20:00"), 7L))
        q2.processAllAvailable()
        assert(RecoverySink.rows(sink).isEmpty,
          "recovered watermark must still gate emission")
        // watermark pushers (same as StreamingSpec's uninterrupted run)
        input.addData((Timestamp.valueOf("2024-01-04 12:00:00"), 9L))
        q2.processAllAvailable()
        input.addData((Timestamp.valueOf("2024-01-04 12:01:00"), 9L))
        q2.processAllAvailable()
        val out = RecoverySink.rows(sink)
          .map(r => (r.getString(0), (r.getLong(1), r.getLong(2),
            r.getDouble(3), r.getDouble(4)))).toMap
        // byte-identical to the uninterrupted run: 2 sessions (user 7
        // depth 3 MERGED across the restart, user 8 bounce), rate 0.5
        assert(out.keySet === Set("2024-01-01"))
        assert(out("2024-01-01") === ((2L, 1L, 0.5, 2.0)),
          "session store / day store must merge across the restart")
      } finally q2.stop()
    } finally { rmrf(ckpt); RecoverySink.clear(sink) }
  }

  private def outerJoinRecoveryCase(sink: String): Unit = {
    implicit val sqlCtx = spark.sqlContext
    val ckpt = tmpDir("graft-rec-outer")
    RecoverySink.clear(sink)
    try {
      val clicks = MemoryStream[(Timestamp, Long)]
      val purchases = MemoryStream[(Timestamp, Long, Long)]
      def start() = EventStream.clicksBeforePurchaseOuter(
        clicks.toDF().toDF("ts", "user_id"),
        purchases.toDF().toDF("ts", "user_id", "event_id"))
        .writeStream
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .foreachBatch { (b: Dataset[Row], _: Long) =>
          RecoverySink.add(sink, b.collect())
        }
        .start()

      val q1 = start()
      try {
        // an unmatched purchase enters the join state, then the monitor dies
        purchases.addData((Timestamp.valueOf("2024-01-01 10:20:00"), 2L, 200L))
        clicks.addData((Timestamp.valueOf("2024-01-01 10:20:00"), 1L))
        q1.processAllAvailable()
        assert(!RecoverySink.rows(sink).exists(_.getLong(0) == 200L),
          "no null emission before the watermark can prove absence")
      } finally q1.stop()

      // resume: the buffered purchase must still be in the recovered
      // join state, and watermark advance after the restart must emit
      // its null row exactly once
      val q2 = start()
      try {
        clicks.addData((Timestamp.valueOf("2024-01-01 13:00:00"), 9L))
        purchases.addData((Timestamp.valueOf("2024-01-01 13:00:00"), 9L, 900L))
        q2.processAllAvailable()
        clicks.addData((Timestamp.valueOf("2024-01-01 13:01:00"), 9L))
        purchases.addData((Timestamp.valueOf("2024-01-01 13:01:00"), 9L, 901L))
        q2.processAllAvailable()
        val for200 = RecoverySink.rows(sink).filter(_.getLong(0) == 200L)
        assert(for200.size === 1,
          "the recovered outer-join state must emit the null row exactly once")
        assert(for200.head.isNullAt(3),
          "the click side must be null for the unmatched purchase")
      } finally q2.stop()
    } finally { rmrf(ckpt); RecoverySink.clear(sink) }
  }

  // ---- the stateful recovery matrix: every case × every provider ----

  for (((tag, provider), i) <- Providers.zipWithIndex) {
    test(s"flatMapGroupsWithState recovers per-user totals from the " +
      s"checkpoint: stop after batch 1, resume, batch 2 continues [$tag]") {
      withProvider(provider)(fmgwsRecoveryCase(s"ut_rec_$i"))
    }

    test(s"watermark-dedup state recovers: a duplicate re-delivered AFTER " +
      s"the restart is still dropped [$tag]") {
      withProvider(provider)(dedupRecoveryCase(s"dd_rec_$i"))
    }

    test(s"chained session->day dashboard recovers BOTH stateful operators " +
      s"and the watermark [$tag]") {
      withProvider(provider)(dashboardRecoveryCase(s"dash_rec_$i"))
    }

    test(s"LEFT OUTER interval join recovers its buffered side: the null " +
      s"row for a pre-restart unmatched purchase emits exactly once, " +
      s"after the post-restart watermark advance [$tag]") {
      withProvider(provider)(outerJoinRecoveryCase(s"outer_rec_$i"))
    }
  }

  test("the RocksDB leg really ran on RocksDB: the checkpoint state dir " +
    "carries the RocksDB layout (changelog/zip files, not HDFS .delta)") {
    implicit val sqlCtx = spark.sqlContext
    val ckpt = tmpDir("graft-rec-rocks-layout")
    val sink = "rocks_layout"
    RecoverySink.clear(sink)
    withProvider(Some(RocksProvider)) {
      try {
        val input = MemoryStream[EventStream.UserEvent]
        val q = EventStream.runningUserTotals(input.toDS())
          .toDF().writeStream
          .option("checkpointLocation", ckpt)
          .outputMode("update")
          .foreachBatch { (b: Dataset[Row], _: Long) =>
            RecoverySink.add(sink, b.collect())
          }
          .start()
        try {
          input.addData(EventStream.UserEvent(1L, "click", 1.0))
          q.processAllAvailable()
          input.addData(EventStream.UserEvent(1L, "view", 2.0))
          q.processAllAvailable()
        } finally q.stop()
        val stateFiles = {
          val walk = Files.walk(Paths.get(ckpt, "state"))
          try walk.toArray.map(_.toString) finally walk.close()
        }
        assert(stateFiles.exists(f =>
          f.endsWith(".changelog") || f.endsWith(".zip")),
          s"expected RocksDB changelog/zip files under $ckpt/state, " +
            s"found: ${stateFiles.mkString(", ")}")
        assert(!stateFiles.exists(_.endsWith(".delta")),
          "HDFS-backed .delta files must not appear on the RocksDB leg")
      } finally { rmrf(ckpt); RecoverySink.clear(sink) }
    }
  }

  test("CowTable CDC-apply sink: a micro-batch REPLAYED after the " +
    "commit marker is lost is a no-op (batch-id idempotence closes the " +
    "exactly-once loop on the table format)") {
    implicit val sqlCtx = spark.sqlContext
    val root = tmpDir("graft-rec-cow")
    val table = s"$root/table"; val ckpt = s"$root/ckpt"
    try {
      graft.sources.CowTable.create(
        spark.range(1, 6).select(col("id").as("k"),
          concat(lit("name-"), col("id")).as("name"),
          (col("id") * 10).cast("decimal(12,2)").as("bal")),
        table, "k", nBuckets = 4)
      val input = MemoryStream[(Long, String, Double)]
      def start() = graft.sources.CowTable.applyCdc(
        input.toDF().toDF("k", "name", "bal"), table, ckpt)

      val q1 = start()
      try {
        input.addData((1L, "updated", 11.0), (9L, "inserted", 90.0))
        q1.processAllAvailable()
        assert(graft.sources.CowTable.currentVersion(spark, table) === 2)
      } finally q1.stop()

      // die between sink write and checkpoint commit
      dropLatestCommit(ckpt)

      val q2 = start()
      try {
        q2.processAllAvailable() // replays the batch with the SAME id
        assert(graft.sources.CowTable.currentVersion(spark, table) === 2,
          "the replayed batch must not commit another snapshot")
        val rows = graft.sources.CowTable.read(spark, table).collect()
          .map(r => r.getLong(0) ->
            (r.getString(1), r.getDecimal(2).doubleValue)).toMap
        assert(rows.size === 6)
        assert(rows(1L) === (("updated", 11.0)),
          "the update must be applied exactly once")
        assert(rows(9L) === (("inserted", 90.0)))
        // and a genuinely new batch still lands
        input.addData((2L, "later", 22.0))
        q2.processAllAvailable()
        assert(graft.sources.CowTable.currentVersion(spark, table) === 3)
        assert(graft.sources.CowTable.read(spark, table)
          .filter(col("k") === 2L).head().getString(1) === "later")
      } finally q2.stop()
    } finally rmrf(root)
  }

  test("foreachBatch parquet sink: a replayed batch (commit marker lost " +
    "between sink write and checkpoint commit) lands idempotently") {
    implicit val sqlCtx = spark.sqlContext
    val root = tmpDir("graft-rec-sink")
    val data = s"$root/data"; val ckpt = s"$root/ckpt"
    try {
      val input = MemoryStream[(Long, String)]
      def start() = EventStream.toPartitionedParquet(
        input.toDF().toDF("event_id", "event_type"), data, ckpt)

      val q1 = start()
      try {
        input.addData((1L, "click"), (2L, "view"))
        q1.processAllAvailable()
        assert(spark.read.parquet(data).count() === 2)
      } finally q1.stop()

      dropLatestCommit(ckpt)

      val q2 = start()
      try {
        q2.processAllAvailable() // replays the uncommitted batch
        val afterReplay = spark.read.parquet(data)
        assert(afterReplay.count() === 2,
          "replayed batch must overwrite its partition, not duplicate")
        assert(afterReplay.select("event_id").as[Long].collect().toSet
          === Set(1L, 2L))
        // and the resumed query keeps ingesting new batches exactly once
        input.addData((3L, "click"))
        q2.processAllAvailable()
        val fin = spark.read.parquet(data)
        assert(fin.count() === 3)
        assert(fin.select("event_id").as[Long].collect().toSet
          === Set(1L, 2L, 3L))
      } finally q2.stop()
    } finally rmrf(root)
  }
}
