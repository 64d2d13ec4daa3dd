package graft

import graft.sources.CowTable
import org.apache.spark.sql.functions._

/** The copy-on-write table format's structural contracts (r19 verdict
  * task 1) — q_merge_files gates the END RESULT against the DuckDB
  * oracle; this spec pins the mechanics that make it a table format:
  * touched-file-only rewrite, snapshot immutability / time travel,
  * replay idempotence, and commit atomicity ordering. */
class CowTableSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft-cowspec").toString

  private def table(n: Int) =
    spark.range(n).select(col("id").as("k"),
      concat(lit("name-"), col("id")).as("name"),
      (col("id") * 10).cast("decimal(12,2)").as("bal"))

  test("create + read roundtrip: all buckets land, content intact") {
    val root = tmp()
    CowTable.create(table(100), root, "k", nBuckets = 8)
    assert(CowTable.currentVersion(spark, root) === 1)
    val back = CowTable.read(spark, root)
    assert(back.count() === 100)
    assert(back.collect().map(_.toSeq).toSet
      === table(100).collect().map(_.toSeq).toSet)
    val man = CowTable.readManifest(spark, root, 1)
    assert(man.entries.map(_._1).distinct.sorted === (0 until 8),
      "100 keys over 8 hash buckets must populate every bucket")
    assert(man.entries.groupBy(_._1).values.forall(_.size == 1),
      "exactly ONE file per bucket per snapshot (no small-files leak)")
  }

  test("MERGE rewrites ONLY the touched buckets: untouched manifest " +
    "entries carry over by reference, byte-identical paths") {
    val root = tmp()
    CowTable.create(table(100), root, "k", nBuckets = 8)
    // a small CDC batch: update key 7, insert key 1000
    val src = Seq((7L, "name-7-v2", java.math.BigDecimal.valueOf(777)),
      (1000L, "name-1000", java.math.BigDecimal.valueOf(1))).toDF("k", "name", "bal")
    assert(CowTable.merge(spark, root, src, "batch-1"))
    val m1 = CowTable.readManifest(spark, root, 1)
    val m2 = CowTable.readManifest(spark, root, 2)
    val touched = src.select(CowTable.bucketOf(col("k"), 8).as("b"))
      .distinct().collect().map(_.getInt(0)).toSet
    assert(touched.size <= 2)
    // untouched buckets: the v2 manifest lists the SAME file paths
    val m1ByBucket = m1.entries.groupBy(_._1)
    val m2ByBucket = m2.entries.groupBy(_._1)
    for (b <- 0 until 8 if !touched(b))
      assert(m2ByBucket(b).map(_._2) === m1ByBucket(b).map(_._2),
        s"untouched bucket $b must carry over by reference")
    // touched buckets: every file is NEW (copy-on-write, old files kept)
    for (b <- touched)
      assert(m2ByBucket(b).map(_._2).toSet
        .intersect(m1ByBucket(b).map(_._2).toSet).isEmpty,
        s"touched bucket $b must be rewritten into new files")
    // and the merged content is the logical MERGE result
    val back = CowTable.read(spark, root).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getDecimal(2).doubleValue))
      .toMap
    assert(back.size === 101)
    assert(back(7L) === (("name-7-v2", 777.0)))
    assert(back(1000L) === (("name-1000", 1.0)))
    assert(back(8L) === (("name-8", 80.0)), "non-touched rows unchanged")
  }

  test("time travel: v1 stays exactly as committed after the merge") {
    val root = tmp()
    CowTable.create(table(50), root, "k", nBuckets = 4)
    val src = Seq((3L, "changed", java.math.BigDecimal.valueOf(0)))
      .toDF("k", "name", "bal")
    CowTable.merge(spark, root, src, "batch-1")
    val v1 = CowTable.readVersion(spark, root, 1)
    assert(v1.collect().map(_.toSeq).toSet
      === table(50).collect().map(_.toSeq).toSet,
      "the pre-merge snapshot must remain readable and unchanged")
    assert(CowTable.read(spark, root)
      .filter(col("k") === 3L).select("name").head().getString(0)
      === "changed")
  }

  test("replay idempotence: re-running the SAME batch id is a no-op " +
    "(no new snapshot, content unchanged)") {
    val root = tmp()
    CowTable.create(table(50), root, "k", nBuckets = 4)
    val src = Seq((3L, "v2", java.math.BigDecimal.valueOf(1)))
      .toDF("k", "name", "bal")
    assert(CowTable.merge(spark, root, src, "batch-1") === true)
    val v = CowTable.currentVersion(spark, root)
    val before = CowTable.read(spark, root).collect().map(_.toSeq).toSet
    // the foreachBatch replay: same batch, same id, run again
    assert(CowTable.merge(spark, root, src, "batch-1") === false)
    assert(CowTable.currentVersion(spark, root) === v,
      "a replayed batch must not commit a new snapshot")
    assert(CowTable.read(spark, root).collect().map(_.toSeq).toSet === before)
    // a genuinely NEW batch still applies
    val src2 = Seq((3L, "v3", java.math.BigDecimal.valueOf(2)))
      .toDF("k", "name", "bal")
    assert(CowTable.merge(spark, root, src2, "batch-2") === true)
    assert(CowTable.currentVersion(spark, root) === v + 1)
    assert(CowTable.read(spark, root)
      .filter(col("k") === 3L).select("name").head().getString(0) === "v3")
  }

  test("commit atomicity: a snapshot number that got committed between " +
    "version read and manifest write makes the slower committer FAIL, " +
    "never silently overwrite (rename refuses an existing destination)") {
    val root = tmp()
    CowTable.create(table(20), root, "k", nBuckets = 2)
    val m1 = CowTable.readManifest(spark, root, 1)
    // the race: both committers read cur=1 and target v2; the winner's
    // manifest lands first, the loser's writeManifest must then refuse
    CowTable.writeManifest(spark, root,
      m1.copy(version = 2, batchId = "winner"))
    intercept[java.util.ConcurrentModificationException] {
      CowTable.writeManifest(spark, root,
        m1.copy(version = 2, batchId = "loser"))
    }
    // the winner's commit is intact, not clobbered by the losing attempt
    assert(CowTable.readManifest(spark, root, 2).batchId === "winner")
  }

  test("bucket-pruned point lookup: readKeys scans only the keys' " +
    "buckets and returns exactly the matching rows") {
    val root = tmp()
    CowTable.create(table(200), root, "k", nBuckets = 8)
    val got = CowTable.readKeys(spark, root, Seq(7L, 42L, 9999L))
    assert(got.collect().map(r => (r.getLong(0), r.getString(1))).toSet
      === Set((7L, "name-7"), (42L, "name-42")),
      "exact rows for present keys, nothing for absent ones")
    // the pruned scan reads only the wanted buckets' files
    val man = CowTable.readManifest(spark, root, 1)
    val wanted = Seq(7L, 42L, 9999L).map(k =>
      spark.range(1).select(CowTable.bucketOf(lit(k), 8).as("b"))
        .head().getInt(0)).toSet
    val scanned = got.inputFiles.toSeq
    assert(scanned.nonEmpty)
    assert(scanned.forall(p => wanted.exists(b => p.contains(s"__bucket=$b/"))),
      s"scan must touch only buckets $wanted, saw: ${scanned.mkString(",")}")
    assert(scanned.size < CowTable.readManifest(spark, root, 1).entries.size,
      "the pruned scan must read fewer files than the full table")
  }

  test("change data feed: insert/update/delete classified row-level, " +
    "byte-identical rewrites excluded, and the read touches only the " +
    "buckets whose file lists changed") {
    val root = tmp()
    CowTable.create(table(100), root, "k", nBuckets = 8)
    val src = Seq(
      (7L, "name-7-v2", java.math.BigDecimal.valueOf(77), false),  // update
      (8L, "name-8", java.math.BigDecimal.valueOf(80), false),     // no-op write
      (13L, null.asInstanceOf[String],
        null.asInstanceOf[java.math.BigDecimal], true),            // delete
      (1000L, "name-1000", java.math.BigDecimal.valueOf(1), false))// insert
      .toDF("k", "name", "bal", "is_deleted")
    CowTable.merge(spark, root, src, "b1", deleteCol = Some("is_deleted"))
    val feed = CowTable.changes(spark, root, 1, 2)
    val rows = feed.collect()
      .map(r => r.getLong(0) -> (Option(r.getString(1)), r.getString(3))).toMap
    assert(rows.keySet === Set(7L, 13L, 1000L),
      "the byte-identical rewrite of key 8 must NOT appear in the feed")
    assert(rows(7L) === ((Some("name-7-v2"), "update")))
    assert(rows(13L) === ((None, "delete")), "deletes carry null payload")
    assert(rows(1000L) === ((Some("name-1000"), "insert")))
    // pruned by construction: only changed buckets' files are read
    val changedB = src.select(CowTable.bucketOf(col("k"), 8).as("b"))
      .distinct().collect().map(_.getInt(0)).toSet
    val scanned = feed.inputFiles.toSeq
    assert(scanned.nonEmpty)
    assert(scanned.forall(p => changedB.exists(b => p.contains(s"__bucket=$b/"))),
      s"CDF must read only changed buckets $changedB, saw ${scanned.mkString(",")}")
  }

  test("change data feed across an add-column evolution: the diff runs " +
    "on the widened payload (old rows read null in the new column)") {
    val root = tmp()
    CowTable.create(table(50), root, "k", nBuckets = 4)
    CowTable.merge(spark, root,
      Seq((3L, "name-3", java.math.BigDecimal.valueOf(30), "gold"))
        .toDF("k", "name", "bal", "tier"), "b-evo")
    val rows = CowTable.changes(spark, root, 1, 2).collect()
      .map(r => r.getLong(0) -> (Option(r.getString(3)), r.getString(4))).toMap
    // key 3 kept name/bal but gained tier=gold: that IS an update under
    // the widened payload
    assert(rows === Map(3L -> ((Some("gold"), "update"))))
  }

  test("schema evolution, add-column: a merge source with an appended " +
    "column widens the table; old files and untouched buckets read null " +
    "there; pre-evolution snapshots keep their original width") {
    val root = tmp()
    CowTable.create(table(100), root, "k", nBuckets = 8)
    val src = Seq(
      (7L, "name-7-v2", java.math.BigDecimal.valueOf(77), "gold"),
      (1000L, "name-1000", java.math.BigDecimal.valueOf(1), "silver"))
      .toDF("k", "name", "bal", "tier")
    assert(CowTable.merge(spark, root, src, "b-evo"))
    val back = CowTable.read(spark, root)
    assert(back.columns.toSeq === Seq("k", "name", "bal", "tier"))
    val byK = back.collect().map(r => r.getLong(0) -> Option(r.getString(3))).toMap
    assert(byK(7L) === Some("gold") && byK(1000L) === Some("silver"))
    assert(byK(8L) === None, "pre-evolution rows read null in the new column")
    assert(byK.size === 101)
    // untouched buckets carried BY REFERENCE even across the evolution
    val m1 = CowTable.readManifest(spark, root, 1).entries.groupBy(_._1)
    val m2 = CowTable.readManifest(spark, root, 2).entries.groupBy(_._1)
    val touched = src.select(CowTable.bucketOf(col("k"), 8).as("b"))
      .distinct().collect().map(_.getInt(0)).toSet
    for (b <- 0 until 8 if !touched(b))
      assert(m2(b).map(_._2) === m1(b).map(_._2))
    // time travel: the pre-evolution snapshot keeps its original width
    assert(CowTable.readVersion(spark, root, 1).columns.toSeq
      === Seq("k", "name", "bal"))
    // and a later merge must now carry the widened schema
    intercept[IllegalArgumentException] {
      CowTable.merge(spark, root,
        Seq((1L, "x", java.math.BigDecimal.valueOf(0))).toDF("k", "name", "bal"),
        "b-next")
    }
  }

  test("WHEN MATCHED DELETE: a delete-flagged key is removed copy-on-" +
    "write (only its bucket rewritten), stays visible in the earlier " +
    "snapshot, and a flagged key that does not exist is a no-op") {
    val root = tmp()
    CowTable.create(table(100), root, "k", nBuckets = 8)
    val src = Seq(
      (7L, "name-7-v2", java.math.BigDecimal.valueOf(77), false), // update
      (13L, null.asInstanceOf[String],
        null.asInstanceOf[java.math.BigDecimal], true),           // delete
      (5000L, null.asInstanceOf[String],
        null.asInstanceOf[java.math.BigDecimal], true))           // absent: no-op
      .toDF("k", "name", "bal", "is_deleted")
    assert(CowTable.merge(spark, root, src, "b-del",
      deleteCol = Some("is_deleted")))
    val back = CowTable.read(spark, root)
    assert(back.count() === 99, "one deleted, no phantom insert")
    assert(back.filter(col("k") === 13L).isEmpty, "key 13 erased")
    assert(back.filter(col("k") === 5000L).isEmpty,
      "a delete of an absent key must not insert")
    assert(back.filter(col("k") === 7L).head().getString(1) === "name-7-v2")
    // earlier snapshot still carries the row (erasure completes via
    // vacuum past retention — the documented compliance recipe)
    assert(CowTable.readVersion(spark, root, 1)
      .filter(col("k") === 13L).count() === 1)
    // only the touched buckets were rewritten
    val m1 = CowTable.readManifest(spark, root, 1).entries.groupBy(_._1)
    val m2 = CowTable.readManifest(spark, root, 2).entries.groupBy(_._1)
    val touched = src.select(CowTable.bucketOf(col("k"), 8).as("b"))
      .distinct().collect().map(_.getInt(0)).toSet
    for (b <- 0 until 8 if !touched(b))
      assert(m2(b).map(_._2) === m1(b).map(_._2))
    // full erasure recipe: vacuum past the retention window
    CowTable.vacuum(spark, root, retainLast = 1, minOrphanAgeMs = 0)
    intercept[IllegalArgumentException] {
      CowTable.readVersion(spark, root, 1)
    }
    assert(CowTable.read(spark, root).filter(col("k") === 13L).isEmpty)
  }

  test("vacuum deletes exactly the files no retained snapshot references " +
    "and keeps every retained snapshot readable") {
    val root = tmp()
    CowTable.create(table(100), root, "k", nBuckets = 4)
    def src(n: Int) = Seq((7L, s"v$n", java.math.BigDecimal.valueOf(n.toLong)))
      .toDF("k", "name", "bal")
    CowTable.merge(spark, root, src(2), "b2") // v2
    CowTable.merge(spark, root, src(3), "b3") // v3
    // an orphan from a crashed writer
    table(3).select(col("k"), lit("GHOST").as("name"), col("bal"))
      .write.parquet(s"$root/data/commit-orphan/__bucket=0")
    val v3Rows = CowTable.read(spark, root).collect().map(_.toSeq).toSet
    val v2Rows = CowTable.readVersion(spark, root, 2).collect()
      .map(_.toSeq).toSet
    // a FRESH unreferenced commit dir (possibly an in-flight writer's)
    // survives the default age gate — superseded files inside referenced
    // dirs carry no such ambiguity and go regardless of age
    CowTable.vacuum(spark, root, retainLast = 2): Unit
    val fsPre = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fsPre.exists(new org.apache.hadoop.fs.Path(
      s"$root/data/commit-orphan")),
      "a young orphan must survive the in-flight-writer age gate")
    val deleted = CowTable.vacuum(spark, root, retainLast = 2,
      minOrphanAgeMs = 0)
    assert(deleted > 0, "v1's superseded bucket file + the orphan must go")
    // retained snapshots: byte-identical reads after the vacuum
    assert(CowTable.read(spark, root).collect().map(_.toSeq).toSet === v3Rows)
    assert(CowTable.readVersion(spark, root, 2).collect()
      .map(_.toSeq).toSet === v2Rows)
    // the expired snapshot and the orphan are gone
    intercept[IllegalArgumentException] {
      CowTable.readVersion(spark, root, 1)
    }
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.globStatus(new org.apache.hadoop.fs.Path(
      s"$root/data", "commit-orphan*")).isEmpty, "orphan dir must be vacuumed")
    // every remaining data file is referenced by a retained manifest
    val reachable = (2 to 3).flatMap(v =>
      CowTable.readManifest(spark, root, v).entries.map(_._2)).toSet
    val remaining = fs.globStatus(new org.apache.hadoop.fs.Path(
      s"$root/data", "commit-*/__bucket=*/*.parquet")).map { st =>
      s"data/${st.getPath.getParent.getParent.getName}/" +
        s"${st.getPath.getParent.getName}/${st.getPath.getName}"
    }.toSet
    assert(remaining === reachable, "vacuum must leave exactly the reachable set")
  }

  test("data-before-manifest ordering: reads are manifest-driven, so " +
    "orphaned data files from a died-before-commit writer are invisible " +
    "(never a half-visible table)") {
    val root = tmp()
    CowTable.create(table(20), root, "k", nBuckets = 2)
    val before = CowTable.read(spark, root).collect().map(_.toSeq).toSet
    // a writer that crashed after its data write, before its manifest
    // commit: its commit dir sits under data/ unreferenced
    table(5).select(col("k"), lit("GHOST").as("name"), col("bal"))
      .write.parquet(s"$root/data/commit-orphan/__bucket=0")
    assert(CowTable.currentVersion(spark, root) === 1)
    assert(CowTable.read(spark, root).collect().map(_.toSeq).toSet === before,
      "unreferenced data files must never surface in a read")
    assert(!CowTable.read(spark, root).collect()
      .exists(_.getString(1) == "GHOST"))
  }
}
