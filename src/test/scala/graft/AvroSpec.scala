package graft

import graft.sources.{Avro, Jsonl, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The Avro interchange seam (r18 verdict task 6): sharded container
  * writes, explicit-schema reads, corruption captured into the corrupt
  * column instead of failing the job, and by-name field matching
  * (schema evolution's add-column case). */
class AvroSpec extends SparkSpec {

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("documents survive a sharded Avro round-trip intact") {
    val dir = tmp("graft-avro-rt")
    val docs = Tables.documents(spark, sfDir)
    Avro.write(docs, dir, shards = 3)
    val parts = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".avro"))
    assert(parts.length === 3, "writer must honor the shard target")
    val back = Avro.read(spark, dir, docs.schema)
    assert(back.filter(col(Jsonl.CorruptCol).isNotNull).count() === 0)
    val a = docs.collect().map(_.toSeq).toSet
    val b = back.drop(Jsonl.CorruptCol).collect().map(_.toSeq).toSet
    assert(b === a, "round-trip must be lossless")
  }

  test("float-array embeddings round-trip (the ANN substrate's column)") {
    val dir = tmp("graft-avro-emb")
    val emb = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"))
    Avro.write(emb, dir, shards = 2)
    val back = Avro.read(spark, dir, emb.schema).drop(Jsonl.CorruptCol)
    assert(back.count() === emb.count())
    val a = emb.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val b = back.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(b === a)
  }

  test("a corrupt container lands in the corrupt column, not as a " +
    "job failure; healthy shards still decode") {
    val dir = tmp("graft-avro-bad")
    val docs = Tables.documents(spark, sfDir).limit(10)
    Avro.write(docs, dir, shards = 2)
    // clobber one shard with garbage bytes
    val victim = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".avro")).minBy(_.getName)
    java.nio.file.Files.write(victim.toPath,
      "not an avro container at all".getBytes("UTF-8"))
    val back = Avro.read(spark, dir, docs.schema)
    val corrupt = back.filter(col(Jsonl.CorruptCol).isNotNull)
    assert(corrupt.count() === 1, "one corrupt row per unreadable container")
    assert(corrupt.head().getString(docs.schema.length)
      .contains(victim.getName))
    val healthy = back.filter(col(Jsonl.CorruptCol).isNull)
    assert(healthy.count() > 0, "healthy shards must still decode")
    // healthy rows are a strict subset of the original table
    val orig = docs.collect().map(_.toSeq).toSet
    assert(healthy.drop(Jsonl.CorruptCol).collect().map(_.toSeq)
      .forall(orig.contains))
  }

  test("by-name matching: a field added to the target schema reads as " +
    "null (schema evolution's add-column case)") {
    val dir = tmp("graft-avro-evo")
    import spark.implicits._
    val v1 = Seq((1L, "a"), (2L, "b")).toDF("id", "name")
    Avro.write(v1, dir, shards = 1)
    val v2 = StructType(Seq(
      StructField("id", LongType),
      StructField("name", StringType),
      StructField("added", DoubleType)))
    val back = Avro.read(spark, dir, v2)
    assert(back.filter(col(Jsonl.CorruptCol).isNotNull).count() === 0)
    assert(back.select("added").collect().forall(_.isNullAt(0)))
    assert(back.select("id", "name").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
      === Set((1L, "a"), (2L, "b")))
  }

  test("rename-on-read: a target field finds its old container name " +
    "through reader-schema aliases (schema evolution's rename case)") {
    val dir = tmp("graft-avro-rename")
    import spark.implicits._
    val v1 = Seq((1L, "a"), (2L, "b")).toDF("id", "legacy_name")
    Avro.write(v1, dir, shards = 1)
    val v2 = StructType(Seq(
      StructField("id", LongType),
      StructField("name", StringType)))
    val back = Avro.read(spark, dir, v2,
      aliases = Map("name" -> Seq("old_name", "legacy_name")))
    assert(back.filter(col(Jsonl.CorruptCol).isNotNull).count() === 0)
    assert(back.select("id", "name").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
      === Set((1L, "a"), (2L, "b")))
    // the target's own name wins over an alias when both exist
    val both = tmp("graft-avro-rename2")
    Avro.write(Seq((1L, "new", "old")).toDF("id", "name", "legacy_name"),
      both, shards = 1)
    val r2 = Avro.read(spark, both, v2,
      aliases = Map("name" -> Seq("legacy_name")))
    assert(r2.select("name").head().getString(0) === "new")
  }

  test("numeric promotion on read: int→long and float→double decode " +
    "under the wider target (Avro resolution rules)") {
    val dir = tmp("graft-avro-promo")
    import spark.implicits._
    val v1 = Seq((1, 1.5f), (2, 2.5f)).toDF("k", "x") // int, float
    Avro.write(v1, dir, shards = 1)
    val wide = StructType(Seq(
      StructField("k", LongType),
      StructField("x", DoubleType)))
    val back = Avro.read(spark, dir, wide)
    assert(back.filter(col(Jsonl.CorruptCol).isNotNull).count() === 0)
    assert(back.select("k", "x").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSet
      === Set((1L, 1.5), (2L, 2.5)))
  }

  test("a narrowing mismatch (long container → int target) routes to " +
    "the corrupt column instead of a ClassCastException at action time") {
    val dir = tmp("graft-avro-narrow")
    import spark.implicits._
    Avro.write(Seq((1L, "a")).toDF("k", "s"), dir, shards = 1)
    val narrow = StructType(Seq(
      StructField("k", IntegerType),
      StructField("s", StringType)))
    val back = Avro.read(spark, dir, narrow)
    assert(back.filter(col(Jsonl.CorruptCol).isNotNull).count() === 1)
    assert(back.filter(col(Jsonl.CorruptCol).isNull).count() === 0)
  }

  test("a nonexistent read path fails fast (a typo must not read as " +
    "an empty dataset); an existing-but-empty directory reads empty") {
    intercept[IllegalArgumentException] {
      Avro.read(spark, "/no/such/graft/avro/dir",
        StructType(Seq(StructField("id", LongType))))
    }
    val empty = tmp("graft-avro-empty")
    val back = Avro.read(spark, empty,
      StructType(Seq(StructField("id", LongType))))
    assert(back.count() === 0)
  }

  test("writes commit via temp-then-rename: no .tmp litter remains " +
    "and every visible shard is a complete container") {
    val dir = tmp("graft-avro-commit")
    val docs = Tables.documents(spark, sfDir).limit(20)
    Avro.write(docs, dir, shards = 2)
    val names = new java.io.File(dir).listFiles().map(_.getName)
    assert(names.count(_.endsWith(".avro")) === 2)
    assert(!names.exists(_.contains(".tmp")), "temp files must be renamed away")
    val back = Avro.read(spark, dir, docs.schema)
    assert(back.filter(col(Jsonl.CorruptCol).isNotNull).count() === 0)
    assert(back.count() === 20)
  }

  test("nullable fields travel as union(null, T): nulls survive") {
    val dir = tmp("graft-avro-null")
    import spark.implicits._
    val df = Seq((1L, Some("x")), (2L, None), (3L, Some("z")))
      .toDF("id", "maybe")
    Avro.write(df, dir, shards = 1)
    val back = Avro.read(spark, dir, df.schema).drop(Jsonl.CorruptCol)
    assert(back.collect().map(r =>
      (r.getLong(0), Option(r.getString(1)))).toSet
      === Set((1L, Some("x")), (2L, None), (3L, Some("z"))))
  }
}
