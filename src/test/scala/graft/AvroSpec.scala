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
