package graft

import graft.sources.{Csv, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** CSV source/sink: lossless round-trip for text with embedded
  * delimiters/quotes/newlines, and corrupt-row capture. */
class CsvSpec extends SparkSpec {

  test("documents survive a sharded gzip CSV round-trip intact") {
    val dir = java.nio.file.Files.createTempDirectory("graft-csv").toString
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text", "lang")
    Csv.write(docs, dir, shards = 3)
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType)))
    val back = Csv.read(spark, dir, schema).drop(Csv.CorruptCol)
    assert(back.count() === docs.count())
    assert(back.except(docs).count() === 0 && docs.except(back).count() === 0)
  }

  test("quoted delimiters, quotes, and newlines round-trip byte-stable") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-csv-q").toString
    val tricky = Seq(
      (1L, "plain"),
      (2L, "comma, inside"),
      (3L, "a \"quoted\" word"),
      (4L, "line one\nline two")).toDF("id", "s")
    Csv.write(tricky, dir, shards = 1)
    val schema = StructType(Seq(StructField("id", LongType), StructField("s", StringType)))
    val back = Csv.read(spark, dir, schema).drop(Csv.CorruptCol)
    assert(back.except(tricky).count() === 0 && tricky.except(back).count() === 0)
  }

  test("malformed rows land in the corrupt column, not as job failures") {
    val dir = java.nio.file.Files.createTempDirectory("graft-csv-bad").toString
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "part-0.csv"),
      "id,n\n1,10\nnot_a_number,xx\n3,30\n".getBytes)
    val schema = StructType(Seq(StructField("id", LongType), StructField("n", LongType)))
    val got = Csv.read(spark, dir, schema).cache()
    assert(got.count() === 3)
    assert(got.filter(col(Csv.CorruptCol).isNotNull).count() === 1)
    assert(got.filter(col("id").isNotNull).agg(sum(col("n"))).head().getLong(0) === 40)
  }
}
