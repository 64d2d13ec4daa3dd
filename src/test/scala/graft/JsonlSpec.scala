package graft

import graft.sources.{Jsonl, Tables}
import org.apache.spark.sql.functions._

/** JSONL source/sink: sharded round-trip fidelity + corrupt-line policy. */
class JsonlSpec extends SparkSpec {
  import spark.implicits._

  test("documents survive a sharded gzip JSONL round-trip intact") {
    val dir = java.nio.file.Files.createTempDirectory("graft-jsonl").toString
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "text", "lang", "source", "n_chars")
    Jsonl.write(docs, dir, shards = 3)
    // shard count honored (gzip part files)
    val parts = new java.io.File(dir).listFiles()
      .count(f => f.getName.startsWith("part-") && f.getName.endsWith(".json.gz"))
    assert(parts === 3)
    val back = Jsonl.read(spark, dir, docs.schema).cache()
    back.count() // materialize: corrupt-column-only queries need parsed results
    assert(back.filter(col(Jsonl.CorruptCol).isNotNull).count() === 0)
    // content-identical: same per-row digests
    def digests(df: org.apache.spark.sql.DataFrame) =
      df.select(md5(concat_ws("",
        col("doc_id"), col("text"), col("lang"), col("source"), col("n_chars"))))
        .as[String].collect().sorted.toSeq
    assert(digests(back.drop(Jsonl.CorruptCol)) === digests(docs))
  }

  test("malformed lines land in the corrupt column, not as job failures") {
    val dir = java.nio.file.Files.createTempDirectory("graft-jsonl-bad").toString
    java.nio.file.Files.writeString(java.nio.file.Paths.get(dir, "part-00000.json"),
      """{"doc_id": 1, "text": "ok"}
        |{not json at all
        |{"doc_id": 2, "text": "also ok"}
        |""".stripMargin)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text",
        org.apache.spark.sql.types.StringType)))
    val df = Jsonl.read(spark, dir, schema).cache()
    assert(df.count() === 3)
    assert(df.filter(col(Jsonl.CorruptCol).isNotNull).count() === 1)
    assert(df.filter(col(Jsonl.CorruptCol).isNull).count() === 2)
  }
}
