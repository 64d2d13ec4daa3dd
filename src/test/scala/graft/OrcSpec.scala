package graft

import graft.sources.{Orc, Tables}
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** ORC source/sink: lossless round-trip against the parquet original,
  * shard-count control, and predicate/projection pushdown reaching the
  * ORC scan in the physical plan. */
class OrcSpec extends SparkSpec {

  private def tmp(): String =
    Files.createTempDirectory("graft-orc").toString

  test("orc round-trip is lossless and honors the shard target") {
    val dir = tmp()
    val src = Tables.orders(spark, sfDir)
    Orc.write(src, dir, shards = 3, bloomFilterCols = Seq("o_custkey"))
    val back = Orc.read(spark, dir)
    assert(back.schema === src.schema)
    assert(back.count() === src.count())
    assert(back.except(src).count() === 0 && src.except(back).count() === 0)
    val parts = new java.io.File(dir).listFiles()
      .count(f => f.getName.startsWith("part-") && f.getName.endsWith(".orc"))
    assert(parts === 3)
  }

  test("filters and projection push down into the ORC scan") {
    val dir = tmp()
    Orc.write(Tables.orders(spark, sfDir), dir, shards = 2)
    val q = Orc.read(spark, dir)
      .filter(col("o_totalprice") > 100000.0)
      .select("o_orderkey", "o_totalprice")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("GreaterThan(o_totalprice"), plan)
    // projection pruning: the scan schema carries only the two columns
    assert(plan.contains("ReadSchema: struct<o_orderkey:bigint,o_totalprice:double>"), plan)
    // and the filtered read agrees with the in-memory filter
    val expect = Tables.orders(spark, sfDir).filter(col("o_totalprice") > 100000.0).count()
    assert(q.count() === expect)
  }
}
