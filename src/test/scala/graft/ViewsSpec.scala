package graft

import org.apache.spark.sql.functions._

/** The SQL surface: graft.Views registers tables and chosen queries as
  * temp views so the library runs from spark.sql(...). Pins: table
  * registration is plan-only and instant, a query view returns the same
  * rows as the direct Scala call, views compose in joins, and unknown
  * query names are rejected. */
class ViewsSpec extends SparkSpec {

  test("table registration is plan-only and covers the catalog") {
    val t0 = System.nanoTime()
    val n = Views.registerTables(spark, sfDir)
    val regMs = (System.nanoTime() - t0) / 1e6
    assert(n === Views.TableNames.size)
    assert(regMs < 30000.0, s"table views took ${regMs}ms — computed?")
    val catalog = spark.catalog.listTables().collect().map(_.name).toSet
    assert(Views.TableNames.forall(catalog.contains))
    assert(spark.sql("SELECT count(*) FROM lineitem").collect()(0).getLong(0) > 0)
  }

  test("query views return the direct Scala call's rows and compose") {
    Views.registerTables(spark, sfDir)
    val n = Views.registerQueries(spark, sfDir,
      Seq("q1_agg", "q_dedup_clusters"))
    assert(n === 2)
    val viaSql = spark.sql("SELECT * FROM q1_agg").collect().toSet
    val direct = SparkEntry.queries("q1_agg")(spark, sfDir).collect().toSet
    assert(viaSql === direct)
    // views compose: join a query view against a table view
    val joined = spark.sql(
      """SELECT c.cluster_id, count(*) AS n
         FROM documents d JOIN q_dedup_clusters c USING (doc_id)
         GROUP BY 1""").collect()
    assert(joined.nonEmpty)
    assert(joined.map(_.getAs[Long]("n")).sum ===
      spark.sql("SELECT count(*) FROM q_dedup_clusters").collect()(0).getLong(0))
  }

  test("unknown query names are rejected") {
    intercept[IllegalArgumentException](
      Views.registerQueries(spark, sfDir, Seq("q_definitely_not_a_query")))
  }
}
