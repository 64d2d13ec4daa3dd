package graft

import org.apache.spark.sql.SparkSession

/** SQL surface for the registry: registers the driver tables and any
  * chosen queries as temp views, so a SQL-first user — the reference's
  * audience — can run the library from `spark.sql(...)` without touching
  * the Scala API:
  *
  * {{{
  *   graft.Views.registerTables(spark, "/data/sf1")
  *   graft.Views.registerQueries(spark, "/data/sf1",
  *     Seq("q_dedup_clusters", "q_curation_full"))
  *   spark.sql("SELECT d.*, c.cluster_id FROM documents d JOIN q_dedup_clusters c USING (doc_id)")
  * }}}
  *
  * Table views are plan-only; a registered QUERY view's downstream
  * Catalyst plan is lazy too, but CONSTRUCTING some queries already does
  * work (iterative graph loops, driver-side folds, ML fits — the
  * convergence-looped operators execute jobs while building their result
  * DataFrame), which is why queries register EXPLICITLY, per name, rather
  * than all 400+ at once: you pay for exactly the views you ask for,
  * when you ask. `registerAll` exists for notebook sessions that want
  * the whole catalog and accept the build cost. */
object Views {

  val TableNames: Seq[String] = Seq("region", "nation", "customer",
    "supplier", "part", "orders", "lineitem", "events", "documents",
    "embeddings")

  /** Register the ten driver tables as views (plan-only, instant).
    * `events` goes through the timestamp-normalizing accessor (the
    * nanos/micros seam Tables.events documents). */
  def registerTables(spark: SparkSession, dir: String): Int = {
    TableNames.foreach {
      case "events" =>
        sources.Tables.events(spark, dir).createOrReplaceTempView("events")
      case t =>
        sources.Tables.load(spark, dir, t).createOrReplaceTempView(t)
    }
    TableNames.size
  }

  /** Register the named queries as views. Unknown names throw (the
    * registry is the contract). Returns the number registered. */
  def registerQueries(spark: SparkSession, dir: String,
      names: Seq[String]): Int = {
    names.foreach { name =>
      val q = SparkEntry.queries.getOrElse(name,
        throw new IllegalArgumentException(s"unknown query: $name"))
      q(spark, dir).createOrReplaceTempView(name)
    }
    names.size
  }

  /** Tables plus EVERY registered query — the whole catalog. Costs the
    * construction of every iterative operator up front; meant for
    * long-lived exploratory sessions. */
  def registerAll(spark: SparkSession, dir: String): Int =
    registerTables(spark, dir) +
      registerQueries(spark, dir, SparkEntry.queries.keys.toSeq.sorted)
}
