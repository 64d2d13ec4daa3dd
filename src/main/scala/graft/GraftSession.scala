package graft

import org.apache.spark.sql.SparkSession

/** Opinionated session builder — the one place the engine's runtime
  * posture is encoded:
  *  - AQE on (runtime re-planning: skew joins, coalesced shuffles);
  *  - shuffle parallelism from SPARK_GRAFT_CPUS (32 on the driver host;
  *    on a real cluster this would be ~2-3× total cores);
  *  - TIMESTAMP(NANOS) parquet readable (the events table needs it);
  *  - UTC everywhere (oracle comparisons are timezone-sensitive);
  *  - graft's SparkSessionExtensions registered, so the library's native
  *    SQL functions (jaro_winkler_similarity) exist in every session.
  */
object GraftSession {

  def cpus: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")

  def builder(master: String): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", classOf[graft.plans.GraftExtensions].getName)
      .config("spark.ui.enabled", "false")

  /** Local session sized from SPARK_GRAFT_CPUS. */
  def local(): SparkSession = builder(s"local[$cpus]").getOrCreate()
}
