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
      // let AQE coalesce INSIDE persisted plans too (off by default):
      // the memoized substrates (pair relations, vocab stats, posting
      // lists) are persisted behind joins/aggs whose static layout is
      // `spark.sql.shuffle.partitions`-wide, so every consumer stage of
      // a small substrate ran a fleet of near-empty tasks per read —
      // coalescing sizes them by bytes instead (guide §2.2 fewer,
      // larger partitions; size-adaptive, nothing local[32]-specific).
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", classOf[graft.plans.GraftExtensions].getName)
      .config("spark.ui.enabled", "false")

  /** Local session sized from SPARK_GRAFT_CPUS. */
  def local(): SparkSession = builder(s"local[$cpus]").getOrCreate()
}
