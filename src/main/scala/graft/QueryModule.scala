package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A block of named queries plus their DuckDB oracle SQL.
  *
  * Contract (driver gate): for every key in `queries` that also appears in
  * `oracles`, the Spark result and the DuckDB result of the oracle SQL must
  * match on (rows, schema, value-hash) with columns sorted by name. Keys
  * absent from `oracles` get a weaker rows-only check.
  *
  * Determinism discipline for sql-oracle queries:
  *  - money-like sums go through exact DECIMAL casts, final cast to DOUBLE;
  *  - ratios are double divisions of exactly-equal inputs (identical IEEE);
  *  - any value with accumulated fp error is round()ed well above the error;
  *  - ordering ties are always broken by a unique integer key.
  */
trait QueryModule {
  def queries: Map[String, (SparkSession, String) => DataFrame]
  def oracles: Map[String, String]
}
