package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** ORC source/sink — the other columnar interchange format (Hive-lineage
  * warehouses hand data over as ORC as often as parquet).
  *
  * Scale notes:
  *  - ORC carries the same stack parquet does for 100 TB scans: column
  *    projection, predicate pushdown into stripe/row-group indexes via
  *    min/max stats, and optional Bloom indexes per column — so the
  *    engine's pushdown discipline (filters as plain comparisons on
  *    scanned columns) pays off identically (OrcSpec asserts the plan's
  *    PushedFilters);
  *  - writes are sharded to an explicit target count and zstd-compressed
  *    (the modern default: parquet-comparable ratios, faster decode than
  *    zlib);
  *  - `bloomFilterCols` wires ORC's native per-column Bloom indexes —
  *    point-lookup scans over a 100 TB table skip stripes wholesale on
  *    non-matching keys.
  */
object Orc {

  /** Write `df` as `shards` zstd ORC part-files under `path`; optionally
    * attach ORC Bloom-filter indexes to the named columns. */
  def write(df: DataFrame, path: String, shards: Int,
      bloomFilterCols: Seq[String] = Nil): Unit = {
    val w = df.repartition(shards)
      .write.mode("overwrite")
      .option("compression", "zstd")
    (if (bloomFilterCols.nonEmpty)
       w.option("orc.bloom.filter.columns", bloomFilterCols.mkString(","))
     else w).orc(path)
  }

  /** Read ORC written by [[write]] (schema travels in the file footer —
    * unlike JSONL/CSV, columnar formats are self-describing). */
  def read(s: SparkSession, path: String): DataFrame = s.read.orc(path)
}
