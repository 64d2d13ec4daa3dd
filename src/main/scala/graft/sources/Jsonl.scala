package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** JSONL source/sink — the interchange format of LLM training pipelines
  * (one JSON object per line, gzip-sharded).
  *
  * Scale notes:
  *  - writes are SHARDED by an explicit target count (a 100 TB corpus
  *    needs shards sized for the downstream loader, not Spark's incidental
  *    partitioning) and compressed;
  *  - reads take an EXPLICIT schema: schema inference over JSONL is a full
  *    extra pass over the data and is nondeterministic under ragged rows —
  *    never acceptable at scale;
  *  - `columnNameOfCorruptRecord` + PERMISSIVE keeps a bad line from
  *    killing a 10⁵-task job; callers filter/count the corrupt column.
  */
object Jsonl {

  val CorruptCol = "_corrupt"

  /** Write `df` as `shards` gzip JSONL part-files under `path`. */
  def write(df: DataFrame, path: String, shards: Int): Unit =
    df.repartition(shards)
      .write.mode("overwrite")
      .option("compression", "gzip")
      .json(path)

  /** Read JSONL written by [[write]] (or any other producer) with an
    * explicit schema; malformed lines land in [[CorruptCol]] instead of
    * failing the job. Note Spark disallows queries that reference ONLY
    * the corrupt column on a raw JSON scan — cache or project other
    * columns alongside it when auditing corrupt counts. */
  def read(s: SparkSession, path: String, schema: StructType): DataFrame =
    s.read
      .schema(schema.add(CorruptCol, org.apache.spark.sql.types.StringType))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .json(path)
}
