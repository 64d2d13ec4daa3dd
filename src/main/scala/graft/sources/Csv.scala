package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** CSV source/sink — the reference pipeline's gold-standard interchange
  * format (evaluate.py reads the polysemy gold standard from CSV).
  *
  * Same discipline as [[Jsonl]]: explicit schema (inference is an extra
  * full pass and type-unstable on ragged files), PERMISSIVE mode with a
  * corrupt-record column so one bad row cannot kill a wide scan, and
  * sharded compressed writes sized for the consumer. Quoting/escaping is
  * explicit so round-trips are byte-stable for embedded delimiters and
  * newlines.
  */
object Csv {

  val CorruptCol = "_corrupt"

  /** Write `df` as `shards` gzip CSV part-files with a header. */
  def write(df: DataFrame, path: String, shards: Int): Unit =
    df.repartition(shards)
      .write.mode("overwrite")
      .option("header", "true")
      .option("compression", "gzip")
      .option("quote", "\"").option("escape", "\"")
      .csv(path)

  /** Read CSV with an explicit schema; malformed rows land in
    * [[CorruptCol]] instead of failing the job. `multiLine` handles
    * quoted embedded newlines (needed for document text columns). */
  def read(s: SparkSession, path: String, schema: StructType,
      header: Boolean = true): DataFrame =
    s.read
      .schema(schema.add(CorruptCol, org.apache.spark.sql.types.StringType))
      .option("header", header.toString)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .option("quote", "\"").option("escape", "\"")
      .option("multiLine", "true")
      .csv(path)
}
