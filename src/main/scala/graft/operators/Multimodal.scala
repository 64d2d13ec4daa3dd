package graft.operators

import graft.QueryModule
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: opaque `binary` payloads + typed metadata.
  *
  * The container has no image/audio codecs, so decode is STUBBED with a
  * deterministic fake (clearly marked), but the Spark-side shape is real:
  * binary column, per-row metadata extraction as codegen expressions, and a
  * partition-parallel decode path (`decodeBatch`) with the batch signature a
  * real codec UDF would have. Payloads here are synthesized from `text`
  * (cast to utf8 bytes) since the driver tables carry no media.
  */
object Multimodal extends QueryModule {

  /** STUB decoder: deterministic fake dimensions derived from the payload.
    * A real implementation would decode the codec header here. */
  def stubDecode(payload: Array[Byte]): (Int, Int, String) = {
    val n = payload.length
    (n % 640 + 1, (n * 7) % 480 + 1, if (n % 2 == 0) "png" else "jpeg")
  }

  /** Partition-parallel decode with the batch shape of a real codec UDF:
    * DataFrame(payload: binary) → DataFrame + (width, height, format). */
  def decodeBatch(df: DataFrame): DataFrame = {
    val decodeUdf = udf((b: Array[Byte]) => stubDecode(b))
    df.withColumn("decoded", decodeUdf(col("payload")))
      .select(col("*"), col("decoded._1").as("width"),
        col("decoded._2").as("height"), col("decoded._3").as("format"))
      .drop("decoded")
  }

  /** q_multimodal: binary payload metadata — byte length, content digest,
    * deterministic stub dimensions — as pure codegen expressions. */
  def qMultimodal(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .select(col("doc_id"),
        octet_length(col("payload")).as("n_bytes"),
        md5(col("payload")).as("payload_md5"))
      .select(col("doc_id"), col("n_bytes"), col("payload_md5"),
        (col("n_bytes") % 640 + 1).as("fake_width"),
        ((col("n_bytes") * 7) % 480 + 1).as("fake_height"))

  private val qMultimodalSql =
    """SELECT doc_id, CAST(octet_length(CAST(text AS BLOB)) AS INT) AS n_bytes,
       md5(text) AS payload_md5,
       CAST(octet_length(CAST(text AS BLOB)) % 640 + 1 AS INT) AS fake_width,
       CAST(octet_length(CAST(text AS BLOB)) * 7 % 480 + 1 AS INT) AS fake_height
       FROM documents"""

  /** q_multimodal_frames: frame-sampling plumbing — K evenly spaced
    * fixed-size byte windows per payload (the shape of video frame-sampling
    * with the codec stubbed out): offset arithmetic + binary substring +
    * digest, all codegen, one explode per payload. The oracle slices the
    * VARCHAR twin — payloads are ASCII by construction, so byte and char
    * windows coincide (DuckDB has no BLOB substring). */
  def qMultimodalFrames(s: SparkSession, dir: String): DataFrame = {
    val k = 4
    val win = 16
    Tables.documents(s, dir)
      .select(col("doc_id"), col("text").cast("binary").as("payload"),
        octet_length(col("text").cast("binary")).as("n_bytes"))
      .filter(col("n_bytes") >= win * k)
      .select(col("doc_id"), col("n_bytes"), col("payload"),
        explode(array((0 until k).map(i => lit(i)): _*)).as("frame_idx"))
      .withColumn("frame_off",
        (lit(1) + ((col("n_bytes") - win) * col("frame_idx") / lit(k - 1)).cast("int")))
      .select(col("doc_id"), col("frame_idx"), col("frame_off"),
        md5(expr(s"substring(payload, frame_off, $win)")).as("frame_md5"))
  }

  private val qMultimodalFramesSql =
    """WITH b AS (
         SELECT doc_id, text, CAST(octet_length(CAST(text AS BLOB)) AS INT) AS n_bytes
         FROM documents WHERE octet_length(CAST(text AS BLOB)) >= 64),
       f AS (SELECT doc_id, n_bytes, text, unnest([0, 1, 2, 3]) AS frame_idx FROM b)
       SELECT doc_id, frame_idx,
         CAST(1 + ((n_bytes - 16) * frame_idx) // 3 AS INT) AS frame_off,
         md5(substring(text, 1 + ((n_bytes - 16) * frame_idx) // 3, 16)) AS frame_md5
       FROM f"""

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_multimodal" -> (qMultimodal _),
    "q_multimodal_frames" -> (qMultimodalFrames _))

  override def oracles: Map[String, String] = Map(
    "q_multimodal" -> qMultimodalSql,
    "q_multimodal_frames" -> qMultimodalFramesSql)
}
