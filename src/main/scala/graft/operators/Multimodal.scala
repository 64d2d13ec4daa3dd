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

  /** Per-partition codec-context seam: a real decoder opens its expensive
    * state ONCE per partition here (decoder handle, pinned buffers, a
    * feature-extractor's weights) and every row of the batch reuses it —
    * the stub's "context" is just a marker proving the call pattern. */
  private final class DecoderContext {
    def decode(payload: Array[Byte]): (Int, Int, String) = stubDecode(payload)
  }

  /** Partition-parallel decode with the batch shape a real codec needs:
    * `mapPartitions`, NOT a per-row UDF — per-row invocation re-pays
    * codec/context init on every image and (for a Python codec) one IPC
    * round-trip per row, which is exactly what dies first at 100 TB of
    * media; the iterator shape amortizes init per PARTITION and streams
    * rows without materializing the batch. Input rows are (id: long,
    * payload: binary); the decoded columns append after the passthroughs.
    * Swapping in a real codec touches only DecoderContext. */
  def decodeBatch(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val idCol = df.columns.head
    val out = df.select(col(idCol).cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val ctx = new DecoderContext // once per partition, not per row
        it.map { case (id, payload) =>
          val (w, h, f) = ctx.decode(payload)
          (id, payload, w, h, f)
        }
      }
      .toDF(idCol, "payload", "width", "height", "format")
    out
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

  /** Signature geometry shared by the Spark query and the oracle: 63
    * trigram buckets keep the bit accumulator inside a signed long in
    * every engine (bit 63 would overflow DuckDB's checked `<<`), and 3
    * bands of 21 bits make the band join COMPLETE for hamming ≤ 2 by
    * pigeonhole — the banded candidate set provably equals the all-pairs
    * scan the oracle runs, at 1/290 of its pair volume on the driver
    * corpus (41k candidates vs 11.9M all-pairs at sf0.1; the previous
    * 7×9-bit geometry left 3.6M). */
  val SigBits = 63
  val SigBands = 3
  val SigBandBits = 21
  val SigMaxHamming = 2

  /** q_media_phash: perceptual-hash-ANALOGUE near-dup over the binary
    * payloads — a TLSH-family similarity digest (bucketed byte-trigram
    * counts, median-thresholded into a 63-bit signature; see
    * TextKernelPhash.sig) applied honestly to raw BYTES, since the
    * container ships no image codecs: one kernel pass per payload, banded
    * candidate join + exact bit_count re-rank — the q_dedup_simhash
    * shape, so the scale story is identical (no all-pairs anywhere in
    * Spark; the all-pairs appears only in the oracle, which the banding
    * provably matches). The trigram-profile digest replaced the original
    * positional sample grid because the grid scrambles under any local
    * edit — the corpus's near-dup payloads (reordered word blocks) sat at
    * hamming ≥ 15 and the gate matched on EMPTY output; the profile puts
    * them at hamming ≤ 2 with the geometry above. A real deployment swaps
    * byte trigrams for decoded-pixel features and keeps every line below
    * unchanged.
    *
    * The corpus signature stage is memoized + persisted per (session,
    * dir): the band fan-out references sig once per band key plus the
    * passthrough (SigBands + 1 = 4 references), and project collapse
    * would otherwise re-inline the full kernel expression into every
    * reference — the q_dedup_simhash materialize-the-signature rule. */
  def qMediaPhash(s: SparkSession, dir: String): DataFrame =
    pairsFromSigs(graft.ModelCache.getOrElseUpdate(s, s"media.phashsig:$dir") {
      phashSigsOf(Tables.documents(s, dir))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    })

  def mediaPhashOf(docs: DataFrame): DataFrame =
    pairsFromSigs(phashSigsOf(docs).localCheckpoint(true))

  /** (doc_id, sig): the 63-bucket trigram-profile signature per payload.
    * Payloads shorter than SigBits code points are skipped — a profile
    * over a handful of trigrams is all noise, and the floor matches the
    * oracle's WHERE clause exactly. */
  def phashSigsOf(docs: DataFrame): DataFrame = {
    val n = SigBits
    val base = docs
      .select(col("doc_id"), col("text"))
      .filter(length(col("text")) >= n)
    // ONE native codegen kernel call per row (functions.PhashSig): the
    // stacked-Column formulation re-inlined the sampling expressions under
    // project collapse (~4000 substr calls per row at its worst) and the
    // HOF rewrite still paid interpreted lambda evaluation — the same
    // evolution MinHash/SimHash went through (HashKernels). Pure integer
    // median threshold, identical to the oracle's (see TextKernelPhash).
    base.select(col("doc_id"),
      graft.functions.TextKernelCols.phashSig(col("text"), n).as("sig"))
  }

  /** Banded candidate join + exact hamming re-rank over a MATERIALIZED
    * (doc_id, sig) relation. */
  private def pairsFromSigs(sig: DataFrame): DataFrame = {
    val mask = (1 << SigBandBits) - 1
    val banded = sig.select(col("doc_id"), col("sig"),
      explode(array((0 until SigBands).map(b =>
        struct(lit(b).as("band"),
          expr(s"(sig >> ${b * SigBandBits}) & $mask").as("key"))): _*)).as("bk"))
      .select(col("doc_id"), col("sig"), col("bk.band").as("band"), col("bk.key").as("key"))
    banded.groupBy("band", "key")
      .agg(collect_list(struct(col("doc_id"), col("sig"))).as("ds"))
      .filter(size(col("ds")) >= 2)
      .select(explode(graft.functions.Pairs.orderedPairs(col("ds"))).as("p"))
      .select(col("p.a.doc_id").as("doc_a"), col("p.b.doc_id").as("doc_b"),
        expr("cast(bit_count(p.a.sig ^ p.b.sig) as int)").as("hamming"))
      .distinct()
      .filter(col("hamming") <= SigMaxHamming)
  }

  private val qMediaPhashSql = {
    val n = SigBits
    // the identical signature, spelled relationally: explode trigram
    // positions, bucket by the md5's first 3 bytes, densify to all n
    // buckets (zeros count toward the median!), lower-median threshold
    // (1-based 32nd of the 63 sorted counts), OR the bits via a sum of
    // distinct powers of two. substr/len are code-point semantics, md5
    // hashes the trigram's UTF-8 bytes — exactly the kernel's contract.
    s"""WITH t AS (SELECT doc_id, text FROM documents WHERE len(text) >= $n),
       p AS (SELECT doc_id, text, unnest(generate_series(1, len(text) - 2)) AS i FROM t),
       g AS (SELECT doc_id,
               CAST(('0x' || substr(md5(substr(text, CAST(i AS INT), 3)), 1, 6)) AS BIGINT) % $n AS b
             FROM p),
       cnt AS (SELECT doc_id, b, count(*) AS nb FROM g GROUP BY 1, 2),
       dense AS (SELECT t.doc_id, r.range AS b, coalesce(cnt.nb, 0) AS nb
                 FROM t CROSS JOIN range($n) r
                 LEFT JOIN cnt ON cnt.doc_id = t.doc_id AND cnt.b = r.range),
       m AS (SELECT doc_id, list_sort(list(nb))[${n / 2 + 1}] AS med FROM dense GROUP BY doc_id),
       s AS (SELECT dense.doc_id,
               sum(CASE WHEN nb > med THEN 1::BIGINT << b ELSE 0::BIGINT END) AS sig
             FROM dense JOIN m ON m.doc_id = dense.doc_id GROUP BY 1)
       SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         CAST(bit_count(xor(a.sig, b.sig)) AS INT) AS hamming
       FROM s a JOIN s b ON a.doc_id < b.doc_id
       WHERE bit_count(xor(a.sig, b.sig)) <= $SigMaxHamming"""
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_multimodal" -> (qMultimodal _),
    "q_multimodal_frames" -> (qMultimodalFrames _),
    "q_media_phash" -> (qMediaPhash _))

  override def oracles: Map[String, String] = Map(
    "q_multimodal" -> qMultimodalSql,
    "q_multimodal_frames" -> qMultimodalFramesSql,
    "q_media_phash" -> qMediaPhashSql)
}
