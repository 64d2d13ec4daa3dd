package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** gensim interchange files — the reference persists its dictionary and
  * TF-IDF corpus as `wiki_wordids.txt` (gensim
  * Dictionary.save_as_text/load_from_text) and `wiki_tfidf.mm`
  * (Matrix-Market MmCorpus) and every downstream script loads those
  * (wiki_lda.py:13-14, wiki_hdp.py:14-15, coherence_log_perplexity
  * .py:13-14, supervised_classifier.py:62-63). The repo's dictionary and
  * TF-IDF live as parquet relations; these writers/readers close the
  * interop gap so gensim artifacts can be exported/ingested.
  *
  * Formats (public gensim on-disk formats):
  *  - wordids text: first line `num_docs`, then `id<TAB>word<TAB>docfreq`
  *    lines sorted by word (save_as_text's sort_by_word=True order).
  *  - Matrix Market coordinate: `%%MatrixMarket matrix coordinate real
  *    general` banner, optional `%` comments, a `docs terms nnz` size
  *    line, then 1-BASED `doc term weight` triples grouped by doc.
  *
  * Scale posture: both are single-file TEXT formats — a single writer is
  * forced by the format itself, not by this implementation. The writers
  * stream `toLocalIterator` over a sorted relation (one partition in
  * driver memory at a time, never the whole relation); the distributed
  * side stays the parquet relation — export is a bounded interop step, a
  * model artifact hand-off, not a pipeline stage. Readers are fully
  * distributed (spark.read.text + filter + split). */
object GensimInterchange {

  // gensim reads/writes these files as UTF-8; FileWriter would use the
  // platform default charset (mangles multilingual tokens on JVM <18
  // under a non-UTF-8 locale), so go through an explicit UTF-8 writer.
  private def utf8Writer(path: String): java.io.PrintWriter =
    new java.io.PrintWriter(new java.io.BufferedWriter(
      new java.io.OutputStreamWriter(
        new java.io.FileOutputStream(path),
        java.nio.charset.StandardCharsets.UTF_8)))

  /** Write (token_id, tok, df) + the corpus doc count as
    * Dictionary.save_as_text format. Any extra columns are ignored. */
  def writeDictionary(dict: DataFrame, numDocs: Long, path: String): Unit = {
    val rows = dict.select(col("token_id").cast("long"), col("tok"),
      col("df").cast("long")).orderBy("tok").toLocalIterator()
    val out = utf8Writer(path)
    try {
      out.println(numDocs.toString)
      while (rows.hasNext) {
        val r = rows.next()
        out.println(s"${r.getLong(0)}\t${r.getString(1)}\t${r.getLong(2)}")
      }
    } finally out.close()
  }

  /** Read a save_as_text dictionary file → (token_id, tok, df).
    * Accepts both the with-num_docs-header and headerless variants
    * (load_from_text does the same). */
  def readDictionary(s: SparkSession, path: String): DataFrame =
    s.read.text(path)
      .select(split(col("value"), "\t").as("f"))
      .filter(size(col("f")) >= 3) // the 1-column num_docs header drops out
      .select(element_at(col("f"), 1).cast("long").as("token_id"),
        element_at(col("f"), 2).as("tok"),
        element_at(col("f"), 3).cast("long").as("df"))

  /** Corpus doc count recorded in the header line, if present. */
  def readDictionaryNumDocs(s: SparkSession, path: String): Option[Long] =
    s.read.text(path)
      .filter(!col("value").contains("\t"))
      .select(col("value").cast("long")).collect()
      .headOption.flatMap(r => Option(r.get(0)).map(_.asInstanceOf[Long]))

  /** Write a (doc_id, term_id, weight) bag-of-weights relation as a
    * Matrix-Market coordinate file (MmCorpus layout: 1-based indices,
    * triples sorted by (doc, term)). `numDocs`/`numTerms` are the
    * declared matrix dimensions — pass the CORPUS dimensions, which may
    * exceed max(id)+1 when trailing docs/terms are empty, exactly like
    * gensim's MmWriter. Weights serialize via Double.toString (shortest
    * round-trip decimal — same contract as Python's repr; both parse
    * back bit-identically). */
  def writeMmCorpus(bow: DataFrame, numDocs: Long, numTerms: Long,
      path: String): Unit = {
    val nnz = bow.count()
    val rows = bow.select(col("doc_id").cast("long"),
      col("term_id").cast("long"), col("weight").cast("double"))
      .orderBy("doc_id", "term_id").toLocalIterator()
    val out = utf8Writer(path)
    try {
      out.println("%%MatrixMarket matrix coordinate real general")
      out.println(s"$numDocs $numTerms $nnz")
      while (rows.hasNext) {
        val r = rows.next()
        out.println(s"${r.getLong(0) + 1} ${r.getLong(1) + 1} ${r.getDouble(2)}")
      }
    } finally out.close()
  }

  /** Read a Matrix-Market coordinate file → 0-based
    * (doc_id, term_id, weight). Banner and `%` comment lines drop; the
    * size line is recognized POSITIONALLY (first non-comment line, the
    * MM spec) via RDD zipWithIndex, which GUARANTEES input order —
    * monotonically_increasing_id only happens to track file order under
    * today's split packing, and a multi-file path or repacked splits
    * would misidentify a data triple as the header. */
  def readMmCorpus(s: SparkSession, path: String): DataFrame = {
    import s.implicits._
    val lines = s.sparkContext.textFile(path).zipWithIndex()
      .map { case (v, ln) => (ln, v) }.toDF("ln", "value")
      .filter(!col("value").startsWith("%") && length(trim(col("value"))) > 0)
    val headerLn = lines.agg(min(col("ln"))).head.getLong(0)
    lines.filter(col("ln") > headerLn)
      .select(split(trim(col("value")), "\\s+").as("f"))
      .select((element_at(col("f"), 1).cast("long") - 1).as("doc_id"),
        (element_at(col("f"), 2).cast("long") - 1).as("term_id"),
        element_at(col("f"), 3).cast("double").as("weight"))
  }

  /** Declared (docs, terms, nnz) of a Matrix-Market file's size line
    * (first non-comment line by guaranteed input order, as above). */
  def readMmHeader(s: SparkSession, path: String): (Long, Long, Long) = {
    import s.implicits._
    val first = s.sparkContext.textFile(path).zipWithIndex()
      .map { case (v, ln) => (ln, v) }.toDF("ln", "value")
      .filter(!col("value").startsWith("%") && length(trim(col("value"))) > 0)
      .orderBy("ln").select("value").head.getString(0)
    val p = first.trim.split("\\s+")
    (p(0).toLong, p(1).toLong, p(2).toLong)
  }
}
