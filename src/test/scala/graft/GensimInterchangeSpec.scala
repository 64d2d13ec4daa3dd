package graft

import graft.sources.GensimInterchange
import org.apache.spark.sql.functions._

/** gensim interchange round-trips: the wordids/MmCorpus formats every
  * reference script loads (wiki_lda.py:13-14). Fixture strings below are
  * hand-authored in the CANONICAL gensim layouts, so the readers are
  * proven against the real format, not just against our own writers. */
class GensimInterchangeSpec extends SparkSpec {

  private def tmp(name: String): String = {
    val d = java.nio.file.Files.createTempDirectory("gensim-io").toFile
    d.deleteOnExit()
    new java.io.File(d, name).getAbsolutePath
  }

  test("dictionary writes save_as_text and round-trips through the reader") {
    val dict = graft.operators.TextPrep.qDictionary(spark, sfDir)
    val nDocs = graft.sources.Tables.documents(spark, sfDir).count()
    val path = tmp("wordids.txt")
    GensimInterchange.writeDictionary(dict, nDocs, path)
    // header + sorted-by-word body
    val lines = scala.io.Source.fromFile(path).getLines().toVector
    assert(lines.head === nDocs.toString)
    val words = lines.tail.map(_.split("\t")(1))
    assert(words === words.sorted, "save_as_text orders by word")
    // round-trip: identical (token_id, tok, df) set
    val back = GensimInterchange.readDictionary(spark, path)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val orig = dict.select(col("token_id").cast("long"), col("tok"),
      col("df").cast("long"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(back === orig)
    assert(GensimInterchange.readDictionaryNumDocs(spark, path) === Some(nDocs))
  }

  test("mm corpus writes Matrix-Market and round-trips through the reader") {
    val dict = graft.operators.TextPrep.qDictionary(spark, sfDir)
    // gensim term ids are 0-based; the repo dictionary is 1-based row_number
    val bow = graft.operators.TextPrep.qTfidf(spark, sfDir)
      .join(dict.select(col("tok"), (col("token_id") - 1).as("term_id")), Seq("tok"))
      .select(col("doc_id"), col("term_id"), col("tfidf").as("weight"))
    val nDocs = graft.sources.Tables.documents(spark, sfDir).count()
    val nTerms = dict.count()
    val path = tmp("tfidf.mm")
    GensimInterchange.writeMmCorpus(bow, nDocs, nTerms, path)
    val lines = scala.io.Source.fromFile(path).getLines().toVector
    assert(lines.head === "%%MatrixMarket matrix coordinate real general")
    assert(lines(1) === s"$nDocs $nTerms ${bow.count()}")
    val hdr = GensimInterchange.readMmHeader(spark, path)
    assert(hdr === ((nDocs, nTerms, bow.count())))
    val back = GensimInterchange.readMmCorpus(spark, path)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val orig = bow.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(back === orig, "weights must round-trip bit-identically")
  }

  test("readers accept canonical gensim-authored fixtures") {
    // a load_from_text dictionary WITH num_docs header...
    val d1 = tmp("fixture_wordids.txt")
    val w = new java.io.PrintWriter(d1)
    w.print("3\n0\tapple\t2\n1\tbanana\t1\n2\tcherry\t3\n"); w.close()
    val dict = GensimInterchange.readDictionary(spark, d1)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(dict === Set((0L, "apple", 2L), (1L, "banana", 1L), (2L, "cherry", 3L)))
    assert(GensimInterchange.readDictionaryNumDocs(spark, d1) === Some(3L))
    // ...and headerless (both are valid load_from_text inputs)
    val d2 = tmp("fixture_noheader.txt")
    val w2 = new java.io.PrintWriter(d2)
    w2.print("0\tapple\t2\n1\tbanana\t1\n"); w2.close()
    assert(GensimInterchange.readDictionary(spark, d2).count() === 2L)
    assert(GensimInterchange.readDictionaryNumDocs(spark, d2) === None)
    // an MmCorpus file with banner, % comment, size line, python-repr
    // weights; a 2-row 3-column body must not eat the size line
    val m1 = tmp("fixture.mm")
    val w3 = new java.io.PrintWriter(m1)
    w3.print("%%MatrixMarket matrix coordinate real general\n" +
      "% written by gensim\n3 5 4\n1 1 0.5\n1 3 1e-05\n2 2 4.0\n3 5 2\n")
    w3.close()
    assert(GensimInterchange.readMmHeader(spark, m1) === ((3L, 5L, 4L)))
    val mm = GensimInterchange.readMmCorpus(spark, m1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(mm === Set((0L, 0L, 0.5), (0L, 2L, 1e-05), (1L, 1L, 4.0), (2L, 4L, 2.0)))
  }
}
