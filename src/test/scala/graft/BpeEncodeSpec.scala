package graft

import graft.operators.{Bpe, TextPrep}
import org.apache.spark.sql.functions._

/** BPE encoding vs a driver-side reference encoder, plus the structural
  * invariants: pieces concatenate back to the word, and every piece is
  * either a trained merged symbol or a single character. */
class BpeEncodeSpec extends SparkSpec {
  import spark.implicits._

  /** Reference greedy left-to-right encoder (same scan as Bpe.localTrain's
    * merge application). */
  private def refEncode(w: String, merges: Seq[(String, String)]): Vector[String] =
    merges.foldLeft(w.split("").toVector) { case (syms, (a, b)) =>
      val acc = scala.collection.mutable.ArrayBuffer.empty[String]
      syms.foreach { x =>
        if (acc.nonEmpty && acc.last == a && x == b) { acc.remove(acc.length - 1); acc += (a + b) }
        else acc += x
      }
      acc.toVector
    }

  test("encodeWords agrees with the reference encoder on the corpus vocabulary") {
    val merges = Bpe.qBpe(spark, sfDir).orderBy(col("rank").asc)
      .select("left", "right").collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(merges.nonEmpty)
    val words = TextPrep.cleanDocs(spark, sfDir)
      .select(explode(col("toks")).as("w")).distinct()
    val got = Bpe.encodeWords(words, merges)
      .collect().map(r => r.getString(0) -> r.getSeq[String](1).toVector).toMap
    assert(got.nonEmpty)
    val mergedSet = merges.map { case (a, b) => a + b }.toSet
    got.foreach { case (w, pieces) =>
      assert(pieces.mkString("") === w, s"pieces don't concatenate to $w")
      pieces.foreach(p =>
        assert(p.length == 1 || mergedSet.contains(p), s"piece $p of $w not in vocab"))
      assert(pieces === refEncode(w, merges), s"greedy scan mismatch on $w")
    }
  }

  test("q_bpe_encode piece counts recount from the reference encoder") {
    val merges = Bpe.qBpe(spark, sfDir).orderBy(col("rank").asc)
      .select("left", "right").collect().map(r => (r.getString(0), r.getString(1))).toSeq
    val perDoc = TextPrep.cleanDocs(spark, sfDir)
      .select(col("doc_id"), col("toks")).collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val got = Bpe.qBpeEncode(spark, sfDir).collect()
      .map(r => r.getAs[Long]("doc_id") -> ((r.getAs[Long]("n_words"), r.getAs[Long]("n_bpe_tokens")))).toMap
    assert(got.nonEmpty)
    got.foreach { case (id, (nw, nb)) =>
      val toks = perDoc(id)
      assert(nw === toks.length.toLong)
      assert(nb === toks.map(refEncode(_, merges).length.toLong).sum, s"doc $id")
    }
    // docs with zero clean tokens produce no row (inner join on words)
    assert(got.keySet === perDoc.filter(_._2.nonEmpty).keySet)
  }
}
