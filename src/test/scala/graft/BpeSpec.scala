package graft

import graft.operators.{Bpe, TextPrep}
import org.apache.spark.sql.functions._

/** Distributed BPE training vs a single-node reference implementation of
  * the same algorithm (greedy left-to-right merges, (count desc, left,
  * right) tie-break) on the sf0.001 corpus. */
class BpeSpec extends SparkSpec {

  /** Reference BPE on a word-frequency map, straight from the paper. */
  private def referenceBpe(wordCnt: Map[String, Long], n: Int): Seq[(String, String, Long)] = {
    var words: Map[Vector[String], Long] =
      wordCnt.groupBy(_._1.split("").toVector).map { case (k, v) => k -> v.values.sum }
    val out = Seq.newBuilder[(String, String, Long)]
    for (_ <- 1 to n) {
      val pairs = scala.collection.mutable.Map.empty[(String, String), Long]
      words.foreach { case (syms, cnt) =>
        syms.sliding(2).foreach {
          case Vector(a, b) => pairs((a, b)) = pairs.getOrElse((a, b), 0L) + cnt
          case _ =>
        }
      }
      if (pairs.nonEmpty) {
        val ((a, b), cnt) = pairs.toSeq.minBy { case ((x, y), c) => (-c, x, y) }
        out += ((a, b, cnt))
        words = words.groupBy { case (syms, _) =>
          val acc = Vector.newBuilder[String]
          var last: String = null
          syms.foreach { x =>
            if (last == a && x == b) { // pop + push merged
              val cur = acc.result(); acc.clear()
              cur.dropRight(1).foreach(acc += _); acc += (a + b); last = a + b
            } else { acc += x; last = x }
          }
          acc.result()
        }.map { case (k, v) => k -> v.values.sum }
      }
    }
    out.result()
  }

  test("distributed merge table equals the single-node reference") {
    val wordCnt = TextPrep.cleanDocs(spark, sfDir)
      .select(explode(col("toks")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = referenceBpe(wordCnt, 10)
    // distributed path (vocab limit 0 forces the Spark loop)
    val dist = Bpe.train(spark, sfDir, 10, localVocabLimit = 0L)
      .orderBy("rank").collect()
      .map(r => (r.getString(1), r.getString(2), r.getLong(4))).toSeq
    assert(dist === want)
    // driver path (the default at this vocab size)
    val local = Bpe.train(spark, sfDir, 10)
      .orderBy("rank").collect()
      .map(r => (r.getString(1), r.getString(2), r.getLong(4))).toSeq
    assert(local === want)
  }

  test("merged symbols reconstruct their parts and ranks are dense") {
    val rows = Bpe.train(spark, sfDir, 5).orderBy("rank").collect()
    assert(rows.map(_.getInt(0)).toSeq === (1 to rows.length))
    rows.foreach { r =>
      assert(r.getString(3) === r.getString(1) + r.getString(2))
      assert(r.getLong(4) > 0)
    }
  }
}
