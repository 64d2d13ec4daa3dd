package graft

import org.apache.spark.sql.functions._

/** q_dedup_incremental's non-compositional corner, FORCED: the driver
  * corpora never push a shingle over the df cap with the delta alone, so
  * the cap-exit repair path (step 3 of the operator doc) would otherwise
  * ride along untested. This spec builds a corpus where the delta batch
  * pushes a shared shingle past [[operators.Dedup.ShingleDfCap]] —
  * changing the capped-common count of pairs that contain NO new doc —
  * and pins the incremental result equal to the full recompute pair for
  * pair, J values included. */
class DedupIncrementalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("dedup-incr").toFile
    d.deleteOnExit()
    val cap = operators.Dedup.ShingleDfCap
    // the EXIT shingle: "alpha beta gamma" appears in (cap − 2) base docs
    // and 5 new docs → df_base = cap − 2 (capped in the base state),
    // df_full = cap + 3 (over the cap after the delta). Base doc pairs
    // sharing it must LOSE it from their capped-common counts.
    // Docs 0 and 5 additionally share a private near-dup body, so their
    // pair must SURVIVE re-verification with a changed J; the other
    // exit-shingle-only pairs must drop out entirely.
    val body = (1 to 12).map(i => s"word$i").mkString(" ")
    val exiters = (0 until cap + 3).map { i =>
      val id = if (i % 5 == 4) i * 5L + 4 else i * 5L // ≡4 mod 5 → "new"
      val priv = if (i == 0 || i == 5) body else s"solo${i}a solo${i}b solo${i}c"
      (id, s"alpha beta gamma $priv")
    }
    // keep ids unique and the mod-5 split as intended
    val rows = exiters.zipWithIndex.map { case ((_, text), i) =>
      val isNew = i >= cap - 2 // last 5 are the delta batch
      val id = if (isNew) i * 5L + 4 else i * 5L
      (id, text, "en", "spec", text.length.toLong)
    }
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"${d.getAbsolutePath}/documents.parquet")
    d.getAbsolutePath
  }

  test("the delta actually forces a cap exit (fixture is non-vacuous)") {
    val cap = operators.Dedup.ShingleDfCap
    val sh = operators.Dedup.docShingles(spark, dir)
      .join(spark.read.parquet(s"$dir/documents.parquet").select("doc_id"), Seq("doc_id"))
    val dfs = sh.withColumn("is_new", col("doc_id") % 5 === 4)
      .groupBy("sh").agg(count(lit(1)).as("df_full"),
        sum(when(!col("is_new"), 1L).otherwise(0L)).as("df_base"))
    val exits = dfs.filter(col("df_base") >= 2 && col("df_base") <= cap &&
      col("df_full") > cap).count()
    assert(exits >= 1L, "fixture must force at least one cap exit")
  }

  test("multi-batch fold: three sequential batches equal the one-shot recompute") {
    // batches by doc_id mod 3 over the transition-forcing fixture — the
    // fold must survive a cap exit landing in the MIDDLE batch too
    val sh = operators.Dedup.docShingles(spark, dir)
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    def part(m: Long) = sh.filter(col("doc_id") % 3 === m)
    val empty = part(0).filter(lit(false))
    val emptyPairs = operators.Dedup
      .dedupFoldBatch(empty, // fold from nothing over batch 0
        spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("doc_a", org.apache.spark.sql.types.LongType),
            org.apache.spark.sql.types.StructField("doc_b", org.apache.spark.sql.types.LongType),
            org.apache.spark.sql.types.StructField("jaccard", org.apache.spark.sql.types.DoubleType)))),
        part(0), sizes)
    val p1 = operators.Dedup.dedupFoldBatch(part(0), emptyPairs, part(1), sizes)
    val p2 = operators.Dedup.dedupFoldBatch(
      part(0).unionByName(part(1)), p1, part(2), sizes)
    val folded = p2.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val full = operators.Dedup.qDedupJaccard(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(folded === full,
      s"missing=${(full -- folded).take(5)} extra=${(folded -- full).take(5)}")
  }

  test("incremental result equals the full recompute under cap exits") {
    val full = operators.Dedup.qDedupJaccard(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val incr = operators.Dedup.qDedupIncremental(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(incr === full,
      s"missing=${(full -- incr).take(5)} extra=${(incr -- full).take(5)}")
    assert(full.nonEmpty, "the surviving private-body pair must exist")
  }

  // ---- tier 2 (r18 verdict task 4): folding the LABEL consumers ----

  private def ccOf(pairs: org.apache.spark.sql.DataFrame) =
    operators.Dedup.connectedComponents(
      pairs.select(col("doc_a").as("a"), col("doc_b").as("b")))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  private def labelsOf(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("labelFoldBatch: a cross-batch cluster MERGE adopts the min id " +
    "without re-running CC on untouched clusters") {
    // base: {1,2} and {5,6} and a far cluster {100,101}; the delta adds
    // the bridge (2,5) — merged component must adopt min id 1, and
    // {100,101} must come through frozen
    val basePairs = Seq((1L, 2L), (5L, 6L), (100L, 101L))
      .toDF("doc_a", "doc_b")
    val baseLabels = operators.Dedup.connectedComponents(
      basePairs.select(col("doc_a").as("a"), col("doc_b").as("b")))
      .select(col("id").as("doc_id"), col("label").as("cluster_id"))
    val newPairs = Seq((1L, 2L), (5L, 6L), (100L, 101L), (2L, 5L))
      .toDF("doc_a", "doc_b")
    val folded = labelsOf(
      operators.Dedup.labelFoldBatch(baseLabels, basePairs, newPairs))
    assert(folded === Set((1L, 1L), (2L, 1L), (5L, 1L), (6L, 1L),
      (100L, 100L), (101L, 100L)))
    assert(folded === ccOf(newPairs), "fold must equal the full recompute")
  }

  test("labelFoldBatch: an edge DELETION dissolves only the touched " +
    "cluster and re-solves it from surviving edges") {
    // base: chain 1-2-3 (one cluster, label 1) plus untouched {10,11};
    // the delta removes (1,2): doc 1 loses its last edge and must DROP
    // OUT of the relation; {2,3} re-solves to label 2; {10,11} frozen
    val basePairs = Seq((1L, 2L), (2L, 3L), (10L, 11L))
      .toDF("doc_a", "doc_b")
    val baseLabels = operators.Dedup.connectedComponents(
      basePairs.select(col("doc_a").as("a"), col("doc_b").as("b")))
      .select(col("id").as("doc_id"), col("label").as("cluster_id"))
    val newPairs = Seq((2L, 3L), (10L, 11L)).toDF("doc_a", "doc_b")
    val folded = labelsOf(
      operators.Dedup.labelFoldBatch(baseLabels, basePairs, newPairs))
    assert(folded === Set((2L, 2L), (3L, 2L), (10L, 10L), (11L, 10L)))
    assert(folded === ccOf(newPairs))
  }

  test("labelFoldBatch: deletion + addition in ONE batch (a dissolved " +
    "cluster's survivor merges into another cluster)") {
    // base: {1,2,3} via (1,2),(2,3) and {7,8}; the batch removes (1,2)
    // AND adds (3,7): {2,3} must re-solve and then merge with {7,8}
    // under min id 2; doc 1 drops out
    val basePairs = Seq((1L, 2L), (2L, 3L), (7L, 8L)).toDF("doc_a", "doc_b")
    val baseLabels = operators.Dedup.connectedComponents(
      basePairs.select(col("doc_a").as("a"), col("doc_b").as("b")))
      .select(col("id").as("doc_id"), col("label").as("cluster_id"))
    val newPairs = Seq((2L, 3L), (7L, 8L), (3L, 7L)).toDF("doc_a", "doc_b")
    val folded = labelsOf(
      operators.Dedup.labelFoldBatch(baseLabels, basePairs, newPairs))
    assert(folded === Set((2L, 2L), (3L, 2L), (7L, 2L), (8L, 2L)))
    assert(folded === ccOf(newPairs))
  }

  test("label fold over the cap-exit corpus equals full CC (real " +
    "deletions from the pair fold, not a hand fixture)") {
    val basePairs = operators.Dedup.incrBaseState(spark, dir)
    val baseLabels = operators.Dedup.connectedComponents(
      basePairs.select(col("doc_a").as("a"), col("doc_b").as("b")))
      .select(col("id").as("doc_id"), col("label").as("cluster_id"))
    val newPairs = operators.Dedup.qDedupIncremental(spark, dir)
    val folded = labelsOf(
      operators.Dedup.labelFoldBatch(baseLabels, basePairs, newPairs))
    assert(folded === ccOf(newPairs),
      "label fold must equal full CC over the folded pair relation")
    // non-vacuous: the cap exit must actually delete at least one edge
    val removed = basePairs.select("doc_a", "doc_b")
      .except(newPairs.select("doc_a", "doc_b")).count()
    assert(removed >= 1L, "fixture must exercise the deletion path")
  }

  test("q_canonical_incremental equals q_dedup_canonical row for row " +
    "(frozen rows + touched-cluster re-derive, real deletions included)") {
    def norm(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5))).toSet
    val full = norm(operators.Dedup.qDedupCanonical(spark, dir))
    val incr = norm(operators.Dedup.qCanonicalIncremental(spark, dir))
    assert(incr === full,
      s"missing=${(full -- incr).take(3)} extra=${(incr -- full).take(3)}")
    assert(full.nonEmpty)
  }

  test("q_split_incremental equals q_split_leakfree row for row") {
    val full = operators.Dedup.qSplitLeakfree(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    val incr = operators.Dedup.qSplitIncremental(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(incr === full,
      s"missing=${(full -- incr).take(5)} extra=${(incr -- full).take(5)}")
  }
}
