package graft

/** Dev probe (test scope): dump physical plans of the heavy queries for the
  * per-round scale audit — look for unexpected broadcasts, single-partition
  * exchanges, and codegen breaks. */
object ExplainProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val targets: Seq[(String, org.apache.spark.sql.DataFrame)] =
      if (args.length > 1) args.drop(1).toSeq.map(n => n -> SparkEntry.queries(n)(spark, dir))
      else Seq(
        "q3_join" -> operators.Relational.q3Join(spark, dir),
        "q_dedup_jaccard" -> operators.Dedup.qDedupJaccard(spark, dir),
        "q_dedup_minhash" -> operators.Dedup.qDedupMinhash(spark, dir),
        "q_curation" -> operators.TextAnalysis.qCuration(spark, dir),
        "q_clean_english" -> operators.TextPrep.qCleanEnglish(spark, dir),
        "q_dup_spans" -> operators.Dedup.qDupSpans(spark, dir),
        "q_merge_upsert" -> operators.Relational.qMergeUpsert(spark, dir),
        "q_media_phash" -> operators.Multimodal.qMediaPhash(spark, dir),
        "q_asof_native" -> operators.Relational.qAsofNative(spark, dir),
        "q_bigram_lm" -> operators.TextScoring.qBigramLm(spark, dir),
        "q_rocchio" -> operators.SimilaritySearch.qRocchio(spark, dir),
        "q_winsorize" -> operators.RobustStats.qWinsorize(spark, dir),
        "q_mad" -> operators.RobustStats.qMad(spark, dir),
        "q_skyline" -> operators.Relational.qSkyline(spark, dir),
        "q_mannwhitney" -> operators.RobustStats.qMannwhitney(spark, dir),
        "q_ctfidf" -> operators.TextAnalysis.qCtfidf(spark, dir),
        "q_js_terms" -> operators.RobustStats.qJsTerms(spark, dir),
        "q_simhash_audit" -> operators.Dedup.qSimhashAudit(spark, dir),
        "q_cosine_lsh_audit" -> operators.Dedup.qCosineLshAudit(spark, dir),
        "q_gini" -> operators.Stats.qGini(spark, dir),
        "q_kendall" -> operators.Stats.qKendall(spark, dir),
        "q_lorenz" -> operators.Stats.qLorenz(spark, dir),
        "q11_value" -> operators.Tpch.q11Value(spark, dir),
        "q_novelty" -> operators.Dedup.qNovelty(spark, dir),
        "q_embed_outliers" -> operators.SimilaritySearch.qEmbedOutliers(spark, dir),
        "q_llr" -> operators.TextAnalysis.qLlr(spark, dir),
        "q_fellegi" -> operators.Evaluation.qFellegi(spark, dir),
        "q_ann_ivf_audit" -> operators.SimilaritySearch.qAnnIvfAudit(spark, dir),
        "q_ann_pq_audit" -> operators.SimilaritySearch.qAnnPqAudit(spark, dir),
        "q_anova" -> operators.Stats.qAnova(spark, dir),
        "q_kruskal" -> operators.RobustStats.qKruskal(spark, dir),
        "q_tcloseness" -> operators.RobustStats.qTcloseness(spark, dir),
        "q_hits" -> operators.Relational.qHits(spark, dir))
    targets.foreach { case (name, df) =>
      println(s"===== $name =====")
      df.explain("formatted")
    }
    spark.stop()
  }
}
