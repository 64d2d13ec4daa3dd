package graft.operators

import graft.QueryModule
import graft.functions.JaroWinkler
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's evaluation machinery (evaluate.py), distributed:
  *  - confusion matrix + precision/recall/accuracy/F1 (EVResult,
  *    evaluate.py:21-75) as a single aggregation over (prediction, gold);
  *  - gold-standard construction via set ops (evaluate.py:125-174):
  *    wiki-titles ∖ disambiguation-titles, intersect concepts → 0/1/2 label;
  *  - Jaro-Winkler ≥ threshold name matching (evaluate.py:100-106);
  *  - deterministic k-fold assignment (supervised_classifier.py:629).
  */
object Evaluation extends QueryModule {

  /** Generic confusion-matrix metrics for boolean (pred, gold) columns.
    * Ratios are double divisions of exact integer counts; zero denominators
    * yield NULL (DuckDB's x/0 semantics — keeps the oracle in lock-step and
    * avoids ANSI divide-by-zero when a class is empty). */
  def confusionMetrics(scored: DataFrame): DataFrame = {
    def ratio(num: org.apache.spark.sql.Column, den: org.apache.spark.sql.Column) =
      when(den =!= 0, round(num.cast("double") / den, 6))
    scored.agg(
      sum(when(col("pred") && col("gold"), 1L).otherwise(0L)).as("tp"),
      sum(when(col("pred") && !col("gold"), 1L).otherwise(0L)).as("fp"),
      sum(when(!col("pred") && !col("gold"), 1L).otherwise(0L)).as("tn"),
      sum(when(!col("pred") && col("gold"), 1L).otherwise(0L)).as("fn"))
      .select(col("tp"), col("fp"), col("tn"), col("fn"),
        ratio(col("tp"), col("tp") + col("fp")).as("precision"),
        ratio(col("tp"), col("tp") + col("fn")).as("recall"),
        ratio(col("tp") + col("tn"),
          col("tp") + col("fp") + col("tn") + col("fn")).as("accuracy"),
        ratio(lit(2.0) * col("tp"),
          lit(2.0) * col("tp") + col("fp") + col("fn")).as("f1"))
  }

  /** q_eval_metrics: language-ID prediction ('en') vs the lang gold label —
    * the EVResult pipeline on a real prediction task. Fused: prediction and
    * gold come from the SAME row of one scan (qLangId's marker-score rule
    * inline), so the whole evaluation is a map + one global aggregate —
    * no self-join of the corpus. The oracle keeps the compositional SQL. */
  def qEvalMetrics(s: SparkSession, dir: String): DataFrame =
    confusionMetrics(
      TextAnalysis.langIdOf(TextPrep.rawDocs(s, dir))
        .select((col("pred_lang") === "en").as("pred"), (col("lang") === "en").as("gold")))

  private val qEvalMetricsSql = {
    s"""WITH pred AS (
         SELECT p.doc_id, p.pred_lang = 'en' AS pred, d.lang = 'en' AS gold
         FROM (${TextAnalysis.oracles("q_lang_id")}) p
         JOIN documents d ON p.doc_id = d.doc_id),
       cm AS (
         SELECT
           CAST(sum(CASE WHEN pred AND gold THEN 1 ELSE 0 END) AS BIGINT) AS tp,
           CAST(sum(CASE WHEN pred AND NOT gold THEN 1 ELSE 0 END) AS BIGINT) AS fp,
           CAST(sum(CASE WHEN NOT pred AND NOT gold THEN 1 ELSE 0 END) AS BIGINT) AS tn,
           CAST(sum(CASE WHEN NOT pred AND gold THEN 1 ELSE 0 END) AS BIGINT) AS fn
         FROM pred)
       SELECT tp, fp, tn, fn,
         round(CAST(tp AS DOUBLE) / (tp + fp), 6) AS precision,
         round(CAST(tp AS DOUBLE) / (tp + fn), 6) AS recall,
         round(CAST(tp + tn AS DOUBLE) / (tp + fp + tn + fn), 6) AS accuracy,
         round(2.0 * tp / (2.0 * tp + fp + fn), 6) AS f1
       FROM cm"""
  }

  /** q_kappa: Cohen's kappa for the same lang-ID task — chance-corrected
    * agreement, the standard complement to raw accuracy when classes are
    * imbalanced (here 'en' dominates, so accuracy alone overstates skill).
    * κ = (p_o − p_e)/(1 − p_e) from the exact confusion counts; count
    * products stay in long arithmetic (≤(10⁸)² at 100 TB corpus scale
    * still fits), one double division each for p_o and p_e. */
  def qKappa(s: SparkSession, dir: String): DataFrame = {
    val scored = TextAnalysis.langIdOf(TextPrep.rawDocs(s, dir))
      .select((col("pred_lang") === "en").as("pred"), (col("lang") === "en").as("gold"))
    val n = (col("tp") + col("fp") + col("tn") + col("fn")).cast("double")
    val po = (col("tp") + col("tn")).cast("double") / n
    val pe = ((col("tp") + col("fp")) * (col("tp") + col("fn"))
      + (col("fn") + col("tn")) * (col("fp") + col("tn"))).cast("double") / (n * n)
    confusionMetrics(scored)
      .select(col("tp"), col("fp"), col("tn"), col("fn"),
        round(po, 6).as("po"), round(pe, 6).as("pe"),
        round((po - pe) / (lit(1.0) - pe), 6).as("kappa"))
  }

  private val qKappaSql =
    s"""WITH pred AS (
         SELECT p.doc_id, p.pred_lang = 'en' AS pred, d.lang = 'en' AS gold
         FROM (${TextAnalysis.oracles("q_lang_id")}) p
         JOIN documents d ON p.doc_id = d.doc_id),
       cm AS (
         SELECT
           CAST(sum(CASE WHEN pred AND gold THEN 1 ELSE 0 END) AS BIGINT) AS tp,
           CAST(sum(CASE WHEN pred AND NOT gold THEN 1 ELSE 0 END) AS BIGINT) AS fp,
           CAST(sum(CASE WHEN NOT pred AND NOT gold THEN 1 ELSE 0 END) AS BIGINT) AS tn,
           CAST(sum(CASE WHEN NOT pred AND gold THEN 1 ELSE 0 END) AS BIGINT) AS fn
         FROM pred),
       k AS (
         SELECT tp, fp, tn, fn,
           CAST(tp + tn AS DOUBLE) / CAST(tp + fp + tn + fn AS DOUBLE) AS po,
           CAST((tp + fp) * (tp + fn) + (fn + tn) * (fp + tn) AS DOUBLE)
             / (CAST(tp + fp + tn + fn AS DOUBLE) * CAST(tp + fp + tn + fn AS DOUBLE)) AS pe
         FROM cm)
       SELECT tp, fp, tn, fn, round(po, 6) AS po, round(pe, 6) AS pe,
         round((po - pe) / (1.0 - pe), 6) AS kappa
       FROM k"""

  /** q_gold_standard: conceptInWikiOrDisambiguation labels via set algebra
    * (1 = disambiguation page, 2 = plain wiki page, 0 = neither), modeled on
    * part names: disambiguation ≈ p_size > 25, wiki ≈ brand family 1x. */
  def qGoldStandard(s: SparkSession, dir: String): DataFrame = {
    val p = Tables.part(s, dir)
    val concepts = p.select(col("p_name").as("name")).distinct()
    val disamb = p.filter(col("p_size") > 25).select(col("p_name").as("name")).distinct()
    val wiki = p.filter(col("p_brand").startsWith("Brand#1"))
      .select(col("p_name").as("name")).distinct()
      .join(disamb, Seq("name"), "left_anti") // wiki set excludes disambiguation
    concepts
      .join(disamb.withColumn("is_d", lit(1)), Seq("name"), "left_outer")
      .join(wiki.withColumn("is_w", lit(1)), Seq("name"), "left_outer")
      .select(col("name"),
        when(col("is_d") === 1, 1).when(col("is_w") === 1, 2).otherwise(0).as("label"))
  }

  private val qGoldStandardSql =
    """WITH concepts AS (SELECT DISTINCT p_name AS name FROM part),
       disamb AS (SELECT DISTINCT p_name AS name FROM part WHERE p_size > 25),
       wiki AS (
         SELECT DISTINCT p_name AS name FROM part WHERE p_brand LIKE 'Brand#1%'
         AND p_name NOT IN (SELECT name FROM disamb))
       SELECT c.name,
         CASE WHEN d.name IS NOT NULL THEN 1
              WHEN w.name IS NOT NULL THEN 2
              ELSE 0 END AS label
       FROM concepts c
       LEFT JOIN disamb d ON c.name = d.name
       LEFT JOIN wiki w ON c.name = w.name"""

  /** q_jaro_winkler: near-identical name pairs among distinct part names
    * (evaluate.py compareStrings uses ≥0.95; we surface ≥0.8 pairs with the
    * rounded score). Distinct-name set is small → broadcast self-join. */
  def qJaroWinkler(s: SparkSession, dir: String): DataFrame = {
    val names = Tables.part(s, dir).select(col("p_name").as("name")).distinct()
    names.as("a").join(broadcast(names.as("b")), col("a.name") < col("b.name"))
      .select(col("a.name").as("name_a"), col("b.name").as("name_b"),
        round(JaroWinkler.similarity(col("a.name"), col("b.name")), 6).as("jw"))
      .filter(col("jw") >= 0.8)
  }

  private val qJaroWinklerSql =
    """WITH n AS (SELECT DISTINCT p_name AS name FROM part)
       SELECT a.name AS name_a, b.name AS name_b,
         round(jaro_winkler_similarity(a.name, b.name), 6) AS jw
       FROM n a JOIN n b ON a.name < b.name
       WHERE round(jaro_winkler_similarity(a.name, b.name), 6) >= 0.8"""

  /** q_cv_folds: deterministic stratified-ish fold assignment + per-fold
    * class balance (the distributed analogue of StratifiedKFold bookkeeping). */
  def qCvFolds(s: SparkSession, dir: String): DataFrame =
    Tables.embeddings(s, dir)
      .select((col("vec_id") % 5).cast("int").as("fold"), col("label"))
      .groupBy("fold")
      .agg(count(lit(1)).as("n"),
        countDistinct(col("label")).as("n_classes"),
        sum(when(col("label") < 5, 1L).otherwise(0L)).as("n_class0"))

  private val qCvFoldsSql =
    """SELECT CAST(vec_id % 5 AS INT) AS fold, count(*) AS n,
       count(DISTINCT label) AS n_classes,
       CAST(sum(CASE WHEN label < 5 THEN 1 ELSE 0 END) AS BIGINT) AS n_class0
       FROM embeddings GROUP BY 1"""

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_eval_metrics" -> (qEvalMetrics _),
    "q_gold_standard" -> (qGoldStandard _),
    "q_jaro_winkler" -> (qJaroWinkler _),
    "q_kappa" -> (qKappa _),
    "q_cv_folds" -> (qCvFolds _))

  override def oracles: Map[String, String] = Map(
    "q_eval_metrics" -> qEvalMetricsSql,
    "q_gold_standard" -> qGoldStandardSql,
    "q_jaro_winkler" -> qJaroWinklerSql,
    "q_kappa" -> qKappaSql,
    "q_cv_folds" -> qCvFoldsSql)
}
