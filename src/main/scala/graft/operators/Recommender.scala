package graft.operators

import graft.QueryModule
import graft.sources.Tables
import org.apache.spark.ml.recommendation.{ALS, ALSModel}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Latent-factor collaborative filtering — the missing member of the
  * recommender family (r16 verdict task 4). q_copurchase / q_item_sim /
  * q_link_pred cover counting, normalization, and graph topology over
  * the customer→part interaction data; ALS learns the latent-factor
  * model over the same relation (MLlib ALS, implicit-feedback — the
  * Hu/Koren/Volinsky 2008 formulation — seeded, fixed rank/iters).
  * This is also the reference's "learn embeddings from interactions"
  * shape (supervised_classifier.py trains on LDA topic vectors; ALS is
  * the interaction-matrix analogue the LLM-pipeline brief wants).
  *
  * Scale posture: ALS is THE distributed factorization (blocked
  * alternating least squares: each sweep solves per-user/per-item
  * rank×rank normal equations with only the factor blocks shuffled —
  * never the interaction matrix against itself). The interaction
  * relation is one join+groupBy of lineitem×orders (one shuffle, then
  * persisted + memoized via ModelCache like the copurchase family).
  * Query surfaces are bounded: recommendations only for a fixed
  * [[AlsAnchorUsers]]-user anchor set (recommendForUserSubset — never
  * the users×items cross product), and the audit's score probes are
  * anchor×anchor-bounded broadcasts. Iterative training is excluded
  * from the Bench headline per the documented ML-training rule. */
object Recommender extends QueryModule {

  val AlsRank = 8
  val AlsIters = 10
  val AlsSeed = 20260815L
  val AlsReg = 0.1
  val AlsAlpha = 8.0
  /** Bounded anchor set: the [[AlsAnchorUsers]] smallest custkeys with
    * any interaction (deterministic; bounded-state rule — the collect
    * below is over a k-row relation). */
  val AlsAnchorUsers = 50
  val AlsTopK = 3

  /** (user, item, strength): distinct-order count per (customer, part) —
    * the implicit-feedback confidence input. Memoized + persisted per
    * (session, dir): shared by q_als, q_als_audit, and the spec. */
  def interactions(s: SparkSession, dir: String): DataFrame =
    graft.ModelCache.getOrElseUpdate(s, s"rec.inter:$dir") {
      val df = Tables.lineitem(s, dir)
        .select(col("l_orderkey"), col("l_partkey"))
        .join(Tables.orders(s, dir).select(col("o_orderkey"), col("o_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_custkey").cast("int").as("user"),
          col("l_partkey").cast("int").as("item"))
        .agg(countDistinct(col("l_orderkey")).cast("double").as("strength"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      df.count() // materialize once under the cache lock
      df
    }

  def fit(s: SparkSession, dir: String): ALSModel =
    graft.ModelCache.getOrElseUpdate(s, s"rec.als:$dir") {
      new ALS()
        .setUserCol("user").setItemCol("item").setRatingCol("strength")
        .setImplicitPrefs(true)
        .setRank(AlsRank).setMaxIter(AlsIters)
        .setRegParam(AlsReg).setAlpha(AlsAlpha)
        .setSeed(AlsSeed)
        .setColdStartStrategy("drop")
        .fit(interactions(s, dir))
    }

  /** q_als: top-[[AlsTopK]] part recommendations for the bounded anchor
    * users (rows-only — iterative training; q_als_audit is the
    * hash-gated certificate). recommendForUserSubset scores only the
    * anchor block against the item factors — the users×items cross
    * product never materializes. */
  def qAls(s: SparkSession, dir: String): DataFrame = {
    val anchors = interactions(s, dir)
      .select(col("user")).distinct()
      .orderBy(col("user").asc).limit(AlsAnchorUsers)
    fit(s, dir).recommendForUserSubset(anchors, AlsTopK)
      .select(col("user"), posexplode(col("recommendations")).as(Seq("pos", "rec")))
      .select(col("user").as("custkey"),
        col("rec.item").as("partkey"),
        (col("pos") + 1).as("rank"),
        round(col("rec.rating").cast("double"), 6).as("score"))
  }

  /** q_als_audit: factorization certificate (the q_bpe_audit /
    * q_kmeans_audit shape). SQL-derivable anchors the oracle recomputes
    * independently: n_users / n_items / n_interactions of the distinct
    * (customer, part) relation, plus the fixed rank. Guarantees asserted
    * Spark-side, oracle emits TRUE:
    *  - `factors_ok`: the model factorizes the FULL relation (one factor
    *    row per distinct user and item — a dropped block breaks it) and
    *    every factor vector has exactly `rank` entries;
    *  - `finite_ok`: no NaN/Inf anywhere in either factor matrix (a
    *    diverged normal-equation solve is loud, not silent);
    *  - `separation_ok`: the model RANKS observed interactions above
    *    unobserved ones — mean ⟨u,i⟩ over the anchor users' observed
    *    pairs exceeds mean ⟨u,i⟩ over their unobserved probes from the
    *    same bounded item block (the implicit-ALS training objective,
    *    verified through plain column algebra on the factor tables — a
    *    different arithmetic path than MLlib's blocked predict);
    *  - `coverage_ok`: every anchor user received exactly
    *    [[AlsTopK]] recommendations. */
  def qAlsAudit(s: SparkSession, dir: String): DataFrame = {
    val inter = interactions(s, dir)
    val m = fit(s, dir)
    val nUsers = inter.select("user").distinct().count()
    val nItems = inter.select("item").distinct().count()
    val nInter = inter.count()

    val uf = m.userFactors.select(col("id").as("user"),
      transform(col("features"), x => x.cast("double")).as("uv"))
    val itf = m.itemFactors.select(col("id").as("item"),
      transform(col("features"), x => x.cast("double")).as("iv"))
    val lenOk = uf.filter(size(col("uv")) =!= AlsRank).count() == 0 &&
      itf.filter(size(col("iv")) =!= AlsRank).count() == 0
    val factorsOk = m.userFactors.count() == nUsers &&
      m.itemFactors.count() == nItems && lenOk
    val bad = (v: org.apache.spark.sql.Column) =>
      exists(v, x => isnan(x) || x === Double.PositiveInfinity ||
        x === Double.NegativeInfinity)
    val finiteOk = uf.filter(bad(col("uv"))).count() == 0 &&
      itf.filter(bad(col("iv"))).count() == 0

    // Bounded probe block: anchor users × the 100 smallest item ids.
    val anchorU = inter.select("user").distinct()
      .orderBy(col("user").asc).limit(AlsAnchorUsers)
    val probeI = inter.select("item").distinct()
      .orderBy(col("item").asc).limit(100)
    val dot = aggregate(zip_with(col("uv"), col("iv"), (a, b) => a * b),
      lit(0.0), (acc, x) => acc + x)
    val scored = anchorU.crossJoin(probeI)
      .join(uf, Seq("user")).join(itf, Seq("item"))
      .join(inter.select(col("user"), col("item"), lit(true).as("obs")),
        Seq("user", "item"), "left")
      .select(coalesce(col("obs"), lit(false)).as("obs"), dot.as("score"))
    val sep = scored.groupBy("obs").agg(avg(col("score")).as("mu"))
      .collect().map(r => r.getAs[Boolean]("obs") -> r.getAs[Double]("mu")).toMap
    val separationOk = sep.getOrElse(true, Double.NegativeInfinity) >
      sep.getOrElse(false, Double.PositiveInfinity)

    val coverageOk = qAls(s, dir).groupBy("custkey").count()
      .filter(col("count") =!= AlsTopK).count() == 0 &&
      qAls(s, dir).select("custkey").distinct().count() ==
        math.min(AlsAnchorUsers.toLong, nUsers)

    import s.implicits._
    Seq((nUsers, nItems, nInter, AlsRank.toLong,
      factorsOk, finiteOk, separationOk, coverageOk))
      .toDF("n_users", "n_items", "n_interactions", "k",
        "factors_ok", "finite_ok", "separation_ok", "coverage_ok")
  }

  private lazy val qAlsAuditSql =
    s"""WITH ui AS (SELECT DISTINCT o_custkey AS u, l_partkey AS i
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey)
       SELECT CAST(count(DISTINCT u) AS BIGINT) AS n_users,
         CAST(count(DISTINCT i) AS BIGINT) AS n_items,
         CAST(count(*) AS BIGINT) AS n_interactions,
         CAST($AlsRank AS BIGINT) AS k,
         TRUE AS factors_ok, TRUE AS finite_ok,
         TRUE AS separation_ok, TRUE AS coverage_ok
       FROM ui"""

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_als" -> (qAls _),
    "q_als_audit" -> (qAlsAudit _))

  override def oracles: Map[String, String] = Map(
    "q_als_audit" -> qAlsAuditSql)
}
