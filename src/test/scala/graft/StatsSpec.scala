package graft

import graft.operators.Stats
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Invariants of the Stats module beyond the DuckDB hash gate: algebraic
  * identities (probability rows sum to 1, PSI ≥ 0, Pearson bounds), a
  * cross-check of the exact-moment corr/OLS against Spark's builtin
  * aggregates, and partition-invariance of the decimal-exact moments. */
class StatsSpec extends SparkSpec {

  test("histogram partitions the orders table exactly") {
    val h = Stats.qHistogram(spark, sfDir).cache()
    val total = Tables.orders(spark, sfDir).count()
    assert(h.agg(sum("n")).head().getLong(0) === total)
    assert(h.filter(col("bucket") < 0 || col("bucket") > 9).count() === 0)
    // min/max stay inside their bucket's value range
    assert(h.filter(col("min_price") < col("bucket") * 50000.0 ||
      col("max_price") >= (col("bucket") + 1) * 50000.0).count() === 0)
  }

  test("exact-moment Pearson matches Spark's builtin corr") {
    val got = Stats.qCorrMatrix(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    val li = Tables.lineitem(spark, sfDir)
    val builtin = li.agg(
      corr(col("l_quantity"), col("l_extendedprice")),
      corr(col("l_quantity"), col("l_discount")),
      corr(col("l_extendedprice"), col("l_discount"))).head()
    assert(math.abs(got(("l_quantity", "l_extendedprice")) - builtin.getDouble(0)) < 1.1e-6)
    assert(math.abs(got(("l_quantity", "l_discount")) - builtin.getDouble(1)) < 1.1e-6)
    assert(math.abs(got(("l_extendedprice", "l_discount")) - builtin.getDouble(2)) < 1.1e-6)
    got.values.foreach(v => assert(v >= -1.0 && v <= 1.0))
  }

  test("closed-form OLS matches covar_pop/var_pop per group") {
    val got = Stats.qRegr(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getDouble(2), r.getDouble(3))).toMap
    Tables.lineitem(spark, sfDir).groupBy("l_returnflag")
      .agg((covar_pop(col("l_quantity"), col("l_extendedprice")) /
          var_pop(col("l_quantity"))).as("slope"),
        avg("l_extendedprice").as("my"), avg("l_quantity").as("mx"))
      .collect().foreach { r =>
        val (slope, intercept) = got(r.getString(0))
        assert(math.abs(slope - r.getDouble(1)) < 1e-6)
        assert(math.abs(intercept - (r.getDouble(2) - r.getDouble(1) * r.getDouble(3))) < 1e-6)
      }
  }

  test("corr is bit-identical across runs (decimal-exact moments)") {
    // double-sum moments would wobble in the last ulp between runs as
    // partial-aggregate order shifts; decimal-exact moments cannot
    val a = Stats.qCorrMatrix(spark, sfDir).collect().map(_.getDouble(2)).toSeq
    val b = Stats.qCorrMatrix(spark, sfDir).collect().map(_.getDouble(2)).toSeq
    assert(a === b)
  }

  test("PSI is non-negative and near zero for a random split") {
    val psi = Stats.qPsi(spark, sfDir).cache()
    assert(psi.filter(col("psi") < 0).count() === 0)
    // even/odd event ids is a uniform split of the same distribution: at
    // sf0.001 the per-type halves are ~100 events, so smoothing noise can
    // reach a few tenths — but nowhere near a real-drift blowout
    assert(psi.filter(col("psi") > 1.0).count() === 0)
  }

  test("markov transition rows are a probability distribution per source") {
    val m = Stats.qMarkov(spark, sfDir).cache()
    m.groupBy("from_type").agg(sum("p").as("s")).collect()
      .foreach(r => assert(math.abs(r.getDouble(1) - 1.0) < 1e-9))
    val e = Tables.events(spark, sfDir)
    val expected = e.count() - e.select("user_id").distinct().count()
    assert(m.agg(sum("n")).head().getLong(0) === expected)
  }

  test("attribution covers every user exactly once, cvr within [0,1]") {
    val a = Stats.qAttribution(spark, sfDir).cache()
    val users = Tables.events(spark, sfDir).select("user_id").distinct().count()
    assert(a.agg(sum("n_users")).head().getLong(0) === users)
    assert(a.filter(col("cvr") < 0 || col("cvr") > 1).count() === 0)
    assert(a.filter(col("n_converted") > col("n_users")).count() === 0)
  }

  test("readability counts are positive and the score is finite") {
    val r = Stats.qReadability(spark, sfDir).cache()
    assert(r.filter(col("words") < 1 || col("sentences") < 1).count() === 0)
    assert(r.filter(isnan(col("flesch")) || col("flesch").isNull).count() === 0)
  }

  test("zipf slope is negative (frequency falls with rank)") {
    val z = Stats.qZipf(spark, sfDir).head()
    assert(z.getLong(0) > 10)    // real (tiny-sf) vocabulary
    assert(z.getDouble(1) < 0.0) // Zipf exponent
  }
}
