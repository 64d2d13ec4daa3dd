package graft

import graft.operators.{Relational, Tpch}
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Structural invariants of the adapted TPC-H family beyond the DuckDB
  * hash gate: set relationships between queries (Q4 ⊆ all priorities,
  * Q12 high+low = joined row count), threshold semantics spot-checked
  * against a direct recomputation (Q17, Q20, Q22), and argmax uniqueness
  * (Q2, one row per part). */
class TpchSpec extends SparkSpec {

  test("q4: only known priorities, counts bounded by the quarter's orders") {
    val rows = Tpch.q4Priority(spark, sfDir).collect()
    val prios = Set("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
    assert(rows.nonEmpty)
    rows.foreach(r => assert(prios.contains(r.getString(0))))
    val quarter = Tables.orders(spark, sfDir)
      .filter(col("o_orderdate") >= to_timestamp(lit("1997-01-01")) &&
        col("o_orderdate") < to_timestamp(lit("1997-04-01"))).count()
    assert(rows.map(_.getLong(1)).sum <= quarter)
  }

  test("q7: only the two nations appear, never as a self-pair") {
    val rows = Tpch.q7Volume(spark, sfDir).collect()
    rows.foreach { r =>
      val (sn, cn) = (r.getString(0), r.getString(1))
      assert(Set("NATION_1", "NATION_2")(sn) && Set("NATION_1", "NATION_2")(cn) && sn != cn)
      assert(r.getDouble(3) > 0)
    }
  }

  test("q8: market share is a proper fraction") {
    Tpch.q8Share(spark, sfDir).collect().foreach { r =>
      val share = r.getDouble(1)
      assert(share >= 0.0 && share <= 1.0)
    }
  }

  test("q12: high+low line counts equal the joined row count") {
    val rows = Tpch.q12Priority(spark, sfDir).collect()
    val total = Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") >= to_timestamp(lit("1997-01-01")) &&
        col("l_shipdate") < to_timestamp(lit("1998-01-01")))
      .join(Tables.orders(spark, sfDir), col("l_orderkey") === col("o_orderkey"))
      .count()
    assert(rows.map(r => r.getLong(1) + r.getLong(2)).sum === total)
  }

  test("q14: promo share is a percentage in [0, 100]") {
    val v = Tpch.q14Promo(spark, sfDir).head().getDouble(0)
    assert(v >= 0.0 && v <= 100.0)
  }

  test("q16: no excluded brand/type, and counts are positive") {
    val rows = Tpch.q16SuppCount(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getString(0) != "Brand#1" && r.getString(1) != "PROMO")
      assert(r.getLong(3) > 0)
    }
  }

  test("q17: the small-quantity threshold really is a fifth of the part average") {
    // recompute one qualifying row's predicate directly
    val li = Tables.lineitem(spark, sfDir)
    val perPart = li.groupBy("l_partkey").agg(avg("l_quantity").as("avg_qty"))
    val brand = Tables.part(spark, sfDir).filter(col("p_brand") === "Brand#5")
    val qualifying = li.join(brand, col("l_partkey") === col("p_partkey"))
      .join(perPart.withColumnRenamed("l_partkey", "pk"), col("l_partkey") === col("pk"))
      .filter(col("l_quantity") < col("avg_qty") * 0.2)
    val expected = math.floor(qualifying.agg(sum("l_extendedprice")).head().getDouble(0)) / 7.0
    val got = Tpch.q17SmallQty(spark, sfDir).head().getDouble(0)
    // same predicate up to fp-vs-decimal averaging; totals must agree closely
    assert(math.abs(got - expected) < math.max(1.0, expected * 1e-6) + 1.0)
  }

  test("q20: every dominant supplier shipped >2x its fair share of some red part") {
    val dominant = Tpch.q20Excess(spark, sfDir).collect().map(_.getLong(0)).toSet
    val red = Tables.part(spark, sfDir).filter(col("p_name").like("red%")).select("p_partkey")
    val shipped = Tables.lineitem(spark, sfDir)
      .join(red, col("l_partkey") === col("p_partkey"))
      .groupBy("l_partkey", "l_suppkey").agg(sum("l_quantity").as("sq"))
    val totals = shipped.groupBy(col("l_partkey").as("tk"))
      .agg(sum("sq").as("tq"), count(lit(1)).as("ns"))
    val recomputed = shipped.join(totals, col("l_partkey") === col("tk"))
      .filter(col("sq") * col("ns") > col("tq") * 2)
      .select("l_suppkey").distinct().collect().map(_.getLong(0)).toSet
    assert(dominant === recomputed)
    assert(dominant.nonEmpty, "vacuous gate: the fair-share predicate must bite")
  }

  test("q21: blamed suppliers exist only if multi-supplier orders exist") {
    val rows = Tpch.q21Blame(spark, sfDir).collect()
    rows.foreach(r => assert(r.getLong(2) > 0))
    // every lineitem order has >= 1 supplier; numwait can't exceed order count
    val orders = Tables.lineitem(spark, sfDir).select("l_orderkey").distinct().count()
    rows.foreach(r => assert(r.getLong(2) <= orders))
  }

  test("q22: idle customers have above-average balance and no urgent orders") {
    val rows = Tpch.q22Idle(spark, sfDir).collect()
    val cust = Tables.customer(spark, sfDir)
    val avgPos = cust.filter(col("c_acctbal") > 0).agg(avg("c_acctbal")).head().getDouble(0)
    // recompute the anti-join count over the same threshold
    val expected = cust.filter(col("c_acctbal") > avgPos)
      .join(Tables.orders(spark, sfDir)
          .filter(col("o_orderpriority") === "1-URGENT").select("o_custkey"),
        col("c_custkey") === col("o_custkey"), "left_anti").count()
    assert(rows.map(_.getLong(1)).sum === expected)
    assert(expected > 0, "vacuous gate: idle-rich customers must exist in the corpus")
  }

  test("q2: exactly one best supplier per part, balances are the max") {
    val rows = Tpch.q2TopSupp(spark, sfDir).collect()
    val parts = rows.map(_.getLong(0))
    assert(parts.distinct.length === parts.length)
    assert(parts.sorted.sameElements(parts)) // ordered by partkey
  }

  test("plan audit: q19 prunes scans to the referenced columns only") {
    val plan = Tpch.q19Disjunct(spark, sfDir).queryExecution.executedPlan.toString
    // lineitem scan reads exactly the 4 columns the query touches
    assert(plan.contains("struct<l_partkey:bigint,l_quantity:double," +
      "l_extendedprice:double,l_discount:double>"), plan)
    // part scan reads exactly brand/size/key
    assert(plan.contains("struct<p_partkey:bigint,p_brand:string,p_size:int>"), plan)
  }

  test("plan audit: no forced broadcast of fact-proportional relations") {
    // q10 joins customer (fact-proportional): the only broadcast HINTS in
    // the logical plan must be on nation/region-derived inputs
    val analyzed = Tpch.q10Returns(spark, sfDir).queryExecution.analyzed.toString
    val hintLines = analyzed.linesIterator.filter(_.contains("UnresolvedHint")).toSeq
    assert(hintLines.isEmpty || !analyzed.contains("broadcast(customer)"))
    val optimized = Tpch.q10Returns(spark, sfDir).queryExecution.optimizedPlan.toString
    val hinted = optimized.linesIterator.filter(_.contains("hints=[broadcast]")).mkString("\n")
    assert(!hinted.contains("c_custkey"), hinted) // customer never hint-broadcast
  }

  test("q10/q19 smoke: deterministic and non-negative revenue") {
    Tpch.q10Returns(spark, sfDir).collect().foreach(r => assert(r.getDouble(4) > 0))
    val r19 = Tpch.q19Disjunct(spark, sfDir).head()
    assert(!r19.isNullAt(1) && r19.getLong(1) >= 0)
  }
}
