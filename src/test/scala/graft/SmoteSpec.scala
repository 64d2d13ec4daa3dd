package graft

import graft.operators.Classification
import org.apache.spark.ml.functions.vector_to_array
import org.apache.spark.sql.functions._

/** Distributed SMOTE: the augmented set balances classes EXACTLY, every
  * synthetic vector lies on the segment between two real minority vectors
  * (coordinate-wise between the endpoints), and the construction is
  * deterministic run to run (content-hash u, hash-ranked partial replica). */
class SmoteSpec extends SparkSpec {

  test("augmented training set balances classes exactly") {
    val (aug, minY) = Classification.smoteAugmented(spark, sfDir)
    val counts = aug.groupBy("y").count().collect()
      .map(r => r.getDouble(0) -> r.getLong(1)).toMap
    assert(counts.size === 2)
    assert(counts(minY) === counts((counts.keySet - minY).head),
      s"not balanced: $counts")
  }

  test("synthetic rows interpolate between real minority vectors") {
    val (aug, minY) = Classification.smoteAugmented(spark, sfDir)
    val (train, _) = Classification.dataset(spark, sfDir)
    val realMin = train.filter(col("y") === minY)
      .select(vector_to_array(col("features")).as("fv")).collect()
      .map(_.getSeq[Double](0))
    val synth = aug.filter(col("vec_id") === -1L)
      .select(vector_to_array(col("features")).as("fv")).collect()
      .map(_.getSeq[Double](0))
    assert(synth.nonEmpty)
    val eps = 1e-9
    synth.foreach { sv =>
      // some (a, b) real pair must bracket the synthetic vector with ONE
      // interpolation factor u shared by every coordinate
      val ok = realMin.exists { a =>
        realMin.exists { b =>
          val us = sv.indices.flatMap { i =>
            val d = b(i) - a(i)
            if (math.abs(d) < eps) { if (math.abs(sv(i) - a(i)) < 1e-6) None else Some(-1.0) }
            else Some((sv(i) - a(i)) / d)
          }
          us.forall(u => u >= -eps && u < 1.0 + eps) &&
            (us.isEmpty || us.forall(u => math.abs(u - us.head) < 1e-6))
        }
      }
      assert(ok, s"synthetic vector not on any minority segment: ${sv.take(4)}...")
    }
  }

  test("construction is deterministic across runs") {
    val a = Classification.smoteAugmented(spark, sfDir)._1
      .select(col("y"), vector_to_array(col("features")).as("fv")).collect()
      .map(r => (r.getDouble(0), r.getSeq[Double](1))).sortBy(_.toString)
    val b = Classification.smoteAugmented(spark, sfDir)._1
      .select(col("y"), vector_to_array(col("features")).as("fv")).collect()
      .map(r => (r.getDouble(0), r.getSeq[Double](1))).sortBy(_.toString)
    assert(a.toSeq === b.toSeq)
  }

  test("q_classify_smote emits one metrics row") {
    val row = Classification.qClassifySmote(spark, sfDir).collect()
    assert(row.length === 1)
    assert(row.head.getAs[String]("model") === "lr_smote")
  }
}
