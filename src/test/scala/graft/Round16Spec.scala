package graft

import graft.operators.{Relational, ScaleOps}

/** Round-16 pins — the r15-verdict adjudication + ADVICE seams:
  *  - q_oracle_canary's row is a hand-verifiable constant: every
  *    cross-engine idiom the oracle suite relies on (md5 text, the
  *    hex-substring→integer derivation, raw DECIMAL widening, the
  *    ordered double fold) pinned to literal values so a Spark-side
  *    regression is caught here and a DuckDB-side one at the gate.
  *  - hitsOf's long-namespaced key domain (non-negative) must fail
  *    LOUDLY on a negative id instead of silently misclassifying the
  *    hub/auth side (r16 ADVICE).
  *  - q_join_size_sketch's gate-normalized output surface is all
  *    BIGINT/BOOLEAN — no decimal remains for an engine-version seam
  *    to bite (the r15 red-gate adjudication, see ADJUDICATIONS.md).
  */
class Round16Spec extends SparkSpec {

  test("q_oracle_canary: every cross-engine idiom pinned to " +
    "hand-verified constants") {
    val r = ScaleOps.qOracleCanary(spark, "unused").collect()(0)
    // $ echo -n "graft-canary-0" | md5sum
    assert(r.getAs[String]("md5_full") == "313004f7eea38745fae330e8081e401b")
    assert(r.getAs[Long]("hex_cast") == 825230583L)   // 0x313004f7
    assert(r.getAs[Long]("hex_mod") == 247L)          // 825230583 % 256
    assert(r.getAs[Long]("conv_fixed") == 16711935L)  // 0x00ff00ff
    // Σ i² for i=1..24 = 24·25·49/6, kept RAW decimal on the surface
    assert(r.getAs[java.math.BigDecimal]("dec_prod").longValueExact == 4900L)
    assert(r.getAs[Boolean]("dec_ok"))
    // H(24) = Σ 1/i folded in ascending-i order, round 6
    assert(r.getAs[Double]("fold_sum") == 3.775958)
  }

  test("hitsOf fails loudly on a negative id instead of misclassifying " +
    "the node side") {
    import spark.implicits._
    val edges = Seq((-1L, 2L), (3L, 4L)).toDF("hub", "auth")
    val e = intercept[Exception] {
      Relational.hitsOf(edges).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: messages(x.getCause))
    assert(messages(e).exists(m => m != null && m.contains("negative hub id")),
      s"expected the raise_error message, got: ${e.getMessage}")
  }

  test("q_join_size_sketch emits only BIGINT/BOOLEAN on the gated " +
    "surface (no decimal for a version seam to bite)") {
    val df = ScaleOps.qJoinSizeSketch(spark, "/root/testdata/sf0.001")
    val types = df.schema.fields.map(f => f.name -> f.dataType.typeName).toMap
    for (c <- Seq("n_keys", "n_rows", "exact_size", "est_size", "slack"))
      assert(types(c) == "long", s"$c is ${types(c)}, expected long")
    for (c <- Seq("overestimates", "within_bound"))
      assert(types(c) == "boolean", s"$c is ${types(c)}")
    val r = df.collect()(0)
    assert(r.getAs[Boolean]("overestimates") && r.getAs[Boolean]("within_bound"))
    assert(r.getAs[Long]("est_size") >= r.getAs[Long]("exact_size"))
  }
}
