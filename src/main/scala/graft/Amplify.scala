package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic scale amplifier for the scaling-slope certification
  * (SCALING.md): writes a K× copy of an sf directory to a scratch dir by
  * unioning K key-shifted copies of every fact table. No RNG anywhere —
  * copy c of a row is a pure function of the row and c, so two builds of
  * the same (src, K) are byte-identical relations.
  *
  * Shape rules (what "10× the data" should mean for THESE queries):
  *  - region/nation pass through verbatim — genuinely fixed-cardinality
  *    dimensions; amplified facts keep referencing them, so group-by-dim
  *    cardinalities stay constant while fact rows grow ×K (the actual
  *    100 TB shape).
  *  - every synthetic-key column shifts by c·10⁶ per copy, shifting FK
  *    pairs identically (custkey in customer AND orders, …), so join
  *    selectivity per row is IDENTICAL in every copy. 10⁶ exceeds every
  *    base key (max 149,999) and K ≤ 9 keys stay below the bloom-audit
  *    alien range at 10⁷. vec_id/doc_id shifts are ≡ 0 (mod 5), so the
  *    deterministic %5 train/test splits keep their proportions.
  *  - documents: copy c > 0 prefixes every word with a letter-only copy
  *    tag ("xa", "xb", …) and recomputes n_chars. Within-copy token
  *    structure (and so dup groups, n-gram spans, line dedup) is
  *    preserved exactly; across copies vocabularies are DISJOINT —
  *    without this, K verbatim copies of each document would fabricate
  *    K²/2 cross-copy near-dup pairs per group and every pair-emitting
  *    dedup query would go quadratic BY DATA CONSTRUCTION, which is a
  *    property of the synthetic corpus, not of the plans being measured.
  *    (Vocabulary growing ~×K with corpus size is also the realistic
  *    direction — Heaps' law.) Trade: stopword/dictionary matches only
  *    fire in copy 0, so selectivity-dependent stages see a different
  *    mix — documented in SCALING.md.
  *  - embeddings: copy c applies a per-copy rotation of the 64 dims plus
  *    a ±1 sign mask — an ORTHOGONAL transform, so every within-copy
  *    distance, cosine, norm and split is preserved (exactly as reals;
  *    fp dots reassociate at the last ulp under the rotated summation
  *    order) while cross-copy cosines scatter to ~0 (same
  *    quadratic-pair rationale).
  *  - events: ids shift, timestamps pass through — the 30-day calendar
  *    stays fixed and per-day volume grows ×K, which is exactly how an
  *    event stream scales; day-bounded window queries keep constant
  *    output cardinality over ×K input.
  */
object Amplify {

  val KeyShift = 1000000L
  val EmbDim = 64

  def main(args: Array[String]): Unit = {
    val Array(srcDir, outDir, kStr) = args.take(3)
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("WARN")
    run(spark, srcDir, outDir, kStr.toInt)
    spark.stop()
  }

  /** Amplify every table of `srcDir` ×k into `outDir` (see object doc);
    * also the entry point AmplifySpec pins the invariants through. */
  def run(spark: org.apache.spark.sql.SparkSession, srcDir: String,
      outDir: String, k: Int): Unit = {
    require(k >= 1 && k <= 9, s"K must be in 1..9 (alien-range headroom), got $k")

    def rd(t: String) = spark.read.parquet(s"$srcDir/$t.parquet")
    def wr(df: DataFrame, t: String): Unit =
      df.write.mode("overwrite").parquet(s"$outDir/$t.parquet")
    def copies(df: DataFrame)(shift: (DataFrame, Int) => DataFrame): DataFrame =
      (0 until k).map(c => shift(df, c)).reduce(_ unionByName _)
    def shiftKeys(df: DataFrame, c: Int, cols: Seq[String]): DataFrame =
      cols.foldLeft(df)((d, name) =>
        d.withColumn(name, (col(name) + lit(c * KeyShift)).cast("long")))

    wr(rd("region"), "region")
    wr(rd("nation"), "nation")
    wr(copies(rd("customer"))((d, c) => shiftKeys(d, c, Seq("c_custkey"))), "customer")
    wr(copies(rd("supplier"))((d, c) => shiftKeys(d, c, Seq("s_suppkey"))), "supplier")
    wr(copies(rd("part"))((d, c) => shiftKeys(d, c, Seq("p_partkey"))), "part")
    wr(copies(rd("orders"))((d, c) =>
      shiftKeys(d, c, Seq("o_orderkey", "o_custkey"))), "orders")
    wr(copies(rd("lineitem"))((d, c) =>
      shiftKeys(d, c, Seq("l_orderkey", "l_partkey", "l_suppkey"))), "lineitem")
    wr(copies(rd("events"))((d, c) =>
      shiftKeys(d, c, Seq("event_id", "user_id"))), "events")
    wr(copies(rd("documents")) { (d, c) =>
      if (c == 0) d
      else {
        val tag = s"x${('a' + (c - 1)).toChar}"
        shiftKeys(d, c, Seq("doc_id"))
          .withColumn("text",
            regexp_replace(col("text"), "(?U)\\b(\\p{L})", tag + "$1"))
          .withColumn("n_chars", length(col("text")).cast("long"))
      }
    }, "documents")
    wr(copies(rd("embeddings")) { (d, c) =>
      if (c == 0) d
      else shiftKeys(d, c, Seq("vec_id"))
        .withColumn("embedding", transform(sequence(lit(0), lit(EmbDim - 1)),
          i => (element_at(col("embedding"), pmod(i + lit(7 * c), lit(EmbDim)) + 1) *
            when(pmod(i + lit(c), lit(3)) === 0, lit(-1.0f)).otherwise(lit(1.0f)))
            .cast("float")))
    }, "embeddings")

    val counts = Seq("lineitem", "orders", "events", "documents", "embeddings")
      .map(t => s"$t=${spark.read.parquet(s"$outDir/$t.parquet").count()}")
    println(s"amplify: k=$k src=$srcDir out=$outDir ${counts.mkString(" ")}")
  }
}
