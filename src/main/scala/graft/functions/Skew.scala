package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Key-salting for skew-heavy joins — the manual fallback when AQE's
  * runtime skew-split isn't available (e.g. a deterministic physical plan
  * is required, or the skew is in a broadcast-ineligible dimension).
  *
  * `saltedJoin(big, small, key, n)` spreads each hot key of the big side
  * over n sub-partitions (a deterministic per-row salt) and replicates the
  * small side n times, turning one straggler task into n even ones. The
  * result is row-identical to the plain join (SkewSpec proves equivalence);
  * cost is n× the small side's shuffle volume — bounded by construction
  * since the small side is a dim.
  */
object Skew {

  def saltedJoin(big: DataFrame, small: DataFrame, key: String, nSalts: Int): DataFrame = {
    // per-row deterministic salt from the full row content: identical rows
    // share a salt (harmless — salting only needs to spread, not to be
    // unique) and reruns are reproducible
    val salted = big.withColumn("__salt",
      pmod(xxhash64(struct(big.columns.map(col): _*)), lit(nSalts)))
    val replicated = small.withColumn("__salt",
      explode(array((0 until nSalts).map(i => lit(i.toLong)): _*)))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
