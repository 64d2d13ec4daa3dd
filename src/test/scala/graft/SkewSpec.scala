package graft

import graft.functions.Skew
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("salted join is row-identical to the plain join under heavy skew") {
    // 10k rows on one hot key + a long tail
    val big = ((1 to 10000).map(i => (1L, i)) ++ (1 to 100).map(i => (i.toLong + 1, i)))
      .toDF("k", "payload")
    val small = (1 to 50).map(i => (i.toLong, s"dim$i")).toDF("k", "name")
    val plain = big.join(small, Seq("k"))
      .select("k", "payload", "name").as[(Long, Int, String)].collect().sorted
    val salted = Skew.saltedJoin(big, small, "k", 8)
      .select("k", "payload", "name").as[(Long, Int, String)].collect().sorted
    assert(salted.length === plain.length)
    assert(salted === plain)
    // and the salt really spreads the hot key over multiple sub-keys
    val spread = big.withColumn("s", pmod(xxhash64(struct(col("k"), col("payload"))), lit(8)))
      .filter(col("k") === 1).select("s").distinct().count()
    assert(spread > 1)
  }
}
