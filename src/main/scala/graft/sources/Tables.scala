package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver's parquet tables (see /root/repo/TESTDATA.md).
  *
  * At 100 TB these would be partitioned/bucketed catalog tables; the loader
  * keeps the access path in one place so scan options (pushdown, schema
  * pruning) are centralized. All queries select only the columns they need so
  * parquet column pruning applies.
  */
object Tables {
  val All: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Catalog contract: the columns every operator in this library assumes.
    * `validate` checks a data dir against it up front — at 100 TB you want
    * a schema drift to fail the job at submit time, not 3 hours into a
    * scan with a cryptic resolution error. */
  val ExpectedColumns: Map[String, Seq[String]] = Map(
    "region" -> Seq("r_regionkey", "r_name"),
    "nation" -> Seq("n_nationkey", "n_name", "n_regionkey"),
    "customer" -> Seq("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"),
    "supplier" -> Seq("s_suppkey", "s_name", "s_nationkey", "s_acctbal"),
    "part" -> Seq("p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice"),
    "orders" -> Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
      "o_orderdate", "o_orderpriority"),
    "lineitem" -> Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
      "l_quantity", "l_extendedprice", "l_discount", "l_tax",
      "l_returnflag", "l_linestatus", "l_shipdate"),
    "events" -> Seq("event_id", "ts", "user_id", "event_type", "value", "props"),
    "documents" -> Seq("doc_id", "text", "lang", "source", "n_chars"),
    "embeddings" -> Seq("vec_id", "embedding", "label"))

  /** Returns one "table: missing [...]" line per violated contract; empty
    * means the dir satisfies the catalog (extra columns are allowed). */
  def validate(spark: SparkSession, dir: String): Seq[String] =
    All.flatMap { t =>
      val have = load(spark, dir, t).schema.fieldNames.toSet
      val missing = ExpectedColumns(t).filterNot(have)
      if (missing.isEmpty) None else Some(s"$t: missing ${missing.mkString(", ")}")
    }

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  /** events.parquet has carried two timestamp encodings across driver
    * generations: TIMESTAMP(NANOS) (readable only via
    * spark.sql.legacy.parquet.nanosAsLong=true, set in Verify/Bench/tests)
    * and TIMESTAMP(MICROS, isAdjustedToUTC=false), which Spark 4 reads as
    * TIMESTAMP_NTZ. Normalize BOTH to a session-TZ timestamp column: the
    * session is pinned to UTC (GraftSession), so the NTZ→LTZ cast
    * reinterprets the same wall-clock value as the same instant DuckDB's
    * naive timestamps compare as — and unix_micros()/window() downstream
    * require the LTZ type. */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = load(s, d, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        // integer `div` — a double division would lose precision on ns epochs
        raw.withColumn("ts", org.apache.spark.sql.functions.expr(
          "timestamp_micros(ts div 1000)"))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts",
          org.apache.spark.sql.functions.col("ts").cast(
            org.apache.spark.sql.types.TimestampType))
      case _ => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
