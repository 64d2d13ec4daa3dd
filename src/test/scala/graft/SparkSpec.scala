package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all suites (Test / fork := true → one JVM). */
object TestSession {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.warehouse.dir", "/tmp/graft-test-warehouse")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
  val sfDir = "/root/testdata/sf0.001"
}

abstract class SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSession.spark
  val sfDir: String = TestSession.sfDir
}

/** The classifier zoo's test-split size (vec_id % 5 == 0 over the
  * non-excluded concepts) — specs pin full-coverage against this instead
  * of a hardcoded count. */
object TestSplit {
  def size(spark: SparkSession, sfDir: String): Long = {
    import org.apache.spark.sql.functions._
    graft.sources.Tables.embeddings(spark, sfDir)
      .filter(!col("label").isin(graft.operators.Classification.ExcludedLabels: _*) &&
        col("vec_id") % 5 === 0)
      .count()
  }
}
