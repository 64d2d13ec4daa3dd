package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

object RankProbe {
  def fastGrn(df: DataFrame, sortCols: Column*): DataFrame = {
    val spark = df.sparkSession
    val n = spark.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val sorted = df.repartitionByRange(n, sortCols: _*).sortWithinPartitions(sortCols: _*)
    val internal = sorted.queryExecution.toRdd
    val counts = internal.mapPartitions(it => Iterator(it.size.toLong), preservesPartitioning = true).collect()
    val offsets = counts.scanLeft(0L)(_ + _)
    val schema = sorted.schema.add("rn", LongType, nullable = false)
    val rdd = internal.mapPartitionsWithIndex { (pid, it) =>
      var i = offsets(pid)
      val joined = new org.apache.spark.sql.catalyst.expressions.JoinedRow
      val extra = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(1)
      // .copy(): the JoinedRow/GenericInternalRow pair is REUSED across
      // the partition's rows — without the copy any buffering consumer
      // (sort, aggregate, window) would observe every row mutated to the
      // partition's last values; only streaming sinks were safe (r21
      // ADVICE — mandatory before this pattern migrates into
      // graft.functions.Ranks)
      it.map { r =>
        i += 1; extra.update(0, i)
        joined(r, extra).copy(): org.apache.spark.sql.catalyst.InternalRow
      }
    }
    org.apache.spark.sql.graft.ColumnBridge.internalCreateDataFrame(spark, rdd, schema)
  }

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("local[32]").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    def t(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"$name%-34s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
    }
    val joined = operators.TextAnalysis.qQuality(spark, dir).select(col("doc_id"), col("quality"))
      .join(operators.Stats.qReadability(spark, dir).select(col("doc_id"), col("flesch")), Seq("doc_id"))
      .localCheckpoint(true)
    for (r <- 1 to 3) {
      t(s"grn_current r$r")(graft.functions.Ranks.globalRowNumber(
        joined.select(col("doc_id"), col("quality")), col("quality"), col("doc_id"))
        .write.format("noop").mode("overwrite").save())
      t(s"grn_fast r$r")(fastGrn(
        joined.select(col("doc_id"), col("quality")), col("quality"), col("doc_id"))
        .write.format("noop").mode("overwrite").save())
      // correctness cross-check
      if (r == 1) {
        val a = graft.functions.Ranks.globalRowNumber(joined.select(col("doc_id"), col("quality")), col("quality"), col("doc_id")).collect().map(_.toString).sorted
        val b = fastGrn(joined.select(col("doc_id"), col("quality")), col("quality"), col("doc_id")).collect().map(_.toString).sorted
        println("IDENTICAL=" + a.sameElements(b))
      }
    }
    spark.stop()
  }
}
