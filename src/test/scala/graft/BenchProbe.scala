package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

/** Dev probe (test scope): A/B timing harness for optimization work.
  *
  * Usage: Test/runMain graft.BenchProbe <sfDir> <reps> [k=v ...] -- q1 q2 ...
  * Conf pairs before `--` are applied to the session builder; query names
  * after `--` run in the given order, `reps` interleaved rounds, min-of-reps
  * reported per query plus a stage-time rollup (task time vs wall) so
  * single-threaded stages stand out. Never run by the driver — local
  * iteration only.
  */
object BenchProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = args(1).toInt
    val sep = args.indexOf("--")
    val confs = args.slice(2, sep).map { kv =>
      val i = kv.indexOf('='); (kv.take(i), kv.drop(i + 1))
    }
    val names = args.drop(sep + 1).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    var b = GraftSession.builder(s"local[$cpus]")
    confs.foreach { case (k, v) => b = b.config(k, v) }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // task-time accounting: total task ms per job group label
    val taskMs = scala.collection.concurrent.TrieMap.empty[String, Long]
    @volatile var current = "warmup"
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val t = sc.stageInfo.taskMetrics
        if (t != null)
          taskMs.updateWith(current)(o => Some(o.getOrElse(0L) + t.executorRunTime))
      }
    })
    val qs = SparkEntry.queries
    val times = scala.collection.mutable.Map.empty[String, List[Double]]
    for (r <- 0 until reps; name <- names) {
      current = name
      val t0 = System.nanoTime()
      qs(name)(spark, sfDir).write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      times(name) = dt :: times.getOrElse(name, Nil)
    }
    var tot = 0.0
    names.foreach { n =>
      val ts = times(n).reverse
      val mn = ts.min
      tot += mn
      println(f"$n%-32s min=$mn%7.3f reps=${ts.map(t => f"$t%.3f").mkString(",")} taskSec=${taskMs.getOrElse(n, 0L) / 1e3}%8.2f")
    }
    println(f"TOTAL(min-of-reps) = $tot%.3f s over ${names.size} queries")
    spark.stop()
  }
}
