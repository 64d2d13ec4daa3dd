package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

/** Dev probe (test scope): per-STAGE task-time breakdown for one query.
  *
  * Usage: Test/runMain graft.StageProbe <sfDir> <reps> [k=v ...] -- q
  * Runs the query `reps` times; after a warm-up rep, prints every stage of
  * the LAST rep with task count, executor run time, and the first call-site
  * line — so the expensive stage can be mapped back to the operator. Never
  * run by the driver — local iteration only.
  */
object StageProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = args(1).toInt
    val sep = args.indexOf("--")
    val confs = args.slice(2, sep).map { kv =>
      val i = kv.indexOf('='); (kv.take(i), kv.drop(i + 1))
    }
    val name = args(sep + 1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    var b = GraftSession.builder(s"local[$cpus]")
    confs.foreach { case (k, v) => b = b.config(k, v) }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    case class St(id: Int, tasks: Int, ms: Long, name: String)
    val stages = scala.collection.mutable.ArrayBuffer.empty[St]
    @volatile var record = false
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
        if (record) {
          val si = sc.stageInfo
          val t = si.taskMetrics
          val frame = si.details.linesIterator
            .find(l => l.contains("graft.") && !l.contains("StageProbe"))
            .getOrElse("").trim.take(110)
          stages.synchronized {
            stages += St(si.stageId, si.numTasks,
              if (t == null) 0L else t.executorRunTime,
              si.name.linesIterator.next().take(60) + " | " + frame)
          }
        }
    })
    // SQL-execution-level accounting: one line per exec with duration —
    // the job-count/driver-latency view the stage table can't show
    case class Ex(id: Long, desc: String, var start: Long, var end: Long)
    val execs = scala.collection.mutable.LinkedHashMap.empty[Long, Ex]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onOtherEvent(event: org.apache.spark.scheduler.SparkListenerEvent): Unit =
        event match {
          case s: org.apache.spark.sql.execution.ui.SparkListenerSQLExecutionStart =>
            execs.synchronized {
              execs(s.executionId) = Ex(s.executionId,
                s.description.linesIterator.next().take(70), s.time, 0L)
            }
          case e: org.apache.spark.sql.execution.ui.SparkListenerSQLExecutionEnd =>
            execs.synchronized { execs.get(e.executionId).foreach(_.end = e.time) }
          case _ => ()
        }
    })
    val qs = SparkEntry.queries
    for (r <- 0 until reps) {
      if (r == reps - 1) { record = true }
      val t0 = System.nanoTime()
      qs(name)(spark, sfDir).write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"rep $r wall=$dt%.3f s")
      // let straggler listener events drain
      if (r == reps - 1) Thread.sleep(500)
    }
    println(f"== stages of last rep (${stages.size}) ==")
    stages.sortBy(-_.ms).foreach { s =>
      println(f"stage=${s.id}%5d tasks=${s.tasks}%4d taskMs=${s.ms}%8d  ${s.name}")
    }
    println(f"total taskSec last rep = ${stages.map(_.ms).sum / 1e3}%.2f over ${stages.size} stages")
    println("== sql executions (all reps) ==")
    execs.values.foreach { e =>
      println(f"exec=${e.id}%4d ms=${if (e.end > 0) e.end - e.start else -1}%6d  ${e.desc}")
    }
    // with spark.ui.enabled=true, keep the app alive so the REST API
    // (/api/v1/applications/<id>/sql?details=true) can be scraped for
    // per-operator metrics — the only reliable stage→operator mapping
    // under AQE
    sys.env.get("SPARK_GRAFT_PROBE_SLEEP").foreach { sec =>
      println(s"probe sleeping ${sec}s; ui at " +
        spark.sparkContext.uiWebUrl.getOrElse("<none>"))
      Thread.sleep(sec.toLong * 1000)
    }
    spark.stop()
  }
}
