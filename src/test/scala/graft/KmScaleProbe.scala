package graft

/** r13 scaling probe for the Lloyd family (not in the Bench headline —
  * iterative training): min-of-2 wall times for q_kmeans + q_silhouette
  * against an Amplify scratch dir. Run: Test/runMain graft.KmScaleProbe <dir> */
object KmScaleProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val s = GraftSession.local()
    s.sparkContext.setLogLevel("WARN")
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    // ONE rep per JVM: kmeansRun memoizes per dir, so an in-process second
    // rep would time the cache, not the operator — callers run the probe
    // twice and take the min across invocations
    val ts = (1 to 1).map { _ =>
      val tk = time {
        graft.operators.SimilaritySearch.qKmeans(s, dir)
          .write.format("noop").mode("overwrite").save()
      }
      val tsil = time {
        graft.operators.SimilaritySearch.qSilhouette(s, dir)
          .write.format("noop").mode("overwrite").save()
      }
      val tu = time {
        graft.operators.Unigram.qUnigram(s, dir)
          .write.format("noop").mode("overwrite").save()
      }
      (tk, tsil, tu)
    }
    println(s"""KMSCALE {"dir":"$dir","q_kmeans":${ts.map(_._1).min},"q_silhouette":${ts.map(_._2).min},"q_unigram":${ts.map(_._3).min}}""")
    s.stop()
  }
}
