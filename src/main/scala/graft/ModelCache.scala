package graft

import scala.collection.concurrent.TrieMap

/** Session-lifetime memoization for fitted models and featurized corpora.
  *
  * The driver contract runs every query independently (Verify/Bench loop
  * over SparkEntry.queries in one JVM); without this, each of the six
  * topic-model queries would re-fit the same seeded LDA. Keys include the
  * data dir so different scale factors never collide. Seeds are fixed, so
  * a cached fit is bit-identical to a refit.
  */
object ModelCache {
  private val cache = TrieMap.empty[String, Any]

  def getOrElseUpdate[T](key: String)(f: => T): T =
    cache.getOrElseUpdate(key, f).asInstanceOf[T]

  /** Prefix a cache key with the OWNING SparkSession's identity: cached
    * DataFrames/models are bound to the session that built them, so a new
    * session in the same JVM must never see a dead session's plan. Entries
    * for stopped sessions are orphaned (bounded: a handful of plans per
    * session), not served. */
  def scoped(s: org.apache.spark.sql.SparkSession, key: String): String =
    s"${System.identityHashCode(s)}#$key"

  def clear(): Unit = cache.clear()
}
