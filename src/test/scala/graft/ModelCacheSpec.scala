package graft

/** Session scoping of the model/corpus cache: a value cached under one
  * SparkSession must never be served to a different session in the same
  * JVM, and eviction drops exactly the owner's entries. */
class ModelCacheSpec extends SparkSpec {

  test("cache entries are scoped per session: a new session gets a fresh fit") {
    var fits = 0
    def fit(): Int = { fits += 1; fits }
    val s1 = spark
    val s2 = spark.newSession() // same context, distinct session token
    assert(ModelCache.sessionToken(s1) !== ModelCache.sessionToken(s2))
    val a = ModelCache.getOrElseUpdate(s1, "spec.fit")(fit())
    val b = ModelCache.getOrElseUpdate(s1, "spec.fit")(fit()) // memoized
    assert(a === 1 && b === 1)
    val c = ModelCache.getOrElseUpdate(s2, "spec.fit")(fit()) // NOT s1's entry
    assert(c === 2)
    ModelCache.evict(ModelCache.sessionToken(s1))
    ModelCache.evict(ModelCache.sessionToken(s2))
  }

  test("evict unpersists cached DataFrames, including inside tuples") {
    import org.apache.spark.storage.StorageLevel
    val df1 = spark.range(10).toDF("n").persist(StorageLevel.MEMORY_AND_DISK)
    val df2 = spark.range(5).toDF("m").persist(StorageLevel.MEMORY_AND_DISK)
    ModelCache.getOrElseUpdate(spark, "spec.unpersist.df")(df1)
    ModelCache.getOrElseUpdate(spark, "spec.unpersist.tup")((df2, "model"))
    df1.count(); df2.count()
    assert(df1.storageLevel !== StorageLevel.NONE)
    ModelCache.evict(ModelCache.sessionToken(spark))
    assert(df1.storageLevel === StorageLevel.NONE)
    assert(df2.storageLevel === StorageLevel.NONE)
  }

  test("evict drops only the named session's entries") {
    val s1 = spark
    val s2 = spark.newSession()
    ModelCache.getOrElseUpdate(s1, "spec.evict")(1)
    ModelCache.getOrElseUpdate(s2, "spec.evict")(2)
    ModelCache.evict(ModelCache.sessionToken(s1))
    // s1's entry is gone (recomputes); s2's survives (memoized)
    assert(ModelCache.getOrElseUpdate(s1, "spec.evict")(10) === 10)
    assert(ModelCache.getOrElseUpdate(s2, "spec.evict")(20) === 2)
    ModelCache.evict(ModelCache.sessionToken(s1))
    ModelCache.evict(ModelCache.sessionToken(s2))
  }
}
